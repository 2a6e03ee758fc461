"""robots.txt politeness screen (engine/ops/robots.py): RFC 9309
parse/group-selection/longest-match semantics pinned, end-to-end
screen, broadcast-only plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from engine.ops.robots import (
    parse_robots,
    robots_verdicts,
    screen_robots,
)

BODY = """
# comments are stripped
User-agent: *
Disallow: /private/
Allow: /private/press/
Disallow: /*.pdf$

User-agent: sparkbot
Disallow: /beta/
"""


def _robots(spark, rows):
    return spark.createDataFrame(rows, "host string, body string")


def _pages(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def _verdicts(spark, body, urls, crawler="sparkbot"):
    rules = parse_robots(_robots(spark, [("h.example", body)]))
    got = robots_verdicts(_pages(spark, urls), rules, crawler=crawler)
    return {r["url"]: r["robots_allowed"] for r in got.collect()}


def test_group_selection_specific_beats_star(spark):
    v = _verdicts(
        spark,
        BODY,
        [
            "http://h.example/beta/x",     # sparkbot group disallows
            "http://h.example/private/a",  # * group rule DOES NOT apply
            "http://h.example/ok.html",
        ],
    )
    assert v["http://h.example/beta/x"] is False
    # only the sparkbot group governs sparkbot: /private/ is allowed
    assert v["http://h.example/private/a"] is True
    assert v["http://h.example/ok.html"] is True


def test_star_group_longest_match_and_wildcards(spark):
    v = _verdicts(
        spark,
        BODY,
        [
            "http://h.example/private/a",
            "http://h.example/private/press/x",  # longer Allow wins
            "http://h.example/docs/file.pdf",    # *.pdf$ wildcard
            "http://h.example/docs/file.pdf.html",  # $ anchors: allowed
            "http://h.example/",
        ],
        crawler="otherbot",
    )
    assert v["http://h.example/private/a"] is False
    assert v["http://h.example/private/press/x"] is True
    assert v["http://h.example/docs/file.pdf"] is False
    assert v["http://h.example/docs/file.pdf.html"] is True
    assert v["http://h.example/"] is True


def test_empty_specific_group_allows_everything(spark):
    body = "User-agent: sparkbot\nDisallow:\n\nUser-agent: *\nDisallow: /\n"
    v = _verdicts(spark, body, ["http://h.example/anything"])
    assert v["http://h.example/anything"] is True  # empty group wins
    v2 = _verdicts(
        spark, body, ["http://h.example/anything"], crawler="otherbot"
    )
    assert v2["http://h.example/anything"] is False


def test_no_robots_host_and_malformed_lines_allowed(spark):
    rules = parse_robots(
        _robots(spark, [("h.example", "garbage line\nDisallow /nope")])
    )
    assert rules.count() == 0  # tolerant parse: nothing usable
    got = robots_verdicts(
        _pages(spark, ["http://h.example/x", "http://other.example/y"]),
        rules,
    )
    assert all(r["robots_allowed"] for r in got.collect())


def test_crawler_prefix_match_and_case(spark):
    body = "User-Agent: Spark\nDisallow: /x/\n"
    v = _verdicts(spark, body, ["http://h.example/x/1"], crawler="sparkbot")
    assert v["http://h.example/x/1"] is False  # 'sparkbot' matches 'spark'
    v2 = _verdicts(spark, body, ["http://h.example/x/1"], crawler="flink")
    assert v2["http://h.example/x/1"] is True  # no group governs flink


def test_screen_end_to_end_and_plan(spark):
    robots = _robots(
        spark, [("a.example", "User-agent: *\nDisallow: /no/\n")]
    )
    pages = _pages(
        spark,
        [
            "http://a.example/no/1",
            "http://a.example/yes",
            "http://b.example/no/2",  # no robots.txt for b.example
        ],
    )
    kept = screen_robots(pages, robots)
    assert {r["url"] for r in kept.collect()} == {
        "http://a.example/yes",
        "http://b.example/no/2",
    }
    # the corpus side must broadcast-join the rules: no SortMergeJoin
    from tests.test_plans import plan

    p = plan(robots_verdicts(pages, parse_robots(robots)))
    assert "SortMergeJoin" not in p, p
    assert "BroadcastHashJoin" in p, p


def test_crawl_delays_group_selection_and_max(spark):
    """Crawl-delay follows the same RFC group selection as the rules:
    the crawler-specific group's delay beats *'s; within the
    governing group the max declared delay wins; unparsable values
    and hosts without a delay emit nothing."""
    from engine.ops.robots import crawl_delays

    robots = _robots(
        spark,
        [
            (
                "a.com",
                "User-agent: *\nCrawl-delay: 10\n\n"
                "User-agent: sparkbot\nDisallow: /tmp\nCrawl-delay: 2\n"
                "Crawl-delay: 5\n",
            ),
            ("b.com", "User-agent: *\nCrawl-delay: 7\n"),
            ("c.com", "User-agent: *\nDisallow: /x\n"),           # none
            ("d.com", "User-agent: *\nCrawl-delay: soon\n"),      # junk
            ("e.com", "User-agent: otherbot\nCrawl-delay: 99\n"),  # other
        ],
    )
    got = {
        r["host"]: r["crawl_delay"]
        for r in crawl_delays(robots, crawler="sparkbot").collect()
    }
    assert got == {"a.com": 5.0, "b.com": 7.0}


def test_crawl_delay_governing_group_shadows_star(spark):
    """ADVICE r3: a crawler-specific group with Allow/Disallow rules
    but NO Crawl-delay is still the governing group — it shadows *'s
    delay rather than inheriting it (the governing group declared no
    delay, so none applies). A host whose specific group DOES declare
    one keeps it; a host with only * keeps *'s."""
    from engine.ops.robots import crawl_delays

    robots = _robots(
        spark,
        [
            (
                "shadow.com",
                "User-agent: sparkbot\nDisallow: /x\n\n"
                "User-agent: *\nCrawl-delay: 10\n",
            ),
            (
                "keeps.com",
                "User-agent: sparkbot\nCrawl-delay: 3\n\n"
                "User-agent: *\nCrawl-delay: 10\n",
            ),
            ("star.com", "User-agent: *\nCrawl-delay: 4\n"),
            # an EMPTY specific group (trailing user-agent line with
            # no rules — were it followed by another user-agent line
            # the two would merge per RFC adjacency) also governs and
            # shadows
            (
                "empty.com",
                "User-agent: *\nCrawl-delay: 9\nDisallow: /y\n\n"
                "User-agent: sparkbot\n",
            ),
        ],
    )
    got = {
        r["host"]: r["crawl_delay"]
        for r in crawl_delays(robots, crawler="sparkbot").collect()
    }
    assert got == {"keeps.com": 3.0, "star.com": 4.0}


def test_verdict_broadcast_budget_gate(spark):
    """VERDICT r3 #1: the |hosts|-sized rule table broadcasts ONLY
    under broadcast_bytes; above the budget the join is unhinted (AQE
    decides from actual sizes — no driver OOM path). Parity pinned in
    both regimes."""
    from tests.test_plans import plan

    robots = _robots(
        spark, [("a.example", "User-agent: *\nDisallow: /no/\n")]
    )
    pages = _pages(
        spark,
        ["http://a.example/no/1", "http://a.example/yes", "http://b.example/z"],
    )
    rules = parse_robots(robots)
    expected = {
        "http://a.example/no/1": False,
        "http://a.example/yes": True,
        "http://b.example/z": True,
    }
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # kill the auto threshold so the ONLY broadcast source is the
        # explicit budget-gated hint — makes the two regimes visible
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        under = robots_verdicts(pages, rules)
        assert "BroadcastHashJoin" in plan(under), plan(under)
        over = robots_verdicts(pages, rules, broadcast_bytes=0)
        assert "BroadcastHashJoin" not in plan(over), plan(over)
        for df in (under, over):
            got = {r["url"]: r["robots_allowed"] for r in df.collect()}
            assert got == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
