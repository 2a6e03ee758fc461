"""Crawl-frontier prioritization (engine/ops/frontier.py +
jobs/frontier.py): seen urls screened out exactly, canonical-variant
links collapse to one candidate, evidence counts distinct referring
hosts, priority respects the host quality prior, and the job surface
runs end-to-end."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from engine.ops.frontier import discovered_links, frontier_candidates


def _page(body: str) -> bytes:
    return f"<html><body>{body}</body></html>".encode()


def _pages(spark, rows):
    ts = dt.datetime(2026, 7, 1, 12)
    return spark.createDataFrame(
        [(u, ts, _page(b), None, "en") for u, b in rows],
        "url string, warc_ts timestamp, html binary, "
        "text string, lang string",
    )


def test_discovered_links_canonicalize_and_count_hosts(spark):
    # two hosts link to the same target through tracking-param and
    # fragment variants; one host links twice (counts once per host)
    pages = _pages(
        spark,
        [
            (
                "https://a.com/p1",
                '<a href="https://t.com/x?utm_source=a#f">l</a>'
                '<a href="https://t.com/x">again</a>',
            ),
            ("https://b.com/p1", '<a href="https://t.com/x#other">l</a>'),
            ("https://a.com/p2", '<a href="https://a.com/p2#self">s</a>'),
        ],
    )
    rows = {r["url"]: r for r in discovered_links(pages).collect()}
    assert set(rows) == {"https://t.com/x"}  # self-link dropped
    r = rows["https://t.com/x"]
    assert r["n_ref_hosts"] == 2 and r["n_refs"] == 3


def test_frontier_screens_seen_and_orders_by_priority(spark):
    pages = _pages(
        spark,
        [
            # hub host linked by everyone -> high rank
            ("https://hub.com/", '<a href="https://hub.com/new">n</a>'),
            (
                "https://a.com/p",
                '<a href="https://hub.com/new">n</a>'
                '<a href="https://obscure.com/only">o</a>'
                '<a href="https://hub.com/seen">s</a>',
            ),
            ("https://b.com/p", '<a href="https://hub.com/new">n</a>'),
        ],
    )
    seen = spark.createDataFrame(
        [("https://hub.com/seen",), ("https://a.com/p",)], "url string"
    )
    out = frontier_candidates(spark, pages, seen).collect()
    urls = [r["url"] for r in out]
    assert "https://hub.com/seen" not in urls  # screened exactly
    assert set(urls) == {"https://hub.com/new", "https://obscure.com/only"}
    # 3 referring hosts to a ranked host beats 1 referrer to an
    # unknown-rank host on both factors
    assert urls[0] == "https://hub.com/new"
    by_url = {r["url"]: r for r in out}
    assert by_url["https://hub.com/new"]["n_ref_hosts"] == 3
    assert out[0]["priority"] > out[1]["priority"] > 0


def test_frontier_external_rank_table_and_topk(spark):
    pages = _pages(
        spark,
        [
            (
                "https://a.com/p",
                '<a href="https://good.com/x">g</a>'
                '<a href="https://bad.com/x">b</a>',
            ),
        ],
    )
    seen = spark.createDataFrame([("https://nothing.com/",)], "url string")
    ranks = spark.createDataFrame(
        [("good.com", 0.9), ("bad.com", 0.001)], "host string, rank double"
    )
    out = frontier_candidates(
        spark, pages, seen, host_ranks=ranks, top_k=1
    ).collect()
    assert len(out) == 1 and out[0]["url"] == "https://good.com/x"
    assert abs(out[0]["rank"] - 0.9) < 1e-12


def test_frontier_job(spark, tmp_path):
    import jobs.frontier as jf

    pages = _pages(
        spark,
        [
            ("https://a.com/p", '<a href="https://t.com/x">l</a>'),
            ("https://b.com/p", '<a href="https://t.com/y">l</a>'),
        ],
    )
    pages_path = str(tmp_path / "pages")
    pages.write.parquet(pages_path)
    out = str(tmp_path / "front")
    summary = jf.run(
        jf._parser().parse_args(
            ["--pages", pages_path, "--output", out, "--master", "local[2]"]
        )
    )
    assert summary["candidates_written"] == 2
    got = spark.read.parquet(f"{out}/frontier")
    assert {r["url"] for r in got.collect()} == {
        "https://t.com/x",
        "https://t.com/y",
    }


def test_per_host_cap_bounds_flood(spark):
    """A newly discovered giant host contributes at most cap
    candidates per cycle; its HIGHEST-priority pages survive."""
    flood = "".join(f'<a href="https://big.com/p{i:03d}">x</a>' for i in range(30))
    pages = _pages(
        spark,
        [
            ("https://a.com/p", flood + '<a href="https://small.com/x">s</a>'),
            # one page of big.com gets a second referring host
            ("https://b.com/p", '<a href="https://big.com/p007">x</a>'),
        ],
    )
    seen = spark.createDataFrame([("https://nothing.com/",)], "url string")
    out = frontier_candidates(
        spark, pages, seen, per_host_cap=3
    ).collect()
    big = [r for r in out if r["host"] == "big.com"]
    assert len(big) == 3
    # the two-referrer page outranks the single-referrer flood pages
    assert big[0]["url"] == "https://big.com/p007"
    assert {r["host"] for r in out} == {"big.com", "small.com"}


def test_frontier_job_since_snapshot(spark, tmp_path):
    """--since-snapshot discovers only from pages added after the
    given snapshot while screening against the full seen history."""
    import jobs.frontier as jf
    from engine.io.snapshots import commit_snapshot

    pages_path = str(tmp_path / "pages")
    _pages(spark, [("https://a.com/p", '<a href="https://t.com/old">l</a>')]) \
        .write.mode("append").parquet(pages_path)
    s1 = commit_snapshot(pages_path)["snapshot_id"]
    _pages(spark, [("https://b.com/p",
                    '<a href="https://t.com/new">l</a>'
                    '<a href="https://t.com/old">l</a>')]) \
        .write.mode("append").parquet(pages_path)
    commit_snapshot(pages_path)

    seen_path = str(tmp_path / "seen")
    spark.createDataFrame(
        [("https://t.com/old",)], "url string"
    ).write.parquet(seen_path)

    out = str(tmp_path / "front")
    summary = jf.run(
        jf._parser().parse_args(
            ["--pages", pages_path, "--output", out, "--seen", seen_path,
             "--since-snapshot", str(s1), "--master", "local[2]"]
        )
    )
    got = {r["url"] for r in spark.read.parquet(f"{out}/frontier").collect()}
    # only the new batch was scanned; t.com/old is seen-screened even
    # though the new batch links it again
    assert got == {"https://t.com/new"}
    assert summary["candidates_written"] == 1

    # nothing added after the latest snapshot -> clean no-op
    s_latest = commit_snapshot(pages_path)["snapshot_id"]
    summary2 = jf.run(
        jf._parser().parse_args(
            ["--pages", pages_path, "--output", out, "--seen", seen_path,
             "--since-snapshot", str(s_latest), "--master", "local[2]"]
        )
    )
    assert summary2["candidates_written"] == 0 and summary2["no_new_pages"]


def test_since_snapshot_default_seen_is_full_history(spark, tmp_path):
    """--since-snapshot without --seen must screen against ALL crawled
    pages, not just the incremental slice (review r3) — and the
    no-new-pages path overwrites the output with an empty list."""
    import jobs.frontier as jf
    from engine.io.snapshots import commit_snapshot

    pages_path = str(tmp_path / "pages")
    _pages(spark, [("https://old.com/p", '<a href="https://t.com/x">l</a>')]) \
        .write.mode("append").parquet(pages_path)
    s1 = commit_snapshot(pages_path)["snapshot_id"]
    # the new batch links BACK to an already-crawled page
    _pages(spark, [("https://b.com/p",
                    '<a href="https://old.com/p">back</a>'
                    '<a href="https://t.com/fresh">l</a>')]) \
        .write.mode("append").parquet(pages_path)
    commit_snapshot(pages_path)

    out = str(tmp_path / "front")
    jf.run(
        jf._parser().parse_args(
            ["--pages", pages_path, "--output", out,
             "--since-snapshot", str(s1), "--master", "local[2]"]
        )
    )
    got = {r["url"] for r in spark.read.parquet(f"{out}/frontier").collect()}
    assert "https://old.com/p" not in got  # full-history screen
    assert "https://t.com/fresh" in got

    # no-new-pages cycle: output becomes an EMPTY fetch list, not stale
    s_latest = commit_snapshot(pages_path)["snapshot_id"]
    summary = jf.run(
        jf._parser().parse_args(
            ["--pages", pages_path, "--output", out,
             "--since-snapshot", str(s_latest), "--master", "local[2]"]
        )
    )
    assert summary["no_new_pages"] and summary["output"].endswith("frontier")
    assert spark.read.parquet(f"{out}/frontier").count() == 0


def test_crawl_delay_caps_per_host(spark):
    """A host's declared Crawl-delay becomes its own per-cycle cap
    (floor(window / delay), >= 1); undeclared hosts fall back to the
    global cap; least() wins when both apply."""
    flood_big = "".join(
        f'<a href="https://big.com/p{i:02d}">x</a>' for i in range(10)
    )
    flood_slow = "".join(
        f'<a href="https://slow.com/q{i:02d}">x</a>' for i in range(10)
    )
    pages = _pages(spark, [("https://a.com/p", flood_big + flood_slow)])
    seen = spark.createDataFrame([("https://nothing.com/",)], "url string")
    delays = spark.createDataFrame(
        [("slow.com", 600.0), ("big.com", 1.0)],
        "host string, crawl_delay double",
    )
    out = frontier_candidates(
        spark,
        pages,
        seen,
        per_host_cap=4,
        host_delays=delays,
        fetch_window_s=1200.0,
    ).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r)
    # slow.com: floor(1200/600)=2 beats the global 4
    assert len(by_host["slow.com"]) == 2
    # big.com: floor(1200/1)=1200, global 4 wins
    assert len(by_host["big.com"]) == 4

    # no global cap: undeclared hosts are unbounded, declared bound
    out2 = frontier_candidates(
        spark,
        pages,
        seen,
        host_delays=delays,
        fetch_window_s=1200.0,
    ).collect()
    by2 = {}
    for r in out2:
        by2.setdefault(r["host"], []).append(r)
    assert len(by2["slow.com"]) == 2
    assert len(by2["big.com"]) == 10


def test_frontier_dim_broadcast_budget_gate(spark):
    """VERDICT r3 #2: the host-rank and host-delay dim tables
    broadcast only under broadcast_bytes; with budget 0 the joins are
    unhinted (AQE decides) and the frontier is IDENTICAL — parity
    pinned across both regimes, broadcast visibility pinned in the
    plans."""
    from tests.test_plans import plan

    body = "".join(
        f'<a href="https://t{i}.com/p">x</a>' for i in range(6)
    )
    pages = _pages(spark, [("https://a.com/p", body)])
    seen = spark.createDataFrame([("https://nothing.com/",)], "url string")
    ranks = spark.createDataFrame(
        [(f"t{i}.com", 0.1 * (i + 1)) for i in range(6)],
        "host string, rank double",
    )
    delays = spark.createDataFrame(
        [("t1.com", 600.0)], "host string, crawl_delay double"
    )
    kw = dict(host_ranks=ranks, host_delays=delays, fetch_window_s=1200.0)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        under = frontier_candidates(spark, pages, seen, **kw)
        over = frontier_candidates(
            spark, pages, seen, broadcast_bytes=0, **kw
        )
        # the bloom screen's own (independently budgeted) broadcast is
        # present in BOTH plans; budget 0 must remove exactly the two
        # host-dim hints (ranks + delays). Formatted explain prints
        # each node twice (tree + details), hence the //2.
        n_under = plan(under).count("BroadcastHashJoin") // 2
        n_over = plan(over).count("BroadcastHashJoin") // 2
        assert n_under - n_over == 2, (n_under, n_over)
        rows_u = [tuple(r) for r in under.collect()]
        rows_o = [tuple(r) for r in over.collect()]
        assert rows_u == rows_o and len(rows_u) == 6
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
