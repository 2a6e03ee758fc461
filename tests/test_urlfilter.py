"""URL filtering screen (engine/ops/urlfilter): domain blocklist with
subdomain suffix matching + pinned keyword URL scoring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engine.ops.urlfilter import (
    filter_urls,
    host_suffixes,
    url_score,
)


def test_host_suffixes_expression(spark):
    df = spark.createDataFrame(
        [("a.b.c.com",), ("c.com",), ("localhost",), ("A.Bad.COM",)],
        "h string",
    )
    got = {r["h"]: r["s"] for r in df.select("h", host_suffixes(F.col("h")).alias("s")).collect()}
    assert got["a.b.c.com"] == ["a.b.c.com", "b.c.com", "c.com"]
    assert got["c.com"] == ["c.com"]
    assert got["localhost"] == ["localhost"]
    assert got["A.Bad.COM"] == ["a.bad.com", "bad.com"]


def test_url_score_pinned(spark):
    df = spark.createDataFrame(
        [
            ("http://clean.example.com/article",),
            ("http://best-CASINO.com/poker",),  # 1.0 + 0.5
            ("http://news.com/sex-education",),  # 0.5
        ],
        "url string",
    )
    got = [r["s"] for r in df.select(url_score(F.col("url")).alias("s")).collect()]
    assert got == [0.0, 1.5, 0.5]


@pytest.fixture()
def docs(spark):
    rows = [
        ("http://good.com/a", "fine"),
        ("http://ads.bad.com/x", "subdomain of blocked"),
        ("http://bad.com/y", "blocked exactly"),
        ("http://notbad.com/z", "suffix is NOT a label match"),
        ("http://clean.com/casino-night", "keyword hit"),
        (None, "null url"),
    ]
    return spark.createDataFrame(rows, "url string, text string")


def test_filter_urls_verdicts(spark, docs):
    bl = spark.createDataFrame([("bad.com",), ("other.org",)], "domain string")
    out = filter_urls(docs, bl).collect()
    v = {r["url"]: (r["blocked_domain"], r["url_keep"]) for r in out}
    assert len(out) == docs.count()  # annotate, never drop or duplicate
    assert v["http://good.com/a"] == (False, True)
    assert v["http://ads.bad.com/x"] == (True, False)  # subdomain blocked
    assert v["http://bad.com/y"] == (True, False)
    assert v["http://notbad.com/z"] == (False, True)  # label-boundary safe
    assert v["http://clean.com/casino-night"] == (False, False)  # score 1.0
    assert v[None] == (False, True)


def test_filter_urls_without_blocklist_and_threshold(spark, docs):
    out = filter_urls(docs, None, threshold=2.0).collect()
    assert all(not r["blocked_domain"] for r in out)
    assert all(r["url_keep"] for r in out)  # nothing reaches 2.0


def test_corpus_side_joins_stay_broadcast(spark, docs):
    """The blocklist broadcasts STATICALLY (force-hinted: UT1-style
    lists are dim-sized); the blocked-url verdict join-back is left to
    AQE (its size is input-dependent), which picks broadcast at
    runtime here. Same discipline + assertion shape as
    tests/test_decontaminate.py::test_corpus_side_never_shuffles."""
    from tests.test_plans import plan

    bl = spark.createDataFrame([("bad.com",)], "domain string")
    q = filter_urls(docs, bl)
    assert "BroadcastHashJoin" in plan(q)
    q.collect()  # finalize AQE
    final = q._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final, final
    final = final.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in final, final


def test_curate_job_url_screen(spark, tmp_path):
    """jobs/curate.py --url-filter: url verdicts fold into the
    rule-verdict reasons/keep before the content rules, blocklist
    loads from a plain-text UT1-style file, and the audit columns
    survive into the rejected table."""
    import types

    from jobs.curate import run

    from tests.test_curate import GOOD as good  # passes all content rules
    rows = [
        ("http://fine.example.com/a", good),
        ("http://ads.spam.com/b", good),
        ("http://fine.example.com/casino", good),
        ("http://fine.example.com/short", "too short"),
    ]
    docs_path = str(tmp_path / "docs")
    spark.createDataFrame(rows, "url string, text string").write.parquet(docs_path)
    bl_path = str(tmp_path / "bl.txt")
    with open(bl_path, "w") as f:
        f.write("spam.com\nother.net\n")

    res = run(
        types.SimpleNamespace(
            input=docs_path,
            output=str(tmp_path / "out"),
            id_col="url",
            min_tokens=5,
            no_check_lang=True,
            url_filter=True,
            url_blocklist=bl_path,
            master="local[4]",
            shuffle_partitions=4,
        )
    )
    assert res["kept"] == 1
    assert res["reasons"].get("url_domain") == 1
    assert res["reasons"].get("url_score") == 1
    kept = spark.read.parquet(str(tmp_path / "out" / "kept"))
    assert [r["url"] for r in kept.collect()] == ["http://fine.example.com/a"]
    rej = spark.read.parquet(str(tmp_path / "out" / "rejected"))
    assert {"blocked_domain", "url_score"} <= set(rej.columns)


def test_corpus_job_url_blocklist_passthrough(spark, tmp_path):
    """jobs/corpus.py --url-blocklist implies the URL screen inside
    its curate stage (reason counts land in the curate summary via
    the rejected audit table)."""
    import types

    from engine.corpus import gen_pages_df
    from jobs.corpus import run

    pages = str(tmp_path / "pages")
    gen_pages_df(spark, 120).write.parquet(pages)
    # block the corpus generator's most common host outright
    host = (
        spark.read.parquet(pages)
        .selectExpr("lower(parse_url(url, 'HOST')) h")
        .groupBy("h")
        .count()
        .orderBy("count", ascending=False)
        .first()["h"]
    )
    bl = str(tmp_path / "bl.txt")
    with open(bl, "w") as f:
        f.write(host + "\n")
    out = str(tmp_path / "corpus")
    run(
        types.SimpleNamespace(
            pages=pages,
            output=out,
            min_tokens=5,
            sample_fraction=1.0,
            url_blocklist=bl,
        )
    )
    rej = spark.read.parquet(f"{out}/curate/rejected")
    n_dom = rej.filter(
        F.array_contains("reasons", "url_domain")
    ).count()
    assert n_dom > 0
    kept = spark.read.parquet(f"{out}/curate/kept")
    assert (
        kept.filter(F.lower(F.parse_url("url", F.lit("HOST"))) == host).count()
        == 0
    )


def test_deep_host_cannot_bypass_blocklist(spark):
    # review r3: a head-slice bound dropped the registrable suffix for
    # hosts with more than MAX_SUFFIX_LABELS labels, silently bypassing
    # the blocklist. The bound must keep the TAIL labels.
    deep = "a.b.c.d.e.f.g.h.i.j.bad.com"  # 12 labels
    df = spark.createDataFrame(
        [(f"http://{deep}/x",), ("http://ok.com/y",)], "url string"
    )
    bl = spark.createDataFrame([("bad.com",)], "domain string")
    v = {r["url"]: r["blocked_domain"] for r in filter_urls(df, bl).collect()}
    assert v[f"http://{deep}/x"] is True
    assert v["http://ok.com/y"] is False
    # and the explode stays bounded
    sfx = (
        spark.createDataFrame([(deep,)], "h string")
        .select(F.explode(host_suffixes(F.col("h"))).alias("s"))
        .collect()
    )
    assert len(sfx) <= 8
    assert "bad.com" in {r["s"] for r in sfx}


def test_blank_blocklist_entry_blocks_nothing(spark):
    # review r3: a blank blocklist line became domain '' and matched
    # every url with no parseable host
    df = spark.createDataFrame(
        [("mailto:someone@example.com",), ("not a url at all",)],
        "url string",
    )
    bl = spark.createDataFrame([("",), ("  ",), ("bad.com",)], "domain string")
    out = filter_urls(df, bl).collect()
    assert all(r["blocked_domain"] is False for r in out)
