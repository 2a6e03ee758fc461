"""BM25 keyword search (engine/ops/bm25.py): formula pinned against a
pure-Python reference, one-shot vs persistent-index agreement, and the
partition-pruned index scan."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from engine.ops.bm25 import (
    bm25_search,
    bm25_topk,
    build_bm25_index,
)


@pytest.fixture(scope="module")
def spark():
    from engine.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=4)


DOCS = [
    (0, "spark shuffle join window window window"),
    (1, "merge sort merge join batch"),
    (2, "spark spark spark streaming state"),
    (3, "window functions rank over partitions"),
    (4, "totally unrelated text about gardening"),
    (5, ""),  # zero-token doc: counts toward N, never matches
    (6, "Spark WINDOW merge — punctuation, and MIXED case!"),
]
QUERY = ["spark", "window", "merge"]


def _reference_bm25(docs, terms, k1=1.2, b=0.75):
    """Independent sequential implementation of the pinned spec."""
    tok = lambda t: [w for w in re.split(r"[\W_]+", (t or "").lower()) if w]  # noqa: E731
    toks = {i: tok(t) for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {
        t: sum(1 for v in toks.values() if t in v)
        for t in terms
    }
    out = {}
    for i, v in toks.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            if not tf or not df[t]:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if s > 0:
            out[i] = round(s, 4)
    return out


def test_bm25_matches_reference(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r["bm25"] for r in bm25_topk(docs, QUERY, k=10).collect()}
    ref = _reference_bm25(DOCS, QUERY)
    assert got == ref
    # zero-token and no-hit docs are absent, not zero-scored
    assert 4 not in got and 5 not in got


def test_bm25_string_query_and_determinism(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = bm25_topk(docs, "Spark, window/MERGE!", k=10).collect()
    b = bm25_topk(docs.repartition(7), QUERY, k=10).collect()
    assert [(r["doc_id"], r["bm25"]) for r in a] == [
        (r["doc_id"], r["bm25"]) for r in b
    ]


def test_bm25_index_agrees_and_prunes(spark, tmp_path):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    idx = str(tmp_path / "bm25")
    stats = build_bm25_index(docs, idx, n_buckets=16)
    assert stats["n_docs"] == len(DOCS)

    direct = [(r["doc_id"], r["bm25"]) for r in bm25_topk(docs, QUERY, k=10).collect()]
    via_idx = [(r["doc"], r["bm25"]) for r in bm25_search(spark, idx, QUERY, k=10).collect()]
    assert direct == via_idx

    # partition pruning: the filtered read OPENS only the query
    # terms' bucket directories. inputFiles() reports the relation's
    # full listing regardless of filters, so assert on the executed
    # scan's numFiles metric instead — the number of files actually
    # read.
    def files_read(df):
        df.collect()
        scan = df._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
        return int(scan.metrics().apply("numFiles").value())

    post = spark.read.parquet(f"{idx}/postings")
    n_total = files_read(post.filter(F.lit(True)))
    buckets = sorted(
        r["b"]
        for r in spark.createDataFrame([(t,) for t in QUERY], "term string")
        .select(F.pmod(F.xxhash64("term"), F.lit(16)).alias("b"))
        .distinct()
        .collect()
    )
    assert len(buckets) < 16  # the query does not cover every bucket
    n_pruned = files_read(post.filter(F.col("bucket").isin(buckets)))
    assert 0 < n_pruned < n_total


def test_bm25_empty_inputs(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError, match="empty query"):
        bm25_topk(docs, [])
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty corpus"):
        bm25_topk(empty, QUERY)


def test_bm25_incremental_update_equals_rebuild(spark, tmp_path):
    """build(A) + update(B) scores IDENTICALLY to build(A ∪ B): df is
    query-time from postings and the stats update is the exact
    running mean, so the invariant is exact equality, not proximity."""
    from engine.ops.bm25 import update_bm25_index

    a = [r for r in DOCS if r[0] < 4]
    b = [r for r in DOCS if r[0] >= 4]
    ddl = "doc_id long, text string"
    inc_path = str(tmp_path / "inc")
    full_path = str(tmp_path / "full")

    build_bm25_index(
        spark.createDataFrame(a, ddl), inc_path, n_buckets=16
    )
    res = update_bm25_index(spark.createDataFrame(b, ddl), inc_path)
    assert res["added"] == len(b)
    build_bm25_index(
        spark.createDataFrame(DOCS, ddl), full_path, n_buckets=16
    )

    si = {
        r["doc"]: r["bm25"]
        for r in bm25_search(spark, inc_path, QUERY, k=10).collect()
    }
    sf = {
        r["doc"]: r["bm25"]
        for r in bm25_search(spark, full_path, QUERY, k=10).collect()
    }
    assert si == sf and len(si) > 0
    # stats agree exactly with the one-shot build
    sti = spark.read.parquet(f"{inc_path}/stats").collect()[0]
    stf = spark.read.parquet(f"{full_path}/stats").collect()[0]
    assert sti["n_docs"] == stf["n_docs"]
    assert abs(sti["avgdl"] - stf["avgdl"]) < 1e-12


def test_bm25_update_redo_after_crash_is_idempotent(spark, tmp_path):
    """ADVICE r3 (medium): a crash AFTER the batch's postings land but
    BEFORE the stats commit must leave the index (a) serving exactly
    the pre-update state and (b) safe to redo by re-running the
    update — under the old flat-append layout the redo appended the
    batch's postings twice, inflating df and doubling scores."""
    from engine.ops.bm25 import update_bm25_index

    a = [r for r in DOCS if r[0] < 4]
    b = [r for r in DOCS if r[0] >= 4]
    ddl = "doc_id long, text string"
    idx = str(tmp_path / "crash")
    build_bm25_index(spark.createDataFrame(a, ddl), idx, n_buckets=16)
    before = [
        (r["doc"], r["bm25"])
        for r in bm25_search(spark, idx, QUERY, k=10).collect()
    ]
    pre_stats = spark.read.parquet(f"{idx}/stats").collect()

    # simulate the crash: run the full update, then roll the stats
    # commit back — postings/batch=1 is on disk, stats still point at
    # 1 committed batch
    update_bm25_index(spark.createDataFrame(b, ddl), idx)
    spark.createDataFrame(pre_stats).write.mode("overwrite").parquet(
        f"{idx}/stats"
    )

    # (a) uncommitted batch is invisible
    mid = [
        (r["doc"], r["bm25"])
        for r in bm25_search(spark, idx, QUERY, k=10).collect()
    ]
    assert mid == before

    # (b) the redo: re-run the SAME update, then scores == a clean
    # build over the union (no duplicated postings, df not inflated)
    update_bm25_index(spark.createDataFrame(b, ddl), idx)
    full = str(tmp_path / "full")
    build_bm25_index(spark.createDataFrame(DOCS, ddl), full, n_buckets=16)
    si = {
        r["doc"]: r["bm25"]
        for r in bm25_search(spark, idx, QUERY, k=10).collect()
    }
    sf = {
        r["doc"]: r["bm25"]
        for r in bm25_search(spark, full, QUERY, k=10).collect()
    }
    assert si == sf


def test_bm25_legacy_flat_layout_back_compat(spark, tmp_path):
    """ADVICE r4: an index written by the PRE-batch layout (flat
    postings dir, stats without n_batches) must (a) still be
    searchable — scores identical to a fresh batched build — and
    (b) refuse incremental update with the typed format error, not
    a KeyError deep in the reader."""
    from engine.ops.bm25 import Bm25IndexFormatError, update_bm25_index

    ddl = "doc_id long, text string"
    docs = spark.createDataFrame(DOCS, ddl)
    new_path = str(tmp_path / "new")
    build_bm25_index(docs, new_path, n_buckets=16)

    # forge the legacy layout from the batched one: postings flat
    # under postings/, stats row without the n_batches column
    import shutil

    legacy = str(tmp_path / "legacy")
    shutil.copytree(f"{new_path}/postings/batch=0", f"{legacy}/postings")
    spark.read.parquet(f"{new_path}/stats").drop("n_batches").write.parquet(
        f"{legacy}/stats"
    )

    got = {
        r["doc"]: r["bm25"]
        for r in bm25_search(spark, legacy, QUERY, k=10).collect()
    }
    want = {
        r["doc"]: r["bm25"]
        for r in bm25_search(spark, new_path, QUERY, k=10).collect()
    }
    assert got == want and len(got) > 0

    with pytest.raises(Bm25IndexFormatError, match="legacy flat"):
        update_bm25_index(docs, legacy)
