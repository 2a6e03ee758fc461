"""k-means codebook training + trained-IVF search (engine/ops/kmeans):
centroid recovery on separable data, reproducibility under
repartitioning, map-only assignment plan, and multi-probe recall vs
the brute-force oracle."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from engine.ops.kmeans import (
    assign_cells,
    hash_sample,
    ivf_topk,
    train_codebook,
)

DIM = 8
# three well-separated anchors; rows orbit an anchor with a small
# deterministic (hash-free) offset so every blob has spread but the
# blobs never overlap
ANCHORS = np.array(
    [[10.0] + [0.0] * (DIM - 1), [0.0] * (DIM - 1) + [10.0], [-10.0] + [5.0] * (DIM - 1)]
)


def _blob_rows(n_per: int):
    rows = []
    vid = 0
    for a_ix, anchor in enumerate(ANCHORS):
        for i in range(n_per):
            off = np.array(
                [((vid * 7 + d * 3 + 1) % 11 - 5) / 10.0 for d in range(DIM)]
            )
            rows.append((vid, (anchor + off).tolist(), a_ix))
            vid += 1
    return rows


@pytest.fixture(scope="module")
def blobs(spark):
    return spark.createDataFrame(
        _blob_rows(120), "vec_id long, embedding array<double>, blob int"
    ).cache()


def test_train_recovers_separated_blobs(blobs):
    stats = {}
    C = train_codebook(blobs, k=3, sample_per_centroid=200, stats=stats)
    assert C.shape == (3, DIM)
    assert stats["iters"] >= 1 and stats["nonempty_cells"] == 3
    # each recovered centroid sits within the offset radius (<=0.5 per
    # dim) of exactly one true anchor, and all three anchors are hit
    hit = set()
    for c in C:
        d = np.sqrt(((ANCHORS - c) ** 2).sum(axis=1))
        assert d.min() < 1.0, (c, d)
        hit.add(int(d.argmin()))
    assert hit == {0, 1, 2}


def test_train_reproducible_under_repartitioning(blobs):
    C1 = train_codebook(blobs.repartition(2), k=3, sample_per_centroid=200)
    C2 = train_codebook(blobs.repartition(7), k=3, sample_per_centroid=200)
    # partial-sum addition order is the only float nondeterminism
    assert np.abs(C1 - C2).max() < 1e-6


def test_train_validation(blobs, spark):
    with pytest.raises(ValueError, match="must be positive"):
        train_codebook(blobs, k=0)
    with pytest.raises(ValueError, match="exceeds corpus size"):
        train_codebook(spark.createDataFrame(
            [(1, [0.0] * DIM)], "vec_id long, embedding array<double>"
        ), k=5)


def test_hash_sample_deterministic_and_partition_invariant(blobs):
    a = {
        r["vec_id"]
        for r in hash_sample(blobs, 0.5, id_col="vec_id").select("vec_id").collect()
    }
    b = {
        r["vec_id"]
        for r in hash_sample(blobs.repartition(9), 0.5, id_col="vec_id")
        .select("vec_id")
        .collect()
    }
    assert a == b
    assert 0.3 * 360 < len(a) < 0.7 * 360


def test_assign_cells_is_map_only_and_matches_blobs(blobs):
    C = train_codebook(blobs, k=3, sample_per_centroid=200)
    got = assign_cells(blobs, C)
    plan = got.sparkSession._jvm.PythonSQLUtils.explainString(
        got._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan, plan
    # cell assignment is constant within a blob (blobs are separable)
    n_distinct = (
        got.groupBy("blob")
        .agg(F.countDistinct("cell").alias("n"))
        .agg(F.max("n"))
        .collect()[0][0]
    )
    assert n_distinct == 1


def test_ivf_topk_multiprobe_matches_bruteforce(blobs, spark):
    """nprobe covering the query's own (separable) cell: trained-IVF
    top-k equals the exact brute-force top-k for every query."""
    C = train_codebook(blobs, k=3, sample_per_centroid=200)
    queries = blobs.filter("vec_id in (0, 130, 250)").select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    got = {
        (r["qid"], r["vec_id"])
        for r in ivf_topk(blobs, queries, C, topk=3, nprobe=1).collect()
    }
    # brute force oracle in numpy
    rows = blobs.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    M = np.array([r["embedding"] for r in rows])
    Mn = M / np.sqrt((M * M).sum(axis=1, keepdims=True))
    exp = set()
    for qid in (0, 130, 250):
        qv = Mn[ids == qid][0]
        sims = Mn @ qv
        order = [
            int(ids[i])
            for i in sorted(
                range(len(ids)), key=lambda i: (-sims[i], ids[i])
            )
            if ids[i] != qid
        ][:3]
        exp |= {(qid, v) for v in order}
    assert got == exp


def test_ivf_on_real_embeddings(spark):
    """End-to-end over the driver's embeddings table: trained codebook,
    non-degenerate cells, every query returns topk rows."""
    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    stats = {}
    C = train_codebook(e, k=8, sample_per_centroid=64, stats=stats)
    assert stats["nonempty_cells"] >= 2
    q = e.filter("vec_id < 5").select(F.col("vec_id").alias("qid"), "embedding")
    res = ivf_topk(e, q, C, topk=3, nprobe=2)
    per_q = {r["qid"]: r["n"] for r in res.groupBy("qid").agg(F.count("*").alias("n")).collect()}
    assert set(per_q) == {0, 1, 2, 3, 4} and all(v == 3 for v in per_q.values())


def test_assignment_correct_with_unequal_norm_centroids(spark):
    """Round-3 review regression: the argmin proxy must keep the
    per-centroid ||c||^2 term. Point [1,0,...] lies 1 from the origin
    centroid and 2 from [3,0,...]; a proxy that drops ||c||^2 picks
    the far, large-norm centroid instead."""
    C = np.zeros((2, DIM))
    C[1, 0] = 3.0
    pt = spark.createDataFrame(
        [(1, [1.0] + [0.0] * (DIM - 1))], "vec_id long, embedding array<double>"
    )
    got = assign_cells(pt, C).collect()[0]["cell"]
    assert got == 0
    # ivf_topk's probe path uses the same proxy: nprobe=1 must probe
    # the origin cell, where the only (self-excluded) corpus row is
    corpus = spark.createDataFrame(
        [(1, [1.0] + [0.0] * (DIM - 1)), (2, [0.5] + [0.0] * (DIM - 1))],
        "vec_id long, embedding array<double>",
    )
    q = corpus.filter("vec_id = 1").select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    res = ivf_topk(corpus, q, C, topk=1, nprobe=1).collect()
    assert [(r["qid"], r["vec_id"]) for r in res] == [(1, 2)]
    # external queries whose qid collides with a corpus id keep the
    # colliding row when exclude_self=False
    res2 = ivf_topk(corpus, q, C, topk=1, nprobe=1, exclude_self=False).collect()
    assert [(r["qid"], r["vec_id"]) for r in res2] == [(1, 1)]


def test_train_codebook_short_sample_widens_or_raises(spark):
    """k near the corpus size with a tiny sample_per_centroid: the
    sample-size guard must widen the draw (never IndexError, never a
    silent sub-k codebook) and raise a clear error when even the full
    table cannot fit k."""
    rows = [(i, [float(i)] + [0.0] * (DIM - 1)) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    C = train_codebook(df, k=20, sample_per_centroid=1, max_iter=2)
    assert C.shape == (20, DIM)
    with pytest.raises(ValueError, match="exceeds corpus size"):
        train_codebook(df, k=100)
