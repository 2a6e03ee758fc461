"""SemDeDup semantic near-dup (engine/ops/semdedup): exactness vs a
brute-force numpy oracle on separable blobs, precision on the real
embeddings table, hot-cell cap fan-out bound + cluster preservation,
and partition invariance."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from engine.ops.graph import dedup_clusters
from engine.ops.semdedup import semantic_neardup_pairs

DIM = 12
N_BLOBS = 8
PER_BLOB = 6


def _unit(v):
    return v / np.linalg.norm(v)


def _blobs():
    """N_BLOBS well-separated unit anchors, PER_BLOB tiny-noise copies
    each: within-blob cosine ~1, cross-blob cosine well below any
    threshold. Deterministic (seeded generator, no wall-clock).
    Returns (anchors, rows); the anchors double as a known-good
    codebook so the exactness tests don't depend on k-means landing in
    the global optimum (the `codebook` reuse path is the one under
    test there; training itself is pinned in tests/test_kmeans.py)."""
    rng = np.random.default_rng(7)
    anchors = []
    while len(anchors) < N_BLOBS:
        c = _unit(rng.normal(size=DIM))
        if all(abs(np.dot(c, a)) < 0.5 for a in anchors):
            anchors.append(c)
    rows, vid = [], 0
    for a in anchors:
        for _ in range(PER_BLOB):
            v = _unit(a + rng.normal(scale=0.01, size=DIM))
            rows.append((vid, v.tolist()))
            vid += 1
    return np.array(anchors), rows


def _brute_pairs(rows, threshold):
    M = np.array([r[1] for r in rows])
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = M @ M.T
    out = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            if S[i, j] >= threshold:
                out.add((rows[i][0], rows[j][0]))
    return out


@pytest.fixture(scope="module")
def blob_vecs(spark):
    return spark.createDataFrame(
        _blobs()[1], "vec_id long, embedding array<double>"
    ).cache()


def test_matches_brute_force_on_separable_blobs(blob_vecs):
    # codebook = the true anchors => every near-dup pair shares a
    # cell, so the within-cell restriction loses nothing and the pair
    # set must EQUAL brute force.
    anchors, rows = _blobs()
    stats = {}
    got = {
        (r["doc_a"], r["doc_b"])
        for r in semantic_neardup_pairs(
            blob_vecs, threshold=0.98, codebook=anchors, stats=stats
        ).collect()
    }
    want = _brute_pairs(rows, 0.98)
    assert got == want and len(want) == N_BLOBS * PER_BLOB * (PER_BLOB - 1) // 2
    assert stats["k"] == N_BLOBS and stats["hot_cells"] == 0


def test_partition_invariance(blob_vecs):
    anchors, _ = _blobs()
    a = semantic_neardup_pairs(blob_vecs, threshold=0.98, codebook=anchors)
    b = semantic_neardup_pairs(
        blob_vecs.repartition(13), threshold=0.98, codebook=anchors
    )
    assert {tuple(r) for r in a.drop("cos_sim").collect()} == {
        tuple(r) for r in b.drop("cos_sim").collect()
    }


def test_hot_cell_cap_bounds_fanout_and_preserves_cluster(spark):
    # 50 copies of one vector in one cell, cap 10: fan-out must be the
    # star's n-1, every pair still >= threshold (exact cosine), and
    # clustering over the capped pairs keeps ONE canonical doc.
    n = 50
    v = _unit(np.arange(1, DIM + 1, dtype=float)).tolist()
    vecs = spark.createDataFrame(
        [(i, v) for i in range(n)], "vec_id long, embedding array<double>"
    )
    stats = {}
    pairs = semantic_neardup_pairs(
        vecs, threshold=0.99, k=1, cell_cap=10, stats=stats
    ).cache()
    rows = pairs.collect()
    assert len(rows) == n - 1 and stats["hot_cells"] == 1
    assert all(r["doc_a"] == 0 and r["cos_sim"] >= 0.99 for r in rows)
    docs = vecs.select(F.col("vec_id").alias("doc_id"))
    cl = dedup_clusters(docs, pairs).cache()
    assert cl.select("cluster_id").distinct().count() == 1
    assert cl.filter("is_canonical = 1").count() == 1


def test_precision_exact_on_real_embeddings(spark):
    # Over the driver's embeddings table, auto-k TRAINED cells: every
    # emitted pair's cosine re-checked in numpy (precision is exact by
    # construction), pairs are a SUBSET of brute force (recall is the
    # disclosed approximation), and doc_a < doc_b throughout.
    vecs = (
        spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        .select("vec_id", "embedding")
        .limit(400)
        .cache()
    )
    thr = 0.7
    got = semantic_neardup_pairs(vecs, threshold=thr, k=8).collect()
    rows = vecs.collect()
    M = {r["vec_id"]: np.array(r["embedding"], dtype=float) for r in rows}
    brute = _brute_pairs(
        [(r["vec_id"], r["embedding"]) for r in rows], thr
    )
    assert all(r["doc_a"] < r["doc_b"] for r in got)
    for r in got:
        a, b = M[r["doc_a"]], M[r["doc_b"]]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos >= thr - 1e-9 and abs(cos - r["cos_sim"]) < 1e-6
    assert {(r["doc_a"], r["doc_b"]) for r in got} <= brute
