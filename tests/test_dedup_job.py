"""jobs/dedup.py + engine/ops/dedup.py — the near-dup dedup job surface."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from engine.kernels import fingerprint as fp
from engine.ops.dedup import jaccard_verify, minhash_candidate_pairs

SF_001 = "/root/testdata/sf0.001"
SF_01 = "/root/testdata/sf0.01"


def test_x04_matches_shared_operator_pin(spark):
    """The registry query delegates to minhash_candidate_pairs; pin the
    sf0.01 result so the refactor is observably identical (25 pairs,
    CORRECTNESS_r01 value)."""
    from engine.queries_extract import ALL

    fn, _ = ALL["x04_minhash_lsh_pairs"]
    assert fn(spark, SF_01).count() == 25


def test_x05_matches_shared_operator_pin(spark):
    """x05 delegates to simhash_candidate_pairs; pin the sf0.01 result
    (389 pairs, CORRECTNESS_r01 value)."""
    from engine.queries_extract import ALL

    fn, _ = ALL["x05_simhash_pairs"]
    assert fn(spark, SF_01).count() == 389


def test_jaccard_verify_matches_bruteforce(spark):
    docs = (
        spark.read.parquet(f"{SF_001}/documents.parquet")
        .select("doc_id", "text")
        .limit(40)
    )
    pdf = docs.toPandas()
    pairs = minhash_candidate_pairs(docs)
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_verify(pairs, docs, threshold=0.0).collect()
    }
    texts = dict(zip(pdf["doc_id"], pdf["text"]))
    for (a, b), j in got.items():
        sa, sb = fp.shingles(texts[a] or ""), fp.shingles(texts[b] or "")
        expect = len(sa & sb) / len(sa | sb) if (sa | sb) else 1.0
        assert abs(j - expect) < 1e-12, (a, b)
    # thresholding is monotone: higher cutoff keeps a subset
    hi = jaccard_verify(pairs, docs, threshold=0.8).count()
    assert hi <= len(got)


def test_dedup_job_end_to_end(spark, tmp_path):
    import types

    from jobs.dedup import run

    out = str(tmp_path / "dedup_out")
    args = types.SimpleNamespace(
        input=f"{SF_001}/documents.parquet",
        output=out,
        id_col="doc_id",
        text_col="text",
        method="minhash",
        bands=8,
        rows_per_band=4,
        max_hamming=8,
        verify_jaccard=0.3,
        master="local[*]",
        shuffle_partitions=None,
    )
    res = run(args)
    assert res["docs"] == res["kept"] + res["removed"]

    clusters = spark.read.parquet(f"{out}/clusters")
    docs = spark.read.parquet(args.input)
    # every doc appears exactly once
    assert clusters.count() == docs.count()
    assert clusters.select("doc_id").distinct().count() == docs.count()
    # canonical = minimum doc_id of its cluster, exactly one per cluster
    bad = (
        clusters.groupBy("cluster_id")
        .agg(
            F.min("doc_id").alias("mn"),
            F.sum("is_canonical").alias("n_canon"),
            F.first("cluster_id").alias("cid"),
        )
        .filter((F.col("n_canon") != 1) | (F.col("mn") != F.col("cid")))
        .count()
    )
    assert bad == 0
    # every verified pair ended up in one cluster
    pairs = spark.read.parquet(f"{out}/pairs")
    ca = clusters.select(
        F.col("doc_id").alias("doc_a"), F.col("cluster_id").alias("c_a")
    )
    cb = clusters.select(
        F.col("doc_id").alias("doc_b"), F.col("cluster_id").alias("c_b")
    )
    split = (
        pairs.join(ca, "doc_a")
        .join(cb, "doc_b")
        .filter(F.col("c_a") != F.col("c_b"))
        .count()
    )
    assert split == 0
    # kept == number of distinct clusters
    assert res["kept"] == clusters.select("cluster_id").distinct().count()


def test_dedup_job_exact_mode(spark, tmp_path):
    import types

    from jobs.dedup import run

    docs_path = str(tmp_path / "docs")
    spark.createDataFrame(
        [
            (1, "same text here"),
            (2, "same text here"),      # exact dup of 1
            (3, "same text here!"),     # one char off: NOT an exact dup
            (4, None),
            (5, None),                  # null == null under coalesce
        ],
        "doc_id long, text string",
    ).write.parquet(docs_path)

    out = str(tmp_path / "exact_out")
    res = run(
        types.SimpleNamespace(
            input=docs_path,
            output=out,
            id_col="doc_id",
            text_col="text",
            method="exact",
            bands=8,
            rows_per_band=4,
            max_hamming=8,
            verify_jaccard=None,
            master="local[*]",
            shuffle_partitions=None,
        )
    )
    assert res == {
        "wall_s": res["wall_s"],
        "docs": 5,
        "candidate_pairs": 0,
        "kept": 3,
        "removed": 2,
        "dup_rate": 0.4,
    }
    got = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in spark.read.parquet(f"{out}/clusters").collect()
    }
    assert got == {1: (1, 1), 2: (1, 0), 3: (3, 1), 4: (4, 1), 5: (4, 0)}


def test_neardup_modes_screen_empty_texts(spark, tmp_path):
    """Empty/null texts all share the sentinel fingerprint; they must
    NOT cross-match (quadratic pair blowup) — each stays a singleton
    cluster and survives into canonical."""
    import types

    from jobs.dedup import run

    docs_path = str(tmp_path / "docs")
    text = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    spark.createDataFrame(
        [(1, text), (2, text), (3, None), (4, ""), (5, None)],
        "doc_id long, text string",
    ).write.parquet(docs_path)

    out = str(tmp_path / "out")
    res = run(
        types.SimpleNamespace(
            input=docs_path,
            output=out,
            id_col="doc_id",
            text_col="text",
            method="minhash",
            bands=8,
            rows_per_band=4,
            max_hamming=8,
            verify_jaccard=None,
            master="local[*]",
            shuffle_partitions=None,
        )
    )
    assert res["candidate_pairs"] == 1  # only the real dup pair (1,2)
    assert res["kept"] == 4  # 1 canonical of {1,2} + three singletons
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in spark.read.parquet(f"{out}/clusters").collect()
    }
    assert got == {1: 1, 2: 1, 3: 3, 4: 4, 5: 5}
