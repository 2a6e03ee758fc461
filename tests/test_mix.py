"""Training-mix shaping (engine/ops/mix.py): host share stats vs a
DuckDB oracle, domain rebalancing caps, deterministic splits, and the
near-dup split-leakage audit."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from engine.ops.mix import (
    assign_splits,
    host_token_shares,
    rebalance_domains,
    split_leakage,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _docs(spark):
    """sf0.001 documents with source as host and q27's token count."""
    return spark.read.parquet(DOCS).select(
        "doc_id",
        F.col("source").alias("host"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )


def test_host_token_shares_oracle(spark):
    got = {
        r["host"]: (r["host_tokens"], round(r["share"], 10))
        for r in host_token_shares(_docs(spark)).collect()
    }
    want = duckdb.sql(
        f"""
        WITH d AS (
          SELECT source AS host,
                 CAST(LENGTH(text) - LENGTH(REPLACE(text,' ','')) + 1 AS BIGINT)
                   AS n_tokens
          FROM read_parquet('{DOCS}')
        ), h AS (
          SELECT host, CAST(SUM(n_tokens) AS BIGINT) AS host_tokens FROM d GROUP BY host
        )
        SELECT host, host_tokens,
               host_tokens / CAST((SELECT SUM(host_tokens) FROM h) AS DOUBLE) AS share
        FROM h
        """
    ).fetchall()
    assert len(want) == len(got) > 0
    for host, toks, share in want:
        gt, gs = got[host]
        assert gt == toks and abs(gs - share) < 1e-9


def _skewed(spark):
    """Synthetic corpus: megahost has ~60% of tokens, 6 small hosts."""
    rows = []
    for i in range(600):
        rows.append((i, "megahost", 100))
    for h in range(6):
        for i in range(100):
            rows.append((1000 + h * 100 + i, f"small{h}", 66))
    return spark.createDataFrame(rows, "doc_id long, host string, n_tokens long")


def test_rebalance_caps_expected(spark):
    docs = _skewed(spark)
    total = 600 * 100 + 6 * 100 * 66  # 99600
    cap = 0.2 * total
    kept = rebalance_domains(docs, 0.2)
    # under-cap hosts byte-identical (never touched, not even reordered cols)
    small_in = docs.filter("host != 'megahost'").orderBy("doc_id").collect()
    small_out = kept.filter("host != 'megahost'").orderBy("doc_id").collect()
    assert small_in == small_out
    # over-cap host lands near the cap (hash-Bernoulli: expected == cap)
    mega = kept.filter("host = 'megahost'").agg(F.sum("n_tokens")).collect()[0][0]
    assert abs(mega - cap) / cap < 0.15
    assert kept.columns == docs.columns


def test_rebalance_exact_hard_cap(spark):
    docs = _skewed(spark)
    total = 99600
    cap = int(0.2 * total)
    kept = rebalance_domains(docs, 0.2, exact=True)
    mega = kept.filter("host = 'megahost'").agg(F.sum("n_tokens")).collect()[0][0]
    assert mega <= cap  # hard guarantee
    assert mega >= cap - 100  # prefix fills to within one max-doc
    # determinism across partitionings
    k2 = rebalance_domains(docs.repartition(17), 0.2, exact=True)
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
        r["doc_id"] for r in k2.collect()
    )


def test_rebalance_noop_when_balanced(spark):
    docs = _skewed(spark).filter("host != 'megahost'")
    kept = rebalance_domains(docs, 0.5)
    assert kept.count() == docs.count()


def test_rebalance_validation(spark):
    with pytest.raises(ValueError):
        rebalance_domains(_skewed(spark), 0.0)


def test_assign_splits_weights_and_cohesion(spark):
    docs = spark.createDataFrame(
        [(i, f"host{i % 500}") for i in range(5000)], "doc_id long, host string"
    )
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    lab = assign_splits(docs, w)
    counts = {r["split"]: r["n"] for r in lab.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) <= set(w)
    for name, frac in w.items():
        assert abs(counts.get(name, 0) / 5000 - frac) < 0.06
    # cohesion: every page of a host is in exactly one split
    assert (
        lab.groupBy("host")
        .agg(F.countDistinct("split").alias("k"))
        .filter("k > 1")
        .count()
        == 0
    )
    # determinism
    lab2 = assign_splits(docs.repartition(9), w)
    assert sorted(map(tuple, lab.collect())) == sorted(map(tuple, lab2.collect()))


def test_assign_splits_validation(spark):
    docs = spark.createDataFrame([(1, "h")], "doc_id long, host string")
    with pytest.raises(ValueError):
        assign_splits(docs, {"train": 0.5, "val": 0.4})
    with pytest.raises(ValueError):
        assign_splits(docs, {})
    with pytest.raises(ValueError):
        assign_splits(docs, {"train": 1.1, "val": -0.1})


def test_split_leakage_detects_planted_pair(spark):
    labeled = spark.createDataFrame(
        [(1, "train"), (2, "test"), (3, "train"), (4, "train")],
        "doc_id long, split string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (3, 4)], "doc_a long, doc_b long"
    )
    leaks = split_leakage(pairs, labeled).collect()
    assert len(leaks) == 1
    assert {leaks[0]["doc_a"], leaks[0]["doc_b"]} == {1, 2}
    assert {leaks[0]["split_a"], leaks[0]["split_b"]} == {"train", "test"}


def test_split_leakage_with_minhash_pairs(spark):
    """Composition: LSH candidate pairs x splits on the shared
    documents table. Host-keyed splitting's structural guarantee is
    that a SAME-host near-dup pair can never straddle splits (both
    sides hash to the same split); cross-host near-dups remain, which
    is exactly what the audit exists to surface."""
    from engine.ops.dedup import minhash_candidate_pairs

    docs = spark.read.parquet(DOCS).select(
        "doc_id", F.col("source").alias("host"), "text"
    )
    pairs = minhash_candidate_pairs(
        docs.select("doc_id", "text"), n_bands=8, rows_per_band=4
    )
    assert pairs.count() > 0
    w = {"train": 0.9, "test": 0.1}
    leaks = split_leakage(
        pairs, assign_splits(docs, w, key_col="host"), id_col="doc_id"
    )
    hosts = docs.select("doc_id", "host")
    ha = hosts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("host", "host_a")
    hb = hosts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("host", "host_b")
    same_host_leaks = (
        leaks.join(ha, "doc_a").join(hb, "doc_b").filter("host_a = host_b").count()
    )
    assert same_host_leaks == 0


def test_rebalance_exact_small_overcap_host_never_vanishes(spark):
    """Round-3 review regression: an over-cap host with FEW, LARGE
    docs must not be zeroed (or thinned below the cap) by the exact
    mode's Bernoulli pre-thin — small hosts skip the pre-thin and the
    cumsum window sees every doc, so the prefix fills the cap exactly
    regardless of where the id hashes land."""
    rows = [(i, "whale", 30_000) for i in range(4)]
    rows += [(100 + i, f"s{i}", 1_000) for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, host string, n_tokens long")
    total = 4 * 30_000 + 60 * 1_000  # 180_000; whale share = 2/3
    cap = int((1 / 3) * total)  # 60_000 -> exactly two whale docs fit
    kept = rebalance_domains(docs, 1 / 3, exact=True)
    wt = kept.filter("host = 'whale'").agg(F.sum("n_tokens")).collect()[0][0]
    assert wt == cap
    assert kept.filter("host != 'whale'").count() == 60
    assert kept.columns == docs.columns


def test_rebalance_exact_oversize_doc_cannot_block_host(spark):
    """Round-3 review: a doc individually larger than cap_tokens must
    be excluded BEFORE the prefix cumsum — left in, it would (when it
    sorts early in hash order) push _cum past the cap on row one and
    zero the host even though plenty of small docs would fit."""
    rows = [(1, "whale", 65_000)]  # alone exceeds the cap
    rows += [(10 + i, "whale", 10_000) for i in range(10)]
    rows += [(200 + i, f"s{i}", 1_350) for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, host string, n_tokens long")
    total = 65_000 + 100_000 + 135_000  # 300_000
    cap = int(0.2 * total)  # 60_000
    kept = rebalance_domains(docs, 0.2, exact=True)
    wt = kept.filter("host = 'whale'").agg(F.sum("n_tokens")).collect()[0][0]
    # the oversize doc is gone, and the 10k docs fill the cap exactly
    # (they all fit pairwise: 6 * 10_000 == cap)
    assert wt == cap
    assert kept.filter("doc_id = 1").count() == 0
    assert kept.filter("host != 'whale'").count() == 100


def test_temperature_mix_targets_and_determinism(spark):
    """alpha<1 flattens token shares toward q_i ∝ p_i^alpha with the
    biggest-boost group kept whole; closed-form keep fractions and the
    realized mix both pinned; deterministic across partitionings;
    alpha=1 is a row-exact no-op."""
    import numpy as np

    from engine.ops.mix import temperature_mix

    sizes = {"en": 7000, "de": 2000, "sw": 1000}
    rows = [
        (f"{g}-{i}", g, 10)
        for g, n in sizes.items()
        for i in range(n)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id string, lang string, n_tokens int"
    )

    out = temperature_mix(docs, alpha=0.5)
    got = {
        r["lang"]: r["tok"]
        for r in out.groupBy("lang")
        .agg(F.sum("n_tokens").alias("tok"))
        .collect()
    }
    # closed form: p = sizes/total; keep_i = p_i^(a-1) / max_j p_j^(a-1)
    p = np.array([0.7, 0.2, 0.1])
    keep = p ** -0.5 / (p ** -0.5).max()   # [0.378, 0.707, 1.0]
    expect = {g: s * 10 * k for (g, s), k in zip(sizes.items(), keep)}
    for g in sizes:
        assert abs(got[g] - expect[g]) / expect[g] < 0.05, (g, got[g], expect[g])
    # realized shares match q ∝ sqrt(p) within sampling error
    tot = sum(got.values())
    q = np.sqrt(p) / np.sqrt(p).sum()
    for g, qi in zip(sizes, q):
        assert abs(got[g] / tot - qi) < 0.03, (g, got[g] / tot, qi)

    ids1 = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    ids2 = sorted(
        r["doc_id"]
        for r in temperature_mix(docs.repartition(13), alpha=0.5)
        .select("doc_id")
        .collect()
    )
    assert ids1 == ids2  # pure function of (id, salt)

    noop = temperature_mix(docs, alpha=1.0)
    assert noop.count() == docs.count()


def test_temperature_mix_corpus_never_shuffled(spark):
    """The corpus side stays map-only: stats and keep fractions ride a
    broadcast join; no Exchange touches the docs frame."""
    from tests.test_plans import plan

    from engine.ops.mix import temperature_mix

    docs = spark.createDataFrame(
        [(f"d{i}", "en" if i % 3 else "de", 10) for i in range(60)],
        "doc_id string, lang string, n_tokens int",
    )
    p = plan(temperature_mix(docs, alpha=0.3))
    import re

    # exchanges exist for the tiny shares aggregation; none may carry
    # the corpus columns (text-side hash partitioning of doc rows)
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", p):
        assert "doc_id" not in m.group(1), p


def test_temperature_mix_min_group_floor(spark):
    """A tiny stray group must not become the kept-whole reference:
    with the floor it is kept whole AND excluded from the normalizer,
    so the real groups' keep fractions are computed among themselves."""
    from engine.ops.mix import temperature_mix

    rows = (
        [(f"en-{i}", "en", 10) for i in range(700)]
        + [(f"de-{i}", "de", 10) for i in range(300)]
        + [("stray-0", "xx", 10)]
    )
    docs = spark.createDataFrame(
        rows, "doc_id string, lang string, n_tokens int"
    )
    out = temperature_mix(docs, alpha=0.5, min_group_tokens=100)
    got = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert got.get("xx") == 1  # floor group kept whole
    # de (smaller real group) is the reference: kept ~whole
    assert got["de"] > 270
    # en thinned toward sqrt-share ratio: keep ~ sqrt(0.3/0.7) = 0.655
    assert 0.55 < got["en"] / 700 < 0.75
    # without the floor the stray group crushes everything
    crushed = temperature_mix(docs, alpha=0.5)
    assert crushed.count() < out.count() / 3


def test_temperature_mix_zero_token_group_is_harmless(spark):
    """A group whose docs all have zero tokens must not become an
    Infinity normalizer that empties the corpus."""
    from engine.ops.mix import temperature_mix

    rows = (
        [(f"en-{i}", "en", 10) for i in range(70)]
        + [(f"de-{i}", "de", 10) for i in range(30)]
        + [("empty-0", "xx", 0)]
    )
    docs = spark.createDataFrame(
        rows, "doc_id string, lang string, n_tokens int"
    )
    out = temperature_mix(docs, alpha=0.5)
    got = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert got.get("xx") == 1          # kept whole, carries no weight
    assert got.get("de", 0) > 20       # real groups survive
    assert got.get("en", 0) > 30
