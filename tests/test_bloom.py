from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engine.ops.bloom import (
    _probe_batch,
    bloom_probe,
    build_bloom,
    build_bloom_for,
    plan_bloom,
    screen_new_keys,
)


def test_plan_bloom_textbook_sizes():
    m, k = plan_bloom(1000, 0.01)
    assert 9000 <= m <= 10100  # ~9.6 bits/key at 1% fpp
    assert k == 7
    with pytest.raises(ValueError):
        plan_bloom(0, 0.01)
    with pytest.raises(ValueError):
        plan_bloom(10, 1.5)


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "url string")


def test_no_false_negatives_and_bounded_fpp(spark):
    members = [f"https://h{i % 37}.example/{i}" for i in range(600)]
    others = [f"https://new{i % 41}.example/x{i}" for i in range(3000)]
    m, k = plan_bloom(len(members), 0.01)
    bloom = build_bloom(
        _keys_df(spark, members), "url", m, k, n_buckets=16
    ).localCheckpoint(eager=True)

    probe_in = bloom_probe(
        _keys_df(spark, members), bloom, "url", k, n_buckets=16
    )
    assert probe_in.filter(~F.col("maybe_seen")).count() == 0  # structural

    probe_out = bloom_probe(
        _keys_df(spark, others), bloom, "url", k, n_buckets=16
    )
    fp = probe_out.filter(F.col("maybe_seen")).count()
    assert fp / len(others) < 0.05  # target 1%, generous 5x slack


def test_build_is_partition_invariant(spark):
    members = [f"u{i}" for i in range(400)]
    df = _keys_df(spark, members)
    m, k = plan_bloom(len(members), 0.02)
    b1 = build_bloom(df.repartition(1), "url", m, k, n_buckets=8)
    b16 = build_bloom(df.repartition(16), "url", m, k, n_buckets=8)
    rows1 = {r["bucket"]: bytes(r["bitmap"]) for r in b1.collect()}
    rows16 = {r["bucket"]: bytes(r["bitmap"]) for r in b16.collect()}
    assert rows1 == rows16


def test_null_keys_never_seen(spark):
    df = spark.createDataFrame([("a",), (None,)], "url string")
    bloom, k, _nb = build_bloom_for(spark, _keys_df(spark, ["a", "b"]), "url")
    out = {
        r["url"]: r["maybe_seen"]
        for r in bloom_probe(df, bloom.localCheckpoint(eager=True), "url", k).collect()
    }
    assert out["a"] is True
    assert out[None] is False


def test_screen_new_keys_is_exact(spark):
    history = _keys_df(spark, [f"old{i}" for i in range(300)])
    incoming = _keys_df(
        spark,
        [f"old{i}" for i in range(0, 300, 3)]  # 100 re-crawls
        + [f"new{i}" for i in range(150)],
    )
    bloom, k, nb = build_bloom_for(spark, history, "url", fpp=0.05)
    bloom = bloom.localCheckpoint(eager=True)
    got = screen_new_keys(incoming, history, "url", bloom, k, n_buckets=nb)
    urls = sorted(r["url"] for r in got.collect())
    assert urls == sorted(f"new{i}" for i in range(150))


def test_probe_reports_absent_bucket_as_unseen(spark):
    # filter built over keys that all land in a few buckets; probing a
    # key whose bucket row is absent must read as definitely-new
    members = ["only-one-key"]
    m, k = plan_bloom(64, 0.01)
    bloom = build_bloom(
        _keys_df(spark, members), "url", m, k, n_buckets=64
    ).localCheckpoint(eager=True)
    assert bloom.count() == 1
    probe = bloom_probe(
        _keys_df(spark, [f"q{i}" for i in range(64)]), bloom, "url", k
    )
    # at most the handful that share the single occupied bucket AND
    # collide on all k bits can be maybe_seen; the rest hit absent rows
    assert probe.filter(F.col("maybe_seen")).count() <= 2


def test_probe_batch_decodes_each_bucket_once():
    """The batch kernel must stack ONE matrix row per DISTINCT bucket,
    not per probe row — the join rematerializes a fresh bytes object
    per row, so an identity-keyed cache silently degrades to
    rows x n_bytes memory. Also pins NULL-key and absent-bucket rows."""
    import pandas as pd

    bm_a = bytes([0b0000_0011] + [0] * 7)  # bits 0,1 set
    bm_b = bytes([0b0000_0100] + [0] * 7)  # bit 2 set
    # 6 rows over 2 buckets, each row carrying its own bytes copy,
    # plus a NULL-key row and an absent-bucket (bitmap None) row
    bucket = pd.Series([0, 0, 1, 1, 0, 1, None, 2], dtype="Int32")
    bitmap = pd.Series(
        [bytes(bm_a), bytes(bm_a), bytes(bm_b), bytes(bm_b), bytes(bm_a), bytes(bm_b), None, None],
        dtype=object,
    )
    pos = pd.Series([0, 2, 2, 0, 1, 2, None, 0], dtype="Int64")
    hits, n_decoded = _probe_batch(bucket, bitmap, (pos,))
    assert n_decoded == 2  # one decode per bucket, not per row
    assert list(hits) == [True, False, True, False, True, True, False, False]


def test_probe_broadcasts_filter_and_never_shuffles_docs(spark):
    """The scale contract: under broadcast_bytes the filter side rides
    a BroadcastHashJoin and the probe side has NO Exchange — probing
    is map-only over the docs."""
    from tests.test_plans import plan

    members = [f"u{i}" for i in range(200)]
    bloom, k, _nb = build_bloom_for(spark, _keys_df(spark, members), "url")
    bloom = bloom.localCheckpoint(eager=True)
    q = bloom_probe(_keys_df(spark, ["u1", "q2"]), bloom, "url", k)
    p = plan(q)
    assert "BroadcastHashJoin" in p, p
    assert "Exchange hashpartitioning" not in p, p


def test_screen_exact_when_bucket_floor_grows(spark, monkeypatch):
    """When build_bloom_for grows n_buckets above the 64 floor (huge
    histories), probing with the RETURNED bucket count keeps the
    no-false-negative contract — the review-r3 regression where a
    prober defaulting to 64 read the wrong bucket's bitmap and let
    seen keys through as definitely-new."""
    import engine.ops.bloom as eb

    monkeypatch.setattr(eb, "_MAX_KEYS_PER_BUCKET", 3)
    history = _keys_df(spark, [f"old{i}" for i in range(300)])
    bloom, k, nb = build_bloom_for(spark, history, "url")
    assert nb > 64  # the floor actually grew in this fixture
    bloom = bloom.localCheckpoint(eager=True)
    incoming = _keys_df(
        spark, [f"old{i}" for i in range(100)] + [f"new{i}" for i in range(50)]
    )
    got = screen_new_keys(incoming, history, "url", bloom, k, n_buckets=nb)
    assert sorted(r["url"] for r in got.collect()) == sorted(
        f"new{i}" for i in range(50)
    )
