"""Distributed Bloom-filter membership screen (Bloom, CACM 1970) for
seen-key dedup at crawl-frontier scale — "have we EVER ingested this
url?" over a 10^12-key history, where the exact `left_anti` join
shuffles the whole probe side against the whole history every run.

The Bloom screen splits that cost by the novelty rate:

  definitely-new keys   (bloom says absent — NO false negatives, a
                        structural property of the filter) skip the
                        exact join entirely;
  maybe-seen keys       (bloom says present; fraction = novelty-rate
                        + fpp) go through the exact anti-join, whose
                        shuffle is now (novelty + fpp) x probe size
                        instead of 1.0 x probe + 1.0 x history.

SURVEY §2 training-data extensions; the same screen serves benchmark
decontamination probes and incremental near-dup candidate pruning.

Spark-first shape:

  * BUILD is one keys-only shuffle: bucket = pmod(xxhash64(key), B),
    groupBy(bucket).applyInPandas sets k bit positions per key into a
    numpy bitmap — one (bucket, bitmap, n_keys) row per bucket. Only
    the key strings move; payloads never shuffle. Bucketing keeps any
    single task's bitmap at m/B bits regardless of total filter size,
    so a 10^12-key / ~1.2 TB filter builds as B bounded tasks.
  * PROBE is map-only per bucket: the filter table equi-joins onto the
    probe side by bucket. When the whole bitmap fits the broadcast
    budget (delta-sized histories; the common re-crawl case) the join
    broadcasts and the probe side NEVER shuffles — `bloom_probe`
    force-broadcasts under `broadcast_bytes` and falls back to a
    bucket equi-join above it (keys+bucket shuffle, still no payload
    movement). Bit tests run in ONE Arrow pass, vectorized numpy over
    the batch, bitmap decoded once per (batch, bucket).
  * All hash positions derive from xxhash64(key, seed_i) — pure
    column functions of the key, so build and probe agree across
    runs, partitionings, and cluster sizes with no RNG state (the
    engine/ops/sample.py determinism discipline).

Sizing: `plan_bloom(n_keys, fpp)` gives the textbook optimum
m = -n ln p / (ln 2)^2 bits, k = m/n ln 2 hashes.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import BooleanType

BLOOM_DDL = "bucket int, bitmap binary, n_keys long"

# build-side applyInPandas materializes one bucket's (k+1) int64 columns;
# 4M keys x 8 cols x 8B ~= 256MB per task worst-case — executor-sized.
_MAX_KEYS_PER_BUCKET = 4_000_000


def plan_bloom(n_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """Optimal (m_bits_total, k_hashes) for n keys at target fpp."""
    if n_keys <= 0:
        raise ValueError("n_keys must be > 0")
    if not 0.0 < fpp < 1.0:
        raise ValueError(f"fpp {fpp} outside (0, 1)")
    m = int(math.ceil(-n_keys * math.log(fpp) / (math.log(2) ** 2)))
    k = max(1, int(round(m / n_keys * math.log(2))))
    return m, k


def _positions_cols(key, m_per_bucket: int, k: int) -> list:
    """k bit positions within the key's bucket-local bitmap. Seeds are
    string literals so build and probe share one derivation."""
    return [
        F.pmod(F.xxhash64(key, F.lit(f"bloom:{i}")), F.lit(m_per_bucket))
        .cast("long")
        .alias(f"_p{i}")
        for i in range(k)
    ]


def bucket_col(key, n_buckets: int):
    return F.pmod(F.xxhash64(key, F.lit("bloom:bucket")), F.lit(n_buckets)).cast(
        "int"
    )


def build_bloom(
    df: DataFrame,
    key_col: str,
    m_bits: int,
    k: int,
    n_buckets: int = 64,
) -> DataFrame:
    """keys -> one (bucket, bitmap, n_keys) row per bucket. m_bits is
    the TOTAL filter size; each bucket owns an m_bits/n_buckets slice
    (rounded up to bytes). Distinct keys only (re-inserting a key is
    a no-op in a Bloom filter, so dropDuplicates first keeps the
    keys-only shuffle minimal). Empty buckets are absent — the probe
    treats a missing bucket as all-zeros (nothing inserted).

    Group-memory bound: applyInPandas materializes one bucket's rows
    (n_keys/n_buckets x (k+1) int64s) in a single task — size
    n_buckets so that stays executor-sized (build_bloom_for does this
    automatically: <= ~4M keys per bucket)."""
    if m_bits < n_buckets * 8:
        raise ValueError("m_bits must give every bucket >= 1 byte")
    if k < 1:
        raise ValueError("k must be >= 1")
    m_per = ((m_bits // n_buckets) + 7) // 8 * 8  # whole bytes per bucket
    n_bytes = m_per // 8
    key = F.col(key_col)
    keyed = (
        df.select(key.alias("_k"))
        .where(key.isNotNull())
        .dropDuplicates(["_k"])
        .select(
            bucket_col(F.col("_k"), n_buckets).alias("bucket"),
            *_positions_cols(F.col("_k"), m_per, k),
        )
    )

    def _fold(pdf: pd.DataFrame) -> pd.DataFrame:
        bitmap = np.zeros(n_bytes, dtype=np.uint8)
        for i in range(k):
            pos = pdf[f"_p{i}"].to_numpy(dtype=np.int64)
            np.bitwise_or.at(bitmap, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        return pd.DataFrame(
            {
                "bucket": [int(pdf["bucket"].iloc[0])],
                "bitmap": [bitmap.tobytes()],
                "n_keys": [len(pdf)],
            }
        )

    return keyed.groupBy("bucket").applyInPandas(_fold, BLOOM_DDL)


def _probe_batch(bucket: pd.Series, bitmap: pd.Series, positions) -> tuple:
    """One Arrow batch of bit tests. Returns (hits bool[n], n_decoded).

    The bitmap is decoded ONCE per (batch, bucket) — the cache key is
    the bucket id, NOT the bytes object: after the join every row
    materializes its own bytes copy, so identity/content hashing would
    either never hit or cost O(bitmap) per row; within one bloom table
    the bucket id functionally determines the bitmap. With the cache,
    the stacked matrix is (distinct buckets x n_bytes), not
    (rows x n_bytes) — the difference between MBs and tens of GB per
    batch under a 512MB broadcast filter."""
    n = len(bitmap)
    bk = bucket.to_numpy(dtype="float64", na_value=np.nan)
    cache: dict[int, int] = {}
    mats: list[np.ndarray] = []
    idx = np.full(n, -1, dtype=np.int64)
    for row in range(n):
        if np.isnan(bk[row]):
            continue  # NULL key — never insertable
        b = bitmap.iloc[row]
        if b is None:
            continue  # absent bucket row (nothing inserted there)
        at = cache.get(int(bk[row]))
        if at is None:
            at = cache[int(bk[row])] = len(mats)
            mats.append(np.frombuffer(b, dtype=np.uint8))
        idx[row] = at
    if not mats:
        return np.zeros(n, dtype=bool), 0
    mat = np.stack(mats)
    valid = idx >= 0
    hit = valid.copy()
    safe_idx = np.where(valid, idx, 0)
    for p in positions:
        pv = p.to_numpy(dtype="float64", na_value=np.nan)
        pos_ok = ~np.isnan(pv)
        pos = np.where(pos_ok, pv, 0.0).astype(np.int64)
        byte = mat[safe_idx, pos >> 3]
        hit &= pos_ok & (((byte >> (pos & 7).astype(np.uint8)) & 1) == 1)
    return hit, len(mats)


def bloom_probe(
    docs: DataFrame,
    bloom: DataFrame,
    key_col: str,
    k: int,
    n_buckets: int = 64,
    out_col: str = "maybe_seen",
    broadcast_bytes: int = 512 * 1024 * 1024,
) -> DataFrame:
    """docs -> docs + boolean out_col: False = DEFINITELY never
    inserted (no false negatives), True = maybe seen (true positive or
    fpp). NULL keys are maybe_seen=False (never insertable). The
    filter side broadcasts when its bitmap total fits broadcast_bytes;
    above that it falls back to a bucket equi-join (AQE decides), which
    shuffles only (key, bucket, k positions) on the probe side."""
    sizes = bloom.select(
        F.count(F.lit(1)).alias("rows"),
        F.coalesce(F.sum(F.length("bitmap")), F.lit(0)).alias("bytes"),
        F.max(F.length("bitmap")).alias("bpb"),
    ).collect()[0]
    n_bytes = int(sizes["bpb"] or 0)
    m_per = n_bytes * 8
    filt = bloom.select("bucket", "bitmap")
    if int(sizes["bytes"]) <= broadcast_bytes:
        filt = F.broadcast(filt)

    key = F.col(key_col)
    probed = docs.withColumn(
        "_bloom_bucket",
        F.when(key.isNotNull(), bucket_col(key, n_buckets)),
    )
    for i, c in enumerate(_positions_cols(key, max(m_per, 1), k)):
        probed = probed.withColumn(f"_bp{i}", F.when(key.isNotNull(), c))
    joined = probed.join(
        filt.withColumnRenamed("bucket", "_bloom_bucket"),
        "_bloom_bucket",
        "left",
    )

    pos_cols = [f"_bp{i}" for i in range(k)]

    @F.pandas_udf(BooleanType())
    def _test(bucket: pd.Series, bitmap: pd.Series, *positions: pd.Series) -> pd.Series:
        hits, _ = _probe_batch(bucket, bitmap, positions)
        return pd.Series(hits)

    result = joined.withColumn(
        out_col,
        _test(
            F.col("_bloom_bucket"), F.col("bitmap"), *[F.col(c) for c in pos_cols]
        ),
    )
    return result.drop("bitmap", "_bloom_bucket", *pos_cols)


def screen_new_keys(
    docs: DataFrame,
    history: DataFrame,
    key_col: str,
    bloom: DataFrame,
    k: int,
    n_buckets: int = 64,
) -> DataFrame:
    """The two-phase frontier screen: Bloom first (map-only-ish), exact
    anti-join ONLY for the maybe-seen survivors — returns docs whose
    key is truly new. Exactness is preserved (no false negatives means
    no new key is ever dropped; the anti-join removes the fpp), but
    the expensive join now carries (novelty + fpp) x docs instead of
    all of docs vs all of history."""
    probed = bloom_probe(docs, bloom, key_col, k, n_buckets=n_buckets)
    definitely_new = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    suspects = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    verified_new = suspects.join(
        history.select(F.col(key_col)).dropDuplicates([key_col]),
        key_col,
        "left_anti",
    )
    return definitely_new.unionByName(verified_new)


def build_bloom_for(
    spark: SparkSession,
    history: DataFrame,
    key_col: str,
    n_keys_hint: int | None = None,
    fpp: float = 0.01,
    n_buckets: int = 64,
) -> tuple[DataFrame, int, int]:
    """Convenience: size from a hint (or one count) and build.
    Returns (bloom_df, k, n_buckets) — persist the bloom table once per
    epoch and reuse it across every incoming batch. n_buckets is a
    floor: it grows so no bucket's build group exceeds ~4M keys (the
    applyInPandas group-memory bound in build_bloom). Probers MUST use
    the returned n_buckets — probing with a different bucket count
    reads the wrong bucket's bitmap and produces false NEGATIVES,
    which breaks screen_new_keys' exactness contract (review r3)."""
    n = n_keys_hint if n_keys_hint is not None else history.count()
    n_buckets = max(n_buckets, -(-max(n, 1) // _MAX_KEYS_PER_BUCKET))
    m, k = plan_bloom(max(n, 1), fpp)
    m = max(m, n_buckets * 8)  # tiny histories: >= 1 byte per bucket
    return (
        build_bloom(history, key_col, m, k, n_buckets=n_buckets),
        k,
        n_buckets,
    )
