"""Near-duplicate dedup operators, reusable over any (id, text) table.

Pipeline shape (SURVEY.md §2 LLM-ops):

    minhash_candidate_pairs      shingle -> minhash sig -> band hash ->
                                 bucket equi-join -> candidate pairs
    jaccard_verify (optional)    exact shingle-set Jaccard over the
                                 candidates only (kills LSH false
                                 positives before clustering)
    engine.ops.graph.dedup_clusters
                                 pairs -> connected components ->
                                 (doc_id, cluster_id, is_canonical)

Scale notes:
  * the LSH self-join is an equi-join on (band, band_hash) — bucketed,
    never all-pairs; hot buckets (boilerplate-heavy corpora) are the
    skew-join case engine/partitioning.salted_join handles.
  * verification joins text onto the PAIRS (a small fraction of docs),
    so the heavy text column crosses a shuffle only pairs-many times,
    twice — never docs x docs.
  * at 10^12 docs the signature table is materialized to storage
    between runs; here `persist()` marks the same reuse seam.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from engine.kernels import fingerprint as fp
from engine.udfs import minhash_udf


def minhash_bands(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bands: int = 8,
    rows_per_band: int = 4,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, text) -> the LSH band table (doc_id, band, bh[, carried]).

    This is the materialization seam: batch dedup self-joins it
    (minhash_candidate_pairs), streaming dedup stream-static-joins new
    docs against a persisted copy of it (engine.streaming.
    neardup_stream — which carries the event-time column through via
    carry_cols so the stream's watermark survives). n_bands x
    rows_per_band must not exceed the minhash signature length
    (engine.kernels.fingerprint.MINHASH_K).
    """
    if n_bands * rows_per_band > fp.MINHASH_K:
        raise ValueError(
            f"{n_bands}x{rows_per_band} exceeds MINHASH_K={fp.MINHASH_K}"
        )
    carry = [F.col(c) for c in carry_cols]
    sigs = docs.select(
        F.col(id_col).alias("doc_id"),
        minhash_udf(F.col(text_col)).alias("sig"),
        *carry,
    )
    return sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.slice("sig", 1 + rows_per_band * b, rows_per_band)
                    for b in range(n_bands)
                ]
            )
        ).alias("band", "band_sig"),
        *carry,
    ).select("doc_id", "band", F.hash("band_sig").alias("bh"), *carry)


def minhash_candidate_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bands: int = 8,
    rows_per_band: int = 4,
) -> DataFrame:
    """(id, text) -> candidate near-dup pairs (doc_a < doc_b).

    Two docs collide iff they agree on ALL rows of at least one band —
    the standard S-curve trade-off: more bands = higher recall, wider
    bands = higher precision.
    """
    bands = minhash_bands(docs, id_col, text_col, n_bands, rows_per_band)
    # both sides of the self-join read this subtree: localCheckpoint so
    # the minhash UDF runs ONCE per document, not twice, and the
    # materialized partitions release when this DF is GC'd (persist()
    # would leak cache entries across repeated per-session invocations;
    # at 10^12 scale the signature table is written to storage instead)
    bands = bands.localCheckpoint(eager=True)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def simhash_candidate_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    n_bands: int = 4,
    bits_per_band: int = 16,
) -> DataFrame:
    """(id, text) -> near-dup pairs (doc_a < doc_b, hamming) whose
    64-bit SimHash fingerprints differ in <= max_hamming bits.

    Banding trick for hamming space: two hashes within max_hamming of
    each other very likely agree exactly on at least one of the
    n_bands bit slices (guaranteed when max_hamming < n_bands), so the
    self-join is an equi-join on (band, slice) — bucketed, never
    all-pairs — with the exact hamming filter applied to candidates.
    """
    from engine.udfs import simhash_udf

    if n_bands * bits_per_band > 64:
        raise ValueError("bands exceed the 64-bit fingerprint")
    mask = (1 << bits_per_band) - 1
    sh = docs.select(
        F.col(id_col).alias("doc_id"), simhash_udf(F.col(text_col)).alias("sim")
    )
    bands = sh.select(
        "doc_id",
        "sim",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("sim"), bits_per_band * i)
                    .bitwiseAND(F.lit(mask))
                    for i in range(n_bands)
                ]
            )
        ).alias("band", "key"),
    )
    # localCheckpoint: the self-join otherwise evaluates the simhash
    # UDF twice; auto-released on GC (persist would leak across calls)
    bands = bands.localCheckpoint(eager=True)
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sim").alias("sim_a"),
            F.col("b.sim").alias("sim_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


@pandas_udf(DoubleType())
def _jaccard_udf(text_a: pd.Series, text_b: pd.Series) -> pd.Series:
    out = []
    for ta, tb in zip(text_a, text_b):
        sa, sb = fp.shingles(ta or ""), fp.shingles(tb or "")
        union = len(sa | sb)
        out.append(len(sa & sb) / union if union else 1.0)
    return pd.Series(out, dtype="float64")


def jaccard_verify(
    pairs: DataFrame,
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Filter candidate pairs to exact shingle-Jaccard >= threshold.

    Adds a `jaccard` column. Text is joined onto the pairs side (pairs
    << docs at any real dup rate), so each join shuffles only the rows
    that survive the LSH filter. A doc appearing in many pairs
    recomputes its shingle set per pair — bounded by the pair count,
    which verification exists to keep small.
    """
    ta = docs.select(
        F.col(id_col).alias("doc_a"), F.col(text_col).alias("_text_a")
    )
    tb = docs.select(
        F.col(id_col).alias("doc_b"), F.col(text_col).alias("_text_b")
    )
    return (
        pairs.join(ta, "doc_a")
        .join(tb, "doc_b")
        .withColumn("jaccard", _jaccard_udf("_text_a", "_text_b"))
        .filter(F.col("jaccard") >= F.lit(threshold))
        .drop("_text_a", "_text_b")
    )
