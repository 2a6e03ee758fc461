"""SemDeDup-style semantic near-dup over an embedding column
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication", arXiv:2303.09540).

Hash-banding (engine/ops/dedup.py) catches lexical near-copies;
semantic dedup catches paraphrases — same meaning, different tokens —
which share no shingles but sit next to each other in embedding
space. Whole-corpus pairwise cosine is O(N^2); the published bound is
k-means clustering of the embedding space and pairwise comparison
ONLY within each cluster:

    train_codebook (engine/ops/kmeans)   sampled Lloyd's, driver work
                                         O(k * dim), corpus never shuffles
    assign_cells                         map-only nearest-centroid
    within-cell self-join                equi-join on cell id — never
                                         all-pairs; exact cosine in
                                         pure JVM array expressions
    threshold filter                     pairs with cos >= threshold

Scale notes (the same discipline as the LSH family):
  * cost is sum_cells(n_c^2), bounded by choosing k ~ sqrt(N) (the
    auto default) so expected occupancy stays ~sqrt(N); a degenerate
    cell (an embedding-space boilerplate blob) would still go
    quadratic inside its key, so cells above `cell_cap` occupancy are
    star-paired against the cell's minimum id instead — fan-out drops
    n(n-1)/2 -> n-1 per hot cell. Unlike LSH candidates, these pairs
    are FINAL (cosine is exact), so star pairs still pass the
    threshold filter: precision is preserved, hot-cell recall is the
    disclosed trade-off (members whose only sub-threshold-free link
    was a non-star pair are not emitted).
  * recall is bounded by the clustering itself: a near-dup pair split
    across two cells is never compared — the paper's own accepted
    approximation. Raising k tightens cells (cheaper, lower recall);
    the exactness path is k=1 (one cell = brute force).
  * vectors cross the one equi-join shuffle; ids + cell fit the
    exchange. No Python in the join — cosine is zip_with/aggregate
    inside codegen; the only Python is the map-only cell assignment
    (one BLAS matmul per Arrow batch, codebook in the closure).

Pairs are (doc_a, doc_b, cos_sim) with doc_a < doc_b — the exact
shape engine/ops/graph.dedup_clusters consumes, so keep-one-per-
semantic-cluster is `dedup_clusters(docs, semantic_neardup_pairs(...))`.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

from engine.ops.kmeans import assign_cells, train_codebook

# Default occupancy above which a cell is star-paired instead of
# all-pairs self-joined: 1024^2/2 pairs from ONE degenerate cell would
# dominate an otherwise-sqrt(N)-occupancy job.
HOT_CELL_CAP = 1024


from engine.ops.vecexpr import cosine_expr as _cosine  # noqa: E402


def semantic_neardup_pairs(
    vecs: DataFrame,
    threshold: float = 0.95,
    k: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cell_cap: int = HOT_CELL_CAP,
    codebook: np.ndarray | None = None,
    sample_per_centroid: int = 256,
    stats: dict | None = None,
) -> DataFrame:
    """Semantic near-dup pairs: (doc_a, doc_b, cos_sim), doc_a < doc_b,
    cos_sim >= threshold, compared within k-means cells only.

    k=None auto-sizes to ~sqrt(N) (expected cell occupancy ~sqrt(N),
    so total pair work stays ~N^1.5 even before the cap). Pass a
    pre-trained `codebook` to reuse one across runs/batches (the
    incremental-dedup pattern: new crawls assign into the SAME cells,
    so batch-vs-index comparison is another equi-join on cell).

    stats (optional dict) records k, n, and hot-cell occupancy spill.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold {threshold} must be in (0, 1]")
    if codebook is None:
        if k is None:
            n = vecs.count()
            k = max(1, min(int(round(n**0.5)), n))
        codebook = train_codebook(
            vecs,
            k,
            vec_col=vec_col,
            id_col=id_col,
            sample_per_centroid=sample_per_centroid,
        )
    if stats is not None:
        stats["k"] = int(len(codebook))

    cells = assign_cells(
        vecs.select(
            F.col(id_col).alias("doc_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        ),
        codebook,
        vec_col="_v",
        cell_col="_cell",
    )

    # Occupancy over the SAME key the self-join shuffles on (one
    # window count, no extra exchange shape) — the dedup.py hot-bucket
    # discipline applied to cells.
    occ = F.count(F.lit(1)).over(Window.partitionBy("_cell"))
    cells = cells.withColumn("_occ", occ)
    cold = cells.filter(F.col("_occ") <= cell_cap).drop("_occ")
    hot = cells.filter(F.col("_occ") > cell_cap).drop("_occ")

    a = cold.select(
        "_cell", F.col("doc_id").alias("doc_a"), F.col("_v").alias("_va")
    )
    b = cold.select(
        "_cell", F.col("doc_id").alias("doc_b"), F.col("_v").alias("_vb")
    )
    pairs = a.join(b, "_cell").filter(F.col("doc_a") < F.col("doc_b"))

    # Hot cells: star-pair every member against the cell-min id. The
    # threshold filter below still applies (pairs here are final, not
    # candidates), so precision is exact; recall inside a hot cell is
    # whatever survives through the star center.
    mins = hot.groupBy("_cell").agg(
        F.min_by(F.struct("doc_id", "_v"), F.col("doc_id")).alias("_m")
    )
    star = (
        hot.join(F.broadcast(mins), "_cell")
        .filter(F.col("doc_id") != F.col("_m.doc_id"))
        .select(
            "_cell",
            F.col("_m.doc_id").alias("doc_a"),
            F.col("_m._v").alias("_va"),
            F.col("doc_id").alias("doc_b"),
            F.col("_v").alias("_vb"),
        )
    )
    if stats is not None:
        stats["hot_cells"] = mins.count()

    out = pairs.unionByName(star).select(
        "doc_a",
        "doc_b",
        _cosine(F.col("_va"), F.col("_vb")).alias("cos_sim"),
    )
    return out.filter(F.col("cos_sim") >= float(threshold))
