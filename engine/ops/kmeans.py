"""Distributed k-means codebook training + trained-IVF ANN search
(SURVEY §2 training-data extensions; upgrades the ANN cell-probe path:
q35 demonstrates IVF mechanics over a deterministic sampled codebook —
this module TRAINS the codebook the way a production IVF index would).

Spark-first shape (the MLlib discipline, reimplemented on the public
DataFrame API):

  * the trainer runs on a deterministic HASH-SAMPLE of the corpus
    (`sample_per_centroid` rows per centroid in expectation — the
    standard IVF recipe: a codebook needs k*O(100) training vectors,
    never the full 10^12-row table). The sample is a pure function of
    (id, salt), reproducible across runs and partitionings
    (engine/ops/sample.py's rule).
  * each Lloyd iteration is ONE map-only pass over the localCheckpointed
    sample: a mapInPandas fn holds the current codebook in its closure
    (broadcast-by-closure, same as q35's assignment), assigns each
    Arrow batch with one BLAS matmul, and emits per-batch PARTIAL rows
    (cid, n, sum_vec) — k rows per task regardless of data size.
  * partials are collected and combined on the driver: tasks x k
    codebook-sized rows, the treeAggregate contract — driver work is
    O(k * dim * tasks), independent of N. No groupBy shuffle at all.
  * convergence = max centroid L2 shift < tol, or max_iter. An empty
    cell keeps its previous centroid (documented; reseeding is a
    quality refinement, not a correctness one).

Determinism: assignment and the per-batch matmul are deterministic;
the only float nondeterminism is partial-sum addition order across
tasks, so centroids are reproducible to ~1e-12 relative, not bitwise,
under repartitioning (tests pin 1e-6).

Search (`ivf_topk`): queries assign to their `nprobe` nearest cells
(multi-probe — recovers recall lost at cell boundaries), candidates
join on cell id (equi-join on a small key, broadcast query side),
exact cosine re-rank inside the probed cells only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

# the engine's ONE deterministic sampling rule (review r3: this module
# briefly carried its own copy; one implementation, one place)
from engine.ops.sample import hash_sample

_DENOM = 1 << 30  # hash-fraction resolution (engine/ops/sample.py)

PARTIAL_DDL = "cid int, n long, sum_vec array<double>"


def _partials_fn(C: np.ndarray):
    """mapInPandas: assign each batch to the closure codebook (one
    matmul), emit (cid, n, sum_vec) partials — k rows per batch."""
    k = C.shape[0]

    # squared-distance proxy for the argmin: ||c||^2 - 2 m.c — the
    # ||m||^2 term is constant PER ROW and safely dropped, but ||c||^2
    # varies per centroid and MUST stay (review r3: dropping it biased
    # assignment toward large-norm centroids at every site)
    c2 = (C * C).sum(axis=1)[None, :]

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.array(list(pdf["_vec"]), dtype=np.float64)
            cid = np.argmin(c2 - 2.0 * (M @ C.T), axis=1)
            rows = []
            for c in np.unique(cid):
                sel = M[cid == c]
                rows.append((int(c), len(sel), sel.sum(axis=0).tolist()))
            yield pd.DataFrame(rows, columns=["cid", "n", "sum_vec"])

    return fn


def train_codebook(
    vecs: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_per_centroid: int = 256,
    max_iter: int = 20,
    tol: float = 1e-6,
    salt: str = "kmeans",
    stats: dict | None = None,
    sample_fraction: float | None = None,
) -> np.ndarray:
    """Lloyd's k-means over a deterministic hash-sample of `vecs`;
    returns the (k, dim) float64 codebook, centroids sorted by their
    first coordinate (a canonical order independent of init order).

    Init: the k sampled vectors with the smallest (xxhash64(id), id) —
    deterministic, spread by the hash's uniformity. Each iteration is
    one map-only pass + a driver combine of codebook-sized partials
    (see module docstring for the 100-TB cost shape).

    sample_fraction overrides the auto fraction (pass 1.0 when `vecs`
    IS already a training sample — engine/ops/pq.py does, so its m
    sub-trainings share one sample instead of re-scanning the corpus).
    The Bernoulli sample's size is checked against k: a short sample
    (possible at tiny sample_per_centroid) widens once by 8x before
    raising, so training never silently fits fewer than k centroids."""
    if k <= 0:
        raise ValueError(f"k {k} must be positive")
    if max_iter < 1:
        raise ValueError(f"max_iter {max_iter} must be >= 1")
    n_total = vecs.count()
    if n_total < k:
        raise ValueError(f"k {k} exceeds corpus size {n_total}")
    # 1.2x headroom keeps P(sample < k) negligible at spc >= 8
    frac = (
        sample_fraction
        if sample_fraction is not None
        else min(1.0, 1.2 * (k * sample_per_centroid) / n_total)
    )

    def take(fr: float, s: str) -> DataFrame:
        return (
            hash_sample(vecs, fr, id_col=id_col, salt=s)
            .select(
                F.col(id_col).alias("_id"),
                F.col(vec_col).cast("array<double>").alias("_vec"),
            )
            .localCheckpoint(eager=True)  # re-read every iteration
        )

    sample = take(frac, salt)
    n_sample = sample.count()
    if n_sample < k and frac < 1.0:  # short draw: widen once
        sample = take(min(1.0, frac * 8), salt)
        n_sample = sample.count()
    if n_sample < k:
        raise ValueError(
            f"sample of {n_sample} rows cannot fit k={k} centroids; "
            "raise sample_per_centroid"
        )
    h = F.pmod(F.xxhash64(F.col("_id").cast("string"), F.lit(salt + "_init")), F.lit(_DENOM))
    init = (
        sample.orderBy(h.asc(), F.col("_id").asc())
        .limit(k)
        .select("_vec")
        .collect()
    )
    C = np.array([r["_vec"] for r in init], dtype=np.float64)
    iters, shift = 0, float("inf")
    for i in range(max_iter):
        partials = sample.mapInPandas(_partials_fn(C), PARTIAL_DDL).collect()
        sums = np.zeros_like(C)
        counts = np.zeros(k, dtype=np.int64)
        for r in partials:
            sums[r["cid"]] += np.asarray(r["sum_vec"], dtype=np.float64)
            counts[r["cid"]] += r["n"]
        newC = C.copy()  # empty cell keeps its previous centroid
        nz = counts > 0
        newC[nz] = sums[nz] / counts[nz, None]
        shift = float(np.sqrt(((newC - C) ** 2).sum(axis=1)).max())
        C = newC
        iters = i + 1
        if shift < tol:
            break
    if stats is not None:
        stats.update(
            iters=iters,
            shift=shift,
            sample_fraction=frac,
            nonempty_cells=int((counts > 0).sum()),
        )
    return C[np.argsort(C[:, 0], kind="stable")]


def assign_cells(
    df: DataFrame,
    codebook: np.ndarray,
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """MAP-ONLY nearest-centroid assignment: codebook in the UDF
    closure, one matmul per Arrow batch, no shuffle (the q35 plan
    shape, locked there by tests/test_plans.py)."""
    C = np.asarray(codebook, dtype=np.float64)
    c2 = (C * C).sum(axis=1)[None, :]  # see _partials_fn on the proxy

    @F.pandas_udf("int")
    def cell(emb: pd.Series) -> pd.Series:
        if not len(emb):
            return pd.Series([], dtype="int32")
        M = np.array(list(emb), dtype=np.float64)
        return pd.Series(
            np.argmin(c2 - 2.0 * (M @ C.T), axis=1).astype("int32")
        )

    return df.withColumn(cell_col, cell(vec_col))


def ivf_topk(
    vecs: DataFrame,
    queries: DataFrame,
    codebook: np.ndarray,
    topk: int = 3,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    qid_col: str = "qid",
    exclude_self: bool = True,
) -> DataFrame:
    """Trained-IVF ANN: each query probes its `nprobe` nearest cells,
    candidates are the corpus rows of those cells (equi-join on cell
    id, broadcast query side — never corpus x queries), exact cosine
    re-rank + top-k inside the probed cells.

    Returns (qid, vec_id, cos_sim) with ties broken by vec_id asc.
    Recall knob: nprobe=1 is the classic IVF fast path; each +1 probe
    recovers boundary neighbors at proportional candidate cost.

    exclude_self (default True) drops candidates whose id equals the
    query's qid — correct when queries ARE corpus rows (self is a
    trivial sim-1.0 hit). Pass False for EXTERNAL queries whose qid
    numbering happens to overlap corpus ids, or a coinciding id would
    silently lose a valid neighbor (review r3)."""
    C = np.asarray(codebook, dtype=np.float64)
    corpus = assign_cells(vecs, C, vec_col=vec_col, cell_col="_cell").select(
        F.col(id_col), F.col(vec_col).alias("_cv"), "_cell"
    )

    c2 = (C * C).sum(axis=1)[None, :]  # see _partials_fn on the proxy

    @F.pandas_udf("array<int>")
    def probe_cells(emb: pd.Series) -> pd.Series:
        if not len(emb):
            return pd.Series([], dtype="object")
        M = np.array(list(emb), dtype=np.float64)
        order = np.argsort(
            c2 - 2.0 * (M @ C.T), kind="stable", axis=1
        )[:, :nprobe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    q = queries.select(
        F.col(qid_col).alias("_qid"), F.col(vec_col).alias("_qv")
    ).withColumn("_cell", F.explode(probe_cells("_qv")))

    from engine.ops.vecexpr import cosine_expr

    cand = corpus.join(F.broadcast(q), "_cell")
    if exclude_self:
        cand = cand.filter(F.col(id_col) != F.col("_qid"))
    cand = (
        cand.select(
            F.col("_qid").alias(qid_col),
            id_col,
            cosine_expr(F.col("_cv"), F.col("_qv")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= topk)
        .drop("_rn")
    )
