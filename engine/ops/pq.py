"""Product quantization (PQ) for the vector path — compact codes +
asymmetric-distance (ADC) top-k search (Jégou et al. 2011, "Product
Quantization for Nearest Neighbor Search"; the standard companion to
the IVF cells engine/ops/kmeans.py trains).

Why it matters at 10^12 vectors: a float32[d] embedding is 4d bytes;
PQ stores m uint8 codes (m=8-16), a 16-64x compression, and ADC
scores a query against a code with m table lookups instead of d
multiply-adds. The vector-index sink can hold the codes table in a
fraction of the footprint and still answer top-k.

Spark-first shape:

  * training runs all m sub-quantizer Lloyd problems JOINTLY over
    one shared deterministic hash-sample (r5): one mapInPandas pass
    per iteration computes every active subspace's partials, so the
    job count is O(max_iter), not O(m * max_iter) — bit-identical
    books to the former per-subspace kmeans.train_codebook path.
  * encoding is MAP-ONLY (codebooks ride in the UDF closure, one BLAS
    matmul per subspace per Arrow batch — the assign_cells shape).
  * ADC search: queries broadcast as per-query lookup tables (m x k
    floats each — query-side work is codebook-sized); one mapInPandas
    pass emits each task's LOCAL top-k per query (bounded fan-out:
    tasks x |Q| x k rows), then one small window takes the global
    top-k. The codes table is scanned once and never shuffled.

Exactness contract (the test oracle): ADC distance of query q to code
c equals the true L2 distance of q to the DECODED vector of c, so
adc_topk == brute-force top-k over pq_decode output, exactly — the
approximation lives entirely in the encoding, never in the search.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

ADC_DDL = "qid long, vec_id long, dist double"

PQ_PARTIAL_DDL = "j int, cid int, n long, sum_vec array<double>"


def _pq_partials_fn(Cs: list, dsub: int, active: list):
    """mapInPandas over the FULL-vector training sample: per batch,
    assign every ACTIVE subspace's slice to its codebook (one matmul
    each) and emit (j, cid, n, sum_vec) partials — the joint-pass
    twin of kmeans._partials_fn. Same ||c||^2 - 2 m.c argmin proxy
    (see that function's bias note)."""
    c2s = [
        (C * C).sum(axis=1)[None, :] if active[j] else None
        for j, C in enumerate(Cs)
    ]

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.array(list(pdf["_vec"]), dtype=np.float64)
            rows = []
            for j, C in enumerate(Cs):
                if not active[j]:
                    continue
                Mj = M[:, j * dsub : (j + 1) * dsub]
                cid = np.argmin(c2s[j] - 2.0 * (Mj @ C.T), axis=1)
                for c in np.unique(cid):
                    sel = Mj[cid == c]
                    rows.append(
                        (j, int(c), len(sel), sel.sum(axis=0).tolist())
                    )
            yield pd.DataFrame(rows, columns=["j", "cid", "n", "sum_vec"])

    return fn


def adc_lut(Q: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """The ADC lookup table: LUT[q, j, c] = ||Q[q] subspace j −
    B[j][c]||², shape (|Q|, m, k). Query-side cost is codebook-sized;
    built ONCE on the driver and shipped in UDF closures. Shared by
    pq_adc_topk and the jobs/ann.py query path (review r3: two
    drifting copies)."""
    B = np.asarray(codebooks, dtype=np.float64)  # (m, k, dsub)
    m, _, dsub = B.shape
    Q = np.asarray(Q, dtype=np.float64)
    return np.stack(
        [
            (
                (Q[:, j * dsub : (j + 1) * dsub][:, None, :] - B[j][None, :, :])
                ** 2
            ).sum(axis=2)
            for j in range(m)
        ],
        axis=1,
    )


def adc_paired_dist(
    cand: DataFrame,
    lut: np.ndarray,
    qids: np.ndarray,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    qid_col: str = "qid",
) -> DataFrame:
    """ADC distances for rows already PAIRED with their query (the
    IVF-pruned shape: each candidate row carries the qid whose probed
    cells produced it). ONE mapInPandas pass, codes never shuffle.
    Returns (qid, <id_col>, dist) with dist = true L2 to the decoded
    vector."""
    m = lut.shape[1]
    qpos = {int(q): i for i, q in enumerate(np.asarray(qids))}

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.array(list(pdf[code_col]), dtype=np.int64)  # (n, m)
            qi = np.array([qpos[q] for q in pdf[qid_col]], dtype=np.int64)
            d = np.zeros(len(C))
            for j in range(m):
                d += lut[qi, j, C[:, j]]
            out = pdf[[qid_col, id_col]].copy()
            out["dist"] = d
            yield out

    return cand.select(qid_col, id_col, code_col).mapInPandas(
        score, f"{qid_col} long, {id_col} long, dist double"
    )


def train_pq(
    vecs: DataFrame,
    m: int,
    k: int = 256,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_per_centroid: int = 64,
    max_iter: int = 15,
) -> np.ndarray:
    """Train m sub-codebooks of k centroids each; returns float64
    array (m, k, d/m). Requires d % m == 0 (standard PQ constraint).

    The corpus is counted and hash-sampled ONCE (the sample is
    localCheckpointed), and — r5 — all m Lloyd problems run JOINTLY:
    each iteration is ONE mapInPandas pass over the shared sample
    computing every active subspace's partials (m small matmuls per
    batch), instead of m independent trainings of max_iter passes
    each. Spark-job count drops from O(m * max_iter) to
    O(max_iter), which removes ~m x the per-job scheduling floor at
    bench scale and m x the sample scans at corpus scale. Converged
    subspaces freeze (their slice stops being computed), so each
    book's trajectory — init hash/salt, per-iteration float
    accumulation order, tol stop — is BIT-IDENTICAL to the former
    per-subspace train_codebook path (pinned in tests/test_pq.py)."""
    tol = 1e-6  # train_codebook's default, kept for parity
    d = int(vecs.select(F.size(vec_col)).limit(1).collect()[0][0])
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    from engine.ops.kmeans import _DENOM
    from engine.ops.sample import hash_sample

    n_total = vecs.count()
    if n_total < k:
        raise ValueError(f"k {k} exceeds corpus size {n_total}")
    frac = min(1.0, 1.2 * (k * sample_per_centroid) / n_total)
    sample = (
        hash_sample(vecs, frac, id_col=id_col, salt="pq")
        .select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_vec"),
        )
        .localCheckpoint(eager=True)
    )
    n_sample = sample.count()
    if n_sample < k:
        raise ValueError(
            f"sample of {n_sample} rows cannot fit k={k} centroids; "
            "raise sample_per_centroid"
        )

    # per-subspace init: same deterministic hash order and salt as
    # the per-subspace path (salt f"pq{j}"), vectors sliced to the
    # subspace columns. All m hash orders ride ONE collect (the
    # training sample is k*spc-bounded by construction); the hashes
    # must stay Spark-side (xxhash64 is the pinned init order).
    init_rows = sample.select(
        "_id",
        "_vec",
        *[
            F.pmod(
                F.xxhash64(
                    F.col("_id").cast("string"), F.lit(f"pq{j}_init")
                ),
                F.lit(_DENOM),
            ).alias(f"_h{j}")
            for j in range(m)
        ],
    ).collect()
    books: list[np.ndarray] = []
    for j in range(m):
        order = sorted(init_rows, key=lambda r: (r[f"_h{j}"], r["_id"]))
        books.append(
            np.array(
                [r["_vec"][j * dsub : (j + 1) * dsub] for r in order[:k]],
                dtype=np.float64,
            )
        )

    active = [True] * m
    for _ in range(max_iter):
        if not any(active):
            break
        partials = sample.mapInPandas(
            _pq_partials_fn(books, dsub, list(active)), PQ_PARTIAL_DDL
        ).collect()
        sums = [np.zeros_like(books[j]) for j in range(m)]
        counts = [np.zeros(k, dtype=np.int64) for j in range(m)]
        for r in partials:
            sums[r["j"]][r["cid"]] += np.asarray(
                r["sum_vec"], dtype=np.float64
            )
            counts[r["j"]][r["cid"]] += r["n"]
        for j in range(m):
            if not active[j]:
                continue
            newC = books[j].copy()  # empty cell keeps its centroid
            nz = counts[j] > 0
            newC[nz] = sums[j][nz] / counts[j][nz, None]
            shift = float(
                np.sqrt(((newC - books[j]) ** 2).sum(axis=1)).max()
            )
            books[j] = newC
            if shift < tol:
                active[j] = False
    # canonical order per book (train_codebook's contract)
    return np.stack(
        [B[np.argsort(B[:, 0], kind="stable")] for B in books]
    )


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """MAP-ONLY encoding: nearest sub-centroid per subspace, emitted as
    array<int> of length m (values < k; int keeps the column readable —
    the parquet sink dictionary-encodes it to ~1 byte at k<=256)."""
    B = np.asarray(codebooks, dtype=np.float64)  # (m, k, dsub)
    m, _, dsub = B.shape

    @F.pandas_udf("array<int>")
    def enc(emb: pd.Series) -> pd.Series:
        if not len(emb):
            return pd.Series([], dtype="object")
        M = np.array(list(emb), dtype=np.float64)
        codes = np.empty((len(M), m), dtype=np.int64)
        for j in range(m):
            S = M[:, j * dsub : (j + 1) * dsub]
            d2 = (S * S).sum(axis=1, keepdims=True) - 2.0 * (S @ B[j].T) + (
                B[j] * B[j]
            ).sum(axis=1)[None, :]
            codes[:, j] = np.argmin(d2, axis=1)
        return pd.Series([row.astype("int32").tolist() for row in codes])

    return df.withColumn(code_col, enc(vec_col))


def pq_decode(
    df: DataFrame,
    codebooks: np.ndarray,
    code_col: str = "pq_code",
    out_col: str = "decoded",
) -> DataFrame:
    """Reconstruct the quantized vector (concatenated sub-centroids)."""
    B = np.asarray(codebooks, dtype=np.float64)
    m = B.shape[0]

    @F.pandas_udf("array<double>")
    def dec(codes: pd.Series) -> pd.Series:
        if not len(codes):
            return pd.Series([], dtype="object")
        C = np.array(list(codes), dtype=np.int64)
        out = np.concatenate(
            [B[j][C[:, j]] for j in range(m)], axis=1
        )
        return pd.Series([row.tolist() for row in out])

    return df.withColumn(out_col, dec(code_col))


def pq_adc_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    topk: int = 3,
    code_col: str = "pq_code",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
) -> DataFrame:
    """Asymmetric-distance top-k: per query, an (m, k) lookup table of
    sub-distances is precomputed ON THE DRIVER (query-side cost is
    codebook-sized); the codes table is scanned ONCE by a mapInPandas
    that emits each task's local top-k per query; a window over the
    tasks x |Q| x topk survivors picks the global top-k.

    Returns (qid, vec_id, dist) — true L2 distance of the query to the
    decoded vector, ascending; ties broken by vec_id asc."""
    B = np.asarray(codebooks, dtype=np.float64)  # (m, k, dsub)
    m, _, dsub = B.shape
    qrows = queries.select(
        F.col(qid_col).cast("long"), F.col(vec_col)
    ).collect()  # bounded: the query set, never the corpus
    if not qrows:
        raise ValueError("empty query set")
    qids = np.array([r[qid_col] for r in qrows], dtype=np.int64)
    Q = np.array([list(r[vec_col]) for r in qrows], dtype=np.float64)
    lut = adc_lut(Q, B)

    def local_topk(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.array(list(pdf[code_col]), dtype=np.int64)  # (n, m)
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            # dist (n, |Q|): sum over subspaces of per-query LUT rows
            dist = np.zeros((len(C), len(qids)))
            for j in range(m):
                dist += lut[:, j, :][:, C[:, j]].T
            rows = []
            kk = min(topk, len(C))
            for qi, qid in enumerate(qids):
                order = np.lexsort((ids, dist[:, qi]))[:kk]
                rows.extend(
                    (int(qid), int(ids[i]), float(dist[i, qi])) for i in order
                )
            yield pd.DataFrame(rows, columns=["qid", "vec_id", "dist"])

    local = codes.select(id_col, code_col).mapInPandas(local_topk, ADC_DDL)
    w = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("vec_id"))
    return (
        local.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= topk)
        .drop("_rn")
    )
