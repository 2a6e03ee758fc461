"""ANN index job — build and query a trained IVF(-PQ) vector index.

    spark-submit --py-files engine.zip jobs/ann.py build \
        --input /data/embeddings --output /data/ann \
        [--cells 256] [--pq-m 8] [--pq-k 256] [--store-vectors]

    spark-submit --py-files engine.zip jobs/ann.py query \
        --output /data/ann --queries /data/queries \
        [--topk 10] [--nprobe 4] [--mode exact|adc]

BUILD trains the IVF codebook (engine/ops/kmeans) and, with --pq-m,
the PQ sub-codebooks (engine/ops/pq), then writes:

    <output>/index          (vec_id, pq_code?, embedding?) PARTITIONED
                            BY cell — the physical layout IS the index:
                            probing nprobe cells is a partition-pruned
                            scan that reads ~nprobe/cells of the data,
                            enforced by parquet partition dirs, no
                            bespoke file format
    <output>/codebooks/ivf  (cid, centroid)
    <output>/codebooks/pq   (subspace, code, centroid)   [--pq-m]

QUERY assigns each query its nprobe nearest cells driver-side
(codebook-sized work), restricts the index scan to the union of probed
cells (partition pruning), joins candidates to queries ON CELL (a
query only sees its own probed cells — IVF semantics), and re-ranks:

    --mode exact  cosine over stored embeddings (needs --store-vectors
                  at build; JVM array expressions, no Python)
    --mode adc    asymmetric distance over PQ codes via per-query
                  lookup tables (engine/ops/pq discipline; works on a
                  16-64x smaller index)

Prints ONE JSON line per run. Works identically via plain python in
local mode.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import DataFrame, Window, functions as F  # noqa: E402

from engine.session import get_spark  # noqa: E402


def _load_codebook(spark, path: str) -> np.ndarray:
    rows = spark.read.parquet(path).orderBy("cid").collect()
    return np.array([r["centroid"] for r in rows], dtype=np.float64)


def _load_pq_books(spark, path: str) -> np.ndarray:
    rows = spark.read.parquet(path).orderBy("subspace", "code").collect()
    m = max(r["subspace"] for r in rows) + 1
    k = max(r["code"] for r in rows) + 1
    dsub = len(rows[0]["centroid"])
    B = np.zeros((m, k, dsub))
    for r in rows:
        B[r["subspace"], r["code"]] = r["centroid"]
    return B


def build(args) -> dict:
    from engine.ops.kmeans import assign_cells, train_codebook
    from engine.ops.pq import pq_encode, train_pq

    spark = get_spark(
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
        app_name="ann-build",
    )
    t0 = time.monotonic()
    vecs = spark.read.parquet(args.input).select(args.id_col, args.vec_col)

    stats = {}
    C = train_codebook(
        vecs,
        k=args.cells,
        vec_col=args.vec_col,
        id_col=args.id_col,
        sample_per_centroid=args.sample_per_centroid,
        stats=stats,
    )
    spark.createDataFrame(
        [(i, c.tolist()) for i, c in enumerate(C)],
        "cid int, centroid array<double>",
    ).write.mode("overwrite").parquet(os.path.join(args.output, "codebooks/ivf"))

    indexed = assign_cells(vecs, C, vec_col=args.vec_col, cell_col="cell")
    pq_m = None
    if args.pq_m:
        B = train_pq(
            vecs,
            m=args.pq_m,
            k=args.pq_k,
            vec_col=args.vec_col,
            id_col=args.id_col,
        )
        pq_m = int(B.shape[0])
        spark.createDataFrame(
            [
                (j, c, B[j, c].tolist())
                for j in range(B.shape[0])
                for c in range(B.shape[1])
            ],
            "subspace int, code int, centroid array<double>",
        ).write.mode("overwrite").parquet(
            os.path.join(args.output, "codebooks/pq")
        )
        indexed = pq_encode(indexed, B, vec_col=args.vec_col)
    cols = [args.id_col, "cell"] + (["pq_code"] if args.pq_m else [])
    if args.store_vectors:
        cols.append(args.vec_col)
    indexed.select(*cols).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(os.path.join(args.output, "index"))

    n = spark.read.parquet(os.path.join(args.output, "index")).count()
    result = {
        "mode": "build",
        "wall_s": round(time.monotonic() - t0, 2),
        "vectors": n,
        "cells": args.cells,
        "nonempty_cells": stats.get("nonempty_cells"),
        "pq_m": pq_m,
        "stored_vectors": bool(args.store_vectors),
    }
    print(json.dumps(result))
    return result


def _probe_table(spark, Q: np.ndarray, qids: np.ndarray, C: np.ndarray, nprobe: int) -> DataFrame:
    """(qid, cell) rows: each query's nprobe nearest cells, computed
    driver-side (|Q| x cells — codebook-sized, never corpus work)."""
    c2 = (C * C).sum(axis=1)[None, :]
    order = np.argsort(c2 - 2.0 * (Q @ C.T), kind="stable", axis=1)[:, :nprobe]
    rows = [
        (int(q), int(c)) for q, cells in zip(qids, order) for c in cells
    ]
    return spark.createDataFrame(rows, "qid long, cell int")


def query(args) -> dict:
    spark = get_spark(
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
        app_name="ann-query",
    )
    t0 = time.monotonic()
    C = _load_codebook(spark, os.path.join(args.output, "codebooks/ivf"))
    qrows = (
        spark.read.parquet(args.queries)
        .select(F.col(args.id_col).cast("long"), args.vec_col)
        .collect()
    )
    if not qrows:
        raise SystemExit("empty query set")
    qids = np.array([r[args.id_col] for r in qrows], dtype=np.int64)
    Q = np.array([list(r[args.vec_col]) for r in qrows], dtype=np.float64)
    probes = _probe_table(spark, Q, qids, C, args.nprobe)
    cells = sorted({r["cell"] for r in probes.collect()})

    # partition-pruned scan: only the probed cells' directories are
    # read (cell is the physical partition column)
    idx = spark.read.parquet(os.path.join(args.output, "index")).filter(
        F.col("cell").isin(cells)
    )
    # candidates = index rows of each query's OWN probed cells
    cand = idx.join(F.broadcast(probes), "cell")

    # both modes lean on the engine ops (review r3: this job carried
    # near-verbatim copies of the cosine expression and the ADC
    # kernel — one implementation, one place)
    if args.mode == "exact":
        if args.vec_col not in idx.columns:
            raise SystemExit(
                "--mode exact needs --store-vectors at build time"
            )
        from engine.ops.vecexpr import cosine_expr

        qdf = spark.createDataFrame(
            [(int(q), v.tolist()) for q, v in zip(qids, Q)],
            "qid long, _qv array<double>",
        )
        cand = cand.join(F.broadcast(qdf), "qid")
        scored = cand.select(
            "qid",
            args.id_col,
            cosine_expr(F.col(args.vec_col), F.col("_qv")).alias("score"),
        )
    else:  # adc over PQ codes
        if "pq_code" not in idx.columns:
            raise SystemExit("--mode adc needs --pq-m at build time")
        from engine.ops.pq import adc_lut, adc_paired_dist

        B = _load_pq_books(spark, os.path.join(args.output, "codebooks/pq"))
        lut = adc_lut(Q, B)
        scored = adc_paired_dist(
            cand, lut, qids, id_col=args.id_col
        ).select(
            "qid",
            args.id_col,
            # negative distance so both modes rank score DESC
            (-F.col("dist")).alias("score"),
        )
    w = Window.partitionBy("qid").orderBy(
        F.desc("score"), F.asc(args.id_col)
    )

    top = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= args.topk)
        .drop("_rn")
    )
    out_path = os.path.join(args.output, "results")
    top.write.mode("overwrite").parquet(out_path)
    n = spark.read.parquet(out_path).count()
    result = {
        "mode": f"query/{args.mode}",
        "wall_s": round(time.monotonic() - t0, 2),
        "queries": len(qids),
        "nprobe": args.nprobe,
        "cells_probed": len(cells),
        "results": n,
        "output": out_path,
    }
    print(json.dumps(result))
    return result


def run(args) -> dict:
    from engine.cli import fill_defaults

    fill_defaults(args, _parser())
    return build(args) if args.cmd == "build" else query(args)


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("cmd", choices=["build", "query"])
    p.add_argument("--input", default=None, help="vectors parquet (build)")
    p.add_argument("--output", required=True, help="index directory")
    p.add_argument("--queries", default=None, help="query vectors parquet")
    p.add_argument("--id-col", default="vec_id")
    p.add_argument("--vec-col", default="embedding")
    p.add_argument("--cells", type=int, default=256)
    p.add_argument("--sample-per-centroid", type=int, default=64)
    p.add_argument("--pq-m", type=int, default=None, help="PQ subspaces")
    p.add_argument("--pq-k", type=int, default=256)
    p.add_argument(
        "--store-vectors",
        action="store_true",
        help="keep raw embeddings in the index (enables --mode exact)",
    )
    p.add_argument("--topk", type=int, default=10)
    p.add_argument("--nprobe", type=int, default=4)
    p.add_argument("--mode", choices=["exact", "adc"], default="exact")
    p.add_argument("--master", default="local[*]")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    return p


def main() -> None:
    run(_parser().parse_args())


if __name__ == "__main__":
    main()
