"""Near-dup dedup job — spark-submit entry for the clustering pipeline.

    spark-submit --py-files engine.zip jobs/dedup.py \
        --input /data/documents --output /data/dedup \
        [--verify-jaccard 0.5] [--bands 8] [--rows-per-band 4]

Stages: documents scan -> MinHash+LSH candidate pairs (banded
equi-join, never all-pairs) -> optional exact shingle-Jaccard
verification over the candidates -> connected-components clustering
(large-star/small-star) -> writes:

    <output>/pairs       (doc_a, doc_b[, jaccard])
    <output>/clusters    (doc_id, cluster_id, is_canonical)
    <output>/canonical   the deduplicated documents table

Works identically from `python jobs/dedup.py` in local mode.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from engine.io.tables import write_table  # noqa: E402
from engine.ops.dedup import (  # noqa: E402
    jaccard_verify,
    minhash_candidate_pairs,
    simhash_candidate_pairs,
)
from engine.ops.graph import dedup_clusters  # noqa: E402
from engine.session import get_spark  # noqa: E402


def run(args) -> dict:
    spark = get_spark(
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
        app_name="webtext-dedup",
    )
    t0 = time.monotonic()
    docs = spark.read.parquet(args.input)

    if args.method == "exact":
        clusters = _exact_clusters(docs, args)
        n_pairs = 0
    else:
        # Empty/null-text docs all share the sentinel fingerprint
        # (minhash of no shingles / simhash 0) and would cross-match
        # QUADRATICALLY — B empty docs -> ~B^2/2 candidate pairs, the
        # all-pairs blowup LSH exists to prevent. Screen them out of
        # pair generation; they stay in the corpus as singleton
        # clusters (dedup_clusters left-joins the full docs table).
        nonempty = docs.filter(
            F.length(F.coalesce(F.col(args.text_col), F.lit(""))) > 0
        )
        # getattr: programmatic callers (tests build a bare namespace)
        # get the CLI default; 0 disables the guard
        cap = getattr(args, "hot_bucket_cap", 256) or None
        if args.method == "simhash":
            pairs = simhash_candidate_pairs(
                nonempty,
                id_col=args.id_col,
                text_col=args.text_col,
                max_hamming=args.max_hamming,
                hot_bucket_cap=cap,
            )
        else:
            pairs = minhash_candidate_pairs(
                nonempty,
                id_col=args.id_col,
                text_col=args.text_col,
                n_bands=args.bands,
                rows_per_band=args.rows_per_band,
                hot_bucket_cap=cap,
            )
        if args.verify_jaccard is not None:
            pairs = jaccard_verify(
                pairs,
                nonempty,
                threshold=args.verify_jaccard,
                id_col=args.id_col,
                text_col=args.text_col,
            )
        # pairs feed clustering twice (edge list + convergence); write
        # once and read back — the 10^12-scale persist() seam
        pairs_path = os.path.join(args.output, "pairs")
        write_table(pairs, pairs_path)
        pairs = spark.read.parquet(pairs_path)
        n_pairs = pairs.count()
        clusters = dedup_clusters(docs, pairs, id_col=args.id_col)

    return _finish(spark, docs, clusters, args, t0, n_pairs)


def _exact_clusters(docs, args):
    """Exact content dedup: one hash-groupBy, no pairs, no clustering
    — cluster_id = min doc id per sha256(text). The cheapest dedup
    mode and the right first pass before any near-dup method."""
    sha = F.sha2(F.coalesce(F.col(args.text_col), F.lit("")), 256)
    keyed = docs.select(F.col(args.id_col), sha.alias("_sha"))
    reps = keyed.groupBy("_sha").agg(F.min(args.id_col).alias("cluster_id"))
    return keyed.join(reps, "_sha").select(
        args.id_col,
        "cluster_id",
        (F.col(args.id_col) == F.col("cluster_id")).cast("int").alias(
            "is_canonical"
        ),
    )


def _finish(spark, docs, clusters, args, t0, n_pairs) -> dict:
    """Shared tail of every mode: land clusters, derive the canonical
    table, print the one-line summary."""
    cl_path = os.path.join(args.output, "clusters")
    write_table(clusters, cl_path)
    clusters = spark.read.parquet(cl_path)

    canonical = docs.join(
        clusters.filter(F.col("is_canonical") == 1).select(args.id_col),
        args.id_col,
        "semi",
    )
    write_table(canonical, os.path.join(args.output, "canonical"))

    n_docs = docs.count()
    n_kept = canonical.count()
    wall = time.monotonic() - t0
    result = {
        "wall_s": round(wall, 2),
        "docs": n_docs,
        "candidate_pairs": n_pairs,
        "kept": n_kept,
        "removed": n_docs - n_kept,
        "dup_rate": round((n_docs - n_kept) / n_docs, 4) if n_docs else 0.0,
    }
    print(json.dumps(result))
    return result


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="documents parquet")
    p.add_argument("--output", required=True)
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument(
        "--method",
        choices=["minhash", "simhash", "exact"],
        default="minhash",
    )
    p.add_argument("--bands", type=int, default=8, help="minhash LSH bands")
    p.add_argument("--rows-per-band", type=int, default=4)
    p.add_argument(
        "--max-hamming", type=int, default=8, help="simhash bit distance"
    )
    p.add_argument(
        "--verify-jaccard",
        type=float,
        default=None,
        help="exact-Jaccard threshold to confirm LSH candidates",
    )
    p.add_argument(
        "--hot-bucket-cap",
        type=int,
        default=256,
        help="LSH buckets above this occupancy are star-paired instead "
        "of all-pairs joined (0 disables). Clustering over RAW pairs is "
        "unaffected; combined with --verify-jaccard (or simhash hamming "
        "filtering) it can split hot-bucket clusters, because members "
        "linked only through a star pair that fails verification lose "
        "their path to each other — a disclosed recall trade-off",
    )
    p.add_argument("--master", default="local[*]")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    run(p.parse_args())


if __name__ == "__main__":
    main()
