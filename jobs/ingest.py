"""Batch ingest job — the spark-submit entry point (SURVEY.md §3.1).

    spark-submit --py-files engine.zip jobs/ingest.py \
        --n-pages 50000 --output /data/out --run-id r1 [--resume]

Stages: corpus/table scan -> partition-key attach -> resume anti-join
-> dedup -> salted/size-bucketed repartition -> fused route+extract
(Arrow UDF) -> chunk (mapInPandas) -> embed -> partitioned writes +
lineage + manifest commit. Works identically from `python jobs/ingest.py`
in local mode (the sandbox has no cluster).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from engine import checkpoint
from engine.corpus import gen_pages_df
from engine.io.tables import write_table
from engine.lineage import build_lineage, observe_extraction
from engine.pipeline import (
    build_chunks,
    build_extracted,
    build_vectors,
    with_partition_key,
)
from engine.session import get_spark


def run(args) -> dict:
    spark = get_spark(
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
        app_name="webtext-ingest",
    )
    t0 = time.monotonic()
    if args.input:
        from engine.io.validate import assert_pages_schema

        pages = assert_pages_schema(spark.read.parquet(args.input))
    else:
        pages = gen_pages_df(spark, args.n_pages, seed=args.seed)

    if args.canonical_urls:
        # canonicalize BEFORE the resume work-unit key is derived so
        # part_key (raw side) and pbucket (written side) agree — they
        # are the same pmod(xxhash64(host)) and must hash the same url
        from engine.ops.urlnorm import canonical_url_col

        pages = pages.withColumn("url", canonical_url_col("url"))

    pages = with_partition_key(pages)
    if args.resume:
        pages = checkpoint.filter_not_done(pages, args.output, args.run_id)

    from engine.partitioning import with_write_partitions

    # urls already canonical here if requested (done above, pre-resume)
    extracted = build_extracted(
        pages.drop("part_key"), num_partitions=args.partitions
    )
    extracted, obs = observe_extraction(extracted)
    extracted = with_write_partitions(extracted)

    ex_path = os.path.join(args.output, "extracted")
    if args.merge_into:
        # cross-run re-crawl upsert: keep the latest capture per url
        # across THIS run and a previous run's extracted table, then
        # land into this run's output (the previous table is read-only
        # input; pointing --merge-into at --output itself would race
        # the overwrite with its own scan)
        from engine.pipeline import merge_latest

        prior = spark.read.parquet(args.merge_into)
        extracted = with_write_partitions(
            merge_latest(prior.drop("day", "pbucket"), extracted)
        )
    write_table(extracted, ex_path, partition_by=["day", "pbucket"])
    metrics = obs.get

    extracted_rd = spark.read.parquet(ex_path)
    chunks = build_chunks(extracted_rd)
    ch_path = os.path.join(args.output, "chunks")
    write_table(chunks, ch_path)

    vectors = build_vectors(spark.read.parquet(ch_path))
    write_table(vectors, os.path.join(args.output, "vectors"))

    lineage = build_lineage(extracted_rd, args.run_id)
    write_table(lineage, os.path.join(args.output, "lineage"), mode="append")

    # Resume keys come from the WRITTEN extracted table, not from a
    # second pass over the (at target scale, 100 TB) input: pbucket is
    # the same pmod(xxhash64(host), 64) as partition_key_col, it is a
    # physical partition column of the parquet we just wrote, and every
    # ingested page lands in extracted (errors included) — so distinct
    # pbucket == the set of processed work units, answered from the
    # written table's partition values (no payload bytes read).
    done_keys = [
        str(r["pbucket"])
        for r in extracted_rd.select("pbucket").distinct().collect()
    ]
    checkpoint.mark_done(args.output, args.run_id, done_keys)

    wall = time.monotonic() - t0
    # a fully-resumed rerun processes zero rows: observe() sums are
    # then NULL -> None; report zeros, not a crash
    n_docs = int(metrics["rows"] or 0)
    result = {
        "wall_s": round(wall, 2),
        "docs": n_docs,
        "docs_per_s": round(n_docs / wall, 1),
        **{k: int(v or 0) for k, v in metrics.items()},
    }
    print(result)
    return result


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", default=None, help="pages parquet (else synthesize)")
    p.add_argument("--n-pages", type=int, default=5000)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output", required=True)
    p.add_argument("--run-id", default="run1")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--master", default="local[*]")
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument(
        "--merge-into",
        default=None,
        help="previous run's extracted parquet: upsert latest-capture-"
        "per-url across both crawls into this run's output",
    )
    p.add_argument(
        "--canonical-urls",
        action="store_true",
        help="canonicalize urls (defrag, tracking params, ports, case) "
        "before the per-url dedup key is formed",
    )
    p.add_argument("--shuffle-partitions", type=int, default=None)
    run(p.parse_args())


if __name__ == "__main__":
    main()
