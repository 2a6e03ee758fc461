"""Link-graph job — host PageRank + inlink anchor texts from a
crawled pages table.

    spark-submit --py-files engine.zip jobs/linkgraph.py \
        --pages /data/pages --output /data/linkgraph \
        [--damping 0.85] [--tol 1e-6] [--max-iter 100] \
        [--max-links 100] [--top-anchors 5]

Writes:

    <output>/edges        (src, dst, n_links) host-level edge table
    <output>/host_rank    (host, rank) PageRank centrality — join back
                          onto pages via lower(parse_url(url, 'HOST'))
                          as a curation/classifier quality prior
                          (engine/ops/classify.py takes it as a
                          feature column as-is)
    <output>/top_anchors  (dst, top_anchors array<struct<anchor,n>>)
                          the k most frequent inlink anchor texts per
                          target url — retrieval metadata for the
                          vector sink (engine/io/vector_sink.py
                          meta_cols)

Scale notes (engine/ops/linkgraph.py): anchor/edge extraction is ONE
map-only Arrow pass over pages (html never shuffles) — it is shared by
persisting the raw (url, dst, anchor) links table first and deriving
both outputs from the parquet, so the pages table is read exactly
once. PageRank state is |hosts| rows; each iteration is one equi-join
plus one groupBy with scalar-only driver traffic.

Prints ONE JSON line with row counts, pagerank rounds, and wall time.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from engine.session import get_spark  # noqa: E402


def run(args) -> dict:
    from engine.cli import fill_defaults

    fill_defaults(args, _parser())
    spark = get_spark(
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
        app_name="webtext-linkgraph",
    )
    from engine.ops.linkgraph import (
        extract_anchors_df,
        host_edges,
        pagerank,
        top_anchors,
    )

    t0 = time.monotonic()
    pages = spark.read.parquet(args.pages)
    links_path = os.path.join(args.output, "links")
    extract_anchors_df(pages, max_links=args.max_links).write.mode(
        "overwrite"
    ).parquet(links_path)
    links = spark.read.parquet(links_path)

    edges = host_edges(links)
    edges_path = os.path.join(args.output, "edges")
    edges.write.mode("overwrite").parquet(edges_path)
    edges = spark.read.parquet(edges_path)

    stats: dict = {}
    ranks = pagerank(
        edges,
        weight="n_links",
        damping=args.damping,
        max_iter=args.max_iter,
        tol=args.tol,
        stats=stats,
    ).withColumnRenamed("node", "host")
    ranks.write.mode("overwrite").parquet(os.path.join(args.output, "host_rank"))

    ta = top_anchors(links, k=args.top_anchors)
    ta.write.mode("overwrite").parquet(os.path.join(args.output, "top_anchors"))

    result = {
        "wall_s": round(time.monotonic() - t0, 2),
        "links": links.count(),
        "edges": spark.read.parquet(edges_path).count(),
        "hosts": spark.read.parquet(os.path.join(args.output, "host_rank")).count(),
        "anchored_targets": spark.read.parquet(
            os.path.join(args.output, "top_anchors")
        ).count(),
        "pagerank_rounds": stats.get("rounds", 0),
        "pagerank_delta": stats.get("delta"),
    }
    print(json.dumps(result))
    return result


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--pages", required=True, help="crawled pages parquet")
    p.add_argument("--output", required=True)
    p.add_argument("--damping", type=float, default=0.85)
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--max-iter", type=int, default=100)
    p.add_argument("--max-links", type=int, default=100)
    p.add_argument("--top-anchors", type=int, default=5)
    p.add_argument("--master", default="local[*]")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    return p


def main() -> None:
    run(_parser().parse_args())


if __name__ == "__main__":
    main()
