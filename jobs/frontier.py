"""Crawl-frontier job — score what to fetch next from a crawled
batch's outlinks (engine/ops/frontier.py).

    spark-submit --py-files engine.zip jobs/frontier.py \
        --pages /data/pages --output /data/frontier \
        [--seen /data/extracted] [--host-ranks /data/linkgraph/host_rank] \
        [--top 100000] [--fpp 0.01] [--max-links 200]

Writes <output>/frontier: (url, host, n_ref_hosts, n_refs, rank,
priority) sorted by priority — the fetch list for the next crawl
cycle, which jobs/ingest.py then processes and whose extracted table
becomes the next cycle's --seen.

--seen defaults to the pages table itself (this batch's own urls are
never re-proposed); pass the full extracted corpus for a real cycle.
--host-ranks takes jobs/linkgraph.py's maintained host_rank table;
omitted, PageRank is computed from this batch's own links.

Scale notes: one ids-and-counts shuffle on the candidate url; seen
history enters as a broadcast Bloom bitmap (exact — survivors are
anti-join verified); top-k is TakeOrderedAndProject. Prints ONE JSON
summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from engine.session import get_spark  # noqa: E402

FRONTIER_DDL = (
    "url string, host string, n_ref_hosts long, n_refs long, "
    "rank double, priority double"
)


def run(args) -> dict:
    from engine.cli import fill_defaults

    fill_defaults(args, _parser())
    spark = get_spark(
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
        app_name="webtext-frontier",
    )
    from engine.ops.frontier import frontier_candidates

    t0 = time.monotonic()
    if args.since_snapshot is not None:
        # crawl-cycle increment: only pages ADDED after the given
        # snapshot feed discovery (engine/io/snapshots.py) — the seen
        # screen still runs against the FULL --seen history
        from engine.io.snapshots import incremental_read

        pages = incremental_read(spark, args.pages, after=args.since_snapshot)
        out = os.path.join(args.output, "frontier")
        if pages is None:  # no files added since that snapshot
            # still OVERWRITE the output: a downstream fetcher reading
            # <output>/frontier must see "nothing to fetch", not the
            # previous cycle's stale candidate list (review r3)
            spark.createDataFrame([], FRONTIER_DDL).write.mode(
                "overwrite"
            ).parquet(out)
            summary = {
                "wall_s": round(time.monotonic() - t0, 2),
                "candidates_written": 0,
                "no_new_pages": True,
                "output": out,
            }
            print(json.dumps(summary))
            return summary
        # the SEEN screen must cover the full history even though
        # discovery reads only the new slice (review r3: defaulting
        # seen to the delta re-proposed urls crawled in prior batches)
        if not args.seen:
            seen = spark.read.parquet(args.pages)
        else:
            seen = spark.read.parquet(args.seen)
    else:
        pages = spark.read.parquet(args.pages)
        seen = spark.read.parquet(args.seen) if args.seen else pages
    ranks = (
        spark.read.parquet(args.host_ranks) if args.host_ranks else None
    )
    delays = None
    if args.robots:
        # declared Crawl-delay becomes each host's own per-cycle cap
        from engine.ops.robots import crawl_delays

        delays = crawl_delays(
            spark.read.parquet(args.robots), crawler=args.crawler
        )
    frontier = frontier_candidates(
        spark,
        pages,
        seen,
        url_col=args.url_col,
        max_links=args.max_links,
        host_ranks=ranks,
        fpp=args.fpp,
        top_k=args.top,
        per_host_cap=args.per_host_cap,
        host_delays=delays,
        fetch_window_s=args.fetch_window,
    )
    out = os.path.join(args.output, "frontier")
    frontier.write.mode("overwrite").parquet(out)
    n = spark.read.parquet(out).count()
    summary = {
        "wall_s": round(time.monotonic() - t0, 2),
        "candidates_written": n,
        "output": out,
    }
    print(json.dumps(summary))
    return summary


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--pages", required=True, help="crawled pages parquet")
    p.add_argument("--output", required=True)
    p.add_argument(
        "--seen",
        default=None,
        help="crawl-history table whose url column is the seen set "
        "(default: the pages table itself)",
    )
    p.add_argument(
        "--host-ranks",
        default=None,
        help="(host, rank) parquet from jobs/linkgraph.py; omitted, "
        "PageRank is computed from this batch's own links",
    )
    p.add_argument("--url-col", default="url")
    p.add_argument(
        "--since-snapshot",
        type=int,
        default=None,
        help="discover only from pages added after this snapshot id "
        "of the --pages table (engine/io/snapshots.py); the seen "
        "screen still uses the full --seen history",
    )
    p.add_argument(
        "--per-host-cap",
        type=int,
        default=None,
        help="politeness bound: at most this many candidates per host "
        "per cycle",
    )
    p.add_argument(
        "--robots",
        default=None,
        help="robots.txt table (host, body): honor each host's "
        "declared Crawl-delay as its own per-cycle candidate cap, "
        "floor(--fetch-window / delay), combined with --per-host-cap "
        "by least()",
    )
    p.add_argument("--crawler", default="sparkbot")
    p.add_argument(
        "--fetch-window",
        type=float,
        default=3600.0,
        help="seconds per fetch cycle used to convert Crawl-delay "
        "into a per-host cap",
    )
    p.add_argument("--top", type=int, default=None)
    p.add_argument("--fpp", type=float, default=0.01)
    p.add_argument("--max-links", type=int, default=200)
    p.add_argument("--master", default="local[*]")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    return p


def main() -> None:
    run(_parser().parse_args())


if __name__ == "__main__":
    main()
