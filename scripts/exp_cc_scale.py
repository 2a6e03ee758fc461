"""Connected-components scale experiment (engine/ops/graph.py).

Builds a deterministic worst-case-diameter graph IN SPARK (no driver
loop): N nodes as disjoint chains of length L. A chain has diameter
L-1, so naive label propagation needs ~L rounds; alternating
large-star/small-star must converge in O(log L). This script measures
the actual round count and wall time, and verifies the component
count and membership sums exactly (both are closed-form for chains).

Usage: python scripts/exp_cc_scale.py [--nodes 1000000] [--chain 1000]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from pyspark.sql import functions as F  # noqa: E402

from engine.ops.graph import connected_components  # noqa: E402
from engine.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--chain", type=int, default=1000)
    ap.add_argument("--master", default=f"local[{os.cpu_count() or 8}]")
    args = ap.parse_args()
    n, L = args.nodes, args.chain
    assert n % L == 0, "--nodes must be a multiple of --chain"

    spark = get_spark(args.master, app_name="cc-scale")
    edges = (
        spark.range(n)
        .filter((F.col("id") % L) != L - 1)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    )

    stats: dict = {}
    t0 = time.monotonic()
    cc = connected_components(edges, max_iter=60, stats=stats)
    row = cc.agg(
        F.count(F.lit(1)).alias("nodes"),
        F.count_distinct("component").alias("components"),
        F.sum("component").alias("comp_sum"),
    ).collect()[0]
    wall = time.monotonic() - t0

    n_chains = n // L
    # each chain's component id is its minimum node (k*L); every node
    # of the chain carries it
    expect_sum = sum(k * L for k in range(n_chains)) * L
    ok = (
        row["nodes"] == n
        and row["components"] == n_chains
        and row["comp_sum"] == expect_sum
    )
    print(
        json.dumps(
            {
                "nodes": n,
                "edges": n - n_chains,
                "chain_len": L,
                "diameter": L - 1,
                "rounds": stats.get("rounds"),
                "wall_s": round(wall, 2),
                "correct": ok,
            }
        )
    )
    assert ok, row


if __name__ == "__main__":
    main()
