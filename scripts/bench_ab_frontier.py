"""Clean-window A/B for VERDICT r4 watch item #1: attribute the r4
`frontier_pipeline` bench delta (r3 6.14s -> r4 file 7.87s) between
(a) the r4 `fits_broadcast_budget` probe actions added at
engine/ops/frontier.py:166,195 and (b) ambient host contention.

The r5 clean-window recapture already lands frontier at 5.73s —
below every prior round — so (b) is the prior; this script closes the
attribution with THREE interleaved arms on the exact bench shape:

  gated    the shipping path: probe agg, then broadcast (probe cost
           INCLUDED)
  forced   broadcast without the probe (monkeypatched gate) — the
           pre-r4 behavior; gated - forced = pure probe cost
  aqe      no probe, no broadcast hint (budget=None) — what the gate
           falls back to above budget

Protocol = scripts/bench_ab_hotcap.py: load-gated (<1% steal) draws,
arms interleaved so ambient drift hits all equally, per-sample steal
disclosed. Emits one JSON line; analysis lands in BENCH/BASELINE.md.

Usage: python scripts/bench_ab_frontier.py [n_rounds=3]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_TMPFS", "1")


def steal_jiffies() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def steal_rate(window: float = 1.0) -> float:
    s0 = steal_jiffies()
    time.sleep(window)
    return (steal_jiffies() - s0) / 100.0 / (window * (os.cpu_count() or 32))


def wait_quiet(max_wait: float = 600.0, thresh: float = 3.0) -> float:
    deadline = time.monotonic() + max_wait
    while time.monotonic() < deadline:
        r = steal_rate()
        if os.getloadavg()[0] <= thresh and r < 0.01:
            return r
    return steal_rate()


def main() -> None:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    import engine.ops.frontier as frontier_mod
    from engine.ops.frontier import frontier_candidates
    from engine.session import get_spark

    spark = get_spark(
        f"local[{cpus}]",
        shuffle_partitions=cpus,
        app_name="bench-ab-frontier",
        extra={"spark.sql.files.maxPartitionBytes": "4m"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # the bench corpus, exactly as bench.py reads it
    n = int(os.environ.get("BENCH_PAGES", "20000"))
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data",
        f"bench_pages_{n}",
    )
    pages = spark.read.parquet(path)

    real_gate = frontier_mod.fits_broadcast_budget

    def run(arm: str) -> int:
        if arm == "forced":
            frontier_mod.fits_broadcast_budget = lambda *a, **k: True
        else:
            frontier_mod.fits_broadcast_budget = real_gate
        try:
            budget = None if arm == "aqe" else 512 * 1024 * 1024
            return (
                frontier_candidates(
                    spark,
                    pages,
                    pages.select("url"),
                    top_k=10_000,
                    broadcast_bytes=budget,
                )
                .agg(F.count(F.lit(1)), F.sum("priority"))
                .collect()[0][0]
            )
        finally:
            frontier_mod.fits_broadcast_budget = real_gate

    for arm in ("gated", "forced", "aqe"):  # warm-up all three plans
        run(arm)

    samples: dict[str, list[dict]] = {}

    def draw(arm: str) -> None:
        wait_quiet()
        s0 = steal_jiffies()
        t0 = time.monotonic()
        rows = run(arm)
        dt = time.monotonic() - t0
        stolen = (steal_jiffies() - s0) / 100.0
        samples.setdefault(arm, []).append(
            {
                "sec": round(dt, 3),
                "rows": rows,
                "steal_pct_of_window": round(
                    100.0 * stolen / (dt * (os.cpu_count() or 32)), 2
                ),
            }
        )

    for _ in range(n_rounds):
        for arm in ("gated", "forced", "aqe"):
            draw(arm)

    def med(name):
        xs = sorted(s["sec"] for s in samples[name])
        return xs[len(xs) // 2]

    meds = {k: med(k) for k in samples}
    out = {
        "n_pages": n,
        "cpus": cpus,
        "samples": samples,
        "medians": meds,
        "probe_cost_sec": round(meds["gated"] - meds["forced"], 3),
        "rows_equal": len({s["rows"] for v in samples.values() for s in v})
        == 1,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
