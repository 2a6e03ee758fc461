"""Clean-window A/B for VERDICT r3 next #4: attribute the r3 bench
regressions on x04_minhash_lsh_pairs (−14%) / x05_simhash_pairs
(−29%) to either (a) the r3 hot-bucket-cap + shared-banding-core
refactor's bounded overhead or (b) drift, and re-sample the
extraction headline that r2's one-off zero-steal aside (12.1k docs/s)
left open.

Protocol = BENCH/BASELINE.md: same leveled sf0.1 documents corpus,
local[32], load-gated samples with per-sample steal disclosed,
INTERLEAVED A/B draws (cap-on, cap-off, cap-on, ...) so slow ambient
drift hits both arms equally. Emits one JSON line; the analysis
lands in BENCH/BASELINE.md.

Usage: python scripts/bench_ab_hotcap.py [n_pairs=3]
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
    """Tighter than bench.py's gate (the A/B exists to settle a
    sub-30% question): loadavg <= thresh AND steal < 1%. Returns the
    observed pre-run steal."""
    deadline = time.monotonic() + max_wait
    while time.monotonic() < deadline:
        r = steal_rate()
        if os.getloadavg()[0] <= thresh and r < 0.01:
            return r
    return steal_rate()


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from engine.ops.dedup import (
        HOT_BUCKET_CAP,
        minhash_candidate_pairs,
        simhash_candidate_pairs,
    )
    from engine.queries import T
    from engine.session import get_spark

    spark = get_spark(
        f"local[{cpus}]",
        shuffle_partitions=cpus,
        app_name="bench-ab-hotcap",
        extra={"spark.sql.files.maxPartitionBytes": "4m"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = (
        T(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(cpus)
        .localCheckpoint(eager=True)
    )

    def run_minhash(cap):
        return minhash_candidate_pairs(
            docs, n_bands=8, rows_per_band=4, hot_bucket_cap=cap
        ).count()

    def run_simhash(cap):
        return simhash_candidate_pairs(
            docs, max_hamming=8, hot_bucket_cap=cap
        ).count()

    # warm-up both paths (JVM, python workers, shuffle dirs)
    run_minhash(HOT_BUCKET_CAP)
    run_simhash(HOT_BUCKET_CAP)

    samples: dict[str, list[dict]] = {}

    def draw(name: str, fn, cap) -> None:
        wait_quiet()
        s0 = steal_jiffies()
        t0 = time.monotonic()
        rows = fn(cap)
        dt = time.monotonic() - t0
        stolen = (steal_jiffies() - s0) / 100.0
        samples.setdefault(name, []).append(
            {
                "sec": round(dt, 3),
                "rows": rows,
                "steal_pct_of_window": round(
                    100.0 * stolen / (dt * (os.cpu_count() or 32)), 2
                ),
            }
        )

    for _ in range(n_pairs):  # interleaved arms
        draw("minhash_cap_on", run_minhash, HOT_BUCKET_CAP)
        draw("minhash_cap_off", run_minhash, None)
        draw("simhash_cap_on", run_simhash, HOT_BUCKET_CAP)
        draw("simhash_cap_off", run_simhash, None)

    def med(name):
        xs = sorted(s["sec"] for s in samples[name])
        return xs[len(xs) // 2]

    out = {
        "sf_dir": sf_dir,
        "cpus": cpus,
        "hot_bucket_cap_default": HOT_BUCKET_CAP,
        "samples": samples,
        "medians": {k: med(k) for k in samples},
        "cap_overhead_pct": {
            fam: round(
                100.0
                * (med(f"{fam}_cap_on") - med(f"{fam}_cap_off"))
                / med(f"{fam}_cap_off"),
                1,
            )
            for fam in ("minhash", "simhash")
        },
    }
    print(json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
