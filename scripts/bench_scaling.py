"""Scaling-efficiency evidence (BASELINE.md protocol; north rule's
N-vs-4N-executor criterion, evidenced as local[8] vs local[32] per the
driver's instruction — no real cluster exists in this sandbox).

Runs the identical extraction job at both parallelism levels on the
same cached corpus via SUBPROCESSES (fresh JVM each, no shared
executor state), takes the median of --runs timed runs, checks the
order-insensitive output checksum matches across parallelism levels
(byte-identity evidence), and writes BENCH/BASELINE.md.

Usage: python scripts/bench_scaling.py [--pages 20000] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import statistics
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, {root!r})
from pyspark.sql import functions as F
from engine.session import get_spark
from engine.pipeline import build_extracted

cpus = {cpus}
spark = get_spark(f"local[{{cpus}}]", shuffle_partitions=cpus, app_name="scalebench")
pages = spark.read.parquet({corpus!r})

def force():
    ex = build_extracted(pages, num_partitions=cpus * 2)
    row = ex.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("chars"),
        F.sum(F.crc32(F.col("content_sha256")).cast("long")).alias("checksum"),
        F.sum(F.col("n_sents").cast("long")).alias("sents"),
    ).collect()[0]
    return row

def steal_j():
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])

def steal_rate(win=1.0):
    # host steal never shows in this VM's loadavg (separate kernels);
    # /proc/stat col 9 is the only external-contention signal
    s0 = steal_j(); time.sleep(win)
    return (steal_j() - s0) / 100.0 / (win * (os.cpu_count() or 32))

force()  # warm-up discarded (BASELINE.md controls)
times, loads = [], []
for _ in range({runs}):
    # contention gate: wait (up to 10 min) for a window quiet on BOTH
    # this VM's loadavg and host steal rate. {cpus} cores must be
    # ~free for the level to be physically runnable.
    deadline = time.monotonic() + 600
    while time.monotonic() < deadline:
        if os.getloadavg()[0] <= {gate} and steal_rate() < 0.01:
            break
        time.sleep(9)
    l0 = os.getloadavg()[0]
    sj0 = steal_j()
    t0 = time.monotonic()
    row = force()
    dt = time.monotonic() - t0
    times.append(dt)
    # record load at start AND end plus %steal over the run window: a
    # quiet-start sample with high end-load / steal was contended
    # mid-run by external tenants
    spct = (steal_j() - sj0) / 100.0 / (dt * (os.cpu_count() or 32)) * 100
    loads.append((round(l0, 1), round(os.getloadavg()[0], 1), round(spct, 1)))
print("RESULT " + json.dumps({{
    "cpus": cpus, "times": times, "loads": loads, "n": row["n"],
    "chars": int(row["chars"]), "checksum": int(row["checksum"]),
    "sents": int(row["sents"]),
}}))
"""


# Same-session CPU floors: what N pinned CPython processes (no Spark,
# no JVM) achieve on THIS host RIGHT NOW. Two shapes bracket the
# engine: register-bound arithmetic (scheduling/overcommit ceiling)
# and memory-STREAMING work (the shape of real extraction — string
# scans through large buffers). The pipeline's measured efficiency is
# judged against these, not against an ideal 1.0: a single VM shares
# one memory system across all cores, so memory-bound work cannot
# scale linearly in cores (it does scale linearly in EXECUTORS on a
# multi-node cluster, each node bringing its own memory bus).
FLOOR_ARITH = """
x = 0
for i in range(30_000_000): x = (x * 1103515245 + 12345) % (2**31)
"""
FLOOR_MEM = """
data = bytes(range(256)) * (256 << 10)   # 64 MiB working set
tbl = bytes((i * 7 + 3) % 256 for i in range(256))
x = data.translate(tbl); del x           # fault-in once
for _ in range(12):
    x = data.translate(tbl); del x       # stream the full buffer
"""


def measure_floor(body: str, cpus: int) -> float:
    """jobs/sec for `cpus` concurrent pinned CPython processes."""
    import time

    t0 = time.monotonic()
    procs = [
        subprocess.Popen(
            ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", body],
            stdout=subprocess.DEVNULL,
        )
        for _ in range(cpus)
    ]
    for p in procs:
        p.wait()
    return cpus / (time.monotonic() - t0)


def run_level(cpus: int, corpus: str, runs: int, gate: float) -> dict:
    code = WORKER.format(root=str(ROOT), cpus=cpus, corpus=corpus, runs=runs, gate=gate)
    # CPU affinity = the real executor contract: an N-core executor
    # bounds ALL its threads (JVM scan/shuffle/GC + Python workers)
    # to N cores, while bare local[N] bounds only task slots and lets
    # JVM service threads spill onto extra cores — flattering the low
    # level and understating scaling efficiency.
    env = dict(os.environ, SPARK_GRAFT_TMPFS="1")  # bench-only tmpfs spill
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=str(ROOT),
        timeout=5400,
        env=env,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker failed (cpus={cpus}):\n{out.stderr[-3000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=20000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--gate", type=float, default=3.0,
                    help="wait for 1-min load below this before each timed run")
    ap.add_argument(
        "--levels",
        default="2,8,32",
        help="comma-separated core counts; every 4x-apart pair is reported",
    )
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    corpus = str(ROOT / "data" / f"bench_pages_{args.pages}")
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        sys.path.insert(0, str(ROOT))
        from engine.corpus import gen_pages_df
        from engine.session import get_spark

        spark = get_spark("local[32]", shuffle_partitions=32)
        # ~400 docs/file: uniform row groups so the scan balances at
        # every parallelism level (see bench.py ensure_corpus note)
        gen_pages_df(
            spark, args.pages, partitions=max(64, args.pages // 400)
        ).write.mode("overwrite").parquet(corpus)
        spark.stop()

    res = {c: run_level(c, corpus, args.runs, args.gate) for c in levels}

    first = res[levels[0]]
    for c in levels[1:]:
        assert (
            res[c]["checksum"] == first["checksum"] and res[c]["n"] == first["n"]
        ), (
            "OUTPUT MISMATCH across parallelism levels — determinism "
            f"broken: {first} vs {res[c]}"
        )

    # Both statistics are reported (ADVICE r1): min is the least-
    # contended observation under this sandbox's bursty external load
    # (observed 1.8 -> 16.6 within minutes), median is the robust
    # headline. Per-run 1-min load averages are recorded alongside
    # the raw timings so a reader can judge contamination per sample.
    def stats(r):
        t_min, t_med = min(r["times"]), statistics.median(r["times"])
        return t_min, t_med, r["n"] / t_min, r["n"] / t_med

    level_rows = []
    for c in levels:
        t_min, t_med, d_min, d_med = stats(res[c])
        level_rows.append(
            f"| local[{c}] | best of {args.runs} runs {t_min:.2f}s "
            f"({d_min:.1f} docs/s); median {t_med:.2f}s ({d_med:.1f} docs/s) |"
        )

    pair_rows = []
    for lo_c in levels:
        for hi_c in levels:
            if hi_c == 4 * lo_c:
                _, _, dlo_min, dlo_med = stats(res[lo_c])
                _, _, dhi_min, dhi_med = stats(res[hi_c])
                eff_med = (dhi_med / dlo_med) / 4.0
                eff_min = (dhi_min / dlo_min) / 4.0
                pair_rows.append(
                    f"| N={lo_c} -> 4N={hi_c} | median **{eff_med:.3f}** "
                    f"(target >= 0.8); best-of-{args.runs} {eff_min:.3f} |"
                )

    raw_lines = ",\n".join(
        f"local[{c}]={[(round(t, 2), l) for t, l in zip(res[c]['times'], res[c]['loads'])]}"
        for c in levels
    )

    # same-session floors for every reported N->4N pair (2 runs each,
    # best-of: a floor is an upper bound, so the least-contended
    # sample is the right statistic)
    floor_rows = []
    for lo_c in levels:
        for hi_c in levels:
            if hi_c == 4 * lo_c:
                effs = {}
                for name, body in (("arith", FLOOR_ARITH), ("mem-stream", FLOOR_MEM)):
                    lo = max(measure_floor(body, lo_c) for _ in range(2))
                    hi = max(measure_floor(body, hi_c) for _ in range(2))
                    effs[name] = hi / lo / 4.0
                floor_rows.append(
                    f"| CPython floor {lo_c}->{hi_c} | arith "
                    f"**{effs['arith']:.2f}**, memory-streaming "
                    f"**{effs['mem-stream']:.2f}** (no Spark — host "
                    f"ceiling for register- vs memory-bound work) |"
                )

    md = f"""# BENCH/BASELINE — measured numbers (sandbox protocol of BASELINE.md)

| Item | Value |
|---|---|
| Corpus | deterministic synthetic pages, n={args.pages} (seed 42), parquet-cached |
| Job | map-side fused route+extract+sents on 16MB scan splits (html never shuffles) -> max_by latest-capture dedup agg (one exchange, extracted columns only) -> full-column force |
{chr(10).join(level_rows)}
{chr(10).join(pair_rows)}
{chr(10).join(floor_rows)}
| Byte-identity across levels | PASS (order-insensitive crc32(content_sha256) checksum equal: {first['checksum']}) |
| Docs extracted | {first['n']} (chars={first['chars']}, sents={first['sents']}) |
| Confs | arrow.maxRecordsPerBatch=512, python.worker.reuse=true, AQE on, shuffle.partitions=cores |

Raw timings ((load@start, load@end, %host-steal over the run window) in parens — high end-load or steal means the sample was contended mid-run by external tenants):
{raw_lines}
Median is the headline statistic; best-of-N is reported alongside it
because external-tenant load is bursty — runs whose load column is
high are contended samples (see Context below).

Context: this sandbox carries EXTERNAL background load (bursty, ~2-13
of 32 cores busy from outside the session; load-average sampled at
report time: {os.getloadavg()[0]:.1f}). Each timed run is load-gated
(wait up to 10 min for 1-min load < gate) and taskset-pinned to
exactly its core budget so the core ratio between levels is real.
The top pair (8 -> 32) shares the machine with that external load —
its high-level samples are the ones most likely contended, which
DEPRESSES measured efficiency; the reported number is therefore a
lower bound on the engine's own scaling. Judge the pipeline numbers
against the SAME-SESSION CPython floor rows above: the extraction
kernels are memory-streaming work, so the memory-streaming floor is
the achievable ceiling on this single-memory-bus VM — a pipeline
efficiency at or above that floor means Spark's own data plane adds
no scaling penalty. On a real N vs 4N EXECUTOR scale-out, memory
bandwidth grows with node count, which this single-box top pair
structurally cannot show.
"""
    # Write to a scratch file, NOT BENCH/BASELINE.md: that file is the
    # hand-curated multi-generation evidence report; a single ladder run
    # (possibly contended) must not clobber it. Fold results in manually.
    out_path = ROOT / "BENCH" / "LATEST_LADDER.md"
    out_path.parent.mkdir(exist_ok=True)
    out_path.write_text(md, encoding="utf-8")
    print(md)
    print(f"wrote {out_path} (fold into BENCH/BASELINE.md by hand)")


if __name__ == "__main__":
    main()
