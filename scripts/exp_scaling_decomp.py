"""Decompose 8->32-core scaling by layer (BENCH/BASELINE.md context).

Three measurements at each width, same 100k-page corpus:
  kernel : pure-Python fused route+extract in N pinned processes —
           the hardware + CPython ceiling (memory bandwidth, turbo).
  map    : Spark build_extracted(dedup=False) — adds parquet scan,
           Arrow crossings, scheduling; still zero shuffles.
  dedup  : full build_extracted — adds the one max_by exchange.

Efficiency of each layer pair tells WHERE wide-parallelism loss
comes from: kernel-vs-ideal = machine, map-vs-kernel = Spark
data plane, dedup-vs-map = the exchange.

Usage: python scripts/exp_scaling_decomp.py [--pages 100000]
       [--widths 8,32] [--runs 2] [--gate 3.0]
Prints a markdown table; paste-able into BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import statistics
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]

KERNEL_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, {root!r})
import multiprocessing as mp

def work(args):
    cpu, n_docs = args
    os.sched_setaffinity(0, {{cpu}})
    from engine.corpus import gen_pages_pandas
    from engine.udfs import _route_and_extract_one
    pdf = gen_pages_pandas(42, 0, 400)
    payloads = [bytes(h) if h is not None else None for h in pdf["html"]]
    done = 0
    while done < n_docs:
        take = min(len(payloads), n_docs - done)
        for p in payloads[:take]:
            _route_and_extract_one(p)
        done += take
    return done

if __name__ == "__main__":
    procs = {cpus}
    per = {pages} // procs
    with mp.Pool(procs) as pool:
        pool.map(work, [(i, 400) for i in range(procs)])  # warm imports
        t0 = time.monotonic()
        counts = pool.map(work, [(i, per) for i in range(procs)])
    t = time.monotonic() - t0
    print("RESULT " + json.dumps({{"t": t, "docs": sum(counts)}}))
"""

SPARK_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, {root!r})
from pyspark.sql import functions as F
from engine.session import get_spark
from engine.pipeline import build_extracted
cpus = {cpus}
spark = get_spark(f"local[{{cpus}}]", shuffle_partitions=cpus, app_name="decomp")
pages = spark.read.parquet({corpus!r})
def force():
    ex = build_extracted(pages, dedup={dedup})
    return ex.agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars"),
                  F.max("content_sha256")).collect()[0]
force()
t0 = time.monotonic(); row = force(); t = time.monotonic() - t0
print("RESULT " + json.dumps({{"t": t, "docs": row["n"]}}))
"""


def gated(gate: float) -> None:
    deadline = time.monotonic() + 600
    while os.getloadavg()[0] > gate and time.monotonic() < deadline:
        time.sleep(10)


def run(code: str, cpus: int, gate: float) -> dict:
    gated(gate)
    env = dict(os.environ, SPARK_GRAFT_TMPFS="1")
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", code],
        capture_output=True, text=True, cwd=str(ROOT), timeout=3600, env=env,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            r = json.loads(line[len("RESULT "):])
            r["load_end"] = round(os.getloadavg()[0], 1)
            return r
    raise RuntimeError(out.stderr[-2000:])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=100000)
    ap.add_argument("--widths", default="8,32")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--gate", type=float, default=3.0)
    args = ap.parse_args()
    widths = [int(x) for x in args.widths.split(",")]
    corpus = str(ROOT / "data" / f"bench_pages_{args.pages}")

    layers = {
        "kernel": lambda c: KERNEL_WORKER.format(
            root=str(ROOT), cpus=c, pages=args.pages
        ),
        "map": lambda c: SPARK_WORKER.format(
            root=str(ROOT), cpus=c, corpus=corpus, dedup="False"
        ),
        "dedup": lambda c: SPARK_WORKER.format(
            root=str(ROOT), cpus=c, corpus=corpus, dedup="True"
        ),
    }
    res: dict[str, dict[int, list]] = {}
    for name, mk in layers.items():
        res[name] = {}
        for c in widths:
            rs = [run(mk(c), c, args.gate) for _ in range(args.runs)]
            res[name][c] = rs
            print(
                f"{name} local[{c}]: "
                f"{[round(r['t'], 2) for r in rs]} s "
                f"(end loads {[r['load_end'] for r in rs]})",
                flush=True,
            )

    lo, hi = widths[0], widths[-1]
    ratio = hi / lo
    print(f"\n| Layer | t(local[{lo}]) med | t(local[{hi}]) med | "
          f"{lo}->{hi} efficiency |")
    print("|---|---|---|---|")
    for name in layers:
        m_lo = statistics.median(r["t"] for r in res[name][lo])
        m_hi = statistics.median(r["t"] for r in res[name][hi])
        eff = (m_lo / m_hi) / ratio
        print(f"| {name} | {m_lo:.2f}s | {m_hi:.2f}s | {eff:.3f} |")


if __name__ == "__main__":
    main()
