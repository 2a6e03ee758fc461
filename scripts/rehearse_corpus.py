"""Scale rehearsal of the 12-stage corpus job (VERDICT r4 next #5):
run the FLAGSHIP full-screen command (the r3 100k configuration,
unchanged) at two corpus sizes, record per-stage walls (from the
job's own corpus_manifest.json commits) and per-stage PEAK memory
(driver python / JVM / pyspark workers, sampled from /proc every
second and attributed to the stage open at sample time), and flag
any stage whose wall or driver memory grows super-linearly vs the
smaller run.

Usage:
    python scripts/rehearse_corpus.py 100000 /tmp/rehearse_100k
    python scripts/rehearse_corpus.py 500000 /tmp/rehearse_500k
    python scripts/rehearse_corpus.py --compare \
        /tmp/rehearse_100k /tmp/rehearse_500k 5.0

Each run emits ONE JSON line (also written to <out>/rehearsal.json);
--compare reads two of those and prints the per-stage ratio table.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# --substr-w is env-overridable (REHEARSE_SUBSTR_W): the r5 rehearsal
# measured ExactSubstr's transient spill at 500k pages as > 66 GB —
# beyond this sandbox's disk — so the 5x ladder runs the OTHER 11
# stages with it off (0) while the 2x 100k->200k ladder covers it.
FLAGS = [
    "--respect-noindex", "--fix-lines",
    "--substr-w", os.environ.get("REHEARSE_SUBSTR_W", "50"),
    "--gopher-repetition", "--compression-min", "0.20",
    "--compression-max", "0.98", "--drop-code",
    "--lm-filter", "--lm-pct", "90",
    "--mix-alpha", "0.7", "--mix-min-tokens", "2000",
    "--splits", "train=0.98,val=0.01,test=0.01",
    "--pack-budget", "1024", "--bpe-merges", "200",
    "--export-shard-mb", "16",
    "--sample-fraction", "0.5", "--max-host-share", "0.05",
    "--report",
]


def _rss_kb(pid: int) -> int:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1])
    except OSError:
        pass
    return 0


def _children(pid: int) -> list[int]:
    out = []
    try:
        for tid in os.listdir(f"/proc/{pid}/task"):
            with open(f"/proc/{pid}/task/{tid}/children") as f:
                out.extend(int(c) for c in f.read().split())
    except OSError:
        pass
    return out


def _comm(pid: int) -> str:
    try:
        with open(f"/proc/{pid}/comm") as f:
            return f.read().strip()
    except OSError:
        return ""


def _tree_rss(root: int) -> dict:
    """Classified RSS over the process tree: driver python / jvm /
    worker pythons (pyspark daemon + forks)."""
    out = {"driver_py_kb": _rss_kb(root), "jvm_kb": 0, "workers_kb": 0}
    stack = _children(root)
    seen = set()
    while stack:
        pid = stack.pop()
        if pid in seen:
            continue
        seen.add(pid)
        stack.extend(_children(pid))
        kb = _rss_kb(pid)
        if _comm(pid) == "java":
            out["jvm_kb"] += kb
        else:
            out["workers_kb"] += kb
    return out


def rehearse(n_pages: int, out_dir: str, resume: bool = False) -> dict:
    pages = os.path.join(REPO, "data", f"bench_pages_{n_pages}")
    if not os.path.exists(os.path.join(pages, "_SUCCESS")):
        raise SystemExit(f"missing corpus {pages} — generate via bench.py")
    if not resume:
        subprocess.run(["rm", "-rf", out_dir], check=True)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    cmd = [
        sys.executable, os.path.join(REPO, "jobs", "corpus.py"),
        "--pages", pages, "--output", out_dir,
        "--master", f"local[{cpus}]", "--shuffle-partitions", str(cpus),
        *(["--resume"] if resume else []),
        *FLAGS,
    ]
    # DISK shuffle, deliberately NOT the bench tmpfs opt-in: the
    # 12-stage job's shuffle volume at 500k pages exceeds what
    # tmpfs(=RAM) can absorb next to a 24g-heap JVM — the first 500k
    # attempt global-OOM'd inside substrdedup exactly this way, which
    # is the production-relevant lesson (shuffle belongs on disk for
    # multi-stage jobs; tmpfs is a micro-bench trick for short timed
    # windows).
    env = {k: v for k, v in os.environ.items() if k != "SPARK_GRAFT_TMPFS"}
    t_start = time.monotonic()
    proc = subprocess.Popen(
        cmd,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        env=env,
        cwd=REPO,
        text=True,
    )

    manifest_path = os.path.join(out_dir, "corpus_manifest.json")
    stage_mem: dict[str, dict] = {}
    stage_order: list[str] = []
    stop = threading.Event()

    def sampler():
        while not stop.is_set():
            try:
                with open(manifest_path) as f:
                    committed = list(json.load(f)["stages"])
            except (OSError, ValueError):
                committed = []
            for s in committed:
                if s not in stage_order:
                    stage_order.append(s)
            # the stage OPEN now is the one after the last commit
            open_stage = f"stage_{len(committed)}"
            mem = _tree_rss(proc.pid)
            slot = stage_mem.setdefault(
                open_stage, {k: 0 for k in mem}
            )
            for k, v in mem.items():
                slot[k] = max(slot[k], v)
            stop.wait(1.0)

    th = threading.Thread(target=sampler, daemon=True)
    th.start()
    tail: list[str] = []
    markers: list[str] = []  # root-cause lines survive the tail cap
    import re

    marker_re = re.compile(
        r"No space left|OutOfMemory|Killed|Caused by|SparkException|"
        r"FileNotFoundException|FetchFailed"
    )
    for line in proc.stdout:
        tail.append(line)
        if len(tail) > 200:
            tail.pop(0)
        if marker_re.search(line) and len(markers) < 40:
            markers.append(line.strip())
    rc = proc.wait()
    stop.set()
    th.join(5)
    wall = time.monotonic() - t_start

    stages = {}
    try:
        with open(manifest_path) as f:
            man = json.load(f)["stages"]
    except (OSError, ValueError):
        man = {}
    # stage i (0-based, commit order) was "open" while len(committed)==i
    for i, name in enumerate(stage_order):
        info = dict(man.get(name, {}))
        info.pop("params", None)
        mem = stage_mem.get(f"stage_{i}", {})
        stages[name] = {
            **{k: info.get(k) for k in ("rows", "wall_s") if k in info},
            **{f"peak_{k[:-3]}_mb": round(v / 1024) for k, v in mem.items()},
        }
    result = {
        "n_pages": n_pages,
        "rc": rc,
        "wall_s": round(wall, 1),
        "cpus": cpus,
        "stages": stages,
        "stage_order": stage_order,
        "tail": "".join(tail[-8:]) if rc != 0 else None,
        "error_markers": markers or None,
    }
    with open(os.path.join(out_dir, "rehearsal.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    return result


def compare(small_dir: str, big_dir: str, data_ratio: float) -> None:
    a = json.load(open(os.path.join(small_dir, "rehearsal.json")))
    b = json.load(open(os.path.join(big_dir, "rehearsal.json")))
    rows = []
    for s in b["stage_order"]:
        wa = (a["stages"].get(s) or {}).get("wall_s")
        wb = (b["stages"].get(s) or {}).get("wall_s")
        ma = (a["stages"].get(s) or {}).get("peak_jvm_mb") or 0
        mb = (b["stages"].get(s) or {}).get("peak_jvm_mb") or 0
        ratio = round(wb / wa, 2) if wa and wb else None
        flag = ""
        if ratio and ratio > data_ratio * 1.2:
            flag = "SUPER-LINEAR-WALL"
        if ma and mb and mb / ma > 3:
            flag = (flag + "+MEM").strip("+")
        rows.append((s, wa, wb, ratio, ma, mb, flag))
    print(json.dumps({
        "data_ratio": data_ratio,
        "total_wall": [a["wall_s"], b["wall_s"]],
        "per_stage": [
            {"stage": s, "wall_small": wa, "wall_big": wb,
             "ratio": r, "jvm_small_mb": ma, "jvm_big_mb": mb,
             "flag": fl}
            for s, wa, wb, r, ma, mb, fl in rows
        ],
    }))


if __name__ == "__main__":
    if sys.argv[1] == "--compare":
        compare(sys.argv[2], sys.argv[3], float(sys.argv[4]))
    else:
        rehearse(
            int(sys.argv[1]), sys.argv[2],
            resume="--resume" in sys.argv[3:],
        )
