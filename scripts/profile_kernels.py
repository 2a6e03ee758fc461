"""Single-process cProfile of the per-document kernel chain.

Reads the parquet-cached bench corpus directly with pyarrow (no Spark,
no Arrow IPC, no scheduler) so the profile shows pure kernel cost —
the same code the fused route_extract_udf runs per document — plus the
downstream chunk/embed/fingerprint kernels. Use this to pick the next
constant-factor target; bench.py measures the end-to-end effect.

Usage: python scripts/profile_kernels.py [n_pages=2000] [stage=all]
  stage in {extract, chunk, embed, fingerprint, all}
"""

from __future__ import annotations

import cProfile
import pathlib
import pstats
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def load_pages(n: int) -> list[bytes]:
    import pyarrow.dataset as ds

    for cand in sorted(ROOT.glob("data/bench_pages_*")):
        tab = ds.dataset(str(cand)).head(n, columns=["html"])
        return [v.as_py() for v in tab["html"]]
    raise SystemExit("no data/bench_pages_* corpus; run bench.py once")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    stage = sys.argv[2] if len(sys.argv) > 2 else "all"
    pages = load_pages(n)

    from engine.kernels import fingerprint as fp
    from engine.kernels.chunker import chunk_rows
    from engine.kernels.embed import embed_text
    from engine.udfs import _route_and_extract_one
    from engine.kernels.sentences import sentence_spans_batch

    texts: list[str] = []
    spans: list = []

    def run_extract():
        # mirrors route_extract_udf: per-doc route+parse, then ONE
        # batched sentence pass per 512-doc Arrow-sized group
        for i in range(0, len(pages), 512):
            grp = [_route_and_extract_one(raw) for raw in pages[i : i + 512]]
            spans.extend(sentence_spans_batch([t for _p, t, _e in grp]))
            texts.extend(t for _p, t, _e in grp)

    def run_chunk():
        # mirrors chunk_map_in_pandas: spans were computed at extract
        # time and carried along; the chunker only packs them
        import numpy as np

        for t, sp in zip(texts, spans):
            chunk_rows(t, spans=np.asarray(sp, dtype=np.int64).reshape(-1, 2))

    def run_embed():
        for t in texts:
            embed_text(t[:2000])

    def run_fingerprint():
        # mirrors minhash_sig_udf / simhash64_udf: the flat batch
        # kernels over Arrow-sized groups, NOT the per-doc fallbacks
        for i in range(0, len(texts), 512):
            grp = texts[i : i + 512]
            fp.minhash_sigs(grp)
            fp.simhash64_many(grp)

    stages = {
        "extract": run_extract,
        "chunk": run_chunk,
        "embed": run_embed,
        "fingerprint": run_fingerprint,
    }
    todo = list(stages) if stage == "all" else [stage]
    if "extract" not in todo:  # downstream stages need texts
        run_extract()

    for name in todo:
        prof = cProfile.Profile()
        t0 = time.monotonic()
        prof.enable()
        stages[name]()
        prof.disable()
        dt = time.monotonic() - t0
        print(f"\n=== {name}: {dt:.2f}s for {n} pages "
              f"({n / dt:.0f} docs/s single-core) ===")
        st = pstats.Stats(prof)
        st.sort_stats("cumulative").print_stats(18)


if __name__ == "__main__":
    main()
