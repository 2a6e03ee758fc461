"""Per-round benchmark (SURVEY.md §6, BASELINE.md protocol).

Runs the headline extraction pipeline + representative heavy queries
at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], and prints ONE JSON line:

  {"metric": "extraction_throughput_docs_per_sec", "value": N,
   "unit": "docs/sec", "queries": {...per-query seconds...},
   "sf": 0.1, ...}

The pages corpus is deterministic (engine.corpus, seed 42) and cached
as parquet under data/ so generation cost never pollutes timings.
Scaling-efficiency evidence (local[8] vs local[32]) is produced by
scripts/bench_scaling.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_PAGES = int(os.environ.get("BENCH_PAGES", "20000"))

# bench-only: spill/shuffle on tmpfs (this sandbox's disk is shared
# with other tenants; engine/session.py gates this behind the flag)
os.environ.setdefault("SPARK_GRAFT_TMPFS", "1")


def ensure_corpus(spark, n: int) -> str:
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "data", f"bench_pages_{n}"
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from engine.corpus import gen_pages_df

        # ~400 docs per file: enough uniform row groups that the scan
        # can balance at any local[N] (a row group is the atomic
        # split — few/uneven files cap wide parallelism at the
        # largest file, which is a corpus artifact, not engine cost)
        gen_pages_df(spark, n, partitions=max(64, n // 400)).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from pyspark.sql import functions as F

    from engine.pipeline import build_chunks, build_extracted, build_vectors
    from engine.queries_extract import ALL
    from engine.session import get_spark

    # 4MB scan splits for the bench session only: the 20k-page corpus
    # is ~155MB, so the production default (16m, engine/session.py)
    # yields ~12 map tasks — one straggler under host contention then
    # dominates the whole stage at local[32]. 4m keeps ~40 tasks
    # (~500 docs each) so every core stays fed at bench scale; the
    # production default is sized for TB-scale inputs where 16m
    # already gives millions of tasks.
    spark = get_spark(
        f"local[{cpus}]",
        shuffle_partitions=cpus,
        app_name="bench",
        extra={"spark.sql.files.maxPartitionBytes": "4m"},
    )
    corpus_path = ensure_corpus(spark, BENCH_PAGES)
    pages = spark.read.parquet(corpus_path)

    timings: dict[str, float] = {}

    def steal_jiffies() -> int:
        # col 9 of the aggregate cpu line = time this VM's vCPUs were
        # runnable but the host ran another tenant
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])

    def steal_rate(window: float = 1.0) -> float:
        """Fraction of total vCPU time stolen by the host over a short
        window. External-tenant contention NEVER shows in this VM's
        loadavg (separate kernels) — steal time is the only signal."""
        s0 = steal_jiffies()
        time.sleep(window)
        return (steal_jiffies() - s0) / 100.0 / (window * (os.cpu_count() or 32))

    def wait_quiet(max_wait: float = 120.0, thresh: float = 6.0) -> None:
        """Bounded contention gate: this sandbox shares 32 cores with
        external tenants. Gate on BOTH this VM's loadavg (our own
        leftover work) and host steal rate (other tenants); proceed
        regardless after max_wait so the bench always completes."""
        deadline = time.monotonic() + max_wait
        while time.monotonic() < deadline:
            if os.getloadavg()[0] <= thresh and steal_rate() < 0.05:
                return
            time.sleep(4)

    def timed(name: str, action, gate: float = 0.0):
        if gate:
            wait_quiet(max_wait=gate)
        t0 = time.monotonic()
        action()
        timings[name] = round(time.monotonic() - t0, 3)

    # headline: full extraction pipeline (dedup -> salt -> extract).
    # NOTE: a bare count() would let Catalyst prune the deterministic
    # extraction UDFs — the aggregate below touches every computed
    # column so the timing reflects real extraction work.
    n_docs_holder = {}

    def force(ex):
        row = ex.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("c"),
            F.sum(F.col("n_sents").cast("long")).alias("s"),
            F.max("content_sha256").alias("h"),
        ).collect()[0]
        return row["n"]

    # num_partitions deliberately NOT set: the dedup exchange is AQE-
    # sized (advisory 64m + coalesce), which measured faster than an
    # explicit repartition(cpus*2) by ~30% at 100k pages — the knob is
    # for callers that need a specific downstream layout, not for
    # throughput.
    def run_extract():
        n_docs_holder["n"] = force(build_extracted(pages))

    # warm-up (JVM + python workers), then timed. The headline is
    # best-of-3 load-gated runs with ALL samples + per-run steal
    # disclosed in the output: on this shared host a single sample can
    # carry a 3-7x external-tenant penalty (measured steal up to 25%
    # of the run window), so one draw measures the neighbor, not the
    # engine. Median is reported alongside (ADVICE r1).
    force(build_extracted(pages.limit(512)))
    extract_samples: list[dict] = []
    for _ in range(3):
        wait_quiet(max_wait=90.0)
        s0 = steal_jiffies()
        t0 = time.monotonic()
        run_extract()
        dt = time.monotonic() - t0
        stolen = (steal_jiffies() - s0) / 100.0
        extract_samples.append(
            {
                "sec": round(dt, 3),
                "steal_pct_of_window": round(
                    100.0 * stolen / (dt * (os.cpu_count() or 32)), 1
                ),
            }
        )
    secs = sorted(s["sec"] for s in extract_samples)
    timings["extract_pipeline"] = secs[0]
    timings["extract_pipeline_median"] = secs[len(secs) // 2]

    # stage-isolated timings: each stage reads its input from parquet
    # (mirrors the production job, jobs/ingest.py) so a stage's number
    # never includes recomputing its upstream
    ex_path = os.path.join(os.path.dirname(corpus_path), "_bench_extracted")
    build_extracted(pages).write.mode("overwrite").parquet(ex_path)
    ex_rd = spark.read.parquet(ex_path)
    ch_path = os.path.join(os.path.dirname(corpus_path), "_bench_chunks")
    timed(
        "chunk_pipeline",
        lambda: build_chunks(ex_rd).write.mode("overwrite").parquet(ch_path),
        gate=30.0,
    )
    ch_rd = spark.read.parquet(ch_path)
    timed(
        "vector_pipeline",
        lambda: build_vectors(ch_rd)
        .agg(F.count(F.lit(1)), F.sum(F.element_at("embedding", 1)))
        .collect(),
    )

    # representative relational/heavy queries from the registry
    for name in (
        "q01_pricing_summary",
        "q05_multiway_join",
        "q08_window_topk_per_group",
        "q22_cosine_topk",
        "q23_asof_join",
        "q26_ngram_jaccard_pairs",
        "q35_ann_ivf_topk",
        "q36_ann_lsh_bucket_topk",
        "q39_salted_skew_join",
        "q41_embed_neardup_pairs",
    ):
        fn, _oracle = ALL[name]
        timed(name, lambda fn=fn: fn(spark, sf_dir).count())

    # hash-banded near-dup candidates, timed per banding family (r4
    # registry shape: oracle-backed q45_simhash_pairs +
    # q46_minhash_pairs; the bench keeps the r1/r2 per-method timing
    # keys for round-over-round comparability)
    from engine.ops.dedup import minhash_candidate_pairs, simhash_candidate_pairs
    from engine.queries import T as _T

    # Level the documents input ONCE: the driver's sf0.1 file is a
    # single parquet row group (the atomic scan split), so every
    # pipeline below would otherwise run its map side on ONE task —
    # measuring input layout, not the operator (the same artifact
    # BASELINE.md records for the pages corpus, fixed there by writing
    # 250 uniform files). A real corpus arrives as many files; this
    # repartition+pin is the bench-side equivalent and changes no
    # results.
    bench_docs_all = (
        _T(spark, sf_dir, "documents")
        .repartition(cpus)
        .localCheckpoint(eager=True)
    )
    bench_docs = bench_docs_all.select("doc_id", "text")
    timed(
        "x04_minhash_lsh_pairs",
        lambda: minhash_candidate_pairs(bench_docs, n_bands=8, rows_per_band=4).count(),
    )
    timed(
        "x05_simhash_pairs",
        lambda: simhash_candidate_pairs(bench_docs, max_hamming=8).count(),
    )

    # end-to-end dedup clustering: minhash-banded candidate pairs ->
    # connected components (large-star/small-star) -> canonical doc
    def run_cluster():
        from engine.ops.graph import dedup_clusters
        from engine.queries import T

        pairs = minhash_candidate_pairs(
            bench_docs,
            n_bands=8,
            rows_per_band=4,
        )
        docs = bench_docs_all.select("doc_id")
        dedup_clusters(docs, pairs).agg(
            F.count(F.lit(1)), F.sum("is_canonical")
        ).collect()

    timed("dedup_cluster_pipeline", run_cluster)

    # map-only corpus curation over the documents table (quality
    # metrics + rule verdicts; lang screen off — the synthetic table's
    # lang labels are decorative)
    def run_curate():
        from engine.ops.curate import curate
        from engine.queries import T

        docs = bench_docs_all
        curate(docs, check_lang=False).agg(
            F.count(F.lit(1)), F.sum(F.col("keep").cast("long"))
        ).collect()

    timed("curate_pipeline", run_curate)

    # media pipeline (new r4): features over 4k mixed assets (real
    # PNG/JPEG/GIF/WAV decodes + metadata stubs) -> cross-format
    # image near-dup pairs. Corpus parquet-cached like the pages
    # corpus so generation never pollutes the timing.
    def run_media():
        from engine.ops.media import build_media_features, image_neardup_pairs

        mpath = os.path.join(
            os.path.dirname(corpus_path), "_bench_media_4000"
        )
        if not os.path.exists(os.path.join(mpath, "_SUCCESS")):
            from engine.synth.mediagen import gen_media_df

            gen_media_df(spark, 4000).repartition(cpus).write.mode(
                "overwrite"
            ).parquet(mpath)
        media = spark.read.parquet(mpath)
        feats = build_media_features(media, num_partitions=cpus)
        feats = feats.localCheckpoint(eager=True)
        feats.groupBy("kind", "decode_status").count().collect()
        image_neardup_pairs(feats, max_hamming=6).count()

    # warm the cached corpus OUTSIDE the timing
    run_media()
    timed("media_pipeline", run_media)

    # full Gopher repetition panel: one Arrow pass, all nine metrics
    # (new r3)
    def run_panel():
        from engine.ops.curate import with_repetition_panel

        with_repetition_panel(bench_docs).agg(
            F.count(F.lit(1)),
            F.sum("top_2gram_frac"),
            F.sum("dup_5gram_frac"),
        ).collect()

    timed("repetition_panel_pipeline", run_panel)

    # fastText-style hashed-ngram classifier: 8 training iterations
    # over a 25% sample + map-only scoring of the full table (new r3)
    def run_hashed_clf():
        from engine.ops.classify import score_hashed, train_hashed_logreg
        from engine.ops.sample import hash_sample

        pos = (
            hash_sample(bench_docs, 0.05, id_col="doc_id", salt="clfp")
            .select("text")
            .withColumn("_y", F.lit(1))
        )
        neg = (
            hash_sample(bench_docs, 0.20, id_col="doc_id", salt="clfn")
            .select("text")
            .withColumn("_y", F.lit(0))
        )
        model = train_hashed_logreg(
            pos.unionByName(neg), label_col="_y", max_iter=8, tol=0.0
        )
        score_hashed(bench_docs, model).agg(
            F.count(F.lit(1)), F.sum("quality_score")
        ).collect()

    timed("hashed_classifier_pipeline", run_hashed_clf)

    # DSIR selection: fit hashed-ngram log-ratios (two model-sized
    # aggs) + map-only closure scoring + Gumbel threshold (new r3)
    def run_dsir():
        from engine.ops.dsir import dsir_select_fraction, fit_dsir
        from engine.ops.sample import hash_sample

        docs = bench_docs
        target = hash_sample(docs, 0.05, id_col="doc_id", salt="bench")
        model = fit_dsir(target, docs, text_col="text")
        dsir_select_fraction(docs, model, 0.5, id_col="doc_id").agg(
            F.count(F.lit(1)), F.sum("dsir_logw")
        ).collect()

    timed("dsir_pipeline", run_dsir)

    # line-wise corrections: one map-only pure-codegen pass (new r3)
    def run_linefix():
        from engine.ops.linefix import fix_lines

        fix_lines(bench_docs).agg(
            F.count(F.lit(1)),
            F.sum("n_lines_removed"),
            F.sum(F.col("line_keep").cast("long")),
        ).collect()

    timed("linefix_pipeline", run_linefix)

    # corpus-trained LM: train (counting) + score (broadcast joins)
    # over the documents table in one timed pass
    def run_lm():
        from engine.ops.lm import score_stupid_backoff, train_stupid_backoff
        from engine.queries import T

        docs = bench_docs_all
        lm = train_stupid_backoff(docs)
        score_stupid_backoff(docs, lm).agg(
            F.count(F.lit(1)), F.sum("logppl")
        ).collect()

    timed("lm_score_pipeline", run_lm)

    # corpus-wide line-dedup rewrite over the documents table
    def run_linedup():
        from engine.ops.linedup import dedup_lines
        from engine.queries import T

        docs = bench_docs
        dedup_lines(docs).agg(
            F.count(F.lit(1)), F.sum("n_lines_dropped"), F.sum(F.length("text"))
        ).collect()

    timed("linedup_pipeline", run_linedup)

    # ExactSubstr rewrite: window hashes -> verdict join -> positions
    # agg -> Arrow rewrite (r3; times the O(tokens) window-scan pin)
    def run_substr():
        from engine.ops.substrdedup import dedup_substrings

        dedup_substrings(bench_docs, w=20).agg(
            F.count(F.lit(1)), F.sum("n_tokens_removed")
        ).collect()

    timed("substrdedup_pipeline", run_substr)

    # 13-gram benchmark decontamination: corpus side of the screen
    # (probe grams broadcast; corpus never shuffles)
    def run_decontaminate():
        from engine.ops.decontaminate import contamination_screen
        from engine.ops.sample import hash_sample

        probes = hash_sample(
            bench_docs, 0.02, id_col="doc_id", salt="decon"
        ).select("text")
        contamination_screen(bench_docs, probes).agg(
            F.count(F.lit(1)), F.sum("n_hits")
        ).collect()

    timed("decontaminate_pipeline", run_decontaminate)

    # training-mix tail: domain token-share cap (exact mode) then
    # sequence packing of the docs-as-chunks into 512-token examples
    def run_mix_pack():
        from engine.ops.mix import rebalance_domains
        from engine.ops.pack import pack_sequences, packing_stats
        from engine.queries import T

        docs = bench_docs_all.select(
            "doc_id",
            F.col("source").alias("host"),
            "text",
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        )
        bal = rebalance_domains(docs, 0.2, exact=True)
        chunks = bal.select(
            F.col("doc_id").cast("string").alias("url"),
            F.lit(0).alias("chunk_ix"),
            F.col("text").alias("chunk_text"),
        )
        packing_stats(pack_sequences(chunks, 512, n_shards=64), 512).collect()

    timed("mix_pack_pipeline", run_mix_pack)

    # crawl-frontier: outlinks -> canonical dedup -> Bloom seen-screen
    # (the pages' own urls as history) -> PageRank prior -> top-k
    def run_frontier():
        from engine.ops.frontier import frontier_candidates

        frontier_candidates(
            spark, pages, pages.select("url"), top_k=10_000
        ).agg(F.count(F.lit(1)), F.sum("priority")).collect()

    timed("frontier_pipeline", run_frontier)

    # ANN build+query quality/latency (VERDICT r4 next #6): the full
    # jobs/ann.py surface — IVF-exact and IVF-PQ/ADC arms over the
    # bench embeddings — with recall@10 against driver-side numpy
    # brute force (2000x64 is codebook-sized; the brute pass is the
    # ORACLE here, not a timed contestant). The jobs print their own
    # JSON result lines, so stdout is redirected: bench.py's contract
    # is ONE line.
    ann_info: dict = {}

    def run_ann():
        import contextlib
        import shutil
        import tempfile
        import types

        import numpy as np

        from jobs.ann import run as ann_run

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            F.col("vec_id").cast("long").alias("vec_id"), "embedding"
        )
        base = tempfile.mkdtemp(prefix="bench_ann_")
        queries_path = os.path.join(base, "queries")
        emb.orderBy("vec_id").limit(50).write.parquet(queries_path)

        rows = emb.collect()
        ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
        X = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        order = np.argsort(ids, kind="stable")
        qsel = order[:50]  # same rows as the LIMIT above (vec_id asc)

        def brute_top10(qi):
            sims = Xn @ Xn[qi]
            # score desc, id asc — the job's exact tie-break
            top = sorted(zip(-sims, ids))[:10]
            return {int(i) for _, i in top}

        truth = {int(ids[qi]): brute_top10(qi) for qi in qsel}

        def arm(name, build_args, query_args):
            out = os.path.join(base, name)
            with contextlib.redirect_stdout(
                open(os.devnull, "w")
            ):
                t0 = time.monotonic()
                ann_run(types.SimpleNamespace(
                    cmd="build", input=f"{sf_dir}/embeddings.parquet",
                    output=out, id_col="vec_id", vec_col="embedding",
                    master=f"local[{cpus}]", **build_args,
                ))
                build_s = time.monotonic() - t0
                t0 = time.monotonic()
                ann_run(types.SimpleNamespace(
                    cmd="query", input=None, output=out,
                    queries=queries_path, id_col="vec_id",
                    vec_col="embedding", topk=10,
                    master=f"local[{cpus}]", **query_args,
                ))
                query_s = time.monotonic() - t0
            got = {}
            for r in spark.read.parquet(os.path.join(out, "results")).collect():
                got.setdefault(int(r["qid"]), set()).add(int(r["vec_id"]))
            recall = sum(
                len(got.get(q, set()) & t) / 10 for q, t in truth.items()
            ) / len(truth)
            ann_info[name] = {
                "build_s": round(build_s, 3),
                "query_s": round(query_s, 3),
                "recall_at_10": round(recall, 4),
            }

        arm(
            "ivf_exact",
            dict(cells=64, store_vectors=True, pq_m=None),
            dict(nprobe=8, mode="exact"),
        )
        arm(
            "ivf_pq_adc",
            dict(cells=64, store_vectors=False, pq_m=8),
            dict(nprobe=8, mode="adc"),
        )
        shutil.rmtree(base, ignore_errors=True)

    timed("ann_pipeline", run_ann)

    docs_per_sec = round(n_docs_holder["n"] / timings["extract_pipeline"], 1)
    out = {
        "metric": "extraction_throughput_docs_per_sec",
        "value": docs_per_sec,
        "unit": "docs/sec",
        "queries": timings,
        "sf": sf,
        "n_pages": BENCH_PAGES,
        "n_docs_extracted": n_docs_holder["n"],
        "cpus": cpus,
        "extract_samples": extract_samples,
        "ann": ann_info,
        "headline_stat": "best-of-3 load-gated (median alongside); per-run host-steal disclosed",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
