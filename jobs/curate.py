"""Corpus-curation job — quality-filter a documents table.

    spark-submit --py-files engine.zip jobs/curate.py \
        --input /data/documents --output /data/curated \
        [--min-tokens 20] [--no-check-lang]

Map-only (engine/ops/curate.py): metrics + verdicts attach with zero
shuffles; the partitioned write is the only exchange-free sink pass.

`--lm-filter` adds a CCNet-style perplexity screen on top of the rule
verdicts (engine/ops/lm.py): a Stupid-Backoff trigram LM is trained on
the RULE-PASSING slice (the corpus's own "trusted" text — no external
model artifact), every doc is scored against it, and docs whose
log-perplexity lands above the `--lm-pct` percentile of the kept
slice's scores are rejected with reason "lm_ppl". Training is one
count groupBy; scoring broadcasts the pruned model, so the extra cost
is two more map-shaped passes over the input — no corpus shuffle.

`--url-filter` prepends a RefinedWeb-style URL screen
(engine/ops/urlfilter): pinned keyword scoring over the url plus an
optional domain blocklist (`--url-blocklist`, subdomain-suffix
matched) — rejected with reasons "url_domain" / "url_score" before
any content rule runs, and the LM/classifier below then train only
on url-clean docs.

`--classifier-ref <parquet>` trains the CCNet-style quality
classifier (engine/ops/classify.py) with the given TRUSTED docs as
the positive class and this corpus as the negative, then attaches
`quality_score` (a pure codegen projection — the verdict rows already
carry the metric feature columns); `--classifier-min-score` turns the
score into a screen (reason "clf_score").

Writes:

    <output>/kept        documents passing every rule
    <output>/rejected    documents + reasons (audit trail)

and prints a one-line JSON summary with per-reason counts.

Note: the sandbox's synthetic documents table carries decorative lang
labels over English-jargon text (x07_langid_mismatch measures that
disagreement), so on that table use --no-check-lang unless the point
is to exercise the lang screen.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from engine.io.tables import write_table  # noqa: E402
from engine.ops.curate import DEFAULT_RULES, curate  # noqa: E402
from engine.session import get_spark  # noqa: E402


def run(args) -> dict:
    from engine.cli import fill_defaults

    fill_defaults(args, _parser())
    spark = get_spark(
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
        app_name="webtext-curate",
    )
    t0 = time.monotonic()
    from engine.io.export import read_docs

    docs = read_docs(
        spark, args.input, fmt=args.input_format, schema=args.input_schema
    )

    rules = dict(DEFAULT_RULES)
    if args.min_tokens is not None:
        rules["n_tokens"] = (args.min_tokens, rules["n_tokens"][1])
    if args.top_bigram_max is not None:
        # Gopher within-doc repetition rule (engine/ops/curate.py)
        from engine.ops.curate import with_top_bigram_frac

        docs = with_top_bigram_frac(docs, text_col=args.text_col)
        rules["top_bigram_frac"] = (0.0, args.top_bigram_max)
    if args.gopher_repetition:
        # full Gopher repetition panel (top-2/3/4-gram + dup-5..10-gram
        # character fractions) at the paper's published cuts
        from engine.ops.curate import (
            gopher_repetition_rules,
            with_repetition_panel,
        )

        docs = with_repetition_panel(docs, text_col=args.text_col)
        rules.update(gopher_repetition_rules())
    if args.badwords:
        # C4-style banned-word screen; the list file is the caller's
        # policy artifact (one term per line, # comments)
        from engine.ops.wordfilter import screen_banned_words

        with open(args.badwords, encoding="utf-8") as f:
            terms = [
                ln.strip()
                for ln in f
                if ln.strip() and not ln.lstrip().startswith("#")
            ]
        docs = screen_banned_words(
            docs, terms, text_col=args.text_col, max_hits=args.badwords_max
        ).drop("word_keep")  # the rule engine owns the verdict
        rules["banned_hits"] = (0, args.badwords_max)
    if args.compression_min is not None or args.compression_max is not None:
        # zlib gibberish/template screen: attach the metric BEFORE
        # curate so the rule engine sees it like any other column
        from engine.ops.curate import with_compression_ratio

        docs = with_compression_ratio(docs, text_col=args.text_col)
        rules["compression_ratio"] = (
            args.compression_min if args.compression_min is not None else 0.0,
            args.compression_max if args.compression_max is not None else 10.0,
        )
    verdicts = curate(
        docs,
        text_col=args.text_col,
        rules=rules,
        check_lang=not args.no_check_lang,
    )

    if args.tag_code or args.drop_code:
        # code/markup/data tag BEFORE prose screens: quality rules and
        # the LM are calibrated on prose and misjudge code, so a code
        # doc is either routed out (reason "code") or at least carries
        # the tag for downstream mix stratification (map-only pass)
        from engine.ops.codedetect import DEFAULT_THRESHOLD, detect_code

        verdicts = detect_code(
            verdicts,
            text_col=args.text_col,
            threshold=(
                DEFAULT_THRESHOLD
                if args.code_threshold is None
                else args.code_threshold
            ),
        )
        if args.drop_code:
            verdicts = verdicts.withColumn(
                "reasons",
                F.when(
                    F.col("is_code"),
                    F.array_union("reasons", F.array(F.lit("code"))),
                ).otherwise(F.col("reasons")),
            ).withColumn("keep", F.col("keep") & ~F.col("is_code"))

    if args.url_filter:
        # URL screen FIRST (RefinedWeb order: a URL verdict costs
        # bytes of the url column; content screens cost the document)
        # — and the LM below then trains only on url-clean docs.
        from engine.ops.urlfilter import filter_urls

        bl = None
        if args.url_blocklist:
            if args.url_blocklist.endswith(".txt"):
                # UT1-style lists carry blank lines and comments; a
                # blank line must not become domain '' (it would match
                # every host-less url — review r3)
                bl = (
                    spark.read.text(args.url_blocklist)
                    .select(F.trim("value").alias("domain"))
                    .filter(
                        (F.col("domain") != "")
                        & ~F.col("domain").startswith("#")
                    )
                )
            else:
                bl = spark.read.parquet(args.url_blocklist)
        verdicts = filter_urls(
            verdicts,
            bl,
            url_col=args.url_col,
            threshold=args.url_threshold,
        )
        verdicts = (
            verdicts.withColumn(
                "reasons",
                F.when(
                    F.col("blocked_domain"),
                    F.array_union("reasons", F.array(F.lit("url_domain"))),
                ).otherwise(F.col("reasons")),
            )
            .withColumn(
                "reasons",
                F.when(
                    ~F.col("blocked_domain") & ~F.col("url_keep"),
                    F.array_union("reasons", F.array(F.lit("url_score"))),
                ).otherwise(F.col("reasons")),
            )
            .withColumn("keep", F.col("keep") & F.col("url_keep"))
            .drop("url_keep")  # blocked_domain + url_score stay (audit)
        )

    lm_cut = None
    pinned = []  # persist handles to release after the writes
    if args.lm_filter:
        from engine.ops.lm import score_stupid_backoff, train_stupid_backoff

        # rule verdicts feed LM training, scoring, AND the final
        # writes: persist once so the (possibly langid-UDF-bearing)
        # plan is not recomputed per pass
        verdicts = verdicts.persist()
        pinned.append(verdicts)
        trusted = verdicts.filter("keep").select(args.text_col)
        lm = train_stupid_backoff(
            trusted, text_col=args.text_col, min_count=args.lm_min_count
        )
        scored = score_stupid_backoff(
            verdicts.select(args.id_col, args.text_col),
            lm,
            text_col=args.text_col,
            id_col=args.id_col,
        ).select(args.id_col, "logppl")
        # one id-keyed join attaches logppl to the verdict rows; the
        # cut and the final keep column both read from this frame
        verdicts = verdicts.join(scored, args.id_col, "left").persist()
        pinned.append(verdicts)
        # exact percentile of the kept slice's logppl = the cut. One
        # double column over doc rows; at true 100-TB cardinality use
        # percentile_approx here (same plumbing, disclosed accuracy).
        lm_cut = (
            verdicts.filter("keep")
            .agg(F.expr(f"percentile(logppl, {args.lm_pct / 100.0})"))
            .collect()[0][0]
        )
        if lm_cut is not None:  # no rule-kept scored docs -> no screen
            lm_keep = F.col("logppl").isNotNull() & (
                F.col("logppl") <= float(lm_cut)
            )
            verdicts = verdicts.withColumn(
                "reasons",
                F.when(lm_keep, F.col("reasons")).otherwise(
                    F.array_union("reasons", F.array(F.lit("lm_ppl")))
                ),
            ).withColumn("keep", F.col("keep") & lm_keep)

    clf_stats = {}
    if args.classifier_ref:
        from engine.ops.classify import quality_classifier, score_logreg

        # CCNet §4.4 proper: the reference is an EXTERNAL trusted set
        # (a wiki dump, a hand-kept sample) — the model learns what
        # "looks like the reference" from the raw metric columns, so
        # its score is independent signal on top of the rule verdicts.
        ref = spark.read.parquet(args.classifier_ref)
        # CCNet trains on a SAMPLE: full-batch GD makes max_iter passes
        # over its training frame, so the negative class is a
        # deterministic hash-sample of the corpus sized at
        # --classifier-neg-ratio x the reference (the model needs
        # reference-vs-corpus contrast, not the whole corpus), keeping
        # the 100-iteration loop over a bounded frame instead of 100
        # corpus scans (review r3)
        from engine.ops.sample import hash_sample

        # negatives come from the URL-CLEAN slice when the url screen
        # ran (the docstring's contract; spam-url docs would otherwise
        # leak into the negative class — review r3). url_keep is
        # already folded into `keep`, so re-derive it from the audit
        # columns the screen left behind.
        neg_pool = docs
        if args.url_filter:
            neg_pool = verdicts.filter(
                ~F.col("blocked_domain")
                & (F.col("url_score") < float(args.url_threshold))
            )
        n_ref = ref.count()
        n_docs_total = neg_pool.count()
        neg_frac = min(
            1.0, args.classifier_neg_ratio * n_ref / max(1, n_docs_total)
        )
        neg = hash_sample(
            neg_pool, neg_frac, id_col=args.id_col, salt="clf_neg"
        )
        if args.classifier_hashed:
            # fastText-style hashed-ngram model (token IDENTITY, the
            # DCLM/LLaMA filter shape) instead of metric features
            from engine.ops.classify import fasttext_quality, score_hashed

            model = fasttext_quality(
                neg.select(args.text_col),
                ref.select(args.text_col),
                text_col=args.text_col,
                stats=clf_stats,
            )
            verdicts = score_hashed(verdicts, model, text_col=args.text_col)
        else:
            model = quality_classifier(
                neg.select(args.id_col, args.text_col),
                ref.select(args.id_col, args.text_col),
                id_col=args.id_col,
                text_col=args.text_col,
                stats=clf_stats,
            )
            # verdict rows already carry the metric feature columns, so
            # scoring is a free codegen projection — no recompute, no join
            verdicts = score_logreg(verdicts, model)
        if args.classifier_min_score is not None:
            clf_ok = F.col("quality_score") >= float(args.classifier_min_score)
            verdicts = verdicts.withColumn(
                "reasons",
                F.when(clf_ok, F.col("reasons")).otherwise(
                    F.array_union("reasons", F.array(F.lit("clf_score")))
                ),
            ).withColumn("keep", F.col("keep") & clf_ok)

    # the kept and rejected writes are two actions over one plan whose
    # most expensive stage is the langid Arrow UDF: persist so the
    # verdicts compute ONCE, and derive every count from the written
    # tables (no extra pass over the input)
    verdicts = verdicts.persist()
    write_table(verdicts.filter("keep").drop("reasons", "keep"),
                os.path.join(args.output, "kept"))
    write_table(verdicts.filter(~F.col("keep")),
                os.path.join(args.output, "rejected"))
    verdicts.unpersist()
    for df in pinned:
        df.unpersist()

    kept = spark.read.parquet(os.path.join(args.output, "kept"))
    rej = spark.read.parquet(os.path.join(args.output, "rejected"))
    reason_counts = {
        r["reason"]: r["n"]
        for r in rej.select(F.explode("reasons").alias("reason"))
        .groupBy("reason")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_rej = rej.count()
    n_docs = kept.count() + n_rej
    wall = time.monotonic() - t0
    result = {
        "wall_s": round(wall, 2),
        "docs": n_docs,
        "kept": n_docs - n_rej,
        "rejected": n_rej,
        "reject_rate": round(n_rej / n_docs, 4) if n_docs else 0.0,
        "reasons": dict(sorted(reason_counts.items())),
    }
    if args.lm_filter:
        result["lm_cut_logppl"] = (
            round(lm_cut, 4) if lm_cut is not None else None
        )
    if args.classifier_ref:
        result["classifier"] = {
            "iters": clf_stats.get("iters"),
            "loss": round(clf_stats["loss"], 6) if "loss" in clf_stats else None,
        }
    print(json.dumps(result))
    return result


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="documents table")
    p.add_argument(
        "--input-format",
        choices=["parquet", "jsonl"],
        default="parquet",
        help="jsonl reads gzip/plain JSONL (the C4/Dolma interchange "
        "layout and what engine/io/export.py writes)",
    )
    p.add_argument(
        "--input-schema",
        default=None,
        help="DDL for --input-format jsonl (omit to infer: an extra "
        "full pass — fine for inspection, not at scale)",
    )
    p.add_argument("--output", required=True)
    p.add_argument("--text-col", default="text")
    p.add_argument("--min-tokens", type=int, default=None)
    p.add_argument("--no-check-lang", action="store_true")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument(
        "--lm-filter",
        action="store_true",
        help="CCNet-style perplexity screen under a corpus-trained "
        "Stupid-Backoff trigram LM (engine/ops/lm.py)",
    )
    p.add_argument(
        "--lm-pct",
        type=float,
        default=90.0,
        help="reject docs above this percentile of the rule-kept "
        "slice's log-perplexity",
    )
    p.add_argument("--lm-min-count", type=int, default=2)
    p.add_argument(
        "--classifier-ref",
        default=None,
        help="parquet of TRUSTED reference docs: train the CCNet-style "
        "quality classifier (engine/ops/classify.py) reference-vs-"
        "corpus and attach quality_score to every verdict row",
    )
    p.add_argument(
        "--classifier-min-score",
        type=float,
        default=None,
        help="with --classifier-ref: additionally reject docs scoring "
        "below this (reason clf_score); omit to attach the score "
        "without screening",
    )
    p.add_argument(
        "--classifier-hashed",
        action="store_true",
        help="with --classifier-ref: train the fastText-style hashed "
        "bag-of-ngrams model (token identity; the DCLM/LLaMA quality-"
        "filter shape) instead of the metric-feature CCNet model",
    )
    p.add_argument(
        "--classifier-neg-ratio",
        type=float,
        default=4.0,
        help="negative (corpus) training sample size as a multiple of "
        "the reference count — training runs over this bounded "
        "sample, never the full corpus",
    )
    p.add_argument(
        "--top-bigram-max",
        type=float,
        default=None,
        help="Gopher repetition rule: reject docs whose most common "
        "2-gram covers more than this character fraction (Gopher "
        "used 0.20)",
    )
    p.add_argument(
        "--gopher-repetition",
        action="store_true",
        help="attach the full Gopher within-doc repetition panel "
        "(top-2/3/4-gram and dup-5..10-gram character fractions) and "
        "screen at the paper's published cuts (Rae et al. 2021 "
        "Table A1)",
    )
    p.add_argument(
        "--badwords",
        default=None,
        help="banned-term list file (one word/phrase per line, # "
        "comments) — C4-style content screen, reason banned_hits",
    )
    p.add_argument(
        "--badwords-max",
        type=int,
        default=0,
        help="docs stay kept while banned_hits <= this (C4 used 0)",
    )
    p.add_argument(
        "--compression-min",
        type=float,
        default=None,
        help="reject docs whose zlib compression ratio is below this "
        "(templated/repeated text compresses too well; reason "
        "compression_ratio)",
    )
    p.add_argument(
        "--compression-max",
        type=float,
        default=None,
        help="reject docs whose zlib compression ratio is above this "
        "(random/encoded junk barely compresses)",
    )
    p.add_argument(
        "--tag-code",
        action="store_true",
        help="attach code_score/is_code (engine/ops/codedetect) to "
        "every verdict row without screening — downstream mix "
        "stratification routes on the tag",
    )
    p.add_argument(
        "--drop-code",
        action="store_true",
        help="reject docs detected as source code / markup / data "
        "(reason 'code'): the prose quality rules and LM misjudge "
        "code, so route it to a separate pipeline instead",
    )
    p.add_argument(
        "--code-threshold",
        type=float,
        default=None,
        help="code_score cut for is_code (default engine/ops/"
        "codedetect.DEFAULT_THRESHOLD)",
    )
    p.add_argument(
        "--url-filter",
        action="store_true",
        help="RefinedWeb-style URL screen (engine/ops/urlfilter): "
        "keyword score + optional domain blocklist, applied before "
        "the content rules (reasons url_domain / url_score)",
    )
    p.add_argument(
        "--url-blocklist",
        default=None,
        help="blocked-domain list: parquet with a 'domain' column, or "
        "a .txt file one domain per line (UT1 layout); subdomains of "
        "a listed domain are blocked too",
    )
    p.add_argument("--url-threshold", type=float, default=1.0)
    p.add_argument("--url-col", default="url")
    p.add_argument("--master", default="local[*]")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    return p


def main() -> None:
    run(_parser().parse_args())


if __name__ == "__main__":
    main()
