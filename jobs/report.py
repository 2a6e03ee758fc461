"""Corpus-card report — the datasheet a published training corpus
ships (cf. "Datasheets for Datasets", Gebru et al. 2021; the stats
tables in the C4 / RefinedWeb / Dolma papers).

    spark-submit --py-files engine.zip jobs/report.py \
        --input /data/corpus --output /data/corpus_card.json \
        [--text-col text] [--id-col doc_id] [--host-col host]

Produces ONE JSON document with:

    totals        docs, tokens, chars (exact counts)
    length        token-count percentiles (p1..p99)
    quality       corpus-wide means of the curation metric family
                  (engine/ops/curate.quality_metrics — same pinned
                  definitions the rule screen uses)
    lang_mix      per-lang doc/token share (when a lang column exists)
    hosts         top-k hosts by token share + concentration (share
                  of tokens in the top 1% of hosts) — the number the
                  domain-rebalance stage (engine/ops/mix) acts on
    dup_rate      exact-duplicate rate (sha256 of text)

Scale shapes: every number is one aggregation pass —
percentile_approx for the histograms (exact percentile would sort),
map-side-combinable groupBys for lang/host, and ONE sha groupBy for
the dup rate. Nothing driver-sized except the report itself.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from engine.session import get_spark  # noqa: E402

PCTS = [0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99]
# exactly the engine/ops/curate.quality_metrics column family (minus
# the count columns reported under totals); a name not produced there
# would silently vanish from the card, so tests/test_report.py pins
# that every entry lands in the quality section
MEAN_METRICS = (
    "mean_token_len",
    "space_ratio",
    "symbol_ratio",
    "stopword_ratio",
    "dup_line_frac",
    "dup_para_frac",
    "n_pii",
)


def run(args) -> dict:
    from engine.cli import fill_defaults

    fill_defaults(args, _parser())
    spark = get_spark(
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
        app_name="corpus-report",
    )
    t0 = time.monotonic()

    report = build_card(spark, args, args.input)
    if args.compare:
        cmp_fmt = getattr(args, "compare_format", None) or getattr(
            args, "input_format", "parquet"
        )
        if cmp_fmt == "card":
            # a prior card JSON (this job's own --output, or the
            # corpus job's corpus_card.json) — no Spark re-read of
            # the baseline corpus at all
            with open(args.compare) as f:
                loaded = json.load(f)
            baseline = loaded.get("card", loaded)
        else:
            # the baseline corpus keeps ITS OWN format/schema
            # (ADVICE r3: comparing a jsonl crawl against a prior
            # parquet corpus must not misparse the baseline); when no
            # compare format/schema is given at all, the baseline
            # inherits the input's (the old same-layout behavior)
            cmp_schema = getattr(args, "compare_schema", None)
            if getattr(args, "compare_format", None) is None:
                cmp_schema = cmp_schema or getattr(args, "input_schema", None)
            baseline = build_card(
                spark, args, args.compare, fmt=cmp_fmt, schema=cmp_schema
            )
        report["compare"] = {
            "baseline": args.compare,
            "baseline_card": baseline,
            "delta": card_delta(report, baseline),
        }

    report["wall_s"] = round(time.monotonic() - t0, 2)
    if args.output:
        with open(args.output, "w") as f:
            json.dump(report, f, indent=2, sort_keys=True)
    print(json.dumps(report, sort_keys=True))
    return report


def build_card(
    spark, args, input_path: str, fmt: str | None = None,
    schema: str | None = None,
) -> dict:
    from engine.ops.curate import _metric_cols, quality_metrics

    from engine.io.export import read_docs

    # getattr: programmatic callers (the corpus job's --report stage
    # builds a minimal namespace) default to parquet; fmt/schema
    # override lets --compare read a baseline in a DIFFERENT layout
    docs = read_docs(
        spark,
        input_path,
        fmt=fmt or getattr(args, "input_format", "parquet") or "parquet",
        schema=schema
        if fmt is not None
        else getattr(args, "input_schema", None),
    )
    text = F.coalesce(F.col(args.text_col), F.lit(""))
    # the ONE token-count definition (pinned in curate): lang_mix and
    # host shares must reconcile with totals.tokens, so they reuse it
    # rather than re-tokenizing with a different rule
    n_tokens = _metric_cols(args.text_col)["n_tokens"]

    metrics = quality_metrics(
        docs, id_col=args.id_col, text_col=args.text_col
    )
    have = [m for m in MEAN_METRICS if m in metrics.columns]
    agg_row = metrics.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        F.sum("n_chars").alias("chars"),
        F.percentile_approx(
            "n_tokens", PCTS, 10_000
        ).alias("tok_pcts"),
        *[F.avg(m).alias(f"avg_{m}") for m in have],
    ).collect()[0]

    report: dict = {
        "totals": {
            "docs": int(agg_row["docs"]),
            "tokens": int(agg_row["tokens"] or 0),
            "chars": int(agg_row["chars"] or 0),
        },
        "length": {
            f"p{int(p * 100)}": int(v)
            for p, v in zip(PCTS, agg_row["tok_pcts"] or [])
        },
        "quality": {
            m: round(float(agg_row[f"avg_{m}"]), 6)
            for m in have
            if agg_row[f"avg_{m}"] is not None
        },
    }

    # exact-duplicate rate: docs sharing a text sha beyond the first
    n_docs = report["totals"]["docs"]
    if n_docs:
        uniq = (
            docs.select(F.sha2(text, 256).alias("h"))
            .groupBy("h")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(
                F.count(F.lit(1)).alias("uniq"),
                F.sum("c").alias("total"),
            )
            .collect()[0]
        )
        report["dup_rate"] = round(
            (int(uniq["total"]) - int(uniq["uniq"])) / int(uniq["total"]), 6
        )

    lang_col = args.lang_col if args.lang_col in docs.columns else None
    if lang_col:
        mix = (
            docs.select(
                F.coalesce(F.col(lang_col), F.lit("unknown")).alias("lang"),
                n_tokens.alias("nt"),
            )
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("docs"), F.sum("nt").alias("tokens"))
            .orderBy(F.desc("docs"))
            .collect()
        )
        total_docs = sum(r["docs"] for r in mix) or 1
        report["lang_mix"] = {
            r["lang"]: {
                "docs": r["docs"],
                "doc_share": round(r["docs"] / total_docs, 6),
                "tokens": int(r["tokens"] or 0),
            }
            for r in mix
        }

    host = (
        F.col(args.host_col)
        if args.host_col in docs.columns
        else F.try_parse_url(F.lower(F.col("url")), F.lit("HOST"))
        if "url" in docs.columns
        else None
    )
    if host is not None:
        hosts = (
            docs.select(
                F.coalesce(host, F.lit("unknown")).alias("host"),
                n_tokens.alias("nt"),
            )
            .groupBy("host")
            .agg(F.count(F.lit(1)).alias("docs"), F.sum("nt").alias("tokens"))
            # three bounded reads below; compute the host rollup once
            # (host-cardinality-sized, auto-released on GC)
            .localCheckpoint(eager=True)
        )
        tot = hosts.agg(
            F.count(F.lit(1)).alias("n_hosts"), F.sum("tokens").alias("tokens")
        ).collect()[0]
        n_hosts, tok_total = int(tot["n_hosts"]), int(tot["tokens"] or 0) or 1
        # concentration: token share of the top 1% of hosts (>= 1 host)
        k = max(1, n_hosts // 100)
        # top list: host tie-break so equal-token hosts never swap
        # across runs (the card is reproducible). The top-1% SUM needs
        # no tie-break — boundary-straddling ties contribute equal
        # token values — and stays cluster-side (1% of hosts can be
        # 10^5 rows at crawl scale; never collect it).
        top = (
            hosts.orderBy(F.desc("tokens"), F.asc("host"))
            .limit(args.top_hosts)
            .collect()
        )
        top1pct = (
            hosts.orderBy(F.desc("tokens"))
            .limit(k)
            .agg(F.sum("tokens"))
            .collect()[0][0]
            or 0
        )
        report["hosts"] = {
            "n_hosts": n_hosts,
            "top1pct_token_share": round(int(top1pct) / tok_total, 6),
            "top": [
                {
                    "host": r["host"],
                    "docs": r["docs"],
                    "token_share": round(int(r["tokens"] or 0) / tok_total, 6),
                }
                for r in top
            ],
        }

    if args.top_ngrams:
        top_g = top_ngrams_df(
            docs,
            text_col=args.text_col,
            n=args.ngram_n,
            k=args.top_ngrams,
            min_count=getattr(args, "ngram_min_count", 0) or 0,
        ).collect()
        report["top_ngrams"] = {
            "n": args.ngram_n,
            "top": [{"gram": r["g"], "count": int(r["c"])} for r in top_g],
        }

    return report


def _grams_df(docs, text_col: str, n: int):
    from engine.ops.lm import lm_tokens

    # token array MATERIALIZED before the positional lambda reads
    # it via slice — handing the raw split expression in would
    # re-tokenize the doc once per position (the O(tokens^2)
    # blowup engine/ops/dsir.py:hashed_feature_col documents)
    toks = F.col("_toks")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, F.lit(n))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        F.filter(
            lm_tokens(F.col(text_col)), lambda t: t != F.lit("")
        ).alias("_toks")
    ).select(F.explode(grams).alias("g"))


def top_ngrams_df(
    docs,
    text_col: str = "text",
    n: int = 10,
    k: int = 20,
    min_count: int = 0,
    broadcast_bytes: int | None = 512 * 1024 * 1024,
):
    """WIMBD-style (Elazar et al. 2024 "What's In My Big Data") most-
    duplicated n-grams: (g, c) ordered count desc, gram asc, limit k.
    Tokens from the SAME pinned tokenizer as the LM/BM25 family; gram
    text kept readable (not hashed) — a human-audit surface.

    min_count=0: ONE explode -> count agg (map-side combinable: the
    shuffle carries one partial row per distinct gram per task, not
    one row per occurrence) -> top-k. The exchange is still distinct-
    GRAM-cardinality sized — n-gram-text wide — which at corpus scale
    is the dominant cost.

    min_count>0 (VERDICT r3 next #8, the scale path): TWO passes —
    (1) count 64-bit gram HASHES (the same shuffle cardinality but
    rows of two longs, ~20x narrower than 10-gram text) and keep
    hashes with count >= min_count; (2) re-explode, semi-join grams
    against the surviving hashes (budget-gated broadcast — the
    engine/partitioning.fits_broadcast_budget discipline; above
    budget AQE decides), exact count on survivors only. The wide
    text exchange is then SURVIVOR-sized. Exact counts always; the
    top-k equals the single-pass list whenever min_count <= the
    k-th most-frequent gram's count (the operator's contract — a
    too-high min_count truncates the list, it never reorders it)."""
    grams = _grams_df(docs, text_col, n)
    if min_count > 0:
        hot = (
            grams.select(F.xxhash64("g").alias("h"))
            .groupBy("h")
            .agg(F.count(F.lit(1)).alias("hc"))
            .filter(F.col("hc") >= min_count)
            .select("h")
        )
        from engine.partitioning import fits_broadcast_budget

        # materialize the narrow pre-count ONCE (ADVICE r4): the
        # budget estimate below is a Spark action, and without this
        # the semi-join would recompute the whole hash-count shuffle
        hot = hot.localCheckpoint(eager=True)
        if fits_broadcast_budget(hot, F.lit(16), broadcast_bytes):
            hot = F.broadcast(hot)
        # hash collisions only ADD survivors (count(h) >= count(g)),
        # so the exact pass below never loses a qualifying gram
        grams = grams.withColumn("h", F.xxhash64("g")).join(
            hot, "h", "left_semi"
        )
    return (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("g"))  # deterministic ties
        .limit(k)
    )


def card_delta(new: dict, old: dict) -> dict:
    """Driver-side diff of two corpus cards (new - old): the crawl-
    over-crawl QA surface — a quality mean drifting, a lang share
    collapsing, or host concentration spiking between two corpus
    versions shows up as one signed number each. Pure JSON-to-JSON
    (no Spark), so it is exactly as reproducible as the cards."""

    def num_diff(a: dict, b: dict, nd: int = 6) -> dict:
        return {
            k: round(float(a.get(k, 0) or 0) - float(b.get(k, 0) or 0), nd)
            for k in sorted(set(a) | set(b))
        }

    out: dict = {
        "totals": num_diff(new.get("totals", {}), old.get("totals", {})),
        "quality": num_diff(new.get("quality", {}), old.get("quality", {})),
    }
    if "dup_rate" in new or "dup_rate" in old:
        out["dup_rate"] = round(
            float(new.get("dup_rate", 0.0)) - float(old.get("dup_rate", 0.0)), 6
        )
    nl, ol = new.get("lang_mix", {}), old.get("lang_mix", {})
    if nl or ol:
        out["lang_doc_share"] = {
            lang: round(
                float(nl.get(lang, {}).get("doc_share", 0.0))
                - float(ol.get(lang, {}).get("doc_share", 0.0)),
                6,
            )
            for lang in sorted(set(nl) | set(ol))
        }
        out["langs_added"] = sorted(set(nl) - set(ol))
        out["langs_removed"] = sorted(set(ol) - set(nl))
    if "hosts" in new and "hosts" in old:
        out["top1pct_token_share"] = round(
            new["hosts"]["top1pct_token_share"]
            - old["hosts"]["top1pct_token_share"],
            6,
        )
        out["n_hosts"] = new["hosts"]["n_hosts"] - old["hosts"]["n_hosts"]
    return out


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="corpus table")
    p.add_argument(
        "--input-format",
        choices=["parquet", "jsonl"],
        default="parquet",
        help="jsonl reads gzip/plain JSONL (public-corpus layout)",
    )
    p.add_argument("--input-schema", default=None)
    p.add_argument("--output", default=None, help="write the card JSON here")
    p.add_argument(
        "--compare",
        default=None,
        help="baseline corpus (e.g. the previous crawl's version): "
        "the card gains a compare section with the baseline card and "
        "signed new-minus-old deltas for totals, quality means, dup "
        "rate, lang shares, and host concentration",
    )
    p.add_argument(
        "--compare-format",
        choices=["parquet", "jsonl", "card"],
        default=None,
        help="baseline's own format (defaults to --input-format); "
        "'card' reads --compare as a prior card JSON (this job's "
        "--output or the corpus job's corpus_card.json) with no "
        "Spark re-read of the baseline corpus",
    )
    p.add_argument(
        "--compare-schema",
        default=None,
        help="baseline's schema when --compare-format differs",
    )
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--lang-col", default="lang")
    p.add_argument("--host-col", default="host")
    p.add_argument("--top-hosts", type=int, default=20)
    p.add_argument(
        "--top-ngrams",
        type=int,
        default=0,
        help="list the K most-duplicated n-grams on the card (WIMBD-"
        "style boilerplate audit; 0 = off)",
    )
    p.add_argument("--ngram-n", type=int, default=10)
    p.add_argument(
        "--ngram-min-count",
        type=int,
        default=0,
        help="two-pass scale path for --top-ngrams: pre-count gram "
        "HASHES (longs, not 10-gram text) and exact-count only grams "
        "whose hash count >= this, so the wide text shuffle is "
        "survivor-sized; keep it <= the expected k-th count (exact "
        "counts either way; too high truncates the list)",
    )
    p.add_argument("--master", default="local[*]")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    return p


if __name__ == "__main__":
    run(_parser().parse_args())
