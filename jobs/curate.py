"""Corpus-curation job — quality-filter a documents table.

    spark-submit --py-files engine.zip jobs/curate.py \
        --input /data/documents --output /data/curated \
        [--min-tokens 20] [--no-check-lang]

Map-only (engine/ops/curate.py): metrics + verdicts attach with zero
shuffles; the partitioned write is the only exchange-free sink pass.
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
    spark = get_spark(
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
        app_name="webtext-curate",
    )
    t0 = time.monotonic()
    docs = spark.read.parquet(args.input)

    rules = dict(DEFAULT_RULES)
    if args.min_tokens is not None:
        rules["n_tokens"] = (args.min_tokens, rules["n_tokens"][1])
    verdicts = curate(
        docs,
        text_col=args.text_col,
        rules=rules,
        check_lang=not args.no_check_lang,
    )

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
    print(json.dumps(result))
    return result


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="documents parquet")
    p.add_argument("--output", required=True)
    p.add_argument("--text-col", default="text")
    p.add_argument("--min-tokens", type=int, default=None)
    p.add_argument("--no-check-lang", action="store_true")
    p.add_argument("--master", default="local[*]")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    run(p.parse_args())


if __name__ == "__main__":
    main()
