"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship extraction pipeline on sf0.001-scale corpus
queries()     -> every implemented operator from SURVEY.md §2
oracle_sql()  -> DuckDB-equivalent SQL for the relational queries
                 (kernel-based extraction ops are rows-only by design)
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402


def _configure(spark: SparkSession) -> None:
    """Pin the confs the engine depends on (driver owns the session)."""
    for k, v in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        ("spark.sql.execution.arrow.maxRecordsPerBatch", "512"),
        ("spark.sql.adaptive.enabled", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable in this session: accept driver's setting


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction pipeline (dedup -> salted repartition
    -> fused route+extract -> chunk) over the deterministic sf0.001
    corpus; returns per-(lang, path) doc/chunk rollup."""
    _configure(spark)
    from engine.corpus import gen_pages_df
    from engine.pipeline import build_chunks, build_extracted

    pages = gen_pages_df(spark, 400)
    extracted = build_extracted(pages)
    chunks = build_chunks(extracted)
    per_doc = extracted.select("url", "lang", "path", "n_chars")
    per_chunk = chunks.groupBy("url").agg(F.count(F.lit(1)).alias("n_chunks"))
    return (
        per_doc.join(per_chunk, "url", "left")
        .groupBy("lang", "path")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce("n_chunks", F.lit(0))).alias("n_chunks"),
            F.sum(F.coalesce("n_chars", F.lit(0))).alias("n_chars"),
        )
        .orderBy("lang", "path")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from engine.queries_extract import ALL

    def wrap(fn):
        def g(spark: SparkSession, sf_dir: str) -> DataFrame:
            _configure(spark)
            return fn(spark, sf_dir)

        return g

    return {name: wrap(fn) for name, (fn, _oracle) in sorted(ALL.items())}


def oracle_sql() -> dict[str, str]:
    from engine.queries_extract import ALL

    return {
        name: oracle
        for name, (_fn, oracle) in sorted(ALL.items())
        if oracle is not None
    }
