"""Compaction job (jobs/compact.py): fragmented partitions are
rewritten to ~target-size files, content byte-identical, untouched
partitions left alone, and the rewrite is idempotent (re-run = no-op).
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from jobs.compact import compact, plan_compaction


@pytest.fixture(scope="module")
def spark():
    from engine.session import get_spark

    s = get_spark("local[4]", shuffle_partitions=4, app_name="test-compact")
    yield s


def _files(table, day, pb):
    return sorted(
        glob.glob(os.path.join(table, f"day={day}", f"pbucket={pb}", "*.parquet"))
    )


def _checksum(spark, table):
    df = spark.read.parquet(table)
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.crc32(F.col("url"))).alias("u"),
        F.sum(F.crc32(F.col("text"))).alias("t"),
    ).collect()[0]
    return (row["n"], row["u"], row["t"])


def _build_fragmented(spark, path, n=400):
    df = spark.range(n).select(
        F.concat(F.lit("https://h"), (F.col("id") % 7), F.lit(".ex/p"), "id").alias(
            "url"
        ),
        F.concat(F.lit("text payload "), "id").alias("text"),
        F.lit("2026-01-0").alias("_d"),
        (F.col("id") % 2 + 1).cast("string").alias("_i"),
        (F.col("id") % 3).cast("int").alias("pbucket"),
    )
    df = df.select(
        "url", "text", F.concat("_d", "_i").alias("day"), "pbucket"
    )
    # 8 writer tasks per partition -> every (day, pbucket) fragments
    # into up to 8 small files
    df.repartition(8).write.partitionBy("day", "pbucket").mode(
        "overwrite"
    ).parquet(path)


def test_compact_merges_files_byte_identically(spark, tmp_path):
    table = str(tmp_path / "extracted")
    _build_fragmented(spark, table)

    before = _checksum(spark, table)
    n_before = len(_files(table, "2026-01-01", 0))
    assert n_before > 1, "fixture must be fragmented"

    plan = plan_compaction(table, target_bytes=128 << 20)
    assert all(p["n_slots"] == 1 for p in plan)  # tiny data -> 1 file each
    assert len(plan) == 6  # 2 days x 3 buckets

    res = compact(spark, table, target_bytes=128 << 20)
    assert res["partitions"] == 6

    assert len(_files(table, "2026-01-01", 0)) == 1
    assert _checksum(spark, table) == before

    # idempotent: second run finds nothing to do
    res2 = compact(spark, table, target_bytes=128 << 20)
    assert res2["partitions"] == 0


def test_compact_leaves_healthy_partitions_untouched(spark, tmp_path):
    table = str(tmp_path / "t2")
    _build_fragmented(spark, table)
    # first compact everything, then fragment ONE partition again by
    # appending more rows as extra files
    compact(spark, table, target_bytes=128 << 20)
    healthy = _files(table, "2026-01-02", 1)
    mtimes = {f: os.path.getmtime(f) for f in healthy}

    extra = spark.range(50).select(
        F.concat(F.lit("https://h9.ex/x"), "id").alias("url"),
        F.lit("extra").alias("text"),
        F.lit("2026-01-01").alias("day"),
        F.lit(0).cast("int").alias("pbucket"),
    )
    extra.repartition(4).write.partitionBy("day", "pbucket").mode(
        "append"
    ).parquet(table)

    before = _checksum(spark, table)
    res = compact(spark, table, target_bytes=128 << 20)
    assert res["partitions"] == 1  # only day=2026-01-01/pbucket=0
    assert _checksum(spark, table) == before
    assert len(_files(table, "2026-01-01", 0)) == 1
    # the healthy partition's files were not rewritten
    assert {f: os.path.getmtime(f) for f in _files(table, "2026-01-02", 1)} == mtimes


def test_compact_key_col_for_urlless_tables(spark, tmp_path):
    """--key-col: tables without a url column (e.g. vectors keyed by
    vec_id) compact by any row-key column (ADVICE r2)."""
    table = str(tmp_path / "vectors")
    df = spark.range(300).select(
        F.col("id").alias("vec_id"),
        F.lit("2026-01-01").alias("day"),
        (F.col("id") % 2).cast("int").alias("pbucket"),
    )
    df.repartition(8).write.partitionBy("day", "pbucket").mode(
        "overwrite"
    ).parquet(table)
    assert len(_files(table, "2026-01-01", 0)) > 1

    with pytest.raises(ValueError, match="key-col"):
        compact(spark, table, target_bytes=128 << 20)  # default url: absent

    before = spark.read.parquet(table).agg(
        F.count(F.lit(1)), F.sum("vec_id")
    ).collect()
    res = compact(spark, table, target_bytes=128 << 20, key_col="vec_id")
    assert res["partitions"] == 2
    assert len(_files(table, "2026-01-01", 0)) == 1
    after = spark.read.parquet(table).agg(
        F.count(F.lit(1)), F.sum("vec_id")
    ).collect()
    assert after == before


def test_compact_single_level_partition_layout(spark, tmp_path):
    """chunks/vectors are partitioned by pbucket only — the plan must
    discover the layout from the directories rather than assume
    (day, pbucket)."""
    table = str(tmp_path / "chunks")
    df = spark.range(400).select(
        F.concat(F.lit("http://h"), F.col("id")).alias("url"),
        (F.col("id") % 3).cast("int").alias("pbucket"),
    )
    df.repartition(6).write.partitionBy("pbucket").mode("overwrite").parquet(
        table
    )
    import os

    def files(pb):
        d = os.path.join(table, f"pbucket={pb}")
        return [f for f in os.listdir(d) if f.endswith(".parquet")]

    assert len(files(0)) > 1
    before = spark.read.parquet(table).agg(
        F.count(F.lit(1)), F.sum(F.length("url"))
    ).collect()
    res = compact(spark, table, target_bytes=128 << 20)
    assert res["partitions"] == 3
    assert len(files(0)) == 1
    after = spark.read.parquet(table).agg(
        F.count(F.lit(1)), F.sum(F.length("url"))
    ).collect()
    assert after == before


def test_compact_unpartitioned_table_is_disclosed_noop(spark, tmp_path):
    """A flat (unpartitioned) parquet table must not crash the planner
    (round-3 review finding): in-place compaction would be one
    non-atomic whole-table overwrite, so it is a disclosed no-op."""
    from jobs.compact import compact

    path = str(tmp_path / "flat")
    spark.range(0, 1000).selectExpr("id", "id % 7 AS v").repartition(
        8
    ).write.mode("overwrite").parquet(path)
    before = sorted(p.name for p in (tmp_path / "flat").glob("part-*"))
    res = compact(spark, path, target_bytes=1 << 30)
    assert res["partitions"] == 0 and "skipped" in res
    after = sorted(p.name for p in (tmp_path / "flat").glob("part-*"))
    assert after == before  # untouched
