"""T3 (SURVEY.md §5): checkpoint/resume — a resumed run completes the
remaining work and the final table equals the single-shot run
(BASELINE.json:14 "resumable from checkpoint")."""

from __future__ import annotations

from pyspark.sql import functions as F

from engine import checkpoint
from engine.corpus import gen_pages_df
from engine.io.tables import write_table
from engine.pipeline import build_extracted, with_partition_key

N = 300


def test_filter_not_done_anti_join(spark, tmp_path):
    out = str(tmp_path)
    pages = with_partition_key(gen_pages_df(spark, N)).cache()
    keys = [r["part_key"] for r in pages.select("part_key").distinct().collect()]
    assert len(keys) > 4
    done, todo = keys[: len(keys) // 2], keys[len(keys) // 2 :]
    checkpoint.mark_done(out, "r1", done)
    remaining = checkpoint.filter_not_done(pages, out, "r1")
    got_keys = {r["part_key"] for r in remaining.select("part_key").distinct().collect()}
    assert got_keys == set(todo)
    # manifest is cumulative + atomic
    checkpoint.mark_done(out, "r1", todo)
    assert checkpoint.load_done_keys(out, "r1") == set(keys)
    assert checkpoint.filter_not_done(pages, out, "r1").isEmpty()


def test_two_phase_run_equals_single_shot(spark, tmp_path):
    from engine.partitioning import with_write_partitions

    single = str(tmp_path / "single")
    twophase = str(tmp_path / "two")
    pages = with_partition_key(gen_pages_df(spark, N)).cache()

    def run(pages_subset, out, mode="overwrite"):
        ex = build_extracted(pages_subset.drop("part_key"), num_partitions=4)
        ex = with_write_partitions(ex)
        write_table(ex, out + "/extracted", partition_by=["day", "pbucket"], mode=mode)

    # single shot
    run(pages, single)

    # phase 1: half the partition keys; phase 2: resume the rest
    keys = sorted(r["part_key"] for r in pages.select("part_key").distinct().collect())
    first = keys[: len(keys) // 2]
    p1 = pages.filter(F.col("part_key").isin(first))
    run(p1, twophase)
    checkpoint.mark_done(twophase, "r1", first)
    rest = checkpoint.filter_not_done(pages, twophase, "r1")
    # dynamic partition overwrite keeps phase-1 day-partitions intact
    run(rest, twophase, mode="overwrite")

    a = spark.read.parquet(single + "/extracted").drop("day", "pbucket")
    b = spark.read.parquet(twophase + "/extracted").drop("day", "pbucket")
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
