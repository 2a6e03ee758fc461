"""Cross-run re-crawl merge (engine/pipeline.merge_latest) and input
schema validation (engine/io/validate.py)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from engine.corpus import gen_pages_df
from engine.io.validate import assert_pages_schema
from engine.pipeline import build_extracted, merge_latest


def test_merge_latest_equals_single_shot(spark):
    """Ingesting one crawl, then merging a second snapshot, must equal
    extracting the union in one shot — in any snapshot order."""
    pages = gen_pages_df(spark, 300, seed=42)
    # split captures into two "snapshots" by timestamp parity
    day = F.dayofmonth("warc_ts")
    snap1 = pages.filter(day % 2 == 0)
    snap2 = pages.filter(day % 2 == 1)

    one_shot = build_extracted(pages)
    ex1 = build_extracted(snap1)
    ex2 = build_extracted(snap2)
    merged = merge_latest(ex1, ex2)
    merged_rev = merge_latest(ex2, ex1)

    def key(df):
        return {
            r["url"]: (str(r["warc_ts"]), r["content_sha256"])
            for r in df.select("url", "warc_ts", "content_sha256").collect()
        }

    want = key(one_shot)
    assert key(merged) == want
    assert key(merged_rev) == want  # order-insensitive


def test_merge_latest_idempotent(spark):
    pages = gen_pages_df(spark, 120, seed=7)
    ex = build_extracted(pages)
    again = merge_latest(ex, ex)
    assert again.count() == ex.count()
    assert again.exceptAll(ex).isEmpty() and ex.exceptAll(again).isEmpty()


def test_assert_pages_schema(spark):
    good = spark.createDataFrame(
        [("u", dt.datetime(2025, 1, 1), b"x", None, "en", 9)],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string, extra int",  # extra columns are fine
    )
    assert assert_pages_schema(good) is good

    bad = spark.createDataFrame(
        [("u", "2025-01-01", 3)],
        "url string, warc_ts string, html int",
    )
    with pytest.raises(ValueError) as e:
        assert_pages_schema(bad)
    msg = str(e.value)
    assert "warc_ts" in msg and "html" in msg and "missing column 'text'" in msg
