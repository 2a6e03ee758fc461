"""Per-partition lineage + job-level metrics (SURVEY.md §2 A11).

Two complementary mechanisms:
  * observe_extraction: zero-cost job-level counters via
    DataFrame.observe — rows, errors, per-path counts, total chars —
    collected by the driver when the action completes (no extra scan,
    no shuffle).
  * lineage_rows: per-task trailer rows emitted by mapInPandas with
    TaskContext.partitionId — one row per executor task recording
    rows in/ok/err, bytes and per-path counts, written to the
    `lineage` table alongside the data so resumed runs are auditable
    (BASELINE.json:14 "per-partition lineage + metrics").
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame, Observation, functions as F

LINEAGE_DDL = (
    "run_id string, partition_id int, n_rows long, n_ok long, n_err long, "
    "bytes_in long, n_html long, n_pdf_text long, n_pdf_ocr long, "
    "wall_ms long, path_counts map<string,long>"
)


def observe_extraction(
    extracted: DataFrame, name: str = "extraction_metrics"
) -> tuple[DataFrame, Observation]:
    obs = Observation(name)
    observed = extracted.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.count(F.col("error")).alias("errors"),
        F.sum(F.when(F.col("path") == "html", 1).otherwise(0)).alias("html_rows"),
        F.sum(F.when(F.col("path") == "pdf_text", 1).otherwise(0)).alias("pdf_text_rows"),
        F.sum(F.when(F.col("path") == "pdf_ocr", 1).otherwise(0)).alias("pdf_ocr_rows"),
        F.sum(F.coalesce(F.col("n_chars"), F.lit(0))).alias("total_chars"),
    )
    return observed, obs


def lineage_map_in_pandas(run_id: str):
    """Returns a mapInPandas fn over extracted rows that emits one
    lineage trailer row per task partition."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t0 = time.monotonic()
        n_rows = n_ok = n_err = bytes_in = 0
        paths = {"html": 0, "pdf_text": 0, "pdf_ocr": 0}
        for pdf in batches:
            n_rows += len(pdf)
            err_mask = pdf["error"].notna()
            n_err += int(err_mask.sum())
            n_ok += int((~err_mask).sum())
            if "n_chars" in pdf:
                bytes_in += int(pdf["n_chars"].fillna(0).sum())
            vc = pdf["path"].value_counts()
            for k in paths:
                paths[k] += int(vc.get(k, 0))
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        yield pd.DataFrame(
            [
                (
                    run_id,
                    pid,
                    n_rows,
                    n_ok,
                    n_err,
                    bytes_in,
                    paths["html"],
                    paths["pdf_text"],
                    paths["pdf_ocr"],
                    int((time.monotonic() - t0) * 1000),
                    # §1.2 shape: per-path counters ALSO as a proper
                    # map<string,long> column (flat columns kept for
                    # cheap dashboard scans; the map is what a
                    # variable-path deployment consumes)
                    dict(sorted(paths.items())),
                )
            ],
            columns=[
                "run_id",
                "partition_id",
                "n_rows",
                "n_ok",
                "n_err",
                "bytes_in",
                "n_html",
                "n_pdf_text",
                "n_pdf_ocr",
                "wall_ms",
                "path_counts",
            ],
        )

    return fn


def build_lineage(extracted: DataFrame, run_id: str) -> DataFrame:
    cols = extracted.select("path", "error", "n_chars")
    return cols.mapInPandas(lineage_map_in_pandas(run_id), LINEAGE_DDL)
