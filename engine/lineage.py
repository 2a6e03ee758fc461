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


def lineage_map_in_pandas(run_id: str, by: str | None = None):
    """Returns a mapInPandas fn over extracted rows that emits one
    lineage trailer row per task partition — or, with `by`, one row
    per distinct `by` value per task (so trailers can be written into
    a table PARTITIONED by that key: jobs/ingest.py partitions lineage
    by pbucket, making re-done work units overwrite exactly their own
    trailer rows regardless of how buckets are batched)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t0 = time.monotonic()
        groups: dict = {}

        def acc(key):
            return groups.setdefault(
                key,
                {
                    "n_rows": 0, "n_ok": 0, "n_err": 0, "bytes_in": 0,
                    "paths": {"html": 0, "pdf_text": 0, "pdf_ocr": 0},
                },
            )

        for pdf in batches:
            for key, sub in (
                [(None, pdf)] if by is None else pdf.groupby(by, sort=True)
            ):
                g = acc(key)
                g["n_rows"] += len(sub)
                err_mask = sub["error"].notna()
                g["n_err"] += int(err_mask.sum())
                g["n_ok"] += int((~err_mask).sum())
                if "n_chars" in sub:
                    g["bytes_in"] += int(sub["n_chars"].fillna(0).sum())
                vc = sub["path"].value_counts()
                for k in g["paths"]:
                    g["paths"][k] += int(vc.get(k, 0))
        if by is not None and not groups:
            return  # empty task: no trailer rows
        if not groups:
            acc(None)  # keep the one-trailer-per-task shape
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        wall = int((time.monotonic() - t0) * 1000)
        # wall_ms is APPORTIONED across a task's trailer rows by row
        # share: a task spanning 4 buckets emits 4 rows whose wall_ms
        # SUM to the task wall, so per-run / per-bucket dashboard sums
        # stay truthful instead of multi-counting the task (by=None
        # keeps the single full-wall trailer unchanged).
        task_rows = sum(g["n_rows"] for g in groups.values())
        rows = []
        for key in sorted(groups, key=lambda k: (k is None, k)):
            g = groups[key]
            paths = g["paths"]
            rows.append(
                (
                    run_id,
                    pid,
                    g["n_rows"],
                    g["n_ok"],
                    g["n_err"],
                    g["bytes_in"],
                    paths["html"],
                    paths["pdf_text"],
                    paths["pdf_ocr"],
                    wall if task_rows == 0 else round(wall * g["n_rows"] / task_rows),
                    # §1.2 shape: per-path counters ALSO as a proper
                    # map<string,long> column (flat columns kept for
                    # cheap dashboard scans; the map is what a
                    # variable-path deployment consumes)
                    dict(sorted(paths.items())),
                )
                + (() if by is None else (key,))
            )
        cols = [
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
        ] + ([] if by is None else [by])
        yield pd.DataFrame(rows, columns=cols)

    return fn


def build_lineage(
    extracted: DataFrame, run_id: str, by: str | None = None
) -> DataFrame:
    sel = ["path", "error", "n_chars"] + ([by] if by else [])
    ddl = LINEAGE_DDL if by is None else f"{LINEAGE_DDL}, {by} int"
    return extracted.select(*sel).mapInPandas(
        lineage_map_in_pandas(run_id, by=by), ddl
    )
