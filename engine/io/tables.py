"""Table IO seam: partitioned Parquet now, Iceberg later
(SURVEY.md §1.4).

No Iceberg runtime jar exists in this sandbox (verified, SURVEY.md
§0 ENV), so the Iceberg contract is emulated with partitioned
Parquet + dynamic partition overwrite, behind this one module. On a
real cluster, swap the bodies for
``df.writeTo(table).using("iceberg").overwritePartitions()`` /
``spark.read.table(table)`` — callers don't change. Dynamic
partition overwrite is the idempotence primitive checkpoint/resume
relies on (A12): re-writing a partition replaces exactly that
partition, never clobbers the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def overwrite_partitions(df: DataFrame, path: str, partition_by: list[str]) -> None:
    """Iceberg overwritePartitions() equivalent: replace exactly the
    partitions present in df."""
    write_table(df, path, partition_by=partition_by, mode="overwrite")


def delete_partition(table_path: str, partition: dict[str, object]) -> None:
    """Drop one hive partition directory (Iceberg's
    ``ALTER TABLE ... DROP PARTITION`` / delete-with-predicate
    equivalent). Dynamic overwrite can only REPLACE partitions that
    appear in the written frame — a partition whose every row was
    superseded must be dropped explicitly or stale rows stay live.

    Local filesystem only, and deletion failures RAISE: silently
    keeping a superseded partition violates latest-wins for every
    reader. On object stores / HDFS this must go through the table
    format's delete API — refusing loudly beats a silent no-op."""
    import os
    import shutil

    if "://" in table_path:
        raise NotImplementedError(
            f"delete_partition on {table_path!r}: non-local table paths "
            "need the table format's drop-partition API (Iceberg "
            "overwritePartitions/DROP PARTITION) — no jar in this sandbox"
        )
    sub = os.path.join(
        table_path, *(f"{k}={v}" for k, v in partition.items())
    )
    if os.path.exists(sub):
        shutil.rmtree(sub)  # raises on failure, by design


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 64,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed write: co-locates rows by hash(bucket_cols) at WRITE
    time so every later equi-join/agg on those columns is exchange-free
    (the scan itself carries HashPartitioning). This is the 100-TB plan
    for the hot `extracted ⋈ chunks ⋈ vectors` joins on url: pay the
    shuffle once when the table is written, never again per query.

    Uses the session catalog (saveAsTable — bucketing metadata lives in
    the catalog, plain .parquet(path) cannot carry it); Iceberg's
    equivalent is a `bucket(N, col)` partition transform on the same
    seam. sort_cols additionally sorts within buckets so sort-merge
    joins skip their Sort too.
    """
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.read.table(table)
