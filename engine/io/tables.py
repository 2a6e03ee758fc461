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
