"""Training export: any DataFrame -> deterministic sharded JSONL.

The last mile of a training-data pipeline: trainers consume line-
delimited JSON shards (gzip), not parquet. This writer produces a
layout any data loader can stream:

    <path>/shard=0/part-*.txt.gz     one gzip member per shard
    <path>/shard=1/...

Scale shapes:
  * the JSON encoding is F.to_json over a struct — pure JVM codegen,
    no Python crossing.
  * shard count is sized from ONE metadata aggregate
    (sum(length(json))), so shards land near `shard_max_bytes`
    UNCOMPRESSED (gzip ratio is corpus-dependent and deliberately not
    modeled — the bound a loader cares about is decompressed buffer
    size). The sizing agg is one extra scan of the projected columns;
    at sink time that is the price of bounded shards (pass
    `n_shards` explicitly to skip it).
  * shard assignment is pmod(xxhash64(key)) — the engine's standard
    deterministic-placement rule (engine/ops/sample.py, jobs/compact
    use the same), so re-runs produce identical shard membership, and
    rows within a shard are written in sorted key order: the whole
    export is byte-reproducible at the JSONL layer regardless of
    cluster size or task scheduling.
  * one gzip file per shard: the write repartitions BY the shard
    column, so each task writes whole shards (text writer splits by
    partition directory).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def export_jsonl(
    df: DataFrame,
    path: str,
    key_col: str,
    shard_max_bytes: int = 256 << 20,
    n_shards: int | None = None,
    compression: str = "gzip",
) -> dict:
    """Write df as gzip JSONL under path/shard=N/, one line per row,
    keyed and ordered by key_col. Returns {rows, bytes_est, n_shards}.

    key_col must be unique per row for full byte-reproducibility of
    line order (ties sort arbitrarily within equal keys)."""
    if key_col not in df.columns:
        raise ValueError(f"key_col {key_col!r} not in {df.columns}")
    enc = df.select(
        F.col(key_col).cast("string").alias("_k"),
        F.to_json(F.struct(*df.columns)).alias("value"),
    )
    if n_shards is None:
        est = enc.agg(
            F.count(F.lit(1)).alias("rows"),
            # octet_length, not length: the shard bound is UTF-8 BYTES
            # on disk, and characters undercount up to 4x on non-ASCII
            # corpora (review r3). +1 per row for the newline.
            F.coalesce(F.sum(F.octet_length("value") + 1), F.lit(0)).alias(
                "bytes"
            ),
        ).first()
        rows, total = est["rows"], int(est["bytes"])
        n_shards = max(1, math.ceil(total / shard_max_bytes))
    else:
        rows, total = None, None
    out = (
        enc.withColumn(
            "shard",
            F.pmod(F.xxhash64("_k"), F.lit(n_shards)).cast("int"),
        )
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "_k")
        .select("shard", "value")
    )
    (
        out.write.mode("overwrite")
        .partitionBy("shard")
        # a full export rewrite, not a per-partition upsert: static
        # overwrite (per-write override of the session's dynamic
        # default) also restores the root _SUCCESS marker that stage
        # resume keys on
        .option("partitionOverwriteMode", "static")
        .option("compression", compression)
        .text(path)
    )
    return {"rows": rows, "bytes_est": total, "n_shards": n_shards}


def read_jsonl(
    spark,
    path: str,
    schema: str | None = None,
):
    """Read a JSONL(.gz) document corpus — the interchange format the
    public corpora actually ship in (C4 / Dolma / RedPajama releases
    are gzip JSONL), and the format export_jsonl above writes, so an
    exported corpus round-trips back into the engine's jobs.

    `schema`: a DDL string ("url string, text string, lang string").
    Pass it at scale — omitting it makes Spark INFER the schema with
    a full extra pass over the data before the real read (fine for
    inspection, wrong for 100 TB; the jobs expose --input-schema for
    exactly this reason). Gzip input is splittable only per FILE, so
    parallelism = number of .gz shards — which is how the public
    corpora (and export_jsonl) shard anyway. Corrupt lines land in
    Spark's default PERMISSIVE null-row handling rather than killing
    the job."""
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.json(path)


def read_docs(spark, path: str, fmt: str = "parquet", schema: str | None = None):
    """One seam for the document-level jobs' --input-format switch:
    parquet (native) or jsonl (public-corpus interchange)."""
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "jsonl":
        return read_jsonl(spark, path, schema=schema)
    raise ValueError(f"unknown input format {fmt!r} (parquet|jsonl)")
