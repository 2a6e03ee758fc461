"""B2: raw-file ingest for new crawl drops (SURVEY.md §2.B2).

A crawl drop is a directory of payload files (one document per file,
WARC-ish naming `<percent-encoded-url>__<unix-ts>.bin`). Spark's
`binaryFile` source reads them as (path, modificationTime, length,
content) without any Python crossing; url and capture time are
recovered from the FILE NAME (deterministic — never from fs mtime,
which copy operations rewrite). Output matches PAGES_SCHEMA so the
drop feeds straight into build_extracted.

Batch and streaming variants share the same projection; the streaming
one is the D1 file source with `maxFilesPerTrigger` back-pressure.

Drop-format contract: a capture with NO payload is represented by
OMITTING the file, not by a zero-byte file — Spark's binaryFile
source generates no input split for empty files, so they are
silently invisible to any reader. Writers must skip empty payloads.
"""

from __future__ import annotations

from urllib.parse import quote, unquote

from pyspark.sql import DataFrame, SparkSession, functions as F

RAW_SUFFIX = ".bin"


def encode_drop_filename(url: str, unix_ts: int) -> str:
    """Inverse of the projection below (used by tests/writers)."""
    return f"{quote(url, safe='')}__{unix_ts}{RAW_SUFFIX}"


def decode_drop_filename(name: str) -> tuple[str, int]:
    stem = name[: -len(RAW_SUFFIX)] if name.endswith(RAW_SUFFIX) else name
    enc_url, _, ts = stem.rpartition("__")
    return unquote(enc_url), int(ts)


def _project(files: DataFrame) -> DataFrame:
    name = F.element_at(F.split(F.col("path"), "/"), -1)
    stem = F.regexp_replace(name, r"\.bin$", "")
    enc_url = F.regexp_extract(stem, r"^(.*)__(\d+)$", 1)
    ts = F.regexp_extract(stem, r"^(.*)__(\d+)$", 2)
    return files.select(
        F.url_decode(enc_url).alias("url"),
        F.timestamp_seconds(ts.cast("long")).alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


def read_raw_drop(spark: SparkSession, input_dir: str) -> DataFrame:
    """Batch: directory of payload files -> pages rows."""
    files = spark.read.format("binaryFile").option(
        "pathGlobFilter", f"*{RAW_SUFFIX}"
    ).load(input_dir)
    return _project(files)


# the binaryFile source's fixed schema (streaming requires it stated)
BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def read_raw_drop_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 64
) -> DataFrame:
    """Streaming: new payload files appear -> micro-batches (D1)."""
    files = (
        spark.readStream.format("binaryFile")
        .schema(BINARY_FILE_SCHEMA)
        .option("pathGlobFilter", f"*{RAW_SUFFIX}")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(input_dir)
    )
    return _project(files)
