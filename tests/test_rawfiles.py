"""B2 raw-file ingest: binaryFile source -> pages rows -> extraction
(batch + streaming variants)."""

from __future__ import annotations

import os

import pytest

from engine.io.rawfiles import (
    decode_drop_filename,
    encode_drop_filename,
)


def test_filename_codec_roundtrip():
    url = "https://host07.example.com/a/b?q=x y&z=%2F"
    name = encode_drop_filename(url, 1735689600)
    assert "/" not in name.replace(".bin", "") and name.endswith(".bin")
    u2, ts = decode_drop_filename(name)
    assert (u2, ts) == (url, 1735689600)


@pytest.fixture(scope="module")
def drop_dir(tmp_path_factory):
    from engine.corpus import gen_pages_pandas

    d = tmp_path_factory.mktemp("drop")
    pdf = gen_pages_pandas(42, 0, 60)
    for _, r in pdf.iterrows():
        ts = int(r["warc_ts"].timestamp())
        payload = bytes(r["html"]) if r["html"] is not None else b""
        if payload:  # drop contract: empty capture = no file
            (d / encode_drop_filename(r["url"], ts)).write_bytes(payload)
    return str(d), pdf


def test_batch_raw_drop_matches_corpus(spark, drop_dir):
    from engine.io.rawfiles import read_raw_drop

    d, pdf = drop_dir
    got = read_raw_drop(spark, d).toPandas().set_index("url")
    # urls may repeat in the corpus (dedup fixture) — filenames carry
    # distinct ts so every written file must come back
    n_files = len([f for f in os.listdir(d) if f.endswith(".bin")])
    assert len(got) == n_files
    sample = pdf[pdf["html"].notna()].iloc[0]
    row = got.loc[sample["url"]]
    assert bytes(row["html"]) == bytes(sample["html"])
    assert row["warc_ts"].timestamp() == int(sample["warc_ts"].timestamp())


def test_raw_drop_feeds_extraction(spark, drop_dir):
    from engine.io.rawfiles import read_raw_drop
    from engine.pipeline import build_extracted

    d, _ = drop_dir
    ex = build_extracted(read_raw_drop(spark, d), num_partitions=4)
    counts = {r["path"]: r["n"] for r in ex.groupBy("path").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    assert counts.get("html", 0) > 0


def test_streaming_raw_drop(spark, drop_dir, tmp_path):
    from engine.io.rawfiles import read_raw_drop_stream

    d, _ = drop_dir
    stream = read_raw_drop_stream(spark, d, max_files_per_trigger=16)
    assert stream.isStreaming
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    landed = spark.read.parquet(out)
    n_files = len([f for f in os.listdir(d) if f.endswith(".bin")])
    assert landed.count() == n_files
    assert set(landed.columns) == {"url", "warc_ts", "html", "text", "lang"}
