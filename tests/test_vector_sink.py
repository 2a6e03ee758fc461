"""A9 vector-index sink: receipts account for every vector, request
files are put_vectors-shaped, and re-running is byte-idempotent."""

from __future__ import annotations

import hashlib
import json
import pathlib

from pyspark.sql import functions as F


def _dir_digest(root: pathlib.Path) -> dict[str, str]:
    return {
        str(p.relative_to(root)): hashlib.sha256(p.read_bytes()).hexdigest()
        for p in sorted(root.rglob("*.jsonl"))
    }


def test_sink_vectors_dry_run_idempotent(spark, tmp_path):
    from engine.corpus import gen_pages_df
    from engine.io.vector_sink import sink_vectors
    from engine.pipeline import build_chunks, build_extracted, build_vectors

    vectors = build_vectors(
        build_chunks(build_extracted(gen_pages_df(spark, 60)))
    ).repartition(4, "url")
    n_expected = vectors.count()

    idx_dir = str(tmp_path / "index")
    receipts = sink_vectors(
        vectors, index="chunks-v1", index_dir=idx_dir, batch_size=50
    )
    rows = receipts.collect()
    assert sum(r["n_vectors"] for r in rows) == n_expected

    root = pathlib.Path(idx_dir) / "chunks-v1"
    files = sorted(root.glob("*.jsonl"))
    assert files, "no request files written"
    # request shape: key + float32 data + metadata
    entry = json.loads(files[0].read_text().splitlines()[0])
    assert set(entry) == {"key", "data", "metadata"}
    assert "#" in entry["key"] and isinstance(entry["data"]["float32"], list)
    n_entries = sum(len(p.read_text().splitlines()) for p in files)
    assert n_entries == n_expected

    # idempotence: a second run overwrites with identical bytes
    d1 = _dir_digest(root)
    sink_vectors(
        vectors, index="chunks-v1", index_dir=idx_dir, batch_size=50
    ).collect()
    assert _dir_digest(root) == d1
