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


def _vecs(spark, rows):
    return spark.createDataFrame(
        rows, "url string, chunk_ix int, embedding array<float>, label int"
    )


def test_delta_delete_stale_vectors(spark, tmp_path):
    """Re-crawl delta index maintenance: a changed doc that shrank from
    3 chunks to 1 must lose its stale tail keys; untouched docs keep
    theirs; the whole put+delete round is byte-idempotent."""
    from engine.io.vector_sink import (
        load_live_keys,
        sink_vector_deletes,
        sink_vectors,
    )
    from engine.pipeline import stale_chunk_keys

    idx = str(tmp_path / "index")
    v0 = _vecs(
        spark,
        [
            ("A", 0, [1.0], 1),
            ("A", 1, [2.0], 1),
            ("A", 2, [3.0], 1),
            ("B", 0, [9.0], 2),
        ],
    )
    sink_vectors(v0, "main", idx, gen=0).collect()
    assert set(load_live_keys(idx, "main")) == {"A#0", "A#1", "A#2", "B#0"}

    # delta run (gen 1): A's new content chunks to ONE chunk, new bytes
    v1 = _vecs(spark, [("A", 0, [7.0], 1)])
    prior_chunks = v0.select("url", "chunk_ix")
    changed = spark.createDataFrame([("A",)], "url string")
    stale = stale_chunk_keys(prior_chunks, v1.select("url", "chunk_ix"), changed)
    assert {r["key"] for r in stale.collect()} == {"A#1", "A#2"}

    sink_vectors(v1, "main", idx, gen=1).collect()
    n_del = sum(
        r["n_vectors"]
        for r in sink_vector_deletes(stale, "main", idx, gen=1).collect()
    )
    assert n_del == 2
    live = load_live_keys(idx, "main")
    assert set(live) == {"A#0", "B#0"}
    assert live["A#0"]["data"]["float32"] == [7.0]  # gen-1 put wins
    assert live["B#0"]["data"]["float32"] == [9.0]  # untouched doc kept

    # idempotence: re-running the delta round leaves identical bytes
    root = pathlib.Path(idx) / "main"
    d1 = _dir_digest(root)
    sink_vectors(v1, "main", idx, gen=1).collect()
    sink_vector_deletes(stale, "main", idx, gen=1).collect()
    assert _dir_digest(root) == d1
    assert set(load_live_keys(idx, "main")) == {"A#0", "B#0"}


def test_stale_keys_zero_chunk_rewrite(spark):
    """A changed doc whose new content chunks to NOTHING loses every
    prior key; docs outside the changed set are never in the delete
    set even when absent from the new crawl."""
    from engine.pipeline import stale_chunk_keys

    prior = spark.createDataFrame(
        [("A", 0), ("A", 1), ("B", 0)], "url string, chunk_ix int"
    )
    new = spark.createDataFrame([], "url string, chunk_ix int")
    changed = spark.createDataFrame([("A",)], "url string")
    stale = {r["key"] for r in stale_chunk_keys(prior, new, changed).collect()}
    assert stale == {"A#0", "A#1"}  # B not re-crawled -> not deleted


def test_stale_keys_bucket_pruned(spark):
    """When the prior chunks table carries pbucket and the caller
    passes the delta's buckets, prior rows outside them are never
    read — and the result is unchanged (the pruning is sound because
    a url's bucket is a pure function of the url)."""
    from engine.pipeline import stale_chunk_keys

    prior = spark.createDataFrame(
        [("A", 0, 3), ("A", 1, 3), ("C", 0, 7)],
        "url string, chunk_ix int, pbucket int",
    )
    new = spark.createDataFrame([("A", 0)], "url string, chunk_ix int")
    changed = spark.createDataFrame([("A",)], "url string")
    pruned = stale_chunk_keys(prior, new, changed, buckets=[3])
    assert {r["key"] for r in pruned.collect()} == {"A#1"}
    # plan actually filters on pbucket before the joins
    assert "pbucket" in pruned._jdf.queryExecution().optimizedPlan().toString()


def test_compact_index_log(spark, tmp_path):
    """compact_index_log collapses the multi-generation put/delete log
    into one snapshot generation with the identical live view, removes
    the old files, stays correct under further deltas on top, and a
    re-compaction of a compacted log preserves the same live bytes."""
    from engine.io.vector_sink import (
        compact_index_log,
        load_live_keys,
        sink_vector_deletes,
        sink_vectors,
    )

    idx = str(tmp_path / "index")
    sink_vectors(
        _vecs(spark, [("A", 0, [1.0], 1), ("A", 1, [2.0], 1), ("B", 0, [9.0], 2)]),
        "main", idx, gen=0,
    ).collect()
    sink_vectors(_vecs(spark, [("A", 0, [7.0], 1)]), "main", idx, gen=1).collect()
    stale = spark.createDataFrame([("A#1",)], "key string")
    sink_vector_deletes(stale, "main", idx, gen=1).collect()

    before = load_live_keys(idx, "main")
    assert set(before) == {"A#0", "B#0"}
    root = pathlib.Path(idx) / "main"
    n_files_before = len(list(root.glob("*.jsonl")))
    assert n_files_before >= 3  # two put gens + one delete file

    stats = compact_index_log(idx, "main")
    assert stats["live_keys"] == 2
    assert stats["files_removed"] == n_files_before
    after = load_live_keys(idx, "main")
    # live view identical (up to the bookkeeping fields compaction rewrites)
    strip = lambda d: {k: {a: b for a, b in v.items() if not a.startswith("_")}
                       for k, v in d.items()}
    assert strip(after) == strip(before)
    files = sorted(p.name for p in root.glob("*.jsonl"))
    assert all(f.startswith(f"g{stats['snapshot_gen']:06d}_") for f in files)
    assert not [f for f in files if f.endswith(".del.jsonl")]

    # a further delta on top of the snapshot still replays in order
    sink_vectors(
        _vecs(spark, [("C", 0, [5.0], 3)]), "main", idx,
        gen=stats["snapshot_gen"] + 1,
    ).collect()
    assert set(load_live_keys(idx, "main")) == {"A#0", "B#0", "C#0"}

    # re-compaction: same live view, single generation again
    stats2 = compact_index_log(idx, "main")
    assert stats2["live_keys"] == 3
    assert set(load_live_keys(idx, "main")) == {"A#0", "B#0", "C#0"}
