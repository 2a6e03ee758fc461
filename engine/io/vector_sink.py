"""A9: vector-index sink writer (SURVEY.md §2 A9).

The reference's target is an S3-Vectors-style ``put_vectors`` API
(request = a batch of {key, vector, metadata} entries). This sandbox
has no network, so the writer ships with a DRY-RUN client that lands
each request batch as a deterministic JSONL file; a real client (e.g.
``boto3.client("s3vectors").put_vectors``) slots in at the same
``put_vectors(index, entries)`` seam without touching the Spark side.

Spark shape — executor-side, Arrow-batched, idempotent:

  * the crossing is ``mapInPandas`` (Arrow batches in, one RECEIPT row
    per request batch out), never per-row Python through py4j — the
    driver only ever sees receipt counts, not vectors;
  * requests are keyed ``(partition_id, seq)``, and the dry-run client
    writes file ``part{pid:05d}_{seq:05d}.jsonl`` — re-running a task
    (Spark retries, resume re-runs) overwrites the same files with the
    same bytes, the put_vectors analogue of idempotent-by-key puts;
  * at 10^12 rows the unit of parallelism is the upstream partition:
    no shuffle is introduced here, batches bound request size, and
    the receipts aggregate is the only driver traffic.

Index maintenance (re-crawl deltas): a changed document whose new
content yields FEWER chunks than its prior capture leaves stale
``url#chunk_ix`` keys live in the index unless they are deleted —
``put_vectors`` alone can only overwrite keys that still exist in the
new chunking. ``sink_vector_deletes`` issues ``delete_vectors`` calls
through the same client seam (same mapInPandas/receipts shape, same
idempotent (pid, seq) keying); ``engine.pipeline.stale_chunk_keys``
computes the delete set, delta-sized by construction. Requests carry a
caller-supplied ``gen`` (generation) so the dry-run log replays in run
order: each successive delta run passes a higher gen, a resumed/re-run
task of the SAME run reuses its gen and overwrites its own files
byte-identically. Within one generation the put and delete key sets
are disjoint (a key is either re-put by the new chunking or deleted as
stale, never both), so intra-generation file order is immaterial.
``load_live_keys`` replays the log and returns the live view — the
test/report-side analogue of querying the real index.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

RECEIPTS_DDL = "partition_id int, n_batches long, n_vectors long"

DEFAULT_BATCH_SIZE = 500


class DryRunVectorClient:
    """put_vectors / delete_vectors -> one JSONL file per request,
    deterministic bytes. File names order by (gen, pid, seq) so
    ``load_live_keys`` can replay the log in run order."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir

    def _write(self, index: str, entries: list[dict], suffix: str) -> None:
        os.makedirs(os.path.join(self.index_dir, index), exist_ok=True)
        e0 = entries[0]
        pid, seq, gen = e0["_pid"], e0["_seq"], e0.get("_gen", 0)
        # "z" marks a compaction snapshot: it replays AFTER the plain
        # files of its generation and BEFORE the next generation
        # ('_' < 'z' < the next gen's digits via numeric parsing in
        # _replay_order), and never collides with a stream's next
        # batch-id generation (review r3)
        z = "z" if e0.get("_snap") else ""
        path = os.path.join(
            self.index_dir,
            index,
            f"g{gen:06d}{z}_part{pid:05d}_{seq:05d}{suffix}",
        )
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            for e in entries:
                e = {k: v for k, v in e.items() if not k.startswith("_")}
                f.write(json.dumps(e, sort_keys=True) + "\n")
        os.replace(tmp, path)  # atomic: rerun overwrites, never interleaves

    def put_vectors(self, index: str, entries: list[dict]) -> None:
        self._write(index, entries, ".jsonl")

    def delete_vectors(self, index: str, entries: list[dict]) -> None:
        """entries = [{"key": ...}, ...] (plus _pid/_seq/_gen bookkeeping)."""
        self._write(index, entries, ".del.jsonl")


def sink_vectors(
    vectors: DataFrame,
    index: str,
    index_dir: str,
    batch_size: int = DEFAULT_BATCH_SIZE,
    client_factory=None,
    meta_cols: list[str] | None = None,
    gen: int = 0,
) -> DataFrame:
    """vectors(vec_id, url, chunk_ix, embedding, label) -> receipts.

    Returns the lazy receipts DataFrame; forcing it (count/collect)
    performs the writes executor-side. ``client_factory`` is invoked
    ONCE PER TASK (connection amortized across all its batches) and
    must return an object with ``put_vectors(index, entries)``.

    ``meta_cols``: extra columns of `vectors` to carry into each
    entry's metadata dict (e.g. title/description from
    engine/kernels/docmeta) — nulls are omitted, values stringified
    per the put-API metadata shape.

    ``gen``: generation stamp for the dry-run log (see module doc) —
    pass a higher value for each successive delta run; a re-run of the
    SAME run reuses its gen (idempotent overwrite). Ignored by real
    clients, whose index is mutable in place.
    """
    factory = client_factory or (lambda: DryRunVectorClient(index_dir))
    meta_cols = list(meta_cols or [])

    def write_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        client = factory()
        seq = 0
        n_vec = 0
        pending: list[dict] = []

        def flush():
            nonlocal seq, pending
            if pending:
                client.put_vectors(index, pending)
                pending = []
                seq += 1

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                meta = {"label": int(row.label)}
                for c in meta_cols:
                    v = getattr(row, c)
                    if v is not None and v == v:  # skip null/NaN
                        meta[c] = str(v)
                pending.append(
                    {
                        "_pid": pid,
                        "_seq": seq,
                        "_gen": gen,
                        "key": f"{row.url}#{row.chunk_ix}",
                        "data": {"float32": [float(x) for x in row.embedding]},
                        "metadata": meta,
                    }
                )
                n_vec += 1
                if len(pending) >= batch_size:
                    flush()
        flush()
        yield pd.DataFrame(
            [(pid, seq, n_vec)],
            columns=["partition_id", "n_batches", "n_vectors"],
        )

    return vectors.select(
        "url", "chunk_ix", "embedding", "label", *meta_cols
    ).mapInPandas(write_batches, RECEIPTS_DDL)


def sink_vector_deletes(
    keys: DataFrame,
    index: str,
    index_dir: str,
    batch_size: int = DEFAULT_BATCH_SIZE,
    client_factory=None,
    gen: int = 0,
) -> DataFrame:
    """keys(key:string) -> receipts; issues ``delete_vectors`` calls.

    The delete-side twin of ``sink_vectors``: same per-task client,
    same (pid, seq) idempotent request keying, same receipts schema
    (``n_vectors`` counts deleted keys). The input is the stale-key
    frame from ``engine.pipeline.stale_chunk_keys`` — delta-sized, so
    at 10^12 docs a 1% re-crawl issues deletes proportional to the
    change rate, with no shuffle introduced here.
    """
    factory = client_factory or (lambda: DryRunVectorClient(index_dir))

    def delete_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        client = factory()
        seq = 0
        n_del = 0
        pending: list[dict] = []

        def flush():
            nonlocal seq, pending
            if pending:
                client.delete_vectors(index, pending)
                pending = []
                seq += 1

        for pdf in batches:
            for key in pdf["key"]:
                pending.append(
                    {"_pid": pid, "_seq": seq, "_gen": gen, "key": str(key)}
                )
                n_del += 1
                if len(pending) >= batch_size:
                    flush()
        flush()
        yield pd.DataFrame(
            [(pid, seq, n_del)],
            columns=["partition_id", "n_batches", "n_vectors"],
        )

    return keys.select("key").mapInPandas(delete_batches, RECEIPTS_DDL)


_GEN_RE = None  # compiled lazily; module stays import-light


def _replay_order(name: str) -> tuple:
    """Sort key for index-log replay: legacy pre-generation files
    (part*.jsonl, the format before gens existed) first, then
    generations in NUMERIC order (lexicographic breaks at 7 digits —
    streaming gens are unbounded batch ids), with a generation's "z"
    compaction snapshot after its plain files (review r3)."""
    global _GEN_RE
    if _GEN_RE is None:
        import re

        _GEN_RE = re.compile(r"^g(\d+)(z?)_")
    m = _GEN_RE.match(name)
    if not m:
        return (-1, 0, name)
    return (int(m.group(1)), 1 if m.group(2) else 0, name)


def compact_index_log(
    index_dir: str,
    index: str,
    batch_size: int = DEFAULT_BATCH_SIZE,
) -> dict:
    """Collapse the generation-ordered put/delete log into ONE
    snapshot generation holding exactly the live keys.

    Delta runs grow the log by one generation each; after many
    re-crawl cycles replay cost is O(history) though the live index is
    O(corpus). Compaction rewrites the live view as the CURRENT
    max generation's "z" snapshot slot — which replays after that
    generation's plain files and before the next generation — and
    garbage-collects everything else. The z-slot (not max_gen+1)
    matters for streaming-fed indexes: a restarted stream's next
    micro-batch writes generation max_gen+1, which must never collide
    with or replay before the snapshot (review r3).

    Crash-safe by write ordering, like jobs/compact.py's data-then-
    manifest discipline: the snapshot files are written FIRST (each an
    atomic tmp+rename); replaying old-log + snapshot yields the
    snapshot state (the z slot wins every key), so deleting the old
    files afterwards is pure GC and a crash between the two steps only
    leaves extra files a re-run removes. Re-running compaction
    overwrites the same z slot with the same live set and GCs any
    leftover higher-seq snapshot files from a previous, larger
    snapshot.

    COMPACTION IS A GENERATION BARRIER: writers after a compaction
    must use gen > the returned snapshot_gen. A writer REUSING the
    snapshot's generation (a batch run re-passing the same
    --vector-gen, or a legacy-only log followed by a default gen=0
    run) would replay BEFORE the z snapshot and lose to it — the
    "resume reuses its gen" idempotence contract ends at the moment
    the log is compacted. Streaming satisfies the barrier structurally
    (gen = batch_id is monotone across restarts).

    Driver-side and O(index) like load_live_keys — the maintenance
    entry for the bounded dry-run/test seam; a real S3-Vectors-style
    service compacts server-side.
    """
    root = os.path.join(index_dir, index)
    if not os.path.isdir(root):
        return {"live_keys": 0, "files_removed": 0, "snapshot_gen": 0}
    old_names = [n for n in sorted(os.listdir(root)) if n.endswith(".jsonl")]
    live = load_live_keys(index_dir, index)
    snap_gen = max(
        (_replay_order(n)[0] for n in old_names), default=0
    )
    snap_gen = max(snap_gen, 0)  # legacy-only logs snapshot at gen 0
    client = DryRunVectorClient(index_dir)
    keys = sorted(live)  # deterministic snapshot bytes
    written: set[str] = set()
    for seq, i in enumerate(range(0, len(keys), batch_size)):
        entries = []
        for key in keys[i : i + batch_size]:
            e = dict(live[key])
            e["_pid"], e["_seq"], e["_gen"] = 0, seq, snap_gen
            e["_snap"] = True
            entries.append(e)
        client.put_vectors(index, entries)
        written.add(f"g{snap_gen:06d}z_part00000_{seq:05d}.jsonl")
    removed = [n for n in old_names if n not in written]
    for name in removed:  # GC: snapshot already carries the state
        os.unlink(os.path.join(root, name))
    return {
        "live_keys": len(keys),
        "files_removed": len(removed),
        "snapshot_gen": snap_gen,
    }


def load_live_keys(index_dir: str, index: str) -> dict[str, dict]:
    """Replay the dry-run log -> {live key: latest put entry}.

    Replay order is _replay_order: legacy pre-generation files first,
    then generations NUMERICALLY (not lexicographically — streaming
    gens are unbounded batch ids), each generation's compaction
    snapshot ("z" slot) after its plain files. Within a generation
    put/delete key sets are disjoint by the delta contract (module
    doc), so within-gen order is immaterial. Test/report-side helper —
    a real deployment queries the index service instead. Driver-side
    and O(index) by design: only use on bounded test/report indexes.
    """
    root = os.path.join(index_dir, index)
    live: dict[str, dict] = {}
    if not os.path.isdir(root):
        return live
    names = sorted(os.listdir(root), key=_replay_order)
    # apply per generation: puts first or deletes first is equivalent
    # (disjoint within gen) — plain sorted order interleaves them per
    # (pid, seq), which is fine under the same contract
    for name in names:
        if name.endswith(".del.jsonl"):
            with open(os.path.join(root, name), encoding="utf-8") as f:
                for line in f:
                    live.pop(json.loads(line)["key"], None)
        elif name.endswith(".jsonl"):
            with open(os.path.join(root, name), encoding="utf-8") as f:
                for line in f:
                    e = json.loads(line)
                    live[e["key"]] = e
    return live
