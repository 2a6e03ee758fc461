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
    """put_vectors -> one JSONL file per request, deterministic bytes."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir

    def put_vectors(self, index: str, entries: list[dict]) -> None:
        os.makedirs(os.path.join(self.index_dir, index), exist_ok=True)
        pid, seq = entries[0]["_pid"], entries[0]["_seq"]
        path = os.path.join(
            self.index_dir, index, f"part{pid:05d}_{seq:05d}.jsonl"
        )
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            for e in entries:
                e = {k: v for k, v in e.items() if not k.startswith("_")}
                f.write(json.dumps(e, sort_keys=True) + "\n")
        os.replace(tmp, path)  # atomic: rerun overwrites, never interleaves


def sink_vectors(
    vectors: DataFrame,
    index: str,
    index_dir: str,
    batch_size: int = DEFAULT_BATCH_SIZE,
    client_factory=None,
    meta_cols: list[str] | None = None,
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
