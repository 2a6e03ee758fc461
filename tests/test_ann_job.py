"""ANN index job (jobs/ann.py): cell-partitioned layout on disk,
partition-pruned probe scans, exact-mode equivalence with the ivf_topk
operator, and ADC querying over the compact PQ index."""

from __future__ import annotations

import os
import types

import numpy as np
import pytest
from pyspark.sql import functions as F

EMB = "/root/testdata/sf0.01/embeddings.parquet"


def _args(**kw):
    import argparse

    d = dict(master="local[4]", shuffle_partitions=4)
    d.update(kw)
    return types.SimpleNamespace(**d)


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    import jobs.ann as ann

    out = str(tmp_path_factory.mktemp("ann") / "idx")
    res = ann.run(
        _args(
            cmd="build",
            input=EMB,
            output=out,
            cells=8,
            pq_m=8,
            pq_k=16,
            store_vectors=True,
        )
    )
    assert res["vectors"] == 500 and res["nonempty_cells"] >= 2
    return out


def test_index_is_cell_partitioned(index_dir):
    dirs = [
        d for d in os.listdir(os.path.join(index_dir, "index"))
        if d.startswith("cell=")
    ]
    assert len(dirs) >= 2  # physical layout IS the index


def test_query_exact_matches_ivf_operator(spark, index_dir, tmp_path):
    """Job exact mode == engine.ops.kmeans.ivf_topk on the SAME
    codebook (job keeps self-hits; operator called with
    exclude_self=False to match)."""
    import jobs.ann as ann
    from engine.ops.kmeans import ivf_topk

    e = spark.read.parquet(EMB)
    q_path = str(tmp_path / "queries")
    e.filter("vec_id < 4").select("vec_id", "embedding").write.parquet(q_path)

    res = ann.run(
        _args(
            cmd="query",
            output=index_dir,
            queries=q_path,
            topk=5,
            nprobe=2,
            mode="exact",
        )
    )
    assert res["queries"] == 4 and res["results"] == 20
    got = {
        (r["qid"], r["vec_id"])
        for r in spark.read.parquet(f"{index_dir}/results").collect()
    }
    C = np.array(
        [
            r["centroid"]
            for r in spark.read.parquet(f"{index_dir}/codebooks/ivf")
            .orderBy("cid")
            .collect()
        ]
    )
    q = e.filter("vec_id < 4").select(F.col("vec_id").alias("qid"), "embedding")
    exp = {
        (r["qid"], r["vec_id"])
        for r in ivf_topk(
            e, q, C, topk=5, nprobe=2, exclude_self=False
        ).collect()
    }
    assert got == exp


def test_query_scan_is_partition_pruned(spark, index_dir):
    """The probe filter must reach the parquet scan as a PARTITION
    filter on cell — reading nprobe/cells of the index is the entire
    point of the layout."""
    idx = spark.read.parquet(os.path.join(index_dir, "index")).filter(
        F.col("cell").isin([0, 1])
    )
    plan = idx.sparkSession._jvm.PythonSQLUtils.explainString(
        idx._jdf.queryExecution(), "formatted"
    )
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and any("cell" in ln for ln in pf), plan


def test_query_adc_runs_on_codes(spark, index_dir, tmp_path):
    import jobs.ann as ann

    e = spark.read.parquet(EMB)
    q_path = str(tmp_path / "queries")
    e.filter("vec_id in (7, 9)").select("vec_id", "embedding").write.parquet(
        q_path
    )
    res = ann.run(
        _args(
            cmd="query",
            output=index_dir,
            queries=q_path,
            topk=3,
            nprobe=3,
            mode="adc",
        )
    )
    assert res["results"] == 6
    rows = spark.read.parquet(f"{index_dir}/results").collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["qid"], []).append(r["score"])
    assert set(per_q) == {7, 9}
    # ADC scores are negative squared distances: self should rank top
    # (distance ~ its own quantization error, minimal)
    top7 = max(rows, key=lambda r: (r["qid"] == 7, r["score"]))
    assert top7["vec_id"] == 7
