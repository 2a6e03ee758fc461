"""jobs/corpus.py — orchestrated crawl -> training-corpus build with
per-stage manifest resume."""

from __future__ import annotations

import json
import os
import types

import pytest

from engine.corpus import gen_pages_df


@pytest.fixture(scope="module")
def pages_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("corpusjob") / "pages")
    gen_pages_df(spark, 200).write.mode("overwrite").parquet(path)
    return path


def _args(pages, out, **kw):
    return types.SimpleNamespace(pages=pages, output=out, **kw)


def _stage_mtimes(out):
    tables = ["extracted", "canonical", "cleaned", "curate/kept", "final"]
    return {
        t: os.path.getmtime(os.path.join(out, t, "_SUCCESS")) for t in tables
    }


def test_full_build_and_resume(spark, tmp_path, pages_path):
    from jobs.corpus import run

    out = str(tmp_path / "corpus")
    res = run(_args(pages_path, out, min_tokens=5, sample_fraction=0.5))

    st = res["stages"]
    assert set(st) == {"extract", "neardup", "linedup", "curate", "sample"}
    # accounting: each stage can only shrink the corpus
    assert st["extract"]["rows"] >= st["neardup"]["rows"]
    assert st["neardup"]["rows"] == st["linedup"]["rows"]  # rewrite keeps rows
    assert st["linedup"]["rows"] >= st["curate"]["rows"]
    assert st["curate"]["rows"] >= st["sample"]["rows"]
    assert st["sample"]["rows"] > 0
    final = spark.read.parquet(f"{out}/final")
    assert final.count() == st["sample"]["rows"]
    assert "text" in final.columns and "url" in final.columns

    # manifest on disk matches the returned stages
    with open(f"{out}/corpus_manifest.json") as f:
        assert json.load(f)["stages"] == st

    # full resume: every stage skips — no output is rewritten
    before = _stage_mtimes(out)
    res2 = run(_args(pages_path, out, min_tokens=5, sample_fraction=0.5, resume=True))
    assert _stage_mtimes(out) == before
    assert {k: v["rows"] for k, v in res2["stages"].items()} == {
        k: v["rows"] for k, v in st.items()
    }


def test_partial_resume_recomputes_only_missing_stages(spark, tmp_path, pages_path):
    from jobs.corpus import run

    out = str(tmp_path / "corpus2")
    res = run(_args(pages_path, out, min_tokens=5, sample_fraction=0.5))
    before = _stage_mtimes(out)

    # simulate a crash after stage 3: drop curate+sample from the manifest
    mpath = f"{out}/corpus_manifest.json"
    with open(mpath) as f:
        m = json.load(f)
    for s in ("curate", "sample"):
        del m["stages"][s]
    with open(mpath, "w") as f:
        json.dump(m, f)

    res2 = run(_args(pages_path, out, min_tokens=5, sample_fraction=0.5, resume=True))
    after = _stage_mtimes(out)
    # stages 1-3 untouched, 4-5 rebuilt
    for t in ("extracted", "canonical", "cleaned"):
        assert after[t] == before[t], t
    for t in ("curate/kept", "final"):
        assert after[t] > before[t], t
    # deterministic pipeline: recomputed stages land on the same rows
    assert {k: v["rows"] for k, v in res2["stages"].items()} == {
        k: v["rows"] for k, v in res["stages"].items()
    }
