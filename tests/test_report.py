"""jobs/report.py — corpus-card JSON over a documents table."""

from __future__ import annotations

import json
import os
import types

import pytest


@pytest.fixture(scope="module")
def spark():
    from engine.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=4)


def _args(inp, out=None, **kw):
    return types.SimpleNamespace(input=inp, output=out, **kw)


def test_report_numbers_exact(spark, tmp_path):
    from jobs.report import run

    rows = [
        (0, "alpha beta gamma delta", "en", "http://big.com/a"),
        (1, "alpha beta gamma delta", "en", "http://big.com/b"),  # exact dup
        (2, "five words here right now", "en", "http://big.com/c"),
        (3, "uno dos tres", "es", "http://small.org/x"),
        (4, "", "es", None),
    ]
    p = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, url string"
    ).write.parquet(p)

    out = str(tmp_path / "card.json")
    rep = run(_args(p, out, master="local[4]", shuffle_partitions=4))

    assert rep["totals"]["docs"] == 5
    # quality_metrics n_tokens: 4 + 4 + 5 + 3 + 0
    assert rep["totals"]["tokens"] == 16
    assert rep["dup_rate"] == pytest.approx(1 / 5)
    assert rep["lang_mix"]["en"]["docs"] == 3
    assert rep["lang_mix"]["es"]["doc_share"] == pytest.approx(0.4)
    # host falls back to parse_url(url) when no host column exists
    hosts = {h["host"]: h for h in rep["hosts"]["top"]}
    assert hosts["big.com"]["docs"] == 3
    assert "small.org" in hosts and "unknown" in hosts
    assert 0 < rep["hosts"]["top1pct_token_share"] <= 1.0
    assert rep["length"]["p50"] >= 1
    # every advertised quality metric actually lands on the card — a
    # name drifting from quality_metrics' columns must fail here, not
    # silently vanish (review r3)
    from jobs.report import MEAN_METRICS

    assert set(rep["quality"]) == set(MEAN_METRICS)
    assert rep["quality"]["mean_token_len"] > 0
    # lang_mix token counts reconcile with totals (same pinned
    # tokenizer): 4+4+5 en, 3+0 es
    assert rep["lang_mix"]["en"]["tokens"] == 13
    assert rep["lang_mix"]["es"]["tokens"] == 3

    # the card on disk equals the returned dict
    with open(out) as f:
        assert json.load(f) == rep


def test_report_minimal_schema(spark, tmp_path):
    """No lang, no url, no host: the card degrades to totals/length/
    quality/dup_rate without crashing."""
    from jobs.report import run

    p = str(tmp_path / "docs2")
    spark.createDataFrame(
        [(i, f"word {i} filler text") for i in range(10)],
        "doc_id long, text string",
    ).write.parquet(p)
    before = set(os.listdir(tmp_path))
    rep = run(_args(p, master="local[4]", shuffle_partitions=4))
    assert rep["totals"]["docs"] == 10
    assert rep["dup_rate"] == 0.0
    assert "lang_mix" not in rep and "hosts" not in rep
    # nothing written without --output
    assert set(os.listdir(tmp_path)) == before


def test_top_ngrams_audit(spark, tmp_path):
    """--top-ngrams: the most-duplicated n-grams land on the card with
    exact counts and deterministic tie order; off by default."""
    from jobs.report import run

    rows = (
        [(i, "the same boiler plate line", ) for i in range(5)]
        + [(10 + i, "another repeated phrase here",) for i in range(3)]
        + [(20, "entirely unique content words",)]
    )
    p = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(p)

    rep = run(
        _args(p, master="local[4]", shuffle_partitions=4,
              top_ngrams=2, ngram_n=4)
    )
    got = rep["top_ngrams"]
    assert got["n"] == 4
    # 5-gram docs yield two 4-grams each (5 occurrences apiece);
    # deterministic tie-break is lexicographic on the gram
    assert got["top"][0] == {"gram": "same boiler plate line", "count": 5}
    assert got["top"][1] == {"gram": "the same boiler plate", "count": 5}

    rep2 = run(_args(p, master="local[4]", shuffle_partitions=4))
    assert "top_ngrams" not in rep2
