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


def test_card_delta_pure():
    """card_delta is driver-side JSON math — pinned without Spark."""
    from jobs.report import card_delta

    new = {
        "totals": {"docs": 120, "tokens": 5000, "chars": 30000},
        "quality": {"stopword_ratio": 0.21, "symbol_ratio": 0.02},
        "dup_rate": 0.01,
        "lang_mix": {
            "en": {"docs": 100, "doc_share": 0.8333, "tokens": 4000},
            "fr": {"docs": 20, "doc_share": 0.1667, "tokens": 1000},
        },
        "hosts": {"n_hosts": 40, "top1pct_token_share": 0.30, "top": []},
    }
    old = {
        "totals": {"docs": 100, "tokens": 4200, "chars": 25000},
        "quality": {"stopword_ratio": 0.25, "symbol_ratio": 0.02},
        "dup_rate": 0.03,
        "lang_mix": {
            "en": {"docs": 90, "doc_share": 0.9, "tokens": 4000},
            "de": {"docs": 10, "doc_share": 0.1, "tokens": 200},
        },
        "hosts": {"n_hosts": 35, "top1pct_token_share": 0.42, "top": []},
    }
    d = card_delta(new, old)
    assert d["totals"] == {"docs": 20.0, "tokens": 800.0, "chars": 5000.0}
    assert d["quality"]["stopword_ratio"] == -0.04
    assert d["quality"]["symbol_ratio"] == 0.0
    assert d["dup_rate"] == -0.02
    assert d["lang_doc_share"]["en"] == round(0.8333 - 0.9, 6)
    assert d["lang_doc_share"]["de"] == -0.1      # removed lang -> -share
    assert d["lang_doc_share"]["fr"] == 0.1667    # added lang -> +share
    assert d["langs_added"] == ["fr"] and d["langs_removed"] == ["de"]
    assert d["top1pct_token_share"] == -0.12
    assert d["n_hosts"] == 5


def test_report_compare_end_to_end(spark, tmp_path):
    """--compare: the card carries the baseline card and exact deltas
    (new corpus dropped a dup and gained a doc)."""
    from jobs.report import run

    old_rows = [
        (0, "alpha beta gamma delta", "en"),
        (1, "alpha beta gamma delta", "en"),  # dup
        (2, "uno dos tres cuatro", "es"),
    ]
    new_rows = [
        (0, "alpha beta gamma delta", "en"),
        (2, "uno dos tres cuatro", "es"),
        (3, "cinco seis siete ocho", "es"),
        (4, "more english words here", "en"),
    ]
    po, pn = str(tmp_path / "old"), str(tmp_path / "new")
    ddl = "doc_id long, text string, lang string"
    spark.createDataFrame(old_rows, ddl).write.parquet(po)
    spark.createDataFrame(new_rows, ddl).write.parquet(pn)

    rep = run(
        _args(pn, None, compare=po, master="local[4]", shuffle_partitions=4)
    )
    assert rep["compare"]["baseline"] == po
    d = rep["compare"]["delta"]
    assert d["totals"]["docs"] == 1.0
    assert d["dup_rate"] == round(0.0 - 1 / 3, 6)
    assert rep["compare"]["baseline_card"]["totals"]["docs"] == 3
    # es doc share rose from 1/3 to 2/4
    assert d["lang_doc_share"]["es"] == round(0.5 - 1 / 3, 6)


def test_report_compare_cross_format_and_card(spark, tmp_path):
    """ADVICE r3: the baseline keeps its OWN layout — a jsonl input
    compares against a prior parquet corpus via --compare-format, and
    --compare-format card diffs against a prior card JSON with no
    Spark re-read of the baseline at all."""
    import gzip

    from jobs.report import run

    ddl = "doc_id long, text string"
    old_rows = [
        (0, "alpha beta gamma delta"),
        (1, "alpha beta gamma delta"),  # dup
        (2, "uno dos tres cuatro"),
    ]
    po = str(tmp_path / "old_parquet")
    spark.createDataFrame(old_rows, ddl).write.parquet(po)

    # the new crawl arrives as gzip JSONL (public-corpus layout)
    pn = tmp_path / "new_jsonl"
    pn.mkdir()
    new_rows = [
        {"doc_id": 0, "text": "alpha beta gamma delta"},
        {"doc_id": 3, "text": "cinco seis siete ocho"},
    ]
    with gzip.open(pn / "part-000.jsonl.gz", "wt") as f:
        for r in new_rows:
            f.write(json.dumps(r) + "\n")

    rep = run(
        _args(
            str(pn),
            None,
            input_format="jsonl",
            input_schema=ddl,
            compare=po,
            compare_format="parquet",
            master="local[4]",
            shuffle_partitions=4,
        )
    )
    assert rep["totals"]["docs"] == 2
    assert rep["compare"]["baseline_card"]["totals"]["docs"] == 3
    assert rep["compare"]["delta"]["totals"]["docs"] == -1.0
    assert rep["compare"]["delta"]["dup_rate"] == round(0.0 - 1 / 3, 6)

    # card mode: baseline is the prior card JSON itself
    card_path = str(tmp_path / "old_card.json")
    with open(card_path, "w") as f:
        json.dump(rep["compare"]["baseline_card"], f)
    rep2 = run(
        _args(
            str(pn),
            None,
            input_format="jsonl",
            input_schema=ddl,
            compare=card_path,
            compare_format="card",
            master="local[4]",
            shuffle_partitions=4,
        )
    )
    assert rep2["compare"]["delta"] == rep["compare"]["delta"]


def test_top_ngrams_min_count_two_pass(spark, tmp_path):
    """VERDICT r3 #8: --ngram-min-count pre-filters on a hash-bucket
    count so the wide gram-text shuffle is survivor-sized. Same top-k
    output as the single-pass audit on the test corpus; the plan
    shows the hash pre-agg + (budget-gated) broadcast semi-join
    BETWEEN the explode and the final text groupBy exchange."""
    from jobs.report import run, top_ngrams_df

    rows = (
        [(i, "the same boiler plate line") for i in range(5)]
        + [(10 + i, "another repeated phrase here") for i in range(3)]
        + [(20, "entirely unique content words")]
    )
    p = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(p)

    one = run(
        _args(p, master="local[4]", shuffle_partitions=4,
              top_ngrams=2, ngram_n=4)
    )
    two = run(
        _args(p, master="local[4]", shuffle_partitions=4,
              top_ngrams=2, ngram_n=4, ngram_min_count=3)
    )
    assert two["top_ngrams"] == one["top_ngrams"]

    # plan shape: explode (Generate) feeds the semi-join against the
    # hash survivors, and only the JOINED side reaches the final
    # groupBy("g") text exchange. Formatted explain prints the tree
    # root-first, so the final wide exchange must appear ABOVE the
    # join, and the join ABOVE (at least one) Generate.
    from tests.test_plans import plan

    docs = spark.read.parquet(p)
    q = top_ngrams_df(docs, n=4, k=2, min_count=3)
    ptxt = plan(q)
    assert "xxhash64" in ptxt, ptxt
    # the final text exchange partitions on g (details section)
    assert "hashpartitioning(g" in ptxt, ptxt
    tree = ptxt.split("\n\n")[0]
    assert "BroadcastHashJoin LeftSemi" in tree, tree
    i_join = tree.index("BroadcastHashJoin")
    i_gen = tree.rindex("Generate")  # pass-2 explode (deepest)
    assert i_join < i_gen, tree
    # the final wide exchange sits above the join in the root-first
    # tree — i.e. only JOINED survivors reach it
    i_exch = tree.index("Exchange")
    assert i_exch < i_join, tree

    # too-high min_count truncates, never reorders (the contract)
    short = top_ngrams_df(docs, n=4, k=2, min_count=6).collect()
    assert short == []
