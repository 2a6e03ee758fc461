"""Corpus-trained Stupid-Backoff LM (engine/ops/lm.py).

The oracle is an independent pure-Python reference implementation of
the same pinned spec (Brants et al. 2007 backoff chain, count-one
unseen floor) — every doc's logppl must match to 1e-9. Plan tests
lock the scale shape: scoring joins broadcast a small model and the
corpus side never shuffles.
"""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from engine.ops.lm import (
    BACKOFF_ALPHA,
    lm_quality_filter,
    score_stupid_backoff,
    train_stupid_backoff,
)

TRAIN = [
    ("t1", "the cat sat on the mat. The cat sat!"),
    ("t2", "the dog sat on the log, and the dog ran."),
    ("t3", "a cat and a dog met on the mat."),
    ("t4", "we trained a tiny model on tiny data."),
    ("t5", ""),  # empty doc in training must be harmless
]

SCORE = [
    ("d1", "the cat sat on the mat."),  # in-domain: low ppl
    ("d2", "zxq vvw qqq zxq unseen gibberish tokens"),  # all-unseen
    ("d3", "the dog"),  # 2 tokens: uni + bi positions only
    ("d4", "mat"),  # 1 token
    ("d5", ""),  # 0 tokens -> NULL logppl
    ("d6", "the cat ran on a log and we met"),  # mixed seen/backoff
]


def _tok(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _ref_model(rows, min_count=2):
    c1, c2, c3 = {}, {}, {}
    for _i, text in rows:
        toks = _tok(text)
        for t in toks:
            c1[t] = c1.get(t, 0) + 1
        for i in range(len(toks) - 1):
            b = " ".join(toks[i : i + 2])
            c2[b] = c2.get(b, 0) + 1
        for i in range(len(toks) - 2):
            t = " ".join(toks[i : i + 3])
            c3[t] = c3.get(t, 0) + 1
    n = sum(c1.values())
    m2 = {b: v for b, v in c2.items() if v >= min_count}
    m3 = {t: v for t, v in c3.items() if v >= min_count}
    return c1, c2, c3, m2, m3, n


def _ref_logppl(text, model, alpha=BACKOFF_ALPHA):
    c1, c2, c3, m2, m3, n = model
    toks = _tok(text)
    if not toks:
        return None
    nlls = []
    for p in range(len(toks)):
        s1 = c1.get(toks[p], 0) / n if toks[p] in c1 else 1.0 / n
        bi = " ".join(toks[p - 1 : p + 1]) if p >= 1 else None
        s2 = (
            m2[bi] / c1[bi.split(" ")[0]]
            if bi is not None and bi in m2
            else alpha * s1
        )
        tri = " ".join(toks[p - 2 : p + 1]) if p >= 2 else None
        s3 = (
            m3[tri] / c2[" ".join(tri.split(" ")[:2])]
            if tri is not None and tri in m3
            else alpha * s2
        )
        score = s3 if tri is not None else (s2 if bi is not None else s1)
        nlls.append(-math.log(score))
    return sum(nlls) / len(nlls)


@pytest.fixture(scope="module")
def lm(spark):
    docs = spark.createDataFrame(TRAIN, ["doc_id", "text"])
    return train_stupid_backoff(docs, min_count=2)


def test_train_counts_match_reference(spark, lm):
    c1, c2, c3, m2, m3, n = _ref_model(TRAIN)
    assert lm.n_tokens == n
    got1 = {r["uni"]: r["count1"] for r in lm.m1.collect()}
    assert got1 == c1
    got2 = {r["bi"]: (r["count2"], r["ctx1_count"]) for r in lm.m2.collect()}
    assert got2 == {b: (v, c1[b.split(" ")[0]]) for b, v in m2.items()}
    got3 = {r["tri"]: (r["count3"], r["ctx2_count"]) for r in lm.m3.collect()}
    assert got3 == {
        t: (v, c2[" ".join(t.split(" ")[:2])]) for t, v in m3.items()
    }


def test_scores_match_reference(spark, lm):
    model = _ref_model(TRAIN)
    docs = spark.createDataFrame(SCORE, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_scored"], r["logppl"])
        for r in score_stupid_backoff(docs, lm).collect()
    }
    assert set(got) == {d for d, _ in SCORE}  # empty doc keeps its row
    for doc_id, text in SCORE:
        want = _ref_logppl(text, model)
        n_scored, logppl = got[doc_id]
        assert n_scored == len(_tok(text))
        if want is None:
            assert logppl is None
        else:
            assert logppl == pytest.approx(want, abs=1e-9), doc_id


def test_in_domain_scores_below_gibberish(spark, lm):
    docs = spark.createDataFrame(SCORE, ["doc_id", "text"])
    got = {r["doc_id"]: r["logppl"] for r in score_stupid_backoff(docs, lm).collect()}
    assert got["d1"] < got["d2"]


def test_quality_filter_verdicts(spark, lm):
    docs = spark.createDataFrame(SCORE, ["doc_id", "text"])
    model = _ref_model(TRAIN)
    cut = _ref_logppl(SCORE[0][1], model) + 1e-6  # just above d1
    out = {
        r["doc_id"]: r["lm_keep"]
        for r in lm_quality_filter(docs, lm, max_logppl=cut).collect()
    }
    assert out["d1"] is True
    assert out["d2"] is False  # gibberish above the cut
    assert out["d5"] is False  # empty doc never keeps
    assert len(out) == len(SCORE)  # filter annotates, never drops rows


def test_scoring_plan_broadcasts_model(spark, lm, tmp_path):
    """Production shape: the trained model is materialized to parquet
    and replayed for scoring. The corpus side of scoring must not
    shuffle — the model is broadcast (3 BroadcastHashJoins) and no
    SortMergeJoin appears anywhere in the scoring plan."""
    from engine.ops.lm import load_lm, save_lm
    from tests.test_plans import plan

    save_lm(lm, str(tmp_path / "lm"))
    lm_rd = load_lm(spark, str(tmp_path / "lm"))
    docs = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("the cat sat on doc "), F.col("id")).alias("text"),
    )
    p = plan(score_stupid_backoff(docs, lm_rd))
    assert "SortMergeJoin" not in p, p
    assert p.count("BroadcastHashJoin") >= 3, p


def test_model_roundtrip_scores_identical(spark, lm, tmp_path):
    from engine.ops.lm import load_lm, save_lm

    save_lm(lm, str(tmp_path / "lm2"))
    lm_rd = load_lm(spark, str(tmp_path / "lm2"))
    docs = spark.createDataFrame(SCORE, ["doc_id", "text"])
    a = {r["doc_id"]: r["logppl"] for r in score_stupid_backoff(docs, lm).collect()}
    b = {r["doc_id"]: r["logppl"] for r in score_stupid_backoff(docs, lm_rd).collect()}
    assert a == b


def test_curate_job_lm_filter(spark, tmp_path):
    """jobs/curate.py --lm-filter: the perplexity screen rejects with
    reason lm_ppl at the configured percentile of the kept slice."""
    import types

    from jobs.curate import run

    out = str(tmp_path / "curated_lm")
    res = run(
        types.SimpleNamespace(
            input="/root/testdata/sf0.001/documents.parquet",
            output=out,
            min_tokens=5,
            no_check_lang=True,
            lm_filter=True,
            lm_pct=50.0,  # aggressive cut so lm_ppl definitely fires
        )
    )
    assert res["docs"] == res["kept"] + res["rejected"]
    assert res["lm_cut_logppl"] is not None
    assert res["reasons"].get("lm_ppl", 0) > 0
    rej = spark.read.parquet(f"{out}/rejected")
    # ~half the rule-kept slice lands above its own median logppl
    n_lm = rej.filter(F.array_contains("reasons", "lm_ppl")).count()
    assert n_lm >= res["docs"] * 0.25
    # determinism: the same input yields the same cut
    res2 = run(
        types.SimpleNamespace(
            input="/root/testdata/sf0.001/documents.parquet",
            output=str(tmp_path / "curated_lm2"),
            min_tokens=5,
            no_check_lang=True,
            lm_filter=True,
            lm_pct=50.0,
        )
    )
    assert res2["lm_cut_logppl"] == res["lm_cut_logppl"]
    assert res2["kept"] == res["kept"]


def test_ppl_buckets_head_middle_tail(spark, lm):
    from engine.ops.lm import ppl_buckets

    docs = spark.createDataFrame(SCORE, ["doc_id", "text"])
    scored = score_stupid_backoff(docs, lm)
    out = {r["doc_id"]: r["ppl_bucket"] for r in ppl_buckets(scored).collect()}
    assert out["d5"] is None  # empty doc: NULL logppl -> NULL bucket
    assert out["d1"] == "head"  # most in-domain text
    assert out["d2"] == "tail"  # gibberish
    vals = [v for v in out.values() if v is not None]
    assert set(vals) <= {"head", "middle", "tail"}
    # thirds over 5 scored docs: every bucket non-empty
    assert {"head", "middle", "tail"} == set(vals)


def test_empty_model_raises(spark):
    docs = spark.createDataFrame([("e1", "")], ["doc_id", "text"])
    lm0 = train_stupid_backoff(docs)
    with pytest.raises(ValueError):
        score_stupid_backoff(docs, lm0)
