"""Trainable quality classifier (engine/ops/classify): convergence
against a pure-numpy reference, separable-data accuracy, pure-codegen
scoring plan, and the CCNet reference-vs-corpus wiring."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from engine.ops.classify import (
    quality_classifier,
    score_logreg,
    train_logreg,
)


def _sep_rows():
    """Two linearly separable stripes in 3 features, deterministic."""
    rows = []
    for i in range(200):
        a = (i * 7 % 13) / 13.0
        b = (i * 11 % 17) / 17.0
        rows.append((i, 2.0 + a, 1.0 + b, a * b, 1))          # class 1
        rows.append((1000 + i, -2.0 - a, -1.0 - b, -a * b, 0))  # class 0
    return rows


@pytest.fixture(scope="module")
def sep(spark):
    return spark.createDataFrame(
        _sep_rows(), "id long, f1 double, f2 double, f3 double, label int"
    ).cache()


def _numpy_reference(rows, max_iter, lr=1.0, l2=1e-4):
    """The exact spec train_logreg implements, sequential numpy."""
    X = np.array([[r[1], r[2], r[3]] for r in rows], dtype=np.float64)
    y = np.array([r[4] for r in rows], dtype=np.float64)
    mu, sd = X.mean(axis=0), X.std(axis=0)
    sd[sd == 0.0] = 1.0
    Xs = (X - mu) / sd
    w, b = np.zeros(3), 0.0
    for _ in range(max_iter):
        p = 1.0 / (1.0 + np.exp(-(Xs @ w + b)))
        r = p - y
        g = Xs.T @ r / len(y) + l2 * w
        gb = r.sum() / len(y)
        w -= lr * g
        b -= lr * gb
    return w, b


def test_train_matches_numpy_reference(sep):
    model = train_logreg(
        sep, ["f1", "f2", "f3"], max_iter=25, tol=0.0
    )
    w_ref, b_ref = _numpy_reference(_sep_rows(), max_iter=25)
    # only float nondeterminism is partial-sum addition order
    assert np.abs(np.array(model["w"]) - w_ref).max() < 1e-8
    assert abs(model["b"] - b_ref) < 1e-8


def test_separable_data_classified_perfectly(sep):
    stats = {}
    model = train_logreg(sep, ["f1", "f2", "f3"], max_iter=100, stats=stats)
    assert stats["n"] == 400 and stats["iters"] >= 1
    scored = score_logreg(sep, model)
    wrong = scored.filter(
        ((F.col("quality_score") >= 0.5) & (F.col("label") == 0))
        | ((F.col("quality_score") < 0.5) & (F.col("label") == 1))
    ).count()
    assert wrong == 0


def test_training_partition_invariant(sep):
    m1 = train_logreg(sep.repartition(2), ["f1", "f2"], max_iter=10, tol=0.0)
    m2 = train_logreg(sep.repartition(7), ["f1", "f2"], max_iter=10, tol=0.0)
    assert np.abs(np.array(m1["w"]) - np.array(m2["w"])).max() < 1e-9


def test_scoring_is_pure_codegen(sep):
    model = train_logreg(sep, ["f1", "f2", "f3"], max_iter=5)
    scored = score_logreg(sep, model)
    plan = scored.sparkSession._jvm.PythonSQLUtils.explainString(
        scored._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan  # no Arrow/Python in scoring


def test_constant_feature_and_validation(sep, spark):
    # a constant feature must not divide-by-zero (sd forced to 1)
    const = sep.withColumn("f4", F.lit(3.0))
    model = train_logreg(const, ["f1", "f4"], max_iter=5)
    assert np.isfinite(model["w"]).all()
    with pytest.raises(ValueError, match="non-empty"):
        train_logreg(sep, [])
    with pytest.raises(ValueError, match="empty training frame"):
        train_logreg(sep.filter("id < 0"), ["f1"])


def test_quality_classifier_separates_rules(spark):
    """CCNet wiring over the real documents table: reference = docs
    the rule screen keeps, corpus = full table. The trained score must
    rank rule-kept docs above rule-rejected ones on average (the model
    learned the screen's signal from raw metrics, without thresholds)."""
    from engine.ops.curate import curate

    docs = spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet"
    ).select("doc_id", "text")
    verdicts = curate(docs)
    ref = docs.join(
        verdicts.filter("keep").select("doc_id"), "doc_id", "semi"
    )
    stats = {}
    model = quality_classifier(docs, ref, max_iter=60, stats=stats)
    assert stats["iters"] >= 1
    scored = score_logreg(verdicts, model, score_name="q")
    means = {
        r["keep"]: r["m"]
        for r in scored.groupBy("keep").agg(F.avg("q").alias("m")).collect()
    }
    assert means[True] > means[False] + 0.1, means


# ---------------------------------------------------------------- #
# fastText-style hashed bag-of-ngrams classifier                    #
# ---------------------------------------------------------------- #

GOODWORDS = (
    "the study presents results from a careful analysis of river "
    "ecosystems and describes methods used across several field sites"
).split()
SPAMWORDS = (
    "click here buy cheap pills winner casino bonus free offer "
    "limited deal subscribe now discount jackpot prize claim"
).split()


def _text_rows(n=120):
    """Vocab-disjoint classes; deterministic word shuffles."""
    rows = []
    for i in range(n):
        g = [GOODWORDS[(i * 5 + j) % len(GOODWORDS)] for j in range(18)]
        s = [SPAMWORDS[(i * 3 + j) % len(SPAMWORDS)] for j in range(18)]
        rows.append((i, " ".join(g), 1))
        rows.append((1000 + i, " ".join(s), 0))
    return rows


@pytest.fixture(scope="module")
def textsep(spark):
    return spark.createDataFrame(
        _text_rows(), "id long, text string, label int"
    ).cache()


def test_hashed_train_matches_numpy_reference(spark, textsep):
    """The distributed training loop == sequential numpy GD over the
    SAME feature arrays (features come from the pinned JVM expression,
    fetched once; this pins the mapInPandas partial/combine path)."""
    from engine.ops.classify import train_hashed_logreg
    from engine.ops.dsir import hashed_feature_col, token_col

    nb, iters, lr, l2 = 4096, 12, 2.0, 1e-6
    feats = [
        (list(r["_fb"]), float(r["label"]))
        for r in textsep.select(
            hashed_feature_col(token_col("text"), nb).alias("_fb"), "label"
        ).collect()
    ]
    w = np.zeros(nb)
    b = 0.0
    n = len(feats)
    mean_l = max(1.0, sum(len(fb) for fb, _ in feats) / n)
    for _ in range(iters):
        g = np.zeros(nb + 1)
        for fb, y in feats:
            a = np.asarray(fb, dtype=np.int64)
            z = b + (w[a].mean() if len(a) else 0.0)
            p = 1.0 / (1.0 + np.exp(-z))
            r = p - y
            if len(a):
                np.add.at(g, a, r / len(a))
            g[nb] += r
        g /= n
        g[:-1] += l2 * w
        w -= lr * mean_l * g[:-1]
        b -= lr * g[-1]

    model = train_hashed_logreg(
        textsep, label_col="label", n_buckets=nb, max_iter=iters,
        lr=lr, l2=l2, tol=0.0,
    )
    assert np.abs(np.asarray(model["w"]) - w).max() < 1e-8
    assert abs(model["b"] - b) < 1e-8


def test_hashed_separates_disjoint_vocab(spark, textsep):
    from engine.ops.classify import score_hashed, train_hashed_logreg

    model = train_hashed_logreg(textsep, label_col="label", max_iter=40)
    got = score_hashed(textsep, model).select("label", "quality_score")
    rows = got.collect()
    pos = [r["quality_score"] for r in rows if r["label"] == 1]
    neg = [r["quality_score"] for r in rows if r["label"] == 0]
    assert min(pos) > 0.8 and max(neg) < 0.2
    # shape-metric models cannot do this: both classes have identical
    # token-length/stopword shape by construction (18 words each)


def test_hashed_training_partition_invariant(spark, textsep):
    from engine.ops.classify import train_hashed_logreg

    m1 = train_hashed_logreg(
        textsep, label_col="label", n_buckets=2048, max_iter=8, tol=0.0
    )
    m2 = train_hashed_logreg(
        textsep.repartition(7), label_col="label", n_buckets=2048,
        max_iter=8, tol=0.0,
    )
    assert np.abs(
        np.asarray(m1["w"]) - np.asarray(m2["w"])
    ).max() < 1e-9
    assert abs(m1["b"] - m2["b"]) < 1e-9


def test_hashed_scoring_is_map_only(spark, textsep):
    from engine.ops.classify import score_hashed, train_hashed_logreg
    from tests.test_plans import plan

    model = train_hashed_logreg(
        textsep, label_col="label", n_buckets=1024, max_iter=2, tol=0.0
    )
    p = plan(score_hashed(textsep, model))
    assert "Exchange" not in p, p


def test_fasttext_quality_pairing(spark, textsep):
    """DCLM wiring: reference=good docs, corpus=spam; the model scores
    unseen good-vocab docs above unseen spam-vocab docs."""
    from engine.ops.classify import fasttext_quality, score_hashed

    ref = textsep.filter("label = 1").select("id", "text")
    cor = textsep.filter("label = 0").select("id", "text")
    model = fasttext_quality(cor, ref, max_iter=40)
    unseen = spark.createDataFrame(
        [
            (1, " ".join(GOODWORDS[5:15])),
            (2, " ".join(SPAMWORDS[5:15])),
        ],
        "id long, text string",
    )
    s = {
        r["id"]: r["quality_score"]
        for r in score_hashed(unseen, model).collect()
    }
    assert s[1] > 0.7 > 0.3 > s[2]


def test_hashed_class_balance_centers_scores(spark):
    """With a 1:4 pos:neg sampling ratio the balanced loss keeps 0.5
    as the class boundary — an unweighted model would calibrate to
    the sampling prior and score everything near 0.2."""
    from engine.ops.classify import score_hashed, train_hashed_logreg

    rows = []
    for i in range(40):
        rows.append((i, " ".join(GOODWORDS[(i % 5):(i % 5) + 10]), 1))
    for i in range(160):
        rows.append((1000 + i, " ".join(SPAMWORDS[(i % 6):(i % 6) + 10]), 0))
    df = spark.createDataFrame(rows, "id long, text string, label int")
    model = train_hashed_logreg(df, label_col="label", max_iter=40)
    got = score_hashed(df, model).select("label", "quality_score").collect()
    pos = [r["quality_score"] for r in got if r["label"] == 1]
    neg = [r["quality_score"] for r in got if r["label"] == 0]
    assert min(pos) > 0.5 > max(neg)
