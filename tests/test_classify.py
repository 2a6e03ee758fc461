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
