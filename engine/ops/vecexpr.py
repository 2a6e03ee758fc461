"""Shared pure-JVM vector expressions (dot, norm, cosine).

One implementation, one place (the engine/ops/kmeans.py rule): the
exact-cosine re-rank appears in semantic dedup (engine/ops/semdedup),
trained-IVF search (engine/ops/kmeans.ivf_topk) and the persistent ANN
index job (jobs/ann.py) — review r3 found three drifting copies, one
of which lacked the zero-norm guard. All three now call here.

Every expression is built from zip_with / transform / aggregate over
array<double|float> columns, so it stays inside whole-stage codegen —
no Python, no UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot_expr(a, b) -> Column:
    """Dot product of two array columns — pure JVM."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sqnorm_expr(a) -> Column:
    """Squared L2 norm of an array column — pure JVM."""
    return F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    )


def norm_expr(a) -> Column:
    """L2 norm of an array column — pure JVM."""
    return F.sqrt(sqnorm_expr(a))


def cosine_expr(a, b) -> Column:
    """Exact cosine between two array columns, pure JVM. Zero-norm
    vectors yield NULL, never NaN (NaN sorts ABOVE every number in
    Spark and would poison downstream top-k / threshold filters)."""
    denom = norm_expr(a) * norm_expr(b)
    return F.when(denom > 0.0, dot_expr(a, b) / denom)
