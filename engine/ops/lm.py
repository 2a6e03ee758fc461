"""Corpus-trained n-gram language-model scoring for quality filtering.

CCNet (Wenzek et al. 2019) filters web text by the perplexity of a
language model; this op trains that model ON the corpus itself (or a
trusted reference slice of it) with nothing but Spark aggregations, so
no external model artifact is needed. Smoothing is Stupid Backoff
(Brants et al. 2007, "Large Language Models in Machine Translation") —
the smoothing published FOR MapReduce-scale distributed LMs precisely
because it needs no normalization pass: training is pure counting
(one explode + one groupBy = the canonical word-count shape, map-side
partial aggregation all the way), and scoring is a coalesce cascade.

Scale shape (SURVEY.md §2 extension; the 100-TB story):
  * train: corpus -> n-gram explode -> groupBy(gram) count. The only
    corpus-sized shuffle is the count groupBy, which combines map-side;
    the context-count joins that follow are MODEL-sized, not
    corpus-sized. `min_count` pruning bounds the model (contexts are
    counted before pruning, so denominators stay exact).
  * score: per-position (tri, bi, uni) gram strings are built INSIDE
    an array transform before exploding — the token array is never
    duplicated across exploded rows. Three equi-joins against the
    model follow; the model is small after pruning, so AQE picks
    broadcast joins and the corpus never shuffles (asserted in
    tests/test_lm.py). With a model too big to broadcast the same
    plan degrades to shuffled hash joins keyed on the gram — still
    never corpus x corpus.

Everything is pyspark.sql built-ins (whole-stage codegen); there is no
Python UDF anywhere in this module. Scores are deterministic functions
of (corpus, order, min_count, alpha) — no RNG, no iteration order.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame, functions as F

BACKOFF_ALPHA = 0.4  # Brants et al. 2007's pinned backoff factor


class NGramLM(NamedTuple):
    """Trained Stupid-Backoff trigram model.

    m1: (uni, count1)                    — unigram counts
    m2: (bi, count2, ctx1_count)         — bigram + its context count
    m3: (tri, count3, ctx2_count)        — trigram + its context count
    n_tokens: total training tokens (unigram denominator)
    """

    m1: DataFrame
    m2: DataFrame
    m3: DataFrame
    n_tokens: int


def lm_tokens(text_col: str | Column) -> Column:
    """Lowercased \\p{L}\\p{N} token array (JVM split, codegen)."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.split(F.lower(F.coalesce(col, F.lit(""))), r"[^\p{L}\p{N}]+")
    return F.filter(toks, lambda t: t != "")


def _grams(toks: Column, n: int) -> Column:
    """Array of space-joined n-gram strings of `toks` (empty if the
    doc is shorter than n tokens — sequence() cannot run backwards).

    `toks` MUST be a materialized column reference, never the raw
    lm_tokens(...) expression: the lambda body references it per array
    element, and higher-order functions re-evaluate non-attribute
    subtrees per element — an O(tokens^2) split+filter blowup that
    measured as a multi-minute hang on ~4k-token docs (callers below
    project tokens in a select first)."""
    if n == 1:
        return toks
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def train_stupid_backoff(
    docs: DataFrame, text_col: str = "text", min_count: int = 2
) -> NGramLM:
    """Count 1/2/3-grams and attach context counts.

    min_count prunes rare 2/3-grams from the MODEL (bounding its size
    — the knob that keeps a 100-TB-corpus model broadcastable), but
    context denominators are joined from the UNPRUNED counts first, so
    every surviving gram's score is exact. Unigrams are never pruned:
    they are the backstop of the backoff chain.
    """
    # project the token array ONCE; _grams lambdas must see a column
    # reference, not the split+filter expression (see _grams docstring)
    toked = docs.select(lm_tokens(text_col).alias("_toks"))
    toks = F.col("_toks")

    # ONE corpus pass and ONE shuffle for all three orders: tag every
    # gram with its order inside an array concat, explode once, count
    # once. (Three separate explode+groupBy chains would scan the
    # corpus three more times than necessary at 100 TB.) The counts
    # table is model-sized; localCheckpoint marks the materialization
    # seam — at 10^12 docs write it to storage instead (save_lm).
    def tag(arr: Column, order: int) -> Column:
        return F.transform(
            arr,
            lambda g: F.struct(
                F.lit(order).cast("int").alias("n"), g.alias("gram")
            ),
        )

    all_grams = F.concat(
        tag(toks, 1), tag(_grams(toks, 2), 2), tag(_grams(toks, 3), 3)
    )
    counts = (
        toked.select(F.explode(all_grams).alias("g"))
        .groupBy(F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    c1 = counts.filter("n = 1").select(
        F.col("gram").alias("uni"), F.col("cnt").alias("count1")
    )
    c2 = counts.filter("n = 2").select(
        F.col("gram").alias("bi"), F.col("cnt").alias("count2")
    )
    c3 = counts.filter("n = 3").select(
        F.col("gram").alias("tri"), F.col("cnt").alias("count3")
    )
    n_tokens = c1.agg(F.sum("count1").alias("n")).collect()[0]["n"] or 0
    # context counts: first (n-1) space-separated fields of the gram.
    # These joins are model x model (post-aggregation), not corpus-
    # sized. Inner join is total: a bigram's first word is by
    # construction a counted unigram of the same corpus.
    m2 = (
        c2.withColumn("_ctx", F.substring_index("bi", " ", 1))
        .join(c1.select(F.col("uni").alias("_ctx"), F.col("count1").alias("ctx1_count")), "_ctx")
        .filter(F.col("count2") >= min_count)
        .select("bi", "count2", "ctx1_count")
    )
    m3 = (
        c3.withColumn("_ctx", F.substring_index("tri", " ", 2))
        .join(c2.select(F.col("bi").alias("_ctx"), F.col("count2").alias("ctx2_count")), "_ctx")
        .filter(F.col("count3") >= min_count)
        .select("tri", "count3", "ctx2_count")
    )
    return NGramLM(m1=c1, m2=m2, m3=m3, n_tokens=int(n_tokens))


def save_lm(lm: NGramLM, path: str) -> None:
    """Persist the model as three parquet tables + a meta row. Train
    once, score many runs — scoring a 100-TB corpus should replay a
    materialized model, not recompute the count joins per query."""
    lm.m1.write.mode("overwrite").parquet(f"{path}/m1")
    lm.m2.write.mode("overwrite").parquet(f"{path}/m2")
    lm.m3.write.mode("overwrite").parquet(f"{path}/m3")
    spark = lm.m1.sparkSession
    spark.createDataFrame(
        [(int(lm.n_tokens),)], "n_tokens long"
    ).write.mode("overwrite").parquet(f"{path}/meta")


def load_lm(spark, path: str) -> NGramLM:
    n = spark.read.parquet(f"{path}/meta").collect()[0]["n_tokens"]
    return NGramLM(
        m1=spark.read.parquet(f"{path}/m1"),
        m2=spark.read.parquet(f"{path}/m2"),
        m3=spark.read.parquet(f"{path}/m3"),
        n_tokens=int(n),
    )


def _position_grams(toks: Column) -> Column:
    """Per-position struct(tri, bi, uni): the longest grams ENDING at
    each position (null where the doc start leaves too little
    context). Built inside one array transform so the token array is
    materialized once per doc, not once per exploded row."""
    return F.transform(
        F.sequence(F.lit(1), F.size(toks)),  # 1-based positions
        lambda p: F.struct(
            F.when(
                p >= 3,
                F.concat_ws(
                    " ",
                    F.element_at(toks, p - 2),
                    F.element_at(toks, p - 1),
                    F.element_at(toks, p),
                ),
            ).alias("tri"),
            F.when(
                p >= 2,
                F.concat_ws(" ", F.element_at(toks, p - 1), F.element_at(toks, p)),
            ).alias("bi"),
            F.element_at(toks, p).alias("uni"),
        ),
    )


def score_stupid_backoff(
    docs: DataFrame,
    lm: NGramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = BACKOFF_ALPHA,
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-doc Stupid-Backoff log-perplexity under `lm`.

    Score of the token at position p (1-based):
      S3 = count3/ctx2_count          if its trigram survived pruning
         | alpha * S2                 otherwise
      S2 = count2/ctx1_count          if its bigram survived
         | alpha * S1                 otherwise
      S1 = count1/N | 1/N             (unseen word: count-one floor)
    Positions 1 and 2 use S1 / S2 directly (shorter context available
    is not a back-off, so no alpha penalty).

    Returns (id_col, n_scored, logppl, ppl); docs with zero tokens
    keep a row with n_scored=0 and NULL logppl/ppl (explode_outer).
    logppl = mean over positions of -ln(score); ppl = exp(logppl).
    """
    if lm.n_tokens <= 0:
        raise ValueError("empty language model (n_tokens == 0)")
    n = float(lm.n_tokens)
    # same materialization rule as training: the per-position lambda
    # reads the token array via element_at, so it must be a column
    toked = docs.select(F.col(id_col), lm_tokens(text_col).alias("_toks"))
    toks = F.col("_toks")
    feats = F.when(F.size(toks) >= 1, _position_grams(toks)).otherwise(
        F.array().cast(
            "array<struct<tri:string,bi:string,uni:string>>"
        )
    )
    pos = toked.select(
        F.col(id_col), F.explode_outer(feats).alias("g")
    ).select(
        id_col,
        F.col("g.tri").alias("tri"),
        F.col("g.bi").alias("bi"),
        F.col("g.uni").alias("uni"),
    )
    # a min_count-pruned model is broadcastable by design (that is the
    # knob's job); broadcast_model=False degrades to shuffled hash
    # joins keyed on the gram for models that outgrow the driver —
    # still never corpus x corpus.
    b = F.broadcast if broadcast_model else (lambda d: d)
    joined = (
        pos.join(b(lm.m3), "tri", "left")
        .join(b(lm.m2), "bi", "left")
        .join(b(lm.m1), "uni", "left")
    )
    s1 = F.coalesce(F.col("count1") / n, F.lit(1.0) / n)
    s2 = F.when(
        F.col("count2").isNotNull(), F.col("count2") / F.col("ctx1_count")
    ).otherwise(alpha * s1)
    s3 = F.when(
        F.col("count3").isNotNull(), F.col("count3") / F.col("ctx2_count")
    ).otherwise(alpha * s2)
    score = (
        F.when(F.col("tri").isNotNull(), s3)
        .when(F.col("bi").isNotNull(), s2)
        .otherwise(s1)
    )
    per_pos = joined.select(
        id_col,
        F.when(F.col("uni").isNotNull(), -F.log(score)).alias("nll"),
    )
    return per_pos.groupBy(id_col).agg(
        F.count("nll").alias("n_scored"),
        F.avg("nll").alias("logppl"),
        F.exp(F.avg("nll")).alias("ppl"),
    )


def ppl_buckets(
    scored: DataFrame,
    cuts: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    logppl_col: str = "logppl",
) -> DataFrame:
    """CCNet's head/middle/tail split: bucket docs by the corpus-wide
    percentile of their log-perplexity (head = most fluent third under
    the model). Two exact-percentile scalars (one small agg;
    percentile_approx is the disclosed swap at 10^12 rows), then a
    map-only CASE — no shuffle of the docs. NULL logppl -> NULL
    bucket."""
    lo, hi = cuts
    if not 0.0 < lo < hi < 1.0:
        raise ValueError(f"cuts must satisfy 0 < lo < hi < 1, got {cuts}")
    row = scored.agg(
        F.expr(f"percentile({logppl_col}, {lo})").alias("lo"),
        F.expr(f"percentile({logppl_col}, {hi})").alias("hi"),
    ).collect()[0]
    if row["lo"] is None:
        return scored.withColumn("ppl_bucket", F.lit(None).cast("string"))
    return scored.withColumn(
        "ppl_bucket",
        F.when(F.col(logppl_col).isNull(), F.lit(None).cast("string"))
        .when(F.col(logppl_col) <= float(row["lo"]), F.lit("head"))
        .when(F.col(logppl_col) <= float(row["hi"]), F.lit("middle"))
        .otherwise(F.lit("tail")),
    )


def lm_quality_filter(
    docs: DataFrame,
    lm: NGramLM,
    max_logppl: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 1,
) -> DataFrame:
    """docs + (n_scored, logppl, ppl, lm_keep): CCNet-style verdict.

    lm_keep is true iff the doc scored at least `min_tokens` positions
    AND its logppl is at or below `max_logppl` (high perplexity under
    a corpus-trained model = gibberish / boilerplate / wrong-language
    text). Join back on id_col so callers keep their full row."""
    scored = score_stupid_backoff(docs, lm, text_col=text_col, id_col=id_col)
    verdict = scored.withColumn(
        "lm_keep",
        (F.col("n_scored") >= min_tokens) & (F.col("logppl") <= max_logppl),
    )
    return docs.join(verdict, id_col, "left").withColumn(
        "lm_keep", F.coalesce(F.col("lm_keep"), F.lit(False))
    )
