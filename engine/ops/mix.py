"""Training-mix shaping: domain (host) token-share rebalancing and
deterministic train/val/test splits with a near-dup leakage guard
(SURVEY §2 training-data extensions; composes engine/ops/sample.py's
hash-Bernoulli discipline and engine/ops/dedup.py's candidate pairs).

Domain rebalancing caps any one host at `max_share` of the corpus's
tokens — the standard guard against a handful of mega-sites (wikis,
forges, link farms) dominating a pretraining mix. Deterministic:
every keep/drop decision is a pure function of (doc id, salt), never
an RNG.

100-TB shape: one groupBy(host) agg computes per-host token totals;
only OVER-CAP hosts (a tiny set by construction — at most
1/max_share rows) are broadcast back as keep-fractions, and the
corpus is filtered map-only. The corpus itself is never shuffled.
The optional exact pass adds a per-host prefix-cumsum window, run
ONLY on the over-cap hosts' pre-thinned survivors (~cap tokens per
host), so the window partition is bounded by the cap, not by the
host's raw size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_DENOM = 1 << 30  # same hash-fraction resolution as engine/ops/sample.py

# exact-mode rebalancing: hosts with at most this many docs skip the
# Bernoulli pre-thin (the cumsum window sees every row), and larger
# hosts' pre-thin never keeps fewer than this many docs in expectation
_EXACT_PRETHIN_MIN = 4096


def host_token_shares(
    docs: DataFrame, host_col: str = "host", token_col: str = "n_tokens"
) -> DataFrame:
    """Per-host token totals + share of corpus: (host, host_tokens,
    n_docs, share). One hash agg; the cross-join of the scalar total
    is a broadcast of one row."""
    per_host = docs.groupBy(F.col(host_col).alias("host")).agg(
        F.sum(F.col(token_col).cast("long")).alias("host_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    total = per_host.agg(F.sum("host_tokens").alias("corpus_tokens"))
    return per_host.crossJoin(F.broadcast(total)).select(
        "host",
        "host_tokens",
        "n_docs",
        (F.col("host_tokens") / F.col("corpus_tokens")).alias("share"),
    )


def rebalance_domains(
    docs: DataFrame,
    max_share: float,
    host_col: str = "host",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    salt: str = "mix",
    exact: bool = False,
) -> DataFrame:
    """Downsample docs of hosts whose token share exceeds `max_share`
    (of the ORIGINAL corpus total — one-shot, not a fixed point, so
    the result is a deterministic pure function of the input).

    Default mode keeps each over-cap host's docs with probability
    cap_tokens/host_tokens via the hash-Bernoulli rule (map-only after
    the stats agg; expected tokens == cap, sampling error O(1/sqrt(n))
    over the cap's doc count). `exact=True` additionally orders each
    over-cap host's SURVIVORS by (hash, id) and keeps the longest
    prefix with cumulative tokens <= cap, at the cost of one window
    over the already-thinned survivors. The cap is a hard MAXIMUM
    unconditionally; filling it is guaranteed for hosts that skip the
    pre-thin (n_docs <= _EXACT_PRETHIN_MIN — the window sees every
    doc) and holds with overwhelming probability otherwise: the
    pre-thin keeps >= max(1.5x the tokens the cap needs, ~4096 docs)
    in expectation, so undershooting the cap requires the Bernoulli
    sample to fall 33% below its mean over thousands of draws. Docs
    INDIVIDUALLY larger than cap_tokens are excluded before the
    cumsum (they can never sit inside a hard cap, and left in they
    would block every smaller doc behind them in hash order); a host
    whose every doc exceeds the cap therefore keeps no docs — the cap
    semantics, not a sampling accident. A doc that fits the cap but
    not the REMAINING budget still ends the prefix (a first-fit rule
    would skip it and keep filling; the prefix rule is kept for its
    single-window determinism and can undershoot the cap by up to
    that one doc's size — never overshoot)."""
    if not 0.0 < max_share <= 1.0:
        raise ValueError(f"max_share {max_share} outside (0, 1]")
    shares = host_token_shares(docs, host_col, token_col)
    corpus_tokens = F.col("host_tokens") / F.col("share")  # scalar, exact
    over = shares.filter(F.col("share") > max_share).select(
        "host",
        "n_docs",
        (F.lit(max_share) * corpus_tokens / F.col("host_tokens")).alias("keep_frac"),
        (F.lit(max_share) * corpus_tokens).cast("long").alias("cap_tokens"),
    )
    if exact:
        # Pre-thin only when it provably leaves enough survivors to
        # fill the cap: small over-cap hosts (few, large docs — where
        # a fixed Bernoulli slack CAN zero the host) window all their
        # rows instead, and huge hosts keep >= _EXACT_PRETHIN_MIN
        # expected docs AND >= 1.5x the cap's tokens in expectation.
        # The window partition stays bounded either way.
        bern = F.when(
            F.col("n_docs") <= F.lit(_EXACT_PRETHIN_MIN), F.lit(1.0)
        ).otherwise(
            F.least(
                F.lit(1.0),
                F.greatest(
                    F.col("keep_frac") * 1.5,
                    F.lit(float(_EXACT_PRETHIN_MIN)) / F.col("n_docs"),
                ),
            )
        )
    else:
        bern = F.col("keep_frac")
    bucket = F.pmod(F.xxhash64(F.col(id_col).cast("string"), F.lit(salt)), F.lit(_DENOM))
    joined = docs.join(
        F.broadcast(over), docs[host_col] == over["host"], "left"
    ).drop(over["host"])
    kept = joined.filter(
        F.col("keep_frac").isNull() | (bucket < (bern * _DENOM).cast("long"))
    )
    drop_cols = ("keep_frac", "cap_tokens", "n_docs")
    if not exact:
        return kept.drop(*drop_cols)
    # window ONLY the over-cap hosts' pre-thinned survivors (~cap
    # tokens per host); under-cap hosts bypass the exchange entirely
    under = kept.filter(F.col("cap_tokens").isNull()).drop(*drop_cols)
    w = (
        Window.partitionBy(F.col(host_col))
        .orderBy(bucket.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    overk = (
        kept.filter(F.col("cap_tokens").isNotNull())
        # a doc alone bigger than the cap can NEVER be inside it — drop
        # it before the cumsum so it cannot block every smaller doc
        # behind it in hash order (one early 65k-token doc under a 60k
        # cap would otherwise zero the whole host)
        .filter(F.col(token_col).cast("long") <= F.col("cap_tokens"))
        .withColumn("_cum", F.sum(F.col(token_col).cast("long")).over(w))
        .filter(F.col("_cum") <= F.col("cap_tokens"))
        .drop(*drop_cols, "_cum")
    )
    return under.unionByName(overk)


def temperature_mix(
    docs: DataFrame,
    alpha: float,
    group_col: str = "lang",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    salt: str = "temp",
    min_group_tokens: int = 0,
) -> DataFrame:
    """Temperature-based source mixing (the multilingual-pretraining
    rule, Conneau & Lample 2019 / XLM-R): resample so group token
    shares follow q_i ∝ p_i^alpha — alpha<1 flattens the mix toward
    uniform (low-resource groups gain relative weight), alpha=1 is a
    no-op, alpha=0 targets exactly uniform.

    DOWNSAMPLE-ONLY construction (a curation engine drops rows, never
    duplicates them): keep_frac_i = (q_i/p_i) / max_j(q_j/p_j), so the
    group with the largest boost ratio is kept whole and every other
    group is thinned to land the target RATIOS exactly in expectation;
    the corpus shrinks by the normalizing factor — the price of not
    upsampling, disclosed. Upsampling (epoch repetition of small
    groups) is a training-loader concern, fed by the `keep_frac`
    mechanics here if needed.

    `min_group_tokens`: groups below this token count are kept whole
    AND excluded from the normalizer. Without it, one singleton group
    (a stray lang tag) has the largest boost ratio at alpha<1, becomes
    the kept-whole reference, and crushes every real group's keep
    fraction — measured on the corpus job: a 117-doc corpus with one
    tiny lang group kept 11 docs. The floor is the published rule's
    "languages with enough data" precondition, made explicit.

    Scale shape (the rebalance_domains discipline): one groupBy(group)
    stats agg over ids+tokens; targets and the max-ratio normalizer
    are two more aggs over the GROUP-sized frame (#langs/#sources —
    tiny); keep fractions broadcast back; the corpus itself is
    filtered MAP-ONLY via the hash-Bernoulli rule (pure function of
    (id, salt) — reproducible at any partitioning, never an RNG).
    Null group values form their own group.
    """
    if alpha < 0:
        raise ValueError(f"alpha {alpha} must be >= 0")
    g = F.coalesce(F.col(group_col).cast("string"), F.lit("\x00null"))
    shares = (
        docs.groupBy(g.alias("_g"))
        .agg(F.sum(F.col(token_col).cast("long")).alias("_gtok"))
        .withColumn(
            "_share",
            F.col("_gtok")
            / F.sum("_gtok").over(Window.partitionBy(F.lit(1))),
        )
    )
    # q_i ∝ p_i^alpha; ratio_i = q_i / p_i up to a constant that the
    # max-normalization cancels, so the unnormalized share^(alpha-1)
    # suffices
    ratios = shares.withColumn(
        "_ratio", F.pow(F.col("_share"), F.lit(float(alpha) - 1.0))
    ).withColumn(
        # zero-token groups (empty-text docs under a stray tag) would
        # make share^(alpha-1) = Infinity at alpha<1 and zero every
        # real group's keep fraction — they carry no weight, so treat
        # them like floor groups: kept whole, out of the normalizer
        # (review r3)
        "_small",
        (F.col("_gtok") < F.lit(int(min_group_tokens)))
        | (F.col("_gtok") <= 0),
    )
    norm = F.max(F.when(~F.col("_small"), F.col("_ratio"))).over(
        Window.partitionBy(F.lit(1))
    )
    ratios = ratios.withColumn(
        "_keep",
        F.when(F.col("_small") | norm.isNull(), F.lit(1.0)).otherwise(
            F.col("_ratio") / norm
        ),
    ).select("_g", "_keep")
    bucket = F.pmod(
        F.xxhash64(F.col(id_col).cast("string"), F.lit(salt)), F.lit(_DENOM)
    )
    return (
        docs.join(F.broadcast(ratios), g == F.col("_g"), "left")
        .filter(
            F.col("_keep").isNull()  # unseen group (impossible) -> keep
            | (bucket < (F.col("_keep") * _DENOM).cast("long"))
        )
        .drop("_g", "_keep")
    )


def assign_splits(
    docs: DataFrame,
    weights: dict[str, float],
    key_col: str = "host",
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test labeling: the hash bucket of
    `key_col` picks the split, so the assignment survives re-runs,
    re-partitioning, and incremental re-crawls. Keying on HOST (the
    default) keeps every page of a site in one split — the cheap
    structural guard against near-dup leakage across splits; pass
    id_col to split at document granularity instead. Map-only."""
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError(f"invalid split weights {weights}")
    tot = sum(weights.values())
    if abs(tot - 1.0) > 1e-9:
        raise ValueError(f"split weights sum to {tot}, expected 1.0")
    bucket = F.pmod(F.xxhash64(F.col(key_col).cast("string"), F.lit(salt)), F.lit(_DENOM))
    expr, acc = None, 0.0
    items = sorted(weights.items())
    for name, w in items[:-1]:
        acc += w
        cond = bucket < int(acc * _DENOM)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return docs.withColumn(split_col, expr)


def split_leakage(
    pairs: DataFrame,
    labeled: DataFrame,
    id_col: str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """Near-dup pairs whose two sides landed in DIFFERENT splits —
    the eval-contamination audit. `pairs` is any (doc_a, doc_b) frame
    (e.g. minhash_candidate_pairs); `labeled` carries (id, split).
    Two equi-joins against the (small) id->split projection; at scale
    the projection is far smaller than the corpus and the joins are
    shuffle-on-id, never corpus x corpus."""
    lab = labeled.select(F.col(id_col).alias("_id"), F.col(split_col).alias("_sp"))
    a = lab.withColumnRenamed("_id", "doc_a").withColumnRenamed("_sp", "split_a")
    b = lab.withColumnRenamed("_id", "doc_b").withColumnRenamed("_sp", "split_b")
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
    )
