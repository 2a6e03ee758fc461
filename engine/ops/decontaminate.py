"""Benchmark decontamination: flag training docs that overlap an
evaluation set by n-gram collision (the standard 13-gram screen).

Scale shape: the probe side (benchmark suites — thousands of docs) is
tiny next to the corpus, so its distinct n-gram hashes BROADCAST; the
corpus side explodes to (doc_id, ngram_hash) map-side and the
broadcast hash join + partial count never shuffles the corpus. All
n-gram construction is JVM expressions (split / sequence / slice /
xxhash64 inside whole-stage codegen) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_N = 13


def _tokens(text_col: str) -> Column:
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def ngram_hash_col(toks: Column, n: int = DEFAULT_N) -> Column:
    """array<long> of xxhash64 over the word n-grams of a token-array
    column (lowercase whitespace tokens — `_tokens`). Texts shorter
    than n tokens hash their full token run (so exact short-answer
    probes still match).

    `toks` MUST be a MATERIALIZED token-array column (select
    `_tokens(...)` first — the lm.py/substrdedup.py discipline): the
    window lambda references it per array element, and higher-order
    functions re-evaluate non-attribute subtrees per element, so a raw
    split expression here re-tokenizes the whole doc once per n-gram
    position — O(tokens^2) on the CORPUS side of the screen
    (plan-pinned in tests/test_decontaminate.py)."""
    k = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(k - (n - 1), F.lit(1)))
    return F.transform(
        starts,
        lambda i: F.xxhash64(
            F.concat_ws(" ", F.slice(toks, i, F.least(F.lit(n), k)))
        ),
    )


def probe_hashes(
    probes: DataFrame, text_col: str = "text", n: int = DEFAULT_N
) -> DataFrame:
    """Benchmark texts -> distinct n-gram hash table (one `h` column).
    Materialize this once per eval suite and reuse across runs."""
    return (
        probes.select(_tokens(text_col).alias("_toks"))
        .select(F.explode(ngram_hash_col(F.col("_toks"), n)).alias("h"))
        .distinct()
    )


def contamination_screen(
    docs: DataFrame,
    probes: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    probe_text_col: str = "text",
    n: int = DEFAULT_N,
    adaptive_n: bool = True,
    min_n: int = 2,
) -> DataFrame:
    """docs + probe set -> (id, n_hits, contaminated).

    n_hits counts the doc's n-gram positions that collide with any
    probe n-gram; contaminated = n_hits > 0. The probe hash table is
    broadcast, so the corpus-side plan is explode -> broadcast hash
    join -> partial count: the corpus never shuffles.

    adaptive_n (default on): when the probe set contains texts shorter
    than n tokens, BOTH sides drop to n_eff = shortest probe length.
    Without it a short benchmark answer embedded inside a long training
    doc is never flagged — the corpus side emits only full n-grams, so
    a k<n-token probe can only match a doc whose ENTIRE token run
    equals it (ADVICE r2). The trade-off is disclosed, not hidden:
    shorter grams mean more (possibly benign) collisions, so
    contaminated counts are an over- rather than under-estimate.
    Computing n_eff costs one action over the probe table, which is
    thousands of rows per eval suite — never corpus-scale.

    n_eff is floored at min_n (default 2) and DEGENERATE probes
    (fewer than min_n tokens: empty strings, lone words) are ignored
    when computing it — otherwise one bad probe row would collapse
    the whole screen to unigram matching and flag essentially every
    doc. Degenerate probes still participate in matching via their
    full-token-run hash (they can only match a doc whose entire run
    equals them), so they are safe, just not allowed to set n_eff.
    """
    n_eff = n
    if adaptive_n:
        tok_count = F.size(
            F.split(F.lower(F.trim(F.col(probe_text_col))), r"\s+")
        )
        shortest = (
            probes.select(tok_count.alias("_tc"))
            .filter(F.col("_tc") >= int(min_n))
            .agg(F.min("_tc"))
            .first()[0]
        )
        if shortest is not None:
            n_eff = max(int(min_n), min(n, int(shortest)))
    ph = F.broadcast(probe_hashes(probes, probe_text_col, n_eff))
    grams = docs.select(
        F.col(id_col), _tokens(text_col).alias("_toks")
    ).select(
        F.col(id_col), F.explode(ngram_hash_col(F.col("_toks"), n_eff)).alias("h")
    )
    hits = grams.join(ph, "h").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    # hits holds only CONTAMINATED docs — usually a sliver of the
    # corpus, but its size is input-dependent (boilerplate overlapping
    # probe n-grams can blow it up), so no forced broadcast here: AQE
    # picks broadcast when hits is actually small and falls back to a
    # shuffle join when it is not, instead of OOMing the driver
    # (ADVICE r2).
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
        )
        .withColumn("contaminated", F.col("n_hits") > 0)
    )
