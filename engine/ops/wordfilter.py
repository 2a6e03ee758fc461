"""Banned-word content screen (the C4 discipline, Raffel et al. 2020:
pages containing any term from a configured blocklist are dropped from
the training corpus). The engine ships NO list — the screen is policy
made runnable, and the list is the caller's policy artifact (C4 used a
public community-maintained one); tests pin semantics with synthetic
terms.

Semantics (pinned):
  * single-word terms match lowercased, punctuation-stripped TOKENS —
    "Assess" never matches a banned "ass" (C4's word-boundary rule);
  * multi-word terms match as lowercase substrings on token
    boundaries (phrase rule);
  * counts and a doc verdict come back as audit COLUMNS (the
    urlfilter discipline — this op never drops rows; callers screen
    on `word_keep` or wire `banned_hits` into curate's rule engine).

Scale shape: ONE map-only pass, pure JVM expressions. The list enters
the plan as a literal array/pattern (fine to a few thousand terms —
the C4 list is ~400); beyond that, explode tokens and broadcast-join
the list instead (one ids-only shuffle back per doc), which
`banned_hits_joined` provides for completeness.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# token normalization shared by both match paths: lowercase, strip
# everything but letters/digits from the token edges and interior
# (C4 matched bare words)
_STRIP_RE = r"[^\p{L}\p{N}]"


def _norm_tokens(text: Column) -> Column:
    toks = F.split(F.lower(F.coalesce(text, F.lit(""))), r"\s+")
    return F.filter(
        F.transform(toks, lambda t: F.regexp_replace(t, _STRIP_RE, "")),
        lambda t: t != F.lit(""),
    )


def screen_banned_words(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    max_hits: int = 0,
) -> DataFrame:
    """docs + terms -> docs + (banned_hits int, word_keep boolean).

    `terms`: the policy list (words and/or multi-word phrases),
    matched per the module contract. Terms are run through the SAME
    normalization as document tokens (lowercase, non-letter/digit
    chars stripped per word) — real policy lists are full of
    punctuated entries ("x-rated"), and an unnormalized term could
    never match a normalized token (review r3). A term that
    normalizes to nothing is skipped. `max_hits`: a doc stays kept
    while banned_hits <= max_hits (C4 used 0)."""

    def _norm_term_word(w: str) -> str:
        return "".join(ch for ch in w.lower() if ch.isalnum())

    words, phrases = set(), set()
    for t in terms:
        parts = [p for p in (_norm_term_word(w) for w in t.split()) if p]
        if len(parts) == 1:
            words.add(parts[0])
        elif parts:
            phrases.add(" ".join(parts))
    words, phrases = sorted(words), sorted(phrases)

    toks = _norm_tokens(F.col(text_col))
    hits = F.lit(0)
    if words:
        word_arr = F.array(*[F.lit(w) for w in words])
        hits = hits + F.size(
            F.filter(toks, lambda t: F.array_contains(word_arr, t))
        )
    if phrases:
        # token-boundary phrase match: normalize the doc to the same
        # token stream the word rule sees, then count occurrences
        padded = F.concat(F.lit(" "), F.concat_ws(" ", toks), F.lit(" "))
        for p in phrases:
            norm_p = " ".join(p.split())
            hits = hits + F.regexp_count(
                padded, F.lit("(?<= )" + _re_quote(norm_p) + "(?= )")
            )
    return docs.withColumn("banned_hits", hits.cast("int")).withColumn(
        "word_keep", F.col("banned_hits") <= F.lit(int(max_hits))
    )


def _re_quote(s: str) -> str:
    import re

    return re.escape(s)


def banned_hits_joined(
    docs: DataFrame,
    terms_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    term_col: str = "term",
) -> DataFrame:
    """(id, hits) for LARGE single-word lists (beyond literal-array
    scale): explode normalized tokens, broadcast-join the term table,
    count per doc — one ids-only shuffle, text never moves. Phrase
    terms are not supported on this path (use screen_banned_words)."""
    toks = docs.select(
        F.col(id_col), F.explode(_norm_tokens(F.col(text_col))).alias("_tok")
    )
    terms = (
        terms_df.select(
            F.regexp_replace(
                F.lower(F.trim(F.col(term_col))), _STRIP_RE, ""
            ).alias("_tok")
        )
        .filter(F.col("_tok") != "")
        .distinct()
    )
    hits = (
        toks.join(F.broadcast(terms), "_tok")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("int").alias("banned_hits"))
    )
    return docs.select(id_col).distinct().join(hits, id_col, "left").select(
        F.col(id_col),
        F.coalesce("banned_hits", F.lit(0)).alias("banned_hits"),
    )
