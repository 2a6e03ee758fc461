"""Exact-substring deduplication — remove verbatim token runs of
length >= w that occur more than once in the corpus (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better",
arXiv:2107.06499 — their ExactSubstr screen, published at w=50).

Where this sits in the dedup family (engine/ops):
  * dedup.py       — whole-doc near-dup (MinHash/SimHash candidates)
  * linedup.py     — repeated LINES rewritten out (fixed boundaries)
  * semdedup.py    — paraphrase-level (embedding space)
  * THIS           — verbatim runs at ANY token offset: quotes, syndicated
                     paragraphs, licence blocks, template prose — dup text
                     that straddles line boundaries and so survives linedup.

Spark-first formulation. The paper builds a corpus-wide suffix array
(single machine, O(total tokens)); the equivalent relational shape is
rolling w-token window hashes: a token run of length >= w is duplicated
iff every w-window inside it is duplicated, and any single w-window
occurring twice IS a duplicated w-token run — so
window-hash -> groupBy -> count >= 2 detects exactly the published
predicate (modulo 128-bit md5 collisions; at 10^12 windows a 64-bit
key would already suffer ~10^4 birthday false-merges, same argument as
linedup.py).

Plan shape (never all-pairs, text never shuffles on the hot path):

    windows      map-only: split -> transform/sequence -> md5 slices,
                 exploded to (id, pos, h) — JVM codegen, no Python
    verdicts     ONE groupBy(h): (count, min(struct(id, pos))) —
                 map-side combinable, so a licence block occurring 10^9
                 times still reduces to one row per partition pre-shuffle
    removable    windows equi-join verdicts on h (count >= 2, winner
                 exempt under keep="one"), projected to (id, pos)
    per-doc      groupBy(id) of removable POSITIONS only (ints)
    rewrite      docs left-join the affected-doc position lists (AQE
                 broadcasts when the affected set is small — the common
                 case — and falls back to a shuffle join when not, the
                 decontaminate.py discipline) -> ONE Arrow-batched
                 pandas UDF rebuilds text with a numpy difference-array
                 coverage mask, O(tokens + removals) per doc

Pinned semantics (tests/test_substrdedup.py vs a pure-Python reference):
  * tokenization is trim + split(r"\\s+") — the SAME JVM expression
    builds the windows and feeds the rewrite UDF, so there is no
    Python/JVM tokenizer mismatch by construction.
  * keep="one": for each window hash the minimum (id, pos) occurrence
    is exempt; the corpus-wide first copy of a duplicated run survives.
    Winner exemption is PER-WINDOW: when the same w-gram's occurrences
    straddle docs with different continuations, a non-global-min doc
    can keep only part of a span — deterministic, and the removed set
    is always a subset of duplicated text (precision is exact either
    way). keep="none" removes every occurrence (the paper tool's
    default behaviour).
  * a doc with NO removals round-trips byte-identically. Affected docs
    are rebuilt by joining surviving tokens with single spaces —
    whitespace inside rewritten docs is normalized (disclosed; the
    C4-style trade of token-level rewrites).
  * within-doc repeats count: the same run twice in one doc keeps the
    earlier occurrence under keep="one".
  * docs shorter than w tokens never participate (no window exists).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

DEFAULT_W = 50  # Lee et al. 2022's published threshold

_REWRITE_DDL = "text string, n_tokens int, n_tokens_removed int"


def _window_structs(toks, w: int):
    """array<struct<pos:int,h:string>> of md5 over every w-token
    window (pos is 0-based token index); empty when < w tokens."""
    k = F.size(toks)
    return F.when(
        k >= w,
        F.transform(
            F.sequence(F.lit(1), k - (w - 1)),
            lambda i: F.struct(
                (i - 1).cast("int").alias("pos"),
                F.md5(F.concat_ws(" ", F.slice(toks, i, w))).alias("h"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,h:string>>"))


def _rewrite_udf(w: int):
    @pandas_udf(_REWRITE_DDL)
    def rewrite(
        text: pd.Series, toks: pd.Series, rm: pd.Series
    ) -> pd.DataFrame:
        out_text, out_k, out_r = [], [], []
        for t, tk, ps in zip(text, toks, rm):
            tk = [] if tk is None else list(tk)
            k = len(tk)
            if ps is None or len(ps) == 0:
                out_text.append(t)  # untouched docs round-trip verbatim
                out_k.append(k)
                out_r.append(0)
                continue
            delta = np.zeros(k + 1, dtype=np.int64)
            ps = np.asarray(ps, dtype=np.int64)
            np.add.at(delta, ps, 1)
            np.add.at(delta, np.minimum(ps + w, k), -1)
            covered = np.cumsum(delta[:k]) > 0
            out_text.append(
                " ".join(tok for tok, c in zip(tk, covered) if not c)
            )
            out_k.append(k)
            out_r.append(int(covered.sum()))
        return pd.DataFrame(
            {
                "text": out_text,
                "n_tokens": pd.array(out_k, dtype="int32"),
                "n_tokens_removed": pd.array(out_r, dtype="int32"),
            }
        )

    return rewrite


def dedup_substrings(
    docs: DataFrame,
    w: int = DEFAULT_W,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep: str = "one",
) -> DataFrame:
    """Rewrite text_col with duplicated >=w-token runs removed.

    Returns the input columns (text_col rewritten) plus n_tokens and
    n_tokens_removed; every input row survives. keep="one" exempts the
    corpus-wide minimum (id, pos) occurrence per window; keep="none"
    removes all occurrences.
    """
    if keep not in ("one", "none"):
        raise ValueError(f"keep must be one|none, got {keep!r}")
    if w < 2:
        raise ValueError(f"w must be >= 2, got {w}")
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")

    # token array MATERIALIZED in its own projection before the window
    # lambda reads it via slice (the lm.py:_position_grams / dsir.py
    # discipline): handing _window_structs the raw split expression
    # makes the transform lambda re-tokenize the WHOLE doc once per
    # window position — an O(tokens^2) interpreted-eval blowup that
    # turned a 2k-doc corpus stage into a multi-minute straggler.
    # CollapseProject cannot inline the alias back: split is non-cheap
    # and _window_structs references _toks three times (plan-pinned in
    # tests/test_substrdedup.py::test_window_scan_tokenizes_once).
    wins = (
        docs.select(F.col(id_col).alias("_id"), toks.alias("_toks"))
        .select(
            "_id", F.explode(_window_structs(F.col("_toks"), w)).alias("_w")
        )
        .select("_id", F.col("_w.pos").alias("_pos"), F.col("_w.h").alias("h"))
    )

    verdicts = wins.groupBy("h").agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.min(F.struct(F.col("_id"), F.col("_pos"))).alias("_win"),
    )
    dup = verdicts.filter(F.col("_cnt") >= 2)

    removable = wins.join(dup, "h")
    if keep == "one":
        removable = removable.filter(
            ~(
                (F.col("_win._id") == F.col("_id"))
                & (F.col("_win._pos") == F.col("_pos"))
            )
        )
    rm = removable.groupBy("_id").agg(
        F.sort_array(F.collect_list("_pos")).alias("_rm")
    )

    rewritten = (
        docs.join(rm, F.col(id_col) == F.col("_id"), "left")
        .drop("_id")
        .withColumn("_out", _rewrite_udf(w)(F.col(text_col), toks, "_rm"))
        .withColumn(text_col, F.col("_out.text"))
        .withColumn("n_tokens", F.col("_out.n_tokens"))
        .withColumn("n_tokens_removed", F.col("_out.n_tokens_removed"))
        .drop("_rm", "_out")
    )
    return rewritten
