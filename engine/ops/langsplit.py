"""Paragraph-level language ID + majority-language rewrite (CCNet,
Wenzek et al. 2019 §4.3: language is decided per paragraph, because
crawled pages routinely embed a second language — nav chrome, quoted
sources, comment sections — that a doc-level guess either mislabels
or lets pollute a monolingual corpus).

Builds on the pinned doc-level guesser (engine/kernels/langid.py,
SURVEY §2 A15); this op adds the paragraph granularity and the
rewrite:

  lang_major   word-count-weighted majority language over paragraphs
  lang_frac    the majority's share of language-attributed words
  lang_mixed   True when a minority language holds >= mixed_frac
  text_major   the doc rewritten to majority-language paragraphs only
               ('und' paragraphs — numbers, code, punctuation — carry
               no language evidence and stay with the majority)

Scale shape: ONE map-only Arrow pass (the langid kernel is pure
Python, so this is a pandas UDF by necessity, batched per Arrow
batch); no shuffle, text never moves (plan-asserted). A doc whose
paragraphs all agree round-trips text_major byte-identically.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from engine.kernels.langid import guess_lang

_RESULT_DDL = (
    "lang_major string, lang_frac double, lang_mixed boolean, "
    "text_major string"
)


def _split_one(text: str, sep: str, mixed_frac: float):
    paras = (text or "").split(sep)
    weights: dict[str, int] = {}
    tags = []
    for p in paras:
        lang = guess_lang(p)
        tags.append(lang)
        if lang != "und":
            weights[lang] = weights.get(lang, 0) + len(p.split())
    if not weights:  # nothing attributable: whole doc is 'und'
        return ("und", 0.0, False, text or "")
    total = sum(weights.values())
    # deterministic winner: weight desc, then tag asc
    major = sorted(weights.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
    frac = weights[major] / total
    kept = [p for p, t in zip(paras, tags) if t in (major, "und")]
    return (major, frac, (1.0 - frac) >= mixed_frac, sep.join(kept))


def split_languages(
    docs: DataFrame,
    text_col: str = "text",
    sep: str = "\n",
    mixed_frac: float = 0.1,
) -> DataFrame:
    """docs -> docs + (lang_major, lang_frac, lang_mixed, text_major).
    One map-only Arrow pass; see module docstring for semantics."""

    @F.pandas_udf(_RESULT_DDL)
    def _split(texts: pd.Series) -> pd.DataFrame:
        rows = [_split_one(t, sep, mixed_frac) for t in texts]
        return pd.DataFrame(
            rows,
            columns=["lang_major", "lang_frac", "lang_mixed", "text_major"],
        )

    s = _split(F.col(text_col))
    return (
        docs.withColumn("_ls", s)
        .withColumn("lang_major", F.col("_ls.lang_major"))
        .withColumn("lang_frac", F.col("_ls.lang_frac"))
        .withColumn("lang_mixed", F.col("_ls.lang_mixed"))
        .withColumn("text_major", F.col("_ls.text_major"))
        .drop("_ls")
    )


def filter_language(
    docs: DataFrame,
    lang: str,
    min_frac: float = 0.5,
    text_col: str = "text",
    rewrite: bool = True,
) -> DataFrame:
    """The monolingual-slice builder: keep docs whose majority language
    is `lang` with at least min_frac of attributed words; rewrite=True
    also swaps text for the majority-paragraph rewrite (dropping the
    embedded-minority paragraphs CCNet screens out)."""
    out = split_languages(docs, text_col=text_col)
    out = out.filter(
        (F.col("lang_major") == F.lit(lang))
        & (F.col("lang_frac") >= F.lit(float(min_frac)))
    )
    if rewrite:
        out = out.withColumn(text_col, F.col("text_major"))
    return out.drop("text_major")
