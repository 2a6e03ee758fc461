"""Training-corpus curation: quality metrics + filter verdicts.

Everything except language-ID is built-in pyspark.sql.functions — the
metrics run inside whole-stage codegen on the JVM, so curation adds
zero Python crossings beyond the one langid Arrow UDF (and that one is
skippable via check_lang=False). Metrics attach via withColumns, never
a join: the whole operator is map-only — no shuffle, no state — which
is the shape that matters at 100 TB.

Heuristics follow the public web-corpus-curation playbook (C4/Gopher-
style length, symbol/word-shape and stopword screens), tuned small and
deterministic so tests can pin exact verdicts.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

# the 25 most common English function words — enough signal for a
# "does this look like running prose" screen without a model
STOPWORDS = (
    "the of and a to in is was he for it with as his on be at by i "
    "this had not are but from or have an"
).split()

# shared by the n_pii metric and redact_pii: high-recall by design —
# a curation pipeline redacts or drops on ANY hit, so false positives
# cost a token, false negatives leak PII
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# phone-SHAPED only: either separators/parens are present, or the
# bare run is exactly 10 digits. Both ends digit-guarded so the
# tail of a timestamp/ISBN/order-id digit run never matches.
PHONE_RE = (
    r"(?<!\d)(\+?\d{1,3}[-. ]?)?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}(?!\d)"
    r"|(?<!\d)\d{10}(?!\d)"
)
# IPv4 (the third member of the Dolma-style PII set): four 0-255
# octets, anchored so longer dotted digit runs (versions like
# 1.2.3.4.5, decimal section numbers) never partially match — but a
# bare dot NOT followed/preceded by a digit (sentence punctuation:
# "connect to 10.0.0.1.") must not veto the match (ADVICE r3: the
# old (?![\d.]) lookahead under-redacted every sentence-final IP)
IP_RE = (
    r"(?<!\d)(?<!\d\.)(?:(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}"
    r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)(?!\.?\d)"
)

DEFAULT_RULES: dict[str, tuple[float, float]] = {
    # metric -> (min, max) inclusive bounds
    "n_tokens": (20, 100_000),
    "mean_token_len": (2.0, 12.0),
    "space_ratio": (0.05, 0.5),
    "symbol_ratio": (0.0, 0.25),
    "stopword_ratio": (0.01, 1.0),
    "dup_line_frac": (0.0, 0.30),
    "dup_para_frac": (0.0, 0.30),
    "n_pii": (0, 0),  # any email/phone hit rejects (redact-or-drop policy)
}


def _metric_cols(text_col: str) -> dict[str, Column]:
    text = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.split(F.trim(text), r"\s+")
    n_chars = F.length(text)
    # ALL whitespace, not just 0x20 — tokenization splits on \s+, so a
    # newline/tab-separated doc must score the same as a space-
    # separated one (else hard-wrapped prose trips the space_ratio
    # screen and mean_token_len counts separators as token chars)
    n_spaces = n_chars - F.length(F.regexp_replace(text, r"\s", ""))
    n_tokens = F.when(n_chars == 0, F.lit(0)).otherwise(F.size(toks))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(
        F.filter(
            F.transform(toks, lambda t: F.lower(t)),
            lambda t: F.array_contains(stop_arr, t),
        )
    )
    n_symbols = n_chars - F.length(
        F.regexp_replace(text, r"[^\p{L}\p{N}\s]", "")
    )
    # PII screens (counts; the rewrite counterpart is redact_pii below)
    n_emails = F.regexp_count(text, F.lit(EMAIL_RE))
    n_phones = F.regexp_count(text, F.lit(PHONE_RE))
    n_ips = F.regexp_count(text, F.lit(IP_RE))
    safe = lambda num, den: F.when(  # noqa: E731
        den > 0, F.round(num.cast("double") / den, 4)
    ).otherwise(F.lit(0.0))

    # repetition screens (Gopher-style): fraction of duplicate lines /
    # paragraphs — boilerplate-heavy or generated pages repeat whole
    # lines, which the token-level metrics cannot see
    def _dup_frac(sep: str) -> Column:
        units = F.filter(
            F.transform(F.split(text, sep), lambda u: F.trim(u)),
            lambda u: u != "",
        )
        return safe(
            F.size(units) - F.size(F.array_distinct(units)), F.size(units)
        )

    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "mean_token_len": safe(n_chars - n_spaces, n_tokens),
        "space_ratio": safe(n_spaces, n_chars),
        "symbol_ratio": safe(n_symbols, n_chars),
        "stopword_ratio": safe(n_stop, n_tokens),
        "dup_line_frac": _dup_frac(r"\n"),
        "dup_para_frac": _dup_frac(r"\n{2,}"),
        "n_pii": (n_emails + n_phones + n_ips).cast("long"),
    }


def quality_metrics(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, text, ...) -> (id, metrics...) — all JVM-side expressions."""
    cols = _metric_cols(text_col)
    return docs.select(F.col(id_col), *[c.alias(n) for n, c in cols.items()])


def curate(
    docs: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    rules: dict[str, tuple[float, float]] | None = None,
    check_lang: bool = True,
) -> DataFrame:
    """Docs -> docs + metrics + `reasons` (array of failed rules) +
    `keep` (no rule failed). Filter rules are data, not code, so a
    pipeline can tighten thresholds without touching the operator.
    Map-only: metrics attach via withColumns, no join, no shuffle."""
    rules = DEFAULT_RULES if rules is None else rules
    out = docs.withColumns(_metric_cols(text_col))
    reason_cols = [
        F.when(~F.col(metric).between(float(lo), float(hi)), F.lit(metric))
        for metric, (lo, hi) in sorted(rules.items())
    ]
    if check_lang and lang_col in docs.columns:
        from engine.udfs import langid_udf

        out = out.withColumn("lang_guess", langid_udf(F.col(text_col)))
        reason_cols.append(
            F.when(
                F.col("lang_guess") != F.col(lang_col), F.lit("lang_mismatch")
            )
        )
    out = out.withColumn("reasons", F.array_compact(F.array(*reason_cols)))
    return out.withColumn("keep", F.size("reasons") == 0)


def with_top_bigram_frac(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Attach `top_bigram_frac` — Gopher's within-doc repetition rule
    (Rae et al. 2021 §A1.1: drop docs whose most common 2-gram covers
    too large a character fraction; their cut is 0.20). Catches the
    looped-phrase generator junk ("buy now buy now buy now ...") whose
    LINES never repeat, so dup_line_frac stays 0.

    Pure JVM expressions, map-only: bigrams via zip_with of the token
    array with its own shift, mode via sort + one aggregate scan
    (longest equal run; first-in-sorted-order wins ties), fraction =
    mode_count * len(bigram incl. its joining space) / non-space
    chars. Docs with < 2 tokens score 0. Opt-in next to the metric
    core (quality_metrics' column set is oracle-pinned); screen via
    ``rules["top_bigram_frac"] = (0.0, 0.20)`` after attaching."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.filter(
        F.split(F.trim(text), r"\s+"), lambda t: t != F.lit("")
    )
    n = F.size(toks)
    bigrams = F.array_sort(
        F.zip_with(
            F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    )
    acc0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
        F.lit(0).alias("best_len"),
    )
    scan = F.aggregate(
        bigrams,
        acc0,
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.when(
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(1)
                > acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(1),
            )
            .otherwise(acc["best"])
            .alias("best"),
            F.when(
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(1)
                > acc["best"],
                F.length(x),
            )
            .otherwise(acc["best_len"])
            .alias("best_len"),
        ),
    )
    nonspace = F.length(F.regexp_replace(text, r"\s", ""))
    # the bigram string carries one joining space; count it like
    # Gopher counts the surface form, against non-space chars + the
    # (n-1) intra-bigram separators is overkill — pin the simple,
    # disclosed ratio: mode_count * len(bigram) / max(nonspace, 1)
    frac = F.when(
        (n >= 2) & (nonspace > 0),
        F.least(
            F.lit(1.0),
            (scan["best"] * scan["best_len"]).cast("double") / nonspace,
        ),
    ).otherwise(F.lit(0.0))
    return docs.withColumn("top_bigram_frac", F.round(frac, 4))


# Gopher's published repetition cuts (Rae et al. 2021 Table A1):
# a doc is rejected when the most common n-gram covers more than the
# top cut, or when characters inside ANY duplicated n-gram exceed the
# dup cut. Keys are n, values the max allowed fraction.
GOPHER_TOP_NGRAM_CUTS: dict[int, float] = {2: 0.20, 3: 0.18, 4: 0.16}
GOPHER_DUP_NGRAM_CUTS: dict[int, float] = {
    5: 0.15,
    6: 0.14,
    7: 0.13,
    8: 0.12,
    9: 0.11,
    10: 0.10,
}


def with_repetition_panel(
    docs: DataFrame,
    text_col: str = "text",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """Attach the FULL Gopher within-doc repetition panel (Rae et al.
    2021 §A1.1): `top_{n}gram_frac` for n in top_ns (fraction of
    characters covered by the single most frequent n-gram) and
    `dup_{n}gram_frac` for n in dup_ns (fraction of characters inside
    ANY n-gram that occurs more than once — overlapping occurrences
    counted once, the paper's "not double-count" rule).

    Pinned conventions (tests/test_curate.py replicates them in an
    independent reference): fractions are measured over the
    whitespace-NORMALIZED text (tokens joined by single spaces — the
    string every n-gram occurrence actually lives in, so coverage is
    well-defined); the top n-gram's weight is count * surface length;
    count ties break to the lexicographically smallest gram
    (determinism under any partitioning); docs with fewer than n
    tokens score 0.0; a top gram must occur at least TWICE to count
    (singletons are not repetition — without the gate short clean
    docs fail on their own longest gram). Note `with_top_bigram_frac` (above) keeps its
    original oracle-pinned single-metric convention (non-space-char
    denominator); this panel is the multi-n superset with one shared
    denominator.

    Shape: ONE iterator-form Arrow-batched UDF computing all nine
    metrics in a single pass per doc (token split and char offsets
    computed once; one Counter per n; coverage union via a numpy
    difference array, O(tokens + chars) per n) — deliberately Python
    like with_compression_ratio, still strictly map-only: no join, no
    shuffle, model-free. Screen by merging `gopher_repetition_rules()`
    into curate()'s rules after attaching."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    top_ns = tuple(int(n) for n in top_ns)
    dup_ns = tuple(int(n) for n in dup_ns)
    if any(n < 1 for n in (*top_ns, *dup_ns)):
        raise ValueError("n-gram sizes must be >= 1")
    fields = [f"top_{n}gram_frac" for n in top_ns] + [
        f"dup_{n}gram_frac" for n in dup_ns
    ]
    ddl = ", ".join(f"{f} double" for f in fields)

    def _doc_fracs(text: str | None) -> list[float]:
        from collections import Counter

        toks = (text or "").split()
        T = len(toks)
        if T == 0:
            return [0.0] * (len(top_ns) + len(dup_ns))
        starts = np.zeros(T, dtype=np.int64)
        lens = np.fromiter((len(t) for t in toks), dtype=np.int64, count=T)
        np.cumsum(lens[:-1] + 1, out=starts[1:])
        total = int(starts[-1] + lens[-1])  # len(" ".join(toks))
        out: list[float] = []
        gram_cache: dict[int, tuple[list, Counter]] = {}

        def _grams(n: int) -> tuple[list, Counter]:
            # grams compared/counted as their SURFACE form (tokens
            # joined by one space) — tuple ordering can disagree with
            # surface ordering when a token carries a sub-space
            # control char, and the pinned convention is the surface
            # string
            if n not in gram_cache:
                gl = [
                    " ".join(toks[i : i + n]) for i in range(T - n + 1)
                ]
                gram_cache[n] = (gl, Counter(gl))
            return gram_cache[n]

        for n in top_ns:
            if T < n or total <= 0:
                out.append(0.0)
                continue
            _, c = _grams(n)
            best_count = max(c.values())
            if best_count < 2:
                # a gram occurring once is not repetition: without
                # this gate a SHORT clean doc fails on its own longest
                # 4-gram (len(gram)/len(doc) > cut with count=1 —
                # measured 71/500 false fires on the sf0.001 table);
                # the n_tokens rule owns short docs
                out.append(0.0)
                continue
            best = min(g for g, v in c.items() if v == best_count)
            out.append(min(1.0, best_count * len(best) / total))
        for n in dup_ns:
            if T < n or total <= 0:
                out.append(0.0)
                continue
            gl, c = _grams(n)
            dup_pos = [i for i, g in enumerate(gl) if c[g] > 1]
            if not dup_pos:
                out.append(0.0)
                continue
            pos = np.asarray(dup_pos, dtype=np.int64)
            span_s = starts[pos]
            span_e = starts[pos + n - 1] + lens[pos + n - 1]
            diff = np.zeros(total + 1, dtype=np.int64)
            np.add.at(diff, span_s, 1)
            np.add.at(diff, span_e, -1)
            covered = int((np.cumsum(diff[:total]) > 0).sum())
            out.append(covered / total)
        return out

    @pandas_udf(f"struct<{ddl}>")
    def _panel(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for s in batches:
            yield pd.DataFrame(
                [_doc_fracs(t) for t in s], columns=fields
            )

    out = docs.withColumn("_rep", _panel(F.col(text_col)))
    for f in fields:
        out = out.withColumn(f, F.round(F.col(f"_rep.{f}"), 4))
    return out.drop("_rep")


def gopher_repetition_rules(
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
) -> dict[str, tuple[float, float]]:
    """The published Gopher cuts as curate() rule entries for the
    columns with_repetition_panel attaches — merge into the rules dict
    (rules are data, not code)."""
    rules: dict[str, tuple[float, float]] = {}
    for n in top_ns:
        rules[f"top_{n}gram_frac"] = (0.0, GOPHER_TOP_NGRAM_CUTS[int(n)])
    for n in dup_ns:
        rules[f"dup_{n}gram_frac"] = (0.0, GOPHER_DUP_NGRAM_CUTS[int(n)])
    return rules


def with_compression_ratio(
    docs: DataFrame, text_col: str = "text", level: int = 6
) -> DataFrame:
    """Attach `compression_ratio` = len(zlib(text)) / len(text) — the
    Dolma/DCLM-style gibberish-and-template detector: heavily
    templated or repeated text compresses far BELOW prose (~0.3-0.4),
    random/encoded junk barely compresses at all (~1.0), so a
    (min, max) rule on this one column catches both tails that the
    token-shape metrics cannot see (a base64 blob has normal token
    lengths; a 500x-repeated paragraph has normal stopword ratio when
    the paragraph does).

    The one deliberately-Python metric in this module: zlib is C-speed
    and the UDF is iterator-form Arrow-batched, so the cost is one
    deflate pass per document — still map-only, no shuffle. Level is
    pinned (deterministic bytes for a fixed zlib). Empty/null text
    scores 1.0 (incompressible convention; the n_tokens rule owns
    empties). Screen by attaching BEFORE curate() and adding e.g.
    ``rules["compression_ratio"] = (0.30, 0.98)``."""
    import zlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ratio(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            out = []
            for t in s:
                b = (t or "").encode("utf-8", "surrogatepass")
                out.append(
                    len(zlib.compress(b, level)) / len(b) if b else 1.0
                )
            yield pd.Series(out, dtype="float64")

    return docs.withColumn(
        "compression_ratio", _ratio(F.col(text_col))
    )


def redact_pii(
    docs: DataFrame,
    text_col: str = "text",
    email_token: str = "<EMAIL>",
    phone_token: str = "<PHONE>",
    ip_token: str = "<IP>",
) -> DataFrame:
    """Rewrite text_col with email/phone-shaped/IPv4 runs replaced by
    sentinel tokens — the redact-instead-of-drop arm of the n_pii
    policy (keeps the document, removes the PII). Same pinned
    patterns as the metric, so redact_pii followed by curate() always
    yields n_pii = 0. Adds n_redacted. Map-only: three JVM
    regexp_replace calls, no shuffle, no Python."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    after_email = F.regexp_replace(text, EMAIL_RE, email_token)
    # each pattern counted on the text the NEXT replace will actually
    # touch (an email whose charset overlapped a digit run must not
    # double- or under-count; same for phone-vs-IP digit runs)
    after_phone = F.regexp_replace(after_email, PHONE_RE, phone_token)
    n_red = (
        F.regexp_count(text, F.lit(EMAIL_RE))
        + F.regexp_count(after_email, F.lit(PHONE_RE))
        + F.regexp_count(after_phone, F.lit(IP_RE))
    )
    return docs.withColumn("n_redacted", n_red.cast("long")).withColumn(
        text_col, F.regexp_replace(after_phone, IP_RE, ip_token)
    )
