"""Line-wise corrections (RefinedWeb §3.1.3, Penedo et al. 2023):
remove the residual boilerplate LINES that survive main-content
extraction — social counters ("3 likes"), navigation stubs, all-caps
menu items, lone-word buttons — and drop the whole doc when so much
of it was removed that the remainder is untrustworthy.

Distinct from the neighbors it composes with: engine/ops/curate.py
judges whole docs (never edits), engine/ops/linedup.py removes lines
because they repeat corpus-wide (needs a shuffle on line hash) — this
op removes lines because of what they ARE, per doc, with zero context.

Scale shape: ONE map-only pass, pure JVM column expressions — the
line split, every rule, and the reassembly are transform/filter
lambdas inside whole-stage codegen (no Python, no shuffle, text never
moves; plan-asserted in tests/test_linefix.py). At 10^12 docs this is
the cheapest screen in the pipeline and runs before anything that
shuffles.

The published rules (applied to SHORT lines only — long prose lines
are never judged, so a shouted paragraph survives):

  counter     "<number> likes" / "views" / "comments" / "shares" ...
  numeric     digits + punctuation only ("1 2 3", "2023-01-01")
  lone_word   a single word (nav/button stubs); only when the doc has
              other lines — a one-line doc is its own main content
  caps        >= 70% of letters uppercase (menu items, headers)
  nav_phrase  a bounded phrase list (sign in / accept cookies / ...)

Rules fire only on lines of <= max_words words. Whitespace-only lines
are preserved verbatim (paragraph structure is linedup's concern, and
chunker goldens depend on it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# social-counter line: optional count prefix, counter noun, nothing else
_COUNTER_RE = (
    r"(?i)^\s*\d+([.,]\d+)?\s*[km]?\s*"
    r"(likes?|views?|comments?|shares?|retweets?|followers?|"
    r"upvotes?|points?|replies|reactions?)\s*$"
)
# digits / separators / currency only — dates, scores, page numbers
_NUMERIC_RE = r"^\s*[\d\s.,:;/\-–—%$€£#()]+\s*$"
# bounded nav-phrase list; anchored, so prose mentioning them survives
_NAV_RE = (
    r"(?i)^\s*(sign (in|up)|log ?(in|out)|register|subscribe( now)?|"
    r"read more|learn more|click here|accept( all)? cookies|"
    r"cookie settings|skip to (main )?content|back to top|"
    r"share (this|on \w+)|print this page|advertisement|sponsored)"
    r"\s*[.!»>]*\s*$"
)

MAX_JUDGED_WORDS = 10  # rules only ever fire on lines this short
DEFAULT_MAX_REMOVED_FRAC = 0.05  # RefinedWeb's doc-drop threshold


def _words(line: Column) -> Column:
    return F.filter(F.split(F.trim(line), r"\s+"), lambda w: w != F.lit(""))


def _is_boiler(line: Column, nlines: Column) -> Column:
    """True iff this short line matches any removal rule."""
    nw = F.size(_words(line))
    letters = F.regexp_replace(line, r"[^A-Za-zÀ-ÖØ-öø-ÿ]", "")
    uppers = F.regexp_replace(line, r"[^A-ZÀ-ÖØ-Þ]", "")
    caps_heavy = (F.length(letters) >= 3) & (
        F.length(uppers) >= F.length(letters) * 0.7
    )
    short = (nw > 0) & (nw <= MAX_JUDGED_WORDS)
    return short & (
        line.rlike(_COUNTER_RE)
        | line.rlike(_NUMERIC_RE)
        | line.rlike(_NAV_RE)
        | ((nw == 1) & (nlines > 1))
        | caps_heavy
    )


def fix_lines(
    docs: DataFrame,
    text_col: str = "text",
    max_removed_frac: float = DEFAULT_MAX_REMOVED_FRAC,
    out_col: str = "text_fixed",
) -> DataFrame:
    """docs -> docs + (out_col, n_lines_removed, removed_word_frac,
    line_keep). A doc with no offending lines round-trips its text
    BYTE-IDENTICALLY (pinned in tests); line_keep=False when removed
    words exceed max_removed_frac of the doc (the caller screens on
    it — this op never drops rows, so audits can see what died)."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(text, r"\n", -1)  # -1: trailing empties preserved
    nlines = F.size(F.filter(lines, lambda ln: F.trim(ln) != F.lit("")))
    boiler = F.transform(lines, lambda ln: _is_boiler(ln, nlines))
    kept = F.filter(
        F.zip_with(lines, boiler, lambda ln, b: F.when(~b, ln)),
        lambda ln: ln.isNotNull(),
    )
    total_w = F.size(_words(text))
    removed_w = F.aggregate(
        F.zip_with(
            lines,
            boiler,
            lambda ln, b: F.when(b, F.size(_words(ln))).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    frac = F.when(total_w > 0, removed_w / total_w).otherwise(F.lit(0.0))
    return (
        docs.withColumn(out_col, F.concat_ws("\n", kept))
        .withColumn(
            "n_lines_removed",
            F.size(F.filter(boiler, lambda b: b)).cast("int"),
        )
        .withColumn("removed_word_frac", frac.cast("double"))
        .withColumn(
            "line_keep", frac <= F.lit(float(max_removed_frac))
        )
    )
