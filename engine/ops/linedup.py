"""Line/paragraph-level deduplication — rewrite docs, drop repeated
lines (CCNet-style; Wenzek et al. 2019 dedupe repeated paragraphs
corpus-wide before LM filtering; Gopher/C4 report boilerplate lines —
nav, cookie banners, footers — as the dominant web noise).

Unlike the document-level ops in engine/ops/dedup.py (which drop whole
near-duplicate DOCS), this op rewrites each doc's TEXT: every line
that also occurs elsewhere keeps exactly one winner occurrence and the
rest are removed. `scope` picks where "elsewhere" looks:

  * scope="corpus" (CCNet's setting): one surviving occurrence across
    the whole corpus. The winner is the minimum (id, line_no) — a
    deterministic total order, so reruns and partitionings agree.
  * scope="doc": only repeats within the same doc are dropped (the
    transform counterpart of curate's dup_line_frac metric).

Scale shape: posexplode lines -> groupBy line-key min(struct(id,pos))
[map-side combinable, so a nav line occurring 10^9 times still
reduces to one row per partition before the shuffle] -> equi-join the
verdict back on the line-key -> groupBy id to reassemble. Three
shuffles of the exploded corpus, all keyed — never all-pairs. The
line key is md5(line) (128-bit: at 10^12 lines a 64-bit key would
already suffer ~10^4 birthday collisions = silent false merges).

Reassembly is exact: split("\\n") keeps empty fields (Spark split has
limit=-1 semantics), empty/whitespace-only lines never participate in
dedup, and kept lines rejoin in original order — a doc with no
repeated lines round-trips byte-identically (pinned in tests).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F


def dedup_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    scope: str = "corpus",
    min_chars: int = 1,
    sep: str = "\n",
) -> DataFrame:
    """Rewrite text_col with repeated lines removed (first/winning
    occurrence kept). Returns the input columns plus n_lines and
    n_lines_dropped; every input row survives (a doc whose every line
    lost becomes empty text, not a missing row).

    Lines whose trimmed length is < min_chars are exempt (kept
    verbatim, never counted as duplicates) — empty lines are
    paragraph structure, not content.

    `sep` is the LITERAL line separator (default newline; "\\n\\n"
    dedups paragraphs, " " dedups tokens). split+join on the same
    literal separator always round-trips.
    """
    if scope not in ("corpus", "doc"):
        raise ValueError(f"scope must be corpus|doc, got {scope!r}")
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(text, re.escape(sep))).alias("_pos", "_line"),
    ).withColumn("_active", F.length(F.trim("_line")) >= min_chars)
    key_cols = ["_key"] if scope == "corpus" else [id_col, "_key"]
    active = lines.filter("_active").withColumn("_key", F.md5("_line"))
    winners = active.groupBy(*key_cols).agg(
        F.min(F.struct(id_col, "_pos")).alias("_win")
    )
    kept_active = (
        active.join(winners, key_cols)
        .filter(
            (F.col("_win")[id_col] == F.col(id_col))
            & (F.col("_win._pos") == F.col("_pos"))
        )
        .select(id_col, "_pos", "_line")
    )
    kept = kept_active.unionByName(
        lines.filter(~F.col("_active")).select(id_col, "_pos", "_line")
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                lambda s: s["_line"],
            ),
            sep,
        ).alias("_clean"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    n_lines = F.size(F.split(text, re.escape(sep)))
    out = (
        docs.withColumn("n_lines", n_lines)
        .join(rebuilt, id_col, "left")
        .withColumn(
            "n_lines_dropped",
            F.col("n_lines") - F.coalesce(F.col("_n_kept"), F.lit(0)),
        )
        .withColumn(text_col, F.coalesce(F.col("_clean"), F.lit("")))
        .drop("_clean", "_n_kept")
    )
    return out
