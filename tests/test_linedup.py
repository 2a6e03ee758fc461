"""Line-level dedup rewrite (engine/ops/linedup.py) vs an independent
pure-Python reference of the same pinned spec."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engine.ops.linedup import dedup_lines

DOCS = [
    ("a", "unique first line\nHome | About | Contact\nreal content a\n\nreal content a2"),
    ("b", "Home | About | Contact\nreal content b\nreal content b\n\ncookie notice"),
    ("c", "cookie notice\nunique c line\n\n\nHome | About | Contact"),
    ("d", ""),  # empty doc survives with empty text
    ("e", "\n\n"),  # whitespace structure only: round-trips verbatim
    ("f", None),  # null text normalizes to ""
]


def _ref(docs, scope, min_chars=1):
    seen: set = set()
    out = {}
    for doc_id, text in docs:
        if scope == "doc":
            seen = set()
        lines = (text or "").split("\n")
        kept = []
        dropped = 0
        for ln in lines:
            if len(ln.strip()) < min_chars:
                kept.append(ln)
            elif (scope == "doc" and ln in seen) or (
                scope == "corpus" and ln in seen
            ):
                dropped += 1
            else:
                seen.add(ln)
                kept.append(ln)
        out[doc_id] = ("\n".join(kept), len(lines), dropped)
    return out


@pytest.mark.parametrize("scope", ["corpus", "doc"])
def test_matches_reference(spark, scope):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_lines_dropped"])
        for r in dedup_lines(docs, scope=scope).collect()
    }
    want = _ref(DOCS, scope)
    assert got == want
    assert len(got) == len(DOCS)  # every row survives


def test_no_repeats_roundtrips_byte_identically(spark):
    rows = [("x", "alpha\n\nbeta gamma\n  indented kept \ndelta")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dedup_lines(docs).collect()[0]
    assert out["text"] == rows[0][1]
    assert out["n_lines_dropped"] == 0


def test_corpus_winner_is_min_id_pos(spark):
    """The surviving occurrence is the minimum (id, pos) — stable
    under partitioning and rerun order."""
    rows = [("z2", "dup line"), ("z1", "dup line"), ("z3", "dup line")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(4)
    got = {
        r["doc_id"]: r["text"] for r in dedup_lines(docs).collect()
    }
    assert got == {"z1": "dup line", "z2": "", "z3": ""}


def test_min_chars_exempts_short_lines(spark):
    rows = [("s1", "ok\nok\nlong enough line\nlong enough line")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dedup_lines(docs, min_chars=5).collect()[0]
    assert out["text"] == "ok\nok\nlong enough line"
    assert out["n_lines_dropped"] == 1


def test_custom_separator_tokens(spark):
    """sep=' ' + scope='doc' = within-doc token dedup; separators with
    regex metacharacters are treated literally."""
    rows = [("t1", "a b a c b a"), ("t2", "x.y.x.z", )]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["text"] for r in dedup_lines(docs, scope="doc", sep=" ").collect()}
    assert out["t1"] == "a b c"
    outdot = {
        r["doc_id"]: r["text"]
        for r in dedup_lines(docs, scope="doc", sep=".").collect()
    }
    assert outdot["t2"] == "x.y.z"  # '.' split literally, not as regex


def test_plan_is_keyed_never_cartesian(spark):
    from tests.test_plans import plan

    docs = spark.createDataFrame(DOCS[:3], ["doc_id", "text"])
    p = plan(dedup_lines(docs))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p, p
