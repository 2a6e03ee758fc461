"""Exact-substring dedup (engine/ops/substrdedup.py) vs an independent
pure-Python reference of the same pinned spec (Lee et al. 2022
ExactSubstr semantics at a test-sized w)."""

from __future__ import annotations

import re

import pytest

from engine.ops.substrdedup import dedup_substrings

W = 5

# chars Java's String.trim strips (everything <= U+0020)
_JTRIM = "".join(chr(c) for c in range(0x21))

SHARED = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
DOCS = [
    ("a", SHARED + " tail-of-a only here"),
    ("b", SHARED + " completely different ending for b"),
    ("c", "one two three four five REPEAT one two three four five"),
    ("d", "too short for any window"),  # 5 tokens == w, one window, unique
    ("e", ""),
    ("f", None),
    ("g", "hello   world\t\tkeep my   weird whitespace intact exactly"),
    ("h", SHARED + " third copy of the shared span"),
]


def _tokenize(t):
    t = (t or "").strip(_JTRIM)
    return re.split(r"\s+", t, flags=re.ASCII)


def _ref(rows, w, keep):
    occ: dict = {}
    toks_by = {}
    for i, t in rows:
        tk = _tokenize(t)
        toks_by[i] = tk
        if len(tk) >= w:
            for p in range(len(tk) - w + 1):
                occ.setdefault(" ".join(tk[p : p + w]), []).append((i, p))
    removable: dict = {}
    for lst in occ.values():
        if len(lst) >= 2:
            win = min(lst)
            for o in lst:
                if keep == "none" or o != win:
                    removable.setdefault(o[0], []).append(o[1])
    out = {}
    for i, t in rows:
        tk = toks_by[i]
        ps = sorted(removable.get(i, []))
        if not ps:
            out[i] = (t, len(tk), 0)
            continue
        covered = [False] * len(tk)
        for p in ps:
            for j in range(p, min(p + w, len(tk))):
                covered[j] = True
        kept = [x for x, c in zip(tk, covered) if not c]
        out[i] = (" ".join(kept), len(tk), sum(covered))
    return out


def _run(spark, w=W, keep="one", parts=3):
    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    got = dedup_substrings(df.repartition(parts), w=w, keep=keep).collect()
    return {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_tokens_removed"])
        for r in got
    }


@pytest.mark.parametrize("keep", ["one", "none"])
def test_matches_pure_python_reference(spark, keep):
    assert _run(spark, keep=keep) == _ref(DOCS, W, keep)


def test_no_dup_doc_roundtrips_byte_identically(spark):
    got = _run(spark)
    assert got["g"][0] == dict(DOCS)["g"]  # weird whitespace intact
    assert got["e"][0] == ""
    assert got["f"][0] is None
    assert got["d"][0] == dict(DOCS)["d"]


def test_keep_one_winner_survives_and_losers_lose(spark):
    got = _run(spark, keep="one")
    # "a" is the min (id, pos) for every shared-prefix window: untouched
    assert got["a"][0] == dict(DOCS)["a"]
    assert got["a"][2] == 0
    # "b" and "h" lose the 8 shared tokens, keep their unique tails
    assert got["b"] == ("completely different ending for b", 13, 8)
    assert got["h"] == ("third copy of the shared span", 14, 8)


def test_keep_none_removes_all_occurrences(spark):
    got = _run(spark, keep="none")
    assert got["a"] == ("tail-of-a only here", 11, 8)
    assert got["b"][2] == 8 and got["h"][2] == 8


def test_within_doc_repeat_keeps_earlier_occurrence(spark):
    got = _run(spark, keep="one")
    assert got["c"] == ("one two three four five REPEAT", 11, 5)


def test_partition_invariance(spark):
    assert _run(spark, parts=1) == _run(spark, parts=7)


def test_validation(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    with pytest.raises(ValueError):
        dedup_substrings(df, keep="some")
    with pytest.raises(ValueError):
        dedup_substrings(df, w=1)


def test_window_scan_tokenizes_once(spark):
    """The window lambda must read a MATERIALIZED token array: if the
    optimizer inlines the raw split expression into the transform, the
    lambda re-tokenizes the whole doc once per window position —
    O(tokens^2), a multi-minute straggler on ordinary page-sized docs
    (the dsir.py/lm.py blowup shape)."""
    import re

    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    plan = (
        dedup_substrings(df, w=3)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert not re.search(r"transform\(sequence[^\n]*split\(", plan), plan
