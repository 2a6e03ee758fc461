"""Benchmark decontamination screen (engine/ops/decontaminate.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from engine.ops.decontaminate import contamination_screen, ngram_hash_col

PROBE = (
    "what is the capital of france the capital of france is paris "
    "which has been the seat of government since the tenth century"
)
CLEAN = " ".join(f"w{i} token{i} filler{i}" for i in range(30))


def _docs(spark):
    # doc 1 embeds the probe verbatim inside other prose; 2 is clean;
    # 3 shares a few words with the probe but no 13-gram run
    return spark.createDataFrame(
        [
            (1, f"intro words here {PROBE} closing words"),
            (2, CLEAN),
            (3, "the capital of france is lovely in spring " + CLEAN),
        ],
        "doc_id long, text string",
    )


def _probes(spark):
    return spark.createDataFrame([(PROBE,)], "text string")


def test_screen_flags_only_embedded_probe(spark):
    got = {
        r["doc_id"]: (r["contaminated"], r["n_hits"])
        for r in contamination_screen(_docs(spark), _probes(spark)).collect()
    }
    assert got[1][0] is True and got[1][1] > 0
    assert got[2] == (False, 0)
    assert got[3] == (False, 0)


def test_short_probe_matches_embedded(spark):
    # adaptive_n: a probe shorter than n tokens drops BOTH sides to the
    # probe's length, so the short answer is caught even when embedded
    # inside a longer training doc (ADVICE r2)
    docs = spark.createDataFrame(
        [
            (1, "tiny probe text"),
            (2, "tiny probe other"),
            (3, "prefix words then tiny probe text hidden inside prose"),
        ],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame([("tiny probe text",)], "text string")
    got = {
        r["doc_id"]: r["contaminated"]
        for r in contamination_screen(docs, probes).collect()
    }
    assert got == {1: True, 2: False, 3: True}

    # adaptive_n=False restores the old whole-run-only semantics
    got = {
        r["doc_id"]: r["contaminated"]
        for r in contamination_screen(docs, probes, adaptive_n=False).collect()
    }
    assert got == {1: True, 2: False, 3: False}


def test_ngram_hash_counts(spark):
    from engine.ops.decontaminate import _tokens

    df = spark.createDataFrame([(" ".join(["t"] * 20),)], "text string")
    k = (
        df.select(_tokens("text").alias("_toks"))
        .select(F.size(ngram_hash_col(F.col("_toks"))).alias("n"))
        .collect()[0]["n"]
    )
    assert k == 20 - 13 + 1


def test_corpus_side_never_shuffles(spark):
    """The probe table broadcasts STATICALLY (it is force-hinted: its
    size is known-bounded per eval suite); the hits verdict join is
    left to AQE (its size is input-dependent, ADVICE r2), which picks
    broadcast at runtime here because hits is tiny. So: static plan
    carries the probe broadcast, and the runtime-final adaptive plan
    contains no sort-merge join anywhere."""
    from tests.test_plans import plan

    q = contamination_screen(_docs(spark), _probes(spark))
    assert "BroadcastHashJoin" in plan(q)
    q.collect()  # finalize AQE
    final = q._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final, final
    # the adaptive plan string prints BOTH the final plan and the
    # pre-AQE "Initial Plan" (which legitimately carries the SMJ that
    # AQE replaced) — assert on the final section only
    final = final.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in final, final


def test_degenerate_probe_does_not_collapse_n_eff(spark):
    """A single empty/one-token probe row must not drop the whole
    screen to unigram matching (round-3 review finding): n_eff is
    floored at min_n=2 and degenerate probes are excluded from the
    shortest-probe computation. The degenerate probe itself still
    matches via its full-token-run hash."""
    docs = spark.createDataFrame(
        [
            (1, "tiny probe text"),
            (2, "shares only the word probe with everything"),
            (3, "prefix words then tiny probe text hidden inside prose"),
            (4, "probe"),  # whole run == the degenerate probe
        ],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame(
        [("tiny probe text",), ("probe",), ("",)], "text string"
    )
    got = {
        r["doc_id"]: r["contaminated"]
        for r in contamination_screen(docs, probes).collect()
    }
    # n_eff = 2 (floored; degenerate probes ignored): doc 2 shares only
    # a unigram -> clean; docs 1 and 3 contain the 2-gram "tiny probe";
    # doc 4's entire run equals the 1-token probe -> caught
    assert got == {1: True, 2: False, 3: True, 4: True}


def test_corpus_gram_scan_tokenizes_once(spark):
    """The corpus-side n-gram lambda must read a MATERIALIZED token
    array: if the optimizer inlines the raw split expression into the
    transform, every n-gram position re-tokenizes the whole doc —
    O(tokens^2) on the 100-TB side of the screen (the substrdedup/
    dsir blowup shape)."""
    import re

    from engine.ops.decontaminate import contamination_screen

    docs = spark.createDataFrame(
        [("d1", "a b c d e")], "doc_id string, text string"
    )
    probes = spark.createDataFrame([("a b c",)], "text string")
    plan = (
        contamination_screen(docs, probes, n=3)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert not re.search(r"transform\(sequence[^\n]*split\(", plan), plan
