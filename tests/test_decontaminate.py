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


def test_short_probe_exact_match(spark):
    # a probe shorter than n tokens matches only a doc whose full
    # token run contains the identical short run as its own full run
    docs = spark.createDataFrame(
        [(1, "tiny probe text"), (2, "tiny probe other")],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame([("tiny probe text",)], "text string")
    got = {
        r["doc_id"]: r["contaminated"]
        for r in contamination_screen(docs, probes).collect()
    }
    assert got == {1: True, 2: False}


def test_ngram_hash_counts(spark):
    df = spark.createDataFrame([(" ".join(["t"] * 20),)], "text string")
    k = df.select(F.size(ngram_hash_col("text")).alias("n")).collect()[0]["n"]
    assert k == 20 - 13 + 1


def test_corpus_side_never_shuffles(spark):
    """Probe table broadcasts and the hits verdict broadcasts back:
    the corpus side of the screen plan must carry no Exchange other
    than the hits aggregation's own (which carries doc ids, not text).
    Concretely: no SortMergeJoin anywhere — both joins broadcast."""
    from tests.test_plans import plan

    p = plan(contamination_screen(_docs(spark), _probes(spark)))
    assert "SortMergeJoin" not in p, p
    assert "BroadcastHashJoin" in p, p
