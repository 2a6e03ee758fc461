"""Banned-word content screen (engine/ops/wordfilter.py) and the
Gopher top-bigram repetition metric (engine/ops/curate.py): pinned
match semantics, map-only plans, rule-engine wiring, job surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from engine.ops.curate import with_top_bigram_frac
from engine.ops.wordfilter import banned_hits_joined, screen_banned_words

TERMS = ["zorbly", "Flumph", "grey wobble"]


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_word_boundary_and_case_semantics(spark):
    rows = screen_banned_words(
        _docs(
            spark,
            [
                "a clean sentence about nothing in particular",
                "the ZORBLY appeared, zorbly! and (flumph) too",
                "zorblyish words must not match the zorblys either",
                "a grey wobble crossed the road",
                "the grey wobbled but no phrase matches here",
                None,
            ],
        ),
        TERMS,
    ).orderBy("doc_id").collect()
    assert [r["banned_hits"] for r in rows] == [0, 3, 0, 1, 0, 0]
    assert [r["word_keep"] for r in rows] == [
        True, False, True, False, True, True,
    ]


def test_max_hits_knob_and_joined_path_agrees(spark):
    docs = _docs(
        spark,
        ["zorbly once", "zorbly twice zorbly", "none at all", "flumph"],
    )
    relaxed = screen_banned_words(docs, TERMS, max_hits=1)
    got = {r["doc_id"]: r["word_keep"] for r in relaxed.collect()}
    assert got == {0: True, 1: False, 2: True, 3: True}

    terms_df = docs.sparkSession.createDataFrame(
        [("zorbly",), ("flumph",)], "term string"
    )
    joined = {
        r["doc_id"]: r["banned_hits"]
        for r in banned_hits_joined(docs, terms_df).collect()
    }
    assert joined == {0: 1, 1: 2, 2: 0, 3: 1}


def test_wordfilter_plan_is_map_only(spark):
    from tests.test_plans import plan

    df = _docs(spark, ["some text here"])
    p = plan(screen_banned_words(df, TERMS))
    assert "Exchange" not in p
    assert "ArrowEval" not in p and "BatchEvalPython" not in p


def test_top_bigram_frac_semantics(spark):
    looped = "buy now " * 40  # the Gopher target: looped phrase junk
    varied = (
        "the committee reviewed the proposal while the council "
        "debated the budget and the panel approved the survey"
    )
    rows = with_top_bigram_frac(
        _docs(spark, [looped.strip(), varied, "single", "", None])
    ).orderBy("doc_id").collect()
    fracs = [r["top_bigram_frac"] for r in rows]
    assert fracs[0] > 0.5            # dominated by one bigram
    assert fracs[1] < 0.20           # normal prose under Gopher's cut
    assert fracs[2] == fracs[3] == fracs[4] == 0.0

    # deterministic under repartitioning
    again = with_top_bigram_frac(
        _docs(spark, [looped.strip(), varied]).repartition(5)
    ).orderBy("doc_id").collect()
    assert [r["top_bigram_frac"] for r in again] == fracs[:2]


def test_top_bigram_plan_is_map_only(spark):
    from tests.test_plans import plan

    p = plan(with_top_bigram_frac(_docs(spark, ["a b c"])))
    assert "Exchange" not in p and "ArrowEval" not in p


def test_curate_job_badwords_and_repetition(spark, tmp_path):
    import jobs.curate as jc

    prose = (
        "The committee met on Thursday to review the draft proposal "
        "and agreed to publish the revised schedule next week after "
        "members raised several detailed questions about the budget."
    )
    docs = spark.createDataFrame(
        [
            (1, prose, "en"),
            (2, prose + " zorbly", "en"),
            (3, ("act fast " * 30).strip() + " " + prose, "en"),
        ],
        "doc_id long, text string, lang string",
    )
    inp = str(tmp_path / "docs")
    docs.write.parquet(inp)
    lst = tmp_path / "terms.txt"
    lst.write_text("# policy list\nzorbly\n\n")

    out = str(tmp_path / "out")
    summary = jc.run(
        jc._parser().parse_args(
            [
                "--input", inp, "--output", out, "--no-check-lang",
                "--min-tokens", "5", "--badwords", str(lst),
                "--top-bigram-max", "0.20", "--master", "local[2]",
            ]
        )
    )
    assert summary["reasons"].get("banned_hits", 0) == 1
    assert summary["reasons"].get("top_bigram_frac", 0) == 1
    kept = spark.read.parquet(f"{out}/kept")
    assert [r.doc_id for r in kept.select("doc_id").collect()] == [1]


def test_punctuated_terms_normalized_like_tokens(spark):
    """Policy lists carry punctuated entries; terms must go through
    the same normalization as document tokens or they never match."""
    rows = screen_banned_words(
        _docs(
            spark,
            [
                "this x-rated clip and that X.RATED one both match",
                "narrated content does not",
            ],
        ),
        ["x-rated", "  ", "!!!"],  # junk-only terms are skipped
    ).orderBy("doc_id").collect()
    assert [r["banned_hits"] for r in rows] == [2, 0]

    tdf = screen_banned_words(
        _docs(spark, ["a hand-made grey wobble here"]), ["grey  wobble!"]
    ).collect()
    assert tdf[0]["banned_hits"] == 1  # phrase normalized per word
