"""Line-wise corrections (engine/ops/linefix.py): rule semantics
pinned per line, clean-doc byte round-trip, doc-drop threshold,
map-only plan."""

from __future__ import annotations

from engine.ops.linefix import fix_lines

PROSE = (
    "The committee met on Thursday to review the draft proposal and "
    "agreed to publish the revised schedule next week."
)


def _fix(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return fix_lines(df, **kw).collect()[0]


def test_rule_semantics(spark):
    text = "\n".join(
        [
            PROSE,
            "3 likes",
            "1,204 views",
            "2023-01-01",
            "Sign in",
            "Accept all cookies",
            "HOME NEWS SPORT",
            "Menu",
            PROSE.replace("Thursday", "Friday"),
        ]
    )
    r = _fix(spark, text)
    kept = r["text_fixed"].split("\n")
    assert kept == [PROSE, PROSE.replace("Thursday", "Friday")]
    assert r["n_lines_removed"] == 7
    assert r["line_keep"] is False  # 12 of ~50 words removed > 5%


def test_long_lines_never_judged(spark):
    shouted = "THIS ENTIRE PARAGRAPH IS IN CAPITALS BUT IT IS REAL " \
              "PROSE WITH MANY WORDS SO THE RULES MUST NOT TOUCH IT"
    counterish = "the video got 3 likes yesterday but nobody watched " \
                 "it after that because the channel went quiet"
    r = _fix(spark, shouted + "\n" + counterish)
    assert r["text_fixed"] == shouted + "\n" + counterish
    assert r["n_lines_removed"] == 0 and r["line_keep"] is True


def test_clean_doc_round_trips_byte_identically(spark):
    text = PROSE + "\n\n  \n" + PROSE + "\n"  # blank lines + trailing \n
    r = _fix(spark, text)
    assert r["text_fixed"] == text
    assert r["removed_word_frac"] == 0.0


def test_one_line_doc_is_its_own_main_content(spark):
    r = _fix(spark, "Introduction")
    assert r["text_fixed"] == "Introduction"  # lone word, but only line
    r2 = _fix(spark, "Introduction\n" + PROSE)
    assert r2["text_fixed"] == PROSE  # lone word among others: removed


def test_doc_drop_threshold_and_null_text(spark):
    # removing the counter costs 2/12 words > 5% -> line_keep False,
    # but a loose threshold keeps it
    text = PROSE[:60] + "\n999 likes"
    assert _fix(spark, text)["line_keep"] is False
    assert _fix(spark, text, max_removed_frac=0.5)["line_keep"] is True
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = fix_lines(df).collect()[0]
    assert r["text_fixed"] == "" and r["line_keep"] is True


def test_plan_is_map_only(spark):
    from tests.test_plans import plan

    df = spark.createDataFrame([(1, PROSE)], "doc_id long, text string")
    assert "Exchange" not in plan(fix_lines(df))
    assert "BatchEvalPython" not in plan(fix_lines(df))
    assert "ArrowEval" not in plan(fix_lines(df))
