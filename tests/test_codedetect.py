"""Code-vs-prose detection (engine/ops/codedetect.py): strong margins
on real code shapes and real prose, boundary behavior, null/empty
safety, map-only plan, and the curate-job wiring."""

from __future__ import annotations

from engine.ops.codedetect import DEFAULT_THRESHOLD, detect_code

PROSE = (
    "The committee met on Thursday to review the draft proposal and "
    "agreed to publish the revised schedule next week. Several members "
    "raised questions about the budget, which the chair promised to "
    "answer in writing before the next session."
)

PYTHON = """\
import os
from collections import Counter

def count_words(path):
    with open(path) as f:
        words = f.read().split()
    return Counter(words)

class Reporter:
    def __init__(self, counts):
        self.counts = counts

    def top(self, k=10):
        return self.counts.most_common(k)
"""

C_CODE = """\
#include <stdio.h>
#include <stdlib.h>

int main(int argc, char **argv) {
    int total = 0;
    for (int i = 1; i < argc; i++) {
        total += atoi(argv[i]);
    }
    printf("%d\\n", total);
    return 0;
}
"""

JSON_DATA = """\
{
  "name": "example",
  "version": "1.2.3",
  "dependencies": {
    "left-pad": "^1.0.0",
    "lodash": "~4.17.0"
  },
  "scripts": {
    "build": "tsc -p .",
    "test": "jest --coverage"
  }
}
"""

HTML_MARKUP = (
    "<div class=\"row\"><span id=\"x\">value</span></div>\n"
    "<ul><li>one</li><li>two</li></ul>\n"
    "<table><tr><td>1</td><td>2</td></tr></table>"
)


def _scores(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = detect_code(df).orderBy("doc_id").collect()
    return [(r["code_score"], r["is_code"]) for r in rows]


def test_code_shapes_flagged_prose_not(spark):
    out = _scores(spark, [PROSE, PYTHON, C_CODE, JSON_DATA, HTML_MARKUP])
    (prose, python, c_code, json_d, markup) = out
    assert prose[1] is False
    for name, (score, flag) in zip(
        ["python", "c", "json", "html"], [python, c_code, json_d, markup]
    ):
        assert flag is True, (name, score)
    # margin, not a knife edge: prose sits well under the cut, code well over
    assert prose[0] < DEFAULT_THRESHOLD * 0.5, prose[0]
    for score, _ in (python, c_code, json_d, markup):
        assert score > DEFAULT_THRESHOLD * 1.2, score


def test_prose_mentioning_keywords_survives(spark):
    tricky = (
        "In Python a function begins with the def keyword and a class "
        "groups related functions together. To import a module you "
        "write the import statement at the top of the file, and the "
        "select committee will return its findings from the archive "
        "next week without any semicolons at all."
    )
    (score, flag), = _scores(spark, [tricky])
    assert flag is False, score


def test_null_and_empty_text(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id long, text string"
    )
    rows = detect_code(df).orderBy("doc_id").collect()
    for r in rows:
        assert r["code_score"] == 0.0 and r["is_code"] is False


def test_threshold_knob(spark):
    df = spark.createDataFrame([(1, PYTHON)], "doc_id long, text string")
    hi = detect_code(df, threshold=0.99).collect()[0]
    assert hi["is_code"] is False  # score unchanged, cut moved
    lo = detect_code(df, threshold=0.01).collect()[0]
    assert lo["is_code"] is True
    assert hi["code_score"] == lo["code_score"]


def test_plan_is_map_only(spark):
    from tests.test_plans import plan

    df = spark.createDataFrame([(1, PROSE)], "doc_id long, text string")
    p = plan(detect_code(df))
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p
    assert "ArrowEval" not in p


def test_curate_job_drop_code(spark, tmp_path):
    """jobs/curate.py --drop-code rejects code docs with reason 'code'
    and keeps prose; --tag-code attaches the column without screening."""
    import jobs.curate as jc

    prose_doc = "\n".join(
        [
            PROSE,
            "Afterwards the members walked through the old market hall "
            "and talked about the harvest, the weather, and the plans "
            "for the village fair that autumn always brings around.",
            "Nobody expected the decision to be easy, but everyone "
            "agreed that waiting another year would cost far more than "
            "acting now with the information already gathered.",
        ]
    )
    docs = spark.createDataFrame(
        [
            (1, "https://a.example.com/post", prose_doc, "en"),
            (2, "https://b.example.com/raw", PYTHON, "en"),
        ],
        "doc_id long, url string, text string, lang string",
    )
    inp = str(tmp_path / "docs")
    docs.write.parquet(inp)

    out = str(tmp_path / "out")
    summary = jc.run(
        jc._parser().parse_args(
            [
                "--input", inp, "--output", out,
                "--drop-code", "--no-check-lang", "--min-tokens", "5",
                "--master", "local[2]",
            ]
        )
    )
    assert summary["reasons"].get("code", 0) == 1
    kept = spark.read.parquet(f"{out}/kept")
    assert [r.doc_id for r in kept.select("doc_id").collect()] == [1]
    rej = spark.read.parquet(f"{out}/rejected")
    row = rej.filter("doc_id = 2").collect()[0]
    assert "code" in row["reasons"] and row["is_code"] is True
