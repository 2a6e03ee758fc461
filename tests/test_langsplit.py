"""Paragraph-level language ID + majority rewrite
(engine/ops/langsplit.py): semantics pinned against hand-built
bilingual docs; clean round-trip; map-only plan."""

from __future__ import annotations

from engine.ops.langsplit import filter_language, split_languages

EN = (
    "the committee said that it will review all of the proposals and "
    "they were sure that this can be done when the time is right"
)
ES = (
    "el comité dijo que se van a revisar todas las propuestas porque "
    "es muy importante para el futuro de la ciudad y sus vecinos"
)
UND = "42 100 -- 3.14 §§ ()"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_majority_and_rewrite(spark):
    text = "\n".join([EN, ES, EN, UND])
    r = split_languages(_docs(spark, [(1, text)])).collect()[0]
    assert r["lang_major"] == "en"
    en_w, es_w = 2 * len(EN.split()), len(ES.split())
    assert abs(r["lang_frac"] - en_w / (en_w + es_w)) < 1e-9
    assert r["lang_mixed"] is True  # es holds ~1/3 of attributed words
    # rewrite keeps both en paragraphs AND the und one, drops es
    assert r["text_major"] == "\n".join([EN, EN, UND])


def test_pure_doc_round_trips_and_und_doc(spark):
    text = EN + "\n" + EN
    r = split_languages(_docs(spark, [(1, text)])).collect()[0]
    assert r["text_major"] == text
    assert r["lang_frac"] == 1.0 and r["lang_mixed"] is False

    u = split_languages(_docs(spark, [(2, UND)])).collect()[0]
    assert u["lang_major"] == "und" and u["lang_frac"] == 0.0
    assert u["text_major"] == UND

    n = split_languages(_docs(spark, [(3, None)])).collect()[0]
    assert n["lang_major"] == "und" and n["text_major"] == ""


def test_filter_language_slice(spark):
    docs = _docs(
        spark,
        [
            (1, EN + "\n" + EN),           # pure en
            (2, ES + "\n" + ES),           # pure es
            (3, EN + "\n" + ES + "\n" + EN),  # en-major, mixed
            (4, EN + "\n" + ES + "\n" + ES + "\n" + ES),  # es-major
        ],
    )
    got = {r["doc_id"]: r for r in filter_language(docs, "en").collect()}
    assert set(got) == {1, 3}
    assert got[3]["text"] == EN + "\n" + EN  # minority paragraph gone
    es = {r["doc_id"] for r in filter_language(docs, "es").collect()}
    assert es == {2, 4}


def test_plan_is_map_only(spark):
    from tests.test_plans import plan

    p = plan(split_languages(_docs(spark, [(1, EN)])))
    assert "Exchange" not in p
