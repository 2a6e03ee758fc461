"""T1 (SURVEY.md §5): the Spark pipeline must equal the pure kernels
applied row-wise — byte-identical text per url (BASELINE.json:14)."""

from __future__ import annotations

import hashlib

import pytest

from engine.corpus import page_row
from engine.kernels.chunker import chunk_rows
from engine.pipeline import build_chunks, build_extracted, build_vectors
from engine.udfs import _route_and_extract_one

N = 400
SEED = 42


def _expected_extraction():
    """Driver-side reference: dedup latest-per-url, then kernel extract."""
    best: dict[str, tuple] = {}
    for i in range(N):
        url, ts, html, text, lang = page_row(SEED, i)
        key = url
        tie = int.from_bytes(
            hashlib.sha256(html or b"").digest()[:8], "big"
        )  # not used by pipeline; ties broken by ts then xxhash64(html)
        if key not in best or ts > best[key][0]:
            best[key] = (ts, html, lang)
    out = {}
    for url, (ts, html, lang) in best.items():
        path, text, err = _route_and_extract_one(html)
        out[url] = (path, text, err)
    return out


@pytest.fixture(scope="module")
def pages_df(spark):
    from engine.corpus import gen_pages_df

    df = gen_pages_df(spark, N, seed=SEED).cache()
    df.count()
    return df


def test_extracted_matches_kernels_bytewise(spark, pages_df):
    expected = _expected_extraction()
    got = {
        r["url"]: (r["path"], r["text"], r["error"])
        for r in build_extracted(pages_df).collect()
    }
    assert set(got) == set(expected)
    mismatches = [u for u in expected if got[u] != expected[u]]
    assert mismatches == [], f"byte mismatch for {mismatches[:5]}"


def test_chunks_match_kernel_chunker(spark, pages_df):
    expected = _expected_extraction()
    exp_chunks = {}
    for url, (path, text, err) in expected.items():
        if err is None and text:
            for ci, cs, ce, ss, se, ctext in chunk_rows(text):
                exp_chunks[(url, ci)] = (cs, ce, ss, se, ctext)
    extracted = build_extracted(pages_df)
    got = {
        (r["url"], r["chunk_ix"]): (
            r["char_start"],
            r["char_end"],
            r["sent_start"],
            r["sent_end"],
            r["chunk_text"],
        )
        for r in build_chunks(extracted).collect()
    }
    assert got == exp_chunks


def test_chunks_legacy_rows_without_spans(spark, pages_df):
    """An extracted table written BEFORE sent_spans existed reads back
    with null cells in that column — the chunk stage must recompute
    sentence detection for those rows and produce identical chunks."""
    from pyspark.sql import functions as F

    extracted = build_extracted(pages_df)
    legacy = extracted.withColumn(
        "sent_spans", F.lit(None).cast("array<int>")
    )
    a = {
        (r["url"], r["chunk_ix"]): r["chunk_sha256"]
        for r in build_chunks(extracted).collect()
    }
    b = {
        (r["url"], r["chunk_ix"]): r["chunk_sha256"]
        for r in build_chunks(legacy).collect()
    }
    assert a == b and len(a) > 0


def test_extracted_span_count_matches_n_sents(spark, pages_df):
    """n_sents and the carried sent_spans must stay consistent — the
    chunker trusts the spans without re-checking."""
    from pyspark.sql import functions as F

    bad = (
        build_extracted(pages_df)
        .filter(F.col("error").isNull())
        .filter(F.size("sent_spans") != F.col("n_sents") * 2)
        .count()
    )
    assert bad == 0


def test_sha256_jvm_matches_python(spark, pages_df):
    """JVM sha2() must agree with hashlib over utf-8 — the lineage and
    dedup keys depend on it."""
    rows = build_extracted(pages_df).select("url", "text", "content_sha256").collect()
    for r in rows[:50]:
        if r["text"] is not None:
            assert (
                hashlib.sha256(r["text"].encode("utf-8")).hexdigest()
                == r["content_sha256"]
            )


def test_vectors_schema_and_determinism(spark, pages_df):
    extracted = build_extracted(pages_df)
    vecs = build_vectors(build_chunks(extracted))
    a = {r["vec_id"]: r["embedding"] for r in vecs.collect()}
    b = {r["vec_id"]: r["embedding"] for r in vecs.collect()}
    assert a == b and len(a) > 0
    one = next(iter(a.values()))
    assert len(one) == 64


def test_lineage_trailers_with_map_counts(spark, pages_df):
    """A11: one trailer row per task; path_counts map<string,long>
    (SURVEY.md §1.2) agrees with the flat columns and with the data."""
    from pyspark.sql import functions as F

    from engine.lineage import build_lineage

    extracted = build_extracted(pages_df)
    lin = build_lineage(extracted, "t-run")
    assert dict(lin.dtypes)["path_counts"] == "map<string,bigint>"
    agg = lin.agg(
        F.sum("n_rows").alias("rows"),
        F.sum("n_html").alias("flat_html"),
        F.sum(F.element_at("path_counts", F.lit("html"))).alias("map_html"),
        F.sum(F.element_at("path_counts", F.lit("pdf_ocr"))).alias("map_ocr"),
        F.sum("n_pdf_ocr").alias("flat_ocr"),
    ).collect()[0]
    assert agg["rows"] == extracted.count()
    assert agg["map_html"] == agg["flat_html"] > 0
    assert agg["map_ocr"] == agg["flat_ocr"]


def test_cos_pairs_udf_zero_norm_yields_null(spark):
    """Zero-norm vectors must produce NULL (as the JVM Divide and the
    DuckDB oracle do), never NaN — Spark sorts NaN above every real
    similarity and NaN passes >= filters."""
    from pyspark.sql import functions as F

    from engine.udfs import cos_pairs_udf

    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0]), ([1.0, 0.0], [1.0, 0.0])],
        "a array<float>, b array<float>",
    )
    rows = df.select(cos_pairs_udf("a", "b").alias("c")).collect()
    assert rows[0]["c"] is None
    assert abs(rows[1]["c"] - 1.0) < 1e-9
    assert df.filter(cos_pairs_udf("a", "b") >= 0.4).count() == 1


def test_lineage_wall_ms_apportioned_not_multicounted():
    """Round-3 review: with `by` set, a task spanning K buckets emits K
    trailer rows whose wall_ms must SUM to ~the task wall (row-share
    apportioning), not K copies of the full wall — summing wall_ms
    over the lineage table is the natural dashboard query and must not
    multi-count. Called in-process with a slow batch iterator so the
    task wall is known to within scheduling noise."""
    import time as _time

    import pandas as pd

    from engine.lineage import lineage_map_in_pandas

    pdf = pd.DataFrame(
        {
            "path": ["html"] * 8,
            "error": [None] * 8,
            "n_chars": [10] * 8,
            "pbucket": [0, 0, 0, 0, 1, 1, 2, 3],
        }
    )

    def slow_batches():
        yield pdf.iloc[:4]
        _time.sleep(0.08)
        yield pdf.iloc[4:]

    t0 = _time.monotonic()
    (out,) = list(lineage_map_in_pandas("r", by="pbucket")(slow_batches()))
    outer_ms = (_time.monotonic() - t0) * 1000
    walls = dict(zip(out["pbucket"], out["wall_ms"]))
    total = sum(walls.values())
    # the old bug gave total ~= 4 * outer_ms; apportioned it is ~outer
    assert total <= outer_ms + len(walls), (total, outer_ms)
    assert total >= 0.5 * outer_ms
    # shares follow row counts (4:2:1:1 over 8 rows) up to rounding
    assert walls[0] >= walls[1] >= walls[2]
    assert abs(walls[2] - walls[3]) <= 1
