"""Batch incremental near-dup (engine/ops/dedup.incremental_candidate_
pairs + jobs/dedup.py --index): new-batch-vs-persisted-index dedup
without re-fingerprinting the corpus."""

from __future__ import annotations

import types

import pytest
from pyspark.sql import functions as F

from engine.ops.dedup import (
    incremental_candidate_pairs,
    minhash_bands,
    minhash_candidate_pairs,
)

SF_01 = "/root/testdata/sf0.01"


def _pairset(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.select("doc_a", "doc_b").collect()}


def test_incremental_equals_full_corpus_pairs(spark):
    """Ground truth: pairs(old ∪ new) == pairs(old) ∪ incremental(new
    vs index(old)) when no bucket saturates — the incremental path
    loses nothing relative to a monolithic re-run."""
    docs = (
        spark.read.parquet(f"{SF_01}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.length("text") > 0)
    )
    old = docs.filter("doc_id % 3 != 0")
    new = docs.filter("doc_id % 3 = 0")

    full = _pairset(minhash_candidate_pairs(docs, n_bands=8, rows_per_band=4))
    old_pairs = _pairset(minhash_candidate_pairs(old, n_bands=8, rows_per_band=4))
    idx = minhash_bands(old, n_bands=8, rows_per_band=4)
    inc_pairs, new_bands = incremental_candidate_pairs(
        new, idx, n_bands=8, rows_per_band=4
    )
    assert old_pairs | _pairset(inc_pairs) == full
    # band table shape matches the persisted-index contract
    assert new_bands.columns == ["doc_id", "band", "bh"]
    assert new_bands.count() == new.count() * 8


def test_incremental_src_labels(spark):
    rows = [(1, "alpha beta gamma delta " * 20)]
    old = spark.createDataFrame(rows, "doc_id long, text string")
    new = spark.createDataFrame(
        [(10, rows[0][1]), (11, "zeta eta theta iota " * 20), (12, "zeta eta theta iota " * 20)],
        "doc_id long, text string",
    )
    idx = minhash_bands(old)
    pairs, _ = incremental_candidate_pairs(new, idx)
    got = {(r["doc_a"], r["doc_b"]): r["src"] for r in pairs.collect()}
    assert got[(1, 10)] == "index"
    assert got[(11, 12)] == "batch"
    assert len(got) == 2


def test_incremental_hot_index_bucket_star_links(spark):
    """A saturated index bucket (boilerplate) star-links each new doc
    to the bucket's minimum corpus id only — fan-out O(1) per new doc
    instead of O(bucket occupancy)."""
    text = "the same boilerplate nav line repeated " * 30
    old = spark.createDataFrame(
        [(i, text) for i in range(100, 150)], "doc_id long, text string"
    )
    new = spark.createDataFrame([(7, text)], "doc_id long, text string")
    idx = minhash_bands(old)
    stats = {}
    pairs, _ = incremental_candidate_pairs(
        new, idx, hot_bucket_cap=8, stats=stats
    )
    got = _pairset(pairs)
    assert got == {(7, 100)}  # min corpus id only, not 50 pairs
    assert stats["hot_buckets"] > 0


def test_incremental_job_end_to_end(spark, tmp_path):
    """Bootstrap (--write-bands) -> incremental run (--index
    --update-index): corpus dups dropped, batch dups clustered,
    updated index covers survivors."""
    from jobs.dedup import run

    # per-doc-distinct tokens: corpus docs must NOT near-dup each other,
    # so the full run keeps all 10 as canonical
    old_rows = [
        (i, f"unique original content piece number {i} with words "
            + " ".join(f"tok{i}x{j}" for j in range(30)))
        for i in range(10)
    ]
    new_rows = [
        (100, old_rows[3][1]),            # dup of corpus doc 3 -> dropped
        (101, "brand new page alpha " * 25),
        (102, "brand new page alpha " * 25),  # dup within batch
        (103, "completely different page " * 25),
    ]
    old_p = str(tmp_path / "old")
    new_p = str(tmp_path / "new")
    spark.createDataFrame(old_rows, "doc_id long, text string").write.parquet(old_p)
    spark.createDataFrame(new_rows, "doc_id long, text string").write.parquet(new_p)

    def ns(**kw):
        d = dict(
            id_col="doc_id",
            text_col="text",
            method="minhash",
            bands=8,
            rows_per_band=4,
            max_hamming=8,
            verify_jaccard=None,
            hot_bucket_cap=256,
            master="local[4]",
            shuffle_partitions=4,
            index=None,
            update_index=False,
            write_bands=False,
        )
        d.update(kw)
        return types.SimpleNamespace(**d)

    out1 = str(tmp_path / "full")
    res1 = run(ns(input=old_p, output=out1, write_bands=True))
    # --write-bands persists CANONICAL survivors only (the invariant
    # --update-index maintains), not every corpus doc
    n_corpus_canon = res1["kept"]
    bands = spark.read.parquet(f"{out1}/bands")
    assert bands.count() == n_corpus_canon * 8
    assert bands.select("doc_id").distinct().count() == n_corpus_canon

    out2 = str(tmp_path / "incr")
    res = run(
        ns(
            input=new_p,
            output=out2,
            index=f"{out1}/bands",
            update_index=True,
        )
    )
    assert res["mode"] == "incremental"
    assert res["docs"] == 4
    assert res["dropped_vs_index"] == 1  # doc 100
    assert res["kept"] == 2  # 103 + one of {101,102}
    canon = {r["doc_id"] for r in spark.read.parquet(f"{out2}/canonical").collect()}
    assert 103 in canon and 100 not in canon
    assert len(canon & {101, 102}) == 1
    # updated index = corpus canonical docs + the 2 CANONICAL batch
    # survivors (100 dropped vs corpus; non-canonical batch dup excluded)
    upd = spark.read.parquet(f"{out2}/bands")
    assert upd.count() == (n_corpus_canon + 2) * 8
    assert upd.filter("doc_id = 100").count() == 0
    assert upd.filter("doc_id = 103").count() == 8


def test_incremental_job_rejects_verify(spark, tmp_path):
    from jobs.dedup import run

    p = str(tmp_path / "d")
    spark.createDataFrame([(1, "x " * 50)], "doc_id long, text string").write.parquet(p)
    with pytest.raises(SystemExit):
        run(
            types.SimpleNamespace(
                input=p,
                output=str(tmp_path / "o"),
                id_col="doc_id",
                text_col="text",
                method="minhash",
                bands=8,
                rows_per_band=4,
                max_hamming=8,
                verify_jaccard=0.5,
                hot_bucket_cap=256,
                master="local[4]",
                shuffle_partitions=4,
                index=p,
                update_index=False,
                write_bands=False,
            )
        )


def test_incremental_reingestion_and_empty_docs(spark, tmp_path):
    """Round-3 review regressions, all in one job run:
    (a) a batch doc whose id is ALREADY IN the index (cron re-crawl of
        an unchanged page) is dropped and its bands are not re-appended
        — previously it duplicated the corpus and bloated the index;
    (b) a genuinely-new near-dup of that re-ingested doc keeps the
        'index' label (corpus collision wins over 'batch') and is
        dropped too;
    (c) empty-text batch docs stay as singletons in canonical and are
        not miscounted as dedup removals."""
    from jobs.dedup import run

    # per-doc-distinct tokens (see test_incremental_job_end_to_end):
    # all 10 corpus docs stay canonical, so doc 3 is in the index
    old_rows = [
        (i, f"unique original content piece number {i} with words "
            + " ".join(f"tok{i}x{j}" for j in range(30)))
        for i in range(10)
    ]
    new_rows = [
        (3, old_rows[3][1]),        # re-ingestion: same id, same text
        (200, old_rows[3][1]),      # new near-dup of re-ingested doc 3
        (201, "fresh standalone page " * 25),
        (202, ""),                  # empty text: kept as singleton
        (203, None),                # null text: kept as singleton
    ]
    old_p, new_p = str(tmp_path / "old"), str(tmp_path / "new")
    spark.createDataFrame(old_rows, "doc_id long, text string").write.parquet(old_p)
    spark.createDataFrame(new_rows, "doc_id long, text string").write.parquet(new_p)

    def ns(**kw):
        d = dict(
            id_col="doc_id", text_col="text", method="minhash", bands=8,
            rows_per_band=4, max_hamming=8, verify_jaccard=None,
            hot_bucket_cap=256, master="local[4]", shuffle_partitions=4,
            index=None, update_index=False, write_bands=False,
        )
        d.update(kw)
        return types.SimpleNamespace(**d)

    out1 = str(tmp_path / "full")
    run(ns(input=old_p, output=out1, write_bands=True))

    out2 = str(tmp_path / "incr")
    res = run(ns(input=new_p, output=out2, index=f"{out1}/bands", update_index=True))
    canon = {r["doc_id"] for r in spark.read.parquet(f"{out2}/canonical").collect()}
    assert canon == {201, 202, 203}        # (a)+(b) dropped, (c) kept
    assert res["reingested"] == 1
    assert res["dropped_vs_index"] == 2    # doc 3 (by id) + doc 200 (by bands)
    assert res["removed"] == 2             # empties NOT counted as removals
    # (a) index not bloated: corpus 10 docs + canonical survivor 201 only
    upd = spark.read.parquet(f"{out2}/bands")
    assert upd.count() == (10 + 1) * 8
    assert upd.filter("doc_id = 3").count() == 8  # original entry, once


def test_incremental_untouched_hot_index_bucket_ignored(spark):
    """The hot-bucket guard probes only buckets the batch touches: a
    saturated index bucket the batch never joins costs nothing and is
    not reported in stats."""
    boiler = "the same boilerplate nav line repeated " * 30
    old = spark.createDataFrame(
        [(i, boiler) for i in range(100, 150)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(7, "entirely unrelated fresh content words " * 30)],
        "doc_id long, text string",
    )
    stats = {}
    pairs, _ = incremental_candidate_pairs(
        new, minhash_bands(old), hot_bucket_cap=8, stats=stats
    )
    assert pairs.count() == 0
    assert stats["hot_buckets"] == 0


def test_incremental_batch_side_hot_bucket_counted(spark):
    """Batch-internal saturation is visible through the stats hook
    (previously only index-side splits were counted)."""
    boiler = "identical batch boilerplate page body text " * 30
    old = spark.createDataFrame(
        [(1, "some unrelated corpus doc " * 30)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(i, boiler) for i in range(50)], "doc_id long, text string"
    )
    stats = {}
    pairs, _ = incremental_candidate_pairs(
        new, minhash_bands(old), hot_bucket_cap=8, stats=stats
    )
    assert stats["hot_buckets"] > 0
    # saturation star-links batch docs to the bucket minimum: O(n) pairs
    n = pairs.count()
    assert 0 < n <= 49 * 8


def test_incremental_transitive_corpus_drop(spark):
    """Round-3 review: a batch doc whose only link to the corpus runs
    THROUGH another dropped batch doc must also drop — the verdict is
    component-level, matching full-mode clustering over old ∪ new.
    Graph: corpus C=1 — X=10 ('index' pair), X=10 — Y=11 ('batch'
    pair, no shared band with C), plus an untainted pair 20—21 and a
    pair-free singleton 30."""
    from engine.ops.graph import incremental_dedup_clusters

    batch = spark.createDataFrame(
        [(10,), (11,), (20,), (21,), (30,)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(1, 10, "index"), (10, 11, "batch"), (20, 21, "batch")],
        "doc_a long, doc_b long, src string",
    )
    dropped, clusters = incremental_dedup_clusters(batch, pairs)
    assert {r["doc_id"] for r in dropped.collect()} == {10, 11}
    got = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in clusters.collect()
    }
    assert got == {20: (20, 1), 21: (20, 0), 30: (30, 1)}


def test_incremental_reingested_id_taints_its_component(spark):
    """A re-ingested id (already in the index) stands for a corpus
    doc: batch docs clustered with it drop transitively too."""
    from engine.ops.graph import incremental_dedup_clusters

    batch = spark.createDataFrame([(5,), (6,), (7,)], "doc_id long")
    pairs = spark.createDataFrame(
        [(5, 6, "batch")], "doc_a long, doc_b long, src string"
    )
    reingested = spark.createDataFrame([(5,)], "doc_id long")
    dropped, clusters = incremental_dedup_clusters(
        batch, pairs, reingested=reingested
    )
    assert {r["doc_id"] for r in dropped.collect()} == {5, 6}
    got = {r["doc_id"]: r["cluster_id"] for r in clusters.collect()}
    assert got == {7: 7}


def test_incremental_job_drops_transitive_chain(spark, tmp_path):
    """Job-level: jobs/dedup.py --index drops a Y that near-dups X
    (dropped vs corpus) even when Y itself never collides with the
    corpus index. The index is crafted to hold only ONE of X's bands,
    and Y is searched to share a band with X but not THAT band."""
    import types

    import jobs.dedup as dj

    base = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed "
            "do eiusmod tempor incididunt ut labore et dolore magna "
            "aliqua ut enim ad minim veniam quis nostrud exercitation ")
    x_text = base * 3
    x = spark.createDataFrame([(10, x_text)], "doc_id long, text string")
    x_bands = {
        (r["band"], r["bh"])
        for r in minhash_bands(x, n_bands=8, rows_per_band=4).collect()
    }
    # find a Y sharing >=1 band with X but NOT band_c (the corpus band)
    y_text = None
    for i in range(200):
        cand = x_text.replace("dolor", f"dolor{i}", 1)
        ydf = spark.createDataFrame([(11, cand)], "doc_id long, text string")
        yb = {
            (r["band"], r["bh"])
            for r in minhash_bands(ydf, n_bands=8, rows_per_band=4).collect()
        }
        shared = x_bands & yb
        only_x = x_bands - yb
        if shared and only_x:
            band_c = sorted(only_x)[0]  # corpus band Y does NOT hit
            y_text = cand
            break
    assert y_text is not None, "no Y candidate found"

    # corpus doc C=1 holds exactly the band of X that Y misses
    idx_path = str(tmp_path / "bands_idx")
    spark.createDataFrame(
        [(1, band_c[0], band_c[1])], "doc_id long, band int, bh long"
    ).write.parquet(idx_path)
    in_path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(10, x_text), (11, y_text)], "doc_id long, text string"
    ).write.parquet(in_path)

    res = dj.run(
        types.SimpleNamespace(
            input=in_path, output=str(tmp_path / "out"), id_col="doc_id",
            text_col="text", method="minhash", bands=8, rows_per_band=4,
            max_hamming=8, verify_jaccard=None, hot_bucket_cap=256,
            index=idx_path, update_index=True, write_bands=False,
            master="local[4]", shuffle_partitions=4,
        )
    )
    assert res["kept"] == 0 and res["removed"] == 2
    # the index gained NO bands: neither X nor Y survived
    n_idx = spark.read.parquet(str(tmp_path / "out" / "bands")).count()
    assert n_idx == 1
