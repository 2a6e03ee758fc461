"""q47_chunk_pack (A7 value-exact, VERDICT r4 next #7): the greedy
sentence-packing chunker vs its DuckDB recursive-CTE replication,
checked locally at sf0.001 so the driver's CORRECTNESS gate is not
the first place a packing regression would surface. Also pins that
the corpus actually exercises BOTH overlap regimes (with-overlap
re-start and the degenerate-overlap skip) — an oracle that only ever
walks one branch of the recursion proves less than it looks."""

from __future__ import annotations

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from engine.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=4)


def test_q47_matches_duckdb_oracle(spark):
    from engine.queries_extract import ALL

    fn, oracle = ALL["q47_chunk_pack"]
    assert oracle is not None
    srows = sorted(tuple(r) for r in fn(spark, SF).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    orows = sorted(tuple(r) for r in con.execute(oracle).fetchall())
    assert len(srows) > 0
    assert srows == orows


def test_q47_corpus_fires_both_overlap_branches(spark):
    from engine.kernels.chunker import chunk_text
    from engine.queries_extract import _word_spans

    docs = [
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .filter("doc_id < 100")
        .collect()
    ]
    skip = overlap = 0
    for _, text in docs:
        spans = _word_spans(text)
        ch = chunk_text(text, max_chars=8, spans=spans)
        for k in range(1, len(ch)):
            if ch[k].sent_start == ch[k - 1].sent_end:
                skip += 1  # re-start without overlap (degenerate edge)
            else:
                overlap += 1  # the normal 1-sentence overlap
    assert skip > 0 and overlap > 0


def test_word_spans_rule_matches_sql_offsets():
    """The disclosed span rule both sides share: offsets count every
    separator (runs of spaces advance, emit nothing)."""
    from engine.queries_extract import _word_spans

    assert _word_spans("ab c") == [(0, 2), (3, 4)]
    assert _word_spans("ab  c") == [(0, 2), (4, 5)]
    assert _word_spans(" a") == [(1, 2)]
    assert _word_spans("") == []
    assert _word_spans("   ") == []
