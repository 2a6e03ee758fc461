"""Connected-components / dedup-clustering tests (engine/ops/graph.py).

Correctness is pinned three ways:
  * hand-built graphs with known components (chain, star, islands);
  * a pure-Python union-find oracle on a seeded random graph;
  * a DuckDB recursive-CTE oracle (transitive closure -> min reachable)
    on the same edge set — the same third-party-engine rigor the
    driver's CORRECTNESS gate applies to the q* registry queries.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from engine.ops.graph import connected_components, dedup_clusters


def _cc(spark, pairs):
    df = spark.createDataFrame(pairs, "src long, dst long")
    rows = connected_components(df).collect()
    return {r["node"]: r["component"] for r in rows}


def _union_find(n_nodes, pairs):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component id = min node of the component
    comp_min: dict[int, int] = {}
    for x in range(n_nodes):
        r = find(x)
        comp_min[r] = min(comp_min.get(r, x), x)
    return {x: comp_min[find(x)] for x in range(n_nodes)}


def test_chain_star_islands(spark):
    # chain 0-1-2-3-4, star 10<-{11,12,13}, island pair (20,21)
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (11, 10), (12, 10), (13, 10), (21, 20)]
    got = _cc(spark, pairs)
    assert got == {
        0: 0, 1: 0, 2: 0, 3: 0, 4: 0,
        10: 10, 11: 10, 12: 10, 13: 10,
        20: 20, 21: 20,
    }


def test_matches_union_find_on_random_graph(spark):
    rng = random.Random(42)
    n = 120
    pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(90)]
    pairs = [(a, b) for a, b in pairs if a != b]
    got = _cc(spark, pairs)
    want = _union_find(n, pairs)
    touched = {x for p in pairs for x in p}
    assert got == {x: want[x] for x in touched}


def test_matches_duckdb_recursive_cte(spark):
    rng = random.Random(7)
    n = 60
    pairs = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(45)})
    pairs = [(a, b) for a, b in pairs if a != b]
    got = _cc(spark, pairs)

    con = duckdb.connect()
    con.execute("CREATE TABLE edges (a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO edges VALUES (?, ?)", pairs)
    oracle = con.execute(
        """
        WITH RECURSIVE sym AS (
            SELECT a, b FROM edges UNION SELECT b, a FROM edges
        ), reach(src, dst) AS (
            SELECT a, b FROM sym
            UNION
            SELECT r.src, s.b FROM reach r JOIN sym s ON r.dst = s.a
        )
        SELECT src AS node, LEAST(src, MIN(dst)) AS component
        FROM reach GROUP BY src ORDER BY src
        """
    ).fetchall()
    assert got == {node: comp for node, comp in oracle}


def test_dedup_clusters_singletons_and_canonicals(spark):
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 4), (4, 6), (2, 3)], "doc_a long, doc_b long"
    )
    rows = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in dedup_clusters(docs, pairs).collect()
    }
    assert rows == {
        0: (0, 1),
        1: (1, 1), 4: (1, 0), 6: (1, 0),
        2: (2, 1), 3: (2, 0),
        5: (5, 1),
        7: (7, 1),
    }


def test_long_chain_converges_within_log_rounds(spark):
    # a 64-node chain has diameter 63; label propagation would need
    # ~63 rounds, large-star/small-star must finish inside max_iter=10
    pairs = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    rows = connected_components(df, max_iter=10).collect()
    assert {r["component"] for r in rows} == {0}
    assert {r["node"] for r in rows} == set(range(64))


def test_nonconvergence_raises_not_silent(spark):
    """Exhausting max_iter before the star fixpoint must raise, never
    return silently-wrong components (ADVICE r2); allow_nonconverged
    opts into the partial result and stats records the outcome."""
    pairs = [(i, i + 1) for i in range(63)]  # needs >1 round
    df = spark.createDataFrame(pairs, "src long, dst long")
    stats: dict = {}
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=1, stats=stats)
    assert stats == {"rounds": 1, "converged": False}

    stats = {}
    out = connected_components(
        df, max_iter=1, stats=stats, allow_nonconverged=True
    )
    assert stats["converged"] is False
    assert out.count() > 0  # best-effort partial result, explicitly opted into

    stats = {}
    connected_components(df, max_iter=10, stats=stats)
    assert stats["converged"] is True


def test_string_ids(spark):
    df = spark.createDataFrame(
        [("u/b", "u/c"), ("u/a", "u/b")], "src string, dst string"
    )
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == {"u/a": "u/a", "u/b": "u/a", "u/c": "u/a"}


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
