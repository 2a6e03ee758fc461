"""Link graph: outlink kernel (engine/kernels/outlinks), host-edge
aggregation, and PageRank centrality (engine/ops/linkgraph).

PageRank is pinned against an independent numpy power-iteration
reference implementing the same published formula (uniform teleport,
dangling mass redistributed uniformly). Float sums over shuffled
partitions reproduce to rounding, so equality is at 1e-6 — the
documented contract — not bytes.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from engine.kernels.outlinks import extract_outlinks


def _page(body: str) -> bytes:
    return f"<html><head><title>t</title></head><body>{body}</body></html>".encode()


# ---------------------------------------------------------------- kernel


def test_kernel_resolves_relative_and_filters_schemes():
    raw = _page(
        '<a href="/about">a</a>'
        '<a href="sub/page.html">b</a>'
        '<a href="//cdn.other.com/x">c</a>'
        '<a href="https://ext.com/p?q=1#frag">d</a>'
        '<a href="mailto:x@y.com">e</a>'
        '<a href="javascript:void(0)">f</a>'
        '<a href="#top">g</a>'
        "<a>no href</a>"
    )
    links = extract_outlinks("https://www.site.com/dir/index.html", raw)
    assert links == [
        "https://www.site.com/about",
        "https://www.site.com/dir/sub/page.html",
        "https://cdn.other.com/x",
        "https://ext.com/p?q=1",  # fragment stripped, query kept
    ]


def test_kernel_dedup_order_and_cap():
    body = "".join(f'<a href="/p{i % 7}">x</a>' for i in range(50))
    links = extract_outlinks("http://h.com/", _page(body))
    assert links == [f"http://h.com/p{i}" for i in range(7)]  # first-seen order
    capped = extract_outlinks("http://h.com/", _page(body), max_links=3)
    assert capped == [f"http://h.com/p{i}" for i in range(3)]


def test_kernel_total_on_garbage():
    assert extract_outlinks("http://h.com/", None) == []
    assert extract_outlinks(None, b"<a href='/x'>") == []
    assert extract_outlinks("http://h.com/", b"%PDF-1.4 \x00\x01\x02") == []
    # malformed tail after a good link keeps the good link
    raw = b"<a href='http://ok.com/a'>x</a><a href='http://\xff\xfe"
    assert "http://ok.com/a" in extract_outlinks("http://h.com/", raw)


# ------------------------------------------------------------- pagerank


def _np_pagerank(edge_list, weights, damping=0.85, iters=200):
    """Independent dense reference: same formula, same teleport and
    dangling handling, run to (beyond) fixpoint."""
    nodes = sorted({u for u, _ in edge_list} | {v for _, v in edge_list})
    ix = {h: i for i, h in enumerate(nodes)}
    n = len(nodes)
    W = np.zeros((n, n))
    for (u, v), w in zip(edge_list, weights):
        W[ix[u], ix[v]] += w
    out = W.sum(axis=1)
    P = np.divide(W, out[:, None], out=np.zeros_like(W), where=out[:, None] > 0)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[out == 0].sum()
        r = (1 - damping) / n + damping * (P.T @ r + dangling / n)
    return {h: r[ix[h]] for h in nodes}


EDGES = [
    ("a.com", "b.com"),
    ("a.com", "c.com"),
    ("b.com", "c.com"),
    ("c.com", "a.com"),
    ("d.com", "c.com"),  # e.com (below) is dangling: only an in-edge
    ("d.com", "e.com"),
]
WEIGHTS = [3.0, 1.0, 2.0, 1.0, 1.0, 5.0]


def test_pagerank_matches_numpy_reference(spark):
    from engine.ops.linkgraph import pagerank

    df = spark.createDataFrame(
        [(u, v, w) for (u, v), w in zip(EDGES, WEIGHTS)],
        "src string, dst string, n_links double",
    )
    stats = {}
    # fixed-iteration mode: exactly 30 rounds on BOTH sides pins the
    # published formula itself, not just its fixpoint
    got = {
        r["node"]: r["rank"]
        for r in pagerank(
            df, weight="n_links", tol=0, max_iter=30, stats=stats
        ).collect()
    }
    ref = _np_pagerank(EDGES, WEIGHTS, iters=30)
    assert set(got) == set(ref)
    for h in ref:
        assert got[h] == pytest.approx(ref[h], abs=1e-9), h
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)  # mass conserved
    assert stats["rounds"] == 30 and stats["delta"] is None


def test_pagerank_unweighted_and_partition_invariant(spark):
    from engine.ops.linkgraph import pagerank

    df = spark.createDataFrame(EDGES, "src string, dst string")
    a = {
        r["node"]: r["rank"] for r in pagerank(df, tol=0, max_iter=30).collect()
    }
    b = {
        r["node"]: r["rank"]
        for r in pagerank(df.repartition(7, "dst"), tol=0, max_iter=30).collect()
    }
    ref = _np_pagerank(EDGES, [1.0] * len(EDGES), iters=30)
    for h in ref:
        assert a[h] == pytest.approx(ref[h], abs=1e-6)
        assert a[h] == pytest.approx(b[h], abs=1e-6)


def test_pagerank_nonconvergence_raises(spark):
    from engine.ops.linkgraph import pagerank

    df = spark.createDataFrame(EDGES, "src string, dst string")
    with pytest.raises(RuntimeError, match="did not converge"):
        pagerank(df, max_iter=1, tol=1e-12)
    # convergence mode succeeds at a loose tol and reports the delta
    stats = {}
    pagerank(df, tol=1e-2, max_iter=40, stats=stats)
    assert stats["delta"] < 1e-2 and stats["rounds"] < 40


# ---------------------------------------------------- end-to-end + plans


def _cross_host_pages(spark):
    rows = [
        (
            "http://hub.com/",
            _page('<a href="http://spoke1.com/">1</a><a href="http://spoke2.com/">2</a>'),
        ),
        (
            "http://spoke1.com/",
            _page('<a href="http://hub.com/">h</a><a href="/self">s</a>'),
        ),
        ("http://spoke2.com/", _page('<a href="http://hub.com/">h</a>')),
        ("http://loner.com/", _page("<p>no links at all</p>")),
    ]
    return spark.createDataFrame(rows, "url string, html binary")


def test_host_rank_end_to_end(spark):
    from engine.ops.linkgraph import extract_outlinks_df, host_edges, host_rank

    pages = _cross_host_pages(spark)
    links = extract_outlinks_df(pages)
    edges = host_edges(links)
    e = {(r["src"], r["dst"]): r["n_links"] for r in edges.collect()}
    # self-host link (spoke1 -> /self) must be dropped
    assert e == {
        ("hub.com", "spoke1.com"): 1,
        ("hub.com", "spoke2.com"): 1,
        ("spoke1.com", "hub.com"): 1,
        ("spoke2.com", "hub.com"): 1,
    }
    ranks = {
        r["host"]: r["rank"]
        for r in host_rank(pages, tol=0, max_iter=25).collect()
    }
    # hub is pointed at by both spokes: strictly the highest rank;
    # loner.com has no edges and is absent (caller coalesces a default)
    assert set(ranks) == {"hub.com", "spoke1.com", "spoke2.com"}
    assert ranks["hub.com"] > max(ranks["spoke1.com"], ranks["spoke2.com"])
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)


def test_outlink_extraction_is_map_only(spark):
    from engine.ops.linkgraph import extract_outlinks_df
    from tests.test_plans import plan

    p = plan(extract_outlinks_df(_cross_host_pages(spark)))
    assert "Exchange" not in p, p


def test_malformed_urls_and_null_endpoints_are_safe(spark):
    from engine.ops.linkgraph import host_edges, pagerank

    links = spark.createDataFrame(
        [
            ("http://a.com/x", "http://b.com/y"),
            ("not a url at all", "http://b.com/y"),  # try_parse_url -> NULL
            ("http://a.com/x", None),
        ],
        "url string, dst string",
    )
    e = host_edges(links)
    assert {(r["src"], r["dst"]) for r in e.collect()} == {("a.com", "b.com")}
    # null endpoints dropped at pagerank entry: mass still sums to 1
    edges = spark.createDataFrame(
        [("a", "b"), (None, "b"), ("a", None)], "src string, dst string"
    )
    ranks = pagerank(edges, tol=0, max_iter=10).collect()
    assert {r["node"] for r in ranks} == {"a", "b"}
    assert sum(r["rank"] for r in ranks) == pytest.approx(1.0, abs=1e-9)


# ------------------------------------------------------- anchor text


def test_kernel_anchor_text_semantics():
    from engine.kernels.outlinks import MAX_ANCHOR_CHARS, extract_anchors

    raw = _page(
        '<a href="http://a.com/1">  Read <b>more</b>\n here </a>'
        '<a href="http://a.com/2">second'  # implicitly closed by next <a>
        '<a href="http://a.com/1">dup url keeps FIRST anchor</a>'
        '<a href="http://a.com/3">' + "x" * 600
    )
    got = extract_anchors("http://h.com/", raw)
    d = dict(got)
    assert d["http://a.com/1"] == "Read more here"  # collapsed, tags skipped
    assert d["http://a.com/2"] == "second"
    assert len(d["http://a.com/3"]) == MAX_ANCHOR_CHARS  # capped
    assert [u for u, _ in got] == [
        "http://a.com/1",
        "http://a.com/2",
        "http://a.com/3",  # unclosed at EOF still kept
    ]


def test_top_anchors_aggregation(spark):
    from engine.ops.linkgraph import top_anchors

    rows = (
        [("s", "http://t.com/x", "Widgets")] * 3
        + [("s", "http://t.com/x", "Best Widgets")] * 3
        + [("s", "http://t.com/x", "spam")] * 1
        + [("s", "http://t.com/x", "  ")] * 9  # empty anchors filtered
        + [("s", "http://t.com/y", "Other")]
    )
    links = spark.createDataFrame(rows, "url string, dst string, anchor string")
    got = {r["dst"]: r["top_anchors"] for r in top_anchors(links, k=2).collect()}
    x = [(a["anchor"], a["n"]) for a in got["http://t.com/x"]]
    # tie at n=3 breaks on anchor text ascending; k bounds the array
    assert x == [("Best Widgets", 3), ("Widgets", 3)]
    assert [(a["anchor"], a["n"]) for a in got["http://t.com/y"]] == [("Other", 1)]
    # partition invariance
    got2 = {
        r["dst"]: r["top_anchors"]
        for r in top_anchors(links.repartition(7, "anchor"), k=2).collect()
    }
    assert got == got2


def test_anchor_extraction_df_is_map_only(spark):
    from engine.ops.linkgraph import extract_anchors_df
    from tests.test_plans import plan

    df = extract_anchors_df(_cross_host_pages(spark))
    assert "Exchange" not in plan(df)
    rows = df.collect()
    assert {(r["url"], r["dst"]) for r in rows} >= {
        ("http://hub.com/", "http://spoke1.com/"),
        ("http://hub.com/", "http://spoke2.com/"),
    }
    assert all(r["anchor"] is not None for r in rows)


def test_linkgraph_job_end_to_end(spark, tmp_path):
    """jobs/linkgraph.py: pages -> links/edges/host_rank/top_anchors
    tables; converged rank joins back as a quality prior."""
    import types

    from jobs.linkgraph import run

    pages_path = str(tmp_path / "pages")
    _cross_host_pages(spark).write.parquet(pages_path)
    out = str(tmp_path / "lg")
    res = run(
        types.SimpleNamespace(
            pages=pages_path,
            output=out,
            master="local[4]",
            shuffle_partitions=4,
        )
    )
    assert res["edges"] == 4 and res["hosts"] == 3
    assert res["pagerank_delta"] is not None and res["pagerank_delta"] < 1e-6
    ranks = {
        r["host"]: r["rank"]
        for r in spark.read.parquet(f"{out}/host_rank").collect()
    }
    assert ranks["hub.com"] > max(ranks["spoke1.com"], ranks["spoke2.com"])
    ta = {
        r["dst"]: r["top_anchors"]
        for r in spark.read.parquet(f"{out}/top_anchors").collect()
    }
    assert ta["http://hub.com/"][0]["anchor"] == "h"  # both spokes say "h"
    assert ta["http://hub.com/"][0]["n"] == 2
