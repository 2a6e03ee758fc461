"""Web link graph: outlink edges -> host graph -> PageRank centrality.

Why a training-data pipeline wants this: link-graph centrality is a
standard document-quality prior for web corpora (Brin & Page 1998;
Common Crawl ships host-level webgraph releases for exactly this use).
A host's rank joins back onto the pages table as a quality feature for
curation (engine/ops/curate.py rules or the trainable classifier in
engine/ops/classify.py can consume it as a column).

Spark-first shapes (all sizes relative to a 10^12-page corpus):

  extract_outlinks_df   map-only: ONE Arrow-batched pandas UDF per page
                        (kernel engine/kernels/outlinks), explode to
                        (url, dst). The html column never shuffles.
  host_edges            parse_url(HOST) in JVM codegen + one groupBy —
                        the edge table collapses from O(pages*links) to
                        O(distinct host pairs), which is what every
                        later iteration pays for. This is the published
                        scale discipline (CC webgraph is host-level).
  pagerank              classic power iteration as relational ops:
                        per iteration one equi-join of edges with the
                        rank table on src + one groupBy(dst) sum. Rank
                        state is |hosts| rows (~10^8 at full CC scale —
                        a shuffle join, never a broadcast requirement).
                        Dangling-mass and L1-delta are SCALAR aggregates
                        (one row to the driver per iteration, the
                        engine/ops/graph.py convergence discipline);
                        lineage truncated per iteration via
                        localCheckpoint. Float sums over shuffled
                        partitions are reproducible only to rounding,
                        so determinism is to tolerance, not bytes
                        (tests pin 1e-6 partition invariance).

Reference formulation (public): PageRank with uniform teleport,
damping d: r' = (1-d)/N + d * (sum_in r/outdeg + dangling_mass/N).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from engine.kernels.outlinks import DEFAULT_MAX_LINKS


def outlinks_udf(max_links: int = DEFAULT_MAX_LINKS):
    from engine.kernels.outlinks import extract_outlinks

    @pandas_udf("array<string>")
    def _udf(url: pd.Series, html: pd.Series) -> pd.Series:
        return pd.Series(
            [extract_outlinks(u, b, max_links) for u, b in zip(url, html)]
        )

    return _udf


def extract_outlinks_df(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    max_links: int = DEFAULT_MAX_LINKS,
) -> DataFrame:
    """pages -> (url, dst): one row per distinct outlink. Map-only."""
    return pages.select(
        F.col(url_col).alias("url"),
        F.explode(outlinks_udf(max_links)(F.col(url_col), F.col(html_col))).alias(
            "dst"
        ),
    )


def anchors_udf(max_links: int = DEFAULT_MAX_LINKS):
    from engine.kernels.outlinks import extract_anchors

    @pandas_udf("array<struct<dst:string,anchor:string>>")
    def _udf(url: pd.Series, html: pd.Series) -> pd.Series:
        return pd.Series(
            [
                [{"dst": u, "anchor": a} for u, a in extract_anchors(u0, b, max_links)]
                for u0, b in zip(url, html)
            ]
        )

    return _udf


def extract_anchors_df(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    max_links: int = DEFAULT_MAX_LINKS,
) -> DataFrame:
    """pages -> (url, dst, anchor): one row per distinct outlink with
    the linking page's anchor text. Map-only."""
    return pages.select(
        F.col(url_col).alias("url"),
        F.explode(anchors_udf(max_links)(F.col(url_col), F.col(html_col))).alias("_l"),
    ).select("url", F.col("_l.dst").alias("dst"), F.col("_l.anchor").alias("anchor"))


def top_anchors(
    links: DataFrame,
    k: int = 5,
    dst: str = "dst",
    anchor: str = "anchor",
) -> DataFrame:
    """(.., dst, anchor) -> (dst, top_anchors array<struct<anchor,n>>):
    the k most frequent non-empty anchor texts pointing at each target
    url — the classic inlink description signal (retrieval metadata a
    vector sink can carry per document, cf. engine/kernels/docmeta).

    Scale shapes: ONE groupBy(dst, anchor) count (map-side combinable,
    so a nav anchor repeated 10^9 times pre-reduces per partition),
    then a row_number window over (dst) of the already-aggregated
    (dst, anchor, n) triples — bounded rows per dst by distinct
    anchors, never by inlink count — kept to k before the per-dst
    collect_list, so the assembled array is bounded at k by
    construction. Ties break on anchor text: deterministic under
    repartitioning."""
    from pyspark.sql import Window

    per = (
        links.filter(F.length(F.trim(F.col(anchor))) > 0)
        .groupBy(F.col(dst).alias("dst"), F.col(anchor).alias("anchor"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("dst").orderBy(F.desc("n"), F.asc("anchor"))
    return (
        per.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .groupBy("dst")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_r"), F.col("anchor"), F.col("n")))
                ),
                lambda s: F.struct(s["anchor"].alias("anchor"), s["n"].alias("n")),
            ).alias("top_anchors")
        )
    )


def host_edges(links: DataFrame, src: str = "url", dst: str = "dst") -> DataFrame:
    """(src url, dst url) -> (src, dst, n_links) host-level edges,
    lowercased, self-host loops dropped. Host parsing is pure JVM
    (parse_url in codegen) — no Python crossing."""
    # try_parse_url: malformed crawl urls yield NULL (filtered below)
    # instead of an ANSI INVALID_URL crash (engine/ops/urlnorm.py
    # discipline)
    e = links.select(
        F.lower(F.try_parse_url(F.col(src), F.lit("HOST"))).alias("src"),
        F.lower(F.try_parse_url(F.col(dst), F.lit("HOST"))).alias("dst"),
    ).filter(
        F.col("src").isNotNull()
        & F.col("dst").isNotNull()
        & (F.col("src") != F.col("dst"))
    )
    return e.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n_links"))


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    damping: float = 0.85,
    max_iter: int = 100,
    tol: float = 1e-6,
    stats: dict | None = None,
) -> DataFrame:
    """edges (directed, distinct per (src,dst)) -> (node, rank); ranks
    sum to 1 over the node set (union of both endpoints).

    weight=None distributes a node's rank uniformly over its distinct
    out-edges; weight=<col> distributes proportionally (host_edges'
    n_links). Dangling nodes (no out-edges) teleport their whole mass
    uniformly, so total rank is conserved exactly.

    Converges when the L1 delta between iterations drops below `tol`;
    raises RuntimeError on non-convergence (the engine/ops/graph.py
    contract — a silently unconverged centrality is a silently wrong
    quality prior). The delta decays as damping^k, so tol=1e-6 needs
    ~85 rounds at d=0.85 — at a host-graph's |hosts| that is 85 cheap
    shuffles of a small table, but callers ranking (not measuring)
    hosts can stop far earlier. tol<=0 selects FIXED-ITERATION mode:
    exactly max_iter rounds, no convergence requirement and no
    per-round delta aggregate — the mode the tests use to pin the
    formula against a sequential numpy reference at the same k (the
    engine/ops/classify.py discipline). stats (optional dict) records
    rounds + final delta (delta None in fixed mode).
    """
    fixed = tol is None or tol <= 0
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w"))
        # null endpoints would silently leak rank mass (a null dst's
        # incoming weight joins nothing): drop them at entry
        .filter(
            F.col("src").isNotNull()
            & F.col("dst").isNotNull()
            & (F.col("src") != F.col("dst"))
        )
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    # normalized out-weights: each edge carries frac = w / total_w(src)
    outw = e.groupBy("src").agg(F.sum("w").alias("_tw"))
    frac = (
        e.join(outw, "src")
        .select("src", "dst", (F.col("w") / F.col("_tw")).alias("frac"))
        .localCheckpoint(eager=True)
    )
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank")).localCheckpoint(
        eager=True
    )
    has_out = outw.select(F.col("src").alias("node"))

    converged = False
    delta = float("inf")
    for i in range(max_iter):
        dangling = (
            ranks.join(has_out, "node", "anti").agg(F.sum("rank")).first()[0]
            or 0.0
        )
        incoming = (
            frac.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("frac")).alias("_in"))
            .withColumnRenamed("dst", "node")
        )
        base = (1.0 - damping) / n + damping * dangling / n
        nxt = (
            ranks.withColumnRenamed("rank", "_old")
            .join(incoming, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.lit(damping) * F.coalesce("_in", F.lit(0.0))).alias(
                    "rank"
                ),
                "_old",
            )
            .localCheckpoint(eager=True)
        )
        if not fixed:
            delta = nxt.agg(F.sum(F.abs(F.col("rank") - F.col("_old")))).first()[0]
        ranks = nxt.drop("_old")
        if stats is not None:
            stats["rounds"] = i + 1
            stats["delta"] = None if fixed else delta
        if not fixed and delta < tol:
            converged = True
            break
    if fixed:
        converged = True
    if not converged:
        raise RuntimeError(
            f"pagerank did not converge in {max_iter} iterations "
            f"(final L1 delta {delta:.3e} > tol {tol:.0e}); raise "
            "max_iter or loosen tol"
        )
    return ranks


def host_rank(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    max_links: int = DEFAULT_MAX_LINKS,
    damping: float = 0.85,
    max_iter: int = 100,
    tol: float = 1e-6,
) -> DataFrame:
    """pages -> (host, rank): the end-to-end quality-prior table.
    Join back onto pages via lower(parse_url(url, 'HOST'))."""
    links = extract_outlinks_df(pages, url_col, html_col, max_links)
    edges = host_edges(links)
    return pagerank(
        edges, weight="n_links", damping=damping, max_iter=max_iter, tol=tol
    ).withColumnRenamed("node", "host")
