"""Named query registry for the driver contract (SURVEY.md §5 T4).

Every entry pairs a PySpark DataFrame implementation with an ANSI-SQL
oracle string DuckDB executes over the same parquet (views: region
nation customer supplier part orders lineitem events documents
embeddings). The driver compares row-count + schema + order-
insensitive value-hash at sf0.01, so:

  * every computed column is aliased IDENTICALLY in both;
  * double aggregates go through exact DECIMAL sums (order-
    independent) and are cast back to double;
  * ratios/averages are rounded to a pinned number of decimals;
  * timestamps are output as unix micros or formatted strings.

Coverage map to SURVEY.md §2.B/§2.C is noted per query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dec(col, p=18, s=2):
    return F.col(col).cast(f"decimal({p},{s})") if isinstance(col, str) else col.cast(
        f"decimal({p},{s})"
    )


# --------------------------------------------------------------------------
# B10/B16: TPC-H Q1-style pricing summary (hash agg, partial+final)
# --------------------------------------------------------------------------
@register(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS sum_disc_price,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2002-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q01(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2002-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                _dec("l_extendedprice")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)")
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.round(
                F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# B4: filter + project with computed columns (pushdown-friendly)
# --------------------------------------------------------------------------
@register(
    "q02_filter_project",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l_discount AS DECIMAL(8,2)) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_discount >= 0.09 AND l_quantity < 3
    """,
)
def q02(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_discount") >= 0.09) & (F.col("l_quantity") < 3)).select(
        "l_orderkey",
        "l_linenumber",
        (_dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)"))
        .cast("double")
        .alias("revenue"),
    )


# --------------------------------------------------------------------------
# B5: broadcast join of small dims
# --------------------------------------------------------------------------
@register(
    "q03_broadcast_join",
    """
    SELECT r.r_name AS region_name, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name ORDER BY region_name
    """,
)
def q03(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_acctbal"),
        )
        .orderBy("region_name")
    )


# --------------------------------------------------------------------------
# B6: sort-merge equi join (fact x fact)
# --------------------------------------------------------------------------
@register(
    "q04_sortmerge_join",
    """
    SELECT o.o_orderpriority,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY o.o_orderpriority ORDER BY o_orderpriority
    """,
)
def q04(spark, sf_dir):
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = T(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(
                _dec("l_extendedprice")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)")
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# B5+B6: five-way join (TPC-H Q5 shape)
# --------------------------------------------------------------------------
@register(
    "q05_multiway_join",
    """
    SELECT n.n_name AS nation_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue
    FROM customer c
      JOIN orders o   ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name ORDER BY nation_name
    """,
)
def q05(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.sum(
                _dec("l_extendedprice")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)")
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy("nation_name")
    )


# --------------------------------------------------------------------------
# B7: left semi / left anti joins
# --------------------------------------------------------------------------
@register(
    "q06_semi_join",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
    """,
)
def q06(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "q07_anti_join",
    """
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q07(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


# --------------------------------------------------------------------------
# B14: window ranking — top-3 orders per market segment
# --------------------------------------------------------------------------
@register(
    "q08_window_topk_per_group",
    """
    SELECT c_mktsegment, o_orderkey, o_totalprice, rn
    FROM (
      SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY o.o_totalprice DESC, o.o_orderkey ASC) AS rn
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) WHERE rn <= 3
    """,
)
def q08(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


# --------------------------------------------------------------------------
# B15: analytic window with frame — running revenue + lag per customer
# --------------------------------------------------------------------------
@register(
    "q09_window_running",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
              PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
           LAG(o_orderkey) OVER (
              PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_orderkey
    FROM orders WHERE o_custkey < 100
    """,
)
def q09(spark, sf_dir):
    o = T(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(_dec("o_totalprice"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_total"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
    )


# --------------------------------------------------------------------------
# B16: global top-k with deterministic tiebreak
# --------------------------------------------------------------------------
@register(
    "q10_global_topk",
    """
    SELECT p_partkey, p_name, p_retailprice FROM part
    ORDER BY p_retailprice DESC, p_partkey ASC LIMIT 10
    """,
)
def q10(spark, sf_dir):
    return (
        T(spark, sf_dir, "part")
        .orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
        .limit(10)
        .select("p_partkey", "p_name", "p_retailprice")
    )


# --------------------------------------------------------------------------
# B11: exact distinct aggregation
# --------------------------------------------------------------------------
@register(
    "q11_count_distinct",
    """
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def q11(spark, sf_dir):
    return (
        T(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count_distinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# B12: percentiles (exact; approx variant is rows-only q40)
# --------------------------------------------------------------------------
@register(
    "q12_percentiles",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
           ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def q12(spark, sf_dir):
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("p99"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# B13: rollup + grouping id
# --------------------------------------------------------------------------
@register(
    "q13_rollup",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(GROUPING(l_returnflag) + GROUPING(l_linestatus) AS INT) AS glevel,
           COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
)
def q13(spark, sf_dir):
    return (
        T(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            (F.grouping("l_returnflag") + F.grouping("l_linestatus"))
            .cast("int")
            .alias("glevel"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "glevel",
            "n",
        )
        .orderBy("returnflag", "linestatus")
    )


# --------------------------------------------------------------------------
# B13: cube over documents dimensions
# --------------------------------------------------------------------------
@register(
    "q14_cube",
    """
    SELECT COALESCE(lang, 'ALL') AS lang_d, COALESCE(source, 'ALL') AS source_d,
           COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
    FROM documents GROUP BY CUBE(lang, source)
    ORDER BY lang_d, source_d
    """,
)
def q14(spark, sf_dir):
    return (
        T(spark, sf_dir, "documents")
        .cube("lang", "source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("chars"))
        .select(
            F.coalesce("lang", F.lit("ALL")).alias("lang_d"),
            F.coalesce("source", F.lit("ALL")).alias("source_d"),
            "n",
            "chars",
        )
        .orderBy("lang_d", "source_d")
    )


# --------------------------------------------------------------------------
# B17: set operations
# --------------------------------------------------------------------------
@register(
    "q15_set_ops",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000
    """,
)
def q15(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    open_o = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    big = o.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return building.intersect(open_o).exceptAll(big.distinct())


# --------------------------------------------------------------------------
# B18: explode / unnest (token fan-out)
# --------------------------------------------------------------------------
@register(
    "q16_explode_tokens",
    """
    SELECT tok, COUNT(*) AS n FROM (
      SELECT unnest(string_split(p_name, ' ')) AS tok FROM part
    ) GROUP BY tok ORDER BY n DESC, tok ASC
    """,
)
def q16(spark, sf_dir):
    return (
        T(spark, sf_dir, "part")
        .select(F.explode(F.split("p_name", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
    )


# --------------------------------------------------------------------------
# §2.C JSON: from_json / get_json_object over events.props
# --------------------------------------------------------------------------
@register(
    "q17_json_extract",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q17(spark, sf_dir):
    return (
        T(spark, sf_dir, "events")
        .select(
            "event_type",
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# §2.C date/time: month rollup with formatted output
# --------------------------------------------------------------------------
@register(
    "q18_month_rollup",
    """
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY 1 ORDER BY month
    """,
)
def q18(spark, sf_dir):
    return (
        T(spark, sf_dir, "orders")
        .groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
                "month"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total"),
        )
        .orderBy("month")
    )


# --------------------------------------------------------------------------
# §2.C string functions
# --------------------------------------------------------------------------
@register(
    "q19_string_fns",
    """
    SELECT UPPER(p_brand) AS brand_u, LOWER(p_type) AS type_l,
           LENGTH(p_name) AS name_len,
           SUBSTRING(p_name, 1, 5) AS name_head,
           CONCAT(p_brand, ':', p_type) AS brand_type
    FROM part WHERE p_size >= 48
    """,
)
def q19(spark, sf_dir):
    return (
        T(spark, sf_dir, "part")
        .filter(F.col("p_size") >= 48)
        .select(
            F.upper("p_brand").alias("brand_u"),
            F.lower("p_type").alias("type_l"),
            F.length("p_name").alias("name_len"),
            F.substring("p_name", 1, 5).alias("name_head"),
            F.concat_ws("", F.col("p_brand"), F.lit(":"), F.col("p_type")).alias(
                "brand_type"
            ),
        )
    )


# --------------------------------------------------------------------------
# §2.C hash functions (sha256 / md5 agree across engines)
# --------------------------------------------------------------------------
@register(
    "q20_hash_fns",
    """
    SELECT doc_id, sha256(text) AS text_sha, md5(text) AS text_md5
    FROM documents WHERE doc_id < 50
    """,
)
def q20(spark, sf_dir):
    return (
        T(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select(
            "doc_id",
            F.sha2(F.col("text"), 256).alias("text_sha"),
            F.md5(F.col("text")).alias("text_md5"),
        )
    )


# --------------------------------------------------------------------------
# §2.C arrays: embedding L2 norms via fold (zip_with/aggregate)
# --------------------------------------------------------------------------
@register(
    "q21_vector_norms",
    """
    SELECT vec_id, label,
           ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS sq_norm,
           len(embedding) AS dim
    FROM embeddings WHERE vec_id < 100
    """,
)
def q21(spark, sf_dir):
    return (
        T(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 100)
        .select(
            "vec_id",
            "label",
            F.round(
                F.aggregate(
                    F.col("embedding"),
                    F.lit(0.0).cast("double"),
                    lambda a, x: a + x.cast("double") * x.cast("double"),
                ),
                4,
            ).alias("sq_norm"),
            F.size("embedding").alias("dim"),
        )
    )


# --------------------------------------------------------------------------
# Similarity search: brute-force cosine top-k per query vector
# (ANN baseline; LSH-bucketed variant is x07 rows-only)
# --------------------------------------------------------------------------
@register(
    "q22_cosine_topk",
    """
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
    pairs AS (
      SELECT q.qid, e.vec_id,
             ROUND(
               list_sum(list_transform(list_zip(q.qe, e.embedding),
                        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))),
             4) AS cos_sim
      FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid
    )
    SELECT qid, vec_id, cos_sim FROM (
      SELECT qid, vec_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id ASC) rn
      FROM pairs
    ) WHERE rn <= 5
    """,
)
def q22(spark, sf_dir):
    from engine.udfs import cos_pairs_udf

    e = T(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    # brute-force baseline (q35/q36 are the ANN scale paths): broadcast
    # the query side, cosine via the vectorized Arrow UDF — one BLAS
    # pass per batch instead of a per-row HOF lambda chain
    pairs = (
        F.broadcast(q)
        .crossJoin(e)
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(
                cos_pairs_udf(F.col("qe"), F.col("embedding")), 4
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("qid", "vec_id", "cos_sim")
    )


# --------------------------------------------------------------------------
# B9: as-of join — most recent prior click per purchase, per user.
# Spark side uses the scalable union+window formulation (no range
# cross-join); the oracle states the semantics declaratively.
# --------------------------------------------------------------------------
@register(
    "q23_asof_join",
    """
    SELECT p.event_id, epoch_us(MAX(c.ts)) AS prev_click_us
    FROM events p LEFT JOIN events c
      ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    """,
)
def q23(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("ets"), F.lit(None).cast("long").alias("pid")
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("ets"), F.col("event_id").alias("pid")
    )
    unioned = clicks.unionByName(purch)
    # order clicks before purchases at identical ts (c.ts <= p.ts is inclusive)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ets"), F.asc_nulls_first("pid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lastclick = unioned.withColumn(
        "prev_click_us",
        F.last(
            F.when(F.col("pid").isNull(), F.unix_micros(F.col("ets").cast("timestamp"))),
            ignorenulls=True,
        ).over(w),
    )
    return (
        lastclick.filter(F.col("pid").isNotNull())
        .select(F.col("pid").alias("event_id"), "prev_click_us")
    )


# --------------------------------------------------------------------------
# Dedup: exact content dedup (hash-groupBy, keep min id)
# --------------------------------------------------------------------------
@register(
    "q24_dedup_exact",
    """
    SELECT lang, COUNT(*) AS n_docs, COUNT(DISTINCT sha256(text)) AS n_unique,
           MIN(doc_id) AS first_doc
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def q24(spark, sf_dir):
    return (
        T(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct(F.sha2("text", 256)).alias("n_unique"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# Dedup: keyed dedup — earliest event per (user, type)
# --------------------------------------------------------------------------
@register(
    "q25_dedup_keyed",
    """
    SELECT user_id, event_type, MIN(event_id) AS keep_event,
           epoch_us(MIN(ts)) AS first_ts_us
    FROM events GROUP BY user_id, event_type
    """,
)
def q25(spark, sf_dir):
    return (
        T(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(
            F.min("event_id").alias("keep_event"),
            F.unix_micros(F.min("ts").cast("timestamp")).alias("first_ts_us"),
        )
    )


# --------------------------------------------------------------------------
# Near-dup: token-set Jaccard via shared-token self-join (the scalable
# shuffle formulation: explode -> join on token -> per-pair intersection)
# --------------------------------------------------------------------------
@register(
    "q26_ngram_jaccard_pairs",
    """
    WITH tok0 AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE doc_id < 200
    ),
    hot AS (
      SELECT tok FROM tok0 GROUP BY tok
      HAVING COUNT(*) > 0.5 * (SELECT COUNT(*) FROM documents WHERE doc_id < 200)
    ),
    tok AS (SELECT * FROM tok0 WHERE tok NOT IN (SELECT tok FROM hot)),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
      FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           ROUND(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 4) AS jaccard
    FROM inter JOIN sizes sa ON sa.doc_id = doc_a
               JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.5
    """,
)
def q26(spark, sf_dir):
    # Hot-token guard: a token present in df documents fans out to
    # df*(df-1)/2 join rows, so one stop-word token with df ~= N makes
    # the self-join quadratic in N. Dropping tokens with df > 50% of
    # docs bounds per-token fanout to (N/2)^2/2 ~= N^2/8 worst case and,
    # in a real (zipfian-vocabulary) corpus, removes exactly the head
    # tokens that carry no similarity signal. The HOT list is tiny by
    # construction (at most total_occurrences/(0.5*N) tokens), so the
    # scale formulation is a BROADCAST anti-join against it — never a
    # shuffle of the token table on a second key.
    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    tok0 = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).distinct()
    nd = docs.agg(F.count(F.lit(1)).alias("nd"))
    hot = (
        tok0.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(nd))
        .filter(F.col("df") > 0.5 * F.col("nd"))
        .select("tok")
    )
    tok = tok0.join(F.broadcast(hot), "tok", "left_anti")
    sizes = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = tok.alias("a")
    b = tok.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb"))
    j = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jac_raw",
            F.col("i").cast("double") / (F.col("sza") + F.col("szb") - F.col("i")),
        )
        .filter(F.col("jac_raw") >= 0.5)
    )
    return j.select("doc_a", "doc_b", F.round("jac_raw", 4).alias("jaccard"))


# --------------------------------------------------------------------------
# Text analysis: token counts + quality stats per lang
# --------------------------------------------------------------------------
@register(
    "q27_token_stats",
    """
    SELECT lang,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           ROUND(AVG(CAST(len(string_split(text, ' ')) AS DOUBLE)), 4) AS avg_tokens,
           MAX(n_chars) AS max_chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def q27(spark, sf_dir):
    d = T(spark, sf_dir, "documents").withColumn(
        "ntok", F.size(F.split("text", " ")).cast("long")
    )
    return (
        d.groupBy("lang")
        .agg(
            F.sum("ntok").alias("total_tokens"),
            F.round(F.avg(F.col("ntok").cast("double")), 4).alias("avg_tokens"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang")
    )


@register(
    "q28_quality_score",
    """
    SELECT doc_id,
           n_chars,
           LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS n_spaces,
           ROUND(CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
                 / LENGTH(text), 4) AS space_ratio,
           CASE WHEN LENGTH(text) BETWEEN 100 AND 500 THEN 1 ELSE 0 END AS len_ok
    FROM documents WHERE doc_id < 100
    """,
)
def q28(spark, sf_dir):
    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    n_spaces = F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    return d.select(
        "doc_id",
        "n_chars",
        n_spaces.alias("n_spaces"),
        F.round(n_spaces.cast("double") / F.length("text"), 4).alias("space_ratio"),
        F.when(F.length("text").between(100, 500), 1).otherwise(0).alias("len_ok"),
    )


# --------------------------------------------------------------------------
# Sessionization: 30-min-gap sessions per user (lag + cumsum)
# --------------------------------------------------------------------------
@register(
    "q29_sessionize",
    """
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                       LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    )
    SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
    FROM g GROUP BY user_id ORDER BY user_id
    """,
)
def q29(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    g = ev.withColumn(
        "new_sess",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
                > 30 * 60 * 1_000_000
            ),
            1,
        ).otherwise(0),
    )
    return (
        g.groupBy("user_id")
        .agg(F.sum("new_sess").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Pivot (portable CASE-sum formulation)
# --------------------------------------------------------------------------
@register(
    "q30_pivot_event_types",
    """
    SELECT user_id % 10 AS user_bucket,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signups,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors
    FROM events GROUP BY user_id % 10 ORDER BY user_bucket
    """,
)
def q30(spark, sf_dir):
    ev = T(spark, sf_dir, "events").withColumn(
        "user_bucket", F.col("user_id") % 10
    )

    def cnt(t):
        return F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))

    return (
        ev.groupBy("user_bucket")
        .agg(
            cnt("click").alias("clicks"),
            cnt("view").alias("views"),
            cnt("purchase").alias("purchases"),
            cnt("signup").alias("signups"),
            cnt("error").alias("errors"),
        )
        .orderBy("user_bucket")
    )


# --------------------------------------------------------------------------
# §2.C math/misc: size-bucket histogram (portable floor arithmetic)
# --------------------------------------------------------------------------
@register(
    "q31_size_histogram",
    """
    SELECT LEAST(GREATEST(CAST(FLOOR(n_chars / 50.0) AS INT), 0), 10) AS bucket,
           COUNT(*) AS n
    FROM documents GROUP BY 1 ORDER BY bucket
    """,
)
def q31(spark, sf_dir):
    return (
        T(spark, sf_dir, "documents")
        .select(
            F.least(
                F.greatest(F.floor(F.col("n_chars") / 50.0).cast("int"), F.lit(0)),
                F.lit(10),
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# max_by / min_by (arg-max aggregation)
# --------------------------------------------------------------------------
@register(
    "q32_argmax",
    """
    SELECT o_orderpriority,
           MAX_BY(o_orderkey, o_totalprice) AS biggest_order,
           MIN_BY(o_orderkey, o_totalprice) AS smallest_order,
           MAX(o_totalprice) AS max_price
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q32(spark, sf_dir):
    return (
        T(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
            F.min_by("o_orderkey", "o_totalprice").alias("smallest_order"),
            F.max("o_totalprice").alias("max_price"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# B8: salted skew join — the oracle is the PLAIN join (salting must be
# result-invariant); the Spark side goes through the salted operator.
# --------------------------------------------------------------------------
@register(
    "q39_salted_skew_join",
    """
    WITH dim AS (
      SELECT user_id, COUNT(*) AS n_clicks
      FROM events WHERE event_type = 'click' GROUP BY user_id
    )
    SELECT e.event_id, e.user_id, d.n_clicks
    FROM events e JOIN dim d ON d.user_id = e.user_id
    WHERE e.event_type = 'purchase'
    """,
)
def q39(spark, sf_dir):
    from engine.partitioning import salted_join

    ev = T(spark, sf_dir, "events")
    dim = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )
    big = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id"
    )
    return salted_join(big, dim, on="user_id", salt_buckets=8).select(
        "event_id", "user_id", "n_clicks"
    )


# --------------------------------------------------------------------------
# §2.C Map family: map_from_entries / map_concat / element_at over a
# per-user event_type->count map (the lineage path_counts shape,
# SURVEY.md §1.2). Outputs are scalars extracted from the map so the
# value-hash compare is engine-portable (DuckDB element_at returns a
# single-element LIST -> [1] unwraps it).
# --------------------------------------------------------------------------
@register(
    "q40_map_functions",
    """
    WITH per AS (
      SELECT user_id, event_type, COUNT(*) AS c
      FROM events GROUP BY user_id, event_type
    ),
    m AS (
      SELECT user_id,
             map_concat(
               map_from_entries(list({'k': event_type, 'v': c} ORDER BY event_type)),
               MAP {'_total': CAST(SUM(c) AS BIGINT)}
             ) AS pc
      FROM per GROUP BY user_id
    )
    SELECT user_id,
           COALESCE(element_at(pc, 'click')[1], 0) AS clicks,
           COALESCE(element_at(pc, 'purchase')[1], 0) AS purchases,
           element_at(pc, '_total')[1] AS total,
           CAST(cardinality(pc) AS BIGINT) AS n_keys
    FROM m ORDER BY user_id
    """,
)
def q40(spark, sf_dir):
    per = (
        T(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    m = per.groupBy("user_id").agg(
        F.map_concat(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("event_type", "c")))
            ),
            F.create_map(F.lit("_total"), F.sum("c")),
        ).alias("pc")
    )
    pc = F.col("pc")
    return m.select(
        "user_id",
        F.coalesce(F.element_at(pc, F.lit("click")), F.lit(0)).alias("clicks"),
        F.coalesce(F.element_at(pc, F.lit("purchase")), F.lit(0)).alias(
            "purchases"
        ),
        F.element_at(pc, F.lit("_total")).alias("total"),
        F.size(pc).cast("long").alias("n_keys"),
    ).orderBy("user_id")
