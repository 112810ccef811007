"""Extended analytics queries — aggregation / top-k / window / tumbling
surfaces the reference lacks entirely (SURVEY.md §2.2 gaps).

Float discipline: every double-typed aggregate is ROUNDed identically
on both engines, because Spark's partial-aggregation order differs from
DuckDB's sequential sum in the last ulp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._util import load


def q_agg_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped hash aggregate: map-side partial agg + single
    shuffle on a 6-value grouping key; whole-stage codegen end-to-end."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_topk_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic top-k: revenue per customer, ORDER BY rounded
    revenue DESC with key tiebreak, LIMIT 10. Spark executes this as
    TakeOrderedAndProject — no global sort materialization."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    revenue = F.round(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
    ).alias("revenue")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(revenue)
        .orderBy(F.col("revenue").desc(), F.col("custkey"))
        .limit(10)
    )


def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window surface: latest order per customer via row_number over
    (o_orderdate DESC, o_orderkey) — one shuffle on o_custkey."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )


def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of a tumbling 1h window over the events stream table
    (streaming/ holds the readStream twin of the same aggregation)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("hour", "ts").alias("window_start")).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def q_rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical aggregate surface: ROLLUP over (returnflag,
    linestatus) — subtotals per flag and a grand total in one pass
    (one shuffle; Spark expands grouping sets map-side)."""
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_items"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


QUERIES = {
    "q_agg_pricing": q_agg_pricing,
    "q_rollup_pricing": q_rollup_pricing,
    "q_topk_customers": q_topk_customers,
    "q_window_rank": q_window_rank,
    "q_tumbling_window": q_tumbling_window,
}

ORACLES = {
    "q_rollup_pricing": """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_items,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "q_agg_pricing": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_quantity), 6) AS avg_qty,
               round(avg(l_extendedprice), 6) AS avg_price,
               round(avg(l_discount), 6) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q_topk_customers": """
        SELECT o_custkey AS custkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_custkey
        ORDER BY revenue DESC, custkey
        LIMIT 10
    """,
    "q_window_rank": """
        SELECT o_custkey, o_orderkey, o_orderdate
        FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                     row_number() OVER (
                         PARTITION BY o_custkey
                         ORDER BY o_orderdate DESC, o_orderkey) AS rn
              FROM orders)
        WHERE rn = 1
    """,
    "q_tumbling_window": """
        SELECT date_trunc('hour', ts::TIMESTAMP) AS window_start,
               count(*) AS n_events,
               round(sum(value), 4) AS sum_value
        FROM events
        GROUP BY 1
    """,
}


def q13_order_count_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q13-shaped: distribution of customers by how many orders
    they placed, INCLUDING zero-order customers (the left join is the
    point — an inner join silently drops the modal bucket).

    Scale shape: the left join shuffles on custkey with the per-key
    aggregate pushed BELOW the join (orders pre-aggregated to one row
    per customer, so the join probe side is |customers-with-orders|,
    not |orders|); the distribution agg is a tiny second shuffle on
    the count value. Unregistered (gate pinned at 50); differential in
    tests/test_analytics_extra.py."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders")
    )
    return (
        customer.join(
            per_cust, customer["c_custkey"] == per_cust["o_custkey"], "left"
        )
        .select(F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"))
        .groupBy("n_orders")
        .agg(F.count("*").alias("n_customers"))
    )


Q13_ORACLE = """
WITH per_cust AS (
    SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey
)
SELECT coalesce(p.n_orders, 0) AS n_orders,
       count(*) AS n_customers
FROM customer c LEFT JOIN per_cust p ON c.c_custkey = p.o_custkey
GROUP BY 1
"""


def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped: distinct supplier count per (brand, type)
    over lineitem-linked part/supplier pairs.

    Scale shape: the fact-dim joins broadcast the (filtered) part and
    supplier dims; the COUNT(DISTINCT) runs as the two-phase expand on
    (brand, type, suppkey) — fine here because the distinct key cube
    is dimension-sized. At a 100 TB fact table swap the exact distinct
    for approx_count_distinct (the HLL twin pattern,
    `windows.q_distinct_agg_approx`). Unregistered; differential in
    tests/test_analytics_extra.py."""
    lineitem = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    supplier = load(spark, sf_dir, "supplier")
    pairs = (
        lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(part), lineitem["l_partkey"] == part["p_partkey"])
        .join(
            F.broadcast(supplier),
            lineitem["l_suppkey"] == supplier["s_suppkey"],
        )
    )
    return pairs.groupBy("p_brand", "p_type").agg(
        F.count_distinct("s_suppkey").alias("n_suppliers")
    )


Q16_ORACLE = """
SELECT p_brand, p_type, count(DISTINCT s_suppkey) AS n_suppliers
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY p_brand, p_type
"""


def q_cube_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): every grouping-set subtotal
    including the grand total, completing the OLAP aggregation family
    beside the ROLLUP form (q_rollup_pricing). grouping_id
    disambiguates real NULL keys from subtotal rows — the column the
    reference's flat GROUP BY world has no analogue for.

    Scale shape: Spark expands the cube into grouping sets BEFORE the
    exchange, so partial aggregation applies per set and the shuffle
    carries one partial row per (set, key) — not a full second pass
    per subtotal level. Unregistered (gate pinned at 50); differential
    in tests/test_analytics_extra.py."""
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id("l_returnflag", "l_linestatus").alias("gid"),
        F.count("*").alias("n_rows"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
    )


CUBE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
       count(*) AS n_rows,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_price
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""
