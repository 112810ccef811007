"""Core declared queries — reference-derived semantics (SURVEY.md §2.3).

Each query is the Spark-first re-expression of one reference operator
(file:line cited per query), exercised on the TPC-H-ish testdata via
the FIXTURES.md role mapping (orders plays the watermark anchor
`retail_subscriptions`; lineitem plays the child tables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.normalize import cast_all_string, dict_map
from ..operators.relational import join_chain, semi_join, watermark_filter
from ..operators.temporal import format_ts_micro
from ..operators.upsert import merge_upsert, union_all, upsert_dedup
from ._util import WM, WM_UPSERT, load

LINEITEM_PROJ = ["l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"]

# l_returnflag normalization map — same dict-map shape as the reference's
# boolean canonicalization (gluejob.py:16-28), unmapped values pass through.
RETURNFLAG_MAP = {"R": "returned", "A": "accepted", "N": "none"}


def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/P1: schema-pruned scan (gluejob.py:234-236). Catalyst pushes
    the 4-column ReadSchema into the parquet footer read."""
    return load(spark, sf_dir, "lineitem").select(*LINEITEM_PROJ)


def q_filter_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: incremental predicate ``ts >= watermark`` (gluejob.py:541)."""
    return watermark_filter(load(spark, sf_dir, "orders"), "o_orderdate", WM)


def q_semi_join_1hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: child.* for anchor rows past the watermark — the
    retail_plans pattern (gluejob.py:548-556) as LEFT SEMI."""
    lineitem = load(spark, sf_dir, "lineitem")
    anchor = watermark_filter(load(spark, sf_dir, "orders"), "o_orderdate", WM)
    return semi_join(lineitem, anchor, "l_orderkey", "o_orderkey")


def q_join_2hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: 2-hop inner chain, base.* projected — the retail_items
    pattern (gluejob.py:558-567). Filters applied to the dims BEFORE
    the join so the broadcast candidates are post-filter."""
    lineitem = load(spark, sf_dir, "lineitem")
    orders = watermark_filter(load(spark, sf_dir, "orders"), "o_orderdate", WM)
    customer = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    return join_chain(
        lineitem,
        [(orders, "l_orderkey", "o_orderkey"), (customer, "o_custkey", "c_custkey")],
    )


def q_join_3hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: 3-hop chain — the retail_provisionings pattern
    (gluejob.py:569-579), deepest lineage in the reference."""
    lineitem = load(spark, sf_dir, "lineitem")
    orders = watermark_filter(load(spark, sf_dir, "orders"), "o_orderdate", WM)
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    return join_chain(
        lineitem,
        [
            (orders, "l_orderkey", "o_orderkey"),
            (customer, "o_custkey", "c_custkey"),
            (nation, "c_nationkey", "n_nationkey"),
        ],
    )


def q_cast_all_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O8: lake coercion — every column cast to string
    (gluejob.py:236,278)."""
    return cast_all_string(load(spark, sf_dir, "orders"))


def q_dictmap_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: dict-map canonicalization with unmapped passthrough
    (gluejob.py:16-28) as a pure Catalyst CASE expression."""
    df = load(spark, sf_dir, "lineitem")
    return df.withColumn("l_returnflag", dict_map(F.col("l_returnflag"), RETURNFLAG_MAP))


def q_partition_derive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2/O3/O5: write-partition key derivation (gluejob.py:182-183),
    made observable as a (year, month) → row-count aggregate."""
    df = load(spark, sf_dir, "events")
    return df.groupBy(
        F.year("ts").alias("ts_year"), F.month("ts").alias("ts_month")
    ).agg(F.count("*").alias("n_rows"))


def q_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: microsecond-precision timestamp→string serialization
    (gluejob.py:186, '%Y-%m-%d %H:%M:%S.%f')."""
    df = load(spark, sf_dir, "events")
    return df.select("event_id", format_ts_micro(F.col("ts")).alias("ts_str"))


def q_upsert_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6+O7: the upsert — union with precedence, one row per key,
    incoming wins (gluejob.py:196-198). Incoming = orders past the
    split watermark with o_totalprice zeroed as an observable marker."""
    orders = load(spark, sf_dir, "orders")
    incoming = watermark_filter(orders, "o_orderdate", WM_UPSERT).withColumn(
        "o_totalprice", F.lit(0.0)
    )
    return upsert_dedup(incoming, orders, "o_orderkey")


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6+O7 via the join formulation: merge_upsert is upsert_dedup's
    scale twin (operators/upsert.py) — the lake side is the null-stream
    of an anti join instead of a window over the union, so a broadcast
    increment never shuffles it. NOT driver-registered (the gate caps
    at exactly 50 and q_upsert_dedup holds the upsert slot); its DuckDB
    differential lives in tests/test_inventory.py against
    MERGE_UPSERT_ORACLE — the exact oracle text q_upsert_dedup uses,
    because the two formulations must be row-identical."""
    orders = load(spark, sf_dir, "orders")
    incoming = watermark_filter(orders, "o_orderdate", WM_UPSERT).withColumn(
        "o_totalprice", F.lit(0.0)
    )
    # The WM_UPSERT slice is ~62% of orders — a backfill, the arm
    # tools/bucketed_upsert.py labels "too big to broadcast" — so the
    # registered-shape twin must take the sort-merge arm; the default
    # broadcast would force-collect ~93M keys to the driver at sf100
    # (r13 review finding).
    return merge_upsert(
        incoming, orders, "o_orderkey", broadcast_incoming=False
    )


def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6: order-insignificant union of two disjoint slices
    (gluejob.py:197)."""
    orders = load(spark, sf_dir, "orders")
    return union_all(
        orders.filter(F.col("o_orderdate") < F.lit(WM)),
        orders.filter(F.col("o_orderdate") >= F.lit(WM)),
    )


def q_count_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: the empty-batch guard (gluejob.py:175-179) as a 1-row count."""
    df = load(spark, sf_dir, "lineitem")
    return df.filter(F.col("l_shipdate") >= F.lit(WM)).agg(
        F.count("*").alias("n_rows")
    )


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 6-table join: local-supplier revenue per nation
    within one region and a one-year order window. Exercises the full
    star schema (region/nation/customer/orders/lineitem/supplier).
    Plan: region→nation filtered first (broadcast), the fact-fact
    lineitem⋈orders join shuffles once, suppliers broadcast with the
    nation co-membership predicate applied at the join."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation").join(
        region, F.col("n_regionkey") == F.col("r_regionkey"), "inner"
    )
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    lineitem = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    return (
        customer.join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI surface: customers with no orders in the watermark
    window — the negation of the semi-join incremental pattern, same
    single-shuffle shape."""
    customer = load(spark, sf_dir, "customer")
    orders = watermark_filter(
        load(spark, sf_dir, "orders"), "o_orderdate", WM_UPSERT
    )
    return customer.join(
        orders, customer["c_custkey"] == orders["o_custkey"], "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


def q_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER surface: per-nation customer count including empty
    nations (NULL-preserving aggregation over the outer side)."""
    nation = load(spark, sf_dir, "nation")
    customer = load(spark, sf_dir, "customer")
    return (
        nation.join(
            customer, nation["n_nationkey"] == customer["c_nationkey"], "left"
        )
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
        )
    )


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped: revenue share of promo-type parts per brand in
    one ship-month. lineitem⋈part is fact-dim: the filtered part side
    broadcasts; conditional aggregation is map-side."""
    part = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0.0))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"), "inner")
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(rev), 2).alias("revenue"),
            F.round(F.sum(promo), 2).alias("promo_revenue"),
            F.count("*").alias("n_items"),
        )
    )


QUERIES = {
    "q_promo_revenue": q_promo_revenue,
    "q_revenue_by_nation": q_revenue_by_nation,
    "q_anti_join": q_anti_join,
    "q_outer_join": q_outer_join,
    "q_scan_project": q_scan_project,
    "q_filter_watermark": q_filter_watermark,
    "q_semi_join_1hop": q_semi_join_1hop,
    "q_join_2hop": q_join_2hop,
    "q_join_3hop": q_join_3hop,
    "q_cast_all_string": q_cast_all_string,
    "q_dictmap_normalize": q_dictmap_normalize,
    "q_partition_derive": q_partition_derive,
    "q_date_format": q_date_format,
    "q_upsert_dedup": q_upsert_dedup,
    "q_union_all": q_union_all,
    "q_count_guard": q_count_guard,
}

# q_merge_upsert's oracle — shared text with q_upsert_dedup's entry in
# ORACLES below (the join and window formulations are row-identical);
# checked locally in tests/test_inventory.py since the driver gate is
# capped at 50 registered queries.
MERGE_UPSERT_ORACLE = f"""
    WITH incoming AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CAST(0.0 AS DOUBLE) AS o_totalprice,
               o_orderdate, o_orderpriority
        FROM orders WHERE o_orderdate >= TIMESTAMP '{WM_UPSERT}')
    SELECT * FROM incoming
    UNION ALL
    SELECT * FROM orders
    WHERE o_orderkey NOT IN (SELECT o_orderkey FROM incoming)
"""

_LI_COLS = (
    "l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, "
    "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate"
)

ORACLES = {
    "q_promo_revenue": """
        SELECT p_brand,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               round(sum(CASE WHEN p_type LIKE 'PROMO%'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END), 2) AS promo_revenue,
               count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY p_brand
    """,
    "q_revenue_by_nation": """
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_items
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name
    """,
    "q_anti_join": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE c_custkey NOT IN (
            SELECT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '{WM}')
    """.format(WM=WM_UPSERT),
    "q_outer_join": """
        SELECT n_name, count(c_custkey) AS n_customers,
               round(sum(c_acctbal), 2) AS sum_acctbal
        FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
        GROUP BY n_name
    """,
    "q_scan_project": (
        "SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice FROM lineitem"
    ),
    "q_filter_watermark": (
        f"SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '{WM}'"
    ),
    "q_semi_join_1hop": f"""
        SELECT * FROM lineitem
        WHERE l_orderkey IN (
            SELECT o_orderkey FROM orders WHERE o_orderdate >= TIMESTAMP '{WM}')
    """,
    "q_join_2hop": f"""
        SELECT l.* FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_orderdate >= TIMESTAMP '{WM}'
          AND c.c_mktsegment = 'BUILDING'
    """,
    "q_join_3hop": f"""
        SELECT l.* FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '{WM}'
          AND n.n_name = 'NATION_7'
    """,
    "q_cast_all_string": """
        SELECT o_orderkey::VARCHAR AS o_orderkey,
               o_custkey::VARCHAR AS o_custkey,
               o_orderstatus::VARCHAR AS o_orderstatus,
               o_totalprice::VARCHAR AS o_totalprice,
               o_orderdate::VARCHAR AS o_orderdate,
               o_orderpriority::VARCHAR AS o_orderpriority
        FROM orders
    """,
    "q_dictmap_normalize": f"""
        SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
               l_extendedprice, l_discount, l_tax,
               CASE WHEN l_returnflag = 'R' THEN 'returned'
                    WHEN l_returnflag = 'A' THEN 'accepted'
                    WHEN l_returnflag = 'N' THEN 'none'
                    ELSE l_returnflag END AS l_returnflag,
               l_linestatus, l_shipdate
        FROM lineitem
    """,
    "q_partition_derive": """
        SELECT CAST(year(ts::TIMESTAMP) AS INTEGER) AS ts_year,
               CAST(month(ts::TIMESTAMP) AS INTEGER) AS ts_month,
               count(*) AS n_rows
        FROM events GROUP BY 1, 2
    """,
    "q_date_format": """
        SELECT event_id,
               strftime(ts::TIMESTAMP, '%Y-%m-%d %H:%M:%S.%f') AS ts_str
        FROM events
    """,
    "q_upsert_dedup": f"""
        WITH incoming AS (
            SELECT o_orderkey, o_custkey, o_orderstatus,
                   CAST(0.0 AS DOUBLE) AS o_totalprice,
                   o_orderdate, o_orderpriority
            FROM orders WHERE o_orderdate >= TIMESTAMP '{WM_UPSERT}')
        SELECT * FROM incoming
        UNION ALL
        SELECT * FROM orders
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM incoming)
    """,
    "q_union_all": f"""
        SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '{WM}'
        UNION ALL
        SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '{WM}'
    """,
    "q_count_guard": (
        f"SELECT count(*) AS n_rows FROM lineitem "
        f"WHERE l_shipdate >= TIMESTAMP '{WM}'"
    ),
}

