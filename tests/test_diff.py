"""Snapshot diff: DuckDB differential (IS DISTINCT FROM oracle — the
Spark side diffs md5 digests, the oracle diffs raw values, so a digest
scheme that conflated NULL/'' or adjacent columns would show up here),
plus null-tricky fixtures aimed exactly at those conflations.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pyspark.sql.functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_ingestor_gluejob_script_spark.operators.diff import (  # noqa: E402
    table_diff,
    table_diff_summary,
)
from data_ingestor_gluejob_script_spark.queries._util import load  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

# b = orders with: keys % 7 == 0 removed, % 5 == 0 re-priced (changed),
# and a fresh key range added.
MUT_SQL = """
SELECT o_orderkey, o_custkey,
       CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1 ELSE o_totalprice END
           AS o_totalprice,
       o_orderstatus
FROM orders WHERE o_orderkey % 7 <> 0
UNION ALL
SELECT o_orderkey + 1000000, o_custkey, o_totalprice, o_orderstatus
FROM orders WHERE o_orderkey % 11 = 0
"""

ORACLE = f"""
WITH a AS (SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
           FROM orders),
     b AS ({MUT_SQL})
SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
       CASE WHEN a.o_orderkey IS NULL THEN 'added'
            WHEN b.o_orderkey IS NULL THEN 'removed'
            ELSE 'changed' END AS change
FROM a FULL OUTER JOIN b USING (o_orderkey)
WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
   OR (a.o_custkey     IS DISTINCT FROM b.o_custkey)
   OR (a.o_totalprice  IS DISTINCT FROM b.o_totalprice)
   OR (a.o_orderstatus IS DISTINCT FROM b.o_orderstatus)
"""


def _frames(spark):
    a = load(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    changed = F.when(
        F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 1
    ).otherwise(F.col("o_totalprice"))
    b = (
        a.filter(F.col("o_orderkey") % 7 != 0)
        .withColumn("o_totalprice", changed)
        .unionByName(
            a.filter(F.col("o_orderkey") % 11 == 0).withColumn(
                "o_orderkey", F.col("o_orderkey") + 1000000
            )
        )
    )
    return a, b


def test_table_diff_differential(spark):
    a, b = _frames(spark)
    got = sorted(
        (r["o_orderkey"], r["change"])
        for r in table_diff(a, b, ["o_orderkey"]).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{SF_DIR}/orders.parquet'"
    )
    want = sorted((r[0], r[1]) for r in con.execute(ORACLE).fetchall())
    assert got == want
    assert {"added", "removed", "changed"} == {c for _, c in got}


def test_table_diff_summary_matches_detail(spark):
    a, b = _frames(spark)
    detail = table_diff(a, b, ["o_orderkey"]).groupBy("change").count()
    counts = {r["change"]: r["count"] for r in detail.collect()}
    s = table_diff_summary(a, b, ["o_orderkey"]).collect()[0]
    assert s["n_added"] == counts.get("added", 0)
    assert s["n_removed"] == counts.get("removed", 0)
    assert s["n_changed"] == counts.get("changed", 0)
    total_keys = (
        a.select("o_orderkey").union(b.select("o_orderkey")).distinct()
    ).count()
    assert (
        s["n_added"] + s["n_removed"] + s["n_changed"] + s["n_unchanged"]
        == total_keys
    )


def test_digest_null_vs_empty_and_column_shift(spark):
    # (NULL, 'x') vs ('', 'x'): different; ('ab', 'c') vs ('a', 'bc'):
    # different; identical rows: absent from the diff
    a = spark.createDataFrame(
        [(1, None, "x"), (2, "ab", "c"), (3, "same", "same")],
        "k int, c1 string, c2 string",
    )
    b = spark.createDataFrame(
        [(1, "", "x"), (2, "a", "bc"), (3, "same", "same")],
        "k int, c1 string, c2 string",
    )
    got = {r["k"]: r["change"] for r in table_diff(a, b, ["k"]).collect()}
    assert got == {1: "changed", 2: "changed"}


def test_diff_on_identical_frames_is_empty(spark):
    a = load(spark, SF_DIR, "orders")
    assert table_diff(a, a, ["o_orderkey"]).count() == 0
    s = table_diff_summary(a, a, ["o_orderkey"]).collect()[0]
    assert s["n_added"] == s["n_removed"] == s["n_changed"] == 0
    assert s["n_unchanged"] == a.count()
