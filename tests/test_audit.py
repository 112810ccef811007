"""Data-quality audit: DuckDB differential over the real orders /
customer tables (one FILTER-aggregate per check in the oracle, one
single-scan conditional aggregate in Spark), plus seeded-violation
fixtures that prove each rule actually fires, and a plan assertion
that the row-level audit stays a single scan of the input.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pyspark.sql.functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_ingestor_gluejob_script_spark.queries._util import load  # noqa: E402
from data_ingestor_gluejob_script_spark.queries.audit import (  # noqa: E402
    accepted_values,
    audit_checks,
    audit_report,
    in_range,
    matches_regex,
    not_null,
    referential_check,
    unique_key,
)

SF_DIR = "/root/testdata/sf0.001"

def _checks():
    # built lazily: Column exprs need an active SparkContext
    return [
        not_null("o_custkey"),
        in_range("o_totalprice", 0.0, 1_000_000.0),
        accepted_values("o_orderstatus", ["O", "F", "P"]),
        matches_regex("o_orderpriority", "^[1-5]-"),
        unique_key("o_orderkey"),
    ]

ORACLE = """
WITH w AS (
  SELECT
    sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS v0,
    count(*) AS s0,
    sum(CASE WHEN o_totalprice IS NOT NULL
             AND o_totalprice NOT BETWEEN 0.0 AND 1000000.0
        THEN 1 ELSE 0 END) AS v1,
    count(*) AS s1,
    sum(CASE WHEN o_orderstatus IS NOT NULL
             AND o_orderstatus NOT IN ('O','F','P')
        THEN 1 ELSE 0 END) AS v2,
    count(*) AS s2,
    sum(CASE WHEN o_orderpriority IS NOT NULL
             AND NOT regexp_matches(o_orderpriority, '^[1-5]-')
        THEN 1 ELSE 0 END) AS v3,
    count(*) AS s3,
    count(o_orderkey) - count(DISTINCT o_orderkey) AS v4,
    count(o_orderkey) AS s4
  FROM orders
)
SELECT ck AS "check", v AS violations, s AS checked, v = 0 AS passed
FROM w, LATERAL (VALUES
  ('not_null:o_custkey', v0, s0),
  ('range:o_totalprice', v1, s1),
  ('accepted:o_orderstatus', v2, s2),
  ('regex:o_orderpriority', v3, s3),
  ('unique:o_orderkey', v4, s4)) t(ck, v, s)
ORDER BY ck
"""


def test_audit_differential_real_orders(spark):
    got = audit_checks(load(spark, SF_DIR, "orders"), _checks())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{SF_DIR}/orders.parquet'"
    )
    cur = con.execute(ORACLE)
    o_cols = [d[0] for d in cur.description]
    o_rows = [tuple(str(v) for v in r) for r in cur.fetchall()]
    s_rows = [
        tuple(str(v) for v in (r.check, r.violations, r.checked, r.passed))
        for r in got.collect()
    ]
    assert got.columns == o_cols
    assert s_rows == o_rows
    # clean testdata: every check passes, and checked == row counts
    assert all(r.passed for r in got.collect())


def test_audit_fires_on_seeded_violations(spark):
    rows = [
        (1, 10, "O", 50.0, "1-URGENT"),
        (2, None, "O", 50.0, "2-HIGH"),      # null custkey
        (3, 11, "X", 50.0, "3-MEDIUM"),      # bad status
        (4, 12, "F", -5.0, "4-NOT SPEC"),    # out of range
        (4, 13, "P", 50.0, "9-BOGUS"),       # dup key + bad priority
        (5, None, "O", None, None),          # nulls pass range/regex
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderpriority string",
    )
    got = {r.check: (r.violations, r.checked, r.passed)
           for r in audit_checks(df, _checks()).collect()}
    assert got["not_null:o_custkey"] == (2, 6, False)
    assert got["range:o_totalprice"] == (1, 6, False)
    assert got["accepted:o_orderstatus"] == (1, 6, False)
    assert got["regex:o_orderpriority"] == (1, 6, False)
    assert got["unique:o_orderkey"] == (1, 6, False)


def test_referential_check_orphans(spark):
    orders = load(spark, SF_DIR, "orders")
    customer = load(spark, SF_DIR, "customer")
    ok = referential_check(orders, "o_custkey", customer, "c_custkey")
    row = ok.collect()[0]
    assert (row.check, row.violations, row.passed) == ("ref:o_custkey", 0, True)
    # poison one fk: exactly the poisoned rows are orphans
    poisoned = orders.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 100 == 0, F.lit(-1)).otherwise(
            F.col("o_custkey")
        ),
    )
    n_poisoned = poisoned.filter(F.col("o_custkey") == -1).count()
    row = referential_check(
        poisoned, "o_custkey", customer, "c_custkey"
    ).collect()[0]
    assert row.violations == n_poisoned > 0
    assert not row.passed


def test_audit_report_unions_shapes(spark):
    orders = load(spark, SF_DIR, "orders")
    customer = load(spark, SF_DIR, "customer")
    rep = audit_report(
        orders,
        _checks(),
        referential=[
            referential_check(orders, "o_custkey", customer, "c_custkey")
        ],
    )
    rows = rep.collect()
    assert [r.check for r in rows] == sorted(r.check for r in rows)
    assert len(rows) == len(_checks()) + 1
    assert all(r.passed for r in rows)


def test_audit_is_single_scan(spark):
    """The row-level audit must read the input exactly once no matter
    how many checks run: one parquet scan in the physical plan."""
    plan = audit_checks(
        load(spark, SF_DIR, "orders"), _checks()
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_maybe_key = st.one_of(st.none(), st.integers(min_value=0, max_value=5))
_maybe_price = st.one_of(
    st.none(),
    st.floats(
        min_value=-100.0, max_value=2_000_000.0,
        allow_nan=False, allow_infinity=False,
    ),
)
_maybe_status = st.one_of(
    st.none(), st.sampled_from(["O", "F", "P", "X", "", "o"])
)
_row = st.tuples(
    st.integers(min_value=0, max_value=6),  # orderkey — dup-prone
    _maybe_key,
    _maybe_status,
    _maybe_price,
    st.one_of(st.none(), st.sampled_from(["1-URGENT", "9-BAD", ""])),
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(_row, min_size=1, max_size=15))
def test_audit_property_differential(spark, rows):
    """Property differential on RANDOM tiny tables (nulls everywhere,
    duplicate keys, boundary prices, empty strings): the one-scan
    audit must agree with DuckDB's FILTER-aggregate oracle
    cell-for-cell — seeded fixtures can't reach these combinations."""
    import pandas as pd

    pdf = pd.DataFrame(
        rows,
        columns=[
            "o_orderkey", "o_custkey", "o_orderstatus",
            "o_totalprice", "o_orderpriority",
        ],
    ).astype(
        {"o_orderkey": "int64", "o_custkey": "float64",
         "o_totalprice": "float64"}
    )
    sdf = spark.createDataFrame(
        pdf,
        "o_orderkey long, o_custkey double, o_orderstatus string, "
        "o_totalprice double, o_orderpriority string",
    )
    got = audit_checks(sdf, _checks())
    con = duckdb.connect()
    con.register("orders", pdf)
    cur = con.execute(ORACLE)
    o_rows = [tuple(str(v) for v in r) for r in cur.fetchall()]
    s_rows = [
        tuple(str(v) for v in (r.check, r.violations, r.checked, r.passed))
        for r in got.collect()
    ]
    assert s_rows == o_rows


def test_audit_empty_input_passes_with_zero_violations(spark):
    """Zero-row input: every check reports 0 violations / passed=True
    (sum-over-zero-rows would be SQL NULL — the count form avoids a
    NULL verdict that a publish gate would misread)."""
    empty = spark.createDataFrame(
        [],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderpriority string",
    )
    rows = audit_checks(empty, _checks()).collect()
    assert len(rows) == len(_checks())
    for r in rows:
        assert r.violations == 0
        assert r.checked == 0
        assert r.passed is True


def test_referential_check_shuffled_path_matches_broadcast(spark):
    """broadcast_parent=False (fact-scale parent): same verdict as the
    broadcast path, for both clean and poisoned inputs."""
    orders = load(spark, SF_DIR, "orders")
    customer = load(spark, SF_DIR, "customer")
    for parent in (customer, customer.limit(50)):
        a = referential_check(
            orders, "o_custkey", parent, "c_custkey", broadcast_parent=True
        ).collect()[0]
        b = referential_check(
            orders, "o_custkey", parent, "c_custkey", broadcast_parent=False
        ).collect()[0]
        assert (a.violations, a.checked, a.passed) == (
            b.violations, b.checked, b.passed
        )
