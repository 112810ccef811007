"""Differentials for the one-pass column profiler
(queries/profile.py, round-11 fourth wave): exact fields
(rows/nulls/min/max/mean/stddev) against a DuckDB oracle over the
same parquet; approximate fields (HLL distinct, GK quantiles)
against exact values under their published error bounds. Outlier
flags against a python Tukey twin on data where the approximate
quartiles are provably exact."""

from __future__ import annotations

import math
import random

import duckdb
import pytest

from data_ingestor_gluejob_script_spark.queries.profile import (
    iqr_outliers,
    profile_frame,
)

SF = "/root/testdata/sf0.01"


def test_profile_matches_duckdb_exact_fields(spark):
    path = f"{SF}/orders.parquet"
    prof = {
        r.column: r
        for r in profile_frame(spark.read.parquet(path)).collect()
    }
    con = duckdb.connect()
    for col in ["o_orderkey", "o_custkey", "o_totalprice",
                "o_orderstatus", "o_orderpriority"]:
        row = con.sql(
            f"SELECT count(*), count(*) - count({col}), "
            f"CAST(min({col}) AS VARCHAR), CAST(max({col}) AS VARCHAR), "
            f"count(DISTINCT {col}) FROM read_parquet('{path}')"
        ).fetchone()
        p = prof[col]
        assert p.n_rows == row[0]
        assert p.n_nulls == row[1]
        assert p.min == row[2], col
        assert p.max == row[3], col
        # HLL++ at default 5% rsd: allow 3 sigma
        assert abs(p.n_distinct - row[4]) <= max(3, 0.15 * row[4]), col
    # numeric moments exact (one Kahan-free double agg; tolerance for
    # float association)
    m = con.sql(
        f"SELECT avg(o_totalprice), stddev_samp(o_totalprice), "
        f"median(o_totalprice) FROM read_parquet('{path}')"
    ).fetchone()
    p = prof["o_totalprice"]
    assert p.mean == pytest.approx(m[0], rel=1e-9)
    assert p.stddev == pytest.approx(m[1], rel=1e-9)
    # GK with accuracy 10k on 15k rows: rank error <= n/accuracy; the
    # value at rank +-2 of the true median bounds the answer
    vals = sorted(
        v[0]
        for v in con.sql(
            f"SELECT o_totalprice FROM read_parquet('{path}') "
            "WHERE o_totalprice IS NOT NULL"
        ).fetchall()
    )
    n = len(vals)
    lo, hi = vals[max(0, n // 2 - 3)], vals[min(n - 1, n // 2 + 3)]
    assert lo <= p.p50 <= hi
    # string column has NULL numeric stats
    assert prof["o_orderstatus"].mean is None
    assert prof["o_orderstatus"].p50 is None


def test_profile_single_scan_plan(spark):
    """The whole profile must be ONE aggregation over ONE scan — no
    per-column jobs. The optimized plan therefore contains exactly
    one parquet scan node."""
    import contextlib
    import io
    import re

    df = spark.read.parquet(f"{SF}/orders.parquet")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        profile_frame(df).explain("formatted")
    plan = buf.getvalue()
    # formatted output names each node once in the tree and once in
    # the detail section — count distinct scan NODE ids
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_profile_null_and_empty_columns(spark):
    df = spark.createDataFrame(
        [(1, None, None), (2, None, float("nan"))],
        "id int, s string, d double",
    )
    prof = {r.column: r for r in profile_frame(df).collect()}
    assert prof["s"].n_nulls == 2
    assert prof["s"].n_distinct == 0
    assert prof["s"].min is None and prof["s"].max is None
    assert prof["id"].n_nulls == 0
    # complex types profile count/nulls/distinct only
    df2 = spark.createDataFrame(
        [(1, [1, 2]), (2, [1, 2]), (3, None)],
        "id int, arr array<int>",
    )
    p2 = {r.column: r for r in profile_frame(df2).collect()}
    assert p2["arr"].n_nulls == 1
    assert p2["arr"].min is None


def test_iqr_outliers_match_python_twin(spark):
    rng = random.Random(7)
    # 1..100 distinct values (GK exact below accuracy) + planted spikes
    vals = [float(rng.randrange(1, 101)) for _ in range(500)]
    vals += [1e6, -1e6, 500.0]
    rows = [(i, v) for i, v in enumerate(vals)] + [(9999, None)]
    df = spark.createDataFrame(rows, "id int, v double")
    got = {
        r.id: r.is_outlier
        for r in iqr_outliers(df, "v").collect()
    }
    svals = sorted(v for v in vals)
    n = len(svals)

    def gk_quantile(p):
        # percentile_approx returns an element at rank ceil(p*n) with
        # zero error when n << accuracy
        return svals[min(n - 1, max(0, math.ceil(p * n) - 1))]

    q1, q3 = gk_quantile(0.25), gk_quantile(0.75)
    lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
    for i, v in enumerate(vals):
        assert got[i] == (v < lo or v > hi), (i, v, lo, hi)
    assert got[9999] is False  # NULL is never an outlier


def test_iqr_outliers_plan_is_broadcast(spark):
    import contextlib
    import io

    df = spark.range(100).selectExpr("id", "CAST(id AS DOUBLE) v")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        iqr_outliers(df, "v").explain("formatted")
    p = buf.getvalue()
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" in p