"""Driver-contract inventory invariants, plus the local differential
check for the one implemented-but-unregistered query.

The driver's correctness gate records at most 50 queries per run in
dict-insertion order — entry 51 silently gets no row (observed in
CORRECTNESS_r02/r03). Pinning the registered count at exactly 50 turns
a future 'just add one more query' into a test failure instead of a
silently unverified entry.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def test_inventory_pinned_at_50():
    qs = entry.queries()
    assert len(qs) == 50, (
        f"{len(qs)} queries registered — the driver gate records exactly "
        "50; adding one pushes another off the gate, removing one wastes "
        "a slot. Rebalance deliberately, don't drift."
    )
    # Full oracle coverage: every registered query has a DuckDB twin.
    assert set(entry.oracle_sql()) == set(qs)


def test_binary_meta_differential(spark):
    """q_binary_meta is implemented but NOT driver-registered (its
    surface is subsumed by q_media_metadata/q_media_chunks and the gate
    caps at 50) — so the promised differential check lives here: Spark
    vs the BINARY_META_ORACLE twin over the same parquet."""
    from data_ingestor_gluejob_script_spark.queries.textops import (
        BINARY_META_ORACLE,
        q_binary_meta,
    )

    got = q_binary_meta(spark, SF_DIR)
    cols = got.columns
    spark_rows = sorted(
        tuple(str(r[c]) for c in sorted(cols)) for r in got.collect()
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    cur = con.execute(BINARY_META_ORACLE)
    o_cols = [d[0] for d in cur.description]
    assert sorted(o_cols) == sorted(cols)
    order = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
    oracle_rows = sorted(
        tuple(str(row[i]) for i in order) for row in cur.fetchall()
    )
    assert spark_rows == oracle_rows


def test_merge_upsert_differential(spark):
    """q_merge_upsert is implemented but NOT driver-registered (the
    gate caps at 50 and q_upsert_dedup holds the upsert slot) — so its
    DuckDB differential lives here: the join formulation vs the exact
    oracle text the window formulation is gated on."""
    from data_ingestor_gluejob_script_spark.queries.core import (
        MERGE_UPSERT_ORACLE,
        q_merge_upsert,
    )

    got = q_merge_upsert(spark, SF_DIR)
    cols = got.columns
    spark_rows = sorted(
        tuple(str(r[c]) for c in sorted(cols)) for r in got.collect()
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{SF_DIR}/orders.parquet'"
    )
    cur = con.execute(MERGE_UPSERT_ORACLE)
    o_cols = [d[0] for d in cur.description]
    assert sorted(o_cols) == sorted(cols)
    order = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
    oracle_rows = sorted(
        tuple(str(row[i]) for i in order) for row in cur.fetchall()
    )
    assert spark_rows == oracle_rows
