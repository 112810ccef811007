"""Testdata drift tripwire. The driver regenerates the parquet
testdata between rounds and has already changed physical encodings
once (events.ts TIMESTAMP(NANOS) → timestamp[us], round 6 — which
silently collapsed 30 days of events into minutes of 1970 under the
then-hardcoded loader and flipped 8 queries red). This file makes the
next drift a loud local failure (`make check`) instead of a silent
red board at judging:

- column inventory per table is pinned exactly;
- events.ts must load as plain ``timestamp`` (withWatermark rejects
  NTZ; oracle parity assumes session-UTC wall clock);
- value-level sanity on events: the time range must span days in a
  modern year — a unit mix-up (ns↔µs) collapses it 1000× toward 1970
  and fails here immediately, whatever the physical encoding.
"""

from __future__ import annotations

import datetime as dt
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_ingestor_gluejob_script_spark.queries._util import load  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

EXPECTED_COLUMNS = {
    "region": ["r_regionkey", "r_name"],
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    "supplier": ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    "part": ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
    "orders": [
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    ],
    "lineitem": [
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate",
    ],
    "events": ["event_id", "ts", "user_id", "event_type", "value", "props"],
    "documents": ["doc_id", "text", "lang", "source", "n_chars"],
    "embeddings": ["vec_id", "embedding", "label"],
}

# Temporal columns may arrive as timestamp, timestamp_ntz, or date at
# the physical level — the queries tolerate all three THROUGH load();
# anything else (e.g. bigint epoch) means a loader change is needed.
TEMPORAL = {("orders", "o_orderdate"), ("lineitem", "l_shipdate")}


@pytest.mark.parametrize("table", sorted(EXPECTED_COLUMNS))
def test_table_contract(spark, table):
    df = load(spark, SF_DIR, table)
    assert df.columns == EXPECTED_COLUMNS[table]
    dtypes = dict(df.dtypes)
    for t, col in TEMPORAL:
        if t == table:
            assert dtypes[col] in ("timestamp", "timestamp_ntz", "date")
    if table == "events":
        assert dtypes["ts"] == "timestamp"


def test_events_time_range_sane(spark):
    """A ns<->us unit mix-up shrinks (or explodes) the range 1000x:
    30 days of 2024 events became ~43 minutes of 1970-01-20 in round
    6. Whatever the encoding, the decoded range must span days within
    a plausible decade."""
    lo, hi = load(spark, SF_DIR, "events").selectExpr(
        "min(ts)", "max(ts)"
    ).collect()[0]
    assert lo.year >= 2000, f"events.ts decoded into the past: {lo}"
    assert hi.year <= 2100, f"events.ts decoded into the future: {hi}"
    assert hi - lo >= dt.timedelta(days=1), (
        f"events.ts range collapsed to {hi - lo} — unit mix-up?"
    )
