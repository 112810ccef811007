"""asof_join operator edge semantics the oracle query can't isolate:
inclusive boundary, no-predecessor NULLs, per-key isolation, and the
duplicate-column guard."""

from __future__ import annotations

from datetime import datetime

import pytest

from data_ingestor_gluejob_script_spark.operators.relational import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_genuine_null_in_right_row_is_not_backfilled(spark):
    """A genuine NULL inside the as-of right row must come through as
    NULL — per-column carry-forward with ignorenulls would splice the
    older right row's value into that column, producing a row that
    never existed (the struct-carry contract)."""
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01T13:00:00"))],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01T10:00:00"), 5, 7),
            ("u1", _ts("2024-01-01T12:00:00"), None, 9),  # x genuinely NULL
        ],
        ["user_id", "purchase_ts", "x", "y"],
    )
    row = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="purchase_ts"
    ).collect()[0]
    assert row.purchase_ts == _ts("2024-01-01T12:00:00")
    assert row.y == 9
    assert row.x is None  # NOT 5 — no chimera of the two right rows


def test_asof_basic_boundary_and_nulls(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01T10:00:00")),  # before any right → NULL
            (2, "u1", _ts("2024-01-01T12:00:00")),  # == right ts → inclusive
            (3, "u1", _ts("2024-01-01T13:00:00")),  # after 12:00 → 12:00
            (4, "u2", _ts("2024-01-01T23:00:00")),  # other key, no rows → NULL
        ],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-01T12:00:00"), 100)],
        ["user_id", "purchase_ts", "purchase_id"],
    )
    out = {
        r.event_id: (r.purchase_ts, r.purchase_id)
        for r in asof_join(
            left, right, on="user_id", left_ts="ts", right_ts="purchase_ts"
        ).collect()
    }
    assert out[1] == (None, None)
    assert out[2] == (_ts("2024-01-01T12:00:00"), 100)  # inclusive >=
    assert out[3] == (_ts("2024-01-01T12:00:00"), 100)
    assert out[4] == (None, None)  # keys don't leak


def test_asof_picks_latest_not_any(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-05T00:00:00"))], ["event_id", "user_id", "ts"]
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01T00:00:00"), 1),
            ("u1", _ts("2024-01-04T00:00:00"), 2),  # latest ≤ left → winner
            ("u1", _ts("2024-01-06T00:00:00"), 3),  # future → excluded
        ],
        ["user_id", "purchase_ts", "purchase_id"],
    )
    row = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="purchase_ts"
    ).collect()[0]
    assert row.purchase_id == 2


def test_asof_rejects_column_overlap(spark):
    left = spark.createDataFrame([(1, "u1", 5)], ["event_id", "user_id", "ts"])
    right = spark.createDataFrame([("u1", 3, 9)], ["user_id", "ts", "x"])
    with pytest.raises(ValueError, match="duplicate columns"):
        asof_join(left, right, on="user_id", left_ts="ts", right_ts="ts")
