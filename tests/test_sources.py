"""Source contract tests: missing CSV → None (gluejob.py:238-240),
by-name column mapping under reordered/extra columns, missing schema
column → error, JDBC SQL generation + watermark validation."""

from __future__ import annotations

import pytest

from data_ingestor_gluejob_script_spark.registry import spec
from data_ingestor_gluejob_script_spark.sources.files import read_csv_table
from data_ingestor_gluejob_script_spark.sources.jdbc import (
    bounds_probe_sql,
    incremental_sql,
    partition_options,
    validate_watermark,
)

ORDERS = spec("retail_orders")


def _write_csv(path, header, rows, sep=";"):
    with open(path, "w") as f:
        f.write(sep.join(header) + "\n")
        for r in rows:
            f.write(sep.join(r) + "\n")


def test_missing_csv_returns_none(spark, tmp_path):
    assert read_csv_table(spark, str(tmp_path / "nope.csv"), ORDERS) is None


def test_reordered_and_extra_columns_map_by_name(spark, tmp_path):
    # Header order differs from the schema and has an extra column —
    # values must land under the right names (gluejob.py:234-236
    # usecols semantics, NOT positional).
    path = str(tmp_path / "retail_orders.csv")
    header = ["status", "id", "extra_col"] + [
        c for c in ORDERS.columns if c not in ("id", "status")
    ]
    row = ["ok", "42", "IGNORED"] + [
        f"v_{c}" for c in ORDERS.columns if c not in ("id", "status")
    ]
    _write_csv(path, header, [row])
    out = read_csv_table(spark, path, ORDERS)
    assert out.columns == list(ORDERS.columns)
    got = out.collect()[0]
    assert got.id == "42" and got.status == "ok"
    assert "extra_col" not in out.columns


def test_missing_schema_column_raises(spark, tmp_path):
    path = str(tmp_path / "retail_orders.csv")
    _write_csv(path, ["id", "status"], [["1", "ok"]])
    with pytest.raises(ValueError, match="missing schema columns"):
        read_csv_table(spark, path, ORDERS)


def test_incremental_sql_direct_table():
    sql = incremental_sql(spec("retail_orders"), "2024-01-01 00:00:00")
    assert sql == (
        "SELECT retail_orders.* FROM retail_orders "
        "WHERE retail_orders.updated_at >= '2024-01-01 00:00:00'"
    )


def test_incremental_sql_three_hop_chain():
    # Mirrors retail_provisionings_query (gluejob.py:569-579).
    sql = incremental_sql(spec("retail_provisionings"), "2024-01-01 00:00:00")
    assert "JOIN retail_items ON retail_items.id = retail_provisionings.retail_item_id" in sql
    assert "JOIN retail_plans ON retail_plans.id = retail_items.retail_plan_id" in sql
    assert (
        "JOIN retail_subscriptions ON retail_subscriptions.id = retail_plans.retail_subscription_id"
        in sql
    )
    assert sql.endswith(
        "WHERE retail_subscriptions.updated_at >= '2024-01-01 00:00:00'"
    )
    assert sql.startswith("SELECT retail_provisionings.* ")


def test_incremental_sql_uses_anchor_wm_col_not_childs():
    """Chained tables must filter on the ANCHOR's watermark column,
    resolved from the anchor's registry entry — a chained spec whose
    own wm_col differs must not leak it into the WHERE clause (it may
    not even exist on the anchor)."""
    from data_ingestor_gluejob_script_spark.registry import TableSpec

    odd = TableSpec(
        "odd_child",
        ("id", "retail_subscription_id", "created_at", "updated_at"),
        wm_col="modified_at",  # child's own column; anchor has updated_at
        chain=(("retail_subscription_id", "retail_subscriptions", "id"),),
    )
    sql = incremental_sql(odd, "2024-01-01 00:00:00")
    assert sql.endswith(
        "WHERE retail_subscriptions.updated_at >= '2024-01-01 00:00:00'"
    )
    assert "modified_at" not in sql


def test_incremental_sql_checkout_uses_physical_source_table():
    """checkout_orders extracts from the SQL Server table
    TB_Checkout_Orders (gluejob.py:525), not the lake name."""
    sql = incremental_sql(spec("checkout_orders"), "2024-01-01 00:00:00")
    assert "FROM TB_Checkout_Orders" in sql
    assert sql.endswith(
        "WHERE TB_Checkout_Orders.DT_UpdatedAt >= '2024-01-01 00:00:00'"
    )


def test_clock_sql_aliases_survive_sparks_subquery_wrapping():
    """Spark wraps the query option as SELECT * FROM (<sql>) t; SQL
    Server rejects derived tables with unnamed columns, so both clock
    statements must alias their single column."""
    from data_ingestor_gluejob_script_spark.sources.jdbc import _CLOCK_SQL

    for sql in _CLOCK_SQL.values():
        assert " AS " in sql


def test_read_csv_multiline_quoted_fields(spark, tmp_path):
    """A quoted field with an embedded newline and doubled quotes (the
    pandas dialect the reference parses, e.g. checkout_order_xml blobs)
    must stay ONE intact record, not split into malformed rows."""
    from data_ingestor_gluejob_script_spark.registry import CATALOG
    from data_ingestor_gluejob_script_spark.sources.files import (
        read_csv_table,
    )

    orders = CATALOG["retail_orders"]
    path = str(tmp_path / "retail_orders.csv")
    xml = '<a attr=""q"">line1\nline2</a>'
    with open(path, "w") as f:
        f.write(";".join(orders.columns) + "\n")
        row = {c: f"v_{c}" for c in orders.columns}
        row["checkout_order_xml"] = f'"{xml}"'
        f.write(";".join(row[c] for c in orders.columns) + "\n")
    df = read_csv_table(spark, path, orders)
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0].checkout_order_xml == '<a attr="q">line1\nline2</a>'
    assert rows[0].id == "v_id"


def test_partition_options_full_quartet_as_dbtable_subquery():
    # Spark's JDBC source forbids partitionColumn alongside `query` and
    # requires all four range options together — assert the exact dict.
    sql = incremental_sql(spec("retail_orders"), "2024-01-01 00:00:00")
    opts = partition_options(sql, "id", 100, 5000, 8)
    assert opts == {
        "dbtable": f"({sql}) AS sub",
        "partitionColumn": "id",
        "lowerBound": "100",
        "upperBound": "5000",
        "numPartitions": "8",
    }
    assert "query" not in opts


def test_bounds_probe_sql_wraps_pushdown_subquery():
    sql = incremental_sql(spec("retail_orders"), "2024-01-01 00:00:00")
    probe = bounds_probe_sql(sql, "id")
    assert probe == (
        f"SELECT MIN(id) AS lo, MAX(id) AS hi FROM ({sql}) AS sub"
    )


def test_watermark_validation_rejects_injection():
    with pytest.raises(ValueError):
        validate_watermark("2024-01-01 00:00:00' OR '1'='1")
    with pytest.raises(ValueError):
        validate_watermark("; DROP TABLE retail_orders")
    assert validate_watermark("2024-01-01 00:00:00") == "2024-01-01 00:00:00"


def test_json_reader_contract(spark, tmp_path):
    import json as _json

    from data_ingestor_gluejob_script_spark.sources.files import (
        read_json_table,
    )

    # Missing file → None.
    assert read_json_table(spark, str(tmp_path / "nope.json"), ORDERS) is None

    # Extra fields dropped, values land by name, all-string coercion.
    path = str(tmp_path / "retail_orders.json")
    rec = {c: f"v_{c}" for c in ORDERS.columns} | {
        "id": 7, "extra": "IGNORED"
    }
    with open(path, "w") as f:
        f.write(_json.dumps(rec) + "\n")
    out = read_json_table(spark, path, ORDERS)
    assert out.columns == list(ORDERS.columns)
    row = out.collect()[0]
    assert row.id == "7"  # int coerced to lake string
    assert row.status == "v_status"

    # Missing schema column → error.
    bad = str(tmp_path / "bad.json")
    with open(bad, "w") as f:
        f.write(_json.dumps({"id": "1"}) + "\n")
    with pytest.raises(ValueError, match="missing schema columns"):
        read_json_table(spark, bad, ORDERS)


def test_orc_roundtrip_and_missing(spark, tmp_path):
    """ORC write/read roundtrip preserves values and types; missing
    path honors the None contract; filters/pruning reach the ORC scan
    like parquet."""
    import io
    from contextlib import redirect_stdout

    import pyspark.sql.functions as F

    from data_ingestor_gluejob_script_spark.queries._util import load
    from data_ingestor_gluejob_script_spark.sources.files import (
        read_orc_table,
    )

    src = load(spark, "/root/testdata/sf0.001", "orders")
    path = str(tmp_path / "orders_orc")
    src.write.orc(path)

    back = read_orc_table(spark, path)
    assert back is not None
    assert back.count() == src.count()
    assert dict(back.dtypes) == dict(src.dtypes)
    s = src.agg(F.round(F.sum("o_totalprice"), 2)).collect()[0][0]
    b = back.agg(F.round(F.sum("o_totalprice"), 2)).collect()[0][0]
    assert s == b

    assert read_orc_table(spark, str(tmp_path / "nope")) is None

    buf = io.StringIO()
    with redirect_stdout(buf):
        back.select("o_orderkey").filter(
            F.col("o_custkey") == 7
        ).explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "o_custkey" in plan


def test_jsonl_quarantine_splits_good_and_bad(spark, tmp_path):
    from data_ingestor_gluejob_script_spark.sources.files import (
        read_jsonl_quarantine,
    )

    p = tmp_path / "crawl.jsonl"
    lines = [
        '{"doc_id": 1, "text": "hello world"}',
        'not json at all {{{',
        '{"doc_id": 2, "text": "second"}',
        '{"doc_id": "3", "text": ',  # truncated mid-object
        '{"doc_id": 4, "text": null}',  # valid: null field, not corrupt
    ]
    p.write_text("\n".join(lines) + "\n")

    good, bad = read_jsonl_quarantine(
        spark, str(p), "doc_id LONG, text STRING"
    )
    got_good = sorted(
        (r["doc_id"], r["text"]) for r in good.collect()
    )
    assert got_good == [(1, "hello world"), (2, "second"), (4, None)]
    got_bad = sorted(r["raw_line"] for r in bad.collect())
    assert got_bad == sorted([lines[1], lines[3]])
    assert all(
        r["src_file"].endswith("crawl.jsonl") for r in bad.collect()
    )


def test_jsonl_quarantine_all_clean_and_all_bad(spark, tmp_path):
    from data_ingestor_gluejob_script_spark.sources.files import (
        read_jsonl_quarantine,
    )

    clean = tmp_path / "clean.jsonl"
    clean.write_text('{"doc_id": 1, "text": "a"}\n')
    good, bad = read_jsonl_quarantine(
        spark, str(clean), "doc_id LONG, text STRING"
    )
    assert good.count() == 1 and bad.count() == 0

    broken = tmp_path / "broken.jsonl"
    broken.write_text("garbage\nmore garbage\n")
    good, bad = read_jsonl_quarantine(
        spark, str(broken), "doc_id LONG, text STRING"
    )
    assert good.count() == 0 and bad.count() == 2
