"""Bucketed tables co-locate joins: after bucketing both sides on the
join key, the join plan contains NO shuffle exchange."""

from __future__ import annotations

import contextlib
import io
import os
import shutil

from data_ingestor_gluejob_script_spark.pipeline import write_bucketed


def test_bucketed_join_has_no_exchange(spark):
    sf = "/root/testdata/sf0.001"
    # The warehouse dir outlives the session catalog: drop any table
    # registration AND remove orphan directories from prior runs.
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("t_li_bucketed", "t_ord_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
    lineitem = spark.read.parquet(f"{sf}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    write_bucketed(
        lineitem, "t_li_bucketed", ["l_orderkey"], 4, ["l_orderkey"]
    )
    write_bucketed(
        orders, "t_ord_bucketed", ["o_orderkey"], 4, ["o_orderkey"]
    )
    li = spark.table("t_li_bucketed")
    od = spark.table("t_ord_bucketed").hint("merge")  # forbid broadcast
    joined = li.join(od, li["l_orderkey"] == od["o_orderkey"], "inner")

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # co-located: bucketing IS the shuffle
    # Result is still correct.
    n = joined.count()
    plain = lineitem.join(
        orders, lineitem["l_orderkey"] == orders["o_orderkey"]
    ).count()
    assert n == plain
