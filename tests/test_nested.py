"""Nested-schema flattening (operators/nested.py, round-11 fourth
wave): JSON-shaped fixtures through flatten_structs/explode_path,
checked against hand-computed frames; collision and outer-explode
(row-preserving) semantics pinned."""

from __future__ import annotations

import pytest

from data_ingestor_gluejob_script_spark.operators.nested import (
    explode_path,
    flatten_structs,
)


def _json_df(spark):
    data = [
        """{"id":1,"user":{"name":"ann","geo":{"lat":1.5,"lon":2.5}},
            "tags":["a","b"],
            "orders":[{"sku":"x","qty":2},{"sku":"y","qty":1}]}""",
        """{"id":2,"user":{"name":"bo","geo":null},
            "tags":[],
            "orders":[]}""",
        """{"id":3,"user":null,"tags":null,"orders":null}""",
    ]
    return spark.read.json(spark.sparkContext.parallelize(data))


def test_flatten_structs_recursive(spark):
    flat = flatten_structs(_json_df(spark))
    assert set(flat.columns) == {
        "id", "orders", "tags", "user_name", "user_geo_lat",
        "user_geo_lon",
    }
    rows = {r.id: r for r in flat.collect()}
    assert rows[1].user_name == "ann"
    assert rows[1].user_geo_lat == 1.5
    # NULL struct -> NULL children, row preserved
    assert rows[2].user_geo_lat is None
    assert rows[3].user_name is None


def test_explode_path_outer_keeps_empty_and_null(spark):
    df = flatten_structs(_json_df(spark))
    orders = explode_path(df, "orders")
    assert {"orders_sku", "orders_qty"} <= set(orders.columns)
    got = sorted(
        (r.id, r.orders_sku, r.orders_qty) for r in orders.collect()
    )
    assert got == [
        (1, "x", 2),
        (1, "y", 1),
        (2, None, None),  # empty array keeps its row
        (3, None, None),  # NULL array keeps its row
    ]


def test_explode_path_scalar_array(spark):
    df = _json_df(spark).select("id", "tags")
    got = sorted((r.id, r.tags) for r in explode_path(df, "tags").collect())
    assert got == [(1, "a"), (1, "b"), (2, None), (3, None)]


def test_collisions_raise(spark):
    df = spark.createDataFrame(
        [(1, (2,), 3)], "id int, a struct<b:int>, a_b int"
    )
    with pytest.raises(ValueError, match="collision"):
        flatten_structs(df)
    df2 = spark.createDataFrame(
        [(1, [(2,)], 3)],
        "id int, a array<struct<b:int>>, a_b int",
    )
    with pytest.raises(ValueError, match="collision"):
        explode_path(df2, "a")


def test_explode_path_rejects_non_array(spark):
    df = spark.createDataFrame([(1,)], "id int")
    with pytest.raises(ValueError, match="not an array"):
        explode_path(df, "id")


def test_flatten_is_pure_projection(spark):
    """No shuffle, no generator: the flatten must stay a Project over
    the scan so nested-column pruning survives."""
    import contextlib
    import io

    df = spark.createDataFrame(
        [(1, ("a", (1.0, 2.0)))],
        "id int, user struct<name:string, geo:struct<lat:double,lon:double>>",
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        flatten_structs(df).explain("formatted")
    p = buf.getvalue()
    assert "Exchange" not in p
    assert "Generate" not in p