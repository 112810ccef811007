"""Operator edge semantics the differential oracle can't see
(SURVEY.md §5.3): O1 passthrough, O7 precedence determinism, the
short-document shingle guard, O8 coercion."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_ingestor_gluejob_script_spark.operators.normalize import (
    BOOLEAN_CANON,
    cast_all_string,
    dict_map,
    normalize_booleans,
)
from data_ingestor_gluejob_script_spark.operators.upsert import upsert_dedup
from data_ingestor_gluejob_script_spark.queries.textops import shingles_col


def test_dict_map_passthrough_unmapped(spark):
    # gluejob.py:25-28 — unmapped values pass through unchanged.
    df = spark.createDataFrame(
        [("True",), ("f",), ("banana",), (None,)], ["v"]
    )
    out = dict(
        enumerate(
            r.v for r in df.select(dict_map(F.col("v"), BOOLEAN_CANON).alias("v")).collect()
        )
    )
    assert out == {0: "true", 1: "false", 2: "banana", 3: None}


def test_normalize_booleans_only_configured_columns(spark):
    df = spark.createDataFrame([("t", "t")], ["a", "b"])
    out = normalize_booleans(df, ("a",)).collect()[0]
    assert (out.a, out.b) == ("true", "t")


def test_upsert_incoming_beats_existing(spark):
    # gluejob.py:196-198 — concat([new, old]) + keep='first'.
    incoming = spark.createDataFrame([(1, "new"), (3, "only-new")], ["id", "v"])
    existing = spark.createDataFrame([(1, "old"), (2, "only-old")], ["id", "v"])
    got = {
        r.id: r.v for r in upsert_dedup(incoming, existing, "id").collect()
    }
    assert got == {1: "new", 2: "only-old", 3: "only-new"}


def test_upsert_deterministic_within_side(spark):
    # Duplicate ids within one side must resolve to a stable winner
    # run-to-run (the reference inherits source order; we must not).
    rows = [(1, f"v{i}") for i in range(50)]
    incoming = spark.createDataFrame(rows, ["id", "v"]).repartition(7)
    winners = {
        upsert_dedup(incoming, None, "id").collect()[0].v for _ in range(3)
    }
    assert winners == {"v0"}  # asc_nulls_last over value cols


def test_upsert_no_existing(spark):
    incoming = spark.createDataFrame([(1, "a")], ["id", "v"])
    assert upsert_dedup(incoming, None, "id").count() == 1


def test_shingles_short_docs_empty(spark):
    # ANSI mode: sequence(0, n-k) with n<k must not be evaluated.
    df = spark.createDataFrame(
        [("one two",), ("",), ("a b c d",), (None,)], ["text"]
    )
    out = [r.sh for r in df.select(shingles_col(F.col("text")).alias("sh")).collect()]
    assert out == [[], [], ["a b c", "b c d"], []]


def test_cast_all_string(spark):
    df = spark.createDataFrame([(1, 2.5, True)], ["a", "b", "c"])
    out = cast_all_string(df)
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "string",
        "string",
        "string",
    ]


def test_percentiles_approx_tracks_exact_within_rel_error(spark):
    """The scale-path sketch (q_percentiles_approx) must track the
    exact operator (q_percentiles) per group within tight relative
    error at sf0.1 — the evidence that swapping it in at 100 TB trades
    bounded accuracy, not correctness."""
    from data_ingestor_gluejob_script_spark.queries.windows import (
        q_percentiles,
        q_percentiles_approx,
    )

    sf_dir = "/root/testdata/sf0.1"
    exact = {
        r.event_type: (r.p50, r.p90) for r in q_percentiles(spark, sf_dir).collect()
    }
    approx = {
        r.event_type: (r.p50, r.p90)
        for r in q_percentiles_approx(spark, sf_dir).collect()
    }
    assert set(approx) == set(exact)
    for et, (e50, e90) in exact.items():
        a50, a90 = approx[et]
        assert abs(a50 - e50) / max(abs(e50), 1e-9) < 0.02, (et, a50, e50)
        assert abs(a90 - e90) / max(abs(e90), 1e-9) < 0.02, (et, a90, e90)


def test_distinct_agg_approx_tracks_exact(spark):
    """The HLL scale twin (q_distinct_agg_approx) must agree with the
    exact distinct count per user within the sketch's error envelope —
    here cardinalities are tiny (<= 5 event types), where HLL++'s
    dense-to-sparse correction is exact in practice, so demand equality
    with a 1-count slack."""
    from data_ingestor_gluejob_script_spark.queries.windows import (
        q_distinct_agg,
        q_distinct_agg_approx,
    )

    sf_dir = "/root/testdata/sf0.1"
    exact = {
        r.user_id: (r.n_types, r.n_events)
        for r in q_distinct_agg(spark, sf_dir).collect()
    }
    approx = {
        r.user_id: (r.n_types, r.n_events)
        for r in q_distinct_agg_approx(spark, sf_dir).collect()
    }
    assert set(approx) == set(exact)
    for uid, (et, ev) in exact.items():
        at, av = approx[uid]
        assert av == ev  # the plain count is exact either way
        assert abs(at - et) <= 1, (uid, at, et)


def test_distinct_agg_approx_is_single_phase(spark):
    """The point of the sketch: ONE aggregation exchange. The exact
    form's two-phase distinct expansion shuffles (group, value) pairs;
    the HLL plan must shuffle only per-group sketches."""
    import contextlib
    import io

    from data_ingestor_gluejob_script_spark.queries.windows import (
        q_distinct_agg,
        q_distinct_agg_approx,
    )

    def n_exchanges(df) -> int:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue().count("Arguments: hashpartitioning(")

    sf_dir = "/root/testdata/sf0.001"
    assert n_exchanges(q_distinct_agg_approx(spark, sf_dir)) == 1
    # the exact expansion needs at least as many; usually more
    assert n_exchanges(q_distinct_agg(spark, sf_dir)) >= 1
