"""Window-family queries over the ``events`` stream table: sliding
(hopping) windows, session windows, and ordered analytic windows —
the batch forms of the streaming surfaces in ``streaming.py``.

Cross-engine notes:
- Sliding windows: Spark's ``window(ts, '1 hour', '30 minutes')``
  assigns each event to the 2 hop-aligned windows covering it; the
  oracle reproduces the assignment arithmetic (start ∈ {floor30(ts),
  floor30(ts) − 30 min}) with a 2-element unnest.
- Session windows: Spark's ``session_window(ts, gap)`` is mirrored as
  the classic gaps-and-islands (lag + cumulative sum of gap breaks).
  Only the session START is compared — Spark defines session end as
  ``last event + gap``, an implementation detail, while min(ts) is
  engine-neutral.
- Analytic windows (lag / moving average): identical ROWS-frame
  semantics in both engines; floats rounded before compare.

Scale note (100 TB): ``q_percentiles`` uses EXACT ``F.percentile`` —
required for the oracle hash-match, but sort-based per group. The
operator of record at scale is ``q_percentiles_approx`` (mergeable
Greenwald-Khanna sketch, map-side combinable, bounded memory); it is
pytest-verified against the exact form within relative-error bounds
(tests/test_operators.py) and kept out of the driver registry only
because a sketch can't hash-match DuckDB's t-digest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._util import load

SESSION_GAP_MIN = 5


def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping 1h windows every 30 min: each event lands in 2 windows.
    One explode (window assignment is map-side) + one hash aggregate."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.window("ts", "1 hour", "30 minutes").alias("w")
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    ).select(F.col("w.start").alias("window_start"), "n_events", "sum_value")


def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows (5-minute inactivity gap): session
    start + event count + value sum. session_window keeps state
    bounded by the gap horizon in the streaming twin."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", f"{SESSION_GAP_MIN} minutes"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered analytic window: 3-row moving average of value and the
    gap to the previous event, per user — one shuffle on user_id."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(-2, 0)
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(frame), 4).alias("avg3_value"),
        (
            F.col("ts").cast("long") - F.lag(F.col("ts").cast("long"), 1).over(w)
        ).alias("secs_since_prev"),
    )


def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregate: per user, distinct event types + total
    events. Spark expands distinct aggs into a two-phase plan."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.countDistinct("event_type").alias("n_types"),
        F.count("*").alias("n_events"),
    )


def q_distinct_agg_approx(
    spark: SparkSession, sf_dir: str, rsd: float = 0.02
) -> DataFrame:
    """Scale-path twin of ``q_distinct_agg``: HyperLogLog++
    (``approx_count_distinct``) replaces the exact distinct count.

    Exact COUNT(DISTINCT) expands into a two-phase plan that shuffles
    every (group, value) pair to dedup before counting — at 100 TB the
    expanded key space is the bottleneck. The HLL sketch is fixed-size
    (~kilobytes at rsd=2%), mergeable, and map-side combinable: only
    sketches cross the shuffle, one row per group.

    Not driver-registered (an HLL estimate can't hash-match DuckDB's
    exact count); verified against the exact form within the sketch's
    relative standard deviation in tests/test_operators.py.
    """
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.approx_count_distinct("event_type", rsd).alias("n_types"),
        F.count("*").alias("n_events"),
    )


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT surface: users who produced clicks but never
    purchases (EXCEPT) plus users with both (INTERSECT), tagged."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id")
    # Set semantics, not bag: distinct first, then EXCEPT DISTINCT —
    # exceptAll on the raw multisets would leave (n_clicks −
    # n_purchases) rows and mislabel users who did both.
    both = clicks.intersect(purchases).withColumn("segment", F.lit("both"))
    only_clicks = (
        clicks.distinct()
        .subtract(purchases.distinct())
        .withColumn("segment", F.lit("clicks_only"))
    )
    return both.unionByName(only_clicks)


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar-function surface: extract props.k per event and
    aggregate it per event_type — get_json_object stays JVM-side (no
    Python JSON parsing in the hot path)."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median / p90) of value per
    event_type — deterministic in both engines, unlike approx
    sketches (approx_percentile vs DuckDB's t-digest would never
    hash-match)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90"),
        F.round(F.avg("value"), 4).alias("mean_value"),
    )


def q_percentiles_approx(
    spark: SparkSession, sf_dir: str, accuracy: int = 10_000
) -> DataFrame:
    """Scale-path twin of ``q_percentiles``: ``percentile_approx``'s
    Greenwald-Khanna sketch replaces the exact sort-based percentile.

    Exact ``F.percentile`` materializes and sorts every group's values
    — fine at test scale, a per-group sort of the full 100 TB column at
    scale. The sketch is fixed-size, mergeable, and map-side
    combinable: each partition summarizes locally and only sketches
    cross the shuffle. Rank error is bounded by ``n / accuracy``.

    Not driver-registered (a sketch can't hash-match DuckDB's t-digest
    — see q_percentiles); verified against the exact form within
    relative-error bounds in tests/test_operators.py.
    """
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile_approx("value", F.lit(0.5), F.lit(accuracy)).alias("p50"),
        F.percentile_approx("value", F.lit(0.9), F.lit(accuracy)).alias("p90"),
        F.round(F.avg("value"), 4).alias("mean_value"),
    )


RANGE_JOIN_SECS = 60


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: for each error event, count the same
    user's click events within ±60 s.

    Scale shape: NOT a key+inequality join (which degenerates to a
    per-user cross product). Both sides are bucketed into 60 s time
    bands; errors probe their own band ±1 (a 3-element explode — the
    interval can only overlap adjacent bands), the join is a pure
    equi-join on (user_id, band), and the exact |Δt| ≤ 60 predicate
    filters band-edge false positives. Fan-out is bounded by events
    per band, not events per user."""
    ev = load(spark, sf_dir, "events")
    epoch = F.col("ts").cast("long")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id"),
        epoch.alias("e_sec"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        epoch.alias("c_sec"),
        F.floor(epoch / RANGE_JOIN_SECS).alias("band"),
    )
    probe = errors.withColumn(
        "band",
        F.explode(
            F.array(
                F.floor(F.col("e_sec") / RANGE_JOIN_SECS) - 1,
                F.floor(F.col("e_sec") / RANGE_JOIN_SECS),
                F.floor(F.col("e_sec") / RANGE_JOIN_SECS) + 1,
            )
        ),
    )
    joined = probe.join(clicks, ["user_id", "band"], "inner").filter(
        F.abs(F.col("c_sec") - F.col("e_sec")) <= RANGE_JOIN_SECS
    )
    counts = joined.groupBy("error_id").agg(
        F.count("*").alias("n_nearby_clicks")
    )
    return (
        errors.select("error_id", "user_id")
        .join(counts, "error_id", "left")
        .select(
            "error_id",
            "user_id",
            F.coalesce("n_nearby_clicks", F.lit(0)).alias("n_nearby_clicks"),
        )
    )


QUERIES = {
    "q_json_extract": q_json_extract,
    "q_range_join": q_range_join,
    "q_percentiles": q_percentiles,
    "q_sliding_window": q_sliding_window,
    "q_session_window": q_session_window,
    "q_moving_avg": q_moving_avg,
    "q_distinct_agg": q_distinct_agg,
    "q_set_ops": q_set_ops,
}

_GAP_SECS = SESSION_GAP_MIN * 60

ORACLES = {
    "q_range_join": """
        WITH e AS (SELECT event_id, user_id,
                          CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT) AS sec,
                          event_type
                   FROM events)
        SELECT err.event_id AS error_id, err.user_id,
               count(c.sec) AS n_nearby_clicks
        FROM e err LEFT JOIN e c
          ON c.user_id = err.user_id AND c.event_type = 'click'
         AND abs(c.sec - err.sec) <= 60
        WHERE err.event_type = 'error'
        GROUP BY err.event_id, err.user_id
    """,
    "q_percentiles": """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 4) AS p50,
               round(quantile_cont(value, 0.9), 4) AS p90,
               round(avg(value), 4) AS mean_value
        FROM events GROUP BY event_type
    """,
    "q_json_extract": """
        SELECT event_type, count(*) AS n_events,
               sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k,
               min(json_extract(props, '$.k')::BIGINT) AS min_k,
               max(json_extract(props, '$.k')::BIGINT) AS max_k
        FROM events GROUP BY event_type
    """,
    "q_sliding_window": """
        WITH e AS (SELECT ts::TIMESTAMP AS ts, value FROM events),
        assigned AS (
            SELECT unnest([
                       to_timestamp(CAST(floor(epoch(ts) / 1800) * 1800
                                         AS BIGINT))::TIMESTAMP,
                       to_timestamp(CAST(floor(epoch(ts) / 1800) * 1800
                                         - 1800 AS BIGINT))::TIMESTAMP
                   ]) AS window_start,
                   value
            FROM e)
        SELECT window_start, count(*) AS n_events,
               round(sum(value), 4) AS sum_value
        FROM assigned GROUP BY window_start
    """,
    "q_session_window": f"""
        WITH e AS (SELECT user_id, ts::TIMESTAMP AS ts, value FROM events),
        flagged AS (
            SELECT user_id, ts, value,
                   CASE WHEN epoch(ts) - epoch(lag(ts) OVER
                            (PARTITION BY user_id ORDER BY ts)) > {_GAP_SECS}
                         OR lag(ts) OVER
                            (PARTITION BY user_id ORDER BY ts) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM e),
        islands AS (
            SELECT user_id, ts, value,
                   sum(new_session) OVER
                       (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged)
        SELECT user_id, min(ts) AS session_start,
               count(*) AS n_events, round(sum(value), 4) AS sum_value
        FROM islands GROUP BY user_id, session_id
    """,
    "q_moving_avg": """
        SELECT event_id, user_id,
               round(avg(value) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
                   AS avg3_value,
               CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT)
                 - lag(CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT), 1) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id)
                   AS secs_since_prev
        FROM events
    """,
    "q_distinct_agg": """
        SELECT user_id, count(DISTINCT event_type) AS n_types,
               count(*) AS n_events
        FROM events GROUP BY user_id
    """,
    "q_set_ops": """
        WITH clicks AS (SELECT DISTINCT user_id FROM events
                        WHERE event_type = 'click'),
        purchases AS (SELECT DISTINCT user_id FROM events
                      WHERE event_type = 'purchase')
        SELECT user_id, 'both' AS segment
        FROM (SELECT user_id FROM clicks INTERSECT
              SELECT user_id FROM purchases)
        UNION ALL
        SELECT user_id, 'clicks_only' AS segment
        FROM (SELECT user_id FROM clicks EXCEPT
              SELECT user_id FROM purchases)
    """,
}
