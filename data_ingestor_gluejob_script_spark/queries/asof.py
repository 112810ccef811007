"""As-of join query: each event paired with the same user's most
recent ``purchase`` event at or before it (NULLs when none precedes).

The reference has no as-of operator (SURVEY.md §2.2); this is the
temporal-join surface a training-data/feature pipeline needs
(point-in-time-correct feature lookup). The Spark implementation is
``operators.relational.asof_join`` — union + carry-forward window, one
shuffle, linear — while the DuckDB oracle uses its native ASOF LEFT
JOIN, making this a genuine cross-engine semantic check of the
operator, not a restatement of the same plan.

Right side is pre-deduplicated to one purchase per (user_id, ts)
keeping the max event_id — ASOF tie-breaking between equal timestamps
is otherwise engine-nondeterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.relational import asof_join
from ._util import load


def q_asof_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("purchase_ts"))
        .agg(F.max("event_id").alias("purchase_event_id"))
    )
    left = ev.select("event_id", "user_id", "ts", "event_type")
    return asof_join(
        left, purchases, on="user_id", left_ts="ts", right_ts="purchase_ts"
    )


QUERIES = {"q_asof_purchase": q_asof_purchase}

ORACLES = {
    "q_asof_purchase": """
        WITH e AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts, event_type
                   FROM events),
        p AS (SELECT user_id, ts AS purchase_ts,
                     max(event_id) AS purchase_event_id
              FROM e WHERE event_type = 'purchase'
              GROUP BY user_id, ts)
        SELECT e.event_id, e.user_id, e.ts, e.event_type,
               p.purchase_ts, p.purchase_event_id
        FROM e ASOF LEFT JOIN p
          ON e.user_id = p.user_id AND e.ts >= p.purchase_ts
    """,
}
