"""Shared helpers for the declared queries.

The testdata ``events`` table stores its ``ts`` column as parquet
TIMESTAMP(NANOS), which Spark's vectorized reader rejects outright
(PARQUET_TYPE_ILLEGAL). We read it under an explicit user schema that
types ``ts`` as LongType (legal for NANOS columns regardless of the
``nanosAsLong`` legacy conf — no session-conf mutation needed) and
truncate ns → µs with integer division (``div 1000`` — floating-point
division would round instead, diverging from DuckDB's cast-truncation
semantics for TIMESTAMP_NS → TIMESTAMP and corrupting the microsecond
digit).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Fixed watermark literals (FIXTURES.md §A) — deterministic stand-ins for
# the reference's runtime watermark dict (gluejob.py:89-118).
WM = "1997-01-01 00:00:00"
WM_UPSERT = "1997-07-01 00:00:00"


def spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Repartition a small-file scan across the cluster before
    CPU-heavy per-row work (hashing, shingling, vector math).

    The documents/embeddings testdata tables are single small parquet
    files → Spark gives them ONE input partition, serializing every
    downstream map on one core. The shuffle this inserts is tiny (the
    raw rows) and buys full parallelism. At 100 TB inputs arrive in
    many splits and this becomes a no-op-sized rebalance; on a real
    cluster prefer ``spark.sql.files.maxPartitionBytes`` tuning.
    """
    return df.repartition(spark.sparkContext.defaultParallelism)


# Pinned events schema (TESTDATA.md): ts declared LongType so the
# vectorized reader accepts the TIMESTAMP(NANOS) column under ANY
# session conf — works identically with or without the legacy
# ``nanosAsLong`` flag, so the driver's vanilla session needs no
# conf mutation. Catalyst still prunes unused columns from the scan.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one testdata table, normalizing events.ts to TimestampType."""
    path = os.path.join(sf_dir, f"{table}.parquet")
    if table == "events":
        df = spark.read.schema(EVENTS_SCHEMA).parquet(path)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)
