"""Temporal operators (O2-O5): timestamp parse/format, date-part
extraction, and write-partition derivation.

Reference parity: ``pd.to_datetime`` (gluejob.py:182), ``.dt.year`` /
``.dt.month`` (:183), ``strftime('%Y-%m-%d %H:%M:%S.%f')`` (:186), and
the no-aggregate ``groupby((year, month))`` used purely to split rows
into write partitions (:183-188). In Spark the groupby-loop disappears:
partition columns become real columns and ``write.partitionBy`` does
the split as a distributed shuffle-on-write instead of a sequential
driver loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# gluejob.py:186 — microsecond-precision lake timestamp format.
MICRO_FORMAT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def parse_ts(col: Column) -> Column:
    """O2 (gluejob.py:182).

    A plain cast on purpose: under the engine session (Spark 4 ANSI
    default) an unparseable non-null string THROWS
    (CAST_INVALID_INPUT) — matching pd.to_datetime's errors='raise' —
    while NULL stays NULL, matching pandas' NaT for missing values
    (those rows land in the __HIVE_DEFAULT_PARTITION__ directory,
    which the upsert merge predicate handles null-safely). Only a
    caller-supplied non-ANSI session degrades garbage to silent
    NULLs."""
    return col.cast("timestamp")


def format_ts_micro(col: Column) -> Column:
    """O4: serialize back to the stringly-typed lake with microsecond
    precision (gluejob.py:186)."""
    return F.date_format(col, MICRO_FORMAT)


def derive_partitions(df: DataFrame, ts_col: str, prefix: str) -> DataFrame:
    """O3+O5: add ``{prefix}_year`` / ``{prefix}_month`` partition
    columns from the (string) event-time column (gluejob.py:182-183).
    The caller hands these to ``write.partitionBy`` — Spark's
    shuffle-on-write replaces the reference's per-partition loop
    (gluejob.py:185-188)."""
    ts = parse_ts(F.col(ts_col))
    return df.withColumn(f"{prefix}_year", F.year(ts)).withColumn(
        f"{prefix}_month", F.month(ts)
    )
