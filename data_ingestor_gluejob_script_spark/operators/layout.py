"""Z-order (Morton) data layout for multi-dimensional scan pruning.

Parquet row-group pruning works off per-file/per-row-group min/max
stats; a lake sorted on one column prunes filters on that column only.
Interleaving the bits of several normalized columns into one sort key
clusters rows that are close in EVERY dimension, so each written file
covers a small hyper-rectangle and filters on ANY of the layout
columns skip most files. This is the standard layout optimization for
scan-heavy multi-predicate workloads (Delta/Iceberg expose the same
idea as OPTIMIZE ZORDER BY / sort orders).

Everything here is expression-level (shift/mask/or — inside
whole-stage codegen): the only non-map step is the one range shuffle
that any sorted write needs, plus a single-row min/max agg collect
(metadata-sized, same class as the JDBC bounds probe).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(buckets: list[Column], bits: int) -> Column:
    """Interleave ``bits`` low bits of each already-bucketed
    non-negative column into one long: bit b of column j lands at
    position ``b * len(buckets) + j``. len(buckets) * bits must fit a
    long (<= 62)."""
    n = len(buckets)
    if n == 0:
        raise ValueError("need at least one bucket column")
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits overflows a long")
    key = F.lit(0).cast("long")
    for j, c in enumerate(buckets):
        lc = c.cast("long")
        for b in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(F.shiftright(lc, b).bitwiseAND(F.lit(1)), b * n + j)
            )
    return key


def zorder_layout(
    df: DataFrame, cols: list[str], bits: int = 12, files: int = 16
) -> DataFrame:
    """Return ``df`` re-arranged for a Z-ordered write: each numeric
    layout column is min/max-normalized into ``2**bits`` buckets, the
    bucket bits are Morton-interleaved, and the frame is
    range-partitioned into ``files`` partitions sorted by the key —
    write the result with ``.write.parquet`` and every file covers a
    small hyper-rectangle of the layout-column space.

    The min/max probe is one single-row aggregate collect (the numeric
    projection is aggregated, so temporal columns need no literal
    round-tripping). A constant column (min == max) buckets to 0 and
    simply drops out of the interleave."""

    def _num(col: str) -> Column:
        c = F.col(col)
        if _is_temporal(df, col):
            return c.cast("timestamp").cast("double")  # epoch seconds
        return c.cast("double")

    def _finite(col: str) -> Column:
        # NaN sorts greatest in Spark, so a single NaN row would make
        # F.max return NaN and poison the whole column's scale; probe
        # over finite values only (NaN ROWS bucket to 0 below).
        v = _num(col)
        return F.when(~F.isnan(v), v)

    stats = df.agg(
        *[F.min(_finite(c)).alias(f"mn_{c}") for c in cols],
        *[F.max(_finite(c)).alias(f"mx_{c}") for c in cols],
    ).collect()[0]

    top = float(2**bits - 1)
    buckets = []
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        if mn is None or mx is None or mx - mn <= 0:
            buckets.append(F.lit(0))
            continue
        scaled = F.floor((_num(c) - F.lit(mn)) / F.lit(mx - mn) * F.lit(top))
        # NaN rows (excluded from the probe) bucket to 0.
        scaled = F.when(F.isnan(_num(c)), F.lit(0)).otherwise(scaled)
        buckets.append(F.least(F.greatest(scaled, F.lit(0)), F.lit(int(top))))
    key = morton_key(buckets, bits)
    return (
        df.withColumn("_zkey", key)
        .repartitionByRange(files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
    )


def _is_temporal(df: DataFrame, col: str) -> bool:
    return dict(df.dtypes)[col] in ("timestamp", "timestamp_ntz", "date")
