"""Single-pass column profiling + IQR outlier flagging — the
data-quality triage pass a lake ingest runs before trusting a new
feed, beside the rule-based checks in queries/audit.py (which
validate EXPECTED properties; the profiler tells you what a table
you don't know yet actually looks like).

Reference parity note: the reference job (gluejob.py) ingests
blindly — no profiling exists there; this extends the engine's
quality surface the same way audit.py does (cited there:
gluejob.py's lack of any row validation).

Plan shape: ``profile_frame`` computes EVERY column's statistics in
ONE aggregation pass — 10 expressions per column in a single agg()
(map-side partial, one 1-row result), then the 1-row frame is
melted column-per-row with ``stack``. No per-column jobs, no second
scan, no driver loop over data: profiling an n-column 100-TB table
costs exactly one full scan regardless of n. min/max are carried as
strings so one output schema covers numeric, string and temporal
columns alike; mean/stddev/quantiles are NULL for non-numeric
columns.

Approximate fields and their contracts:
- ``n_distinct`` uses HyperLogLog++ (``approx_count_distinct``,
  default 5% rsd) — mergeable, constant memory, the only sane
  distinct count at scale.
- quantiles use ``percentile_approx`` with accuracy 10000, which is
  EXACT whenever a column has fewer than ~10k distinct values in a
  partition-merge path and within 1/accuracy rank error otherwise
  (Greenwald-Khanna bound) — the differential tests pin exactness
  on small data and rank-error bounds on larger.

``iqr_outliers`` flags rows outside [q1 - k*IQR, q3 + k*IQR] (Tukey
fences, k=1.5 default): one quantile pass collapsed to a 1-row
broadcast frame, then a map-side flag join — the corpus never
shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {
    "tinyint", "smallint", "int", "integer", "bigint", "long",
    "float", "double",
}
PROFILE_ACCURACY = 10_000


def _is_numeric(dtype: str) -> bool:
    return dtype in _NUMERIC or dtype.startswith("decimal")


def profile_frame(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """(column, dtype, n_rows, n_nulls, n_distinct, min, max, mean,
    stddev, p25, p50, p75) — one row per profiled column, one scan
    total. Complex-typed columns (array/map/struct/binary) profile
    count/nulls/distinct only (min/max need an ordering)."""
    dtypes = dict(df.dtypes)
    names = cols if cols is not None else list(df.columns)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in names:
        dt = dtypes[c]
        col = F.col(c)
        simple = not (
            dt.startswith(("array", "map", "struct", "binary"))
        )
        aggs += [
            F.count(F.when(col.isNull(), 1)).alias(f"{c}__nulls"),
            F.approx_count_distinct(c).alias(f"{c}__distinct"),
            (F.min(col) if simple else F.lit(None))
            .cast("string")
            .alias(f"{c}__min"),
            (F.max(col) if simple else F.lit(None))
            .cast("string")
            .alias(f"{c}__max"),
        ]
        if _is_numeric(dt):
            d = col.cast("double")
            aggs += [
                F.avg(d).alias(f"{c}__mean"),
                F.stddev_samp(d).alias(f"{c}__stddev"),
                # cast normalizes element nullability so stack() sees
                # one array type across numeric and non-numeric arms
                F.percentile_approx(d, [0.25, 0.5, 0.75], PROFILE_ACCURACY)
                .cast("array<double>")
                .alias(f"{c}__q"),
            ]
        else:
            aggs += [
                F.lit(None).cast("double").alias(f"{c}__mean"),
                F.lit(None).cast("double").alias(f"{c}__stddev"),
                F.lit(None).cast("array<double>").alias(f"{c}__q"),
            ]
    one = df.agg(*aggs)
    stack_args = []
    for c in names:
        stack_args += [
            F.lit(c),
            F.lit(dtypes[c]),
            F.col(f"{c}__nulls"),
            F.col(f"{c}__distinct"),
            F.col(f"{c}__min"),
            F.col(f"{c}__max"),
            F.col(f"{c}__mean"),
            F.col(f"{c}__stddev"),
            F.col(f"{c}__q"),
        ]
    melted = one.select(
        F.col("_n").alias("n_rows"),
        F.stack(F.lit(len(names)), *stack_args).alias(
            "column", "dtype", "n_nulls", "n_distinct", "min", "max",
            "mean", "stddev", "_q",
        ),
    )
    return melted.select(
        "column",
        "dtype",
        "n_rows",
        "n_nulls",
        "n_distinct",
        "min",
        "max",
        "mean",
        "stddev",
        F.col("_q")[0].alias("p25"),
        F.col("_q")[1].alias("p50"),
        F.col("_q")[2].alias("p75"),
    )


def iqr_outliers(
    df: DataFrame, col: str, k: float = 1.5
) -> DataFrame:
    """Input rows + ``is_outlier`` flag + the fences: Tukey's rule on
    the approximate quartiles. The fence frame is 1 row, broadcast —
    flagging is a map; NULL values are never outliers (unknown, not
    extreme)."""
    d = F.col(col).cast("double")
    fences = df.agg(
        F.percentile_approx(d, [0.25, 0.75], PROFILE_ACCURACY).alias("_q")
    ).select(
        (F.col("_q")[0] - k * (F.col("_q")[1] - F.col("_q")[0]))
        .alias("fence_lo"),
        (F.col("_q")[1] + k * (F.col("_q")[1] - F.col("_q")[0]))
        .alias("fence_hi"),
    )
    return df.crossJoin(F.broadcast(fences)).withColumn(
        "is_outlier",
        F.when(d.isNull(), F.lit(False)).otherwise(
            (d < F.col("fence_lo")) | (d > F.col("fence_hi"))
        ),
    )
