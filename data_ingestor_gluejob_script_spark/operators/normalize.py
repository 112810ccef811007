"""Scalar normalization operators (O1, O8).

O1 — the reference's only UDF-shaped function: boolean→canonical-string
mapping with passthrough for unmapped values (gluejob.py:16-28),
applied cell-by-cell via ``Series.apply`` (:44-48). Spark-first this is
NOT a UDF: a CASE expression stays inside whole-stage codegen and costs
nothing extra at 100 TB.

O8 — lake coercion: every column cast to string
(``.convert_dtypes().astype(schema)``, gluejob.py:236,278).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# gluejob.py:16-28 — truthy/falsy source spellings → canonical strings.
BOOLEAN_CANON: dict[str, str] = {
    "False": "false",
    "True": "true",
    "false": "false",
    "true": "true",
    "f": "false",
    "t": "true",
}


def dict_map(col: Column, mapping: Mapping[str, str]) -> Column:
    """O1 as a pure Catalyst expression: chained CASE WHEN with
    unmapped-value passthrough (gluejob.py:16-28)."""
    expr = None
    for k, v in mapping.items():
        cond = col == F.lit(k)
        expr = F.when(cond, F.lit(v)) if expr is None else expr.when(cond, F.lit(v))
    return expr.otherwise(col) if expr is not None else col


def normalize_booleans(df: DataFrame, boolean_cols: tuple[str, ...]) -> DataFrame:
    """Apply O1 to a table's configured boolean columns
    (gluejob.py:30-48). Columns are assumed already string-typed (lake
    convention); true Python bools only exist pre-ingest."""
    for c in boolean_cols:
        df = df.withColumn(c, dict_map(F.col(c), BOOLEAN_CANON))
    return df


def cast_all_string(df: DataFrame) -> DataFrame:
    """O8: coerce every column to string (gluejob.py:236,278)."""
    return df.select(*[F.col(c).cast("string").alias(c) for c in df.columns])
