"""File sources (S1/S2): CSV and parquet scans.

Reference parity:
- S1 CSV scan (gluejob.py:226-242): per-table separator, schema-driven
  column pruning (``usecols``), all-string coercion, missing file →
  ``None`` + continue. Here: an explicit string schema on
  ``spark.read.csv`` gives Catalyst the projection for free, and the
  missing-source contract surfaces as ``None`` (caller skips, matching
  gluejob.py:167-169).
- S2 parquet read-back of one lake partition (gluejob.py:207-224):
  ``NoSuchKey`` → ``None`` ("create empty").

At scale both readers are plain distributed scans — no driver-side
materialization anywhere.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.utils import AnalysisException

from ..registry import TableSpec


def read_csv_table(spark: SparkSession, path: str, spec: TableSpec) -> DataFrame | None:
    """S1: schema-pruned, string-typed CSV scan (gluejob.py:226-242).

    Extra source columns are dropped by the final select; a missing
    file returns None so the caller can log-and-continue.
    """
    try:
        df = (
            spark.read.options(sep=spec.csv_sep, header=True)
            .schema(spec.spark_schema)
            .csv(path)
        )
        df.schema  # force resolution so a missing path fails here
    except AnalysisException:
        return None
    return df.select(*spec.columns)


def read_parquet_table(spark: SparkSession, path: str) -> DataFrame | None:
    """S2: read an existing lake partition; absent → None
    (gluejob.py:207-224)."""
    try:
        df = spark.read.parquet(path)
        df.schema
    except AnalysisException:
        return None
    return df


def read_testdata(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Load one driver-provided testdata table (TESTDATA.md)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))
