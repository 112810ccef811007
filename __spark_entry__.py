"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The implementations live in ``data_ingestor_gluejob_script_spark``
(operators, sources, queries with oracle twins); this module only
re-exports the package's declared inventory.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_ingestor_gluejob_script_spark.queries import ORACLES, QUERIES

SMOKE_SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the 3-hop join chain — the deepest
    lineage in the reference (gluejob.py:569-579). Driver checks rows>0."""
    return QUERIES["q_join_3hop"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.3."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twin for every query (full coverage — no
    rows-only fallbacks in the declared set)."""
    return dict(ORACLES)
