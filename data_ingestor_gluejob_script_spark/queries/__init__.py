"""Declared query inventory (SURVEY.md §2.3) — the driver contract.

``QUERIES`` maps name → callable(spark, sf_dir) → DataFrame (the Spark
implementation); ``ORACLES`` maps name → equivalent ANSI SQL that DuckDB
runs on the same parquet tables. Names absent from ``ORACLES`` get the
driver's weaker rows-only check (reserved for genuinely
non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import analytics, asof, core, multimodal, similarity, textops, traindata, windows

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

for mod in (core, analytics, textops, similarity, multimodal, asof, windows, traindata):
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)
