"""Upsert / keyed-dedup-with-precedence (O6+O7) — the one operator
where naive translation silently corrupts data.

Reference semantics (gluejob.py:196-198): ``concat([incoming,
existing])`` then ``drop_duplicates(subset=[id], keep='first')`` —
order-dependent: incoming rows beat existing rows on PK collision.
Spark's union has NO row order and bare ``dropDuplicates([id])`` picks
a nondeterministic winner, so precedence must be explicit: tag each
side with a precedence rank, take ``row_number() == 1`` per key
ordered by that rank.

Scale notes (100 TB): the window shuffles once on the id column —
same cost as any keyed dedup. Hot keys are handled by AQE skew
splitting; for pathological skew pre-salt the window key. The
partition-scoped variant in pipeline.py only touches (year,month)
partitions present in the incoming batch, so a daily increment never
rewrites the whole lake.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PRECEDENCE_COL = "_src_precedence"


def union_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """O6 (gluejob.py:197) — by-name union, no dedup. Order is NOT
    significant in Spark; when precedence matters use upsert_dedup."""
    return a.unionByName(b)


def upsert_dedup(
    incoming: DataFrame,
    existing: DataFrame | None,
    id_cols: list[str] | str,
) -> DataFrame:
    """O6+O7: union with explicit precedence, keep exactly one row per
    key, incoming wins (gluejob.py:196-198).

    Deterministic replacement for the reference's order-dependent
    ``keep='first'``. Ties *within* a side are broken by a stable
    ordering over all non-key columns so the result is reproducible
    run-to-run (the reference inherits whatever order the source
    emitted; any single row per key is semantics-preserving, but
    determinism is required for the differential oracle).
    """
    if isinstance(id_cols, str):
        id_cols = [id_cols]
    tagged = incoming.withColumn(PRECEDENCE_COL, F.lit(0))
    if existing is not None:
        tagged = tagged.unionByName(existing.withColumn(PRECEDENCE_COL, F.lit(1)))
    value_cols = [c for c in incoming.columns if c not in id_cols]
    w = Window.partitionBy(*id_cols).orderBy(
        F.col(PRECEDENCE_COL), *[F.col(c).asc_nulls_last() for c in value_cols]
    )
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", PRECEDENCE_COL)
    )
