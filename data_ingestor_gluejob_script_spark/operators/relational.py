"""Relational core: projection (P1), temporal watermark filter (F1),
and the FK→PK join chains (J1-J3).

The reference pushes these into source-database SQL templates
(gluejob.py:521-600). Spark-first, they are declarative DataFrame ops:
Catalyst pushes the ``>=`` predicate and the column pruning into the
scan (parquet or JDBC), auto-broadcasts small filtered dimensions, and
AQE re-plans join strategy at runtime — so the same code covers both
"pushdown to the source" and "join in the engine" without hand-written
SQL strings (also eliminating the reference's injection-shaped
f-string interpolation, gluejob.py:526-600).

Scale notes (100 TB): J1's LEFT SEMI avoids materializing join fan-out
when only existence matters; for chains, filter the anchor FIRST so
the broadcast candidate is the post-filter dimension, not the raw
table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def project(df: DataFrame, columns: list[str]) -> DataFrame:
    """P1 (gluejob.py:234-236,273,280). Catalyst prunes to the scan."""
    return df.select(*columns)


def watermark_filter(df: DataFrame, ts_col: str, watermark: str) -> Column | DataFrame:
    """F1: ``ts >= watermark`` (gluejob.py:541 et al.). ``>=`` not ``>``
    — boundary rows re-extract and the upsert dedups (at-least-once)."""
    return df.filter(F.col(ts_col) >= F.lit(watermark))


def semi_join(child: DataFrame, anchor: DataFrame, fk: str, pk: str) -> DataFrame:
    """J1: ``child.* JOIN anchor ON anchor.pk = child.fk`` with only
    child columns projected (gluejob.py:548-556). Since the right key
    is a PK there is no fan-out, so this is exactly LEFT SEMI — which
    Spark executes without carrying right-side columns through the
    shuffle."""
    return child.join(anchor, child[fk] == anchor[pk], "left_semi")


def join_chain(base: DataFrame, hops: list[tuple[DataFrame, str, str]]) -> DataFrame:
    """J2/J3: chained inner equi-joins, projecting base.* at the end
    (gluejob.py:558-600). ``hops`` = [(dim_df, base_side_fk, dim_pk)];
    each hop's base_side_fk may live on the previous hop's dim.
    Catalyst/AQE pick broadcast for small (filtered) dims."""
    out = base
    base_cols = base.columns
    for dim, fk, pk in hops:
        out = out.join(dim, out[fk] == dim[pk], "inner")
    return out.select(*[base[c] for c in base_cols])
