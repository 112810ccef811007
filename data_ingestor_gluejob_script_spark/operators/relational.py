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

from pyspark.sql import Column, DataFrame, Window
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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
) -> DataFrame:
    """As-of join: for each left row, the single right row with the
    greatest ``right_ts`` ≤ ``left_ts`` within the same ``on`` key
    (inclusive boundary), or NULLs when no right row precedes it.

    Spark has no ASOF JOIN operator; the naive range-join formulation
    (join on key + inequality, then pick max per left row) explodes to
    O(|left| × |right-per-key|) intermediate rows. This is the
    union + carry-forward shape instead: tag both sides, sort each key
    group by (ts, side) with right rows first at equal timestamps, and
    carry the last-seen right ROW forward with
    ``last(..., ignorenulls)`` over rows UNBOUNDED PRECEDING..CURRENT.
    One shuffle on the key, linear in |left|+|right| — survives 100 TB
    where the range join does not.

    The right row's values travel as ONE struct, not per-column
    carries: ``ignorenulls`` must skip the left rows' placeholder
    NULLs, and with independent per-column carries it would also skip
    a GENUINE NULL inside a right row, splicing that column from an
    older right row into the result — a chimera row that never
    existed. The struct is NULL only for placeholders, so genuine
    NULL fields inside a carried right row survive intact (pinned in
    tests/test_asof.py).

    ``right`` must be unique per (on, right_ts); pre-aggregate
    otherwise (ties would be winner-nondeterministic).
    """
    from pyspark.sql import types as T

    rcols = [c for c in right.columns if c not in (on, right_ts)]
    overlap = set(left.columns) & {right_ts, *rcols}
    if overlap:
        raise ValueError(
            f"asof_join output would duplicate columns {sorted(overlap)}; "
            "rename the right side first"
        )
    r_struct_type = T.StructType(
        [T.StructField(right_ts, right.schema[right_ts].dataType)]
        + [T.StructField(c, right.schema[c].dataType) for c in rcols]
    )
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(right_ts).alias(right_ts),
            *[F.col(c).alias(c) for c in rcols],
        ).alias("_r"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
            for c in left.columns
        ],
    )
    l = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_struct_type).alias("_r"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    w = (
        Window.partitionBy(on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_c")
    )
    return carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        *[F.col("_c")[c].alias(c) for c in [right_ts, *rcols]],
    )


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
