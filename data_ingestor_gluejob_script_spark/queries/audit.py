"""Declarative data-quality audit — the validation gate an ingestion
engine runs before publishing a batch (reference parity note: the
reference job has no validation at all, it writes whatever the scan
returned; this is north-star extension surface, same family as the
watermark/idempotence guarantees in pipeline.py).

Spark-first design: every ROW-LEVEL check (not-null, range, accepted
values, regex, uniqueness) compiles to one conditional aggregate, and
the whole check list evaluates in a SINGLE SCAN of the table —
``df.agg(sum(when(violated,1)), ...)`` — then the one wide row is
unpivoted to (check, violations, checked, passed) with ``stack``.
Adding a check adds an expression, never a pass. Map-side partial
aggregation collapses each partition to one row before the single
1-row exchange, so audit cost is one read of the data regardless of
how many checks run — the property that matters at 100 TB, where a
per-check pass would multiply scan cost by the size of the checklist.

Uniqueness rides the same pass as ``count(col) - count_distinct(col)``
(exact distinct adds Spark's expand + one keyed shuffle of the key
column only — documented cost, still no second table scan).

REFERENTIAL integrity can't be a conditional aggregate over one table;
``referential_check`` counts orphans with a left-anti join projected
to the key columns (broadcast when the parent's key set is
dimension-sized) and returns the same report schema, so
``audit_report`` can union both shapes into one verdict frame.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One named data-quality rule. ``violated`` is a boolean Column
    that is true on each BAD row; ``scope`` optionally restricts
    ``checked`` to the rows the rule actually examined (e.g. non-null
    values for uniqueness)."""

    name: str
    violated: Column
    scope: Column | None = None


def not_null(col: str) -> Check:
    return Check(f"not_null:{col}", F.col(col).isNull())


def in_range(col: str, lo: float, hi: float) -> Check:
    """Null passes (pair with not_null to also forbid nulls) — the
    conventional SQL CHECK-constraint semantics."""
    c = F.col(col)
    return Check(
        f"range:{col}", c.isNotNull() & ~c.between(F.lit(lo), F.lit(hi))
    )


def accepted_values(col: str, values: Sequence[str]) -> Check:
    c = F.col(col)
    return Check(
        f"accepted:{col}", c.isNotNull() & ~c.isin(list(values))
    )


def matches_regex(col: str, pattern: str) -> Check:
    c = F.col(col)
    return Check(
        f"regex:{col}", c.isNotNull() & ~c.rlike(pattern)
    )


def unique_key(col: str) -> Check:
    """Marker instance — uniqueness is aggregated, not row-local, so
    ``audit_checks`` special-cases it into count - count_distinct on
    the same scan."""
    return Check(f"unique:{col}", F.lit(None), scope=F.col(col).isNotNull())


def audit_checks(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Evaluate all ``checks`` over ``df`` in one aggregation pass.
    Returns (check, violations, checked, passed), one row per check,
    ordered by check name for cross-engine determinism."""
    if not checks:
        raise ValueError("audit_checks requires at least one check")
    aggs: list[Column] = []
    for i, ck in enumerate(checks):
        if ck.name.startswith("unique:"):
            col = ck.name.split(":", 1)[1]
            aggs.append(
                (F.count(F.col(col)) - F.count_distinct(F.col(col)))
                .cast("long")
                .alias(f"__v{i}")
            )
            aggs.append(F.count(F.col(col)).cast("long").alias(f"__s{i}"))
        else:
            # count(when(...)), not sum(when(...)): sum over ZERO
            # rows is SQL NULL, which would surface as passed=NULL on
            # an empty batch — count is 0 there, so an empty input
            # audits as all-pass with zero violations
            aggs.append(
                F.count(F.when(ck.violated, 1)).cast("long").alias(f"__v{i}")
            )
            scope = (
                F.count(F.when(ck.scope, 1)).cast("long")
                if ck.scope is not None
                else F.count(F.lit(1)).cast("long")
            )
            aggs.append(scope.alias(f"__s{i}"))
    wide = df.agg(*aggs)
    # stack(n, name1, v1, s1, ...) unpivots the one wide row into one
    # row per check — driver-side string assembly of the expression,
    # executor-side it is a generate over a single row.
    parts = []
    for i, ck in enumerate(checks):
        name_lit = ck.name.replace("'", "")
        parts.append(f"'{name_lit}', __v{i}, __s{i}")
    stacked = wide.selectExpr(
        f"stack({len(checks)}, {', '.join(parts)}) as "
        "(check, violations, checked)"
    )
    return stacked.select(
        "check",
        "violations",
        "checked",
        (F.col("violations") == 0).alias("passed"),
    ).orderBy("check")


def referential_check(
    child: DataFrame,
    col: str,
    parent: DataFrame,
    parent_col: str,
    broadcast_parent: bool = True,
) -> DataFrame:
    """Orphan count: child rows whose non-null ``col`` has no match in
    ``parent.parent_col``. Same report schema as ``audit_checks``.

    Scale shape: both sides project to the key column before the join;
    the parent key set broadcasts when dimension-sized (the common
    fk→dim case), else it falls back to a shuffled left-anti on the
    key column only — the fact table's payload never moves."""
    keys = parent.select(F.col(parent_col).alias(col)).distinct()
    if broadcast_parent:
        keys = F.broadcast(keys)
    non_null = child.filter(F.col(col).isNotNull()).select(col)
    orphans = non_null.join(keys, col, "left_anti")
    return (
        orphans.agg(F.count(F.lit(1)).cast("long").alias("violations"))
        .crossJoin(
            non_null.agg(F.count(F.lit(1)).cast("long").alias("checked"))
        )
        .select(
            F.lit(f"ref:{col}").alias("check"),
            "violations",
            "checked",
            (F.col("violations") == 0).alias("passed"),
        )
    )


def flag_violations(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Row-level quarantine flagging: adds ``_violations`` — the array
    of check names each row fails (empty = clean). Only ROW-LOCAL
    checks apply; aggregated rules (unique:*) raise, because a row
    can't know about its duplicates without a shuffle — dedup belongs
    to the upsert/dedup operators, not the quarantine gate.

    Pure map (one projection, no shuffle): the ingestion path can
    split a 100 TB batch into lake + quarantine in the same scan that
    wrote it."""
    agg_only = [c.name for c in checks if c.name.startswith("unique:")]
    if agg_only:
        raise ValueError(
            f"aggregated checks are not row-local: {agg_only}"
        )
    arr = F.array_compact(
        F.array(
            *[
                F.when(ck.violated, F.lit(ck.name))
                for ck in checks
            ]
        )
    )
    return df.withColumn("_violations", arr)


def split_quarantine(
    df: DataFrame, checks: Sequence[Check]
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined): every input row lands in exactly one side;
    quarantined rows keep their ``_violations`` diagnosis, clean rows
    come back unchanged. Both sides derive from one flagged frame —
    persist it if materializing both at scale, so the scan runs once."""
    flagged = flag_violations(df, checks)
    clean = flagged.filter(F.size("_violations") == 0).drop("_violations")
    bad = flagged.filter(F.size("_violations") > 0)
    return clean, bad


def audit_report(
    df: DataFrame,
    checks: Sequence[Check],
    referential: Sequence[DataFrame] = (),
) -> DataFrame:
    """One verdict frame: the single-scan row-level audit unioned with
    any referential check frames, ordered by check name."""
    out = audit_checks(df, checks)
    for r in referential:
        out = out.unionByName(r)
    return out.orderBy("check")
