"""JDBC sources (S3/S4/S5): incremental extraction pushed down to the
source database, plus the pre-extraction clock capture.

Reference parity (``/root/reference/gluejob.py``):
- S3 PostgreSQL reader: psycopg2 conn + per-table SQL template +
  ``fetchall`` into pandas (gluejob.py:244-252, 264-280). Here the
  same SQL (join chain + watermark predicate) is pushed down via
  ``spark.read.format('jdbc').option('query', ...)`` so the source DB
  still does the filtering/joining and only changed child rows cross
  the wire — but they land as a distributed DataFrame, not driver RAM.
- S4 SQL Server reader (gluejob.py:254-262): same reader, different
  URL/driver.
- S5 scalar clock query ``SELECT NOW()`` / ``SELECT GETDATE()``
  (gluejob.py:282-304): 1-row JDBC read captured BEFORE extraction —
  the t0 that becomes the next watermark (gluejob.py:616).

The reference interpolates the watermark into SQL f-strings
(gluejob.py:521-600) with no validation — an injection-shaped pattern.
JDBC offers no bind parameters for the ``query`` option, so the seam
here is ``validate_watermark``: the value must round-trip through
``datetime.strptime`` before it may appear in SQL text; anything else
raises. Identifiers come from the static registry, never from input.

Scale notes (100 TB source extraction): a single ``query`` pushdown
reads on one connection. For big windows, pass ``partition_column`` /
``num_partitions``: the pushdown statement is wrapped as a ``dbtable``
subquery alias and all four of partitionColumn/lowerBound/upperBound/
numPartitions are set (Spark requires the full quartet, and forbids
``partitionColumn`` with ``query``), so Spark opens num_partitions
range-bounded connections. Bounds come from the caller or a 1-row
min/max probe over the same subquery. ``fetchsize`` keeps each
connection's cursor streaming instead of buffering the result set.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import date, datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import TableSpec
from ..watermarks import WATERMARK_FORMAT

_CLOCK_SQL = {
    # Explicit aliases: Spark wraps the query option as
    # SELECT * FROM (<sql>) SPARK_GEN_SUBQ_n, and SQL Server rejects a
    # derived table with an unnamed column (error 8155); PostgreSQL's
    # NOW() gets an implicit name but gains nothing from relying on it.
    "psql": "SELECT NOW() AS now",           # gluejob.py:287-292
    "sqlserver": "SELECT GETDATE() AS now",  # gluejob.py:294-299
}


def validate_watermark(wm: str) -> str:
    """Reject anything that is not a plain ``YYYY-MM-DD HH:MM:SS``
    timestamp before it is allowed into SQL text."""
    try:
        datetime.strptime(wm, WATERMARK_FORMAT)
    except ValueError as exc:
        raise ValueError(f"invalid watermark literal: {wm!r}") from exc
    return wm


def incremental_sql(spec: TableSpec, watermark: str) -> str:
    """Build the per-table incremental statement the reference keeps as
    9 hand-written templates (gluejob.py:521-600), from registry data.

    Direct tables filter on their own ``wm_col``; chained tables join
    child→…→anchor and filter on the ANCHOR's ``wm_col`` — resolved
    from the anchor's own registry entry, the same rule the file-backed
    source applies (pipeline.py), so the two source implementations
    cannot diverge on which column governs a chained table. Physical
    source-table names come from ``spec.src_table`` (the reference's
    checkout extraction reads ``[TB_Checkout_Orders]``, not the lake
    name). Only child columns are projected (the reference's
    ``child.*``), which with PK right sides makes every join a
    semi-join in effect.
    """
    from ..registry import CATALOG

    wm = validate_watermark(watermark)
    child = spec.src_table
    if not spec.chain:
        return (
            f"SELECT {child}.* FROM {child} "
            f"WHERE {child}.{spec.wm_col} >= '{wm}'"
        )
    joins = []
    left = child
    for fk, parent, pk in spec.chain:
        parent_src = (
            CATALOG[parent].src_table if parent in CATALOG else parent
        )
        joins.append(f"JOIN {parent_src} ON {parent_src}.{pk} = {left}.{fk}")
        left = parent_src
    anchor = spec.chain[-1][1]
    anchor_spec = CATALOG.get(anchor)
    anchor_src = anchor_spec.src_table if anchor_spec else anchor
    anchor_wm = anchor_spec.wm_col if anchor_spec else spec.wm_col
    return (
        f"SELECT {child}.* FROM {child} "
        + " ".join(joins)
        + f" WHERE {anchor_src}.{anchor_wm} >= '{wm}'"
    )


@dataclass(frozen=True)
class JdbcConfig:
    """Connection facts the reference pulls from SSM/SecretsManager
    (gluejob.py:50-76, 244-262) — host/port/db/user/password — as an
    explicit config object. ``kind`` picks the clock SQL and URL shape."""

    url: str  # jdbc:postgresql://host:5432/corleone | jdbc:sqlserver://...
    user: str
    # repr=False: this object carries SecretsManager-fed credentials;
    # the generated dataclass repr would otherwise print the password
    # into any log/assertion/traceback that formats the config.
    password: str = field(repr=False)
    kind: str = "psql"  # or 'sqlserver'
    driver: str | None = None
    fetchsize: int = 10_000


def partition_options(
    sql: str,
    partition_column: str,
    lower_bound: int | str,
    upper_bound: int | str,
    num_partitions: int,
) -> dict[str, str]:
    """Option dict for a parallel range-bound JDBC read.

    Spark's JDBC source forbids ``partitionColumn`` with the ``query``
    option and requires all four of partitionColumn / lowerBound /
    upperBound / numPartitions together — so the pushdown statement is
    wrapped as a ``dbtable`` subquery alias and every bound is set.
    Bounds may be ints or pre-formatted DATE/TIMESTAMP strings (Spark
    parses temporal bounds via java.sql.Date/Timestamp.valueOf). Kept
    as a pure function so tests can assert the exact dict without a
    live database.
    """
    return {
        "dbtable": f"({sql}) AS sub",
        "partitionColumn": partition_column,
        "lowerBound": str(lower_bound),
        "upperBound": str(upper_bound),
        "numPartitions": str(num_partitions),
    }


def bounds_probe_sql(sql: str, partition_column: str) -> str:
    """1-row min/max statement used to derive the range bounds when the
    caller doesn't supply them — runs on the same pushdown subquery, so
    the bounds reflect exactly the rows the parallel read will fetch."""
    return (
        f"SELECT MIN({partition_column}) AS lo, MAX({partition_column}) AS hi "
        f"FROM ({sql}) AS sub"
    )


class JdbcSource:
    """Incremental table reader over one source database.

    Implements the pipeline's Source seam: ``read_table(spark, spec,
    watermark)`` and ``clock(spark)``.
    """

    def __init__(self, config: JdbcConfig):
        self.config = config

    def _reader(self, spark: SparkSession, options: dict[str, str]):
        r = (
            spark.read.format("jdbc")
            .option("url", self.config.url)
            .option("user", self.config.user)
            .option("password", self.config.password)
            .option("fetchsize", str(self.config.fetchsize))
        )
        if self.config.driver:
            r = r.option("driver", self.config.driver)
        return r.options(**options)

    def _probe_bounds(
        self, spark: SparkSession, sql: str, partition_column: str
    ) -> tuple[int, int] | tuple[str, str] | None:
        """Min/max probe over the pushdown subquery (one connection,
        one row).

        Integral columns get a +1 range; DATE/TIMESTAMP columns get
        string bounds in the forms Spark's JDBC source parses
        (``java.sql.Date/Timestamp.valueOf``), stepped one unit past
        the max so the last stride covers it. An empty window returns
        None — the caller falls back to the single-connection path,
        which is type-agnostic and costs nothing at zero rows."""
        probe = bounds_probe_sql(sql, partition_column)
        row = self._reader(spark, {"query": probe}).load().collect()[0]
        lo, hi = row[0], row[1]
        if lo is None:
            return None
        if isinstance(lo, bool):
            raise TypeError(
                f"partition_column {partition_column!r} is boolean — not "
                "range-partitionable"
            )
        if isinstance(lo, int):
            return (int(lo), int(hi) + 1)
        if isinstance(lo, datetime):  # before date: datetime IS a date
            return (
                lo.strftime(WATERMARK_FORMAT),
                (hi + timedelta(seconds=1)).strftime(WATERMARK_FORMAT),
            )
        if isinstance(lo, date):
            return (lo.isoformat(), (hi + timedelta(days=1)).isoformat())
        raise TypeError(
            f"partition_column {partition_column!r} probed as "
            f"{type(lo).__name__} ({lo!r}); automatic bounds probing "
            "supports integral, DATE, and TIMESTAMP columns — pass "
            "explicit bounds=(lower, upper) for other types"
        )

    def read_table(
        self,
        spark: SparkSession,
        spec: TableSpec,
        watermark: str,
        partition_column: str | None = None,
        num_partitions: int = 8,
        bounds: tuple[int, int] | tuple[str, str] | None = None,
    ) -> DataFrame | None:
        """S3/S4: changed-rows extraction with the join chain and the
        watermark predicate executed by the source DB.

        With ``partition_column`` the read is split into
        ``num_partitions`` range-bounded parallel connections (the
        100 TB extraction path); bounds come from ``bounds`` or a
        min/max probe on the same pushdown subquery (integral, DATE,
        or TIMESTAMP columns). An empty probe falls back to one
        connection.
        """
        sql = incremental_sql(spec, watermark)
        b = None
        if partition_column:
            b = bounds or self._probe_bounds(spark, sql, partition_column)
        if b is not None:
            opts = partition_options(
                sql, partition_column, b[0], b[1], num_partitions
            )
        else:
            opts = {"query": sql}
        df = self._reader(spark, opts).load()
        # Post-JDBC projection to the registry schema, by NAME
        # (gluejob.py:273,280) — extra source columns dropped. Matched
        # case-insensitively: databases fold unquoted identifiers
        # (PostgreSQL → lower, Derby/Oracle → UPPER), so the result-set
        # casing need not equal the registry's. A registry column absent
        # from the result set raises — same contract as the CSV/JSON
        # readers (files.py) — instead of silently narrowing the lake
        # schema.
        by_fold = {c.lower(): c for c in df.columns}
        missing = [c for c in spec.columns if c.lower() not in by_fold]
        if missing:
            raise ValueError(
                f"JDBC result for {spec.name} is missing schema columns "
                f"{missing} (result set: {sorted(df.columns)})"
            )
        # Cast to the registry lake schema (all string — the
        # reference's all-string[python] convention the CSV/JSON
        # readers already enforce). Without it a JDBC batch carries
        # native DB types into the merge, where unionByName coerces
        # the string lake side to the batch's type and rewrites
        # touched partitions with e.g. bigint ids beside untouched
        # string-id files — an unreadable mixed-schema table
        # (r13 sources review, finding #1).
        schema_types = {f.name: f.dataType for f in spec.spark_schema}
        return df.select(
            *[
                F.col(by_fold[c.lower()]).cast(schema_types[c]).alias(c)
                for c in spec.columns
            ]
        )

    def clock(self, spark: SparkSession) -> str:
        """S5: source-DB clock, captured before extraction
        (gluejob.py:282-304, 616)."""
        sql = _CLOCK_SQL[self.config.kind]
        row = self._reader(spark, {"query": sql}).load().collect()[0]
        return row[0].strftime(WATERMARK_FORMAT)
