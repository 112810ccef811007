"""Live JDBC integration: the real Spark JDBC read path (whole-statement
pushdown, four-option parallel range read, min/max bounds probe) against
an embedded Apache Derby database — the jars Spark already ships for its
Hive metastore. SQL-string unit tests (test_sources.py) prove what we
*send*; this proves Spark's JDBC source accepts it and returns the right
rows over a real connection (the class of bug that shipped in the
pre-round-4 parallel-read path: partitionColumn stacked on `query`
without bounds, which only a live load() can catch)."""

from __future__ import annotations

import pytest

from data_ingestor_gluejob_script_spark.registry import TableSpec, spec
from data_ingestor_gluejob_script_spark.sources.jdbc import (
    JdbcConfig,
    JdbcSource,
)

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

# The Derby fixture table carries a 4-column subset of the registry
# schema; reads use this narrowed spec (same table name → same pushdown
# SQL). The FULL registry spec is used by the missing-column raise test.
NARROW_SPEC = TableSpec(
    "retail_subscriptions",
    ("id", "status", "created_at", "updated_at", "start_date", "sync_ts"),
)


@pytest.fixture(scope="module")
def derby(spark, tmp_path_factory):
    """Embedded Derby DB seeded with a retail_subscriptions subset:
    40 rows, ids 1..40, half before / half after the test watermark.
    Created through the driver JVM so no extra dependency is needed."""
    db_path = str(tmp_path_factory.mktemp("derby") / "testdb")
    url = f"jdbc:derby:{db_path}"
    jvm = spark._jvm
    # Redirect Derby's diagnostic log into the test tmpdir BEFORE the
    # engine boots — by default it drops a derby.log in the process
    # cwd (the repo root), which pollutes the working tree.
    jvm.java.lang.System.setProperty(
        "derby.stream.error.file",
        str(tmp_path_factory.mktemp("derby-log") / "derby.log"),
    )
    jvm.java.lang.Class.forName(DERBY_DRIVER)
    conn = jvm.java.sql.DriverManager.getConnection(f"{url};create=true")
    st = conn.createStatement()
    # Only a subset of the registry columns — reads in this module use
    # NARROW_SPEC; the full registry spec triggers the missing-column
    # contract (see test_missing_registry_column_raises).
    st.executeUpdate(
        "CREATE TABLE retail_subscriptions ("
        "id INT PRIMARY KEY, status VARCHAR(20), "
        "created_at VARCHAR(30), updated_at VARCHAR(30), "
        "start_date DATE, sync_ts TIMESTAMP)"
    )
    ps = conn.prepareStatement(
        "INSERT INTO retail_subscriptions VALUES (?, ?, ?, ?, ?, ?)"
    )
    for i in range(1, 41):
        day = 10 if i <= 20 else 20  # watermark splits at day 15
        ps.setInt(1, i)
        ps.setString(2, "active" if i % 3 else "cancelled")
        ps.setString(3, f"2024-01-{day:02d} 08:00:00")
        ps.setString(4, f"2024-01-{day:02d} 10:{i:02d}:00")
        ps.setDate(5, jvm.java.sql.Date.valueOf(f"2024-01-{day:02d}"))
        ps.setTimestamp(
            6, jvm.java.sql.Timestamp.valueOf(f"2024-01-{day:02d} 10:{i:02d}:00")
        )
        ps.executeUpdate()
    ps.close()
    st.close()
    conn.close()
    return url


@pytest.fixture()
def source(derby):
    return JdbcSource(
        JdbcConfig(url=derby, user="app", password="app", driver=DERBY_DRIVER)
    )


WM = "2024-01-15 00:00:00"


def test_single_connection_pushdown_read(spark, source):
    df = source.read_table(spark, NARROW_SPEC, WM)
    # Whole-statement pushdown: only the 20 post-watermark rows arrive.
    assert df.count() == 20
    assert set(df.columns) == set(NARROW_SPEC.columns)
    assert {r.updated_at[:10] for r in df.collect()} == {"2024-01-20"}


def test_parallel_read_with_explicit_bounds(spark, source):
    df = source.read_table(
        spark,
        NARROW_SPEC,
        WM,
        partition_column="id",
        num_partitions=4,
        bounds=(1, 41),
    )
    # Four range-bounded connections, same result set.
    assert df.rdd.getNumPartitions() == 4
    assert sorted(int(r.id) for r in df.collect()) == list(range(21, 41))


def test_parallel_read_probes_bounds_when_absent(spark, source):
    df = source.read_table(
        spark,
        NARROW_SPEC,
        WM,
        partition_column="id",
        num_partitions=3,
    )
    assert df.rdd.getNumPartitions() == 3
    assert sorted(int(r.id) for r in df.collect()) == list(range(21, 41))


def test_parallel_read_empty_window(spark, source):
    """A watermark beyond every row: the bounds probe sees NULL min/max
    and must still produce a loadable (empty) parallel read."""
    df = source.read_table(
        spark,
        NARROW_SPEC,
        "2030-01-01 00:00:00",
        partition_column="id",
        num_partitions=3,
    )
    assert df.count() == 0


def test_missing_registry_column_raises(spark, source):
    """Same contract as the CSV/JSON readers: a registry column absent
    from the JDBC result set raises instead of silently narrowing the
    lake schema (the full retail_subscriptions spec has 20 columns,
    the fixture table 4)."""
    with pytest.raises(ValueError, match="missing schema columns"):
        source.read_table(spark, spec("retail_subscriptions"), WM)


def test_non_integral_partition_column_raises(spark, source):
    """Automatic bounds probing is integral-only: a VARCHAR partition
    column must fail with the column named and a pointer to explicit
    bounds, not an opaque int() cast traceback."""
    with pytest.raises(TypeError, match="updated_at"):
        source.read_table(
            spark,
            NARROW_SPEC,
            WM,
            partition_column="updated_at",
            num_partitions=2,
        )


def test_parallel_read_probes_timestamp_bounds(spark, source):
    """Temporal partition columns, probed live: the min/max TIMESTAMP
    probe produces string bounds Spark's JDBC source parses, and the
    range-bounded connections return exactly the pushdown's rows."""
    df = source.read_table(
        spark,
        NARROW_SPEC,
        WM,
        partition_column="sync_ts",
        num_partitions=3,
    )
    assert df.rdd.getNumPartitions() == 3
    assert sorted(int(r.id) for r in df.collect()) == list(range(21, 41))


def test_parallel_read_probes_date_bounds(spark, source):
    """DATE columns probe too — even a degenerate one-day range (every
    qualifying row shares start_date) must stay correct, just skewed."""
    df = source.read_table(
        spark,
        NARROW_SPEC,
        WM,
        partition_column="start_date",
        num_partitions=2,
    )
    assert sorted(int(r.id) for r in df.collect()) == list(range(21, 41))


def test_jdbc_read_lands_as_lake_string_schema(spark, source):
    """r13 sources review: the JDBC reader must cast to the registry's
    all-string lake schema like the CSV/JSON readers do — native DB
    types (int id, TIMESTAMP sync_ts) entering the merge would coerce
    the string lake side under unionByName and strand mixed-type
    parquet partitions."""
    df = source.read_table(spark, NARROW_SPEC, WM)
    assert [f.dataType.simpleString() for f in df.schema.fields] == (
        ["string"] * len(NARROW_SPEC.columns)
    )
    row = df.filter(df.id == "21").collect()[0]
    assert row.id == "21" and row.sync_ts.startswith("2024-01-20 10:21")
