"""Table registry: the per-table facts the reference scatters through
hardcoded ternaries and schema functions, held as data.

Reference parity (``/root/reference/gluejob.py``):
- column catalogs, all-string lake typing: gluejob.py:344-519
- id column (``ID_Order`` for checkout_orders else ``id``): gluejob.py:191
- event-time/partition column (``DT_CreatedAt`` else ``created_at``):
  gluejob.py:174
- CSV separator (``,`` for checkout_orders else ``;``): gluejob.py:235
- source database (``checkout`` else ``corleone``): gluejob.py:227,267
- boolean-normalized columns: gluejob.py:30-42
- active table set (checkout_orders disabled): gluejob.py:306-317
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T


@dataclass(frozen=True)
class TableSpec:
    name: str
    columns: tuple[str, ...]
    id_col: str = "id"
    ts_col: str = "created_at"
    csv_sep: str = ";"
    source_db: str = "corleone"  # postgres; 'checkout' = sqlserver
    boolean_cols: tuple[str, ...] = ()
    active: bool = True
    #: Incremental watermark column. Direct tables filter on their own
    #: wm_col; chained tables filter on the chain anchor's wm_col
    #: (always retail_subscriptions.updated_at in the reference,
    #: gluejob.py:521-600).
    wm_col: str = "updated_at"
    #: FK→PK hop chain to the watermark anchor, child-outward:
    #: ((child_fk, parent_table, parent_pk), ...). Empty = direct
    #: table (filter on own wm_col). Mirrors the reference's 9 JOIN
    #: templates (gluejob.py:521-600) as data instead of SQL strings.
    chain: tuple[tuple[str, str, str], ...] = ()
    #: Physical table name in the source database when it differs from
    #: the lake name (``name``). The reference's checkout extraction
    #: queries ``[TB_Checkout_Orders]`` (gluejob.py:525) but lands in
    #: lake table ``checkout_orders``; PostgreSQL tables share their
    #: lake name.
    source_table: str | None = None

    @property
    def src_table(self) -> str:
        """Name to use in source-DB SQL (FROM/JOIN clauses)."""
        return self.source_table or self.name

    @property
    def spark_schema(self) -> T.StructType:
        """Lake schema: every column string, mirroring the reference's
        all-``string[python]`` convention (gluejob.py:359-519)."""
        return T.StructType(
            [T.StructField(c, T.StringType(), True) for c in self.columns]
        )


_SPECS: tuple[TableSpec, ...] = (
    TableSpec(
        "retail_orders",
        (
            "id", "customer_id", "agreement", "status", "checkout_order_id",
            "charge_id", "number", "checkout_order_xml", "created_at",
            "updated_at", "generic_attributes", "antifraud_id",
        ),
    ),
    TableSpec(
        "retail_subscriptions",
        (
            "id", "status", "number", "checkout_order_id", "priced_at",
            "feature", "periodicity", "price_list_id", "retail_order_id",
            "created_at", "updated_at", "period", "billing_started_at",
            "closing_days", "issue_company", "billing_info_id",
            "billing_date", "customer_id", "readjustment_index_type",
            "readjustment_index_date",
        ),
    ),
    TableSpec(
        "retail_plans",
        (
            "id", "plan_version_id", "status", "retail_subscription_id",
            "created_at", "updated_at", "discount", "price_list_id",
            "readjustment_at", "priced_at",
        ),
        chain=(("retail_subscription_id", "retail_subscriptions", "id"),),
    ),
    TableSpec(
        "retail_items",
        (
            "id", "number", "parent", "quantity", "service_id", "discount",
            "retail_plan_id", "created_at", "updated_at", "prefix",
            "service_key", "price_list_id", "readjustment_at", "priced_at",
        ),
        chain=(
            ("retail_plan_id", "retail_plans", "id"),
            ("retail_subscription_id", "retail_subscriptions", "id"),
        ),
    ),
    TableSpec(
        "retail_provisionings",
        (
            "id", "parent", "status_code", "retail_item_id", "installed_at",
            "deactivated_at", "reactivated_at", "cancelled_at", "created_at",
            "updated_at", "status",
        ),
        chain=(
            ("retail_item_id", "retail_items", "id"),
            ("retail_plan_id", "retail_plans", "id"),
            ("retail_subscription_id", "retail_subscriptions", "id"),
        ),
    ),
    TableSpec(
        "retail_order_migrations",
        (
            "id", "retail_subscription_id", "new_retail_subscription_id",
            "customer_id", "prefix", "published_at", "status", "created_at",
            "updated_at", "external_id", "pre_paid", "main",
        ),
        boolean_cols=("pre_paid", "main"),
        chain=(("retail_subscription_id", "retail_subscriptions", "id"),),
    ),
    TableSpec(
        "retail_migrations",
        (
            "id", "retail_order_migration_id", "retail_item_id",
            "retail_provisioning_id", "service_key", "quantity", "number",
            "parent", "status", "type", "created_at", "updated_at",
            "retail_migration_id", "provisioning_status",
            "parent_provisioning_id", "old_quantity",
        ),
        chain=(
            ("retail_order_migration_id", "retail_order_migrations", "id"),
            ("retail_subscription_id", "retail_subscriptions", "id"),
        ),
    ),
    TableSpec(
        "retail_subscription_readjustments",
        (
            "id", "index_type_id", "index_name", "monthly_percentage",
            "annually_percentage", "month_year", "applied_at",
            "retail_subscription_id", "created_at", "updated_at", "suspended",
        ),
        boolean_cols=("suspended",),
        chain=(("retail_subscription_id", "retail_subscriptions", "id"),),
    ),
    TableSpec(
        "checkout_orders",
        (
            "ID_Order", "NM_Indicated_Login", "DS_Order", "DT_CreatedAt",
            "DT_UpdatedAt", "dt_finalization", "status", "total_amount",
            "use_anti_fraude", "Login", "customerEmail",
        ),
        id_col="ID_Order",
        ts_col="DT_CreatedAt",
        csv_sep=",",
        source_db="checkout",
        active=False,  # disabled in the reference (gluejob.py:315-317)
        wm_col="DT_UpdatedAt",  # gluejob.py:526
        source_table="TB_Checkout_Orders",  # gluejob.py:525
    ),
)

CATALOG: dict[str, TableSpec] = {s.name: s for s in _SPECS}


def spec(name: str) -> TableSpec:
    return CATALOG[name]


def tables_list(job_mode: str = "allTables") -> list[str]:
    """Table-set resolution (C2, gluejob.py:306-327): ``allTables`` →
    every active table; a known table name → that one; anything else →
    empty list (explicit no-op contract, README.md:17)."""
    active = [s.name for s in _SPECS if s.active]
    if job_mode == "allTables":
        return active
    if job_mode in active:
        return [job_mode]
    return []
