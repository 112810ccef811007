"""Bucketed-lake writer mode (r14): the measured backfill layout —
lake bucketed+sorted on the id — reachable from the K1 parity path.
Covers: init + incremental upsert through the writer, row-for-row
equality with the hive-path writer, the PK null-id guard, the
lake-side-Exchange-free plan of the backfill merge, and layout
survival across compaction."""

from __future__ import annotations

import contextlib
import io
import re

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from data_ingestor_gluejob_script_spark import pipeline
from data_ingestor_gluejob_script_spark.pipeline import (
    compact_bucketed_table,
    write_partitioned_upsert,
    write_partitioned_upsert_bucketed,
)
from data_ingestor_gluejob_script_spark.registry import CATALOG

SUBS = CATALOG["retail_subscriptions"]
TABLE = "t_bucketed_writer_lake"
BUCKETS = 4


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _n_shuffles(plan: str) -> int:
    return len(re.findall(r"(?<![A-Za-z])Exchange \(\d+\)", plan))


def _row(id, created, updated, status="active"):
    base = {c: f"x_{c}" for c in SUBS.columns}
    base.update(id=id, created_at=created, updated_at=updated, status=status)
    return base


def _batch(spark, rows):
    schema = StructType(
        [StructField(c, StringType()) for c in SUBS.columns]
    )
    return spark.createDataFrame(
        [tuple(r[c] for c in SUBS.columns) for r in rows], schema
    )


def _content(df):
    rows = df.select(*SUBS.columns).collect()
    return sorted(tuple(r) for r in rows)


@pytest.fixture()
def clean_table(spark):
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")
    yield
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")


BATCH1 = [
    _row("s1", "2024-01-10 10:00:00", "2024-01-10 10:00:00"),
    _row("s2", "2024-02-05 09:30:00", "2024-02-05 09:30:00"),
]
# s1 updated in place (same created_at → same partition), s3 new month
BATCH2 = [
    _row("s1", "2024-01-10 10:00:00", "2024-02-20 11:00:00", "canceled"),
    _row("s3", "2024-03-01 08:00:00", "2024-03-01 08:00:00"),
]


@pytest.mark.slow
def test_bucketed_writer_matches_hive_writer(spark, tmp_path, clean_table):
    """Same batches through both writer modes produce identical lake
    content; re-running the increment is idempotent."""
    lake_root = str(tmp_path / "lake")
    for batch_rows in (BATCH1, BATCH2, BATCH2):  # 3rd run = idempotence
        batch = _batch(spark, batch_rows)
        n_hive = write_partitioned_upsert(spark, batch, SUBS, lake_root)
        n_bucket = write_partitioned_upsert_bucketed(
            spark, batch, SUBS, TABLE, num_buckets=BUCKETS
        )
        assert n_hive == n_bucket
    hive = spark.read.parquet(
        pipeline.lake_table_root(lake_root, SUBS.name)
    )
    bucketed = spark.table(TABLE)
    assert _content(hive) == _content(bucketed)
    got = {r["id"]: r["status"] for r in bucketed.collect()}
    assert got == {"s1": "canceled", "s2": "active", "s3": "active"}
    # untouched partition survived the dynamic overwrite
    assert bucketed.filter("retail_subscriptions_month = 2").count() == 1


def test_bucketed_writer_rejects_null_id(spark, clean_table):
    rows = [_row("s1", "2024-01-10 10:00:00", "2024-01-10 10:00:00")]
    batch = _batch(spark, rows).withColumn(
        "id", F.lit(None).cast("string")
    )
    with pytest.raises(ValueError, match="NULL id"):
        write_partitioned_upsert_bucketed(
            spark, batch, SUBS, TABLE, num_buckets=BUCKETS
        )
    # guard fires on initial load too: table never came into existence
    assert not spark.catalog.tableExists(TABLE)


def test_backfill_merge_plan_lake_side_exchange_free(
    spark, clean_table, monkeypatch
):
    """THROUGH the writer (not a reconstruction): capture the merge
    plan the backfill arm actually executes and assert the PK-contract
    plan shape — no (coalesce, isnull) null-safe key projection, the
    lake scan is bucketed, and no Exchange sits between the lake scan
    and the sort-merge anti join."""
    write_partitioned_upsert_bucketed(
        spark, _batch(spark, BATCH1), SUBS, TABLE, num_buckets=BUCKETS
    )
    captured = {}
    real = pipeline.merge_upsert

    def spy(*args, **kwargs):
        out = real(*args, **kwargs)
        captured["plan"] = _plan(out)
        return out

    monkeypatch.setattr(pipeline, "merge_upsert", spy)
    write_partitioned_upsert_bucketed(
        spark,
        _batch(spark, BATCH2),
        SUBS,
        TABLE,
        num_buckets=BUCKETS,
        broadcast_batch=False,
    )
    plan = captured["plan"]
    assert "SortMergeJoin" in plan and "LeftAnti" in plan
    assert "Bucketed: true" in plan
    # plain-equality keys: the null-safe join's (coalesce, isnull)
    # partition shape must be absent
    assert "coalesce" not in plan.lower()
    assert "isnull(id" not in plan.lower()
    # walk the plan tree from the lake scan up its ANCESTOR chain
    # (strictly-decreasing indentation — sibling branches like the
    # incoming batch's own repartition don't count): no Exchange until
    # the SortMergeJoin consumes the lake side
    tree = plan.split("\n\n", 1)[0].splitlines()

    def _indent(ln: str) -> int:
        return re.match(r"^[\s:+|-]*", ln).end()

    scan_i = next(i for i, ln in enumerate(tree) if TABLE in ln)
    ancestors = []
    cur = _indent(tree[scan_i])
    for ln in reversed(tree[:scan_i]):
        if _indent(ln) < cur:
            cur = _indent(ln)
            ancestors.append(ln)
            if "SortMergeJoin" in ln:
                break
    assert any("SortMergeJoin" in ln for ln in ancestors), ancestors
    assert not any("Exchange" in ln for ln in ancestors), ancestors


@pytest.mark.slow
def test_layout_survives_compaction(spark, clean_table):
    write_partitioned_upsert_bucketed(
        spark, _batch(spark, BATCH1), SUBS, TABLE, num_buckets=BUCKETS
    )
    write_partitioned_upsert_bucketed(
        spark, _batch(spark, BATCH2), SUBS, TABLE, num_buckets=BUCKETS
    )
    before = _content(spark.table(TABLE))
    n = compact_bucketed_table(spark, TABLE, SUBS.id_col, BUCKETS)
    assert n == len(before)
    assert _content(spark.table(TABLE)) == before
    # bucket metadata survived: a post-compaction backfill merge still
    # reads the lake bucketed (the property compaction must not break)
    lake = spark.table(TABLE)
    keys = spark.createDataFrame([("s1",)], "id string").hint("merge")
    anti = lake.join(keys, "id", "left_anti")
    plan = _plan(anti)
    assert "Bucketed: true" in plan
    # one file per (partition, bucket) after compaction
    files = (
        spark.table(TABLE)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    )
    import os

    per_dir: dict[str, int] = {}
    for r in files:
        d = os.path.dirname(r["f"])
        per_dir[d] = per_dir.get(d, 0) + 1
    assert per_dir and all(v <= BUCKETS for v in per_dir.values()), per_dir


@pytest.mark.slow
def test_compaction_failure_keeps_staging_recovery_copy(
    spark, clean_table, monkeypatch
):
    """Static-overwrite compaction truncates the table before the
    rewrite commits, so a mid-insert failure must NOT destroy the
    staging snapshot — it is the only surviving full copy. Assert:
    on failure the staging dir is kept with every pre-compaction row;
    a retried compaction RESUMES from the complete snapshot (review
    r15: the first cut deleted it up-front, which after a truncating
    failure re-staged the empty table — silent total loss) and removes
    staging on success."""
    import os

    write_partitioned_upsert_bucketed(
        spark, _batch(spark, BATCH1), SUBS, TABLE, num_buckets=BUCKETS
    )
    before = _content(spark.table(TABLE))
    loc = pipeline._table_location(spark, TABLE)
    staging = (loc.removeprefix("file:")) + "/_compact_staging"

    real = pipeline._insert_partition_overwrite

    def truncate_then_boom(spark_, df, table_name, dynamic=True):
        # model the worst window: static overwrite cleared the table,
        # then the rewrite died before committing any rows
        spark_.sql(f"TRUNCATE TABLE {table_name}")
        raise RuntimeError("simulated mid-insert failure")

    monkeypatch.setattr(
        pipeline, "_insert_partition_overwrite", truncate_then_boom
    )
    with pytest.raises(RuntimeError, match="simulated"):
        compact_bucketed_table(spark, TABLE, SUBS.id_col, BUCKETS)
    # the table is wiped; the staging snapshot is the only full copy
    assert spark.table(TABLE).count() == 0
    assert os.path.isdir(staging), "staging recovery copy was deleted"
    recovered = spark.read.parquet(staging)
    assert (
        sorted(tuple(r) for r in recovered.select(*SUBS.columns).collect())
        == before
    )
    # retry RESTORES from the snapshot — full content back, no loss
    monkeypatch.setattr(pipeline, "_insert_partition_overwrite", real)
    n = compact_bucketed_table(spark, TABLE, SUBS.id_col, BUCKETS)
    assert n == len(before)
    assert _content(spark.table(TABLE)) == before
    assert not os.path.exists(staging)


def test_compaction_refuses_stale_snapshot_after_newer_writes(
    spark, clean_table
):
    """Advice r15: if a prior compaction's insert SUCCEEDED but the
    process died before staging cleanup, the complete snapshot
    survives with its _SUCCESS marker. Upserts can then land in the
    table — auto-resuming from the stale snapshot would static-
    overwrite the table and silently revert them. The resume guard
    must detect the newer table writes, REFUSE with the snapshot kept,
    and leave the table untouched."""
    import os
    import time

    write_partitioned_upsert_bucketed(
        spark, _batch(spark, BATCH1), SUBS, TABLE, num_buckets=BUCKETS
    )
    loc = pipeline._table_location(spark, TABLE)
    staging = (loc.removeprefix("file:")) + "/_compact_staging"
    # fabricate the post-insert-pre-cleanup crash: a COMPLETE snapshot
    # (with _SUCCESS) of the current table left behind
    spark.table(TABLE).write.parquet(staging)
    time.sleep(0.2)  # ensure later writes carry strictly newer mtimes
    write_partitioned_upsert_bucketed(
        spark, _batch(spark, BATCH2), SUBS, TABLE, num_buckets=BUCKETS
    )
    before = _content(spark.table(TABLE))
    with pytest.raises(RuntimeError, match="predates committed table"):
        compact_bucketed_table(spark, TABLE, SUBS.id_col, BUCKETS)
    # nothing reverted; snapshot kept for manual reconciliation
    assert _content(spark.table(TABLE)) == before
    assert os.path.isdir(staging)
    # operator accepts the current table by dropping the stale staging
    pipeline._rm_dir(spark, staging)
    n = compact_bucketed_table(spark, TABLE, SUBS.id_col, BUCKETS)
    assert n == len(before)
    assert _content(spark.table(TABLE)) == before


def test_compaction_partial_staging_is_dropped_not_trusted(
    spark, clean_table, monkeypatch
):
    """The complementary window: a crash DURING the staging write
    leaves a partial snapshot (no _SUCCESS) and an INTACT table — the
    retry must stage fresh from the table, never resume from (or tell
    the operator to restore) the partial copy."""
    import os

    write_partitioned_upsert_bucketed(
        spark, _batch(spark, BATCH1), SUBS, TABLE, num_buckets=BUCKETS
    )
    before = _content(spark.table(TABLE))
    loc = pipeline._table_location(spark, TABLE)
    staging = (loc.removeprefix("file:")) + "/_compact_staging"
    # fabricate a partial snapshot: valid parquet, one row, no _SUCCESS
    spark.table(TABLE).limit(1).write.parquet(staging)
    os.remove(os.path.join(staging, "_SUCCESS"))

    n = compact_bucketed_table(spark, TABLE, SUBS.id_col, BUCKETS)
    assert n == len(before)
    assert _content(spark.table(TABLE)) == before
    assert not os.path.exists(staging)


def test_compaction_refuses_stale_snapshot_on_mtime_tie(
    spark, clean_table
):
    """Review r16: object stores truncate mtimes to whole seconds, so
    an upsert committing within the snapshot's granule TIES with the
    staging _SUCCESS — the guard must refuse on ties, not just on
    strictly-newer table files."""
    import os

    write_partitioned_upsert_bucketed(
        spark, _batch(spark, BATCH1), SUBS, TABLE, num_buckets=BUCKETS
    )
    loc = pipeline._table_location(spark, TABLE)
    staging = (loc.removeprefix("file:")) + "/_compact_staging"
    spark.table(TABLE).write.parquet(staging)
    write_partitioned_upsert_bucketed(
        spark, _batch(spark, BATCH2), SUBS, TABLE, num_buckets=BUCKETS
    )
    # force the tie: pin the snapshot marker's mtime to exactly the
    # newest committed table file's mtime (coarse-granularity model)
    table_ts = pipeline._max_data_mtime(spark, loc)
    os.utime(
        os.path.join(staging, "_SUCCESS"),
        (table_ts / 1000.0, table_ts / 1000.0),
    )
    before = _content(spark.table(TABLE))
    with pytest.raises(RuntimeError, match="predates committed table"):
        compact_bucketed_table(spark, TABLE, SUBS.id_col, BUCKETS)
    assert _content(spark.table(TABLE)) == before
    assert os.path.isdir(staging)
