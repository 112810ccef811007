"""The ingestion pipeline itself: flow dispatch (C1), the per-table
loop, and the partition-scoped upsert lake writer (K1+O6+O7).

This is the reference job's actual purpose (``/root/reference/
gluejob.py``): materialize OLTP tables into a hive-partitioned parquet
lake, either from CSV drops (initial load, gluejob.py:163-171) or
incrementally from the source databases since the last watermark
(gluejob.py:157-161), with MERGE/upsert semantics per partition
(gluejob.py:190-205) and the t0/advance/commit watermark protocol
(gluejob.py:616,136-139,623).

Spark-first re-expression:
- The reference's sequential per-partition driver loop
  (gluejob.py:183-188) becomes ``write.partitionBy`` — one distributed
  shuffle-on-write produces every ``company=…/{t}_year=…/{t}_month=…``
  directory (identical ``k=v`` layout to gluejob.py:187).
- The read-merge-overwrite of one parquet object per partition
  (gluejob.py:190-205) becomes: prune the existing lake to the
  partitions present in the batch (partition-filter pushdown — Spark
  never opens untouched directories), union with explicit precedence,
  ``row_number()`` winner per id (deterministic where the reference's
  ``keep='first'`` is order-dependent), then dynamic partition
  overwrite — only directories present in the output are replaced.
- The one-file-per-partition constraint is dropped (it caps write
  parallelism and forces 100 TB partitions through one task); the
  directory contract is preserved, which is what downstream readers
  depend on.

Scale notes (100 TB): the only shuffles are the upsert window on the
id column and the write's partition split; both are keyed, AQE-sized,
and skew-split. The touched-partition set is the one driver-side
collect — a list of (year, month) pairs, bounded by the calendar, not
the data.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from datetime import datetime, timezone
from functools import reduce

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from .operators.normalize import normalize_booleans
from .operators.relational import semi_join, watermark_filter
from .operators.temporal import derive_partitions, format_ts_micro, parse_ts
from .operators.upsert import merge_upsert, upsert_dedup
from .registry import CATALOG, TableSpec, tables_list
from .sources.files import read_csv_table, read_parquet_table
from .watermarks import WATERMARK_FORMAT, WatermarkStore

log = logging.getLogger(__name__)


def lake_table_root(lake_root: str, table: str) -> str:
    """``{lake_root}/raw/locaweb/{table}`` — the prefix above the
    partition directories (gluejob.py:187)."""
    return f"{lake_root}/raw/locaweb/{table}"


def _partition_predicate(ycol: str, mcol: str, touched: list[tuple]):
    """OR-of-(year AND month) filter over the touched partition set,
    null-safe: a NULL partition value (NULL event time →
    __HIVE_DEFAULT_PARTITION__) needs an isNull term — ``col == None``
    is SQL NULL, never true, which would exclude existing
    null-partition rows from a merge while dynamic overwrite still
    replaces that directory, silently deleting them. Shared by the
    upsert merge and the erasure path so partition addressing can't
    drift between them."""

    def _term(col: str, v):
        return F.col(col).isNull() if v is None else (F.col(col) == v)

    return reduce(
        lambda a, b: a | b,
        [_term(ycol, y) & _term(mcol, m) for y, m in touched],
    )


def _touched_partitions_guarded(
    prepared: DataFrame,
    spec: TableSpec,
    ycol: str,
    mcol: str,
    delete_touched: list[tuple] | None,
) -> tuple[list[tuple], list[tuple]]:
    """One metadata-sized pass over the prepared batch that yields the
    (year, month) partitions it touches AND enforces the writer's PK
    contract (no NULL ``spec.id_col``) in the same aggregation — the
    null-id guard that makes ``merge_upsert(keys_nullable=False)``
    sound costs no extra batch scan beyond the touched-partition
    collect the writer already paid. Returns ``(touched,
    batch_touched)`` where ``touched`` additionally covers the CDC
    delete arm's victim partitions."""
    part_rows = (
        prepared.groupBy(ycol, mcol)
        .agg(
            F.count_if(F.col(spec.id_col).isNull()).alias("_null_ids")
        )
        .collect()
    )
    null_ids = sum(r["_null_ids"] for r in part_rows)
    if null_ids:
        raise ValueError(
            f"write_partitioned_upsert: {null_ids} row(s) with NULL "
            f"{spec.id_col} in the {spec.name} batch — the lake merge "
            "treats the id as a primary key (plain-equality anti "
            "join); a NULL id can never be upserted over and would "
            "strand forever. Fix the extraction or pre-filter."
        )
    batch_touched = [(r[0], r[1]) for r in part_rows]
    touched = list(batch_touched)
    for part in delete_touched or []:
        if part not in touched:
            touched.append(part)
    return touched, batch_touched


def _prepare_batch(batch: DataFrame, spec: TableSpec) -> DataFrame:
    """Shared batch normalization both lake writers run: boolean
    dict-map (O1, gluejob.py:181), partition derivation from the
    created-at column (O5, gluejob.py:182-185), and the microsecond
    strftime round-trip of the timestamp column (O4,
    gluejob.py:174)."""
    return (
        normalize_booleans(batch, spec.boolean_cols)
        .transform(lambda d: derive_partitions(d, spec.ts_col, spec.name))
        .withColumn(spec.ts_col, format_ts_micro(parse_ts(F.col(spec.ts_col))))
    )


def _scope_existing(
    existing: DataFrame,
    prepared: DataFrame,
    spec: TableSpec,
    ycol: str,
    mcol: str,
    touched: list[tuple],
    company: str,
) -> DataFrame:
    """The lake rows one merge must consider, shared by the hive-path
    and bucketed-table writers.

    Partition-scoped (gluejob.py:190-205): only lake partitions the
    batch touches (null-safety: see _partition_predicate), and only
    THIS company's — company is a partition column, so on a
    multi-company lake an unscoped read would merge other companies'
    rows into this company's rewrite (re-stamped with the wrong
    company literal) while dynamic overwrite left their own partitions
    intact — duplication, and under the fused delete arm,
    cross-company erasure. Both predicates push down as partition
    pruning.

    Schema evolution: a registry column added AFTER these lake files
    were written is absent from the merged scan — backfill it as a
    typed NULL (type from the incoming batch) so historic rows survive
    the upsert with NULL in the new column instead of failing the
    select. Columns the lake has but the registry dropped are pruned
    by the select, and age out as their partitions rewrite.
    """
    pred = _partition_predicate(ycol, mcol, touched)
    if "company" in existing.columns:
        existing = existing.filter(F.col("company") == company)
    existing = existing.filter(pred)  # pushed as partition pruning
    batch_types = {f.name: f.dataType for f in prepared.schema.fields}
    for c in spec.columns:
        if c not in existing.columns:
            existing = existing.withColumn(c, F.lit(None).cast(batch_types[c]))
    return (
        existing.select(*spec.columns)  # drop partition/company cols
        .transform(lambda d: derive_partitions(d, spec.ts_col, spec.name))
    )


def _partition_dir(
    spark: SparkSession, root: str, table: str, company: str, y, m
) -> str:
    """Filesystem path of one (company, year, month) partition
    directory — the single spelling of the Hive layout used by the
    compat rename and the erasure cleanup. Values go through Spark's
    own Hive path escaping (ExternalCatalogUtils.escapePathName), so
    a company like "Foo:Bar" resolves to the company=Foo%3ABar
    directory the writer actually created — a hand-built unescaped
    path would silently miss it and, on the erasure paths, leave
    supposedly-deleted rows readable (round-9 review finding)."""
    esc = spark._jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName
    return (
        f"{root}/company={esc(company)}"
        f"/{table}_year={esc(_part_dir_value(y))}"
        f"/{table}_month={esc(_part_dir_value(m))}"
    )


def write_partitioned_upsert(
    spark: SparkSession,
    batch: DataFrame,
    spec: TableSpec,
    lake_root: str,
    company: str = "Locaweb",
    max_records_per_file: int | None = None,
    single_object_compat: bool = False,
    delete_keys: DataFrame | None = None,
    delete_touched: list[tuple] | None = None,
    broadcast_batch: bool = True,
) -> int:
    """K1: merge one table batch into its lake partitions.

    The merge itself is ``merge_upsert`` (r13): the scoped lake read
    never shuffles — it is the map-side stream of an anti join against
    the batch's broadcast key set — where the previous window-over-
    union form re-shuffled every touched partition's rows on each
    daily batch. ``broadcast_batch`` declares the batch
    driver-holdable (a daily increment); pass False for a
    backfill-sized batch (initial_load does) and the merge takes the
    sort-merge arm — only the batch shuffles either way.

    Uniqueness invariant (``existing_unique=True``): one row per id
    PER PARTITION, which is one row per id lake-wide because the
    partition key derives from the created-at column — immutable at
    the source (gluejob.py:174: DT_CreatedAt/created_at, never the
    updated_at that incremental pulls filter on), so an id can never
    legitimately move partitions. A source that DID mutate created_at
    would strand a stale copy in the old partition under BOTH merge
    forms (the untouched partition is never read); the old window
    form only appeared to heal it in the lucky case both partitions
    were touched — and then picked an arbitrary column-order winner,
    not the newest row. The reference merges each partition file
    independently (gluejob.py:190-205) and never heals
    cross-partition copies either; this writer now matches it
    exactly.

    Returns the number of rows written (0 = empty batch skipped, the
    F2 guard at gluejob.py:175-179). Mirrors posting_parquets_in_s3 +
    s3_parquet_file_put_and_update (gluejob.py:173-205) as one
    distributed plan.

    ``delete_keys`` (+ ``delete_touched``, the victim partitions the
    caller discovered) fuses a CDC delete arm into the SAME rewrite:
    the scoped lake read anti-joins the keys before the merge, the
    touched-partition predicate covers both arms, and partitions the
    deletes fully emptied are removed explicitly (dynamic overwrite
    cannot clear a partition that gets no output rows). One lake
    read + one write where the unfused upsert-then-forget_rows
    sequence paid two of each on overlapping partitions. Requires a
    NON-EMPTY batch (the merged write's Observation needs rows to
    flow; callers route empty-upsert change batches to forget_rows).

    ``single_object_compat=True`` reproduces the reference's exact
    on-disk contract — ONE parquet object named ``{table}.parquet``
    per partition directory (gluejob.py:187,201-203) — for downstream
    readers that GET that key instead of listing the directory. It
    routes each partition through a single task (a deliberate
    parallelism cap), so leave it off at scale and run the default
    multi-file layout + ``compact_partitions`` instead.
    """
    if batch.limit(1).count() == 0:
        if delete_keys is not None:
            raise ValueError(
                "write_partitioned_upsert: delete_keys requires a "
                "non-empty batch — use forget_rows for pure erasure"
            )
        log.info("skip empty batch for %s", spec.name)
        return 0

    ycol, mcol = f"{spec.name}_year", f"{spec.name}_month"
    prepared = _prepare_batch(batch, spec)

    root = lake_table_root(lake_root, spec.name)
    existing = read_parquet_table(spark, root)
    # The (year, month) set this batch touches — drives both the lake
    # pruning predicate and the compat rename scope. The collect is
    # metadata-sized (bounded by the calendar, not the data). The same
    # pass enforces the PK contract: this writer's merge runs the anti
    # join with plain-equality keys (``keys_nullable=False`` below),
    # which is only sound because no row with a NULL id ever enters
    # the lake — guarded HERE, on every write including the initial
    # load, so the invariant holds for the lake's whole life.
    touched, batch_touched = _touched_partitions_guarded(
        prepared, spec, ycol, mcol, delete_touched
    )
    if existing is not None:
        existing = _scope_existing(
            existing, prepared, spec, ycol, mcol, touched, company
        )

    emptied: list[tuple] = []
    if delete_keys is not None and existing is not None:
        if single_object_compat:
            raise ValueError(
                "write_partitioned_upsert: delete_keys is not "
                "supported with single_object_compat (the rename "
                "scope and emptied-dir removal would conflict)"
            )
        key = delete_keys.select(
            F.col(delete_keys.columns[0]).alias(spec.id_col)
        ).distinct()
        existing = existing.join(F.broadcast(key), spec.id_col, "left_anti")
        # Which delete-arm partitions still hold rows after the fused
        # merge — resolved BEFORE the overwrite (the write mutates the
        # path this plan reads). A partition receiving batch rows can
        # never empty; only delete_touched - batch_touched can.
        at_risk = [
            p for p in (delete_touched or []) if p not in batch_touched
        ]
        if at_risk:
            risk_pred = _partition_predicate(ycol, mcol, at_risk)
            kept = {
                (r[0], r[1])
                for r in existing.filter(risk_pred)
                .select(ycol, mcol)
                .distinct()
                .collect()
            }
            emptied = [p for p in at_risk if p not in kept]

    if existing is None:
        merged = upsert_dedup(prepared, None, spec.id_col)  # O6+O7
    else:
        merged = merge_upsert(  # O6+O7, join-formulated (r13)
            prepared,
            existing,
            spec.id_col,
            existing_unique=True,
            broadcast_incoming=broadcast_batch,
            # PK contract: ids are guarded non-null on every write
            # (see _touched_partitions_guarded), so the anti join may
            # use plain equality. The null-safe form would partition
            # on (coalesce(id), isnull(id)) — a shape no id-bucketed
            # lake can satisfy, silently re-introducing the lake-side
            # Exchange on the sort-merge/backfill arm (the trap pinned
            # in operators/upsert.py and tests/test_merge_upsert.py).
            keys_nullable=False,
        )
    # Row count via an Observation on the write itself: a separate
    # .count() would execute the full merge plan (the incoming-side
    # window dedup + broadcast/sort-merge anti join against the pruned
    # lake scan + union — and re-extract a JDBC source) a second time
    # just for the number.
    obs = Observation(f"upsert_{spec.name}")
    out = merged.observe(obs, F.count(F.lit(1)).alias("n")).withColumn(
        "company", F.lit(company)
    )
    if single_object_compat:
        # Hash-partition on the partition columns so each (company,
        # year, month) combination lands in exactly one task → exactly
        # one file per partition directory, renamed below.
        out = out.repartition("company", ycol, mcol)
    writer = out.write
    if max_records_per_file and not single_object_compat:
        # The reference writes ONE object per partition (gluejob.py:
        # 187,201-203) — a single-task bottleneck at 100 TB. We keep
        # the directory contract and bound file size instead: Spark
        # rolls to a new file within the partition every N records.
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    (
        # Per-writer dynamic overwrite: only partitions present in
        # `merged` are replaced. Set on the writer (not the session) so
        # the contract holds for caller-supplied vanilla sessions too —
        # a session-level default of "static" would otherwise wipe the
        # whole table root and the touched-scoped rename below would
        # miss partitions that silently lost their files.
        writer.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("company", ycol, mcol)
        .parquet(root)
    )
    n = int(obs.get["n"])
    if single_object_compat:
        _rename_to_single_objects(spark, root, spec.name, company, touched)
    if emptied:
        _remove_partition_dirs(spark, root, spec.name, company, emptied)
    log.info("upserted %d rows into %s", n, root)
    return n


def _remove_partition_dirs(
    spark: SparkSession, root: str, table: str, company: str, parts
) -> None:
    """Explicitly delete partition directories dynamic overwrite left
    behind (it cannot clear a partition that produced no output rows)
    — shared by the fused CDC write and forget_rows, Hadoop FS API so
    it works on local/HDFS/s3a alike."""
    jvm = spark._jvm
    fs = None
    for y, m in parts:
        part_dir = _partition_dir(spark, root, table, company, y, m)
        path = jvm.org.apache.hadoop.fs.Path(part_dir)
        if fs is None:
            fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(path):
            fs.delete(path, True)


def _part_dir_value(v) -> str:
    """Directory-name form of a partition value (Hive convention for
    null partitions)."""
    return "__HIVE_DEFAULT_PARTITION__" if v is None else str(v)


def _rename_to_single_objects(
    spark: SparkSession,
    root: str,
    table: str,
    company: str,
    touched: list[tuple],
) -> None:
    """Rename each TOUCHED partition's lone ``part-*.parquet`` to the
    reference's object name ``{table}.parquet`` (gluejob.py:187).

    Scoped to the (year, month) partitions this batch actually wrote:
    a table-root-wide glob would also sweep untouched partitions, and
    an untouched partition holding several ``part-*`` files (written in
    the default multi-file mode, or compacted with
    ``target_files_per_partition > 1``) would lose all but one of them
    to the rename-over-delete. A touched partition with more than one
    ``part-*`` file raises instead of guessing — it means the
    single-task-per-partition invariant of the compat write was broken.

    Goes through the Hadoop FileSystem API so the same code works on
    any path scheme (local, HDFS, s3a) — object stores implement
    rename as copy+delete, one more reason this mode is compat-only.
    """
    jvm = spark._jvm
    fs = None
    for y, m in touched:
        part_dir = _partition_dir(spark, root, table, company, y, m)
        pattern = jvm.org.apache.hadoop.fs.Path(f"{part_dir}/part-*.parquet")
        if fs is None:
            fs = pattern.getFileSystem(spark._jsc.hadoopConfiguration())
        matches = list(fs.globStatus(pattern) or [])
        if len(matches) > 1:
            raise IOError(
                f"compat rename expects one part file in {part_dir}, "
                f"found {len(matches)} — refusing to delete data"
            )
        for status in matches:
            src = status.getPath()
            dst = jvm.org.apache.hadoop.fs.Path(
                src.getParent(), f"{table}.parquet"
            )
            if fs.exists(dst):  # re-upsert into an already-compat partition
                fs.delete(dst, False)
            if not fs.rename(src, dst):
                raise IOError(f"compat rename failed: {src} -> {dst}")


def compact_partitions(
    spark: SparkSession,
    table_root: str,
    target_files_per_partition: int = 1,
) -> int:
    """Small-file compaction: rewrite every partition of a lake table
    into ``target_files_per_partition`` files, preserving content and
    the directory contract.

    Incremental upserts accumulate files per partition (each batch's
    tasks write their own); scan cost grows with file count, not data.
    Compaction is a read → repartition-within-partition → dynamic
    partition overwrite. Run it out-of-band (the reference has no
    analogue — its one-file-per-partition writes WERE the compaction,
    at the cost of single-task writes).

    Returns the number of rows rewritten.
    """
    # mergeSchema: compaction REWRITES the lake — a one-footer scan of
    # a schema-evolved table would rewrite it without the columns only
    # some generations carry, which is silent data loss (same contract
    # as the upsert writer's existing-lake read).
    df = spark.read.option("mergeSchema", "true").parquet(table_root)
    part_cols = _partition_cols(spark, df, table_root)
    obs = Observation("compact_rows")
    observed = df.observe(obs, F.count(F.lit(1)).alias("n"))
    if target_files_per_partition > 1:
        # Hashing on the partition columns alone puts ALL of a
        # partition's rows in one task → always one file; a salt
        # derived from the data columns spreads each partition over up
        # to `target` tasks. The partition count is EXPLICIT — with no
        # number, AQE's coalescing is free to merge the small salted
        # partitions straight back into one task, silently undoing the
        # spread (observed on a small table).
        data_cols = [c for c in df.columns if c not in part_cols]
        salt = F.pmod(
            F.xxhash64(*data_cols), F.lit(target_files_per_partition)
        )
        n_parts = max(
            spark.sparkContext.defaultParallelism,
            target_files_per_partition * 4,
        )
        reparted = observed.repartition(n_parts, *part_cols, salt)
    else:
        reparted = observed.repartition(*part_cols)
    (
        reparted.write.mode("overwrite")
        # Per-writer dynamic overwrite, NOT inherited from the session:
        # under a vanilla session (static default) Spark would delete
        # the whole table root before the write job reads the input
        # files it is compacting — total loss of the table. Same
        # contract (and comment) as the upsert writer above.
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*part_cols)
        .parquet(table_root)
    )
    return int(obs.get["n"])


def _partition_cols(spark: SparkSession, df, table_root: str) -> list[str]:
    """Columns materialized as ``k=v`` directories under the table
    root, in ``df.columns`` (i.e. hierarchy) order.

    Uses the Hadoop FileSystem glob — NOT Python's ``glob`` — so
    detection works for any path scheme (local, HDFS, s3a). A local
    glob silently returns nothing for object-store URIs, which would
    make compaction ``partitionBy()`` nothing and flatten the lake's
    partition layout.
    """
    jvm = spark._jvm
    fs = jvm.org.apache.hadoop.fs.Path(table_root).getFileSystem(
        spark._jsc.hadoopConfiguration()
    )
    found = []
    for col in df.columns:
        for depth in ("", "*/", "*/*/"):
            pattern = jvm.org.apache.hadoop.fs.Path(
                f"{table_root}/{depth}{col}=*"
            )
            if fs.globStatus(pattern):
                found.append(col)
                break
    return found


def lake_partition_stats(spark: SparkSession, table_root: str) -> DataFrame:
    """Per-partition row counts for a lake table — the observability
    query behind compaction/skew decisions. Partition pruning makes
    this a metadata-plus-counts scan, not a full-column read."""
    df = spark.read.option("mergeSchema", "true").parquet(table_root)
    part_cols = _partition_cols(spark, df, table_root)
    return df.groupBy(*part_cols).count().withColumnRenamed("count", "n_rows")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist a DataFrame as a bucketed (and optionally sorted)
    parquet table in the session catalog.

    Bucketing pre-shuffles ONCE at write time: two tables bucketed on
    their join key co-locate, so every subsequent join between them
    runs with NO exchange (and with sortBy, no sort either) — the
    amortization that matters for a fact table joined daily at 100 TB.
    Verified by plan assertion in tests/test_bucketing.py.
    """
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def _table_location(spark: SparkSession, table_name: str) -> str:
    """Storage location of a catalog table, via DESCRIBE FORMATTED —
    public API, works for any catalog/path scheme."""
    rows = spark.sql(f"DESCRIBE FORMATTED {table_name}").collect()
    for r in rows:
        if r["col_name"].strip() == "Location":
            return r["data_type"].strip()
    raise ValueError(f"no Location in DESCRIBE FORMATTED {table_name}")


def _rm_dir(spark: SparkSession, path: str) -> None:
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(p):
        fs.delete(p, True)


def _dir_has_success(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` holds a COMPLETE Spark write (its committer's
    ``_SUCCESS`` marker exists) — how the compaction resume path tells
    an authoritative snapshot from a partial one."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(f"{path}/_SUCCESS")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def _success_mtime(spark: SparkSession, path: str) -> int | None:
    """Modification time (epoch ms) of ``path``'s ``_SUCCESS`` marker,
    or None when absent — the timestamp token the compaction
    stale-resume guard compares table writes against."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(f"{path}/_SUCCESS")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return None
    return int(fs.getFileStatus(p).getModificationTime())


def _max_data_mtime(spark: SparkSession, path: str) -> int | None:
    """Newest modification time (epoch ms) across a table location's
    COMMITTED data files — every hidden path (any component starting
    with ``_`` or ``.``: staging dirs, committer ``_temporary``,
    markers) is excluded, so only files a reader would see count."""
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(root):
        return None
    root_uri = str(fs.makeQualified(root).toUri().getPath()).rstrip("/")
    newest = None
    it = fs.listFiles(root, True)
    while it.hasNext():
        st = it.next()
        rel = str(st.getPath().toUri().getPath())[len(root_uri):]
        if any(c and c[0] in "_." for c in rel.split("/")):
            continue
        m = int(st.getModificationTime())
        if newest is None or m > newest:
            newest = m
    return newest


def _insert_partition_overwrite(
    spark: SparkSession, df: DataFrame, table_name: str, dynamic: bool = True
) -> None:
    """``INSERT OVERWRITE`` into a catalog table with an explicit
    partition-overwrite mode. ``insertInto`` ignores writer-level
    ``partitionOverwriteMode`` options (verified on Spark 4.1: a
    writer-option "dynamic" under a static session still wiped
    untouched partitions), so the session conf is set for the insert
    and restored after — the same vanilla-session-safety contract the
    hive-path writer gets from its per-writer option."""
    key = "spark.sql.sources.partitionOverwriteMode"
    old = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic" if dynamic else "static")
    try:
        df.write.insertInto(table_name, overwrite=True)
    finally:
        spark.conf.set(key, old)


def write_partitioned_upsert_bucketed(
    spark: SparkSession,
    batch: DataFrame,
    spec: TableSpec,
    table_name: str,
    *,
    num_buckets: int = 32,
    company: str = "Locaweb",
    broadcast_batch: bool = True,
) -> int:
    """K1 on a BUCKETED lake: same merge semantics as
    ``write_partitioned_upsert`` (same batch normalization, same
    null-id PK guard, same partition+company scoping, same
    ``merge_upsert(existing_unique=True, keys_nullable=False)``), but
    the lake is a catalog table partitioned by (company, year, month)
    AND bucketed+sorted on ``spec.id_col`` — the layout under which
    the backfill arm's sort-merge anti join reads the lake with no
    Exchange and no Sort (measured 2.55×/decade at sf100 in
    tools/bucketed_upsert.py vs 6.33× for the window form; plan
    pinned by tests/test_merge_upsert.py). Use this mode when batches
    are routinely backfill-sized; for daily increments the hive-path
    writer's broadcast arm is already Exchange-free on the lake.

    Mechanics the layout forces (why this isn't just a writer flag):

    - Bucket metadata lives in the catalog, so the lake is
      ``saveAsTable``-managed and merges write back via ``INSERT
      OVERWRITE`` (the bucketed write path stamps bucket ids into
      file names; writing bare parquet into the table directory would
      corrupt the layout readers trust).
    - Spark refuses an INSERT OVERWRITE whose plan reads the target
      table (UNSUPPORTED_OVERWRITE), so the merged touched partitions
      stage through a ``_staging`` subdirectory of the table location
      (underscore-prefixed → invisible to table scans) and re-insert
      from there. The staging pass costs one extra write+read of the
      TOUCHED partitions only — the price of keeping the lake scan
      bucketed during the merge itself.
    - Dynamic partition overwrite on insert comes from session conf,
      set-and-restored per write (see _insert_partition_overwrite).

    Returns rows written (0 = empty batch skipped, the F2 guard).
    """
    if batch.limit(1).count() == 0:
        log.info("skip empty batch for %s", spec.name)
        return 0

    ycol, mcol = f"{spec.name}_year", f"{spec.name}_month"
    prepared = _prepare_batch(batch, spec)
    # Same pass = same PK contract as the hive-path writer: the
    # plain-equality anti join below is only sound because NULL ids
    # are rejected on every write, initial load included.
    touched, _ = _touched_partitions_guarded(
        prepared, spec, ycol, mcol, None
    )

    obs = Observation(f"upsert_bucketed_{spec.name}")
    if not spark.catalog.tableExists(table_name):
        out = (
            prepared.observe(obs, F.count(F.lit(1)).alias("n"))
            .withColumn("company", F.lit(company))
            .select(*spec.columns, "company", ycol, mcol)
        )
        (
            out.write.format("parquet")
            .partitionBy("company", ycol, mcol)
            .bucketBy(num_buckets, spec.id_col)
            .sortBy(spec.id_col)
            .saveAsTable(table_name)
        )
        n = int(obs.get["n"])
        log.info("created bucketed lake %s with %d rows", table_name, n)
        return n

    lake = spark.table(table_name)
    existing = _scope_existing(
        lake, prepared, spec, ycol, mcol, touched, company
    )
    if not broadcast_batch:
        # Conform the incoming side to the lake's bucket layout BEFORE
        # the merge: the incoming dedup window would otherwise shuffle
        # at AQE's initial width, and when the sort-merge join then
        # aligns partition COUNTS it re-shuffles the 4-vs-256 smaller
        # child — the bucketed lake — forfeiting the Exchange-free scan
        # this layout exists for (observed: the planner's
        # autoBucketedScan then disables bucketed reading entirely).
        # One explicit hash(id, num_buckets) shuffle of the batch makes
        # the window AND the join reuse it: the lake side never moves.
        # AQE does not coalesce user-specified repartitions, so the
        # alignment holds regardless of batch size.
        prepared = prepared.repartition(num_buckets, spec.id_col)
    merged = merge_upsert(
        prepared,
        existing,
        spec.id_col,
        existing_unique=True,  # this writer's own uniqueness invariant
        broadcast_incoming=broadcast_batch,
        keys_nullable=False,  # PK contract, guarded above — keeps the
        # bucketed lake scan Exchange-free under the sort-merge arm
    )
    staging = f"{_table_location(spark, table_name)}/_staging"
    out = merged.observe(obs, F.count(F.lit(1)).alias("n")).withColumn(
        "company", F.lit(company)
    )
    try:
        out.select(*lake.columns).write.mode("overwrite").parquet(staging)
        n = int(obs.get["n"])
        staged = spark.read.parquet(staging).select(*lake.columns)
        _insert_partition_overwrite(spark, staged, table_name, dynamic=True)
    finally:
        _rm_dir(spark, staging)
    log.info("upserted %d rows into bucketed lake %s", n, table_name)
    return n


def compact_bucketed_table(
    spark: SparkSession, table_name: str, bucket_col: str, num_buckets: int
) -> int:
    """Small-file compaction for a bucketed lake table, preserving the
    bucket layout: each insert leaves one file per bucket PER WRITE
    TASK, so partitions accumulate up to tasks×buckets files per
    rewrite. Re-inserting the table clustered on the bucket column
    collapses that to one file per (partition, bucket) — ``repartition
    (num_buckets, bucket_col)`` uses the same murmur3 hash family as
    bucket assignment, so each task holds exactly one bucket's rows.

    Same staging dance as the upsert (Spark refuses a self-reading
    INSERT OVERWRITE); the insert is STATIC overwrite — a full-table
    rewrite, which is what compaction is. Bucket metadata is
    catalog-owned and untouched by inserts, so the layout (and every
    Exchange-free plan built on it) survives — asserted in
    tests/test_bucketed_writer.py. Returns rows rewritten.

    Failure safety: static overwrite TRUNCATES the table before the
    rewrite commits, so — unlike the upsert's dynamic overwrite, where
    deletion defers to commit — a mid-insert failure (disk full,
    exhausted retries) can leave the lake wiped while the staging copy
    is the only surviving full snapshot. The staging directory is
    therefore removed only AFTER a successful insert. A stale staging
    at entry is interpreted by its ``_SUCCESS`` marker (review r15 —
    the first cut deleted staging unconditionally, which on a
    retry-after-truncation re-staged the EMPTY table and committed it
    as a silent total loss):

    - staging WITH ``_SUCCESS``: the previous run completed the
      snapshot and then died in (or before finishing) the truncating
      insert — the snapshot is authoritative; resume by inserting IT,
      never by re-reading the possibly-truncated table.
    - staging WITHOUT ``_SUCCESS``: the previous run died mid-snapshot
      — the table was never touched; drop the partial copy and stage
      fresh.

    Stale-resume guard (advice r15): a snapshot is authoritative only
    while the table holds NO writes newer than it. If the previous
    insert actually SUCCEEDED and the process died before staging
    cleanup, later upserts can land in the table; auto-resuming would
    then static-overwrite the table with the pre-upsert snapshot —
    silently reverting every row written since. Two defenses: (a) the
    ``_SUCCESS`` marker is deleted IMMEDIATELY after a successful
    insert (one FS op before the directory delete, shrinking the
    stale-snapshot window to milliseconds), and (b) on resume, the
    newest committed table data-file mtime is compared against the
    snapshot's ``_SUCCESS`` mtime — table-newer means writes landed
    after the snapshot was taken, so the resume REFUSES with the
    snapshot kept for manual reconciliation. A failed insert commits
    nothing (the committer publishes data files only at job commit),
    so genuine crash recovery always passes this check.

    Scale contract: this is deliberately a FULL-table rewrite — the
    point of bucketed-lake compaction is to restore the one-file-per-
    (partition, bucket) invariant that upsert write tasks erode, and
    that clustering is global (every row must land in its murmur3
    bucket file). Run it as scheduled maintenance at the deployment's
    cadence, not per-batch; incremental tail-packing (the append-lake
    compactor's shape) cannot apply because bucket membership, not
    file size, dictates placement.
    """
    lake = spark.table(table_name)
    staging = f"{_table_location(spark, table_name)}/_compact_staging"
    resume = _dir_has_success(spark, staging)
    if resume:
        snap_ts = _success_mtime(spark, staging)
        table_ts = _max_data_mtime(spark, _table_location(spark, table_name))
        # >= not >: object stores truncate mtimes to whole seconds, so
        # an upsert committing within the snapshot's granule would tie
        # and slip past a strict comparison into the silent revert. A
        # tie therefore REFUSES — fail-safe toward manual
        # reconciliation; genuine crash recovery always has table
        # files strictly older than the snapshot (a failed insert
        # commits nothing), or a truncated/empty table (None).
        if snap_ts is not None and table_ts is not None and table_ts >= snap_ts:
            raise RuntimeError(
                f"compact {table_name}: staging snapshot at {staging} "
                f"predates committed table writes (snapshot _SUCCESS "
                f"{snap_ts} <= newest table file {table_ts}) — a prior "
                "compaction's insert likely succeeded before cleanup "
                "died, and rows were written since; auto-resume would "
                "revert them. The snapshot is KEPT; reconcile manually "
                "(drop the staging dir to accept the current table, or "
                "insert the snapshot yourself to accept it)"
            )
        log.warning(
            "compact %s: resuming from the complete staging snapshot "
            "at %s (previous run failed during the insert phase)",
            table_name,
            staging,
        )
        n = spark.read.parquet(staging).count()
    else:
        _rm_dir(spark, staging)  # partial snapshot; table untouched
        obs = Observation(f"compact_{table_name}")
        try:
            (
                lake.observe(obs, F.count(F.lit(1)).alias("n"))
                .write.mode("overwrite")
                .parquet(staging)
            )
        except BaseException:
            # snapshot-phase failure: the table is INTACT — say so, and
            # drop the partial copy so a retry can't mistake it for a
            # recovery snapshot
            log.error(
                "compact %s: staging write failed; the table is intact "
                "and the partial staging at %s was discarded",
                table_name,
                staging,
            )
            _rm_dir(spark, staging)
            raise
        n = int(obs.get["n"])
    try:
        staged = (
            spark.read.parquet(staging)
            .repartition(num_buckets, bucket_col)
            .select(*lake.columns)
        )
        _insert_partition_overwrite(spark, staged, table_name, dynamic=False)
    except BaseException:
        log.error(
            "compact %s: insert failed AFTER the table may have been "
            "truncated; the complete staging snapshot is KEPT at %s — "
            "re-running compact_bucketed_table resumes from it",
            table_name,
            staging,
        )
        raise
    # Revoke the snapshot's authority FIRST (advice r15): the insert
    # has committed, so from here the snapshot is stale — one marker
    # delete closes the resume window before the (slower, many-file)
    # directory delete runs.
    _rm_dir(spark, f"{staging}/_SUCCESS")
    _rm_dir(spark, staging)
    return n


class LocalFileSource:
    """Incremental source over a directory of per-table CSV files —
    the JDBC seam's file-backed twin, used in tests and anywhere a
    database isn't reachable.

    Applies the same semantics the reference pushes into source SQL
    (gluejob.py:521-600): direct tables filter on their own ``wm_col``;
    chained tables semi-join child→…→anchor against the
    watermark-filtered anchor. All Spark-side, so Catalyst sees one
    declarative plan (filters pushed into the scans, small filtered
    anchors broadcast).
    """

    def __init__(self, root: str, clock: datetime | None = None):
        self.root = root
        self._clock = clock

    def _read(self, spark: SparkSession, spec: TableSpec) -> DataFrame | None:
        return read_csv_table(spark, f"{self.root}/{spec.name}.csv", spec)

    def read_table(
        self, spark: SparkSession, spec: TableSpec, watermark: str
    ) -> DataFrame | None:
        child = self._read(spark, spec)
        if child is None:
            return None
        if not spec.chain:
            return watermark_filter(child, spec.wm_col, watermark)
        # Qualify the anchor, then semi-join the chain back to the child.
        _, anchor_name, _ = spec.chain[-1]
        anchor_spec = CATALOG[anchor_name]
        qualified = self._read(spark, anchor_spec)
        if qualified is None:
            return None
        qualified = watermark_filter(qualified, anchor_spec.wm_col, watermark)
        # Hop i's parent carries hop i+1's FK; walk anchor→child
        # narrowing each intermediate table to qualified rows.
        for i in range(len(spec.chain) - 2, -1, -1):
            _, parent, _ = spec.chain[i]
            next_fk, _, next_pk = spec.chain[i + 1]
            parent_df = self._read(spark, CATALOG[parent])
            if parent_df is None:
                return None
            qualified = semi_join(parent_df, qualified, next_fk, next_pk)
        first_fk, _, first_pk = spec.chain[0]
        return semi_join(child, qualified, first_fk, first_pk)

    def clock(self, spark: SparkSession) -> str:
        """t0 stand-in for S5 (gluejob.py:282-304): injected fixed
        clock in tests, wall clock otherwise."""
        now = self._clock or datetime.now(timezone.utc)
        return now.strftime(WATERMARK_FORMAT)


@dataclass
class RunResult:
    flow: str
    tables: dict[str, int] = field(default_factory=dict)
    skipped: list[str] = field(default_factory=list)


def bucketed_lake_table(table: str, prefix: str = "lake_") -> str:
    """Catalog-table name the bucketed writer mode uses for ``table``
    (catalog tables live in the warehouse, not under ``lake_root``)."""
    return f"{prefix}{table}"


def _flow_write(
    spark: SparkSession,
    df: DataFrame,
    spec: TableSpec,
    lake_root: str,
    company: str,
    writer: str,
    num_buckets: int,
    broadcast_batch: bool,
) -> int:
    """The flow's writer seam: ``hive`` (default) is the reference-
    parity partitioned-directory lake; ``bucketed`` routes the same
    batch through write_partitioned_upsert_bucketed (r14's measured
    backfill layout) — same upsert semantics, same watermark protocol
    (the writers return identical row counts; asserted equal in
    tests/test_pipeline_bucketed_flow.py)."""
    if writer == "bucketed":
        return write_partitioned_upsert_bucketed(
            spark,
            df,
            spec,
            bucketed_lake_table(spec.name),
            num_buckets=num_buckets,
            company=company,
            broadcast_batch=broadcast_batch,
        )
    if writer != "hive":
        raise ValueError(f"unknown writer mode: {writer!r}")
    return write_partitioned_upsert(
        spark, df, spec, lake_root, company, broadcast_batch=broadcast_batch
    )


def initial_load(
    spark: SparkSession,
    source_root: str,
    lake_root: str,
    tables: list[str],
    company: str = "Locaweb",
    writer: str = "hive",
    num_buckets: int = 32,
) -> RunResult:
    """Entry point 1 (gluejob.py:163-171): per-table CSV → lake.
    Missing CSV → log + continue (gluejob.py:167-169)."""
    result = RunResult("initial_load")
    for t in tables:
        spec = CATALOG[t]
        df = read_csv_table(
            spark, f"{source_root}/{spec.source_db}/{t}.csv", spec
        )
        if df is None:
            log.error("missing source file for %s — skipping", t)
            result.skipped.append(t)
            continue
        # full-table batches are backfill-shaped by definition: take
        # the sort-merge arm — force-broadcasting every key of a
        # 100M-row table would blow the 8 GB broadcast limit on a
        # re-run over an existing lake (r13 review)
        result.tables[t] = _flow_write(
            spark, df, spec, lake_root, company, writer, num_buckets,
            broadcast_batch=False,
        )
    return result


def incremental(
    spark: SparkSession,
    source,
    lake_root: str,
    tables: list[str],
    store: WatermarkStore,
    company: str = "Locaweb",
    writer: str = "hive",
    num_buckets: int = 32,
) -> RunResult:
    """Entry point 2 (gluejob.py:157-161): per-table changed rows →
    partition-scoped upsert → in-memory watermark advance to the t0
    captured BEFORE any extraction (gluejob.py:616,136-139)."""
    t0 = source.clock(spark)
    result = RunResult("incremental")
    for t in tables:
        spec = CATALOG[t]
        df = source.read_table(spark, spec, store.get(t))
        if df is None:
            log.error("source read failed for %s — skipping", t)
            result.skipped.append(t)
            continue
        result.tables[t] = _flow_write(
            spark, df, spec, lake_root, company, writer, num_buckets,
            broadcast_batch=True,
        )
        store.advance(t, t0)
    return result


def run(
    spark: SparkSession,
    trigger_origin: str,
    job_mode: str,
    lake_root: str,
    store: WatermarkStore,
    source_root: str | None = None,
    source=None,
    company: str = "Locaweb",
    writer: str = "hive",
    num_buckets: int = 32,
) -> RunResult:
    """C1 flow dispatch (gluejob.py:144-155): OnDemand → initial load,
    Scheduled → incremental, anything else → explicit no-op
    (README.md:17). The watermark commit runs in every path, including
    the no-op — matching gluejob.py:623. ``writer`` selects the lake
    layout (hive partitioned dirs, or the bucketed catalog tables) —
    validated HERE, before any source I/O, so a typo fails fast at the
    dispatch altitude instead of after the first table's read."""
    if writer not in ("hive", "bucketed"):
        raise ValueError(f"unknown writer mode: {writer!r}")
    tables = tables_list(job_mode)  # C2; unknown mode → [] → no-op
    if trigger_origin == "OnDemand":
        result = initial_load(
            spark, source_root, lake_root, tables, company, writer,
            num_buckets,
        )
    elif trigger_origin == "Scheduled":
        result = incremental(
            spark, source, lake_root, tables, store, company, writer,
            num_buckets,
        )
    else:
        log.info("unmapped JobTriggerOrigin=%r — no-op", trigger_origin)
        result = RunResult("no-op")
    store.commit()
    return result


def forget_rows(
    spark: SparkSession,
    ids: DataFrame,
    spec: TableSpec,
    lake_root: str,
    company: str = "Locaweb",
) -> int:
    """Targeted physical deletion (right-to-be-forgotten / CCPA
    erasure): remove every lake row whose ``spec.id_col`` appears in
    ``ids``, rewriting ONLY the partitions that contain such rows.
    Returns the number of rows deleted. No reference counterpart —
    the reference lake has no deletion path at all; this is the
    erasure half of the K1 writer's contract.

    Scale shape (mirrors the partition-scoped upsert):
    - ``ids`` is joined as a FRAME (broadcast when erasure-request-
      sized, the normal case) — never collected into an ``isin``.
    - The touched (year, month) set comes from one semi-join projected
      to the partition columns; the collect is calendar-bounded.
    - Only touched partitions are scanned (partition-pruning
      predicate) and rewritten (dynamic overwrite); the rest of the
      lake — the overwhelming majority — is never read or written.
    - A partition whose every row is deleted produces NO output rows,
      which dynamic overwrite would silently leave in place — those
      directories are removed explicitly through the Hadoop FS API
      (works on local/HDFS/s3a alike).
    """
    ycol, mcol = f"{spec.name}_year", f"{spec.name}_month"
    root = lake_table_root(lake_root, spec.name)
    lake = read_parquet_table(spark, root)
    if lake is None:
        return 0
    # Scope to the requested company FIRST (partition-pruned): a
    # multi-company lake would otherwise contribute other companies'
    # (year, month) hits to `touched`, and the erasure below — which
    # only rewrites THIS company's directories — would report and
    # target partitions it never touches.
    lake = lake.filter(F.col("company") == company)
    key = ids.select(F.col(ids.columns[0]).alias(spec.id_col)).distinct()
    victims = lake.join(F.broadcast(key), spec.id_col, "left_semi")
    touched = [
        (r[0], r[1])
        for r in victims.select(ycol, mcol).distinct().collect()
    ]
    if not touched:
        return 0

    pred = _partition_predicate(ycol, mcol, touched)
    scoped = lake.filter(pred)
    survivors = scoped.join(F.broadcast(key), spec.id_col, "left_anti")
    n_before = scoped.count()
    # Which touched partitions still have rows AFTER the erasure —
    # resolved BEFORE the overwrite (the write mutates the path the
    # plan reads). Fully-erased partitions emit no output rows, so
    # dynamic overwrite leaves their old files in place; they're
    # removed explicitly below.
    kept = {
        (r[0], r[1])
        for r in survivors.select(ycol, mcol).distinct().collect()
    }

    obs = Observation(f"forget_{spec.name}")
    (
        survivors.observe(obs, F.count(F.lit(1)).alias("n"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("company", ycol, mcol)
        .parquet(root)
    )
    n_after = int(obs.get["n"])
    _remove_partition_dirs(
        spark,
        root,
        spec.name,
        company,
        [p for p in touched if p not in kept],
    )
    n = n_before - n_after
    log.info("forgot %d rows from %s across %d partitions",
             n, root, len(touched))
    return n


def apply_cdc_batch(
    spark: SparkSession,
    changes: DataFrame,
    spec: TableSpec,
    lake_root: str,
    op_col: str = "_op",
    company: str = "Locaweb",
) -> tuple[int, int]:
    """Apply one CDC change batch (Debezium-style) to the lake:
    ``changes`` carries the table columns plus ``op_col`` in
    {'I','U','D'} (case-insensitive). Inserts/updates merge through
    the K1 partition-scoped upsert; deletes erase through
    ``forget_rows``. Returns (rows_upserted, rows_deleted).

    Ordering semantics: WITHIN one batch a key that is both upserted
    and deleted resolves to its LAST change by ``spec.wm_col`` order
    (ties: delete wins — the conservative reading for erasure
    requests). A delete with a NULL watermark — the normal shape for
    Debezium-style tombstones, which carry no payload — is treated as
    newest-in-batch and wins over any upsert for its key: the
    alternative (nulls-last) silently discards the erasure, the worst
    failure mode for a right-to-be-forgotten path. Null-wm UPSERTS
    keep losing to any dated change (no evidence of recency). That
    pre-resolution happens on the batch alone (one batch-sized
    window), so the lake never sees a transient state.

    Scale shape: both arms stay partition-scoped — the upsert touches
    only partitions the surviving upserts land in, the erasure only
    partitions holding the deleted keys; the batch scans once into
    two frames off one persisted input.
    """
    op = F.upper(F.col(op_col))
    changes = changes.persist()
    try:
        # Fail LOUD on unknown/null ops: upper(NULL) is NULL, so a
        # malformed row would otherwise satisfy neither the upsert nor
        # the delete filter and vanish without a trace; and a Debezium
        # 't' (truncate) silently upserted would corrupt the lake.
        # r16: the bad-op probe and the any-deletes probe ride ONE
        # aggregation over the persisted batch (this action also
        # materializes the persist) — previously the op check, the
        # deletes.limit(1) probe, and the persist materialization were
        # three separate action barriers per micro-batch.
        stats = changes.agg(
            F.collect_set(
                F.when(
                    ~op.isin("I", "U", "D") | op.isNull(),
                    F.coalesce(op, F.lit("<null>")),
                )
            ).alias("bad"),
            F.count(F.when(op == "D", 1)).alias("n_raw_deletes"),
        ).first()
        if stats["bad"]:
            raise ValueError(
                f"apply_cdc_batch: unsupported ops {sorted(stats['bad'])}"
                " (expected I/U/D)"
            )
        # last-change-wins per key (delete beats upsert on a tie);
        # final key: full-row hash, so two equal-watermark upserts
        # with different payloads resolve identically on every run
        # and partitioning (the run_doc_dedup_ingest tie-break
        # convention) instead of leaving an arbitrary winner
        payload_cols = [c for c in changes.columns if c != spec.id_col]
        w = Window.partitionBy(spec.id_col).orderBy(
            # null-wm DELETES first (tombstones without payload must
            # not lose the erasure — see docstring); then latest wm,
            # nulls last (an undated upsert never beats a dated one)
            F.when(
                (op == "D") & F.col(spec.wm_col).isNull(), 0
            ).otherwise(1),
            F.col(spec.wm_col).desc_nulls_last(),
            F.when(op == "D", 0).otherwise(1),
            F.xxhash64(
                *[F.col(c).cast("string") for c in payload_cols]
            ).asc_nulls_last(),
        )
        latest = (
            changes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        upserts = latest.filter(op != "D").select(*spec.columns)
        deletes = latest.filter(op == "D").select(spec.id_col)
        ycol, mcol = f"{spec.name}_year", f"{spec.name}_month"
        # count the CHANGE rows applied, not the writer's merged-rows
        # return (which includes surviving lake rows of touched
        # partitions); cheap — the batch is persisted above
        n_up = upserts.count()
        if n_up == 0:
            # pure-erasure batch: the fused write needs batch rows to
            # flow through its Observation — forget_rows IS the fused
            # plan minus the merge
            n_del = forget_rows(
                spark, deletes, spec, lake_root, company=company
            )
            return 0, n_del
        # Fused apply: discover the delete victims' partitions and row
        # count in ONE aggregation over the company-scoped lake, then
        # run a SINGLE partition-scoped rewrite that merges the
        # upserts AND anti-joins the deleted keys — one lake read and
        # one write where upsert-then-forget_rows paid two of each on
        # overlapping partitions (r9 steady-state CDC cost, PLANS.md).
        n_del = 0
        delete_touched: list[tuple] = []
        del_keys = None
        lake = read_parquet_table(
            spark, lake_table_root(lake_root, spec.name)
        )
        # n_raw_deletes > 0 is a superset probe for "any deletes
        # survive the window" (a surviving delete implies a raw D
        # row); the rare all-D-rows-lost batch just runs an empty
        # victims aggregation, same result as the old limit(1) probe.
        if lake is not None and stats["n_raw_deletes"] > 0:
            del_keys = deletes.distinct()
            victims = (
                lake.filter(F.col("company") == company)
                .join(F.broadcast(del_keys), spec.id_col, "left_semi")
                .groupBy(ycol, mcol)
                .agg(F.count("*").alias("n"))
                .collect()
            )
            n_del = sum(r["n"] for r in victims)
            delete_touched = [(r[0], r[1]) for r in victims]
        write_partitioned_upsert(
            spark,
            upserts,
            spec,
            lake_root,
            company=company,
            delete_keys=del_keys if delete_touched else None,
            delete_touched=delete_touched,
        )
        return n_up, n_del
    finally:
        changes.unpersist()
