"""SparkSession factory.

One place to encode the execution-model choices that matter at 100 TB:
AQE (runtime re-planning, skew-join splitting, partition coalescing),
UTC session timezone (oracle comparability; the reference never pins a
timezone and relies on the Glue driver's clock, gluejob.py:78-83),
snappy parquet (gluejob.py:201), and a shuffle-partition count sized to
the machine rather than Spark's 200 default.
"""

from __future__ import annotations

import getpass
import os
import tempfile

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "data-ingestor-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    In tests/bench this is local mode; on a real cluster the same config
    block applies — AQE owns runtime partition sizing so the static
    ``shuffle.partitions`` value is only the pre-AQE upper bound.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    try:
        user = getpass.getuser()
    except Exception:  # noqa: BLE001 — no USER/LOGNAME in the env
        user = str(os.getuid()) if hasattr(os, "getuid") else "shared"

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Start shuffles WIDE and let AQE coalesce down: the static
        # shuffle_partitions (=cpus) is the right POST-coalesce
        # target, but as the pre-AQE width it caps big joins at
        # ~|input|/cpus rows per reducer and spills (round-11 sf10
        # smoke: the 60M-row full-outer diff ran 63.5 s at width 32,
        # 29.5 s at 256 — AQE still coalesces sf0.1's tiny shuffles
        # to a handful of partitions either way). At 100 TB the same
        # principle holds with bigger numbers: initial width scales
        # with the cluster, AQE owns the merge.
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(max(256, shuffle_partitions * 8)),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # Testdata events.ts has shipped as both TIMESTAMP(NANOS) and
        # timestamp[us] across regenerations; nanosAsLong keeps the
        # NANOS encoding readable (as long) without mid-query conf
        # mutation and is a no-op for non-nanos files. The per-read
        # normalization lives in queries/_util.read_events.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        # Managed-table scratch (e.g. the fuzzy join's bucketed
        # variant table) belongs in temp space, not a ./spark-warehouse
        # dir inside whatever cwd launched the job. Per-user suffix:
        # on a multi-user host a fixed shared path is owned by
        # whoever ran first, and other users' managed-table writes
        # (fixed table names like bucketed_3hop's) fail or collide.
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE")
            or os.path.join(
                tempfile.gettempdir(), f"spark-graft-warehouse-{user}"
            ),
        )
        # Only effective when THIS call launches the JVM — getOrCreate
        # against an already-running session keeps its original heap.
        # For spark-submit deployments set it on the submit command.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # Generated-class cache (static conf, default 100 entries).
        # r17, measured: a driver that runs MANY distinct plans in one
        # JVM — this engine's inventory is 120 benched paths; a
        # production deployment is a long-lived job server — thrashes
        # the 100-entry LRU, and every query pays Janino recompilation
        # of its WholeStageCodegen fragments on each resubmission. The
        # deepest plan is hit hardest: q_ngram_jaccard_pairs inside
        # its 10-query bench batch measured 2.22 s best-of-5 at the
        # default vs 1.41 s at 5000 (same night, same batch, same
        # code; the r16 "regression" the r16 verdict ranked #1 was
        # exactly this cliff — the batch's fragment population crossed
        # 100 entries). Cost: cached compiled classes on the driver
        # heap, tens of MB at this setting — scale-independent, so the
        # same value is right at 100 TB. Env-overridable for A/B.
        .config(
            "spark.sql.codegen.cache.maxEntries",
            os.environ.get("SPARK_GRAFT_CODEGEN_CACHE", "5000"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def pin_storage_level():
    """StorageLevel for corpus-sized frame pins (r16 verdict #7).

    The single-evaluation fixes in ``operators/graph`` and
    ``queries/similarity`` pin corpus-sized frames (candidate-pair
    edge plans, tagged embedding frames) with ``localCheckpoint``.
    The default level, MEMORY_AND_DISK, is right for local/bench runs
    — the pinned partitions are small and a memory hit makes the
    immediate re-reads cheap — but at 100 TB those frames compete
    with execution memory in every executor (guide §5: cached data vs
    execution memory). ``SPARK_GRAFT_PIN_LEVEL=DISK_ONLY`` (or any
    ``StorageLevel`` attribute name, e.g. MEMORY_AND_DISK_SER)
    switches every such pin to a level that stays out of the
    execution pool, the same choice fuzzyjoin's staged passes already
    hard-code. Unset → None → pyspark's localCheckpoint default,
    byte-identical behavior to r16."""
    from pyspark import StorageLevel

    name = os.environ.get("SPARK_GRAFT_PIN_LEVEL", "").strip()
    if not name:
        return None
    level = getattr(StorageLevel, name, None)
    if level is None:
        raise ValueError(
            f"SPARK_GRAFT_PIN_LEVEL={name!r} is not a StorageLevel "
            "attribute (try DISK_ONLY or MEMORY_AND_DISK_SER)"
        )
    return level


def pin(df):
    """``localCheckpoint`` at the configured pin level — one seam for
    every corpus-sized pin; see :func:`pin_storage_level`."""
    level = pin_storage_level()
    if level is None:
        return df.localCheckpoint()
    return df.localCheckpoint(storageLevel=level)
