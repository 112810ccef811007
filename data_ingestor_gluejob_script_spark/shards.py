"""Training-shard export: the last step of the curation pipeline —
materialize a (packed) training frame as size-bounded parquet shards
plus a manifest table a training loader can consume (shard path, row
count, key range, token count). Reference parity note: the reference
writes one parquet object per lake partition (gluejob.py:187) and has
no export/manifest surface; this is north-star extension surface
closing the corpus → packs → files-on-disk loop.

Scale shape:
- ONE range shuffle on the shard key orders the corpus globally, so
  shard files tile the key space (a loader reading shards in manifest
  order replays the pack sequence; a loader wanting packs [a,b) prunes
  by key range).
- ``maxRecordsPerFile`` bounds every file WITHOUT a second shuffle —
  the writer rolls to a new file mid-task, which is how 100 TB jobs
  avoid both 10 GB mega-files and the small-file problem (choose
  max_records ≈ target_file_bytes / avg_row_bytes).
- The manifest derives from ONE read-back pass grouped by
  ``input_file_name()`` — no driver-side file listing or per-file
  loops; at scale this is a columnar scan of the key/token columns
  only (Catalyst prunes the rest).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    shard_key: str = "pack_id",
    max_records_per_file: int = 250_000,
    token_col: str | None = None,
    fmt: str = "parquet",
    compression: str | None = None,
) -> DataFrame:
    """Write ``df`` under ``out_dir``/shards as range-ordered,
    size-bounded files and ``out_dir``/manifest as the shard
    manifest; returns the manifest frame (shard, n_rows, min_key,
    max_key[, n_tokens]) ordered by min_key.

    ``fmt='parquet'`` (default) is the native lake format;
    ``fmt='jsonl'`` writes gzipped JSON-lines shards — the common
    interchange format training loaders outside the Spark world
    consume (symmetric with ``sources.read_jsonl_quarantine`` on the
    ingest side). The manifest read-back declares ``df``'s schema
    explicitly for jsonl, so deriving the manifest never pays a
    schema-inference pass over the export.

    Determinism: rows are range-partitioned AND sorted by
    ``shard_key``, so each file covers a contiguous key interval and
    intervals only touch at equal boundary keys — asserted in
    tests/test_shards.py along with row conservation and the
    per-file record bound."""
    if fmt not in ("parquet", "jsonl"):
        raise ValueError(f"fmt must be 'parquet' or 'jsonl', got {fmt!r}")
    spark = df.sparkSession
    shards_dir = os.path.join(out_dir, "shards")
    manifest_dir = os.path.join(out_dir, "manifest")
    writer = (
        df.repartitionByRange(F.col(shard_key))
        .sortWithinPartitions(shard_key)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
    )
    if fmt == "parquet":
        if compression is not None:
            writer = writer.option("compression", compression)
        writer.parquet(shards_dir)
        back = spark.read.parquet(shards_dir)
    else:
        writer.option("compression", compression or "gzip").json(shards_dir)
        back = spark.read.schema(df.schema).json(shards_dir)
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.min(shard_key).alias("min_key"),
        F.max(shard_key).alias("max_key"),
    ]
    if token_col is not None:
        aggs.append(F.sum(token_col).cast("long").alias("n_tokens"))
    manifest = (
        back.groupBy(
            F.element_at(
                F.split(F.input_file_name(), "/"), -1
            ).alias("shard")
        )
        .agg(*aggs)
        .orderBy("min_key", "shard")
    )
    manifest.write.mode("overwrite").parquet(manifest_dir)
    return spark.read.parquet(manifest_dir).orderBy("min_key", "shard")


def read_training_shards(
    spark: SparkSession,
    out_dir: str,
    key_range: tuple[int, int] | None = None,
    shard_key: str = "pack_id",
    fmt: str = "parquet",
    schema=None,
) -> DataFrame:
    """Loader side: read the shard set, optionally pruned to a key
    range. For parquet the filter reaches the scan (min/max footer
    stats skip whole files — the ranges are contiguous by
    construction). JSONL files have no footer stats, so pruning is
    MANIFEST-driven instead: only the shard files whose manifest
    [min_key, max_key] interval overlaps the range are even opened
    (``select_shard_paths``); the row filter still applies on top for
    the boundary shards. ``schema`` (DDL or StructType) skips json
    schema inference; required for a production jsonl load."""
    shards_dir = os.path.join(out_dir, "shards")
    if fmt == "parquet":
        df = spark.read.parquet(shards_dir)
    else:
        paths = (
            select_shard_paths(spark, out_dir, key_range)
            if key_range is not None
            else [shards_dir]
        )
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        if not paths:  # empty overlap: nothing to open
            if schema is None:
                paths = [shards_dir]  # schema via inference, 0 rows after filter
            else:
                return spark.createDataFrame([], schema)
        df = reader.json(paths)
    if key_range is not None:
        lo, hi = key_range
        df = df.filter(
            (F.col(shard_key) >= lo) & (F.col(shard_key) < hi)
        )
    return df


def select_shard_paths(
    spark: SparkSession, out_dir: str, key_range: tuple[int, int]
) -> list[str]:
    """Shard file paths whose manifest key interval overlaps
    [lo, hi) — the manifest is shard-count-sized, so collecting it is
    a metadata read, the same class as the touched-partition list in
    pipeline.py. Returns [] -> caller reads nothing."""
    lo, hi = key_range
    manifest = spark.read.parquet(os.path.join(out_dir, "manifest"))
    rows = (
        manifest.filter(
            (F.col("max_key") >= lo) & (F.col("min_key") < hi)
        )
        .select("shard")
        .collect()
    )
    return [
        os.path.join(out_dir, "shards", r["shard"]) for r in rows
    ]
