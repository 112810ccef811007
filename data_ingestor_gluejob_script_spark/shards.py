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
) -> DataFrame:
    """Write ``df`` under ``out_dir``/shards as range-ordered,
    size-bounded parquet files and ``out_dir``/manifest as the shard
    manifest; returns the manifest frame (shard, n_rows, min_key,
    max_key[, n_tokens]) ordered by min_key.

    Determinism: rows are range-partitioned AND sorted by
    ``shard_key``, so each file covers a contiguous key interval and
    intervals only touch at equal boundary keys — asserted in
    tests/test_shards.py along with row conservation and the
    per-file record bound."""
    spark = df.sparkSession
    shards_dir = os.path.join(out_dir, "shards")
    manifest_dir = os.path.join(out_dir, "manifest")
    (
        df.repartitionByRange(F.col(shard_key))
        .sortWithinPartitions(shard_key)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(shards_dir)
    )
    back = spark.read.parquet(shards_dir)
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
) -> DataFrame:
    """Loader side: read the shard set, optionally pruned to a key
    range. The filter reaches the parquet scan (min/max footer stats
    skip whole files — the ranges are contiguous by construction), so
    a [a,b) read touches only the shards the manifest says it must."""
    df = spark.read.parquet(os.path.join(out_dir, "shards"))
    if key_range is not None:
        lo, hi = key_range
        df = df.filter(
            (F.col(shard_key) >= lo) & (F.col(shard_key) < hi)
        )
    return df
