"""spread() phantom-split detection (r15): a corpus of a few
sub-128MB single-row-group parquet files gets PLANNED as many
byte-range splits, but only ranges containing a row-group start yield
rows — real parallelism equals the file count. Measured 4.5× on the
MinHash signature pass (SCALE.md r15). spread() must repartition in
that regime and stay a no-op for well-split inputs."""

from __future__ import annotations

import sys
from pathlib import Path

import pyspark.sql.functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_ingestor_gluejob_script_spark.queries._util import spread  # noqa: E402


def _fat_rows(spark, n=120_000):
    # ~500 bytes/row -> ~60 MB raw, tens of MB as parquet
    pad = F.concat(*[F.md5(F.concat(F.col("id").cast("string"),
                                    F.lit(str(i)))) for i in range(16)])
    return spark.range(n).select("id", pad.alias("pad"))


def test_spread_repartitions_phantom_split_files(spark, tmp_path):
    path = str(tmp_path / "two_files")
    _fat_rows(spark).repartition(2).write.parquet(path)
    df = spark.read.parquet(path)
    planned = df.rdd.getNumPartitions()
    par = spark.sparkContext.defaultParallelism
    # setup premise: the planner slices the 2 files into enough
    # byte ranges that the OLD split-count rule would call this
    # "well-split" — only 2 of them can actually yield rows
    assert planned * 2 >= par, planned
    assert len(df.inputFiles()) == 2
    out = spread(spark, df)
    assert out.rdd.getNumPartitions() == par


def test_spread_noop_for_well_split_input(spark, tmp_path):
    path = str(tmp_path / "many_files")
    n_files = spark.sparkContext.defaultParallelism
    _fat_rows(spark).repartition(n_files).write.parquet(path)
    df = spark.read.parquet(path)
    assert len(df.inputFiles()) == n_files
    assert spread(spark, df) is df
