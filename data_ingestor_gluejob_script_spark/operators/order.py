"""Distributed global ordering primitives.

``row_number() OVER (ORDER BY …)`` with no ``PARTITION BY`` is the
classic Spark scale trap: the whole input funnels through ONE task for
a global sort (the package-wide guard in tests/test_plans.py exists to
keep it out of this engine). But exact global row numbers ARE needed —
dense vocabulary ids, sampling indexes, stable export ordering — so
this module provides the distributed equivalent:

1. ``repartitionByRange`` on the order columns: a sampled range
   shuffle (the same machinery as a distributed sort) puts every row
   of partition *i* before every row of partition *i+1*;
2. ``row_number`` windowed BY PARTITION ID — parallel, each task ranks
   only its own range;
3. per-partition COUNTS (rows = #partitions, metadata-sized) get a
   running-sum offset via the only global-order window in the plan,
   then broadcast back.

Where the range bounds land does not affect the result — only which
task computes which slice — so the output is deterministic whenever
the order columns form a total order (add a tiebreaker column
otherwise, exactly as with SQL ``row_number``). This generalizes the
numeric-block prefix sum used by ``seq_pack_frame`` /
``corpusstats._dense_index`` to ARBITRARY orderings (descending
counts, strings, compound keys) at the cost of one extra (range)
shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame, order_cols: list[Column | str], out_col: str = "row_id"
) -> DataFrame:
    """``df`` + ``out_col`` = exact 1-based global row number under
    ``order_cols`` — identical to ``row_number() OVER (ORDER BY …)``
    but with no single-reducer stage (see module docstring for the
    shape). The order should be total for a deterministic numbering.

    The range-partitioned frame is ``localCheckpoint``-ed: the local
    ranks and the per-partition counts are two consumers of the same
    exchange, and RangePartitioner samples its bounds per
    materialization — two independent executions can place rows in
    DIFFERENT partitions, silently misaligning offsets with ranks
    (caught by test_tokenizer.py). Checkpointing pins one
    materialization both branches read. The cost is one pass of
    executor storage over the input — fine for the intended
    vocabulary/sample/manifest-scale frames; to number a full 100 TB
    corpus, prefer sorting on write and deriving ids from file+offset.
    """
    reserved = {"_pid", "_local", "_before"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"global_row_number: input columns collide with internal "
            f"names {sorted(reserved)}; rename them first"
        )
    n = df.sparkSession.sparkContext.defaultParallelism
    part = df.repartitionByRange(n, *order_cols).localCheckpoint()
    with_pid = part.withColumn("_pid", F.spark_partition_id())
    in_part = Window.partitionBy("_pid").orderBy(*order_cols)
    local = with_pid.withColumn("_local", F.row_number().over(in_part))
    pid_running = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        with_pid.groupBy("_pid")
        .agg(F.count("*").alias("_n"))
        .withColumn(
            "_before", F.coalesce(F.sum("_n").over(pid_running), F.lit(0))
        )
        .select("_pid", "_before")
    )
    return (
        local.join(F.broadcast(offsets), "_pid", "inner")
        .withColumn(out_col, (F.col("_before") + F.col("_local")).cast("long"))
        .drop("_pid", "_local", "_before")
    )


def block_prefix_offsets(
    counts: DataFrame,
    id_col: str = "doc_id",
    n_col: str = "n_tokens",
    block: int = 1000,
) -> DataFrame:
    """(id, n, tokens_before): exact running sum of ``n_col`` in
    ``id_col`` order — the numeric-id specialization of the module's
    prefix-sum shape, shared by ``traindata.seq_pack_frame``
    (whitespace token counts) and ``queries.bpe.bpe_pack_token_stream``
    (subword counts). Phase 1: within-block running sums via a window
    PARTITIONED by ``floor(id / block)`` (parallel); phase 2: one
    global-order window over per-block TOTALS (#blocks rows, never the
    corpus) broadcast back as offsets. Identical to the sequential
    scan at any partitioning. ``id_col`` must be numeric (the block id
    is a division) and unique per row; NULL-id rows are EXCLUDED — a
    null has no place in the global order, and counting its tokens
    into later documents' offsets while the id-keyed join back drops
    its rows would leave permanent holes in the packed stream (review
    finding, repro'd: a null-id doc produced an underfull pack with a
    phantom gap). Both pack-stream consumers therefore see a stream
    over non-null-id documents only."""
    t = counts.filter(F.col(id_col).isNotNull()).select(
        id_col,
        n_col,
        F.floor(F.col(id_col) / block).alias("_blk"),
    )
    in_blk = Window.partitionBy("_blk").orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    local = t.withColumn(
        "_local_before", F.coalesce(F.sum(n_col).over(in_blk), F.lit(0))
    )
    blk_running = Window.orderBy("_blk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        t.groupBy("_blk")
        .agg(F.sum(n_col).alias("_blk_total"))
        .withColumn(
            "_blk_before",
            F.coalesce(F.sum("_blk_total").over(blk_running), F.lit(0)),
        )
        .select("_blk", "_blk_before")
    )
    return (
        local.join(F.broadcast(offsets), "_blk", "inner")
        .withColumn(
            "tokens_before",
            F.col("_blk_before") + F.col("_local_before"),
        )
        .select(id_col, n_col, "tokens_before")
    )
