"""Training-data preparation operators over ``documents``: dataset
split assignment, text normalization, and sequence packing — the
pipeline stages between a cleaned corpus and a tokenizer.

All deterministic and engine-portable:
- Split assignment hashes the KEY (md5 → first byte → mod 10), never
  ``rand()`` — the same document lands in the same split on every
  engine, every run, any partitioning. This is how reproducible
  train/val/test splits survive a distributed shuffle.
- Normalization is three regexp passes with identical semantics in
  Spark and DuckDB.
- Sequence packing assigns each document to a fixed-capacity pack by
  running-token-count: pack_id = floor(tokens_before_me / CAP) over a
  deterministic (doc_id) order. One window shuffle; the greedy
  never-split-a-doc variant would be sequential, this banded form is
  the distributed equivalent (a doc may straddle a boundary; real
  packers slice it — slicing is a map over this assignment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._util import load

PACK_TOKENS = 2048
SPLIT_BUCKETS = 10
VAL_BUCKET = 8
TEST_BUCKET = 9


def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment: bucket = first md5
    byte of the doc id, mod 10 → 80/10/10. Map-only."""
    docs = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10)
        .cast("int")
        % SPLIT_BUCKETS
    )
    split = (
        F.when(bucket == VAL_BUCKET, "val")
        .when(bucket == TEST_BUCKET, "test")
        .otherwise("train")
    )
    return docs.select(
        "doc_id", bucket.alias("bucket"), split.alias("split")
    )


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cleaning pass: lowercase → non-alphanumeric → space → collapse
    runs → trim. Emits the normalized text hash + lengths (hash keeps
    the differential compare row-size bounded)."""
    docs = load(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return docs.select(
        "doc_id",
        F.md5(norm).alias("norm_md5"),
        F.length("text").alias("raw_len"),
        F.length(norm).alias("norm_len"),
    )


PACK_BLOCK = 1000  # docs per prefix-sum block


def q_seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: documents assigned to 2048-token packs by
    running token count over doc_id order. Output is the pack manifest
    (doc → pack, offset within pack).

    Distributed prefix sum, NOT a global-order window (which is a
    single reducer): phase 1 computes within-block running sums with a
    window partitioned by block id (parallel); phase 2 aggregates one
    total per block (rows = #blocks) and broadcasts the running block
    offsets back. Identical result to the sequential scan at any
    partitioning."""
    docs = load(spark, sf_dir, "documents")
    toks = F.size(F.split(F.col("text"), " "))
    t = docs.select(
        "doc_id",
        toks.alias("n_tokens"),
        F.floor(F.col("doc_id") / PACK_BLOCK).alias("_blk"),
    )
    in_blk = Window.partitionBy("_blk").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    local = t.withColumn(
        "_local_before", F.coalesce(F.sum("n_tokens").over(in_blk), F.lit(0))
    )
    blk_running = Window.orderBy("_blk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # One row per block — the only global-order window runs over
    # #blocks rows, not #docs.
    offsets = (
        t.groupBy("_blk")
        .agg(F.sum("n_tokens").alias("_blk_total"))
        .withColumn(
            "_blk_before",
            F.coalesce(F.sum("_blk_total").over(blk_running), F.lit(0)),
        )
        .select("_blk", "_blk_before")
    )
    return (
        local.join(F.broadcast(offsets), "_blk", "inner")
        .withColumn(
            "tokens_before", F.col("_blk_before") + F.col("_local_before")
        )
        .select(
            "doc_id",
            "n_tokens",
            "tokens_before",
            F.floor(F.col("tokens_before") / PACK_TOKENS).alias("pack_id"),
            (F.col("tokens_before") % PACK_TOKENS).alias("pack_offset"),
        )
    )


SAMPLE_PCT = 20


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: ~20% of documents PER LANGUAGE
    stratum, selected by key hash (md5 of "lang:doc_id" mod 100) — not
    rand(), so the sample is identical on any engine, run, and
    partitioning. Map-only; the count-per-stratum output makes the
    stratification observable."""
    docs = load(spark, sf_dir, "documents")
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("lang"), F.col("doc_id"))), 1, 4
            ),
            16,
            10,
        ).cast("int")
        % 100
    )
    return (
        docs.filter(h < SAMPLE_PCT)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


# q_seq_pack deliberately first: the driver's gate records at most 50
# queries in dict-insertion order, and q_seq_pack sat unverified at
# position 51 for two rounds (CORRECTNESS_r02/r03).
QUERIES = {
    "q_seq_pack": q_seq_pack,
    "q_split_assign": q_split_assign,
    "q_stratified_sample": q_stratified_sample,
    "q_text_normalize": q_text_normalize,
}

ORACLES = {
    "q_stratified_sample": f"""
        SELECT lang, count(*) AS n_sampled,
               min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
        FROM documents
        WHERE ('0x' || substr(md5(lang || ':' || doc_id::VARCHAR), 1, 4))::INT
              % 100 < {SAMPLE_PCT}
        GROUP BY lang
    """,
    "q_split_assign": f"""
        WITH b AS (
            SELECT doc_id,
                   ('0x' || substr(md5(doc_id::VARCHAR), 1, 2))::INT
                       % {SPLIT_BUCKETS} AS bucket
            FROM documents)
        SELECT doc_id, bucket,
               CASE WHEN bucket = {VAL_BUCKET} THEN 'val'
                    WHEN bucket = {TEST_BUCKET} THEN 'test'
                    ELSE 'train' END AS split
        FROM b
    """,
    "q_text_normalize": """
        WITH n AS (
            SELECT doc_id, text,
                   trim(regexp_replace(
                       regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                       ' +', ' ', 'g')) AS norm
            FROM documents)
        SELECT doc_id, md5(norm) AS norm_md5,
               length(text) AS raw_len, length(norm) AS norm_len
        FROM n
    """,
    # DuckDB sum(BIGINT) widens to HUGEINT, which hash-mismatches the
    # Spark BIGINT column even when values are identical (same artifact
    # class that bit q_json_extract in r2/r3) — cast the running sum and
    # everything derived from it back to BIGINT.
    "q_seq_pack": f"""
        WITH t AS (
            SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
            FROM documents),
        c AS (
            SELECT doc_id, n_tokens,
                   CAST(COALESCE(sum(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS tokens_before
            FROM t)
        SELECT doc_id, n_tokens, tokens_before,
               CAST(floor(tokens_before / {PACK_TOKENS}) AS BIGINT) AS pack_id,
               CAST(tokens_before % {PACK_TOKENS} AS BIGINT) AS pack_offset
        FROM c
    """,
}
