"""Hashed linear quality classifier — the fastText/CCNet-style model
scoring stage of a training-data pipeline, expressed as pure Catalyst
expressions so a 100 TB corpus is scored in one map + one shuffle.

A document's features are its tokens hashed into 2^HASH_BITS buckets
(feature hashing, Weinberger et al. 2009); the model is a (bucket,
weight) table; the score is sigmoid(sum(tf * w) / n_tokens + bias).
The bucket hash is crc32 (``F.crc32`` JVM-side == ``zlib.crc32``
python-side, bit-identical), so the pytest oracle re-derives every
score in pure python with no Spark-hash round-trip.

Scale shape: the weight table is model-sized (≤2^HASH_BITS rows ≪
corpus) → broadcast join onto the exploded token stream; the corpus
then shuffles ONCE on doc_id with partial aggregation (sum of tf*w
combines map-side). Buckets the model never saw contribute 0 via the
left join's null coalesce — exactly the sparse-dot-product semantics.
The stand-in weight table is derived deterministically from the bucket
id (a real model drops in as any (bucket, weight) DataFrame, e.g. read
from the trainer's export).

Not driver-registered (inventory pinned at 50); differential-tested in
tests/test_classifier.py, benched as x_quality_classifier.
"""

from __future__ import annotations

import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HASH_BITS = 16
N_BUCKETS = 1 << HASH_BITS
DEFAULT_BIAS = -0.2


def bucket_of(token: str) -> int:
    """Python twin of the JVM-side bucket expression (oracle use)."""
    return zlib.crc32(token.encode("utf-8")) % N_BUCKETS


def standin_weights(spark: SparkSession) -> DataFrame:
    """Deterministic stand-in model covering the FULL bucket space
    (2^16 rows — still a trivially broadcastable model table), weight
    a dyadic rational in [-0.5, 0.5) derived from the bucket id.
    Dyadic weights make the distributed sum bit-exact regardless of
    aggregation order (see tests/test_classifier.py); a real exported
    model replaces this frame wholesale."""
    return spark.range(N_BUCKETS).select(
        F.col("id").alias("bucket"),
        (((F.col("id") * 2654435761) % 1024) / 1024.0 - 0.5).alias("weight"),
    )


def standin_weight_of(bucket: int) -> float:
    """Python twin of standin_weights (oracle use)."""
    return ((bucket * 2654435761) % 1024) / 1024.0 - 0.5


def weights_from_tokens(token_weights: DataFrame) -> DataFrame:
    """(token, weight) → the (bucket, weight) model frame the scorer
    consumes: tokens are hashed into the classifier's bucket space
    JVM-side (same crc32 expression the scorer uses, so a token's
    weight lands exactly where its occurrences will look it up) and
    collision weights are SUMMED — the standard feature-hashing
    treatment (Weinberger et al. 2009: collisions add, they don't
    overwrite). One aggregation over a model-sized frame."""
    return (
        token_weights.select(
            (F.crc32(F.col("token").cast("binary")) % F.lit(N_BUCKETS))
            .alias("bucket"),
            F.col("weight").cast("double").alias("weight"),
        )
        .groupBy("bucket")
        .agg(F.sum("weight").alias("weight"))
    )


def load_weights_text(spark: SparkSession, path: str) -> DataFrame:
    """Load a real exported weight table from a fastText-.vec-style
    text file: one ``<token> <weight>`` pair per line (any whitespace
    separator). A ``<n_words> <dim>``-shaped header (both fields bare
    non-negative integers) is skipped ONLY when it is the file's
    FIRST line — a real export has exactly one header, so legitimate
    vocabulary entries that merely look header-ish ('1984 2') or
    start with '#' ('#hashtag 0.3') anywhere else in the file load
    normally (pattern-filtering every line dropped them — round-10
    advice finding). Lines without exactly two fields (blanks, prose
    comments) fall out of the field-count filter. Returns the
    (bucket, weight) frame — ``classifier_score_frame`` and
    ``run_scored_ingest`` take it with no operator changes; this is
    the swap seam the deterministic ``standin_weights`` stands in
    for. The read is distributed; ``zipWithIndex`` (one extra count
    job over a model-sized file) pins line numbers so the header
    test is positional, not content-global."""
    lines = spark.sparkContext.textFile(path).zipWithIndex()
    raw = spark.createDataFrame(lines, "value string, line_no long")
    parts = F.split(F.trim(F.col("value")), r"\s+")
    is_header = (
        (F.col("line_no") == 0)
        & (F.size("p") == 2)
        & F.element_at("p", 1).rlike("^[0-9]+$")
        & F.element_at("p", 2).rlike("^[0-9]+$")
    )
    tw = (
        raw.select(parts.alias("p"), "line_no")
        .filter((F.size("p") == 2) & ~is_header)
        .select(
            F.element_at("p", 1).alias("token"),
            F.element_at("p", 2).cast("double").alias("weight"),
        )
        .filter(F.col("weight").isNotNull())
    )
    return weights_from_tokens(tw)


def classifier_score_frame(
    docs: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    bias: float = DEFAULT_BIAS,
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document with the hashed linear model. Returns
    (doc_id, n_tokens, logit, score) where
    logit = sum_over_tokens(weight[bucket(token)]) / n_tokens + bias
    and score = sigmoid(logit), rounded to 6 dp for oracle-stable
    comparison. Token-less documents (empty text still tokenizes to
    one "" token under split-on-space — same convention as the token
    counters) score through the same formula, so every input row
    appears in the output.

    Plan: map (split + explode + crc32 % 2^bits) → broadcast-left-join
    the weight table → groupBy(doc_id) partial-aggregated sum. One
    shuffle, keyed by doc_id.
    """
    toks = docs.select(
        id_col,
        # NULL text scores as empty text: split(NULL) is a NULL array
        # whose explode emits nothing, which would silently drop the
        # document from the scores — breaking the every-row contract
        F.explode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
        ).alias("tok"),
    ).select(
        id_col,
        (F.crc32(F.col("tok").cast("binary")) % F.lit(N_BUCKETS)).alias(
            "bucket"
        ),
    )
    joined = toks.join(F.broadcast(weights), "bucket", "left")
    # groupBy pools rows sharing an id (including all-NULL ids) into
    # ONE score row — callers wanting per-row scores must supply
    # unique ids
    agg = joined.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.coalesce(F.col("weight"), F.lit(0.0))).alias("_wsum"),
    )
    logit = F.col("_wsum") / F.col("n_tokens") + F.lit(bias)
    return agg.select(
        id_col,
        "n_tokens",
        F.round(logit, 6).alias("logit"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6).alias("score"),
    )


def quality_partition(
    docs: DataFrame,
    weights: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Composable keep/drop form: the input rows plus a ``keep``
    flag (score >= threshold), via a broadcast-free semi-join-shaped
    inner join of the score frame back onto the docs — the scored ids
    are corpus-sized, so the join shuffles both sides on doc_id (the
    same key the score aggregation just produced, so AQE reuses the
    partitioning on the score side). The join is null-SAFE on the id:
    the scorer deliberately scores null-id documents (pooled into one
    score row), and a plain equi-join would silently drop them from
    the output, breaking batch-parity with ``run_scored_ingest``
    (round-9 advice finding) — each null-id doc row gets the pooled
    keep flag, matching the streaming twin."""
    scores = classifier_score_frame(docs, weights, text_col).select(
        F.col("doc_id").alias("_score_id"),
        (F.col("score") >= threshold).alias("keep"),
    )
    return docs.join(
        scores, F.col("doc_id").eqNullSafe(F.col("_score_id"))
    ).drop("_score_id")
