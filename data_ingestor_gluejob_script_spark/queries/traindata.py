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


def split_bucket_col(doc_id) -> "F.Column":
    """Deterministic split bucket: first md5 byte of the doc id,
    mod SPLIT_BUCKETS — identical on every engine, run, partitioning."""
    return (
        F.conv(F.substring(F.md5(doc_id.cast("string")), 1, 2), 16, 10)
        .cast("int")
        % SPLIT_BUCKETS
    )


def split_name_col(bucket) -> "F.Column":
    return (
        F.when(bucket == VAL_BUCKET, "val")
        .when(bucket == TEST_BUCKET, "test")
        .otherwise("train")
    )


def split_assign_frame(docs: DataFrame) -> DataFrame:
    """Deterministic train/val/test assignment: 80/10/10 by key hash.
    Map-only."""
    bucket = split_bucket_col(F.col("doc_id"))
    return docs.select(
        "doc_id", bucket.alias("bucket"), split_name_col(bucket).alias("split")
    )


def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form of ``split_assign_frame`` over the documents
    table (same expressions, same plan)."""
    return split_assign_frame(load(spark, sf_dir, "documents"))


def group_aware_split_frame(
    docs: DataFrame, groups: DataFrame
) -> DataFrame:
    """Leakage-PROOF split assignment: hash the near-dup GROUP id
    instead of the doc id, so every member of a duplicate cluster
    lands in the same split by construction — the preventive
    counterpart of split_leakage_report (which only measures the
    damage after a doc-keyed split).

    ``groups`` is (doc_id, group_id) — e.g. operators.graph.
    neardup_groups over the MinHash/SimHash pair list. Docs absent
    from ``groups`` (singletons the pair list never mentions) key on
    their own doc_id, which equals their would-be group id (group ids
    are component-min doc_ids), so the assignment is identical whether
    a singleton is listed or omitted.

    Scale shape: one left join of docs against the group map (both
    sides shuffle on doc_id — the map is corpus-sized in the worst
    case), then the same map-only md5 bucket as split_assign_frame.
    The split stays 80/10/10 in EXPECTATION over groups, not docs: a
    huge duplicate cluster moves together, which is the point."""
    g = groups.select(
        "doc_id", F.col("group_id").alias("_gid")
    )
    keyed = docs.join(g, "doc_id", "left").withColumn(
        "_split_key", F.coalesce(F.col("_gid"), F.col("doc_id"))
    )
    bucket = split_bucket_col(F.col("_split_key"))
    return keyed.select(
        "doc_id",
        F.col("_split_key").alias("split_key"),
        bucket.alias("bucket"),
        split_name_col(bucket).alias("split"),
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


def seq_pack_frame(docs: DataFrame) -> DataFrame:
    """Sequence packing: documents assigned to 2048-token packs by
    running token count over doc_id order. Output is the pack manifest
    (doc → pack, offset within pack).

    Distributed prefix sum, NOT a global-order window (which is a
    single reducer) — the shared ``operators.order.
    block_prefix_offsets`` primitive over whitespace token counts
    (the BPE pack stream feeds the same primitive its subword
    counts). NULL-id documents are excluded (no global order exists
    for them; see the primitive's docstring)."""
    from ..operators.order import block_prefix_offsets

    counts = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
    )
    return block_prefix_offsets(counts, block=PACK_BLOCK).select(
        "doc_id",
        "n_tokens",
        "tokens_before",
        F.floor(F.col("tokens_before") / PACK_TOKENS).alias("pack_id"),
        (F.col("tokens_before") % PACK_TOKENS).alias("pack_offset"),
    )


def q_seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form of ``seq_pack_frame`` over the documents table
    (same expressions, same plan)."""
    return seq_pack_frame(load(spark, sf_dir, "documents"))


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


MIN_QUALITY = 2


def prepare_training_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    max_repetition: float | None = None,
    gopher_quality: bool | dict = False,
) -> DataFrame:
    """End-to-end training-corpus preparation — the scrub/dedup/pack
    stages composed into ONE declarative job: [decontaminate against
    ``benchmark`` if given] → redact PII → quality filter (score >=
    MIN_QUALITY over the REDACTED text) → [Gopher quality-rule
    battery (docclean.gopher_quality_filter) if ``gopher_quality`` is
    True or a dict — an empty dict {} enables the published
    thresholds, a non-empty dict overrides them; None/False/anything
    else leaves it off] →
    [repetition filter: drop docs whose top-2-gram fraction exceeds
    ``max_repetition``, the Gopher-style degenerate-repetition cut,
    if given] → exact + SimHash near-dup drop in ONE stage (keep each
    fingerprint group's lowest doc_id; exact text clones share a
    fingerprint, so this subsumes exact dedup — see the inline
    equivalence note) → keep the train split →
    sequence-pack. Returns the train-split pack manifest
    (doc_id, n_tokens, tokens_before, pack_id, pack_offset).

    Shuffle budget (the 100 TB story): redaction, quality, and split
    assignment are map-only column expressions Catalyst fuses into the
    stages around them; the optional repetition cut adds two
    partial-aggregated gram shuffles plus a doc_id semi-join; the
    combined dedup/near-dup drop is the fingerprint aggregation (one
    partial-aggregated vote shuffle), a doc_id join, and one window
    shuffle on the 16-bit fingerprint; packing is the distributed
    prefix sum (block-local window + #blocks-row global window +
    broadcast offsets). Nothing enumerates pairs, nothing collects to
    the driver.

    Differential-tested end-to-end against PIPELINE_ORACLE /
    pipeline_oracle(max_repetition=...)
    (tests/test_corpus_pipeline.py); not driver-registered (gate
    pinned at 50)."""
    from .corpusstats import repetition_frame
    from .textops import (
        decontaminate,
        quality_score_col,
        redacted_text_col,
        require_unique_doc_ids,
        simhash16_frame,
    )

    # Identity precondition (advice r15): every stage below keys on
    # doc_id — the repetition semi-join, the SimHash frame's join-back,
    # and the split bucketing — so NULL ids would silently vanish and
    # duplicate ids would merge fingerprints / fan out joins. Enforced
    # once at entry (one id-column aggregate; this is an offline
    # corpus-prep entry point, not a benched query).
    require_unique_doc_ids(docs, "prepare_training_corpus")
    if benchmark is not None:
        # Decontamination runs on the RAW text (the benchmark is raw
        # text too — redacting first would shift shingles on only one
        # side of the overlap).
        docs = decontaminate(docs, benchmark)
    work = docs.select(
        "doc_id", redacted_text_col(F.col("text")).alias("text")
    ).withColumn("n_chars", F.length("text"))
    kept = work.filter(
        quality_score_col(F.col("text"), F.col("n_chars")) >= MIN_QUALITY
    )
    if gopher_quality is True or isinstance(gopher_quality, dict):
        # `{}` plausibly means "enable with the published defaults" —
        # a falsy-dict test would silently skip the battery (round-13
        # ADVICE) — while None (the natural "off" spelling beside the
        # benchmark=None / max_repetition=None siblings) and any other
        # falsy non-dict must stay OFF (r13 review): enable only for
        # an explicit True or a dict of overrides.
        # The Gopher quality-rule battery (docclean), over the
        # REDACTED text like the generic score — map-only, so it
        # fuses into the same stage and adds zero shuffle. Runs
        # before the repetition cut: the battery is the cheap filter
        # (no aggregation), so failing pages never pay the gram
        # shuffles. Pass a dict to override thresholds (True = the
        # published Gopher defaults).
        from .docclean import gopher_quality_filter

        overrides = gopher_quality if isinstance(gopher_quality, dict) else {}
        kept = gopher_quality_filter(kept, **overrides)
    if max_repetition is not None:
        ok = repetition_frame(kept.select("doc_id", "text")).filter(
            F.col("top_ngram_frac") <= max_repetition
        )
        kept = kept.join(ok.select("doc_id"), "doc_id", "left_semi")
    # codegen SimHash frame (r15): the interpreted fold's per-word
    # array churn measured 12x slower at 500k docs — see
    # simhash16_frame; the join is doc_id-clustered like the window.
    #
    # r17 (r16 verdict #4): the exact-dedup stage that used to run
    # before the fingerprint window is REMOVED — provably redundant.
    # Identical texts have identical fingerprints, so text groups are
    # sub-partitions of fingerprint groups; each text group's min
    # doc_id survives exact dedup, hence the fingerprint group's min
    # over exact-survivors IS its global min, and "keep min id per
    # text, then min id per fingerprint" ≡ "keep min id per
    # fingerprint" (one row per group either way — ids are unique by
    # the entry guard). NULL texts (can't reach here — the quality
    # filter drops them — but for the record) all carry a NULL
    # fingerprint and form one window group, exactly like the digest
    # sentinel's one NULL-text survivor. Dropping the stage removes
    # the digest groupBy + semi-join (two exchanges and a join) and
    # halves the duplicated upstream subtree in the analyzed plan —
    # the pipeline's measured driver-planning cost — while the
    # differential vs PIPELINE_ORACLE stays exact
    # (tests/test_corpus_pipeline.py).
    nd = (
        kept.join(
            simhash16_frame(kept.select("doc_id", "text"))
            .withColumnRenamed("simhash16", "_fp"),
            "doc_id",
        )
        .withColumn(
            "_rep", F.min("doc_id").over(Window.partitionBy("_fp"))
        )
        .filter(F.col("doc_id") == F.col("_rep"))
        .drop("_fp", "_rep")
    )
    train = nd.filter(
        split_name_col(split_bucket_col(F.col("doc_id"))) == "train"
    )
    return seq_pack_frame(train.select("doc_id", "text"))


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


def _pipeline_oracle(max_repetition: float | None = None) -> str:
    """DuckDB twin of ``prepare_training_corpus`` (unregistered;
    tests/test_corpus_pipeline.py) — every stage built from the SAME
    constants/SQL fragments as its Spark expression, chained as CTEs:
    redact → quality(redacted text) → [repetition cut] → md5-dedup →
    simhash-rep →
    train-bucket → prefix-sum pack."""
    from .textops import _REDACTED_SQL, _SIMHASH_CTE, EN_STOPWORDS

    en = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    quality = (
        "(CAST(length(text) BETWEEN 100 AND 5000 AS INTEGER)"
        " + CAST(len(string_split(text, ' ')) BETWEEN 20 AND 1000"
        " AS INTEGER)"
        " + CAST(len(list_intersect(list_distinct(string_split(text, ' ')),"
        f" [{en}])) >= 2 AS INTEGER)"
        " + CAST(regexp_replace(text, '[a-z ]', '', 'g') = ''"
        " AS INTEGER))"
    )
    simhash = _SIMHASH_CTE.replace("FROM documents", "FROM dedup")
    if max_repetition is None:
        rep_cte = "rep AS (SELECT doc_id, text FROM q),"
    else:
        # Mirrors corpusstats.repetition_frame (n=2) including the
        # round-6 fraction and the shorter-than-n pass-through.
        rep_cte = f"""reps AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM q),
        repg AS (
            SELECT doc_id, array_to_string(w[i:i+1], ' ') AS gram
            FROM reps, unnest(range(1, greatest(len(w) - 1, 0) + 1)) AS t(i)),
        rept AS (
            SELECT doc_id, gram, count(*) AS cnt
            FROM repg GROUP BY doc_id, gram),
        repok AS (
            SELECT doc_id FROM rept GROUP BY doc_id
            HAVING round(max(cnt) / sum(cnt), 6) <= {max_repetition}),
        rep AS (
            SELECT doc_id, text FROM q
            WHERE doc_id IN (SELECT doc_id FROM repok)
               OR doc_id NOT IN (SELECT doc_id FROM rept)),"""
    return f"""
        WITH red AS (
            SELECT doc_id, {_REDACTED_SQL} AS text FROM documents),
        q AS (
            SELECT doc_id, text FROM red
            WHERE {quality} >= {MIN_QUALITY}),
        {rep_cte}
        dedup AS (
            SELECT doc_id, text FROM (
                SELECT doc_id, text,
                       row_number() OVER (PARTITION BY md5(text)
                                          ORDER BY doc_id) AS rn
                FROM rep) WHERE rn = 1),
        {simhash},
        tr AS (
            SELECT d.doc_id, d.text FROM dedup d
            WHERE d.doc_id IN (
                      SELECT min(doc_id) FROM sim GROUP BY simhash16)
              AND ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 2))::INT
                  % {SPLIT_BUCKETS} NOT IN ({VAL_BUCKET}, {TEST_BUCKET})),
        t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
              FROM tr),
        c AS (
            SELECT doc_id, n_tokens,
                   CAST(COALESCE(sum(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS tokens_before
            FROM t)
        SELECT doc_id, n_tokens, tokens_before,
               CAST(floor(tokens_before / {PACK_TOKENS}) AS BIGINT)
                   AS pack_id,
               CAST(tokens_before % {PACK_TOKENS} AS BIGINT) AS pack_offset
        FROM c
    """


PIPELINE_ORACLE = _pipeline_oracle()
pipeline_oracle = _pipeline_oracle  # parameterized form for tests


def attrition_report(
    docs: DataFrame, max_repetition: float = 0.1
) -> DataFrame:
    """One-row attrition diagnostic for the curation pipeline: how
    many documents each stage would drop, computed INDEPENDENTLY (a
    doc can fail several stages) plus the all-stages survivor count —
    the report you read before committing to thresholds.

    All stage predicates become flag columns over ONE scan of the
    corpus: quality and redaction are map-only, the duplicate flag is
    a window over md5(text) (keyed shuffle of digests), the
    repetition flag joins the two-shuffle gram aggregate back on
    doc_id. Catalyst runs the flags side-by-side and the final agg is
    a single row — at 100 TB this costs one corpus read plus the same
    shuffles the pipeline itself would do, not one pass per stage.

    Differential-tested against ATTRITION_ORACLE
    (tests/test_corpus_pipeline.py)."""
    from .corpusstats import repetition_frame
    from .textops import quality_score_col, redacted_text_col

    red = docs.select(
        "doc_id", redacted_text_col(F.col("text")).alias("text")
    ).withColumn("n_chars", F.length("text"))
    rep = repetition_frame(red.select("doc_id", "text")).select(
        "doc_id", "top_ngram_frac"
    )
    flagged = (
        red.join(rep, "doc_id")
        .withColumn(
            "fail_quality",
            quality_score_col(F.col("text"), F.col("n_chars")) < MIN_QUALITY,
        )
        .withColumn(
            "fail_repetition", F.col("top_ngram_frac") > max_repetition
        )
        .withColumn(
            "is_dup_text",
            F.row_number().over(
                Window.partitionBy(F.md5("text")).orderBy("doc_id")
            )
            > 1,
        )
    )
    return flagged.agg(
        F.count("*").alias("total_docs"),
        F.sum(F.col("fail_quality").cast("long")).alias("n_fail_quality"),
        F.sum(F.col("fail_repetition").cast("long")).alias(
            "n_fail_repetition"
        ),
        F.sum(F.col("is_dup_text").cast("long")).alias("n_dup_text"),
        F.sum(
            (
                ~F.col("fail_quality")
                & ~F.col("fail_repetition")
                & ~F.col("is_dup_text")
            ).cast("long")
        ).alias("n_pass_all"),
    )


def attrition_oracle(max_repetition: float = 0.1) -> str:
    """DuckDB twin of ``attrition_report`` built from the same stage
    fragments as the pipeline oracle."""
    from .textops import _REDACTED_SQL, EN_STOPWORDS

    en = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    quality = (
        "(CAST(length(text) BETWEEN 100 AND 5000 AS INTEGER)"
        " + CAST(len(string_split(text, ' ')) BETWEEN 20 AND 1000"
        " AS INTEGER)"
        " + CAST(len(list_intersect(list_distinct(string_split(text, ' ')),"
        f" [{en}])) >= 2 AS INTEGER)"
        " + CAST(regexp_replace(text, '[a-z ]', '', 'g') = ''"
        " AS INTEGER))"
    )
    return f"""
        WITH red AS (
            SELECT doc_id, {_REDACTED_SQL} AS text FROM documents),
        ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM red),
        grams AS (
            SELECT doc_id, array_to_string(w[i:i+1], ' ') AS gram
            FROM ws, unnest(range(1, greatest(len(w) - 1, 0) + 1)) AS t(i)),
        tall AS (
            SELECT doc_id, gram, count(*) AS cnt
            FROM grams GROUP BY doc_id, gram),
        frac AS (
            SELECT r.doc_id,
                   coalesce(round(max(t.cnt) / sum(t.cnt), 6), 0.0) AS f
            FROM red r LEFT JOIN tall t USING (doc_id) GROUP BY r.doc_id),
        flags AS (
            SELECT r.doc_id,
                   {quality} < {MIN_QUALITY} AS fail_quality,
                   frac.f > {max_repetition} AS fail_repetition,
                   row_number() OVER (PARTITION BY md5(r.text)
                                      ORDER BY r.doc_id) > 1 AS is_dup_text
            FROM red r JOIN frac USING (doc_id))
        SELECT count(*) AS total_docs,
               CAST(sum(CAST(fail_quality AS INTEGER)) AS BIGINT)
                   AS n_fail_quality,
               CAST(sum(CAST(fail_repetition AS INTEGER)) AS BIGINT)
                   AS n_fail_repetition,
               CAST(sum(CAST(is_dup_text AS INTEGER)) AS BIGINT)
                   AS n_dup_text,
               CAST(sum(CAST(NOT fail_quality AND NOT fail_repetition
                             AND NOT is_dup_text AS INTEGER)) AS BIGINT)
                   AS n_pass_all
        FROM flags
    """


def pack_slices_frame(manifest: DataFrame) -> DataFrame:
    """Turn the pack manifest (``seq_pack_frame`` output) into
    training-shard-ready slices: a document whose tokens straddle
    pack boundaries is split at exactly those boundaries, emitting
    (doc_id, pack_id, doc_offset, pack_offset, slice_len) — every
    token lands in exactly one slice, every pack holds exactly
    PACK_TOKENS tokens (except the last). This is the "slicing is a
    map over this assignment" step the seq_pack docstring promises:
    pure per-row arithmetic + one explode over the 1-2 packs a doc
    typically spans; no shuffle, no state.

    Zero-token documents emit no slices (they occupy no pack space).

    Differential-tested against PACK_SLICES_ORACLE plus conservation
    invariants (tests/test_seq_pack.py)."""
    first = F.floor(F.col("tokens_before") / PACK_TOKENS)
    last = F.floor(
        (F.col("tokens_before") + F.col("n_tokens") - 1) / PACK_TOKENS
    )
    packs = F.when(
        F.col("n_tokens") > 0, F.sequence(first, last)
    ).otherwise(F.array().cast("array<bigint>"))
    p = F.col("pack_id")
    doc_off = F.greatest(
        F.lit(0).cast("long"), p * PACK_TOKENS - F.col("tokens_before")
    )
    slice_end = F.least(
        F.col("n_tokens"), (p + 1) * PACK_TOKENS - F.col("tokens_before")
    )
    return (
        manifest.select(
            "doc_id",
            "n_tokens",
            "tokens_before",
            F.explode(packs).alias("pack_id"),
        )
        .select(
            "doc_id",
            "pack_id",
            doc_off.alias("doc_offset"),
            (F.col("tokens_before") + doc_off - p * PACK_TOKENS).alias(
                "pack_offset"
            ),
            (slice_end - doc_off).alias("slice_len"),
        )
    )


PACK_SLICES_ORACLE = f"""
WITH m AS ({{manifest_sql}}),
s AS (
    SELECT doc_id, n_tokens, tokens_before,
           unnest(range(tokens_before // {PACK_TOKENS},
                        (tokens_before + n_tokens - 1) // {PACK_TOKENS} + 1))
               AS pack_id
    FROM m WHERE n_tokens > 0
)
SELECT doc_id, pack_id,
       greatest(0, pack_id * {PACK_TOKENS} - tokens_before) AS doc_offset,
       tokens_before
           + greatest(0, pack_id * {PACK_TOKENS} - tokens_before)
           - pack_id * {PACK_TOKENS} AS pack_offset,
       least(n_tokens, (pack_id + 1) * {PACK_TOKENS} - tokens_before)
           - greatest(0, pack_id * {PACK_TOKENS} - tokens_before)
           AS slice_len
FROM s
"""


def split_leakage_report(pairs: DataFrame, docs: DataFrame) -> DataFrame:
    """Train/eval leakage check: near-duplicate PAIRS whose members
    landed in DIFFERENT splits — a test document with a train-set
    near-twin inflates eval scores exactly like benchmark
    contamination. Input is any near-dup pair frame (MinHash, SimHash,
    embedding); output is one row per (split_a, split_b) with the
    crossing-pair count, plus same-split rows for context.

    Composes the oracle-verified pair queries with the deterministic
    split assignment; two broadcast-able joins of the (small) pair set
    against the map-only split frame — the corpus itself never
    reshuffles. Split names are canonically ordered so (train,test)
    and (test,train) aggregate into one row."""
    a_col, b_col = pairs.columns[0], pairs.columns[1]
    splits = split_assign_frame(docs).select("doc_id", "split")
    labeled = (
        pairs.select(F.col(a_col).alias("_a"), F.col(b_col).alias("_b"))
        .join(
            splits.withColumnRenamed("doc_id", "_a").withColumnRenamed(
                "split", "split_a"
            ),
            "_a",
        )
        .join(
            splits.withColumnRenamed("doc_id", "_b").withColumnRenamed(
                "split", "split_b"
            ),
            "_b",
        )
    )
    lo = F.least("split_a", "split_b")
    hi = F.greatest("split_a", "split_b")
    return (
        labeled.select(
            lo.alias("split_a"),
            hi.alias("split_b"),
            (F.col("split_a") != F.col("split_b")).alias("is_leak"),
        )
        .groupBy("split_a", "split_b", "is_leak")
        .agg(F.count("*").alias("n_pairs"))
    )


def quality_survivor_frame(
    docs: DataFrame, groups: DataFrame, score: "F.Column | None" = None
) -> DataFrame:
    """Near-dup removal that keeps the BEST document of each dup
    group, not the lowest-id one. Every dedup operator here keeps
    min(doc_id) because that precedence is batching-invariant — but
    at curation time the survivor should be the highest-quality group
    member (the Dolma/RefinedWeb convention). ``groups`` is any
    (doc_id, group_id) labeling (``neardup_groups`` output works
    as-is); docs absent from ``groups`` form their own group. The
    survivor is argmax(score), ties broken by min doc_id, so the
    output is still deterministic under any partitioning.

    ``score`` defaults to the lexical ``quality_score_col`` (needs
    text + n_chars); pass any numeric column expression to rank by a
    classifier or perplexity instead. A NULL score ranks BELOW every
    real score (coalesced to -inf before the argmax — struct ordering
    is NULLS FIRST ascending, so a raw NULL in the negated field would
    otherwise WIN the group): an unscorable document survives only
    when its whole group is unscorable.

    Plan: scores ride an id-keyed (doc_id, score, group_id) frame —
    two keyed shuffles of 3-column rows (the groups join, then the
    group argmax via min-of-struct) — and the corpus payload moves
    only through the final LEFT SEMI on the winner ids. No windows,
    so a mega-group (the clone pileup case) is one skewed AGGREGATE
    key, which AQE splits — not a single-reducer sort.
    """
    from .textops import quality_score_col

    if score is None:
        score = quality_score_col(F.col("text"), F.col("n_chars"))
    labeled = (
        docs.select(
            "doc_id",
            F.coalesce(
                score.cast("double"), F.lit(float("-inf"))
            ).alias("_score"),
        )
        .join(groups.select("doc_id", "group_id"), "doc_id", "left")
        .withColumn("group_id", F.coalesce("group_id", "doc_id"))
    )
    winners = (
        labeled.groupBy("group_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("_score")).alias("_neg"),
                    F.col("doc_id").alias("doc_id"),
                )
            ).alias("_w")
        )
        .select(F.col("_w.doc_id").alias("doc_id"))
    )
    return docs.join(winners, "doc_id", "left_semi")


def sample_to_token_budget(
    docs: DataFrame, budget_tokens: int, n_col: str | None = None
) -> DataFrame:
    """Deterministic corpus subsample hitting a token budget: order
    documents by md5(doc_id) (an unbiased, partitioning-proof
    shuffle order — the hash-not-rand rule), take the running token
    sum in that order, and keep every document whose preceding total
    is under ``budget_tokens``. The first document crossing the
    boundary is INCLUDED (budget reads as "at least", the packing
    convention); everything after is dropped. Re-running on the same
    corpus reproduces the identical sample; growing the corpus only
    perturbs the sample near the boundary.

    Token counts come from ``n_col`` if given (e.g. a BPE count
    column) else whitespace word counts. NULL-id docs are excluded —
    they have no place in a global order (the
    ``block_prefix_offsets`` contract).

    Plan: the prefix sum is the shared two-phase shape — one range
    shuffle to number the hash order (``global_row_number``), block
    windows for local sums, ONE SinglePartition exchange of #blocks
    rows — so there is no full-corpus single-reducer stage; the
    payload moves only in the final LEFT SEMI.
    """
    from ..operators.order import block_prefix_offsets, global_row_number
    from .textops import words_col

    n = (
        F.col(n_col)
        if n_col is not None
        else F.size(words_col(F.col("text")))
    )
    counts = docs.filter(F.col("doc_id").isNotNull()).select(
        "doc_id",
        n.cast("long").alias("_n"),
        F.md5(F.col("doc_id").cast("string")).alias("_pri"),
    )
    ranked = global_row_number(counts, ["_pri", "doc_id"], out_col="_rid")
    offs = block_prefix_offsets(
        ranked, id_col="_rid", n_col="_n", block=8192
    ).filter(F.col("tokens_before") < budget_tokens)
    keep = ranked.join(offs.select("_rid"), "_rid", "left_semi").select(
        "doc_id"
    )
    return docs.join(keep, "doc_id", "left_semi")
