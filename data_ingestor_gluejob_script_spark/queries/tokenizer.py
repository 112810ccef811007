"""Tokenizer-prep: frequency-ranked vocabulary ids and corpus
encoding — the step between corpus statistics and a training run that
turns text into bounded-vocabulary id sequences.

Built from the statistics the engine already computes
(`corpusstats.vocab_frame`) plus the distributed global ordering
primitive (`operators.order.global_row_number`), so the id assignment
— ``row_number() OVER (ORDER BY n_occurrences DESC, token)`` in SQL
terms — runs with NO single-reducer sort even on a web-scale
vocabulary (Heaps' law keeps it far smaller than the corpus, but a
100 TB crawl still yields hundreds of millions of distinct tokens:
metadata to a groupBy, poison to a global window).

Encoding is the corpusstats broadcast convention in reverse: the
(token → id) map is vocabulary-sized → broadcast; the corpus explodes
to (doc_id, pos, token), picks up ids map-side, and re-packs per
document with ONE shuffle on doc_id. Out-of-vocabulary tokens get
``OOV_ID`` (0) — ids start at 1 so 0 is free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.order import global_row_number
from ._util import load
from .corpusstats import vocab_frame
from .textops import words_col

OOV_ID = 0


def vocab_with_ids(
    docs: DataFrame, v_max: int | None = None, min_count: int = 1
) -> DataFrame:
    """(token, token_id, n_docs, n_occurrences): the corpus vocabulary
    with dense 1-based ids in descending-frequency order (ties broken
    by token — a total order, so ids are deterministic across runs,
    partitionings, and engines). ``v_max`` truncates to the most
    frequent ``v_max`` tokens AFTER ranking, the standard
    vocabulary-size cap."""
    v = global_row_number(
        vocab_frame(docs, min_count),
        [F.col("n_occurrences").desc(), F.col("token")],
        out_col="token_id",
    )
    if v_max is not None:
        v = v.filter(F.col("token_id") <= v_max)
    return v.select("token", "token_id", "n_docs", "n_occurrences")


VOCAB_IDS_ORACLE = """
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents
), tf AS (
    SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token
), v AS (
    SELECT token, count(*) AS n_docs, sum(tf) AS n_occurrences
    FROM tf GROUP BY token
)
SELECT token,
       row_number() OVER (ORDER BY n_occurrences DESC, token) AS token_id,
       n_docs, n_occurrences
FROM v
"""


def encode_docs_flat(docs: DataFrame, vocab: DataFrame) -> DataFrame:
    """(doc_id, pos, token_id): every token position in the corpus
    resolved against the vocabulary, OOV → 0. The vocabulary side
    broadcasts (Heaps-law bounded); the corpus side is explode + a
    broadcast left join — map-only, no corpus shuffle."""
    toks = docs.select(
        "doc_id",
        F.posexplode(words_col(F.col("text"))).alias("pos", "token"),
    )
    return toks.join(
        F.broadcast(vocab.select("token", "token_id")), "token", "left"
    ).select(
        "doc_id",
        "pos",
        F.coalesce(F.col("token_id"), F.lit(OOV_ID)).alias("token_id"),
    )


def encode_docs(docs: DataFrame, vocab: DataFrame) -> DataFrame:
    """(doc_id, ids array<long>): per-document id sequences in token
    order. One shuffle on doc_id; order restored by sorting the
    (pos, id) structs inside each group — deterministic regardless of
    collect_list's arrival order."""
    flat = encode_docs_flat(docs, vocab)
    return (
        flat.groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("pos", "token_id"))
            ).alias("_ps")
        )
        .select(
            "doc_id",
            F.transform(F.col("_ps"), lambda s: s["token_id"]).alias("ids"),
        )
    )


ENCODE_FLAT_ORACLE = """
WITH tok AS (
    SELECT doc_id,
           generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
           unnest(string_split(text, ' ')) AS token
    FROM documents
), tf AS (
    SELECT doc_id, token, count(*) AS tf
    FROM tok GROUP BY doc_id, token
), v AS (
    SELECT token, count(*) AS n_docs, sum(tf) AS n_occurrences
    FROM tf GROUP BY token
), ids AS (
    SELECT token,
           row_number() OVER (ORDER BY n_occurrences DESC, token)
               AS token_id
    FROM v
)
SELECT t.doc_id, t.pos, coalesce(i.token_id, 0) AS token_id
FROM tok t LEFT JOIN ids i USING (token)
"""


def q_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convenience composition for benchmarks: build the full-corpus
    vocabulary and encode every document (packed form)."""
    docs = load(spark, sf_dir, "documents")
    return encode_docs(docs, vocab_with_ids(docs))


def pack_token_stream(docs: DataFrame, vocab: DataFrame) -> DataFrame:
    """The training-batch endpoint: the whole corpus as one contiguous
    token-id stream cut into fixed ``PACK_TOKENS``-long sequences —
    (pack_id, pack_pos, doc_id, token_id), every pack exactly full
    except the last. Documents crossing a pack boundary are split
    mid-document, exactly like a real pretraining loader's
    concatenate-then-chunk.

    Composition, not new machinery: per-token positions from
    ``encode_docs_flat`` (same whitespace tokenization as the seq-pack
    manifest, so counts agree token-for-token) + per-document stream
    offsets from ``seq_pack_frame``'s distributed prefix sum; global
    position = tokens_before + pos, then divmod by the pack length.
    One keyed shuffle (the doc_id join between two already
    partial-shaped frames); everything else is map-side arithmetic."""
    from .traindata import PACK_TOKENS, seq_pack_frame

    flat = encode_docs_flat(docs, vocab)
    offsets = seq_pack_frame(docs).select("doc_id", "tokens_before")
    gpos = F.col("tokens_before") + F.col("pos")
    return flat.join(offsets, "doc_id").select(
        F.floor(gpos / PACK_TOKENS).cast("long").alias("pack_id"),
        (gpos % PACK_TOKENS).cast("long").alias("pack_pos"),
        "doc_id",
        "token_id",
    )


PACK_TOKEN_STREAM_ORACLE = """
WITH tok AS (
    SELECT doc_id,
           generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
           unnest(string_split(text, ' ')) AS token
    FROM documents
), tf AS (
    SELECT doc_id, token, count(*) AS tf
    FROM tok GROUP BY doc_id, token
), v AS (
    SELECT token, count(*) AS n_docs, sum(tf) AS n_occurrences
    FROM tf GROUP BY token
), ids AS (
    SELECT token,
           row_number() OVER (ORDER BY n_occurrences DESC, token)
               AS token_id
    FROM v
), counts AS (
    SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
    FROM documents
), pre AS (
    SELECT doc_id,
           coalesce(sum(n_tokens) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS tokens_before
    FROM counts
)
SELECT (p.tokens_before + t.pos) // {pack} AS pack_id,
       (p.tokens_before + t.pos) % {pack} AS pack_pos,
       t.doc_id,
       coalesce(i.token_id, 0) AS token_id
FROM tok t
JOIN pre p USING (doc_id)
LEFT JOIN ids i USING (token)
"""
