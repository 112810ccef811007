"""Multimodal-column queries: the operators/multimodal.py surface made
observable against the ``documents`` table.

No testdata table carries real image/audio payloads, so payloads are
synthesized deterministically: each document's text is wrapped in an
ASCII-safe magic prefix by ``doc_id % 3`` (GIF, RIFF/WAV, none). ASCII
matters: DuckDB's ``md5``/``substring`` operate on VARCHAR, so byte
offsets and hashes only agree across engines when payload bytes are
ASCII — which the corpus is (verified: 0 non-ASCII docs at every SF).

The feature query exercises the REAL ``mapInPandas`` Arrow path; the
fake decoder's output (md5-byte features) is SQL-expressible, which is
exactly what makes the plumbing oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    N_FAKE_FEATURES,
    decode_features,
    sample_chunks,
    with_media_metadata,
)
from ._util import load

CHUNK_BYTES = 256
CHUNK_STRIDE = 4

# doc_id % 3 → ASCII magic prefix: GIF87a header, RIFF/WAVE container
# (the form type at bytes 9-12 is what sniff_mime disambiguates — bare
# 'RIFF' alone is an ambiguous container, not a WAV), bare.
_PREFIXES = ("GIF87a", "RIFFxxxxWAVE", "")


def _payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    prefix = (
        F.when(F.col("doc_id") % 3 == 0, _PREFIXES[0])
        .when(F.col("doc_id") % 3 == 1, _PREFIXES[1])
        .otherwise(_PREFIXES[2])
    )
    return docs.select(
        "doc_id",
        F.encode(F.concat(prefix, F.col("text")), "UTF-8").alias("payload"),
    )


def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque payloads: magic-byte mime sniff +
    byte length + content hash, all JVM-side (no decode)."""
    meta = with_media_metadata(_payloads(spark, sf_dir))
    return meta.select(
        "doc_id",
        F.col("media_meta.mime").alias("mime"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.content_md5").alias("content_md5"),
    )


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode via mapInPandas (deterministic fake
    decoder; see operators/multimodal.py). Features rounded to 6 dp."""
    feats = decode_features(_payloads(spark, sf_dir))
    return feats.select(
        "doc_id",
        *[F.round(F.col(f"f{j}"), 6).alias(f"f{j}") for j in range(N_FAKE_FEATURES)],
    )


def q_media_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk/frame sampling without decode: every 4th 256-byte slice,
    identified by offset + chunk hash."""
    chunks = sample_chunks(
        _payloads(spark, sf_dir), chunk_bytes=CHUNK_BYTES, stride=CHUNK_STRIDE
    )
    return chunks.select(
        "doc_id",
        "chunk_offset",
        F.md5("chunk").alias("chunk_md5"),
    )


QUERIES = {
    "q_media_metadata": q_media_metadata,
    "q_media_features": q_media_features,
    "q_media_chunks": q_media_chunks,
}

_PAYLOAD_CTE = """
    p AS (SELECT doc_id,
                 CASE WHEN doc_id % 3 = 0 THEN 'GIF87a' || text
                      WHEN doc_id % 3 = 1 THEN 'RIFFxxxxWAVE' || text
                      ELSE text END AS payload
          FROM documents)
"""

_FEATURES = ", ".join(
    f"round(('0x' || substr(md5(payload), {2 * j + 1}, 2))::INT / 255.0, 6) AS f{j}"
    for j in range(N_FAKE_FEATURES)
)

ORACLES = {
    "q_media_metadata": f"""
        WITH {_PAYLOAD_CTE}
        SELECT doc_id,
               CASE WHEN starts_with(payload, 'GIF8') THEN 'image/gif'
                    WHEN starts_with(payload, 'RIFF')
                         AND substr(payload, 9, 4) = 'WAVE'
                         THEN 'audio/wav'
                    WHEN starts_with(payload, 'RIFF')
                         AND substr(payload, 9, 4) = 'WEBP'
                         THEN 'image/webp'
                    WHEN starts_with(payload, 'RIFF')
                         AND substr(payload, 9, 4) = 'AVI '
                         THEN 'video/x-msvideo'
                    ELSE 'application/octet-stream' END AS mime,
               CAST(octet_length(encode(payload)) AS BIGINT) AS n_bytes,
               md5(payload) AS content_md5
        FROM p
    """,
    "q_media_features": f"""
        WITH {_PAYLOAD_CTE}
        SELECT doc_id, {_FEATURES} FROM p
    """,
    "q_media_chunks": f"""
        WITH {_PAYLOAD_CTE},
        chunked AS (
            SELECT doc_id, payload,
                   unnest(range(0, CAST(ceil(octet_length(encode(payload))
                                             / {CHUNK_BYTES}.0) AS INT),
                          {CHUNK_STRIDE})) AS i
            FROM p)
        SELECT doc_id,
               i * {CHUNK_BYTES} AS chunk_offset,
               md5(substring(payload, i * {CHUNK_BYTES} + 1, {CHUNK_BYTES})) AS chunk_md5
        FROM chunked
    """,
}
