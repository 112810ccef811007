"""Multimodal column operators: opaque ``binary`` payloads with typed
metadata, magic-byte sniffing, chunk/frame sampling, and an
Arrow-batched decode stage.

The reference has no multimodal surface (SURVEY.md §2.2) — this is
north-star extension territory for a 100 TB training-data pipeline:
images/audio/video ride through the lake as ``binary`` columns plus a
``StructType`` metadata column, and only the decode/feature step ever
looks inside the bytes.

Design split:
- Everything that does NOT decode — byte length, content hash, mime
  sniffing from magic bytes, chunk sampling — is pure Catalyst
  (``octet_length``/``md5``/``substring``), JVM-side, codegen'd.
- The decode/feature-extract stage is ``mapInPandas``: Arrow-batched,
  one Python worker per partition, vectorized pandas inside. The REAL
  decoder (PIL/librosa/ffmpeg) is not installed in this environment,
  so ``decode_features`` ships a deterministic md5-derived fake with
  the same schema, signature, and batch shape — swap ``_fake_decode``
  for a real per-batch decoder and nothing else changes. The plumbing
  (schema contract, Arrow batching, partition mapping) is real and
  under test.

Scale notes: payload bytes never cross a shuffle here — metadata and
features are derived map-side; the only wide ops downstream (dedup on
content_md5, feature-space joins) carry 16-64 byte digests/vectors,
not blobs. Keep payloads out of join keys and aggregates.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_FAKE_FEATURES = 4

#: Magic-byte prefixes → mime (hex, uppercase).
_MAGIC = (
    ("89504E47", "image/png"),
    ("FFD8FF", "image/jpeg"),
    ("47494638", "image/gif"),
    ("1A45DFA3", "video/webm"),
)

#: RIFF is a CONTAINER magic shared by WAV, WebP, and AVI; bytes 9-12
#: carry the actual form type, so classifying on the 4-byte prefix
#: alone would route WebP images and AVI videos down an audio path.
_RIFF_FORMS = (
    ("WAVE", "audio/wav"),
    ("WEBP", "image/webp"),
    ("AVI ", "video/x-msvideo"),
)

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
    ]
)


def sniff_mime(payload: Column) -> Column:
    """Mime from magic bytes — a chained CASE over hex prefixes, pure
    Catalyst (no decode). RIFF payloads are disambiguated by the form
    type at bytes 9-12 (WAVE/WEBP/AVI); an unknown RIFF form falls
    through to octet-stream rather than guessing."""
    head = F.upper(F.hex(F.substring(payload, 1, 4)))
    riff_form = F.substring(payload, 9, 4).cast("string")
    expr = None
    for magic, mime in _MAGIC:
        cond = head.startswith(magic)
        expr = F.when(cond, mime) if expr is None else expr.when(cond, mime)
    for form, mime in _RIFF_FORMS:
        cond = head.startswith("52494646") & (riff_form == form)
        expr = expr.when(cond, mime)
    return expr.otherwise("application/octet-stream")


def with_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Attach the typed metadata struct next to an opaque payload."""
    p = F.col(payload_col)
    return df.withColumn(
        "media_meta",
        F.struct(
            sniff_mime(p).alias("mime"),
            F.octet_length(p).cast("long").alias("n_bytes"),
            F.md5(p).alias("content_md5"),
        ),
    )


def sample_chunks(
    df: DataFrame,
    payload_col: str = "payload",
    chunk_bytes: int = 256,
    stride: int = 4,
) -> DataFrame:
    """Frame/chunk sampling without decoding: every ``stride``-th
    ``chunk_bytes`` slice of the payload, exploded to one row per kept
    chunk with its offset. The video analogue (sample every Nth frame)
    plugs in by replacing the slicer inside the same shape."""
    p = F.col(payload_col)
    n_chunks = F.ceil(F.octet_length(p) / F.lit(chunk_bytes)).cast("int")
    # Zero-length payloads must yield zero chunk rows: sequence(0, -1)
    # is the DESCENDING sequence [0, -1], which would leak a spurious
    # offset-0 empty chunk through the explode.
    idx = F.when(
        n_chunks > 0,
        F.filter(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: i % stride == 0,
        ),
    ).otherwise(F.array().cast("array<int>"))
    return (
        df.withColumn("_i", F.explode(idx))
        .withColumn("chunk_offset", F.col("_i") * chunk_bytes)
        .withColumn(
            "chunk", F.substring(p, F.col("chunk_offset") + 1, chunk_bytes)
        )
        .drop("_i")
    )


def _fake_decode(payload: pd.Series) -> pd.DataFrame:
    """Deterministic stand-in for a real image/audio decoder: feature j
    is byte j of md5(payload) scaled to [0, 1]. Replace this function
    with the real per-batch decode (e.g. PIL → embedding model) —
    callers and the Spark plan are unchanged."""
    import hashlib

    digests = payload.map(
        lambda b: hashlib.md5(bytes(b) if b is not None else b"").digest()
    )
    return pd.DataFrame(
        {f"f{j}": digests.map(lambda d: d[j] / 255.0) for j in range(N_FAKE_FEATURES)}
    )


def decode_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched decode/feature-extract via ``mapInPandas``.

    The output schema is ``(id, f0..f{k-1})`` doubles; batches stream
    through the Python worker without materializing a partition at
    once — the shape that survives 100 TB payload columns.
    """
    schema = T.StructType(
        [df.schema[id_col]]
        + [T.StructField(f"f{j}", T.DoubleType()) for j in range(N_FAKE_FEATURES)]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _fake_decode(pdf[payload_col])
            feats.insert(0, id_col, pdf[id_col].values)
            yield feats

    return df.select(id_col, payload_col).mapInPandas(extract, schema)


def _fake_resize_one(b, target: int) -> bytes:
    """Deterministic stand-in for a real image decode+resize: emits
    exactly ``target`` bytes by cycling the source payload (md5 of
    empty for null/empty payloads, so the output-length contract holds
    unconditionally)."""
    import hashlib

    src = bytes(b) if b else hashlib.md5(b"").digest()
    reps = target // len(src) + 1
    return (src * reps)[:target]


def _fake_resize(payload: pd.Series, width: int, height: int) -> pd.Series:
    """Series form of ``_fake_resize_one`` — the PIL-free resize path."""
    target = width * height
    return payload.map(lambda b: _fake_resize_one(b, target))


def _resize_series(payload: pd.Series, width: int, height: int) -> pd.Series:
    """Resize one Arrow batch of payloads to ``width*height``
    single-channel (mode L) bytes. Resolved INSIDE the Python worker at
    batch time: uses PIL when importable (decode → grayscale → resize →
    raw bytes), and falls back PER ROW to the deterministic fake when a
    payload doesn't decode (the synthetic testdata payloads are not
    real images) or PIL is absent entirely. Either way every output row
    is exactly ``width*height`` bytes."""
    try:
        from PIL import Image
    except ImportError:
        return _fake_resize(payload, width, height)
    from io import BytesIO

    target = width * height

    def one(b) -> bytes:
        try:
            img = Image.open(BytesIO(bytes(b)))
            return img.convert("L").resize((width, height)).tobytes()
        except Exception:
            return _fake_resize_one(b, target)

    return payload.map(one)


def resize_media(
    df: DataFrame,
    width: int = 16,
    height: int = 16,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Arrow-batched media resize via ``mapInPandas``: output is
    (id, width, height, payload) with the payload re-encoded at the
    target dimensions as ``width*height`` grayscale bytes. The decode
    is resolved per batch inside the worker (``_resize_series``): PIL
    when importable, the deterministic fake per row otherwise or on
    decode failure — either way the Spark-side contract (schema,
    streaming batch shape, per-row output length) is identical and
    tested. Map-only: payload bytes never cross a shuffle."""
    schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "width": width,
                    "height": height,
                    "payload": _resize_series(pdf[payload_col], width, height),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema)


def dhash64(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """64-bit difference hash (dHash) per media payload — the
    similarity-preserving fingerprint image dedup pipelines band-join
    on (near-identical images differ in a few bits; re-encodes and
    small crops stay close, which md5 cannot give).

    Decode path: ``_resize_series`` to 9x8 grayscale (REAL PIL decode
    when importable and the payload parses; the deterministic fake per
    row otherwise — same contract as resize_media), then bit (r, c) =
    pixel[r][c] > pixel[r][c+1] packed little-endian into one long.
    Arrow-batched and vectorized (numpy over the whole batch after the
    per-row decode); payload bytes never leave the map — only 8-byte
    hashes shuffle downstream.
    """
    import numpy as np

    schema = T.StructType(
        [df.schema[id_col], T.StructField("phash", T.LongType())]
    )

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = np.left_shift(
            np.uint64(1), np.arange(64, dtype=np.uint64)
        )
        for pdf in batches:
            resized = _resize_series(pdf[payload_col], 9, 8)
            arr = np.stack(
                [
                    np.frombuffer(b, dtype=np.uint8).reshape(8, 9)
                    for b in resized
                ]
            )
            bits = (arr[:, :, 1:] > arr[:, :, :-1]).reshape(len(arr), 64)
            vals = (bits.astype(np.uint64) * weights).sum(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "phash": vals.view(np.int64),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(hash_batches, schema)


def phash_bands(
    hashes: DataFrame, max_hamming: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """(id, phash, band_idx, band_val): the pigeonhole bit-slice rows
    a banded hamming join keys on — ``max_hamming + 1`` disjoint
    slices of the 64-bit hash, so two hashes within ``max_hamming``
    bits agree on at least one slice. Shared by the batch dedup
    (``image_dedup_frame``) and the streaming ingest
    (``streaming.run_image_dedup_ingest``), which band the SAME way so
    their candidate sets coincide. Slices are ``64 // n_bands`` bits
    with the last slice taking the remainder."""
    n_bands = max_hamming + 1
    width = 64 // n_bands

    def band_val(i: int) -> Column:
        bits = 64 - i * width if i == n_bands - 1 else width
        mask = F.lit((1 << bits) - 1 if bits < 64 else -1)
        return F.shiftrightunsigned(F.col("phash"), i * width).bitwiseAND(
            mask
        )

    return hashes.select(
        id_col,
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        band_val(i).alias("band_val"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("_b"),
    ).select(
        id_col,
        "phash",
        F.col("_b.band_idx").alias("band_idx"),
        F.col("_b.band_val").alias("band_val"),
    )


def image_dedup_frame(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Perceptual near-duplicate image REMOVAL: keep one image per
    cluster of payloads whose dHashes lie within ``max_hamming`` bits.
    Returns (id, phash) of the retained rows. Same precedence rule as
    textops.minhash_dedup_frame — a row is dropped iff a SMALLER-id
    row (retained or not) is within the radius — so the result is
    order-deterministic and batching-invariant.

    Scale shape (the text-dedup playbook applied to pixels):
    1. dHash map (payloads never shuffle; 8 bytes/row after this).
    2. Identical hashes collapse FIRST (min id per phash — re-encoded
       exact duplicates are the common case and would pile up the
       band buckets).
    3. Band join on ``max_hamming + 1`` disjoint bit-slices: by
       pigeonhole, two hashes within max_hamming bits agree on at
       least one slice — candidate generation is an equi-join, never
       all-pairs.
    4. Verify with ``bit_count(a XOR b) <= max_hamming`` inline (pure
       JVM arithmetic), collect dropped ids, anti-join.
    ``max_hamming + 1`` must divide 64 reasonably: slices are
    ``64 // n_bands`` bits with the last slice taking the remainder.
    """
    hashes = dhash64(df, id_col=id_col, payload_col=payload_col)
    reps = hashes.groupBy("phash").agg(F.min(id_col).alias(id_col))
    bands = phash_bands(reps, max_hamming, id_col=id_col).repartition(
        "band_idx", "band_val"
    )

    right = bands.select(
        F.col(id_col).alias("_r_id"),
        F.col("phash").alias("_r_phash"),
        "band_idx",
        "band_val",
    )
    ham = F.bit_count(
        F.col("phash").bitwiseXOR(F.col("_r_phash"))
    )
    dropped = (
        bands.join(right, ["band_idx", "band_val"])
        .filter(F.col("_r_id") < F.col(id_col))
        .filter(ham <= F.lit(max_hamming))
        .select(id_col)
        .distinct()
    )
    return reps.select(id_col, "phash").join(dropped, id_col, "left_anti")
