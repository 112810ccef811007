"""Multimodal operator edge semantics the driver oracle can't see:
zero-length payloads, magic-byte sniffing, chunk offsets, and the
Arrow decode stage's schema/determinism contract."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_ingestor_gluejob_script_spark.operators.multimodal import (
    N_FAKE_FEATURES,
    decode_features,
    sample_chunks,
    sniff_mime,
    with_media_metadata,
)

_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _payload_df(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def test_sample_chunks_empty_payload_yields_zero_rows(spark):
    # ceil(0/256)=0 chunks; sequence(0,-1) is the DESCENDING [0,-1] in
    # Spark, so an unguarded explode emits a spurious offset-0 chunk.
    df = _payload_df(spark, [(1, b""), (2, b"x" * 300)])
    out = sample_chunks(df, chunk_bytes=256, stride=4)
    got = {r.doc_id: r.chunk_offset for r in out.collect()}
    assert 1 not in got  # empty payload → no chunk rows
    assert got[2] == 0  # 300 bytes → 2 chunks, stride 4 keeps chunk 0


def test_sample_chunks_offsets_and_stride(spark):
    # 10 chunks of 4 bytes, stride 3 → chunks 0, 3, 6, 9.
    df = _payload_df(spark, [(1, bytes(range(40)))])
    out = sample_chunks(df, chunk_bytes=4, stride=3).orderBy("chunk_offset")
    rows = out.collect()
    assert [r.chunk_offset for r in rows] == [0, 12, 24, 36]
    assert bytes(rows[1].chunk) == bytes(range(12, 16))


def test_sniff_mime_magic_bytes(spark):
    df = _payload_df(
        spark,
        [
            (1, b"\x89PNG\r\n\x1a\n...."),
            (2, b"\xff\xd8\xff\xe0jfif"),
            (3, b"RIFF....WAVEdata"),
            (4, b"plain text bytes"),
            (5, b""),
            (6, b"RIFF....WEBPdata"),
            (7, b"RIFF....AVI data"),
            (8, b"RIFFabcd"),  # ambiguous/truncated RIFF container
        ],
    )
    got = {
        r.doc_id: r.mime
        for r in df.select("doc_id", sniff_mime(F.col("payload")).alias("mime")).collect()
    }
    assert got == {
        1: "image/png",
        2: "image/jpeg",
        3: "audio/wav",
        4: "application/octet-stream",
        5: "application/octet-stream",
        6: "image/webp",
        7: "video/x-msvideo",
        8: "application/octet-stream",
    }


def test_media_metadata_struct(spark):
    df = _payload_df(spark, [(1, b"RIFFxxxxWAVEabcd")])
    row = with_media_metadata(df).select("media_meta.*").collect()[0]
    assert row.mime == "audio/wav"
    assert row.n_bytes == 16
    import hashlib

    assert row.content_md5 == hashlib.md5(b"RIFFxxxxWAVEabcd").hexdigest()


def test_decode_features_schema_and_determinism(spark):
    df = _payload_df(spark, [(1, b"hello"), (2, b""), (3, None)])
    out = decode_features(df)
    assert out.columns == ["doc_id"] + [f"f{j}" for j in range(N_FAKE_FEATURES)]
    a = {r.doc_id: tuple(r)[1:] for r in out.collect()}
    b = {r.doc_id: tuple(r)[1:] for r in decode_features(df).collect()}
    assert a == b  # deterministic across runs
    assert all(0.0 <= v <= 1.0 for feats in a.values() for v in feats)
    # Empty and NULL payloads decode identically (both hash b"").
    assert a[2] == a[3]


def test_resize_media_contract(spark):
    """Stubbed resize keeps the real Spark contract: schema, row
    count, exact per-row output length, null/empty payload handling,
    and determinism across runs."""
    from data_ingestor_gluejob_script_spark.operators.multimodal import (
        resize_media,
    )

    df = spark.createDataFrame(
        [(1, b"abcdef"), (2, b""), (3, None), (4, b"x" * 1000)],
        "doc_id long, payload binary",
    )
    out = resize_media(df, width=8, height=4)
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "width", "height", "payload",
    ]
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 4
    assert all(len(r.payload) == 32 for r in rows.values())
    assert all(r.width == 8 and r.height == 4 for r in rows.values())
    # deterministic: empty and null payloads agree, reruns agree
    assert bytes(rows[2].payload) == bytes(rows[3].payload)
    again = {r.doc_id: r for r in resize_media(df, 8, 4).collect()}
    assert all(
        bytes(rows[k].payload) == bytes(again[k].payload) for k in rows
    )


def test_resize_series_pil_branch(monkeypatch):
    """The PIL-present branch of _resize_series: decodable payloads go
    through Image.open→convert('L')→resize→tobytes, undecodable ones
    fall back per row to the deterministic fake. Exercised with a stub
    PIL at the pandas level (Spark workers are separate processes, so
    a driver-side monkeypatch can't cross mapInPandas — the Spark-side
    plumbing is covered by test_resize_media_contract)."""
    import sys
    import types

    import pandas as pd

    from data_ingestor_gluejob_script_spark.operators import multimodal

    class _StubImg:
        def convert(self, mode):
            assert mode == "L"
            return self

        def resize(self, wh):
            self._wh = wh
            return self

        def tobytes(self):
            w, h = self._wh
            return b"\x7f" * (w * h)

    class _StubImage:
        @staticmethod
        def open(fp):
            if not fp.read().startswith(b"IMG!"):
                raise OSError("cannot identify image file")
            return _StubImg()

    pil = types.ModuleType("PIL")
    pil.Image = _StubImage
    monkeypatch.setitem(sys.modules, "PIL", pil)

    payload = pd.Series([b"IMG!realimagebytes", b"not an image", b"", None])
    out = multimodal._resize_series(payload, 8, 4)
    assert [len(b) for b in out] == [32, 32, 32, 32]
    assert bytes(out[0]) == b"\x7f" * 32  # decoded via the stub PIL
    # undecodable rows match the fake exactly (deterministic fallback)
    fake = multimodal._fake_resize(payload, 8, 4)
    assert [bytes(b) for b in out[1:]] == [bytes(b) for b in fake[1:]]
