"""Differentials for the information-theoretic quality signals
(queries/quality.py): numpy/zlib Spark path vs the stdlib-only
Counter/math twin, plus the pass-through and filter contracts."""

from __future__ import annotations

import pytest

from data_ingestor_gluejob_script_spark.queries.quality import (
    compression_signals_frame,
    filter_low_information,
    oracle_signals,
    with_compression_signals,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),  # degenerate
    (2, "spam " * 200),  # highly compressible template
    (3, ""),  # empty
    (4, None),  # null
    (5, "naïve café — résumé ünïcödé 你好世界 🎉"),  # multibyte
    (6, "x"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_signals_differential(spark, docs_df):
    got = {
        r["doc_id"]: r
        for r in compression_signals_frame(docs_df).collect()
    }
    assert len(got) == len(DOCS)
    for i, text in DOCS:
        raw, z, ratio, ent = oracle_signals(text)
        r = got[i]
        assert r["raw_bytes"] == raw, (i, text)
        assert r["zlib_bytes"] == z, (i, text)
        if ratio is None:
            assert r["comp_ratio"] is None
            assert r["char_entropy"] is None
        else:
            assert r["comp_ratio"] == pytest.approx(ratio, abs=1e-12)
            assert r["char_entropy"] == pytest.approx(ent, abs=1e-9)


def test_signals_differential_on_testdata(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = compression_signals_frame(docs).collect()
    texts = {
        r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()
    }
    assert len(rows) == len(texts)
    for r in rows:
        raw, z, ratio, ent = oracle_signals(texts[r["doc_id"]])
        assert r["raw_bytes"] == raw
        assert r["zlib_bytes"] == z
        assert r["comp_ratio"] == pytest.approx(ratio, abs=1e-12)
        assert r["char_entropy"] == pytest.approx(ent, abs=1e-9)


def test_passthrough_matches_report_and_keeps_columns(spark, docs_df):
    extra = docs_df.withColumn("tag", docs_df.doc_id * 10)
    wide = with_compression_signals(extra)
    assert wide.columns == ["doc_id", "text", "tag", "raw_bytes", "zlib_bytes", "comp_ratio", "char_entropy"]
    report = {
        r["doc_id"]: r for r in compression_signals_frame(docs_df).collect()
    }
    for r in wide.collect():
        assert r["tag"] == r["doc_id"] * 10
        for c in ("raw_bytes", "zlib_bytes", "comp_ratio", "char_entropy"):
            assert r[c] == report[r["doc_id"]][c], (r["doc_id"], c)


def test_partitioning_invariance(spark, docs_df):
    one = {
        r["doc_id"]: r
        for r in compression_signals_frame(docs_df.coalesce(1)).collect()
    }
    many = {
        r["doc_id"]: r
        for r in compression_signals_frame(docs_df.repartition(5)).collect()
    }
    assert one == many


def test_filter_low_information(spark, docs_df):
    kept = sorted(
        r["doc_id"]
        for r in filter_low_information(
            docs_df, min_comp_ratio=0.2, min_entropy=2.0
        ).collect()
    )
    # prose and unicode survive; the 'a' run fails entropy, the spam
    # template fails compression, empty/null carry no evidence, and
    # the 1-char doc fails entropy
    assert kept == [0, 5]
