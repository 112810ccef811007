"""q_seq_pack edge semantics the driver oracle can't see: the testdata
has dense doc_ids 0..N, so block gaps, empty blocks, and single-doc
blocks are never exercised there. The distributed block prefix sum must
equal the sequential scan for ANY doc_id distribution."""

from __future__ import annotations

import os
import random

import pytest

from data_ingestor_gluejob_script_spark.queries.traindata import (
    PACK_BLOCK,
    PACK_TOKENS,
    q_seq_pack,
)


def _write_documents(spark, tmp_path, docs):
    """Materialize (doc_id, text) rows as a documents.parquet the query
    loads like real testdata."""
    sf_dir = str(tmp_path)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "documents.parquet")
    )
    return sf_dir


def _expected(docs):
    """Sequential reference: running token count in doc_id order."""
    out = {}
    before = 0
    for doc_id, text in sorted(docs):
        n = len(text.split(" "))
        out[doc_id] = (n, before, before // PACK_TOKENS, before % PACK_TOKENS)
        before += n
    return out


@pytest.mark.parametrize("seed", [7, 99])
def test_seq_pack_matches_sequential_scan_on_sparse_ids(
    spark, tmp_path, seed
):
    rng = random.Random(seed)
    # Sparse ids spanning many blocks: gaps inside blocks, entirely
    # empty blocks, and blocks with a single doc.
    ids = rng.sample(range(10 * PACK_BLOCK), 400)
    docs = [
        (i, " ".join(f"w{k}" for k in range(rng.randint(1, 50))))
        for i in ids
    ]
    sf_dir = _write_documents(spark, tmp_path, docs)

    got = {
        r.doc_id: (r.n_tokens, r.tokens_before, r.pack_id, r.pack_offset)
        for r in q_seq_pack(spark, sf_dir).collect()
    }
    assert got == _expected(docs)


def test_seq_pack_single_doc_and_boundary_straddle(spark, tmp_path):
    # One doc bigger than a pack: the NEXT doc's offset wraps by modulo
    # (documented banded-form semantics: a straddling doc is sliced by
    # a downstream map, assignment itself never splits).
    docs = [
        (0, " ".join(["a"] * (PACK_TOKENS + 10))),
        (PACK_BLOCK + 1, "b c"),  # lands in block 1; block 0 total carries over
    ]
    sf_dir = _write_documents(spark, tmp_path, docs)
    got = {
        r.doc_id: (r.tokens_before, r.pack_id, r.pack_offset)
        for r in q_seq_pack(spark, sf_dir).collect()
    }
    assert got[0] == (0, 0, 0)
    assert got[PACK_BLOCK + 1] == (PACK_TOKENS + 10, 1, 10)


def test_pack_slices_differential_and_conservation(spark):
    """Boundary slicing: DuckDB differential over the real manifest,
    plus the conservation laws that make slices shard-ready — every
    doc's slice lengths sum to its token count, every pack except the
    last is exactly full, and offsets tile each pack gaplessly."""
    import duckdb
    import pyspark.sql.functions as F

    from data_ingestor_gluejob_script_spark.queries._util import load
    from data_ingestor_gluejob_script_spark.queries.traindata import (
        PACK_SLICES_ORACLE,
        PACK_TOKENS,
        pack_slices_frame,
        q_seq_pack,
    )

    sf = "/root/testdata/sf0.001"
    manifest = q_seq_pack(spark, sf)
    got = pack_slices_frame(manifest)
    s_cols = got.columns
    s_rows = [tuple(r) for r in got.collect()]

    manifest_sql = f"""
        SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
               CAST(COALESCE(sum(len(string_split(text, ' '))) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS tokens_before
        FROM read_parquet('{sf}/documents.parquet')
    """
    con = duckdb.connect()
    cur = con.execute(PACK_SLICES_ORACLE.format(manifest_sql=manifest_sql))
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()
    assert sorted(s_cols) == sorted(o_cols)

    def multiset(cols, rows):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        return sorted(tuple(str(r[i]) for i in order) for r in rows)

    assert multiset(s_cols, s_rows) == multiset(o_cols, o_rows)

    # conservation: per-doc slice lengths reassemble the document
    per_doc = (
        got.groupBy("doc_id").agg(F.sum("slice_len").alias("s"))
        .join(manifest, "doc_id")
    )
    assert per_doc.filter(F.col("s") != F.col("n_tokens")).count() == 0
    # packs tile exactly: all full except the last
    per_pack = got.groupBy("pack_id").agg(F.sum("slice_len").alias("s"))
    last_pack = per_pack.agg(F.max("pack_id")).collect()[0][0]
    assert per_pack.filter(
        (F.col("pack_id") != last_pack) & (F.col("s") != PACK_TOKENS)
    ).count() == 0
    # offsets within each pack are gapless from 0
    w_ok = (
        got.groupBy("pack_id")
        .agg(
            F.min("pack_offset").alias("mn"),
            F.max(F.col("pack_offset") + F.col("slice_len")).alias("mx"),
            F.sum("slice_len").alias("s"),
        )
        .filter((F.col("mn") != 0) | (F.col("mx") != F.col("s")))
    )
    assert w_ok.count() == 0
    # straddling docs exist in this corpus (packs are smaller than
    # the doc stream), so the boundary path is exercised
    assert got.groupBy("doc_id").count().filter("count > 1").count() > 0
