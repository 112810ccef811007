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
