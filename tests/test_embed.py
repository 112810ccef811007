"""Document embedding plumbing: determinism across partitionings and
batch boundaries, unit-norm output, identical-text collapse, and the
end-to-end text → SemDeDup composition grouping exact duplicates.
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import pyspark.sql.functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_ingestor_gluejob_script_spark.operators.embed import (  # noqa: E402
    EMBED_DIM,
    embed_documents,
    semantic_dedup_docs,
    table_encoder,
)
from data_ingestor_gluejob_script_spark.queries._util import load  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def test_embed_deterministic_across_partitionings(spark):
    docs = load(spark, SF_DIR, "documents").limit(50)
    one = {
        r.doc_id: tuple(r.emb)
        for r in embed_documents(docs.coalesce(1)).collect()
    }
    many = {
        r.doc_id: tuple(r.emb)
        for r in embed_documents(docs.repartition(7)).collect()
    }
    assert one == many
    assert len(one) == 50
    for v in one.values():
        assert len(v) == EMBED_DIM
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-9


def test_embed_identical_texts_identical_vectors(spark):
    docs = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other text")],
        "doc_id long, text string",
    )
    got = {r.doc_id: tuple(r.emb) for r in embed_documents(docs).collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]


def test_embed_null_text_is_stable(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "x")], "doc_id long, text string"
    )
    got = {r.doc_id: tuple(r.emb) for r in embed_documents(docs).collect()}
    # null embeds like empty text, deterministically
    assert got[1] == got[2] != got[3]


def test_semantic_dedup_docs_groups_exact_duplicates(spark):
    docs = load(spark, SF_DIR, "documents").limit(200)
    # duplicate 20 texts under fresh ids: each clone MUST share a
    # group with its original (cosine 1.0, same cell by construction)
    clones = (
        docs.limit(20)
        .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )
    both = docs.select("doc_id", "text").unionByName(clones)
    out = semantic_dedup_docs(both)
    assert out.count() == 220
    g = {r.doc_id: r.group_id for r in out.collect()}
    orig_ids = [r.doc_id for r in docs.limit(20).select("doc_id").collect()]
    for oid in orig_ids:
        assert g[oid] == g[oid + 1_000_000]
    # representatives keep the lowest id of each group
    reps = {
        r.group_id
        for r in out.filter(F.col("is_representative")).collect()
    }
    assert all(gid in reps for gid in g.values())
    # clones are never representatives (their original has a lower id)
    assert not any(
        r.is_representative and r.doc_id >= 1_000_000
        for r in out.collect()
    )


def test_semantic_dedup_docs_file_backed_encoder_seam(spark, tmp_path):
    """The real-model seam: a precomputed id→vec parquet table (the
    shape a real encoder's batch-inference export has) drops in via
    ``encoder=table_encoder(...)`` with no operator changes, and —
    because the stand-in wrote the table — reproduces the default
    path's output exactly."""
    docs = load(spark, SF_DIR, "documents").limit(120)
    path = str(tmp_path / "embeddings")
    # export under NON-default column names to prove the id_col/vec_col
    # seam parameters actually work (review finding: they didn't)
    embed_documents(docs).selectExpr(
        "doc_id as id", "emb as vector"
    ).write.parquet(path)
    emb_table = spark.read.parquet(path)

    via_table = semantic_dedup_docs(
        docs, encoder=table_encoder(emb_table, id_col="id", vec_col="vector")
    )
    default = semantic_dedup_docs(docs)
    a = sorted(
        (r.doc_id, r.group_id, r.is_representative)
        for r in via_table.collect()
    )
    b = sorted(
        (r.doc_id, r.group_id, r.is_representative)
        for r in default.collect()
    )
    assert a == b
    assert len(a) == 120
