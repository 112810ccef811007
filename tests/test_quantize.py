"""Int8 embedding quantization: DuckDB differential on the quantized
representation, the per-element reconstruction error bound, and
retrieval recall of the quantized search against the exact ranking.
Unregistered surface (gate pinned at 50) — this file is its oracle
verification, like scrub/IVF/corpusstats.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pyspark.sql.functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_ingestor_gluejob_script_spark.queries.similarity import (  # noqa: E402
    QUANTIZE_ORACLE,
    TOP_K,
    _load_emb,
    _scored,
    quantize_embeddings_frame,
    quantized_topk,
)

SF_DIR = "/root/testdata/sf0.001"


def test_quantize_differential(spark):
    got = quantize_embeddings_frame(_load_emb(spark, SF_DIR)).select(
        "vec_id", F.round("scale", 9).alias("scale_r"), "qvec"
    )
    s_rows = {r.vec_id: (r.scale_r, r.qvec) for r in got.collect()}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS "
        f"SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    o_rows = {
        vid: (sc, qv) for vid, sc, qv in con.execute(QUANTIZE_ORACLE).fetchall()
    }
    assert len(s_rows) == len(o_rows) > 0
    assert s_rows == o_rows


def test_quantize_error_bound(spark):
    """|x - q*scale| <= scale/2 per element (half-ulp of the grid),
    and every quantized value is inside the int8 range."""
    q = quantize_embeddings_frame(_load_emb(spark, SF_DIR))
    err = F.array_max(
        F.zip_with(
            F.col("emb"),
            F.col("qvec"),
            lambda x, qv: F.abs(x - qv.cast("double") * F.col("scale")),
        )
    )
    bad = q.filter(
        (err > F.col("scale") / 2 + 1e-12)
        | (F.array_max(F.transform("qvec", lambda v: F.abs(v.cast("int")))) > 127)
    )
    assert bad.count() == 0


def test_quantize_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])],
        "vec_id long, emb array<double>",
    )
    rows = {r.vec_id: r for r in quantize_embeddings_frame(df).collect()}
    assert rows[1].scale == 0.0 and rows[1].qvec == [0, 0, 0]
    assert rows[2].scale == 2.0 / 127.0
    assert rows[2].qvec == [64, -127, 32]


def test_quantized_topk_recall(spark):
    """The int8 search must recover most of the exact cosine top-k:
    >= 4 of 5 on the testdata query vector (dot-vs-cosine and
    quantization noise may swap the tail, never the head)."""
    emb = _load_emb(spark, SF_DIR)
    exact = {
        r.vec_id
        for r in _scored(emb)
        .orderBy(F.col("cosine_sim").desc(), F.col("vec_id").asc())
        .limit(TOP_K)
        .collect()
    }
    approx = {r.vec_id for r in quantized_topk(emb, 0, TOP_K).collect()}
    assert len(approx) == TOP_K
    assert len(exact & approx) >= TOP_K - 1


def test_quantized_rescore_equals_exact(spark):
    """With a 10x coarse margin the rescored result must EQUAL the
    exact brute-force top-k, row for row — the approximation lives
    only in candidate selection, and the margin absorbs it."""
    from data_ingestor_gluejob_script_spark.queries.similarity import (
        quantized_rescore_topk,
    )

    emb = _load_emb(spark, SF_DIR)
    exact = (
        _scored(emb)
        .orderBy(F.col("cosine_sim").desc(), F.col("vec_id").asc())
        .limit(TOP_K)
        .collect()
    )
    got = quantized_rescore_topk(emb, 0, TOP_K, coarse_k=50).collect()
    assert [(r.vec_id, r.cosine_sim) for r in got] == [
        (r.vec_id, r.cosine_sim) for r in exact
    ]
