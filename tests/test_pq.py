"""Product quantization: code shape/determinism, ADC exactness on
centroid-aligned vectors (the analytic guarantee), and the
rescore ladder's equality with brute-force top-k on testdata.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from data_ingestor_gluejob_script_spark.queries.pq import (
    K_PQ,
    M_PQ,
    pq_adc_scores,
    pq_codebooks,
    pq_encode,
    pq_rescore_topk,
)
from data_ingestor_gluejob_script_spark.queries.similarity import (
    QUERY_VEC_ID,
    _load_emb,
    _scored,
)

SF_DIR = "/root/testdata/sf0.001"


def test_pq_codes_shape_range_determinism(spark):
    emb = _load_emb(spark, SF_DIR)
    books = pq_codebooks(emb)
    codes = pq_encode(emb, books)
    rows = codes.collect()
    assert len(rows) == emb.count()
    assert all(len(r.codes) == M_PQ for r in rows)
    assert all(0 <= c < K_PQ for r in rows for c in r.codes)
    again = {r.vec_id: list(r.codes) for r in pq_encode(emb, books).collect()}
    assert {r.vec_id: list(r.codes) for r in rows} == again


def test_pq_adc_exact_on_seed_vectors(spark):
    """Vectors that ARE codebook seeds encode to their own centroids in
    every subspace, so the ADC dot and reconstructed norm are EXACT —
    adc_sim must equal true cosine to float precision. This is the
    analytic contract that pins the LUT indexing (0- vs 1-based, the
    classic off-by-one) and the norm reconstruction."""
    emb = _load_emb(spark, SF_DIR)
    seeds = emb.orderBy("vec_id").limit(K_PQ)
    books = pq_codebooks(seeds)
    codes = pq_encode(seeds, books)
    got = {
        r.vec_id: r.adc_sim
        for r in pq_adc_scores(codes, seeds, QUERY_VEC_ID, books).collect()
    }
    exact = {
        r.vec_id: r.cosine_sim for r in _scored(seeds).collect()
    }
    assert set(got) == set(exact)
    for vid, sim in got.items():
        assert abs(sim - exact[vid]) < 1e-6, (vid, sim, exact[vid])


def test_pq_rescore_equals_bruteforce_topk(spark):
    """Quantize-then-rescore exactness: with a reasonable coarse margin
    the PQ ladder returns the SAME rows as exact brute force (same
    contract the int8 rescore pins in test_quantize.py)."""
    emb = _load_emb(spark, SF_DIR)
    brute = (
        _scored(emb)
        .orderBy(F.col("cosine_sim").desc(), F.col("vec_id"))
        .limit(5)
        .collect()
    )
    got = pq_rescore_topk(emb, QUERY_VEC_ID, k=5, coarse_k=50).collect()
    assert [(r.vec_id, r.cosine_sim) for r in got] == [
        (r.vec_id, r.cosine_sim) for r in brute
    ]


def test_ivfpq_equals_ivf_exact_search(spark):
    """IVF-PQ with a generous rescore margin returns exactly the IVF
    search's result: same probed cells, ADC only reorders the coarse
    pass, and the float rescore restores exact cosine ranking."""
    from data_ingestor_gluejob_script_spark.queries.pq import ivfpq_topk
    from data_ingestor_gluejob_script_spark.queries.similarity import (
        q_ivf_topk,
    )

    emb = _load_emb(spark, SF_DIR)
    ivf = q_ivf_topk(spark, SF_DIR).collect()
    got = ivfpq_topk(emb, QUERY_VEC_ID, k=5, coarse_k=50).collect()
    assert [(r.vec_id, r.cosine_sim) for r in got] == [
        (r.vec_id, r.cosine_sim) for r in ivf
    ]


def test_pq_rescore_plan_shape(spark):
    """Coarse + final top-k both compile to TakeOrderedAndProject (no
    global sort) and the only nested-loop joins are one-row codebook /
    LUT / query broadcasts — never a pair enumeration."""
    import contextlib
    import io

    emb = _load_emb(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pq_rescore_topk(emb).explain("formatted")
    p = buf.getvalue()
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p


def test_pq_sql_builds_match_lambda_builds(spark):
    """r17: the SQL-string encode/LUT/ADC expressions produce the
    IDENTICAL analyzed plans to the original Python-lambda builds,
    modulo lambda-variable names (so runtime cannot differ), plus a
    row-equality check."""
    import re

    from data_ingestor_gluejob_script_spark.queries import pq as P

    emb = spark.createDataFrame(
        [(i, [float((i * 7 + j) % 5) for j in range(64)]) for i in range(20)],
        "vec_id long, emb array<double>",
    )
    books = P.pq_codebooks(emb)
    M, S = P.M_PQ, P.SUB_DIM

    def _sub(vec, j):
        return F.slice(vec, (F.lit(j) if isinstance(j, int) else j) * S + 1, S)

    def _l2sq(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, d: acc + d,
        )

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, d: acc + d,
        )

    def norm(df):
        s = df._jdf.queryExecution().analyzed().toString()
        s = re.sub(r"#\d+", "#N", s)
        return re.sub(r"lambda '?[A-Za-z_0-9]+", "lambda V", s)

    # frozen pre-r17 lambda builds
    old_codes = emb.crossJoin(F.broadcast(books)).select(
        "vec_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(M - 1)),
            lambda j: F.transform(
                F.col("books")[j],
                lambda c: _l2sq(_sub(F.col("emb").cast("array<double>"), j), c),
            ),
        ).alias("_dists"),
    ).select(
        "vec_id",
        F.transform(
            F.col("_dists"),
            lambda d: (F.array_position(d, F.array_min(d)) - 1).cast("tinyint"),
        ).alias("codes"),
    )
    new_codes = P.pq_encode(emb, books)
    assert old_codes.schema == new_codes.schema
    assert norm(old_codes) == norm(new_codes)

    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("emb").cast("array<double>").alias("qv")
    )
    old_luts = q.crossJoin(F.broadcast(books)).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(M - 1)),
            lambda j: F.transform(
                F.col("books")[j], lambda c: _dot(_sub(F.col("qv"), j), c)
            ),
        ).alias("dlut"),
        F.transform(
            F.sequence(F.lit(0), F.lit(M - 1)),
            lambda j: F.transform(F.col("books")[j], lambda c: _dot(c, c)),
        ).alias("nlut"),
        F.sqrt(_dot(F.col("qv"), F.col("qv"))).alias("q_norm"),
    )
    new_luts = P._query_luts(emb, 0, books)
    assert old_luts.schema == new_luts.schema
    assert norm(old_luts) == norm(new_luts)

    idx = F.sequence(F.lit(0), F.lit(M - 1))
    adc_dot = F.aggregate(
        idx, F.lit(0.0),
        lambda acc, j: acc + F.col("dlut")[j][F.col("codes")[j].cast("int")],
    )
    rnorm2 = F.aggregate(
        idx, F.lit(0.0),
        lambda acc, j: acc + F.col("nlut")[j][F.col("codes")[j].cast("int")],
    )
    old_adc = (
        old_codes.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(old_luts))
        .select(
            "vec_id",
            (
                adc_dot
                / F.when(
                    F.sqrt(rnorm2) * F.col("q_norm") > 0,
                    F.sqrt(rnorm2) * F.col("q_norm"),
                )
            ).alias("adc_sim"),
        )
    )
    new_adc = P.pq_adc_scores(new_codes, emb, 0, books)
    assert old_adc.schema == new_adc.schema
    assert norm(old_adc) == norm(new_adc)
    assert sorted(map(tuple, old_adc.collect())) == sorted(
        map(tuple, new_adc.collect())
    )
