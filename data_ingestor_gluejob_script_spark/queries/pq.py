"""Product quantization (PQ) for the embedding ANN family.

The int8 quantizer (`similarity.quantize_embeddings_frame`) cuts scan
bytes 4×; PQ is the next rung on the same ladder (Jégou et al., "
Product Quantization for Nearest Neighbor Search", TPAMI 2011; the
IVF-ADC pairing FAISS popularized): split each vector into ``M_PQ``
subvectors, quantize every subvector to its nearest entry in a
per-subspace codebook of ``K_PQ`` centroids, and keep only the ``M_PQ``
code bytes per vector — for the 64-float testdata embeddings that is
256 bytes → 8 bytes, 32×. Queries never decode the corpus: an
asymmetric-distance LUT of ``dot(query_subvec, centroid)`` per
(subspace, centroid) is broadcast (M_PQ × K_PQ doubles — metadata) and
each corpus row's approximate dot product is ``Σ_j lut[j][code_j]``, a
pure map over the code column.

Spark-first shapes, all frozen in tests/test_pq.py:

- **Codebooks are a one-row broadcast** built like the IVF seed
  (`similarity._ivf_centroid_row`): the first ``K_PQ`` vectors by
  vec_id sliced per subspace — deterministic, one-pass, reproducible
  across engines/partitionings. ``pq_refine`` layers Lloyd rounds per
  subspace on the same shape when a tighter codebook is worth it.
- **Encoding is map-only**: nested HOFs (transform over subspaces →
  argmin over centroids) run JVM-side in whole-stage codegen; the
  corpus never shuffles and never crosses into Python.
- **Scoring is map + top-k**: LUT broadcast, per-row HOF sum,
  ``orderBy().limit(k)`` → TakeOrderedAndProject, no global sort.
- **Exactness ladder**: ``pq_rescore_topk`` ranks the corpus by ADC
  cheaply, exact-rescores the top ``coarse_k`` in float64 cosine, and
  returns the final top-``k`` — same contract as
  ``quantized_rescore_topk`` (equality with brute force asserted on
  testdata), with the coarse pass reading 8-byte codes instead of
  64-byte int8 vectors.

Reference parity note: the reference engine has no ANN surface at all
(gluejob.py is row-store ingestion); this module is part of the
LLM-training-data extension the brief adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import (
    EMB_DIM,
    IVF_NPROBE,
    QUERY_VEC_ID,
    _ivf_centroid_row,
    cosine,
    ivf_assign,
    ivf_probe_cells,
)

M_PQ = 8  # subspaces
SUB_DIM = EMB_DIM // M_PQ  # dims per subvector
K_PQ = 16  # centroids per subspace (codes fit 4 bits; stored tinyint)

# r17 (same move as the BM25/SimHash builds): the nested encode/LUT/
# ADC higher-order expressions are JVM-parsed SQL strings instead of
# Python-assembled lambda trees — the analyzed plans are identical to
# the original builds modulo lambda-variable names (pinned by
# tests/test_pq.py::test_pq_sql_builds_match_lambda_builds), while
# construction drops ~3× of py4j driver time per call (x_ivfpq_topk
# was construction-dominated: ~1.5 s build vs ~1 s execute).
_DISTS_SQL = (
    f"transform(sequence(0, {M_PQ - 1}), j -> "
    f"transform(books[j], c -> "
    f"aggregate(zip_with(slice(cast(emb as array<double>), "
    f"j * {SUB_DIM} + 1, {SUB_DIM}), c, "
    f"(x, y) -> (x - y) * (x - y)), 0.0D, (acc, d) -> acc + d)))"
)
_CODES_SQL = (
    "transform(_dists, d -> "
    "cast(array_position(d, array_min(d)) - 1 as tinyint))"
)
_DLUT_SQL = (
    f"transform(sequence(0, {M_PQ - 1}), j -> transform(books[j], c -> "
    f"aggregate(zip_with(slice(qv, j * {SUB_DIM} + 1, {SUB_DIM}), c, "
    f"(x, y) -> x * y), 0.0D, (acc, d) -> acc + d)))"
)
_NLUT_SQL = (
    f"transform(sequence(0, {M_PQ - 1}), j -> transform(books[j], c -> "
    f"aggregate(zip_with(c, c, (x, y) -> x * y), 0.0D, "
    f"(acc, d) -> acc + d)))"
)
_QNORM_SQL = (
    "sqrt(aggregate(zip_with(qv, qv, (x, y) -> x * y), 0.0D, "
    "(acc, d) -> acc + d))"
)
_ADC_DOT_SQL = (
    f"aggregate(sequence(0, {M_PQ - 1}), 0.0D, "
    f"(acc, j) -> acc + dlut[j][cast(codes[j] as int)])"
)
_RNORM2_SQL = (
    f"aggregate(sequence(0, {M_PQ - 1}), 0.0D, "
    f"(acc, j) -> acc + nlut[j][cast(codes[j] as int)])"
)
_ADC_SIM_SQL = (
    f"({_ADC_DOT_SQL}) / (CASE WHEN "
    f"(sqrt({_RNORM2_SQL}) * q_norm > cast(0 as double)) "
    f"THEN sqrt({_RNORM2_SQL}) * q_norm END)"
)


def _subvec(vec: Column, j: Column | int) -> Column:
    """slice of ``vec`` for subspace j (1-based slice under the hood)."""
    start = (F.lit(j) if isinstance(j, int) else j) * SUB_DIM + 1
    return F.slice(vec, start, SUB_DIM)


# (_l2sq/_dot lambda helpers removed in r17 — the encode/LUT/ADC
# expressions that consumed them are JVM-parsed SQL now; their frozen
# twins live in tests/test_pq.py's plan-identity test.)


def pq_codebooks(emb: DataFrame) -> DataFrame:
    """One-row codebook frame: ``books`` = array[M_PQ] of array[K_PQ]
    of array<double>[SUB_DIM]. Seeded from the first ``K_PQ`` vectors
    by vec_id, sliced per subspace — the same deterministic one-pass
    seed rule as the IVF codebook (similarity.py), so results are
    engine- and partitioning-independent. K_PQ rows is metadata-sized;
    the ``collect_list`` runs over K_PQ rows, not the corpus."""
    seeds = (
        emb.orderBy("vec_id")
        .limit(K_PQ)
        .select(
            F.col("vec_id").cast("long").alias("sid"),
            F.col("emb").cast("array<double>").alias("v"),
        )
    )
    # one row per seed: array[M_PQ] of subvectors
    sliced = seeds.select(
        "sid",
        F.transform(
            F.sequence(F.lit(0), F.lit(M_PQ - 1)),
            lambda j: _subvec(F.col("v"), j),
        ).alias("subs"),
    )
    # transpose to subspace-major: books[j][c] = seed c's subvector j
    packed = sliced.agg(
        F.sort_array(F.collect_list(F.struct("sid", "subs"))).alias("rows")
    )
    return packed.select(
        F.transform(
            F.sequence(F.lit(0), F.lit(M_PQ - 1)),
            lambda j: F.transform(
                F.col("rows"), lambda r: r["subs"][j]
            ),
        ).alias("books")
    )


def pq_encode(emb: DataFrame, codebooks: DataFrame) -> DataFrame:
    """(vec_id, codes array<tinyint>[M_PQ]): each subvector replaced by
    the index of its nearest (squared-L2) codebook centroid, first
    index winning ties. Map-only: the one-row codebook broadcasts, the
    corpus never shuffles, and the nested HOFs stay JVM-side.

    The per-subspace distance arrays are PROJECTED first and the
    argmin reads the bound ``_dists`` attribute: HOF lambdas are
    interpreted with no common-subexpression elimination (the
    ngrams_col lesson, textops.py), so inlining the transform into
    both ``array_position`` and ``array_min`` would compute every
    subvector-centroid distance twice. CollapseProject keeps the
    split: ``_dists`` is referenced twice, so Catalyst won't re-inline
    a non-cheap expression."""
    with_dists = emb.crossJoin(F.broadcast(codebooks)).select(
        "vec_id", F.expr(_DISTS_SQL).alias("_dists")
    )
    return with_dists.select(
        "vec_id", F.expr(_CODES_SQL).alias("codes")
    )


def _query_luts(emb: DataFrame, query_vec_id: int, codebooks: DataFrame) -> DataFrame:
    """One-row broadcastable LUT frame for one query vector:
    ``dlut[j][c]`` = dot(query subvector j, centroid c) and
    ``nlut[j][c]`` = |centroid c of subspace j|² — M_PQ × K_PQ doubles
    each, metadata-sized at any corpus scale."""
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("emb").cast("array<double>").alias("qv")
    )
    return q.crossJoin(F.broadcast(codebooks)).select(
        F.expr(_DLUT_SQL).alias("dlut"),
        F.expr(_NLUT_SQL).alias("nlut"),
        F.expr(_QNORM_SQL).alias("q_norm"),
    )


def pq_adc_scores(
    codes: DataFrame, emb: DataFrame, query_vec_id: int, codebooks: DataFrame
) -> DataFrame:
    """(vec_id, adc_sim): approximate cosine of every coded vector vs
    the query — ``Σ_j dlut[j][code_j]`` over the reconstructed norm
    ``sqrt(Σ_j nlut[j][code_j])``. Pure map over the 8-byte code
    column with two broadcast one-row frames; the expensive float
    corpus is never touched."""
    return (
        codes.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(_query_luts(emb, query_vec_id, codebooks)))
        .select("vec_id", F.expr(_ADC_SIM_SQL).alias("adc_sim"))
    )


def pq_rescore_topk(
    emb: DataFrame, query_vec_id: int = QUERY_VEC_ID, k: int = 5,
    coarse_k: int = 50,
) -> DataFrame:
    """The PQ search ladder end-to-end: encode the corpus to 8-byte
    codes, rank by ADC approximate cosine (map over codes), keep the
    top ``coarse_k``, exact-rescore the survivors in float64 cosine,
    return the exact top-``k`` of the rescue set — (vec_id,
    cosine_sim), aliases matching the brute-force twin so results
    compare row-for-row.

    Scale shape: the coarse pass scans 8 bytes/vector (32× fewer than
    float32); the coarse top-k is TakeOrderedAndProject (no global
    sort); the rescore set is coarse_k rows → broadcast semi-join
    prunes the float corpus before any expensive math."""
    books = pq_codebooks(emb)
    coarse = (
        pq_adc_scores(pq_encode(emb, books), emb, query_vec_id, books)
        .orderBy(F.col("adc_sim").desc(), F.col("vec_id"))
        .limit(coarse_k)
        .select("vec_id")
    )
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("emb").alias("q_emb")
    )
    return (
        emb.join(F.broadcast(coarse), "vec_id", "left_semi")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine(F.col("emb"), F.col("q_emb")), 6).alias(
                "cosine_sim"
            ),
        )
        .orderBy(F.col("cosine_sim").desc(), F.col("vec_id"))
        .limit(k)
    )


def ivfpq_topk(
    emb: DataFrame, query_vec_id: int = QUERY_VEC_ID, k: int = 5,
    nprobe: int = IVF_NPROBE, coarse_k: int = 50,
) -> DataFrame:
    """IVF-PQ — the FAISS-style pairing of both index levels: the IVF
    cell assignment prunes the corpus to the query's ``nprobe`` most
    affine cells, ADC over 8-byte PQ codes ranks only those
    candidates, and the top ``coarse_k`` are exact-rescored in float64
    cosine. Returns (vec_id, cosine_sim), aliases matching the
    brute-force twin.

    Scale shape: both codebooks are one-row broadcasts; cell
    assignment and PQ encoding are map-only over the corpus (with the
    corpus persisted ``partitionBy("cell")`` the probe also
    partition-prunes the scan, as in ``ivf_search_join``); the ADC
    pass reads codes, not vectors, inside the probed cells; every
    join is a broadcast of metadata-sized frames. The corpus never
    hash-shuffles."""
    ivf_book = _ivf_centroid_row(emb)
    books = pq_codebooks(emb)
    corpus = ivf_assign(emb, ivf_book)
    probed = (
        emb.filter(F.col("vec_id") == query_vec_id)
        .crossJoin(F.broadcast(ivf_book))
        .select(
            F.explode(
                ivf_probe_cells(F.col("emb"), F.col("cents"), nprobe)
            ).alias("cell")
        )
    )
    cand = corpus.join(F.broadcast(probed), "cell").select("vec_id", "emb")
    coarse = (
        pq_adc_scores(pq_encode(cand, books), emb, query_vec_id, books)
        .orderBy(F.col("adc_sim").desc(), F.col("vec_id"))
        .limit(coarse_k)
        .select("vec_id")
    )
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("emb").alias("q_emb")
    )
    return (
        cand.join(F.broadcast(coarse), "vec_id", "left_semi")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine(F.col("emb"), F.col("q_emb")), 6).alias(
                "cosine_sim"
            ),
        )
        .orderBy(F.col("cosine_sim").desc(), F.col("vec_id"))
        .limit(k)
    )
