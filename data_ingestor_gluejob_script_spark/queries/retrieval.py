"""Hybrid retrieval: reciprocal-rank fusion (RRF) of ranked result
lists — the standard way modern pipelines combine lexical (BM25) and
dense (ANN) retrieval without calibrating their incomparable score
scales (Cormack, Clarke & Büttcher 2009: score(d) = Σ_lists
1/(rrf_k + rank_d), rrf_k = 60).

In a curation engine this powers the strongest decontamination net
(a benchmark question that retrieves a training doc through EITHER
lexical or semantic similarity flags it) and hard-negative mining
(high-rank non-answers from both retrievers).

Scale shape: the inputs are top-k RESULT frames (k rows each — the
expensive corpus work already happened inside bm25_topk_frame /
ANN search, each of which scans the corpus once); ranking them is a
k-row window and the fusion is a full outer join of k-row frames.
Everything here is bounded by k · #lists, independent of corpus size.

Not driver-registered (inventory pinned at 50); python-oracle
differential in tests/test_retrieval.py, benched as x_hybrid_search.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_K = 60


def _ranked(frame: DataFrame, id_col: str, score_col: str) -> DataFrame:
    """(id, rank) with rank 1 = best score, doc-id tie-break. The
    global-order window is safe: it runs over a top-k RESULT frame
    (≤k rows by contract), never over a corpus — allowlisted in
    tests/test_plans.py with this justification."""
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    return frame.select(
        F.col(id_col).alias("id"), F.row_number().over(w).alias("rank")
    )


def rrf_fuse(
    ranked_lists: list[DataFrame],
    id_col: str = "id",
    score_col: str = "score",
    rrf_k: int = RRF_K,
    k: int | None = None,
) -> DataFrame:
    """Fuse N ranked result frames (each (id_col, score_col, ...))
    into (id, rrf_score, n_lists) ordered best-first; ``k`` truncates
    the fused list. An id absent from a list contributes nothing for
    that list (the standard convention); an id appearing MORE THAN
    ONCE in one list (e.g. a per-(query, doc) frame passed whole)
    contributes the sum of its ranks' reciprocals for that list — the
    per-list groupBy below makes that well-defined instead of letting
    the fusion join fan out duplicated rows (round-9 second-pass
    review finding). rrf_score is rounded to 9 dp for engine-portable
    determinism; ties break by id."""
    if not ranked_lists:
        raise ValueError("rrf_fuse: need at least one ranked list")
    fused = None
    for i, frame in enumerate(ranked_lists):
        r = (
            _ranked(frame, id_col, score_col)
            .select(
                "id",
                (F.lit(1.0) / (F.lit(rrf_k) + F.col("rank"))).alias(
                    f"_c{i}"
                ),
            )
            .groupBy("id")
            .agg(F.sum(f"_c{i}").alias(f"_c{i}"))
        )
        fused = r if fused is None else fused.join(r, "id", "full_outer")
    contribs = [F.col(f"_c{i}") for i in range(len(ranked_lists))]
    score = sum(
        (F.coalesce(c, F.lit(0.0)) for c in contribs), F.lit(0.0)
    )
    n_lists = sum(
        (c.isNotNull().cast("int") for c in contribs), F.lit(0)
    )
    out = fused.select(
        "id",
        F.round(score, 9).alias("rrf_score"),
        n_lists.alias("n_lists"),
    ).orderBy(F.col("rrf_score").desc(), F.col("id").asc())
    return out.limit(k) if k is not None else out


def hybrid_search(
    docs: DataFrame,
    emb: DataFrame,
    query_terms: list[str],
    k: int = 10,
    max_df_frac: float | None = None,
    df_table: DataFrame | None = None,
) -> DataFrame:
    """Lexical + dense hybrid search over the shared id space
    (documents.doc_id ↔ embeddings.vec_id in the testdata): BM25
    top-2k for the term bag fused with exact cosine top-2k around the
    similarity module's QUERY_VEC_ID query vector, RRF-truncated to
    k. Each component scans its corpus once (the cosine side compiles
    to the brute-force broadcast + TakeOrdered plan of
    q_similarity_topk); the fusion is k-row work."""
    from .corpusstats import bm25_topk_frame
    from .similarity import _scored

    lex = bm25_topk_frame(
        docs, query_terms, k=2 * k, max_df_frac=max_df_frac,
        df_table=df_table,
    ).select(
        F.col("doc_id").alias("id"), F.col("bm25").alias("score")
    )
    dense = (
        _scored(emb)
        .orderBy(F.col("cosine_sim").desc(), F.col("vec_id"))
        .limit(2 * k)
        .select(
            F.col("vec_id").alias("id"),
            F.col("cosine_sim").alias("score"),
        )
    )
    return rrf_fuse([lex, dense], k=k)
