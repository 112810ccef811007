"""Reciprocal-rank fusion: python-oracle differential for the fused
hybrid search (both components are themselves oracle-verified
elsewhere — BM25 against DuckDB, cosine against the registered
q_similarity_topk contract), plus unit coverage of the fusion rules
(absent-id convention, tie-break, n_lists, truncation).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_ingestor_gluejob_script_spark.queries._util import load  # noqa: E402
from data_ingestor_gluejob_script_spark.queries.corpusstats import (  # noqa: E402
    bm25_topk_frame,
)
from data_ingestor_gluejob_script_spark.queries.retrieval import (  # noqa: E402
    RRF_K,
    hybrid_search,
    rrf_fuse,
)
from data_ingestor_gluejob_script_spark.queries.similarity import (  # noqa: E402
    _load_emb,
    _scored,
)

SF_DIR = "/root/testdata/sf0.001"
TERMS = ["scan", "window", "column"]


def rrf_oracle(lists, rrf_k=RRF_K, k=None):
    """lists: [[(id, score), ...], ...] — python twin of rrf_fuse.
    Repeated ids within one list sum their reciprocals but count the
    list once in n_lists."""
    scores: dict = {}
    nlists: dict = {}
    for lst in lists:
        ranked = sorted(lst, key=lambda t: (-t[1], t[0]))
        seen = set()
        for rank, (i, _) in enumerate(ranked, start=1):
            scores[i] = scores.get(i, 0.0) + 1.0 / (rrf_k + rank)
            if i not in seen:
                seen.add(i)
                nlists[i] = nlists.get(i, 0) + 1
    out = sorted(
        ((i, round(s, 9), nlists[i]) for i, s in scores.items()),
        key=lambda t: (-t[1], t[0]),
    )
    return out[:k] if k is not None else out


def test_rrf_fuse_unit(spark):
    a = spark.createDataFrame(
        [(1, 10.0), (2, 9.0), (3, 8.0)], "id long, score double"
    )
    b = spark.createDataFrame(
        [(3, 0.9), (4, 0.8), (2, 0.9)], "id long, score double"
    )
    got = [tuple(r) for r in rrf_fuse([a, b]).collect()]
    want = rrf_oracle([[(1, 10.0), (2, 9.0), (3, 8.0)],
                       [(3, 0.9), (4, 0.8), (2, 0.9)]])
    assert got == want
    # id 2 and 3 appear in both lists; 1 and 4 in one each
    by_id = {i: (s, n) for i, s, n in got}
    assert by_id[2][1] == 2 and by_id[3][1] == 2
    assert by_id[1][1] == 1 and by_id[4][1] == 1
    # truncation
    assert [r["id"] for r in rrf_fuse([a, b], k=2).collect()] == [
        w[0] for w in want[:2]
    ]


def test_hybrid_search_differential(spark):
    docs = load(spark, SF_DIR, "documents")
    emb = _load_emb(spark, SF_DIR)
    k = 10
    got = [tuple(r) for r in hybrid_search(docs, emb, TERMS, k=k).collect()]

    lex = [
        (r["doc_id"], r["bm25"])
        for r in bm25_topk_frame(docs, TERMS, k=2 * k).collect()
    ]
    dense_all = sorted(
        (
            (r["vec_id"], r["cosine_sim"])
            for r in _scored(emb).collect()
        ),
        key=lambda t: (-t[1], t[0]),
    )[: 2 * k]
    want = rrf_oracle([lex, dense_all], k=k)
    assert got == want
    assert len(got) == k
    # the fusion genuinely mixes modalities: at least one result came
    # from only one of the two lists
    assert any(n == 1 for _, _, n in got)


def test_rrf_fuse_repeated_id_within_one_list(spark):
    """Second-pass review finding: a per-(query, doc) frame can carry
    the same id twice in one list; the fusion must sum the
    contributions into ONE output row, not fan out duplicates."""
    a = spark.createDataFrame(
        [(1, 10.0), (2, 9.0), (1, 8.0)], "id long, score double"
    )
    b = spark.createDataFrame([(2, 0.5)], "id long, score double")
    got = [tuple(r) for r in rrf_fuse([a, b]).collect()]
    want = rrf_oracle([[(1, 10.0), (2, 9.0), (1, 8.0)], [(2, 0.5)]])
    assert got == want
    ids = [i for i, _, _ in got]
    assert ids.count(1) == 1  # one fused row despite the repeat
    by_id = {i: s for i, s, _ in got}
    assert by_id[1] == round(1 / 61 + 1 / 63, 9)


def test_rrf_fuse_empty_list_raises(spark):
    import pytest

    with pytest.raises(ValueError):
        rrf_fuse([])


def test_rrf_fuse_accepts_per_query_search_join_output(spark):
    """The reviewer's scenario as an integration case: a multi-query
    bm25_search_join frame carries the same doc under several
    queries; fusing it whole must sum that doc's contributions into
    one row (per-list groupBy), matching the oracle fed the same
    (id, score) multiset."""
    from data_ingestor_gluejob_script_spark.queries.corpusstats import (
        bm25_search_join,
    )
    import pyspark.sql.functions as F

    docs = load(spark, SF_DIR, "documents")
    queries = docs.filter(F.col("doc_id") % 100 == 0).selectExpr(
        "doc_id AS query_id", "text"
    )
    res = bm25_search_join(docs, queries, k=5).select(
        F.col("doc_id").alias("id"), F.col("bm25").alias("score")
    )
    rows = [(r["id"], r["score"]) for r in res.collect()]
    assert len(rows) > len({i for i, _ in rows})  # real repeats
    got = [tuple(r) for r in rrf_fuse([res]).collect()]
    assert got == rrf_oracle([rows])
    assert len(got) == len({i for i, _ in rows})
