"""Corpus token statistics: DuckDB differentials over the real
documents table plus the short-document edges the testdata never
exercises (all synthetic docs are ≥3 words). Not driver-registered
(gate pinned at 50) — this file IS their oracle verification,
mirroring the scrub/IVF precedents.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest
import pyspark.sql.functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_ingestor_gluejob_script_spark.queries._util import load  # noqa: E402
from data_ingestor_gluejob_script_spark.queries.corpusstats import (  # noqa: E402
    REPETITION_ORACLE,
    TFIDF_ORACLE,
    VOCAB_ORACLE,
    ngrams_col,
    repetition_frame,
    tfidf_topk_frame,
    vocab_frame,
)

SF_DIR = "/root/testdata/sf0.001"


def _multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(str(r[i]) for i in order) for r in rows)


def _oracle(sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    cur = con.execute(sql)
    return [d[0] for d in cur.description], cur.fetchall()


def _assert_differential(got, sql):
    s_cols, s_rows = got.columns, [tuple(r) for r in got.collect()]
    o_cols, o_rows = _oracle(sql)
    assert sorted(s_cols) == sorted(o_cols)
    assert len(s_rows) == len(o_rows) > 0
    assert _multiset(s_cols, s_rows) == _multiset(o_cols, o_rows)


def test_vocab_differential(spark):
    docs = load(spark, SF_DIR, "documents")
    _assert_differential(vocab_frame(docs), VOCAB_ORACLE)


def test_vocab_conservation(spark):
    """sum(n_occurrences) over the vocab == total whitespace tokens —
    the counting pass loses nothing."""
    docs = load(spark, SF_DIR, "documents")
    total = vocab_frame(docs).agg(F.sum("n_occurrences")).collect()[0][0]
    expect = docs.select(
        F.sum(F.size(F.split("text", " ")))
    ).collect()[0][0]
    assert total == expect


def test_vocab_min_count(spark):
    docs = load(spark, SF_DIR, "documents")
    v = vocab_frame(docs, min_count=5)
    assert v.filter(F.col("n_occurrences") < 5).count() == 0
    assert v.count() > 0


def test_repetition_differential(spark):
    docs = load(spark, SF_DIR, "documents")
    _assert_differential(repetition_frame(docs, n=2), REPETITION_ORACLE)


def test_repetition_short_docs(spark):
    """Documents shorter than n words surface with zero counts, not
    dropped — and ngrams_col never hits ANSI slice errors on them."""
    docs = spark.createDataFrame(
        [(1, "solo"), (2, "two words"), (3, "a a a a")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_frame(docs, n=2).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1].n_grams == 0 and rows[1].top_ngram_frac == 0.0
    assert rows[2].n_grams == 1 and rows[2].top_ngram_frac == 1.0
    # "a a" appears 3 times out of 3 grams -> degenerate repetition
    assert rows[3].n_grams == 3 and rows[3].top_ngram_frac == 1.0


def test_ngrams_col_values(spark):
    got = spark.createDataFrame([("w1 w2 w3",)], "text string").select(
        ngrams_col(F.split("text", " "), 2).alias("g")
    ).collect()[0].g
    assert got == ["w1 w2", "w2 w3"]


def test_tfidf_differential(spark):
    docs = load(spark, SF_DIR, "documents")
    _assert_differential(
        tfidf_topk_frame(docs, k=3), TFIDF_ORACLE.format(k=3)
    )


def test_tfidf_shape(spark):
    """Every doc gets at most k rows, ranks are 1..k, and the top term
    of a doc scores >= its rank-2 term."""
    docs = load(spark, SF_DIR, "documents")
    out = tfidf_topk_frame(docs, k=2)
    per_doc = out.groupBy("doc_id").agg(
        F.count("*").alias("n"),
        F.min("rank").alias("lo"),
        F.max("rank").alias("hi"),
    )
    bad = per_doc.filter(
        (F.col("n") > 2) | (F.col("lo") != 1) | (F.col("hi") > 2)
    )
    assert bad.count() == 0
    pairs = (
        out.groupBy("doc_id")
        .pivot("rank", [1, 2])
        .agg(F.first("score"))
        .filter(F.col("1") < F.col("2"))
    )
    assert pairs.count() == 0


def test_tfidf_plan_shape(spark):
    """The DF side joins as a broadcast (vocabulary-sized), and nothing
    in the family degenerates to a cartesian product."""
    import io
    from contextlib import redirect_stdout

    docs = load(spark, SF_DIR, "documents")
    buf = io.StringIO()
    with redirect_stdout(buf):
        tfidf_topk_frame(docs, k=3).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_cap_per_source_differential(spark):
    from data_ingestor_gluejob_script_spark.queries.corpusstats import (
        CAP_PER_SOURCE_ORACLE,
        cap_per_source_frame,
    )

    docs = load(spark, SF_DIR, "documents")
    got = cap_per_source_frame(docs, cap=5)
    _assert_differential(got, CAP_PER_SOURCE_ORACLE.format(cap=5))
    # no source exceeds the cap, and the selection is idempotent
    over = got.groupBy("source").count().filter(F.col("count") > 5)
    assert over.count() == 0
    assert cap_per_source_frame(got, cap=5).count() == got.count()


def test_chunk_differential(spark):
    from data_ingestor_gluejob_script_spark.queries.corpusstats import (
        CHUNK_ORACLE,
        chunk_documents_frame,
    )

    docs = load(spark, SF_DIR, "documents")
    got = chunk_documents_frame(docs, chunk=16, stride=12)
    _assert_differential(got, CHUNK_ORACLE.format(chunk=16, stride=12))


def test_chunk_coverage(spark):
    """Chunks with stride == chunk partition the document exactly:
    token counts sum to the document's token count; with overlap the
    sum strictly exceeds it."""
    from data_ingestor_gluejob_script_spark.queries.corpusstats import (
        chunk_documents_frame,
    )

    docs = load(spark, SF_DIR, "documents")
    n_tok = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n")
    )
    exact = (
        chunk_documents_frame(docs, chunk=16, stride=16)
        .groupBy("doc_id")
        .agg(F.sum("n_tokens").alias("s"))
        .join(n_tok, "doc_id")
    )
    assert exact.filter(F.col("s") != F.col("n")).count() == 0
    overlap = (
        chunk_documents_frame(docs, chunk=16, stride=12)
        .groupBy("doc_id")
        .agg(F.sum("n_tokens").alias("s"))
        .join(n_tok, "doc_id")
    )
    # docs with <= stride tokens emit a single chunk (sum == n); any
    # longer doc has overlapping chunks, so the sum strictly exceeds n
    assert overlap.filter(
        (F.col("n") > 12) & (F.col("s") <= F.col("n"))
    ).count() == 0
    assert overlap.filter(F.col("s") < F.col("n")).count() == 0


def test_weighted_sample_differential(spark):
    from data_ingestor_gluejob_script_spark.queries.corpusstats import (
        weighted_sample_frame,
        weighted_sample_oracle,
    )

    docs = load(spark, SF_DIR, "documents")
    weights = {"src1": 0.8, "src3": 0.25, "src7": 1.0, "src9": 0.0}
    got = weighted_sample_frame(docs, weights, default=0.5)
    _assert_differential(got, weighted_sample_oracle(weights, default=0.5))
    # deterministic: same call, same rows
    again = weighted_sample_frame(docs, weights, default=0.5)
    assert sorted(r.doc_id for r in got.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_weighted_sample_semantics(spark):
    from data_ingestor_gluejob_script_spark.queries.corpusstats import (
        weighted_sample_frame,
    )

    docs = load(spark, SF_DIR, "documents")
    n_src7 = docs.filter(F.col("source") == "src7").count()
    kept = weighted_sample_frame(docs, {"src7": 1.0}, default=0.0)
    assert kept.filter(F.col("source") != "src7").count() == 0
    assert kept.count() == n_src7  # weight 1.0 keeps every row
    none = weighted_sample_frame(docs, {"src7": 0.0}, default=0.0)
    assert none.count() == 0
    everything = weighted_sample_frame(docs, {}, default=1.0)
    assert everything.count() == docs.count()
    import pytest as _pt
    with _pt.raises(ValueError):
        weighted_sample_frame(docs, {"src1": 1.5})


def test_duplicate_span_differential(spark):
    from data_ingestor_gluejob_script_spark.queries.corpusstats import (
        DUP_SPAN_ORACLE,
        duplicate_span_report,
    )

    docs = load(spark, SF_DIR, "documents")
    got = duplicate_span_report(docs, n=3)
    _assert_differential(got, DUP_SPAN_ORACLE.format(n=3))
    # with 500 short word-soup docs over a small vocab, some 3-gram
    # spans must recur across docs: the signal is exercised, not
    # vacuously zero
    assert got.filter(F.col("n_dup_spans") > 0).count() > 0


def test_duplicate_span_semantics(spark):
    from data_ingestor_gluejob_script_spark.queries.corpusstats import (
        duplicate_span_report,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),          # shares "a b c" with doc 2
            (2, "a b c x y"),
            (3, "p q r s t"),          # unique
            (4, "zz"),                 # shorter than n -> zero spans
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in duplicate_span_report(docs, n=3).collect()}
    assert rows[1].n_spans == 3 and rows[1].n_dup_spans == 1
    assert rows[2].n_spans == 3 and rows[2].n_dup_spans == 1
    assert rows[3].n_dup_spans == 0
    assert rows[4].n_spans == 0 and rows[4].dup_frac == 0.0


import pandas as pd  # noqa: E402
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_word = st.sampled_from(["the", "fast", "key", "sort", "a", "b3", ""])
_doc = st.lists(_word, min_size=0, max_size=8).map(" ".join)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_doc, min_size=1, max_size=12))
def test_corpusstats_property_differential(spark, texts):
    """Property differential on RANDOM tiny corpora (empty docs,
    empty tokens from double spaces, single words, heavy repeats):
    vocab, repetition, and chunking must agree with DuckDB
    cell-for-cell — the fixed-data tests can't reach these
    degenerate tokenizations."""
    from data_ingestor_gluejob_script_spark.queries.corpusstats import (
        CHUNK_ORACLE,
        REPETITION_ORACLE,
        VOCAB_ORACLE,
        chunk_documents_frame,
        repetition_frame,
        vocab_frame,
    )

    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    sdf = spark.createDataFrame(pdf)

    con = duckdb.connect()
    con.register("documents", pdf)

    for frame, sql in [
        (vocab_frame(sdf), VOCAB_ORACLE),
        (repetition_frame(sdf, n=2), REPETITION_ORACLE),
        (chunk_documents_frame(sdf, chunk=3, stride=2),
         CHUNK_ORACLE.format(chunk=3, stride=2)),
    ]:
        s_cols = frame.columns
        s_rows = [tuple(r) for r in frame.collect()]
        cur = con.execute(sql)
        o_cols = [d[0] for d in cur.description]
        assert sorted(o_cols) == sorted(s_cols)
        assert _multiset(s_cols, s_rows) == _multiset(o_cols, cur.fetchall())


def test_negative_samples_differential(spark):
    from data_ingestor_gluejob_script_spark.queries.corpusstats import (
        NEGATIVE_SAMPLES_ORACLE,
        negative_samples_frame,
    )

    docs = load(spark, SF_DIR, "documents")
    got = negative_samples_frame(docs, k=4)
    _assert_differential(got, NEGATIVE_SAMPLES_ORACLE.format(k=4))
    # near-complete coverage (self-hits only), no anchor over k, and
    # the draw is genuinely spread over the corpus
    n = docs.count()
    per_anchor = got.groupBy("anchor_id").count()
    assert per_anchor.filter(F.col("count") > 4).count() == 0
    assert got.count() >= 4 * n - n  # at most one self-hit per rank... loose
    assert got.select("neg_id").distinct().count() > n // 10
    # deterministic across runs
    again = negative_samples_frame(docs, k=4)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, again.collect())
    )


def test_corpus_summary_differential(spark):
    from data_ingestor_gluejob_script_spark.queries.corpusstats import (
        CORPUS_SUMMARY_ORACLE,
        corpus_summary,
    )

    docs = load(spark, SF_DIR, "documents")
    got = corpus_summary(docs)
    _assert_differential(got, CORPUS_SUMMARY_ORACLE)
    row = got.collect()[0]
    assert row.n_docs == docs.count()
    assert 0.0 <= row.dup_rate < 1.0


def test_unigram_logprob_differential(spark):
    from data_ingestor_gluejob_script_spark.queries.corpusstats import (
        UNIGRAM_LOGPROB_ORACLE,
        unigram_logprob_frame,
    )

    docs = load(spark, SF_DIR, "documents")
    _assert_differential(
        unigram_logprob_frame(docs), UNIGRAM_LOGPROB_ORACLE
    )


def test_unigram_logprob_external_vocab_oov_floor(spark):
    """Scoring under an EXTERNAL vocabulary: OOV tokens get the
    0.5-count Laplace floor — finite, and strictly below every
    in-vocab probability."""
    import math

    from data_ingestor_gluejob_script_spark.queries.corpusstats import (
        unigram_logprob_frame,
    )

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "zzz zzz zzz")], "doc_id long, text string"
    )
    vocab = spark.createDataFrame(
        [("a", 1, 3), ("b", 1, 1)],
        "token string, n_docs long, n_occurrences long",
    )
    got = {
        r.doc_id: r for r in unigram_logprob_frame(docs, vocab).collect()
    }
    # doc 1: avg(ln(3/4), ln(3/4), ln(1/4))
    want1 = (2 * math.log(3 / 4) + math.log(1 / 4)) / 3
    assert abs(got[1].avg_logprob - want1) < 1e-6
    # doc 2: all OOV -> ln(0.5/4), higher ppl than doc 1
    assert abs(got[2].avg_logprob - math.log(0.5 / 4)) < 1e-6
    assert got[2].ppl > got[1].ppl


def test_bm25_differential(spark):
    from data_ingestor_gluejob_script_spark.queries.corpusstats import (
        BM25_ORACLE_TEMPLATE,
        bm25_topk_frame,
    )

    docs = load(spark, SF_DIR, "documents")
    # pick real corpus terms so the differential scores something
    terms = [
        r.token
        for r in docs.selectExpr(
            "explode(split(text, ' ')) AS token"
        ).groupBy("token").count().orderBy(F.col("count").desc())
        .limit(3).collect()
    ]
    sql = BM25_ORACLE_TEMPLATE.format(
        terms=", ".join(f"'{t}'" for t in terms), k=10
    )
    got = bm25_topk_frame(docs, terms, k=10)
    s_rows = [(r.doc_id, str(r.bm25)) for r in got.collect()]
    o_cols, o_rows = _oracle(sql)
    assert s_rows == [(r[0], str(r[1])) for r in o_rows]
    assert len(s_rows) == 10


@pytest.mark.slow
def test_bm25_rewards_term_density(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple apple"),
            (2, "apple pear plum quince fig date"),
            (3, "pear plum"),
        ],
        "doc_id long, text string",
    )
    got = [r.doc_id for r in bm25_helper(docs)]
    # doc 1: dense in the query term and short -> ranked first;
    # doc 3 (no 'apple') scores nothing
    assert got[0] == 1
    assert 3 not in got


def bm25_helper(docs):
    from data_ingestor_gluejob_script_spark.queries.corpusstats import (
        bm25_topk_frame,
    )

    return bm25_topk_frame(docs, ["apple"], k=5).collect()


@pytest.mark.slow
def test_bm25_search_join_matches_single_query(spark):
    """The batch search join restricted to one query must equal the
    single-query top-k (same formula, same tie-breaks) — and a
    multi-query batch ranks each query independently."""
    from data_ingestor_gluejob_script_spark.queries.corpusstats import (
        bm25_search_join,
        bm25_topk_frame,
    )

    docs = load(spark, SF_DIR, "documents")
    terms = ["scan", "window", "column"]
    single = [
        (r.doc_id, r.bm25)
        for r in bm25_topk_frame(docs, terms, k=5).collect()
    ]
    queries = spark.createDataFrame(
        [(1, " ".join(terms)), (2, "join hash")],
        "query_id long, text string",
    )
    batch = bm25_search_join(docs, queries, k=5).collect()
    got1 = [
        (r.doc_id, r.bm25)
        for r in sorted(
            (r for r in batch if r.query_id == 1), key=lambda r: r.rank
        )
    ]
    assert got1 == single
    got2 = [r for r in batch if r.query_id == 2]
    assert len(got2) == 5
    assert {r.rank for r in got2} == {1, 2, 3, 4, 5}


def test_bm25_search_join_rejects_duplicate_doc_ids(spark):
    """Advice r14: the r14 per-row run-length tf scores duplicate
    doc_id rows independently (and df counts a token once per row)
    where the old (doc_id, token) groupBy merged occurrences — the
    one-row-per-doc_id precondition is now a loud guard, not a
    docstring. Duplicate keys (including two NULL ids) raise; the
    deduped corpus passes."""
    import pytest as _pytest

    from data_ingestor_gluejob_script_spark.queries.corpusstats import (
        bm25_search_join,
    )

    queries = spark.createDataFrame(
        [(0, "scan join")], "query_id long, text string"
    )
    dup = spark.createDataFrame(
        [(1, "scan scan join"), (1, "join hash"), (2, "window")],
        "doc_id long, text string",
    )
    with _pytest.raises(ValueError, match="duplicate doc_id"):
        bm25_search_join(dup, queries)
    nulldup = spark.createDataFrame(
        [(None, "scan join"), (None, "join"), (2, "window")],
        "doc_id long, text string",
    )
    with _pytest.raises(ValueError, match="duplicate doc_id"):
        bm25_search_join(nulldup, queries)
    ok = spark.createDataFrame(
        [(1, "scan scan join"), (None, "join hash"), (2, "window")],
        "doc_id long, text string",
    )
    assert bm25_search_join(ok, queries, k=2).count() > 0


BM25_MULTIQ_ORACLE = """
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents
), lens AS (
    SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id
), avgdl AS (
    SELECT avg(dl) AS avgdl FROM lens
), n AS (
    SELECT count(DISTINCT doc_id) AS n_docs FROM documents
), qtok AS (
    SELECT DISTINCT query_id, unnest(string_split(text, ' ')) AS token
    FROM queries
), tf AS (
    SELECT doc_id, token, count(*) AS tf FROM tok
    WHERE token IN (SELECT DISTINCT token FROM qtok)
    GROUP BY doc_id, token
), dft AS (
    SELECT token, count(*) AS df FROM tf GROUP BY token
), scored AS (
    SELECT q.query_id, tf.doc_id, round(sum(
        ln(1.0 + (n.n_docs - dft.df + 0.5) / (dft.df + 0.5))
        * (tf.tf * (1.2 + 1))
        / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * lens.dl / avgdl.avgdl))
    ), 9) AS bm25
    FROM tf
    JOIN dft USING (token) JOIN lens USING (doc_id)
    JOIN qtok q USING (token)
    CROSS JOIN avgdl CROSS JOIN n
    GROUP BY q.query_id, tf.doc_id, n.n_docs
)
SELECT query_id, doc_id, bm25, rank FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY bm25 DESC, doc_id ASC
    ) AS rank FROM scored
) WHERE rank <= {k}
"""


@pytest.mark.slow
def test_bm25_differential_zipf_corpus(spark, tmp_path):
    """Round-14 verdict #1 companion: the decade smoke's new
    natural-vocabulary corpus (tools/make_zipf_corpus.zipf_documents —
    Zipf token frequencies, wide vocabulary) differentially verified
    against a full multi-query DuckDB oracle, so the scale measurement
    runs on an oracle-green corpus shape. Small instance of the SAME
    generator: 1500 docs, 5000-token vocabulary, 8-query batch."""
    from tools.make_zipf_corpus import zipf_documents

    from data_ingestor_gluejob_script_spark.queries.corpusstats import (
        bm25_search_join,
    )

    docs = zipf_documents(spark, 1500, vocab=5000).select("doc_id", "text")
    path = str(tmp_path / "zipf_docs")
    docs.write.parquet(path)
    docs = spark.read.parquet(path)  # pin one materialization for both
    queries = docs.filter(F.col("doc_id") < 8).selectExpr(
        "doc_id AS query_id", "text"
    )
    got = bm25_search_join(docs, queries, k=5)
    s_rows = sorted(
        (r.query_id, r.doc_id, str(r.bm25), r.rank) for r in got.collect()
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT doc_id, text "
        f"FROM parquet_scan('{path}/*.parquet')"
    )
    con.execute(
        "CREATE VIEW queries AS SELECT doc_id AS query_id, text "
        "FROM documents WHERE doc_id < 8"
    )
    o_rows = sorted(
        (r[0], r[1], str(r[2]), r[3])
        for r in con.execute(BM25_MULTIQ_ORACLE.format(k=5)).fetchall()
    )
    assert len(s_rows) == 8 * 5
    assert s_rows == o_rows


def test_bm25_search_join_max_df_pruning_differential(spark, tmp_path):
    """The r15 common-term pruning variant vs a DuckDB oracle with the
    same max-df cut, on the Zipf corpus shape it exists for — and the
    invariant that motivates it: pruned and unpruned rankings agree on
    the vast majority of top-k rows (head terms contribute ~no idf)."""
    from tools.make_zipf_corpus import zipf_documents

    from data_ingestor_gluejob_script_spark.queries.corpusstats import (
        bm25_search_join,
    )

    docs = zipf_documents(spark, 1500, vocab=5000).select("doc_id", "text")
    path = str(tmp_path / "zipf_docs")
    docs.write.parquet(path)
    docs = spark.read.parquet(path)
    queries = docs.filter(F.col("doc_id") < 8).selectExpr(
        "doc_id AS query_id", "text"
    )
    frac = 0.1
    got = bm25_search_join(docs, queries, k=5, max_df_frac=frac)
    s_rows = sorted(
        (r.query_id, r.doc_id, str(r.bm25), r.rank) for r in got.collect()
    )

    oracle = BM25_MULTIQ_ORACLE.replace(
        "SELECT token, count(*) AS df FROM tf GROUP BY token",
        "SELECT token, count(*) AS df FROM tf GROUP BY token "
        "HAVING count(*) <= {max_df}",
    ).format(k=5, max_df=frac * 1500)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT doc_id, text "
        f"FROM parquet_scan('{path}/*.parquet')"
    )
    con.execute(
        "CREATE VIEW queries AS SELECT doc_id AS query_id, text "
        "FROM documents WHERE doc_id < 8"
    )
    o_rows = sorted(
        (r[0], r[1], str(r[2]), r[3])
        for r in con.execute(oracle).fetchall()
    )
    assert len(s_rows) == 8 * 5
    assert s_rows == o_rows
    # f=0.1 is an AGGRESSIVE cut (a dropped df=0.1N term carries idf
    # ≈ 2.3), so rankings shift — measured ~50% top-5 overlap on this
    # corpus. The knob is a caller-owned precision/cost tradeoff; the
    # contract is oracle equality above, plus residual correlation:
    unpruned = {
        (r.query_id, r.doc_id)
        for r in bm25_search_join(docs, queries, k=5).collect()
    }
    overlap = len({(q, d) for q, d, _, _ in s_rows} & unpruned)
    assert overlap >= 0.25 * len(unpruned), overlap


def test_bm25_search_join_df_table_bit_identical(spark, tmp_path):
    """The dictionary path (precomputed df_table, the index-time
    corpus statistic) with no pruning must be bit-identical to the
    default two-consumer plan — same df values, same scores, same
    ranks — and with max_df_frac it must equal the two-pass pruned
    plan."""
    from tools.make_zipf_corpus import zipf_documents

    from data_ingestor_gluejob_script_spark.queries.corpusstats import (
        bm25_search_join,
        vocab_frame,
    )

    docs = zipf_documents(spark, 1200, vocab=4000).select("doc_id", "text")
    path = str(tmp_path / "docs")
    docs.write.parquet(path)
    docs = spark.read.parquet(path)
    queries = docs.filter(F.col("doc_id") < 6).selectExpr(
        "doc_id AS query_id", "text"
    )
    dft = vocab_frame(docs).select(
        "token", F.col("n_docs").alias("df")
    )

    def rows(df):
        return sorted(
            (r.query_id, r.doc_id, str(r.bm25), r.rank)
            for r in df.collect()
        )

    assert rows(bm25_search_join(docs, queries, k=5, df_table=dft)) == rows(
        bm25_search_join(docs, queries, k=5)
    )
    assert rows(
        bm25_search_join(docs, queries, k=5, df_table=dft, max_df_frac=0.2)
    ) == rows(bm25_search_join(docs, queries, k=5, max_df_frac=0.2))
    # the topk wrapper threads the knobs through unchanged
    from data_ingestor_gluejob_script_spark.queries.corpusstats import (
        bm25_topk_frame,
    )

    def trows(**kw):
        return sorted(
            (r.doc_id, str(r.bm25))
            for r in bm25_topk_frame(docs, ["w1", "w7"], k=5, **kw)
            .collect()
        )

    assert trows(df_table=dft) == trows()


def test_bm25_dictionary_from_vocab_ingest(spark, tmp_path):
    """End-to-end index-time loop: the corpus arrives as micro-batches,
    run_vocab_ingest folds each delta into the vocabulary lake, and
    the BM25 dictionary read from that lake
    (streaming.df_table_from_vocab_lake) scores bit-identically to the
    batch plan that recomputes df from the corpus — the dictionary is
    maintained incrementally, never recomputed at query time."""
    from tools.make_zipf_corpus import zipf_documents

    from data_ingestor_gluejob_script_spark.queries.corpusstats import (
        bm25_search_join,
    )
    from data_ingestor_gluejob_script_spark.streaming import (
        df_table_from_vocab_lake,
        run_vocab_ingest,
    )

    docs = zipf_documents(spark, 900, vocab=3000).select("doc_id", "text")
    docs_dir = str(tmp_path / "in")
    # three micro-batches (separate files, maxFilesPerTrigger=1)
    for lo, hi in ((0, 300), (300, 600), (600, 900)):
        docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.mode("append").parquet(docs_dir)

    vocab_dir = str(tmp_path / "vocab")
    q = run_vocab_ingest(spark, docs_dir, vocab_dir, str(tmp_path / "ck"))
    q.awaitTermination(300)

    dft = df_table_from_vocab_lake(spark, vocab_dir)
    assert dft is not None
    corpus = spark.read.parquet(docs_dir)
    queries = corpus.filter(F.col("doc_id") < 5).selectExpr(
        "doc_id AS query_id", "text"
    )

    def rows(df):
        return sorted(
            (r.query_id, r.doc_id, str(r.bm25), r.rank)
            for r in df.collect()
        )

    assert rows(
        bm25_search_join(corpus, queries, k=5, df_table=dft)
    ) == rows(bm25_search_join(corpus, queries, k=5))

    # full index-time stats (df_table + n_docs + avg_dl from the same
    # lake): zero corpus-side statistics jobs, still bit-identical
    from data_ingestor_gluejob_script_spark.streaming import (
        bm25_stats_from_vocab_lake,
    )

    dft2, n_docs, avg_dl = bm25_stats_from_vocab_lake(spark, vocab_dir)
    assert n_docs == 900
    assert rows(
        bm25_search_join(
            corpus, queries, k=5, df_table=dft2, n_docs=n_docs,
            avg_dl=avg_dl,
        )
    ) == rows(bm25_search_join(corpus, queries, k=5))


def test_posting_partitions_sizing(spark):
    """r16: the posting-stream exchange width is sized from index-time
    stats; unknown stats keep the session default (None), small
    corpora floor at the cluster parallelism, big ones scale with
    n_docs*avg_dl and cap at 32k."""
    from data_ingestor_gluejob_script_spark.queries.corpusstats import (
        _POSTING_PARTITION_TARGET_BYTES,
        _POSTING_ROW_SHUFFLE_BYTES,
        _posting_partitions,
    )

    base = spark.sparkContext.defaultParallelism

    def want(n, adl):
        est = n * adl * _POSTING_ROW_SHUFFLE_BYTES
        return max(
            base,
            min(32768, int(est // _POSTING_PARTITION_TARGET_BYTES) + 1),
        )

    assert _posting_partitions(spark, None, None) is None
    assert _posting_partitions(spark, 1000, None) is None
    # tiny corpus: floor at parallelism (unchanged plans locally)
    assert _posting_partitions(spark, 1000, 5.0) == base
    # 5M docs x 57 words x 64B ~= 18 GB -> ~143 partitions of 128 MB
    got = _posting_partitions(spark, 5_000_000, 57.0)
    assert got == want(5_000_000, 57.0) and got >= 100
    # absurd scale hits the cap
    assert _posting_partitions(spark, 10**12, 500.0) == 32768


def test_bm25_index_time_stats_set_exchange_width(spark):
    """The dict_full path's doc_id repartition must carry the computed
    width (visible as RepartitionByExpression with numPartitions in
    the analyzed plan) while the no-stats path keeps the session
    default form."""
    import re

    from data_ingestor_gluejob_script_spark.queries import corpusstats as cs

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(20)],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(0, "alpha beta")], "query_id long, text string"
    )
    dft = docs.selectExpr("explode(split(text, ' ')) AS token").groupBy(
        "token"
    ).agg(F.countDistinct("token").alias("df"))
    # force the scaling branch with a tiny per-partition target
    old = cs._POSTING_PARTITION_TARGET_BYTES
    cs._POSTING_PARTITION_TARGET_BYTES = 64
    try:
        out = cs.bm25_search_join(
            docs, queries, k=2, df_table=dft, n_docs=20, avg_dl=4.0
        )
        plan = out._jdf.queryExecution().analyzed().toString()
        m = re.search(r"RepartitionByExpression \[doc_id[^\]]*\], (\d+)", plan)
        assert m, plan
        assert int(m.group(1)) == cs._posting_partitions(spark, 20, 4.0)
    finally:
        cs._POSTING_PARTITION_TARGET_BYTES = old


def test_bm25_runlength_sql_matches_lambda_build(spark):
    """r17: the SQL-string run-length expressions (_BM25_STARTS_SQL /
    _BM25_ENTRIES_SQL) produce the IDENTICAL analyzed plan to the
    original Python-lambda build, modulo lambda-variable names — the
    guarantee that the r14 explode-binding cliff documented in
    bm25_search_join cannot reappear (equal trees cannot bind
    differently). Also checks the rows."""
    import re as _re

    from data_ingestor_gluejob_script_spark.queries import corpusstats as cs

    docs = spark.createDataFrame(
        [(1, "b a b c"), (2, None), (3, "x"), (4, "")],
        "doc_id int, text string",
    )

    def _base(d):
        return d.select(
            "doc_id", cs.words_col(F.col("text")).alias("_ws")
        ).select(
            "doc_id",
            F.array_sort("_ws").alias("_sws"),
            F.size("_ws").alias("dl"),
        )

    # the pre-r17 lambda build, frozen
    starts = F.filter(
        F.sequence(F.lit(0), F.col("dl") - 1),
        lambda i: F.when(i == 0, F.lit(True)).otherwise(
            F.element_at(F.col("_sws"), i + 1)
            != F.element_at(F.col("_sws"), i)
        ),
    )
    old_base = _base(docs).withColumn(
        "_st",
        F.when(F.col("dl") > 0, starts).otherwise(
            F.lit(None).cast("array<int>")
        ),
    )
    entries = F.zip_with(
        F.col("_st"),
        F.concat(
            F.slice(F.col("_st"), 2, F.size(F.col("_st")) - 1),
            F.array(F.col("dl")),
        ),
        lambda s, e: F.struct(
            F.element_at(F.col("_sws"), s + 1).alias("token"),
            (e - s).cast("long").alias("tf"),
        ),
    )
    old = old_base.select(
        "doc_id", "dl", F.explode(entries).alias("_e")
    ).select("doc_id", "dl", F.col("_e.token"), F.col("_e.tf"))

    new = (
        _base(docs)
        .withColumn("_st", F.expr(cs._BM25_STARTS_SQL))
        .select(
            "doc_id",
            "dl",
            F.explode(F.expr(cs._BM25_ENTRIES_SQL)).alias("_e"),
        )
        .select("doc_id", "dl", F.col("_e.token"), F.col("_e.tf"))
    )

    def norm(df):
        s = df._jdf.queryExecution().analyzed().toString()
        s = _re.sub(r"#\d+", "#N", s)
        return _re.sub(r"lambda '?[A-Za-z_0-9]+", "lambda V", s)

    assert old.schema == new.schema
    assert norm(old) == norm(new)
    assert sorted(map(tuple, old.collect())) == sorted(
        map(tuple, new.collect())
    )
