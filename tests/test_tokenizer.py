"""Tokenizer-prep: global_row_number correctness under arbitrary
orderings, vocabulary-id + corpus-encoding DuckDB differentials, and
the packed/flat consistency laws. Not driver-registered (gate pinned
at 50) — this file is the oracle verification, like corpusstats.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pyspark.sql.functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_ingestor_gluejob_script_spark.operators.order import (  # noqa: E402
    global_row_number,
)
from data_ingestor_gluejob_script_spark.queries._util import load  # noqa: E402
from data_ingestor_gluejob_script_spark.queries.tokenizer import (  # noqa: E402
    ENCODE_FLAT_ORACLE,
    VOCAB_IDS_ORACLE,
    encode_docs,
    encode_docs_flat,
    vocab_with_ids,
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


def test_tokenizer_property_differential(spark):
    """Property differential on RANDOM tiny corpora (empty docs, empty
    tokens from double spaces, single words, ties everywhere): the id
    assignment and flat encoding must agree with DuckDB cell-for-cell
    — frequency TIES are the hard part (broken by token, a total
    order), and the fixed corpus barely has any."""
    import duckdb as _duck

    import pandas as pd
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    word = st.sampled_from(["the", "fast", "key", "sort", "a", "b3", ""])
    doc = st.lists(word, min_size=0, max_size=8).map(" ".join)

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(texts=st.lists(doc, min_size=1, max_size=10))
    def run(texts):
        pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        sdf = spark.createDataFrame(pdf)
        con = _duck.connect()
        con.register("documents", pdf)
        for frame, sql in [
            (vocab_with_ids(sdf), VOCAB_IDS_ORACLE),
            (
                encode_docs_flat(sdf, vocab_with_ids(sdf)),
                ENCODE_FLAT_ORACLE,
            ),
        ]:
            s_cols = frame.columns
            s_rows = [tuple(r) for r in frame.collect()]
            cur = con.execute(sql)
            o_cols = [d[0] for d in cur.description]
            assert sorted(o_cols) == sorted(s_cols)
            assert _multiset(s_cols, s_rows) == _multiset(
                o_cols, cur.fetchall()
            )

    run()


def test_global_row_number_matches_sorted_enumeration(spark):
    """Compound ordering (desc count, asc string) over a deliberately
    badly-partitioned input equals the single-node sorted enumerate."""
    rows = [(f"k{i % 7}", (i * 13) % 5, i) for i in range(500)]
    df = spark.createDataFrame(
        rows, "key string, grp int, seq int"
    ).repartition(13)
    got = {
        (r.key, r.grp, r.seq): r.row_id
        for r in global_row_number(
            df, [F.col("grp").desc(), F.col("key"), F.col("seq")]
        ).collect()
    }
    expected = {
        t: i + 1
        for i, t in enumerate(
            sorted(rows, key=lambda t: (-t[1], t[0], t[2]))
        )
    }
    assert got == expected


def test_global_row_number_plan_has_no_global_sort_of_rows(spark):
    """The only single-partition exchange carries per-partition COUNTS;
    the row-bearing window is partitioned by partition id."""
    import contextlib
    import io

    docs = load(spark, SF_DIR, "documents")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        global_row_number(docs, [F.col("doc_id")]).explain("formatted")
    p = buf.getvalue()
    # The range exchange itself lives inside the localCheckpoint
    # materialization (plan truncation is the point — see order.py);
    # what must be visible: the row-bearing window is partitioned by
    # _pid and the only SinglePartition exchange carries the counts.
    assert p.count("SinglePartition") == 1
    assert "hashpartitioning(_pid" in p


def test_vocab_ids_differential(spark):
    docs = load(spark, SF_DIR, "documents")
    _assert_differential(vocab_with_ids(docs), VOCAB_IDS_ORACLE)


def test_vocab_ids_partitioning_invariance_and_truncation(spark):
    docs = load(spark, SF_DIR, "documents")
    base = {r.token: r.token_id for r in vocab_with_ids(docs).collect()}
    scrambled = {
        r.token: r.token_id
        for r in vocab_with_ids(docs.repartition(17)).collect()
    }
    assert base == scrambled
    # ids are dense 1..V (V = 31 distinct tokens in the synthetic
    # sf0.001 corpus), so truncation keeps exactly v_max rows
    assert sorted(base.values()) == list(range(1, len(base) + 1))
    top10 = vocab_with_ids(docs, v_max=10)
    assert top10.count() == 10
    assert top10.agg(F.max("token_id")).collect()[0][0] == 10


def test_encode_flat_differential(spark):
    docs = load(spark, SF_DIR, "documents")
    _assert_differential(
        encode_docs_flat(docs, vocab_with_ids(docs)), ENCODE_FLAT_ORACLE
    )


def test_pack_token_stream_differential_and_pack_shape(spark):
    """The concatenate-then-chunk endpoint agrees with the DuckDB CTE
    (positions, ids, pack assignment) and obeys the pack laws: every
    pack except the last is exactly full, positions within a pack are
    a distinct 0..2047 prefix, rows == total tokens."""
    from data_ingestor_gluejob_script_spark.queries.tokenizer import (
        PACK_TOKEN_STREAM_ORACLE,
        pack_token_stream,
    )
    from data_ingestor_gluejob_script_spark.queries.traindata import (
        PACK_TOKENS,
    )

    docs = load(spark, SF_DIR, "documents")
    got = pack_token_stream(docs, vocab_with_ids(docs))
    _assert_differential(
        got, PACK_TOKEN_STREAM_ORACLE.format(pack=PACK_TOKENS)
    )
    sizes = {
        r.pack_id: (r.n, r.npos)
        for r in got.groupBy("pack_id")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("pack_pos").alias("npos"),
        )
        .collect()
    }
    last = max(sizes)
    for pid, (n, npos) in sizes.items():
        assert n == npos  # positions distinct within the pack
        if pid != last:
            assert n == PACK_TOKENS
    n_tokens = docs.select(
        F.sum(F.size(F.split("text", " ")))
    ).collect()[0][0]
    assert sum(n for n, _ in sizes.values()) == n_tokens


def test_encode_packed_consistent_with_flat_and_oov(spark):
    docs = load(spark, SF_DIR, "documents")
    vocab = vocab_with_ids(docs, v_max=5)  # tiny vocab → real OOV
    flat = encode_docs_flat(docs, vocab)
    packed = encode_docs(docs, vocab)
    # conservation: one id per token position, every doc present
    n_tokens = docs.select(
        F.sum(F.size(F.split("text", " ")))
    ).collect()[0][0]
    assert flat.count() == n_tokens
    assert packed.count() == docs.count()
    lens = packed.select(F.sum(F.size("ids"))).collect()[0][0]
    assert lens == n_tokens
    # packed order equals flat order for a spot-checked doc
    some = packed.orderBy("doc_id").first()
    flat_ids = [
        r.token_id
        for r in flat.filter(F.col("doc_id") == some.doc_id)
        .orderBy("pos")
        .collect()
    ]
    assert list(some.ids) == flat_ids
    # truncated vocab really produces OOV zeros, in both forms
    assert flat.filter(F.col("token_id") == 0).count() > 0
    assert (
        packed.select(
            F.sum(
                F.size(F.filter(F.col("ids"), lambda x: x == 0))
            )
        ).collect()[0][0]
        == flat.filter(F.col("token_id") == 0).count()
    )
