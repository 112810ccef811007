"""End-to-end training-corpus pipeline: redact → quality → dedup →
near-dup drop → split → pack, differentially verified as ONE job
against a CTE-chained DuckDB twin built from the same fragments.
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

import duckdb
import pyspark.sql.functions as F
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_ingestor_gluejob_script_spark.queries._util import load  # noqa: E402
from data_ingestor_gluejob_script_spark.queries.traindata import (  # noqa: E402
    PACK_TOKENS,
    PIPELINE_ORACLE,
    TEST_BUCKET,
    VAL_BUCKET,
    prepare_training_corpus,
    split_bucket_col,
)

SF_DIR = "/root/testdata/sf0.001"


def test_pipeline_differential(spark):
    docs = load(spark, SF_DIR, "documents")
    got = prepare_training_corpus(docs)
    s_cols = got.columns
    s_rows = [tuple(r) for r in got.collect()]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    cur = con.execute(PIPELINE_ORACLE)
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()
    assert sorted(o_cols) == sorted(s_cols)

    def multiset(cols, rows):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        return sorted(tuple(str(r[i]) for i in order) for r in rows)

    assert multiset(s_cols, s_rows) == multiset(o_cols, o_rows)
    # the pipeline actually filters: packed corpus is a strict subset
    assert 0 < len(s_rows) < docs.count()


def test_pipeline_invariants(spark):
    docs = load(spark, SF_DIR, "documents")
    out = prepare_training_corpus(docs)
    rows = out.collect()

    # every packed doc is a train-bucket doc
    buckets = {
        r.doc_id: r.bucket
        for r in out.select(
            "doc_id", split_bucket_col(F.col("doc_id")).alias("bucket")
        ).collect()
    }
    assert all(
        buckets[r.doc_id] not in (VAL_BUCKET, TEST_BUCKET) for r in rows
    )
    # offsets are in-range and pack ids contiguous from 0
    assert all(0 <= r.pack_offset < PACK_TOKENS for r in rows)
    pack_ids = sorted({r.pack_id for r in rows})
    assert pack_ids[0] == 0 and pack_ids == list(range(len(pack_ids)))
    # prefix-sum consistency: tokens_before strictly increases with
    # doc_id by exactly the preceding doc's n_tokens
    ordered = sorted(rows, key=lambda r: r.doc_id)
    run = 0
    for r in ordered:
        assert r.tokens_before == run
        run += r.n_tokens

    # deterministic: a second run returns the identical manifest
    again = prepare_training_corpus(docs).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_pipeline_plan_shape(spark):
    """One composed job, no pairwise joins: the only window shuffles
    are the fingerprint group, the pack block window, and the
    #blocks-row offset window; no CartesianProduct anywhere."""
    docs = load(spark, SF_DIR, "documents")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        prepare_training_corpus(docs).explain("formatted")
    p = buf.getvalue()
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p  # block offsets come back broadcast


def test_pipeline_with_benchmark_decontaminates(spark):
    """The optional benchmark stage: docs flagged by the contamination
    report must be absent from the pack manifest, and the remainder
    must re-pack exactly as running prepare on the pre-cleaned corpus
    (the stage composes, it doesn't perturb)."""
    from data_ingestor_gluejob_script_spark.queries.textops import (
        contamination_report,
        decontaminate,
    )

    docs = load(spark, SF_DIR, "documents")
    bench = docs.filter(F.col("doc_id") % 100 == 0)

    with_stage = prepare_training_corpus(docs, benchmark=bench)
    flagged = {
        r.doc_id
        for r in contamination_report(docs, bench)
        .filter(F.col("contaminated"))
        .collect()
    }
    got_ids = {r.doc_id for r in with_stage.select("doc_id").collect()}
    assert got_ids.isdisjoint(flagged)

    pre_cleaned = prepare_training_corpus(decontaminate(docs, bench))
    assert sorted(map(tuple, with_stage.collect())) == sorted(
        map(tuple, pre_cleaned.collect())
    )


def test_pipeline_repetition_stage_differential(spark):
    """With the optional Gopher-style repetition cut enabled, Spark
    and the parameterized DuckDB twin still agree end-to-end, and the
    stage actually removes documents at this threshold."""
    from data_ingestor_gluejob_script_spark.queries.traindata import (
        pipeline_oracle,
    )

    docs = load(spark, SF_DIR, "documents")
    base = prepare_training_corpus(docs)
    got = prepare_training_corpus(docs, max_repetition=0.05)
    s_cols = got.columns
    s_rows = [tuple(r) for r in got.collect()]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    cur = con.execute(pipeline_oracle(max_repetition=0.05))
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()
    assert sorted(o_cols) == sorted(s_cols)

    def multiset(cols, rows):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        return sorted(tuple(str(r[i]) for i in order) for r in rows)

    assert multiset(s_cols, s_rows) == multiset(o_cols, o_rows)
    assert 0 < len(s_rows) < base.count()


def test_attrition_report_differential(spark):
    """The one-scan attrition diagnostic matches the CTE twin and is
    internally consistent with the independent stage predicates."""
    from data_ingestor_gluejob_script_spark.queries.traindata import (
        attrition_oracle,
        attrition_report,
    )

    docs = load(spark, SF_DIR, "documents")
    got = attrition_report(docs, max_repetition=0.05)
    s_row = got.collect()[0]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    o_row = con.execute(attrition_oracle(max_repetition=0.05)).fetchone()
    assert tuple(s_row) == tuple(o_row)
    # the report covers the corpus and the stages actually fire
    assert s_row.total_docs == docs.count()
    assert s_row.n_fail_repetition > 0
    assert 0 < s_row.n_pass_all < s_row.total_docs


def test_split_leakage_report(spark):
    """Leakage report vs a Python recomputation over the same
    (oracle-verified) pair set and split assignment — counts per
    ordered split pair must match exactly, and leak rows are exactly
    the cross-split ones."""
    from data_ingestor_gluejob_script_spark.queries.textops import (
        q_simhash_neardup_pairs,
    )
    from data_ingestor_gluejob_script_spark.queries.traindata import (
        split_assign_frame,
        split_leakage_report,
    )

    docs = load(spark, SF_DIR, "documents")
    pairs = q_simhash_neardup_pairs(spark, SF_DIR).select("doc_a", "doc_b")
    got = {
        (r.split_a, r.split_b, r.is_leak): r.n_pairs
        for r in split_leakage_report(pairs, docs).collect()
    }

    split_of = {
        r.doc_id: r.split for r in split_assign_frame(docs).collect()
    }
    expect: dict = {}
    for r in pairs.collect():
        sa, sb = sorted((split_of[r.doc_a], split_of[r.doc_b]))
        key = (sa, sb, sa != sb)
        expect[key] = expect.get(key, 0) + 1
    assert got == expect
    assert sum(got.values()) == pairs.count()
    # this corpus has near-dups in every split: leaks exist and are
    # flagged only on cross-split rows
    assert any(k[2] for k in got)
    assert all((k[0] != k[1]) == k[2] for k in got)


def test_group_aware_split_is_leakage_proof(spark):
    """Every member of a near-dup group lands in one split; singleton
    docs get exactly their split_assign_frame assignment; buckets
    mirror the python md5 twin."""
    import hashlib

    from data_ingestor_gluejob_script_spark.operators.graph import (
        neardup_groups,
    )
    from data_ingestor_gluejob_script_spark.queries.textops import (
        q_simhash_neardup_pairs,
    )
    from data_ingestor_gluejob_script_spark.queries.traindata import (
        group_aware_split_frame,
        split_assign_frame,
    )

    docs = load(spark, SF_DIR, "documents")
    pairs = q_simhash_neardup_pairs(spark, SF_DIR).select("doc_a", "doc_b")
    groups = neardup_groups(pairs, docs)
    out = group_aware_split_frame(docs, groups)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == docs.count()

    # (a) no near-dup pair straddles splits
    for p in pairs.collect():
        assert (
            rows[p["doc_a"]]["split"] == rows[p["doc_b"]]["split"]
        ), (p["doc_a"], p["doc_b"])

    # (b) python md5 twin of the bucket
    for r in rows.values():
        want = (
            int(
                hashlib.md5(str(r["split_key"]).encode()).hexdigest()[:2],
                16,
            )
            % 10
        )
        assert r["bucket"] == want

    # (c) docs outside any group keep their doc-keyed assignment.
    # neardup_groups lists EVERY doc (singletons get their own id), so
    # to actually exercise the left-join fallback the group map must
    # OMIT singletons — filter to true cluster members only (second-
    # pass review finding: the unfiltered map made this part vacuous).
    sparse_groups = groups.filter(F.col("doc_id") != F.col("group_id"))
    sparse = {
        r["doc_id"]: r
        for r in group_aware_split_frame(docs, sparse_groups).collect()
    }
    grouped_ids = {r["doc_id"] for r in sparse_groups.collect()}
    assert grouped_ids and len(grouped_ids) < len(sparse)  # both paths
    base = {
        r["doc_id"]: r["split"]
        for r in split_assign_frame(docs).collect()
    }
    for doc_id, r in sparse.items():
        if doc_id not in grouped_ids:
            assert r["split"] == base[doc_id]
            assert r["split_key"] == doc_id
    # and cluster members still follow their group id under the
    # sparse map (identical to the full-map assignment)
    for doc_id in grouped_ids:
        assert sparse[doc_id]["split"] == rows[doc_id]["split"]


@pytest.mark.slow
def test_pipeline_gopher_quality_stage_composes(spark):
    """The optional Gopher quality-rule battery (round 12): enabling
    it must equal running prepare on the corpus pre-filtered by the
    battery over REDACTED text (the stage composes — redaction and
    the battery are both per-row), and at thresholds the synthetic
    corpus can actually fail, it removes documents. Threshold
    overrides pass through as a dict."""
    from data_ingestor_gluejob_script_spark.queries.docclean import (
        gopher_quality_frame,
    )
    from data_ingestor_gluejob_script_spark.queries.textops import (
        redacted_text_col,
    )

    docs = load(spark, SF_DIR, "documents")
    # the synthetic docs are 10-99 words; a 40-word floor (and no
    # stop-word demand — synthetic vocab) makes the stage selective
    # without emptying the corpus
    th = dict(min_words=40, min_stop_hits=0, min_mean_word_len=1.0)

    with_stage = prepare_training_corpus(docs, gopher_quality=th)
    red = docs.select(
        "doc_id", redacted_text_col(F.col("text")).alias("text")
    )
    keep = gopher_quality_frame(red, **th).filter("kept").select("doc_id")
    pre = prepare_training_corpus(docs.join(keep, "doc_id", "left_semi"))
    assert sorted(map(tuple, with_stage.collect())) == sorted(
        map(tuple, pre.collect())
    )
    base_n = prepare_training_corpus(docs).count()
    assert 0 < with_stage.count() < base_n


def test_pipeline_gopher_empty_dict_enables_defaults(spark):
    """gopher_quality={} plausibly means 'enable with the published
    defaults' — a falsy-dict gate would silently skip the battery
    (round-13 ADVICE). {} must behave exactly like True, and must
    NOT equal the battery-off run on a corpus where the published
    defaults actually cut documents (synthetic vocab has no English
    stop words, so min_stop_hits fails everywhere)."""
    docs = load(spark, SF_DIR, "documents").limit(200)
    with_empty = prepare_training_corpus(docs, gopher_quality={})
    with_true = prepare_training_corpus(docs, gopher_quality=True)
    assert sorted(map(tuple, with_empty.collect())) == sorted(
        map(tuple, with_true.collect())
    )
    off = prepare_training_corpus(docs)
    assert with_empty.count() != off.count()
