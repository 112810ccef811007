"""Training-data scrub operators: benchmark decontamination and PII
redaction — DuckDB differentials plus the invariants that matter
(benchmark members flag 1.0, redaction idempotent, plan map-only).

Both operators are implemented but NOT driver-registered (the gate is
pinned at 50 — tests/test_inventory.py), so their oracle verification
lives here, mirroring the q_binary_meta / IVF precedents.
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

import duckdb
import pandas as pd
import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_ingestor_gluejob_script_spark.queries._util import load  # noqa: E402
from data_ingestor_gluejob_script_spark.queries.textops import (  # noqa: E402
    CONTAMINATION_ORACLE,
    REDACT_ORACLE,
    contamination_report,
    redact_pii,
)

SF_DIR = "/root/testdata/sf0.001"
BENCH_PRED_SQL = "doc_id % 100 = 0"


def _multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(str(r[i]) for i in order) for r in rows)


def test_contamination_differential(spark):
    docs = load(spark, SF_DIR, "documents")
    bench = docs.filter(F.col("doc_id") % 100 == 0)
    got = contamination_report(docs, bench)
    s_cols = got.columns
    s_rows = [tuple(r) for r in got.collect()]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    con.execute(
        f"CREATE VIEW benchmark AS "
        f"SELECT * FROM documents WHERE {BENCH_PRED_SQL}"
    )
    cur = con.execute(CONTAMINATION_ORACLE)
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()
    assert sorted(o_cols) == sorted(s_cols)
    assert _multiset(s_cols, s_rows) == _multiset(o_cols, o_rows)

    # Benchmark members overlap themselves completely; the report
    # covers the whole corpus (shingle-less docs included as clean).
    by_id = {r[0]: r for r in s_rows}
    assert len(by_id) == docs.count()
    for r in s_rows:
        doc_id, n_sh, n_ov, ratio, flag = r
        if doc_id % 100 == 0:
            assert ratio == 1.0 and flag
        assert 0 <= n_ov <= n_sh


def _pii_frame():
    return pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                "contact alice@example.com or bob.smith+tag@mail.co.uk now",
                "server 10.0.0.1 and 192.168.1.255 responded",
                "call 555-123-4567 or 555 1234 5678 today",
                "clean text with no identifiers at all",
                "mail admin@host.org from 8.8.8.8 tel 555-000-1111",
            ],
        }
    )


def test_redact_differential(spark):
    pdf = _pii_frame()
    docs = spark.createDataFrame(pdf)
    got = redact_pii(docs)
    s_cols = got.columns
    s_rows = got.collect()

    con = duckdb.connect()
    con.register("documents", pdf)
    cur = con.execute(REDACT_ORACLE)
    o_cols = [d[0] for d in cur.description]
    assert sorted(o_cols) == sorted(s_cols)
    assert _multiset(s_cols, [tuple(r) for r in s_rows]) == _multiset(
        o_cols, cur.fetchall()
    )

    by_id = {r.doc_id: r for r in s_rows}
    assert by_id[0].n_email == 2 and "[EMAIL]" in by_id[0].text_redacted
    assert by_id[1].n_ipv4 == 2 and "[IP]" in by_id[1].text_redacted
    assert by_id[2].n_phone == 2 and "[PHONE]" in by_id[2].text_redacted
    assert by_id[3].text_redacted == pdf.text[3]  # clean doc untouched
    assert by_id[4].n_email == by_id[4].n_ipv4 == by_id[4].n_phone == 1
    for r in s_rows:
        assert "@" not in r.text_redacted


def test_redact_idempotent(spark):
    docs = spark.createDataFrame(_pii_frame())
    once = redact_pii(docs).select(
        "doc_id", F.col("text_redacted").alias("text")
    )
    twice = redact_pii(once)
    for r in twice.collect():
        assert r.n_email == r.n_ipv4 == r.n_phone == 0


def test_contamination_plan_shape(spark):
    """Scale contract: benchmark shingles broadcast; the corpus's only
    hash exchange is the per-doc aggregation."""
    docs = load(spark, SF_DIR, "documents")
    bench = docs.filter(F.col("doc_id") % 100 == 0)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        contamination_report(docs, bench).explain("formatted")
    p = buf.getvalue()
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    assert p.count("hashpartitioning(doc_id") == 1


# Adversarial ASCII soup for the PII regexes: digits, dots, dashes,
# @, +, %, spaces — the alphabet where a Java-vs-RE2 \b or greediness
# divergence would hide.
_pii_alphabet = st.sampled_from(list("ab3. -@+%_0:/x9"))
_pii_text = st.text(alphabet=_pii_alphabet, min_size=0, max_size=60)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_pii_text, min_size=1, max_size=20))
def test_redact_property_differential(spark, texts):
    """Property differential: on RANDOM near-PII strings, Spark's
    regexp_count/regexp_replace and DuckDB's regexp_extract_all/
    regexp_replace must agree cell-for-cell — the fixed-example test
    can't cover the boundary cases this fuzzes."""
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = redact_pii(spark.createDataFrame(pdf))
    s_cols = got.columns
    s_rows = [tuple(r) for r in got.collect()]

    con = duckdb.connect()
    con.register("documents", pdf)
    cur = con.execute(REDACT_ORACLE)
    o_cols = [d[0] for d in cur.description]
    assert sorted(o_cols) == sorted(s_cols)
    assert _multiset(s_cols, s_rows) == _multiset(o_cols, cur.fetchall())


_word = st.sampled_from(["the", "fast", "key", "sort", "a", "b3", ""])
_doc = st.lists(_word, min_size=0, max_size=6).map(" ".join)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(_doc, min_size=1, max_size=12),
    bench_mod=st.integers(min_value=2, max_value=5),
)
def test_contamination_property_differential(spark, docs, bench_mod):
    """Property differential over tiny synthetic docs: covers the
    short-document shingle guard (docs with < 3 words — which the
    testdata corpus never exercises), repeated shingles, empty texts,
    and EMPTY benchmark sets, against the same CTE oracle."""
    pdf = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    # == 1, not == 0: doc 0 would match every modulus, making the
    # benchmark non-empty always — with == 1 a single-doc corpus gets
    # an EMPTY benchmark, exercising the oracle's NULL-list COALESCE.
    bdf = pdf[pdf.doc_id % bench_mod == 1][["doc_id", "text"]]

    sdocs = spark.createDataFrame(pdf)
    sbench = sdocs.filter(F.col("doc_id") % bench_mod == 1)
    got = contamination_report(sdocs, sbench)
    s_cols = got.columns
    s_rows = [tuple(r) for r in got.collect()]

    con = duckdb.connect()
    con.register("documents", pdf)
    con.register("benchmark", bdf)
    cur = con.execute(CONTAMINATION_ORACLE)
    o_cols = [d[0] for d in cur.description]
    assert sorted(o_cols) == sorted(s_cols)
    assert _multiset(s_cols, s_rows) == _multiset(o_cols, cur.fetchall())
    assert len(s_rows) == len(docs)  # every doc reported, shingled or not


def test_contamination_empty_benchmark(spark):
    """Degenerate but legal: an empty benchmark set must yield a clean
    report (not NULLs) in BOTH engines — DuckDB's list() aggregate over
    zero rows is NULL, which the oracle's COALESCE absorbs."""
    pdf = pd.DataFrame({"doc_id": [0], "text": ["the fast key sort"]})
    sdocs = spark.createDataFrame(pdf)
    got = contamination_report(sdocs, sdocs.filter(F.lit(False))).collect()
    assert len(got) == 1
    assert got[0].n_shingles == 2 and got[0].n_overlap == 0
    assert got[0].overlap_ratio == 0.0 and not got[0].contaminated

    con = duckdb.connect()
    con.register("documents", pdf)
    con.register("benchmark", pdf[pdf.doc_id < 0])
    row = con.execute(CONTAMINATION_ORACLE).fetchall()[0]
    assert row[1] == 2 and row[2] == 0 and row[3] == 0.0 and row[4] is False


def test_decontaminate_removes_flagged_docs(spark):
    """decontaminate == corpus minus the report's contaminated set,
    schema intact — benchmark members (self-overlap 1.0) must all go."""
    from data_ingestor_gluejob_script_spark.queries.textops import (
        decontaminate,
    )

    docs = load(spark, SF_DIR, "documents")
    bench = docs.filter(F.col("doc_id") % 100 == 0)
    clean = decontaminate(docs, bench)
    assert clean.columns == docs.columns

    flagged = {
        r.doc_id
        for r in contamination_report(docs, bench)
        .filter(F.col("contaminated"))
        .collect()
    }
    kept = {r.doc_id for r in clean.select("doc_id").collect()}
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert kept == all_ids - flagged
    assert flagged.issuperset({r.doc_id for r in bench.select("doc_id").collect()})
