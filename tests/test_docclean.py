"""Corpus line-dedup (C4 rule) and Gopher repetition metrics:
differentials against exact pure-Python oracles on crafted multi-line
fixtures AND on the real sf0.001 documents table (reshaped into
10-word lines so the corpus-level line dedup has real work to do),
plus hypothesis fuzz over random word streams.

Both operators are NOT driver-registered (inventory pinned at 50), so
their oracle verification lives here, mirroring the scrub/IVF
precedents; wall-clock lives in queries/extras.py.
"""

from __future__ import annotations

import sys
from collections import Counter
from pathlib import Path

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_ingestor_gluejob_script_spark.queries._util import load  # noqa: E402
from data_ingestor_gluejob_script_spark.queries.docclean import (  # noqa: E402
    gopher_filter,
    gopher_repetition_frame,
    line_dedup_frame,
)
from data_ingestor_gluejob_script_spark.queries.extras import (  # noqa: E402
    multiline_docs,
)

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- oracles


def line_dedup_oracle(rows, delim="\n"):
    """{doc_id: (text, n_lines, n_kept)} — first occurrence of each
    distinct line in (doc_id, pos) order survives, empty docs drop."""
    first = {}
    for doc_id, text in rows:
        for pos, line in enumerate(text.split(delim)):
            if line not in first or (doc_id, pos) < first[line]:
                first[line] = (doc_id, pos)
    out = {}
    for doc_id, text in rows:
        lines = text.split(delim)
        kept = [
            ln for pos, ln in enumerate(lines) if first[ln] == (doc_id, pos)
        ]
        if kept:
            out[doc_id] = (delim.join(kept), len(lines), len(kept))
    return out


def _grams(words, n):
    if len(words) < n:
        return []
    return [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]


def _round6(x: float) -> float:
    # mirror Spark's Round(double, 6): shortest decimal repr, HALF_UP.
    # Python's builtin round() is banker's and diverges at exact
    # midpoints — which dyadic ratios like 18/256 = 0.0703125 hit.
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )


def gopher_oracle_row(text, delim="\n"):
    words = text.split(" ")
    lines = text.split(delim)
    n_chars = len(text)
    line_counts = Counter(lines)
    dup_line_frac = (
        _round6(1 - len(line_counts) / len(lines)) if lines else 0.0
    )
    dup_line_chars = sum(
        c * len(ln) for ln, c in line_counts.items() if c >= 2
    )
    dup_line_char_frac = (
        _round6(dup_line_chars / n_chars) if n_chars > 0 else 0.0
    )
    bi = Counter(_grams(words, 2))
    if bi:
        # max by (count, gram): ties -> lexicographically largest gram
        top_gram = max(bi, key=lambda g: (bi[g], g))
        top_bi_frac = (
            _round6(bi[top_gram] * len(top_gram) / n_chars)
            if n_chars > 0
            else 0.0
        )
    else:
        top_gram, top_bi_frac = None, 0.0
    tri = Counter(_grams(words, 3))
    dup_tri_chars = sum(c * len(g) for g, c in tri.items() if c >= 2)
    dup_tri_frac = (
        min(1.0, _round6(dup_tri_chars / n_chars)) if n_chars > 0 else 0.0
    )
    return (
        len(words),
        n_chars,
        dup_line_frac,
        dup_line_char_frac,
        top_gram,
        top_bi_frac,
        dup_tri_frac,
    )


# ---------------------------------------------------------------- fixtures

FIXTURE = [
    # doc 0: internal duplicate line ("b b" twice) + shared line "a"
    (0, "a\nb b\nc\nb b"),
    # doc 1: all lines are corpus-duplicates of doc 0 -> doc dropped
    (1, "a\nc"),
    # doc 2: one novel line among duplicates
    (2, "c\nnovel line here\na"),
    # doc 3: empty text (one empty line; also appears in no other doc)
    (3, ""),
    # doc 4: repeated words for the repetition metrics
    (4, "x y x y x y z\nx y x y x y z"),
]


def _fixture_df(spark):
    return spark.createDataFrame(FIXTURE, "doc_id long, text string")


# ---------------------------------------------------------------- tests


def test_line_dedup_fixture(spark):
    got = {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_kept"])
        for r in line_dedup_frame(_fixture_df(spark)).collect()
    }
    assert got == line_dedup_oracle(FIXTURE)
    # doc 1 fully collapsed away; the empty line of doc 3 survives
    # (first occurrence of "" in the corpus)
    assert 1 not in got
    assert got[3] == ("", 1, 1)


def test_line_dedup_each_line_survives_exactly_once(spark):
    out = line_dedup_frame(_fixture_df(spark)).collect()
    all_lines = [
        ln for r in out for ln in r["text"].split("\n")
    ]
    assert len(all_lines) == len(set(all_lines))
    # and the survivor set is exactly the corpus's distinct line set
    corpus_lines = {
        ln for _, t in FIXTURE for ln in t.split("\n")
    }
    assert set(all_lines) == corpus_lines


def test_line_dedup_differential_sf0001(spark):
    docs = multiline_docs(load(spark, SF_DIR, "documents"))
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    got = {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_kept"])
        for r in line_dedup_frame(docs).collect()
    }
    assert got == line_dedup_oracle(rows)
    # sanity: the reshape really produced multi-line docs and the
    # generator's repetitive vocabulary really produced cross-doc
    # duplicate lines (otherwise this differential tests nothing)
    assert any("\n" in t for _, t in rows)
    assert sum(r[2] for r in got.values()) < sum(r[1] for r in got.values())


def test_multiline_reshape_parity(spark):
    """The Spark-side 10-word-line reshape used by the bench and the
    differential must agree with the oracle-side reshape (python split
    + chunks of 10) — otherwise the differential compares different
    corpora."""
    docs = load(spark, SF_DIR, "documents").limit(50)
    got = {
        r["doc_id"]: r["text"] for r in multiline_docs(docs).collect()
    }
    for r in docs.collect():
        ws = r["text"].split(" ")
        want = "\n".join(
            " ".join(ws[i : i + 10]) for i in range(0, len(ws), 10)
        )
        assert got[r["doc_id"]] == want


def test_gopher_fixture_and_sf0001(spark):
    for df, rows in (
        (_fixture_df(spark), FIXTURE),
        (
            load(spark, SF_DIR, "documents").select("doc_id", "text"),
            None,
        ),
    ):
        if rows is None:
            rows = [(r["doc_id"], r["text"]) for r in df.collect()]
        got = {r["doc_id"]: r for r in gopher_repetition_frame(df).collect()}
        assert len(got) == len(rows)
        for doc_id, text in rows:
            r = got[doc_id]
            assert (
                r["n_words"],
                r["n_chars"],
                r["dup_line_frac"],
                r["dup_line_char_frac"],
                r["top_bigram"],
                r["top_bigram_char_frac"],
                r["dup_trigram_char_frac"],
            ) == gopher_oracle_row(text), f"doc {doc_id}: {text!r}"


def test_gopher_filter_drops_repetitive_doc(spark):
    kept = gopher_filter(
        _fixture_df(spark), top_bigram_max=0.2, dup_trigram_max=0.3
    )
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    # doc 4 is wall-to-wall "x y" repetition -> filtered; the prose
    # docs survive. Thresholds checked against the oracle directly:
    for doc_id, text in FIXTURE:
        o = gopher_oracle_row(text)
        assert (doc_id in ids) == (o[5] <= 0.2 and o[6] <= 0.3)
    assert 4 not in ids


@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "ab", "xyz", ""]),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_docclean_fuzz(spark, word_lists):
    rows = [
        (i, " ".join(ws)) for i, ws in enumerate(word_lists)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got_ld = {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_kept"])
        for r in line_dedup_frame(df).collect()
    }
    assert got_ld == line_dedup_oracle(rows)
    got_g = {r["doc_id"]: r for r in gopher_repetition_frame(df).collect()}
    for doc_id, text in rows:
        r = got_g[doc_id]
        assert (
            r["n_words"],
            r["n_chars"],
            r["dup_line_frac"],
            r["dup_line_char_frac"],
            r["top_bigram"],
            r["top_bigram_char_frac"],
            r["dup_trigram_char_frac"],
        ) == gopher_oracle_row(text)
