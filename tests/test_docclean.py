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
import pytest

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
@pytest.mark.slow
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


# ------------------------------------------- duplicate-span removal


def dedup_spans_oracle(rows, n):
    occ = []
    for doc_id, text in rows:
        ws = text.split(" ")
        for i in range(len(ws) - n + 1):
            occ.append((doc_id, i, " ".join(ws[i : i + n])))
    cnt = Counter(g for _, _, g in occ)
    first = {}
    for doc_id, i, g in occ:
        if g not in first or (doc_id, i) < first[g]:
            first[g] = (doc_id, i)
    covered = {doc_id: set() for doc_id, _ in rows}
    for doc_id, i, g in occ:
        if cnt[g] >= 2 and first[g] != (doc_id, i):
            covered[doc_id].update(range(i, i + n))
    out = {}
    for doc_id, text in rows:
        ws = text.split(" ")
        keep = [w for p, w in enumerate(ws) if p not in covered[doc_id]]
        if keep:
            out[doc_id] = (" ".join(keep), len(ws), len(keep))
    return out


SPAN_FIXTURE = [
    # doc 0 owns the boilerplate (first occurrence, survives whole)
    (0, "alpha beta gamma delta epsilon zeta"),
    # doc 1 repeats doc 0's 3-gram run inside fresh prose
    (1, "intro words alpha beta gamma delta tail piece"),
    # doc 2 is wall-to-wall the boilerplate -> emptied, dropped
    (2, "alpha beta gamma delta"),
    # doc 3: internal repetition of its own 3-gram
    (3, "x y z q x y z q end"),
    # doc 4: too short for any 3-gram span
    (4, "a b"),
]


def test_dedup_spans_fixture(spark):
    from data_ingestor_gluejob_script_spark.queries.docclean import (
        dedup_spans_frame,
    )

    df = spark.createDataFrame(SPAN_FIXTURE, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_kept"])
        for r in dedup_spans_frame(df, n=3).collect()
    }
    want = dedup_spans_oracle(SPAN_FIXTURE, n=3)
    assert got == want
    assert 2 not in got  # fully-covered doc dropped
    assert got[0][0] == SPAN_FIXTURE[0][1]  # first occurrence intact
    assert got[4] == ("a b", 2, 2)  # sub-span doc passes through
    assert got[1][2] < got[1][1]  # repeated run really removed


def test_dedup_spans_differential_sf0001(spark):
    from data_ingestor_gluejob_script_spark.queries.docclean import (
        dedup_spans_frame,
    )

    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    for n in (5, 8):
        got = {
            r["doc_id"]: (r["text"], r["n_tokens"], r["n_kept"])
            for r in dedup_spans_frame(docs, n=n).collect()
        }
        assert got == dedup_spans_oracle(rows, n=n), f"n={n}"
    # the generator's repetitive vocabulary must actually produce
    # removable spans at the tighter width or this differential is
    # vacuous
    got5 = dedup_spans_oracle(rows, n=5)
    assert sum(v[2] for v in got5.values()) < sum(
        v[1] for v in got5.values()
    )


@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c"]), min_size=0, max_size=14
        ),
        min_size=1,
        max_size=5,
    )
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
def test_dedup_spans_fuzz(spark, word_lists):
    from data_ingestor_gluejob_script_spark.queries.docclean import (
        dedup_spans_frame,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(word_lists)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_kept"])
        for r in dedup_spans_frame(df, n=3).collect()
    }
    assert got == dedup_spans_oracle(rows, n=3)


# ------------------------------------------- temperature mixture


def test_temperature_weights_closed_form():
    from data_ingestor_gluejob_script_spark.queries.corpusstats import (
        temperature_weights,
    )

    counts = {"big": 8000, "mid": 1500, "small": 500}
    # alpha=1 -> proportional mixture -> uniform keep rate
    w1 = temperature_weights(counts, alpha=1.0, total_frac=0.4)
    for s in counts:
        assert abs(w1[s] - 0.4) < 1e-12
    # alpha<1 flattens: rarer sources keep a HIGHER fraction; at
    # total_frac=0.4 the smallest source caps at 1.0 (keep all)
    w = temperature_weights(counts, alpha=0.5, total_frac=0.4)
    assert w["small"] > w["mid"] > w["big"]
    assert w["small"] == 1.0
    # expected kept total matches target when nothing caps at 1.0
    w2 = temperature_weights(counts, alpha=0.5, total_frac=0.2)
    assert all(v < 1.0 for v in w2.values())
    exp = sum(w2[s] * c for s, c in counts.items())
    assert abs(exp - 0.2 * sum(counts.values())) < 1e-6


def test_temperature_mixture_differential(spark):
    import duckdb

    from data_ingestor_gluejob_script_spark.queries.corpusstats import (
        temperature_mixture_frame,
        temperature_weights,
        weighted_sample_oracle,
    )

    docs = load(spark, SF_DIR, "documents")
    got = sorted(
        r["doc_id"]
        for r in temperature_mixture_frame(
            docs, alpha=0.6, total_frac=0.5
        ).collect()
    )
    counts = {
        r["source"]: r["cnt"]
        for r in docs.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    w = temperature_weights(counts, alpha=0.6, total_frac=0.5)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = sorted(
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM ({weighted_sample_oracle(w)})"
        ).fetchall()
    )
    assert got == want
    assert 0 < len(got) < docs.count()


def test_dedup_spans_clone_collapse_semantics(spark):
    """Clone-heavy corpus pins the collapse fast path against the
    same oracle: long clones vanish entirely, short clones pass
    through intact, the representative keeps the first occurrences."""
    from data_ingestor_gluejob_script_spark.queries.docclean import (
        dedup_spans_frame,
    )

    long = "p q r s t u v w"
    rows = (
        [(i, long) for i in range(5)]  # 5 clones of a long text
        + [(10, "a b"), (11, "a b")]  # 2 clones of a sub-span text
        + [(20, "p q r fresh tail words here")]  # partial overlap
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_kept"])
        for r in dedup_spans_frame(df, n=3).collect()
    }
    assert got == dedup_spans_oracle(rows, n=3)
    assert 0 in got and all(i not in got for i in (1, 2, 3, 4))
    assert got[10] == ("a b", 2, 2) and got[11] == ("a b", 2, 2)
    assert got[0][0] == long


def test_null_text_treated_as_empty_across_docclean_and_classifier(spark):
    """Round-9 review finding: explode(split(NULL)) emits nothing, so
    null-text docs silently vanished from line dedup, gopher metrics,
    span dedup, and classifier scores. Pin the NULL == empty-text
    convention: the doc appears in every output."""
    from data_ingestor_gluejob_script_spark.queries.classifier import (
        classifier_score_frame,
        standin_weights,
    )
    from data_ingestor_gluejob_script_spark.queries.docclean import (
        dedup_spans_frame,
    )

    rows = [(1, None), (2, "real words here today")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    as_empty = [(1, ""), (2, "real words here today")]

    got_g = {r["doc_id"]: r for r in gopher_repetition_frame(df).collect()}
    assert set(got_g) == {1, 2}
    for doc_id, text in as_empty:
        r = got_g[doc_id]
        assert (r["n_words"], r["n_chars"]) == gopher_oracle_row(text)[:2]

    got_ld = {r["doc_id"] for r in line_dedup_frame(df).collect()}
    assert got_ld == {1, 2}  # the "" line survives as first occurrence

    got_sp = {
        r["doc_id"]: r["n_kept"]
        for r in dedup_spans_frame(df, n=3).collect()
    }
    assert got_sp == {1: 1, 2: 4}

    got_cl = {
        r["doc_id"]: r["n_tokens"]
        for r in classifier_score_frame(df, standin_weights(spark)).collect()
    }
    assert got_cl == {1: 1, 2: 4}


def test_temperature_mixture_null_source_is_its_own_group(spark):
    """Round-9 review finding: a NULL source crashed the weights sort
    (TypeError) or, all-NULL, silently dropped every doc. NULLs now
    form their own mixture group."""
    from data_ingestor_gluejob_script_spark.queries.corpusstats import (
        temperature_mixture_frame,
    )

    rows = [(i, "t", None if i % 3 == 0 else f"src{i % 2}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    kept = temperature_mixture_frame(df, alpha=0.5, total_frac=0.9).collect()
    assert 0 < len(kept) <= 60
    # null-source docs participate (not all dropped)
    assert any(r["source"] is None for r in kept)
    assert "_mix_key" not in {c for r in kept for c in r.asDict()}

    all_null = spark.createDataFrame(
        [(i, "t", None) for i in range(20)],
        "doc_id long, text string, source string",
    )
    kept2 = temperature_mixture_frame(all_null, alpha=1.0, total_frac=1.0)
    assert kept2.count() == 20  # total_frac=1 keeps everything


# ------------------------------------------- Gopher QUALITY battery

from data_ingestor_gluejob_script_spark.queries.docclean import (  # noqa: E402
    GOPHER_BULLET_PREFIXES,
    GOPHER_STOP_WORDS,
    gopher_quality_filter,
    gopher_quality_frame,
)


def quality_oracle_row(text):
    """Exact python mirror of gopher_quality_frame's metric columns
    (rounded identically — the dyadic-edge convention) plus the
    default-threshold keep decision."""
    import re

    text = text or ""
    # Java's \s (what F.split compiles) is ASCII-only; Python's is
    # unicode-aware and would split at NBSP etc. where Spark doesn't —
    # mirror Java exactly (round-12 review finding)
    words = [w for w in re.split(r"[ \t\n\x0b\f\r]+", text) if w]
    lines = text.split("\n")
    nw = len(words)
    mean_wl = _round6(sum(len(w) for w in words) / nw) if nw else 0.0
    hash_r = _round6(text.count("#") / nw) if nw else 0.0
    ell_r = (
        _round6((text.count("...") + text.count("…")) / nw) if nw else 0.0
    )
    bullets = sum(
        1
        for ln in lines
        if ln.lstrip(" ")[:1] in GOPHER_BULLET_PREFIXES
    )
    ell_lines = sum(
        1
        for ln in lines
        if ln.rstrip(" ").endswith(("...", "…"))
    )
    bullet_f = _round6(bullets / len(lines)) if lines else 0.0
    ell_f = _round6(ell_lines / len(lines)) if lines else 0.0
    alpha = sum(1 for w in words if re.search("[A-Za-z]", w))
    alpha_f = _round6(alpha / nw) if nw else 0.0
    stops = len(
        {w.lower() for w in words} & set(GOPHER_STOP_WORDS)
    )
    kept = (
        50 <= nw <= 100_000
        and 3.0 <= mean_wl <= 10.0
        and hash_r <= 0.1
        and ell_r <= 0.1
        and bullet_f <= 0.90
        and ell_f <= 0.30
        and alpha_f >= 0.80
        and stops >= 2
    )
    return (
        nw, mean_wl, hash_r, ell_r, bullet_f, ell_f, alpha_f, stops, kept
    )


GOOD_DOC = " ".join(
    "the quick brown fox jumps over that lazy dog pack with zeal and"
    " vigor to be of good cheer have faith".split()
    * 3
)  # 60 words, all stop-word & length rules satisfied

QUALITY_FIXTURE = [
    (0, GOOD_DOC),
    (1, "too short to pass"),  # word-count floor
    (2, None),  # NULL text -> empty conventions
    (3, ""),  # empty
    (4, GOOD_DOC + " " + "#tag " * 12),  # hash symbol ratio
    (5, GOOD_DOC + ("\nthis line trails off..." * 9)),  # ellipsis lines
    (6, "\n".join(["• bullet item"] * 30) + "\n" + GOOD_DOC),  # bullets
    # 60 alpha words, mean len in-window, zero stop words -> the ONLY
    # violated rule is stop_word_hits >= 2
    (7, " ".join(["apple banana cherry"] * 20)),  # stops
    (8, " ".join(["12345"] * 60)),  # no alpha words
    (9, " ".join(["ab"] * 60) + " the of"),  # mean word len floor
    (10, GOOD_DOC + " … … … … … … … …"),  # unicode ellipsis tokens
    (11, "  " + GOOD_DOC + "\t\n"),  # whitespace-edge tokenization
]


def test_quality_battery_matches_oracle(spark):
    df = spark.createDataFrame(QUALITY_FIXTURE, "doc_id long, text string")
    got = {r["doc_id"]: r for r in gopher_quality_frame(df).collect()}
    assert len(got) == len(QUALITY_FIXTURE)
    for doc_id, text in QUALITY_FIXTURE:
        r = got[doc_id]
        assert (
            r["n_words"],
            r["mean_word_len"],
            r["hash_word_ratio"],
            r["ellipsis_word_ratio"],
            r["bullet_line_frac"],
            r["ellipsis_line_frac"],
            r["alpha_word_frac"],
            r["stop_word_hits"],
            r["kept"],
        ) == quality_oracle_row(text), f"doc {doc_id}: {text!r}"
    assert got[0]["kept"] and got[11]["kept"]
    assert not any(
        got[i]["kept"] for i in (1, 2, 3, 4, 5, 6, 7, 8, 9, 10)
    )


def test_quality_battery_sf0001(spark):
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    got = {r["doc_id"]: r for r in gopher_quality_frame(docs).collect()}
    assert len(got) == len(rows)
    for doc_id, text in rows.items():
        r = got[doc_id]
        assert (
            r["n_words"],
            r["mean_word_len"],
            r["hash_word_ratio"],
            r["ellipsis_word_ratio"],
            r["bullet_line_frac"],
            r["ellipsis_line_frac"],
            r["alpha_word_frac"],
            r["stop_word_hits"],
            r["kept"],
        ) == quality_oracle_row(text)


def test_quality_filter_forms_agree(spark):
    """Inline (join-free) filter == frame's kept set; the collision
    fallback (caller already owns a metric column name) produces the
    same rows; extra payload columns ride through."""
    df = spark.createDataFrame(
        [(i, t, f"payload-{i}") for i, t in QUALITY_FIXTURE],
        "doc_id long, text string, extra string",
    )
    want = {
        r["doc_id"]
        for r in gopher_quality_frame(df.select("doc_id", "text"))
        .filter("kept")
        .collect()
    }
    inline = gopher_quality_filter(df)
    assert {r["doc_id"] for r in inline.collect()} == want
    assert inline.columns == ["doc_id", "text", "extra"]
    # caller owning a metric name must not perturb the result or the
    # schema — metrics are composed as expressions, never materialized
    colliding = df.withColumn("n_words", F.lit(-1))
    fb = gopher_quality_filter(colliding)
    assert {r["doc_id"] for r in fb.collect()} == want
    assert "n_words" in fb.columns
    # round-12 review fix: no id column is required even when names
    # collide (the old fallback semi-joined on doc_id), and owning a
    # STAGING name just moves the staging to the next prefix
    wanted_texts = {
        t for i, t in QUALITY_FIXTURE if i in want and t is not None
    }
    no_id = spark.createDataFrame(
        [(t, -1, "x") for _, t in QUALITY_FIXTURE],
        "text string, n_words long, _gq_ws string",
    )
    got = gopher_quality_filter(no_id)
    assert {r["text"] for r in got.collect()} == wanted_texts
    assert got.columns == ["text", "n_words", "_gq_ws"]


@given(
    st.lists(
        st.sampled_from(
            [
                "the", "of", "#", "...", "…", "•x", "12", "abcd", "",
                "a" * 11, "the be",  # NBSP: one token in Java \s
            ]
        ),
        min_size=0,
        max_size=80,
    ),
    st.integers(min_value=1, max_value=5),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
def test_quality_battery_fuzz(spark, toks, n_lines):
    text = "\n".join(
        " ".join(toks[i::n_lines]) for i in range(n_lines)
    )
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    r = gopher_quality_frame(df).collect()[0]
    assert (
        r["n_words"],
        r["mean_word_len"],
        r["hash_word_ratio"],
        r["ellipsis_word_ratio"],
        r["bullet_line_frac"],
        r["ellipsis_line_frac"],
        r["alpha_word_frac"],
        r["stop_word_hits"],
        r["kept"],
    ) == quality_oracle_row(text), repr(text)
