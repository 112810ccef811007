"""Differentials for the C4 line/page rules (docclean.c4_line_filter_frame
and c4_filter, round-11 third wave) against an exact pure-python oracle
mirroring the Catalyst expressions — trim-then-test per line, absolute
end-of-input anchoring, F.split(" +") word counting."""

from __future__ import annotations

import pytest

from data_ingestor_gluejob_script_spark.queries.docclean import (
    C4_MIN_KEPT_LINES,
    C4_MIN_LINE_WORDS,
    c4_filter,
    c4_line_filter_frame,
)

_TERMINAL = set('.!?"”')


def _keep_line(line, min_words):
    t = line.strip(" ")
    if not t or t[-1] not in _TERMINAL:
        return False
    import re

    if len(re.split(" +", t)) < min_words:
        return False
    return "javascript" not in t.lower()


def oracle(text, min_words=C4_MIN_LINE_WORDS, min_lines=C4_MIN_KEPT_LINES):
    t = text if text is not None else ""
    lines = t.split("\n")
    kept = [l for l in lines if _keep_line(l, min_words)]
    has_li = "lorem ipsum" in t.lower()
    has_brace = "{" in t
    return {
        "text_clean": "\n".join(kept),
        "n_lines": len(lines),
        "n_kept_lines": len(kept),
        "has_lorem_ipsum": has_li,
        "has_brace": has_brace,
        "page_kept": (not has_li) and (not has_brace) and len(kept) >= min_lines,
    }


DOCS = [
    (0, None),
    (1, ""),
    (2, "This is a proper sentence with enough words."),
    (
        3,
        "One good line that is long enough.\n"
        "Another proper sentence ends with a question mark?\n"
        'A third quoted line has five words."\n'
        "short line.\n"
        "no terminal punctuation on this line\n"
        "Please enable javascript to view this site properly.",
    ),
    (4, "Lorem Ipsum dolor sit amet makes the page fail.\nA second fine line is here.\nAnd a third one right here.\nPlus a fourth to be safe."),
    (5, "function f() { return 1; } is code not prose.\nA perfectly good sentence sits right here.\nAnother perfectly good sentence sits here.\nAnd one more for the count."),
    (6, "  Trimmed line with leading spaces survives fine.  \nends with curly quote after many words”\nSpaces   between    words still count correctly here."),
    (7, "ends with carriage return after enough words.\r\nJava dollar would match before the CR here.\r"),
    (8, "Three good lines make the page survive one.\nThree good lines make the page survive two.\nThree good lines make the page survive three."),
    (9, "Only two good lines on this page here one.\nOnly two good lines on this page here two."),
    (10, "tab\tseparated words are one token to the splitter."),
]


@pytest.fixture(scope="module")
def frame_rows(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in c4_line_filter_frame(docs).collect()}


def test_c4_frame_matches_oracle(frame_rows):
    for doc_id, text in DOCS:
        want = oracle(text)
        got = frame_rows[doc_id]
        for k, v in want.items():
            assert got[k] == v, (doc_id, k, repr(text), got[k], v)


def test_c4_specific_rules(frame_rows):
    # doc 3: of six lines only the first three survive (short, no
    # terminal punct, and the javascript banner all fail)
    assert frame_rows[3]["n_kept_lines"] == 3
    assert "javascript" not in frame_rows[3]["text_clean"]
    # page rules: lorem ipsum and brace kill otherwise-fine pages
    assert frame_rows[4]["has_lorem_ipsum"] and not frame_rows[4]["page_kept"]
    assert frame_rows[5]["has_brace"] and not frame_rows[5]["page_kept"]
    # three surviving lines keep the page, two do not
    assert frame_rows[8]["page_kept"] is True
    assert frame_rows[9]["page_kept"] is False
    # CR is NOT stripped by trim and the anchor is absolute end: the
    # "...words.\r" line fails (last char is \r, not punctuation)
    assert frame_rows[7]["n_kept_lines"] == 0
    # NULL text behaves as empty: present, nothing kept
    assert frame_rows[0]["n_kept_lines"] == 0 and frame_rows[0]["text_clean"] == ""
    # a tab joins words into one splitter token: 8 spaces-split tokens
    assert frame_rows[10]["n_kept_lines"] == 1


def test_c4_filter_composable_form(spark):
    docs = spark.createDataFrame(
        [(i, t, f"src{i}") for i, t in DOCS],
        "doc_id long, text string, source string",
    )
    out = {r["doc_id"]: r.asDict() for r in c4_filter(docs).collect()}
    want_kept = {i for i, t in DOCS if oracle(t)["page_kept"]}
    assert set(out) == want_kept
    for i in want_kept:
        assert out[i]["text"] == oracle(dict(DOCS)[i])["text_clean"]
        assert out[i]["source"] == f"src{i}"
    assert list(next(iter(out.values())).keys()) == ["doc_id", "text", "source"]


def test_c4_on_corpus_differential(spark):
    """sf0.001 documents (word soup, no punctuation): the frame must
    agree with the oracle on every row — in particular every page is
    dropped for lack of terminal punctuation, never for a false
    lorem-ipsum/brace flag."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {r["doc_id"]: r.asDict() for r in c4_line_filter_frame(docs).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    assert len(got) == 500
    for doc_id, text in texts.items():
        want = oracle(text)
        row = got[doc_id]
        for k, v in want.items():
            assert row[k] == v, (doc_id, k)


def test_c4_randomized_corpus_differential(spark):
    """300 seeded-random multi-line docs stressing every rule boundary
    (terminal chars, word counts around the threshold, javascript and
    lorem-ipsum tokens, braces, CRs, empty lines) — frame vs oracle on
    every row."""
    import random

    rng = random.Random(1106)
    words = ["alpha", "beta", "gamma", "delta", "ok", "javascript", "Lorem", "ipsum"]
    tails = [".", "!", "?", '"', "”", "", " ", "\r", ")", ":"]
    docs = []
    for i in range(300):
        lines = []
        for _ in range(rng.randrange(0, 8)):
            n = rng.randrange(0, 9)
            line = " " * rng.randrange(0, 3) + " ".join(
                rng.choice(words) for _ in range(n)
            ) + rng.choice(tails)
            if rng.random() < 0.05:
                line += "{"
            lines.append(line)
        docs.append((i, "\n".join(lines) if lines else rng.choice(["", None])))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in c4_line_filter_frame(df).collect()}
    for doc_id, text in docs:
        want = oracle(text)
        for k, v in want.items():
            assert got[doc_id][k] == v, (doc_id, k, repr(text))


def test_c4_filter_tolerates_reserved_temp_names(spark):
    """An input frame may already carry `_kept`/`_page_kept` (e.g. from
    an earlier staging step) — the filter form must not collide."""
    docs = spark.createDataFrame(
        [(8, DOCS[8][1], "x", True)],
        "doc_id long, text string, _kept string, _page_kept boolean",
    )
    out = c4_filter(docs).collect()
    assert len(out) == 1
    assert out[0]["_kept"] == "x" and out[0]["_page_kept"] is True
