"""Differentials for Unicode text normalization (queries/textnorm.py,
round-11 third wave): a pure-python per-string oracle mirrors the
vectorized pandas pipeline step for step, checked (a) directly on the
batch function over nasty handcrafted + seeded-random strings, and
(b) through Spark for plumbing (schema, NULLs, pass-through form,
partitioning invariance)."""

from __future__ import annotations

import random
import re
import unicodedata

import pandas as pd
import pytest

from data_ingestor_gluejob_script_spark.queries.textnorm import (
    _normalize,
    normalize_text_frame,
    with_normalized_text,
)


def oracle(t, form="NFC", collapse=True):
    """Per-string twin of textnorm._normalize — same steps, same
    order, stdlib re/unicodedata instead of pandas .str."""
    if t is None:
        return None, None, None
    hits = len(re.findall("\u00c3|\u00c2|\u00e2\u20ac", t))
    s = unicodedata.normalize(form, t)
    s = re.sub("(?:\r\n|[\r\u0085\u2028\u2029])", "\n", s)
    s = re.sub("[\u200b\u200c\u200d\u2060\ufeff\u00ad]", "", s)
    s = re.sub("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]", "", s)
    s = re.sub("[\u00a0\u1680\u2000-\u200a\u202f\u205f\u3000]", " ", s)
    if collapse:
        s = re.sub("[ \t]+", " ", s)
        s = re.sub(" ?\n ?", "\n", s)
        s = re.sub("\n{3,}", "\n\n", s)
        s = s.strip()
    return s, s != t, hits


NASTY = [
    None,
    "",
    "plain ascii text.",
    "\u00e9tude e\u0301tude",  # composed vs decomposed accents
    "crlf\r\nline\rnel\u0085ls\u2028ps\u2029end",
    "zero\u200bwidth\u200cjoin\u200ders\u2060 bom\ufeff soft\u00adhyphen",
    "ctrl\x00\x01\x08chars\x0b\x0c\x0e\x1f\x7fdel\x9fc1",
    "nbsp\u00a0em\u2003thin\u2009narrow\u202fmath\u205fcjk\u3000ogham\u1680",
    "runs   of\t\tspace \n  indented \n\n\n\n many blanks ",
    "mojibake \u00c3\u00a9 \u00c3\u00bc \u00e2\u20ac\u0153quoted\u00e2\u20ac\x9d \u00c2\u00b0 plain",
    " \t leading and trailing \t ",
    "tab\tonly",
    "\r\n\r\n",
    "\u200b",
    "e\u0301\u0301 composed-plus-combining",
    "ligature \ufb01le and fullwidth \uff21\uff22",  # NFKC-only folds
    "ends with newline\n",
    "\nstarts with newline",
    "interior\nnewline only",
]


def _random_corpus(n=300, seed=11):
    rng = random.Random(seed)
    alphabet = (
        list("abc .!?\t\n")
        + ["\r\n", "\r", "\u0085", "\u2028", "\u2029"]
        + ["\u200b", "\u00ad", "\ufeff", "\u00a0", "\u2003", "\u3000"]
        + ["\x07", "\x9c", "\u00c3", "\u00c2", "\u00e2\u20ac"]
        + ["\u00e9", "e\u0301", "\u65e5", "\ufb01"]
    )
    out = []
    for _ in range(n):
        k = rng.randrange(0, 40)
        out.append("".join(rng.choice(alphabet) for _ in range(k)))
    return out


@pytest.mark.parametrize("collapse", [True, False])
@pytest.mark.parametrize("form", ["NFC", "NFKC"])
def test_batch_matches_oracle(form, collapse):
    texts = NASTY + _random_corpus()
    got = _normalize(pd.Series(texts, dtype=object), form, collapse)
    for i, t in enumerate(texts):
        want_text, want_changed, want_hits = oracle(t, form, collapse)
        assert got["text_norm"].iloc[i] == want_text or (
            t is None and got["text_norm"].iloc[i] is None
        ), (i, repr(t))
        if t is None:
            assert got["changed"].iloc[i] is None
            assert got["mojibake_hits"].iloc[i] is pd.NA
        else:
            assert bool(got["changed"].iloc[i]) == want_changed, (i, repr(t))
            assert int(got["mojibake_hits"].iloc[i]) == want_hits, (i, repr(t))


def test_spark_report_form_and_nulls(spark):
    rows = [(i, t) for i, t in enumerate(NASTY)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = normalize_text_frame(docs).orderBy("doc_id").collect()
    assert [f.name for f in normalize_text_frame(docs).schema.fields] == [
        "doc_id",
        "text_norm",
        "changed",
        "mojibake_hits",
    ]
    assert len(out) == len(NASTY)
    for r in out:
        want_text, want_changed, want_hits = oracle(NASTY[r["doc_id"]])
        assert r["text_norm"] == want_text
        assert r["changed"] == want_changed
        assert r["mojibake_hits"] == (None if want_hits is None else want_hits)


def test_spark_partitioning_invariance(spark):
    texts = _random_corpus(n=200, seed=7)
    rows = [(i, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    one = {
        r["doc_id"]: (r["text_norm"], r["changed"], r["mojibake_hits"])
        for r in normalize_text_frame(docs.coalesce(1)).collect()
    }
    many = {
        r["doc_id"]: (r["text_norm"], r["changed"], r["mojibake_hits"])
        for r in normalize_text_frame(docs.repartition(13)).collect()
    }
    assert one == many


def test_with_normalized_text_passthrough(spark):
    docs = spark.createDataFrame(
        [(1, "a  b c.", "src0"), (2, None, "src1")],
        "doc_id long, text string, source string",
    )
    out = with_normalized_text(docs).orderBy("doc_id").collect()
    assert out[0]["text"] == "a b c."
    assert out[0]["source"] == "src0"
    assert out[0]["changed"] is True
    assert out[1]["text"] is None and out[1]["changed"] is None
    assert out[1]["source"] == "src1"


def test_corpus_is_already_normal(spark):
    """sf0.001 documents are single-space ASCII — normalization must be
    an exact no-op (changed all-False, zero mojibake), proving the
    operator does not mangle clean text at corpus scale."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = normalize_text_frame(docs)
    from pyspark.sql import functions as F

    agg = out.agg(
        F.sum(F.col("changed").cast("int")).alias("n_changed"),
        F.sum("mojibake_hits").alias("hits"),
        F.count("*").alias("n"),
    ).collect()[0]
    assert agg["n"] == 500
    assert agg["n_changed"] == 0
    assert agg["hits"] == 0
