"""Differentials for the Stupid Backoff trigram LM (queries/lm.py)
against an exact pure-python oracle: dict n-gram counts, the same
early-position order start, alpha backoff, and 0.5/N OOV floor."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from data_ingestor_gluejob_script_spark.queries.lm import (
    OOV_COUNT,
    SB_ALPHA,
    ngram_counts,
    stupid_backoff_filter,
    stupid_backoff_logprob_frame,
)


def oracle_counts(texts, n_max=3):
    c = Counter()
    for t in texts:
        words = (t if t is not None else "").split(" ")
        for n in range(1, n_max + 1):
            for i in range(len(words) - n + 1):
                c[(n, " ".join(words[i : i + n]))] += 1
    return c


def oracle_scores(texts_by_id, counts=None, alpha=SB_ALPHA):
    counts = counts if counts is not None else oracle_counts(texts_by_id.values())
    total = sum(v for (n, _), v in counts.items() if n == 1)
    out = {}
    for doc_id, t in texts_by_id.items():
        words = (t if t is not None else "").split(" ")
        lps = []
        for i, w in enumerate(words):
            top = min(i + 1, 3)
            tri = counts.get((3, " ".join(words[i - 2 : i + 1])), 0)
            bctx = counts.get((2, " ".join(words[i - 2 : i])), 0)
            bi = counts.get((2, " ".join(words[i - 1 : i + 1])), 0)
            uctx = counts.get((1, words[i - 1] if i >= 1 else ""), 0)
            uni = counts.get((1, w), 0)
            if top == 3 and tri > 0:
                s = tri / bctx
            elif top >= 2 and bi > 0:
                s = alpha ** (top - 2) * bi / uctx
            else:
                s = alpha ** (top - 1) * (uni if uni > 0 else OOV_COUNT) / total
            lps.append(math.log(s))
        avg = sum(lps) / len(lps)
        out[doc_id] = (len(lps), round(avg, 6), round(math.exp(-avg), 6))
    return out


DOCS = {
    0: "the cat sat on the mat",
    1: "the cat sat on the hat",
    2: "the dog sat on the mat",
    3: "a completely different sentence here",
    4: "the",  # single token: pure unigram, no backoff penalty
    5: "mat the",  # a bigram occurring only in this doc itself
    6: None,  # empty-token convention
    7: "the cat sat",  # every trigram seen once
}


@pytest.fixture(scope="module")
def spark_docs(spark):
    return spark.createDataFrame(
        [(k, v) for k, v in DOCS.items()], "doc_id long, text string"
    )


def test_ngram_counts_match_oracle(spark, spark_docs):
    got = {
        (r["n"], r["gram"]): r["cnt"] for r in ngram_counts(spark_docs).collect()
    }
    want = oracle_counts(DOCS.values())
    assert got == dict(want)


def test_scores_match_oracle(spark, spark_docs):
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_logprob"], r["ppl"])
        for r in stupid_backoff_logprob_frame(spark_docs).collect()
    }
    want = oracle_scores(DOCS)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert got[k][1] == pytest.approx(want[k][1], abs=2e-6), k
        assert got[k][2] == pytest.approx(want[k][2], rel=1e-5), k


def test_external_model_and_oov_floor(spark, spark_docs):
    """Score held-out text under the DOCS model: OOV tokens hit the
    0.5/N floor, seen-context tokens back off exactly like the
    oracle."""
    held = {100: "the cat sat on zzz unseen words", 101: "zzz"}
    held_df = spark.createDataFrame(
        [(k, v) for k, v in held.items()], "doc_id long, text string"
    )
    grams = ngram_counts(spark_docs)
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_logprob"], r["ppl"])
        for r in stupid_backoff_logprob_frame(held_df, grams).collect()
    }
    want = oracle_scores(held, counts=oracle_counts(DOCS.values()))
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], abs=2e-6)


def test_filter_form_keeps_low_ppl(spark, spark_docs):
    scores = oracle_scores(DOCS)
    ranked = sorted(p for _, _, p in scores.values())
    # cut strictly BETWEEN the 5th and 6th ppl so a sub-1e-5 Spark/
    # python float divergence at the boundary cannot flip membership
    cut = (ranked[4] + ranked[5]) / 2  # keep 5 of 8
    out = stupid_backoff_filter(spark_docs, max_ppl=cut)
    want = sorted(k for k, (_, _, p) in scores.items() if p <= cut)
    assert sorted(r["doc_id"] for r in out.collect()) == want
    assert out.columns == ["doc_id", "text"]


def test_corpus_differential(spark):
    """sf0.001 documents, self-scored: every row matches the oracle."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.select("doc_id", "text").collect()
    }
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_logprob"], r["ppl"])
        for r in stupid_backoff_logprob_frame(docs).collect()
    }
    want = oracle_scores(texts)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert got[k][1] == pytest.approx(want[k][1], abs=2e-6), k


def test_trigram_beats_unigram_on_fluent_text(spark, spark_docs):
    """Sanity on the signal itself: a document whose trigrams repeat
    verbatim in the corpus scores (much) better under the trigram
    model than a bag of the same unigrams in scrambled order."""
    probe = spark.createDataFrame(
        [(200, "the cat sat on the mat"), (201, "mat the on sat cat the")],
        "doc_id long, text string",
    )
    grams = ngram_counts(spark_docs)
    got = {
        r["doc_id"]: r["avg_logprob"]
        for r in stupid_backoff_logprob_frame(probe, grams).collect()
    }
    assert got[200] > got[201] + 0.5


def test_reloaded_count_table_with_widened_n(spark, spark_docs, tmp_path):
    """xxhash64 join keys are type-sensitive: a count table round-
    tripped through parquet with ``n`` widened to long must still
    score identically (both join sides pin int)."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "grams")
    ngram_counts(spark_docs).withColumn(
        "n", F.col("n").cast("long")
    ).write.parquet(path)
    reloaded = spark.read.parquet(path)
    direct = {
        r["doc_id"]: r["avg_logprob"]
        for r in stupid_backoff_logprob_frame(spark_docs).collect()
    }
    via_disk = {
        r["doc_id"]: r["avg_logprob"]
        for r in stupid_backoff_logprob_frame(spark_docs, reloaded).collect()
    }
    assert direct == via_disk


def test_randomized_corpus_differential(spark):
    """200 seeded-random docs over a zipf-ish 12-word vocabulary (high
    trigram reuse plus singleton tails) self-scored — every row must
    match the oracle, exercising all three backoff arms and both
    early-position starts at volume."""
    import random

    rng = random.Random(1107)
    vocab = ["the", "cat", "sat", "on", "mat", "dog", "a", "ran", "big",
             "x1", "x2", "x3"]
    weights = [8, 6, 6, 5, 4, 3, 3, 2, 2, 1, 1, 1]
    texts = {}
    for i in range(200):
        n = rng.randrange(0, 12)
        texts[i] = " ".join(rng.choices(vocab, weights=weights, k=n)) if n else ""
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
        for r in stupid_backoff_logprob_frame(df).collect()
    }
    want = oracle_scores(texts)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert got[k][1] == pytest.approx(want[k][1], abs=2e-6), k
