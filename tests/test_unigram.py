"""Differentials for the unigram-LM tokenizer (queries/unigram.py,
round-11 fourth wave). The two DP cores are checked against
brute-force segmentation ENUMERATION (exponential, fine for short
words): the E-step's forward/backward posterior counts must equal
the enumerate-all-segmentations posterior to float tolerance, and
Viterbi must return exactly the enumeration's argmax under the
documented tie-break. Spark-side tests cover the train/encode
round-trip, the external-model seam, and scale plumbing."""

from __future__ import annotations

import itertools
import math
import random

import pytest

from data_ingestor_gluejob_script_spark.queries.unigram import (
    MAX_PIECE_LEN,
    _expected_counts,
    _seed_vocab,
    _train,
    _viterbi,
    load_model,
    save_model,
    unigram_encode_flat,
    unigram_token_counts,
    unigram_train,
)


def segmentations(word, pieces, max_len):
    """All ways to split word into pieces from the vocab."""
    if not word:
        yield ()
        return
    for ln in range(1, min(max_len, len(word)) + 1):
        head = word[:ln]
        if head in pieces:
            for rest in segmentations(word[ln:], pieces, max_len):
                yield (head,) + rest


def brute_expected(word, freq, probs, max_len):
    segs = list(segmentations(word, probs, max_len))
    if not segs:
        return {}
    weights = [
        math.prod(probs[p] for p in s) for s in segs
    ]
    z = sum(weights)
    out = {}
    for s, w in zip(segs, weights):
        for p in s:
            out[p] = out.get(p, 0.0) + freq * (w / z)
    return out


def _rand_probs(rng, word_chars, extra):
    pieces = set(word_chars) | set(extra)
    vals = {p: rng.random() + 0.05 for p in pieces}
    tot = sum(vals.values())
    return {p: v / tot for p, v in vals.items()}


def test_expected_counts_match_enumeration():
    rng = random.Random(5)
    for trial in range(200):
        n = rng.randrange(1, 8)
        word = "".join(rng.choice("abc") for _ in range(n))
        extra = [
            word[i : i + ln]
            for i in range(n)
            for ln in (2, 3)
            if rng.random() < 0.5 and i + ln <= n
        ]
        probs = _rand_probs(rng, word, extra)
        got = _expected_counts(word, 3, probs, MAX_PIECE_LEN)
        want = brute_expected(word, 3, probs, MAX_PIECE_LEN)
        assert set(got) == set(want), (word, probs)
        for p in want:
            assert got[p] == pytest.approx(want[p], rel=1e-9), (
                word,
                p,
            )


def test_viterbi_matches_enumeration_argmax():
    rng = random.Random(9)
    for trial in range(300):
        n = rng.randrange(1, 8)
        word = "".join(rng.choice("abc") for _ in range(n))
        extra = [
            word[i : i + ln]
            for i in range(n)
            for ln in (2, 3, 4)
            if rng.random() < 0.5 and i + ln <= n
        ]
        probs = _rand_probs(rng, word, extra)
        lp = {p: math.log(v) for p, v in probs.items()}
        got = _viterbi(word, lp, MAX_PIECE_LEN)
        segs = list(segmentations(word, probs, MAX_PIECE_LEN))
        scored = [(sum(lp[p] for p in s), s) for s in segs]
        best_score = max(s for s, _ in scored)
        best_segs = [s for sc, s in scored if sc == best_score]
        assert sum(lp[p] for p in got) == pytest.approx(best_score)
        assert got in best_segs, (word, got, best_segs)


def test_viterbi_tie_breaks_to_longest_last_piece():
    # "ab" via ("a","b") or ("ab") at identical scores
    lp = {"a": math.log(0.2), "b": math.log(0.2), "ab": math.log(0.04)}
    assert _viterbi("ab", lp, 8) == ("ab",)


def test_viterbi_unknown_chars_fall_back_to_singletons():
    lp = {"a": math.log(0.5), "ab": math.log(0.2)}
    assert _viterbi("aXb", lp, 8) == ("a", "X", "b")
    assert _viterbi("XY", lp, 8) == ("X", "Y")


def test_seed_vocab_covers_alphabet_and_ranks_by_weight():
    seed = _seed_vocab({"abab": 10, "cd": 1}, seed_size=2, max_piece_len=4)
    assert {"a", "b", "c", "d"} <= set(seed)
    # "ab" occurs twice per "abab" (weight 20); the 10-weight tie
    # ("aba", "abab", "ba", "bab") breaks lexicographically to "aba"
    multi = [p for p in seed if len(p) > 1]
    assert sorted(multi) == ["ab", "aba"]
    assert sum(seed.values()) == pytest.approx(1.0)


def test_train_hits_vocab_size_and_learns_frequent_pieces():
    freqs = {"spark": 50, "sparkle": 30, "park": 40, "a": 5}
    model = _train(
        freqs, vocab_size=12, seed_size=50, em_iters=2,
        shrink=0.7, max_piece_len=5,
    )
    chars = {c for w in freqs for c in w}
    assert chars <= set(model)
    assert len(model) <= 12 + len(chars)
    assert sum(model.values()) == pytest.approx(1.0)
    # the shared stem must survive pruning as a multi-char piece
    assert any(len(p) >= 4 and "par" in p for p in model)


def test_spark_train_encode_roundtrip(spark):
    rows = [
        (1, "spark spark sparkle park"),
        (2, "park sparkle spark"),
        (3, None),
        (4, ""),
        (5, "spark"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    model = unigram_train(
        docs, vocab_size=20, seed_size=100, em_iters=2
    )
    enc = unigram_encode_flat(docs, model).collect()
    # reconstruction: concatenating each doc's tokens in pos order
    # restores its words exactly
    by_doc: dict[int, list] = {}
    for r in enc:
        by_doc.setdefault(r.doc_id, []).append((r.pos, r.token))
    assert set(by_doc) == {1, 2, 5}
    for doc_id, toks in by_doc.items():
        text = dict(rows)[doc_id]
        joined = "".join(t for _, t in sorted(toks))
        assert joined == text.replace(" ", "")
        assert [p for p, _ in sorted(toks)] == list(range(len(toks)))
    # counts twin agrees with the flat form
    counts = {
        r.doc_id: r.n_unigram_tokens
        for r in unigram_token_counts(docs, model).collect()
    }
    assert counts == {d: len(t) for d, t in by_doc.items()}


def test_save_load_model_drop_in(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "spark park spark")], "doc_id int, text string"
    )
    model = unigram_train(docs, vocab_size=15, seed_size=50)
    path = str(tmp_path / "unigram_model.parquet")
    save_model(model, path)
    loaded = load_model(spark, path)
    a = sorted(map(tuple, unigram_encode_flat(docs, model).collect()))
    b = sorted(map(tuple, unigram_encode_flat(docs, loaded).collect()))
    assert a == b


def test_external_model_drops_in(spark, tmp_path):
    """A (piece, logprob) parquet written WITHOUT this module's
    trainer (simulating a real SentencePiece export converted to the
    documented shape) encodes through the same seam."""
    ext = spark.createDataFrame(
        [("he", math.log(0.4)), ("llo", math.log(0.3)),
         ("h", math.log(0.1)), ("e", math.log(0.1)),
         ("l", math.log(0.05)), ("o", math.log(0.05))],
        "piece string, logprob double",
    )
    path = str(tmp_path / "ext.parquet")
    ext.coalesce(1).write.parquet(path)
    docs = spark.createDataFrame(
        [(1, "hello")], "doc_id int, text string"
    )
    toks = [
        r.token
        for r in unigram_encode_flat(docs, load_model(spark, path))
        .orderBy("pos")
        .collect()
    ]
    assert toks == ["he", "llo"]


def test_encode_partitioning_invariance(spark):
    rng = random.Random(31)
    rows = [
        (
            i,
            " ".join(
                "".join(
                    rng.choice("spark") for _ in range(rng.randrange(1, 9))
                )
                for _ in range(rng.randrange(1, 6))
            ),
        )
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    model = unigram_train(docs, vocab_size=30, seed_size=200)
    a = sorted(map(tuple, unigram_encode_flat(docs, model).collect()))
    b = sorted(
        map(
            tuple,
            unigram_encode_flat(docs.repartition(7), model).collect(),
        )
    )
    assert a == b