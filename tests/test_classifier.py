"""Hashed linear quality classifier: exact pure-python differential.

Exactness argument (why floats can be compared, not just approximated):
the stand-in weights are dyadic rationals (k/1024), every token
contributes one such term, and partial sums stay far below the exact-
representation limit of a double — so the distributed sum is order-
independent and bit-equal to the python sum. ``logit`` is then single
IEEE ops on both sides; its 6-dp rounding is mirrored with the same
shortest-repr HALF_UP rule Spark's Round uses. ``score`` goes through
exp(), where JVM and libm may differ in the last ulp, so it gets a
1e-9 tolerance instead of equality.
"""

from __future__ import annotations

import math
import sys
from decimal import ROUND_HALF_UP, Decimal
from pathlib import Path

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from data_ingestor_gluejob_script_spark.queries._util import load  # noqa: E402
from data_ingestor_gluejob_script_spark.queries.classifier import (  # noqa: E402
    DEFAULT_BIAS,
    bucket_of,
    classifier_score_frame,
    load_weights_text,
    quality_partition,
    standin_weight_of,
    standin_weights,
)

SF_DIR = "/root/testdata/sf0.001"


def _round6(x: float) -> float:
    # mirror of Spark's Round(double, 6): BigDecimal.valueOf uses the
    # shortest decimal repr, then HALF_UP — python's repr() is the
    # same shortest repr
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def oracle_scores(rows, bias=DEFAULT_BIAS):
    out = {}
    for doc_id, text in rows:
        toks = text.split(" ")
        wsum = 0.0
        for t in toks:
            wsum += standin_weight_of(bucket_of(t))
        logit = wsum / len(toks) + bias
        score = _round6(1.0 / (1.0 + math.exp(-logit)))
        out[doc_id] = (len(toks), _round6(logit), score)
    return out


def _check(got_rows, rows):
    got = {
        r["doc_id"]: (r["n_tokens"], r["logit"], r["score"])
        for r in got_rows
    }
    want = oracle_scores(rows)
    assert set(got) == set(want)
    for doc_id in want:
        gn, gl, gs = got[doc_id]
        wn, wl, ws = want[doc_id]
        assert (gn, gl) == (wn, wl), f"doc {doc_id}"
        # both sides are 6-dp rounded; a last-ulp exp() difference can
        # flip one rounding step, so allow exactly that much
        assert abs(gs - ws) < 2e-6, f"doc {doc_id}"


def test_classifier_differential_sf0001(spark):
    docs = load(spark, SF_DIR, "documents")
    rows = [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()]
    got = classifier_score_frame(docs, standin_weights(spark)).collect()
    _check(got, rows)
    # the stand-in model must actually fire on the generator
    # vocabulary, otherwise every logit is just the bias
    assert any(r["logit"] != _round6(DEFAULT_BIAS) for r in got)


def test_quality_partition_flags_match_scores(spark):
    docs = load(spark, SF_DIR, "documents")
    w = standin_weights(spark)
    scores = {
        r["doc_id"]: r["score"]
        for r in classifier_score_frame(docs, w).collect()
    }
    part = quality_partition(docs, w, threshold=0.45)
    rows = part.collect()
    assert len(rows) == len(scores)  # every doc flagged, none lost
    assert set(part.columns) >= {"doc_id", "text", "keep"}
    for r in rows:
        assert r["keep"] == (scores[r["doc_id"]] >= 0.45)
    # threshold actually separates (both classes present)
    kept = sum(r["keep"] for r in rows)
    assert 0 < kept < len(rows)


def test_load_weights_text_real_model_seam(spark, tmp_path):
    """A fastText-.vec-style text export (header + comments + token
    weight lines, including two tokens that collide into one bucket)
    loads into the (bucket, weight) frame and scores through
    classifier_score_frame with NO operator changes; scores match a
    pure-python twin that hashes and sums the same way."""
    # find two distinct tokens colliding into one bucket so the
    # collision-sum path is exercised deterministically
    collide = {}
    pair = None
    for i in range(100_000):
        t = f"tok{i}"
        b = bucket_of(t)
        if b in collide:
            pair = (collide[b], t)
            break
        collide[b] = t
    assert pair is not None
    wfile = tmp_path / "model.vec"
    wfile.write_text(
        "5 1\n"                      # fastText header AT LINE 0: skipped
        "# comment line\n"           # 3 fields: falls out of the filter
        "\n"                         # blank: skipped
        f"{pair[0]} 0.25\n"
        f"{pair[1]} 0.5\n"           # collides with pair[0]: sums
        "spark -0.125\n"
        "1984 2\n"                   # header-SHAPED but not line 0: kept
        "#hashtag 0.0625\n"          # '#' token is a real token: kept
        "scan 0.375\n"
    )
    # the loaded-token set must land in 5 distinct buckets for the
    # row-count assertion below (pair[0]/pair[1] share one by design)
    toks = [pair[0], "spark", "1984", "#hashtag", "scan"]
    assert len({bucket_of(t) for t in toks}) == 5
    w = load_weights_text(spark, str(wfile))
    wrows = {r["bucket"]: r["weight"] for r in w.collect()}
    assert wrows[bucket_of(pair[0])] == 0.75  # 0.25 + 0.5 summed
    assert wrows[bucket_of("spark")] == -0.125
    assert wrows[bucket_of("1984")] == 2.0    # r10 advice: not a header
    assert wrows[bucket_of("#hashtag")] == 0.0625  # not a comment
    assert len(wrows) == 5  # collided pair shares one bucket row

    docs = spark.createDataFrame(
        [(1, f"spark {pair[0]} unseen"), (2, "scan scan")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r for r in classifier_score_frame(docs, w).collect()
    }

    def twin(tokens):
        s = sum(wrows.get(bucket_of(t), 0.0) for t in tokens)
        logit = s / len(tokens) + DEFAULT_BIAS
        return _round6(logit), _round6(1.0 / (1.0 + math.exp(-logit)))

    for did, toks in ((1, ["spark", pair[0], "unseen"]), (2, ["scan"] * 2)):
        logit, score = twin(toks)
        assert got[did]["logit"] == logit
        assert got[did]["score"] == score
        assert got[did]["n_tokens"] == len(toks)


def test_quality_partition_keeps_null_id_docs(spark):
    """Null-id documents are scored (pooled into one score row, per
    classifier_score_frame's every-row contract) and must keep their
    flag through the join back — a plain equi-join on doc_id silently
    dropped them (round-9 advice finding). Each null-id row carries
    the POOLED flag, matching run_scored_ingest's null-safe join."""
    df = spark.createDataFrame(
        [(1, "spark scan spark"), (None, "zz9 zz9"), (None, "the the")],
        "doc_id bigint, text string",
    )
    w = standin_weights(spark)
    part = quality_partition(df, w, threshold=0.45)
    rows = part.collect()
    assert len(rows) == 3  # nothing dropped, nothing duplicated
    null_flags = {r["keep"] for r in rows if r["doc_id"] is None}
    assert len(null_flags) == 1  # both null-id rows share the pooled flag
    pooled = classifier_score_frame(
        df.filter(F.col("doc_id").isNull()), w
    ).collect()
    assert len(pooled) == 1
    assert null_flags == {pooled[0]["score"] >= 0.45}


@given(
    st.lists(
        st.lists(
            st.sampled_from(["spark", "scan", "", "zz9", "the", "ödd tökens"]),
            min_size=0,
            max_size=8,
        ),
        min_size=1,
        max_size=5,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_classifier_fuzz(spark, word_lists):
    rows = [(i, " ".join(ws)) for i, ws in enumerate(word_lists)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = classifier_score_frame(df, standin_weights(spark)).collect()
    _check(got, rows)


@pytest.mark.slow
def test_scored_ingest_matches_batch_partition_and_replays_clean(
    spark, tmp_path
):
    """Streaming classifier gate == batch quality_partition on the
    same corpus; replay (fresh checkpoint, same lakes) is absorbed by
    the digest guard; rejects carry their score for threshold-tuning
    replays."""
    from data_ingestor_gluejob_script_spark.queries._util import load
    from data_ingestor_gluejob_script_spark.streaming import (
        run_scored_ingest,
    )

    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    rows = sorted(
        (r["doc_id"], r["text"]) for r in docs.collect()
    )[:120]
    src = str(tmp_path / "in")
    for b in range(3):
        chunk = rows[b * 40 : (b + 1) * 40]
        spark.createDataFrame(
            chunk, "doc_id long, text string"
        ).coalesce(1).write.mode("append").parquet(src)

    w = standin_weights(spark)
    lake, rej = str(tmp_path / "lake"), str(tmp_path / "rej")
    q = run_scored_ingest(
        spark, src, lake, rej, str(tmp_path / "ck"), w, threshold=0.45
    )
    q.awaitTermination()

    df_all = spark.createDataFrame(rows, "doc_id long, text string")
    want = {
        r["doc_id"]: r["keep"]
        for r in quality_partition(df_all, w, threshold=0.45).collect()
    }
    got_keep = {r["doc_id"] for r in spark.read.parquet(lake).collect()}
    rej_rows = spark.read.parquet(rej).collect()
    got_rej = {r["doc_id"] for r in rej_rows}
    assert got_keep == {i for i, k in want.items() if k}
    assert got_rej == {i for i, k in want.items() if not k}
    assert got_keep and got_rej
    # rejects carry score + logit below threshold
    assert all(r["score"] < 0.45 for r in rej_rows)
    assert all(r["logit"] is not None for r in rej_rows)

    # replay with a fresh checkpoint: both lakes unchanged
    n_lake, n_rej = len(got_keep), len(rej_rows)
    q2 = run_scored_ingest(
        spark, src, lake, rej, str(tmp_path / "ck2"), w, threshold=0.45
    )
    q2.awaitTermination()
    assert spark.read.parquet(lake).count() == n_lake
    assert spark.read.parquet(rej).count() == n_rej


def test_scored_ingest_null_id_and_custom_id_col(spark, tmp_path):
    """Third-pass review findings: a NULL-id row must land on exactly
    one side (not vanish through the inner score join), and id_col
    must actually work for non-doc_id sources."""
    import pandas as pd

    from data_ingestor_gluejob_script_spark.streaming import (
        run_scored_ingest,
    )

    src = tmp_path / "in"
    src.mkdir()
    pd.DataFrame(
        {
            "item_id": pd.array([1, None], dtype="Int64"),
            "text": ["some real words", "null id words"],
        }
    ).to_parquet(src / "b0.parquet")

    w = standin_weights(spark)
    lake, rej = str(tmp_path / "lake"), str(tmp_path / "rej")
    q = run_scored_ingest(
        spark, str(src), lake, rej, str(tmp_path / "ck"), w,
        threshold=0.0, id_col="item_id",
    )
    q.awaitTermination(120)
    # threshold 0 keeps everything -> both rows (incl. NULL id) land
    got = spark.read.parquet(lake).collect()
    assert len(got) == 2
    assert sorted(
        (r["item_id"] is None, r["text"]) for r in got
    ) == [(False, "some real words"), (True, "null id words")]
    assert spark.read.parquet(rej).count() == 0
