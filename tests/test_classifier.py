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

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_ingestor_gluejob_script_spark.queries._util import load  # noqa: E402
from data_ingestor_gluejob_script_spark.queries.classifier import (  # noqa: E402
    DEFAULT_BIAS,
    bucket_of,
    classifier_score_frame,
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
