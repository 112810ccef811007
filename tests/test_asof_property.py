"""Property test: asof_join equals a brute-force per-row reference on
random inputs (random keys, duplicate timestamps on the left, empty
right sides)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_ingestor_gluejob_script_spark.operators.relational import asof_join
import pytest

_left_row = st.tuples(
    st.integers(min_value=0, max_value=3),   # key
    st.integers(min_value=0, max_value=50),  # ts
)
_right_row = st.tuples(
    st.integers(min_value=0, max_value=3),
    st.integers(min_value=0, max_value=50),
    st.integers(min_value=100, max_value=999),  # payload
)


def _expected(left, right):
    out = []
    for i, (k, ts) in enumerate(left):
        cands = [(rts, v) for rk, rts, v in right if rk == k and rts <= ts]
        best = max(cands) if cands else (None, None)
        out.append((i, k, ts, best[0], best[1]))
    return sorted(out)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(_left_row, min_size=1, max_size=15),
    right=st.lists(_right_row, max_size=15, unique_by=lambda r: (r[0], r[1])),
)
@pytest.mark.slow
def test_asof_matches_bruteforce(spark, left, right):
    ldf = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(left)],
        "row_id int, k int, ts int",
    )
    rdf = spark.createDataFrame(right or [], "k int, rts int, payload int")
    got = sorted(
        (r.row_id, r.k, r.ts, r.rts, r.payload)
        for r in asof_join(ldf, rdf, on="k", left_ts="ts", right_ts="rts").collect()
    )
    assert got == _expected(left, right)
