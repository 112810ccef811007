"""Bloom-screened decontamination: exact-equality with the one-step
exact path (the load-bearing guarantee), one-sidedness of the screen,
and unit coverage of the numpy filter itself.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyspark.sql.functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_ingestor_gluejob_script_spark.queries._util import load  # noqa: E402
from data_ingestor_gluejob_script_spark.queries.bloom import (  # noqa: E402
    _might_contain,
    bloom_candidates,
    bloom_decontaminate,
    build_bloom,
)
from data_ingestor_gluejob_script_spark.queries.textops import (  # noqa: E402
    contamination_report,
    decontaminate,
)

SF_DIR = "/root/testdata/sf0.001"


def test_bloom_filter_no_false_negatives_and_low_fpp():
    rng = np.random.default_rng(7)
    members = rng.integers(-(2**63), 2**63 - 1, size=20_000, dtype=np.int64)
    words, m = build_bloom(members)
    assert _might_contain(words, m, members).all()
    probe = rng.integers(-(2**63), 2**63 - 1, size=50_000, dtype=np.int64)
    fresh = probe[~np.isin(probe, members)]
    fpp = _might_contain(words, m, fresh).mean()
    assert fpp < 0.02, fpp  # ~0.3% expected at 12 bits/elem, k=6


def test_bloom_filter_empty_benchmark():
    words, m = build_bloom(np.array([], dtype=np.int64))
    probe = np.arange(1000, dtype=np.int64)
    # empty set -> no members; all-zero bits reject everything
    assert not _might_contain(words, m, probe).any()


def _docs_and_bench(spark):
    docs = load(spark, SF_DIR, "documents")
    bench = docs.filter(F.col("doc_id") % 25 == 0).select("text")
    return docs, bench


def test_bloom_decontaminate_equals_exact_path(spark):
    docs, bench = _docs_and_bench(spark)
    got = sorted(
        tuple(r) for r in bloom_decontaminate(docs, bench).collect()
    )
    want = sorted(tuple(r) for r in decontaminate(docs, bench).collect())
    assert got == want
    assert len(got) > 0
    # and something was actually removed (benchmark members at least)
    assert len(got) < docs.count()


def test_bloom_screen_is_one_sided(spark):
    docs, bench = _docs_and_bench(spark)
    cand = {
        r["doc_id"]: r["candidate"]
        for r in bloom_candidates(docs, bench).collect()
    }
    exact = {
        r["doc_id"]: r["contaminated"]
        for r in contamination_report(docs, bench).collect()
    }
    assert set(cand) == set(exact)  # full corpus covered, both paths
    for doc_id, bad in exact.items():
        if bad:
            assert cand[doc_id], f"screen hid contaminated doc {doc_id}"
