"""Bloom-filter benchmark decontamination — the broadcast-bytes scale
path for textops.decontaminate.

The exact decontamination join broadcasts the benchmark's DISTINCT
shingle-hash set (8 bytes/row plus hash-map overhead). That is fine
for eval suites, but a large decontamination net (every public
benchmark plus held-out documents) can reach 10^8-10^9 shingles —
tens of gigabytes as a broadcast join table. A Bloom filter over the
same hashes is m/8 bytes TOTAL at a chosen false-positive rate
(~12 bits/element for ~0.3% FPP), and false positives only ever ADD
candidate documents, never hide one — so

    bloom screen (map-only)  ->  exact confirm on candidates only

returns EXACTLY the same result as the one-step exact join while
shrinking the broadcast ~5x and, more importantly, keeping the exact
join's probe side to the candidate sliver of the corpus.

Spark 4.1 does not expose ``bloom_filter_agg``/``might_contain`` in
the public function registry (probed: UNRESOLVED_ROUTINE), so the
filter is built driver-side with numpy over the collected benchmark
hash set — legitimate because that set is broadcast-sized BY
ASSUMPTION of the exact path too — and shipped to executors as a
SparkContext broadcast probed inside an Arrow-batched pandas UDF
(double hashing, k derived positions per element, vectorized over the
batch; no per-row python).

Not driver-registered (inventory pinned at 50); equality with the
exact path plus FPP behavior tested in tests/test_bloom.py, benched
as x_bloom_decontaminate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import (
    CONTAMINATION_THRESHOLD,
    contamination_report,
    shingles_from_words,
    words_col,
)

BITS_PER_ELEMENT = 12
N_HASHES = 6  # k ~= m/n * ln2; 12 bits/elem -> k=6 is near-optimal
MIN_BITS = 1 << 14


def _doc_shingle_hashes(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, h) with h = xxhash64(shingle) — explode_outer keeps
    shingle-less docs visible as (doc_id, NULL), mirroring
    contamination_report's trivially-clean handling."""
    return docs.select(
        "doc_id", words_col(F.col(text_col)).alias("_ws")
    ).select(
        "doc_id",
        F.explode_outer(
            F.transform(
                shingles_from_words(F.col("_ws")), lambda s: F.xxhash64(s)
            )
        ).alias("h"),
    )


def build_bloom(hashes: np.ndarray, bits_per_element: int = BITS_PER_ELEMENT):
    """(bit array as uint64 words, m) for an int64 hash set. m is a
    power of two so position derivation is a mask, not a modulo."""
    n = max(int(hashes.size), 1)
    m = MIN_BITS
    while m < n * bits_per_element:
        m <<= 1
    words = np.zeros(m >> 6, dtype=np.uint64)
    h = hashes.astype(np.int64, copy=False).view(np.uint64)
    h1 = h % np.uint64(m)
    h2 = ((h >> np.uint64(33)) | np.uint64(1)) % np.uint64(m)
    for i in range(N_HASHES):
        pos = (h1 + np.uint64(i) * h2) % np.uint64(m)
        np.bitwise_or.at(words, pos >> np.uint64(6),
                         np.uint64(1) << (pos & np.uint64(63)))
    return words, m


def _might_contain(words: np.ndarray, m: int, h: np.ndarray) -> np.ndarray:
    """Vectorized k-probe membership test over an int64 hash batch."""
    hu = h.astype(np.int64, copy=False).view(np.uint64)
    h1 = hu % np.uint64(m)
    h2 = ((hu >> np.uint64(33)) | np.uint64(1)) % np.uint64(m)
    hit = np.ones(hu.shape, dtype=bool)
    for i in range(N_HASHES):
        pos = (h1 + np.uint64(i) * h2) % np.uint64(m)
        hit &= (
            (words[(pos >> np.uint64(6)).astype(np.int64)]
             >> (pos & np.uint64(63))) & np.uint64(1)
        ).astype(bool)
    return hit


def bloom_candidates(
    docs: DataFrame,
    benchmark: DataFrame,
    threshold: float = CONTAMINATION_THRESHOLD,
) -> DataFrame:
    """Per-document Bloom screen: (doc_id, n_shingles, n_bloom_hits,
    candidate). ``candidate`` is TRUE for every document whose TRUE
    overlap ratio meets ``threshold`` (one-sided guarantee: the Bloom
    has no false negatives), plus an FPP-bounded sliver of clean docs.

    Plan: the benchmark's distinct shingle hashes collect to the
    driver (the same small-side assumption the exact broadcast join
    makes), become an m/8-byte bit array, and broadcast once; the
    corpus side is a pure map — explode + hash + Arrow-batched k-probe
    UDF — followed by ONE partially-aggregated groupBy(doc_id). No
    join touches the corpus at this stage."""
    bench_hashes = np.array(
        [
            r["h"]
            for r in (
                benchmark.select(words_col(F.col("text")).alias("_ws"))
                .select(
                    F.explode(
                        F.transform(
                            shingles_from_words(F.col("_ws")),
                            lambda s: F.xxhash64(s),
                        )
                    ).alias("h")
                )
                .distinct()
                .collect()
            )
        ],
        dtype=np.int64,
    )
    words, m = build_bloom(bench_hashes)
    sc = docs.sparkSession.sparkContext
    bc = sc.broadcast((words, m))

    @F.pandas_udf("boolean")
    def bloom_hit(h: pd.Series) -> pd.Series:
        w, mm = bc.value
        # the column is coalesced null-free upstream, so Arrow hands us
        # a true int64 series — a nullable long would arrive as float64
        # and silently truncate 64-bit hashes to 53-bit mantissas
        return pd.Series(_might_contain(w, mm, h.to_numpy(np.int64)))

    hits = _doc_shingle_hashes(docs).select(
        "doc_id",
        "h",
        # shingle-less docs carry h = NULL (explode_outer); probe a
        # sentinel 0 for them and mask the result back to False so the
        # UDF's input column is null-free (see dtype note above)
        F.when(
            F.col("h").isNotNull(),
            bloom_hit(F.coalesce(F.col("h"), F.lit(0))),
        )
        .otherwise(F.lit(False))
        .alias("_hit"),
    )
    agg = hits.groupBy("doc_id").agg(
        F.count("h").alias("n_shingles"),
        F.sum(F.col("_hit").cast("long")).alias("n_bloom_hits"),
    )
    ratio = F.when(
        F.col("n_shingles") > 0, F.col("n_bloom_hits") / F.col("n_shingles")
    ).otherwise(F.lit(0.0))
    # Half-ulp margin: the exact path flags contamination on the
    # 6-dp-ROUNDED overlap ratio (contamination_report rounds), so an
    # unrounded screen ratio of threshold - 5e-7 can round UP to the
    # threshold on the exact side. Comparing against
    # threshold - 5e-7 keeps the screen one-sided with respect to the
    # exact path's definition (round-9 review finding); the margin
    # only ever ADDS candidates, which the exact confirm then settles.
    return agg.select(
        "doc_id",
        "n_shingles",
        "n_bloom_hits",
        (ratio >= F.lit(threshold) - F.lit(5e-7)).alias("candidate"),
    )


def bloom_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    threshold: float = CONTAMINATION_THRESHOLD,
) -> DataFrame:
    """Exact decontamination through the Bloom screen: identical
    result to textops.decontaminate (asserted row-for-row in
    tests/test_bloom.py), but the exact shingle join only ever probes
    the candidate docs. Non-candidates pass straight through (the
    one-sided screen proves them clean); candidates get the exact
    contamination_report and are kept only if it clears them."""
    cands = bloom_candidates(docs, benchmark, threshold).filter(
        F.col("candidate")
    ).select("doc_id")
    suspect = docs.join(cands, "doc_id", "left_semi")
    clear = docs.join(cands, "doc_id", "left_anti")
    confirmed_bad = (
        contamination_report(suspect, benchmark)
        .filter(F.col("overlap_ratio") >= F.lit(threshold))
        .select("doc_id")
    )
    return clear.unionByName(suspect.join(confirmed_bad, "doc_id", "left_anti"))
