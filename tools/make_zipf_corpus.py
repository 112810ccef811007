"""Generate a natural-vocabulary (Zipf) documents corpus for the BM25
decade smoke — round-14 verdict item #1.

The replicated testdata corpus has a 31-word vocabulary, which makes
bm25_search_join's central scale mechanism unmeasurable: the plan's
only corpus-side Exchange carries the broadcast-query-term-RESTRICTED
(doc, token, tf, dl) stream, and with 31 distinct words any query's
term set saturates the vocabulary, so the restriction prunes nothing
and the decade ratios exercise the worst case only. This tool emits a
corpus whose token frequencies follow Zipf's law over a 100k-token
vocabulary — the empirical shape of natural text (Zipf 1949; standard
in IR evaluation) — so the restricted exchange can be measured
carrying query-term-sized row counts.

Generation (seedless — fully determined by doc_id, all Catalyst, no
UDF, no driver loop):

- doc length: ``20 + xxhash64(doc_id,"dl") mod 93`` → 20..112 words,
  mean ~66 — matching the testdata documents' mean dl (66.3).
- tokens: inverse-CDF sampling of a Zipf(s=1) rank distribution.
  With ``u`` uniform in (0,1), ``rank = floor(V^u)`` has
  ``P(rank=r) ≈ ln((r+1)/r)/ln(V) ≈ 1/(r·ln V)`` — the classic
  log-uniform approximation of Zipf s=1 (frequencies ∝ 1/rank).
  ``u`` derives from ``xxhash64(doc_id, position)`` scaled to (0,1);
  the token string is ``w<rank>``.
- lang/source/n_chars: same shapes as the testdata table (5 langs,
  10 sources, n_chars = length of text).

Sizes mirror the replica decades (docs × mean dl ≈ words):
  zipf_sf0.1: 5e3 docs   (~0.33M words)
  zipf_sf1:   5e4 docs   (~3.3M words)
  zipf_sf10:  5e5 docs   (~33M words)
  zipf_sf100: 5e6 docs   (~330M words)
Expected distinct tokens ≥50k from zipf_sf1 up (measured in the
accompanying SCALE.md entry; the verdict's floor).

Output: $OUT_ROOT (default /root/repo/scale_data)/zipf_sf{X}/
documents.parquet — documents only; the BM25 smoke reads no other
table. Reruns skip existing outputs.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

OUT_ROOT = os.environ.get(
    "SPARK_GRAFT_ZIPF_OUT", os.path.join(REPO, "scale_data")
)
VOCAB = int(os.environ.get("SPARK_GRAFT_ZIPF_VOCAB", "100000"))
SIZES = {
    "zipf_sf0.1": 5_000,
    "zipf_sf1": 50_000,
    "zipf_sf10": 500_000,
    "zipf_sf100": 5_000_000,
}
LANGS = ["en", "zh", "pt", "es", "de"]


def zipf_documents(
    spark: SparkSession,
    n_docs: int,
    vocab: int = VOCAB,
    cluster_size: int = 1,
    dup_pct: int = 0,
    exact_pct: int = 25,
    sub_ppt: int = 15,
) -> DataFrame:
    """The Zipf corpus as a DataFrame — importable so the DuckDB
    differential test generates the SAME corpus shape at a small size
    (tests/test_corpusstats.py::test_bm25_differential_zipf_corpus).

    Duplicate structure (r15, for the near-dup family's
    natural-vocabulary smokes; defaults OFF — the bm25 corpora are
    unchanged): docs group into clusters of ``cluster_size``
    consecutive ids; member 0 is canonical, and each member m>0 is,
    with probability ``dup_pct``%, a DUPLICATE of its canonical —
    verbatim with probability ``exact_pct``% (exact-dedup prey),
    otherwise a near-dup whose tokens are independently substituted at
    ``sub_ppt``‰ (~1 substitution per 66-word doc → 3-gram Jaccard
    ~0.88 typically, a realistic near/gray mix around tau=0.75).
    Non-duplicate members are independent documents. Everything stays
    a pure Catalyst function of doc_id — no joins: a duplicate
    regenerates its canonical's text from the SHARED seed (the
    canonical's doc_id), substitutions re-seeded by its own id."""
    docs = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    cs = int(cluster_size)
    c = (F.col("doc_id") / cs).cast("long")
    member = F.pmod(F.col("doc_id"), F.lit(cs))
    is_dup = (member > 0) & (
        F.pmod(F.xxhash64(c, member, F.lit("isdup")), F.lit(100))
        < F.lit(int(dup_pct))
    )
    is_exact = is_dup & (
        F.pmod(F.xxhash64(c, member, F.lit("exact")), F.lit(100))
        < F.lit(int(exact_pct))
    )
    seed = F.when(is_dup, (c * cs).cast("long")).otherwise(
        F.col("doc_id")
    )
    dl = (F.pmod(F.xxhash64(seed, F.lit("dl")), F.lit(93)) + 20).cast(
        "int"
    )
    # u in (0,1) from 31 hash bits (granularity 2^-31 ≪ 1/V); the +0.5
    # centering keeps u strictly inside the interval so floor(V^u)
    # lands in [1, V] with no clamp
    m = 1 << 31

    def tok(seed_col, salt, i):
        return F.concat(
            F.lit("w"),
            F.floor(
                F.pow(
                    F.lit(float(vocab)),
                    (
                        F.pmod(
                            F.xxhash64(seed_col, F.lit(salt), i),
                            F.lit(m),
                        )
                        + F.lit(0.5)
                    )
                    / F.lit(float(m)),
                )
            ).cast("long"),
        )

    text = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.col("_dl")),
            lambda i: F.when(
                F.col("_neard")
                & (
                    F.pmod(
                        F.xxhash64("doc_id", F.lit("sub"), i),
                        F.lit(1000),
                    )
                    < F.lit(int(sub_ppt))
                ),
                tok(F.col("doc_id"), "alt", i),
            ).otherwise(tok(F.col("_seed"), "tok", i)),
        ),
        " ",
    )
    out = (
        docs.withColumn("_seed", seed)
        .withColumn("_neard", is_dup & ~is_exact)
        .withColumn("_dl", dl)
        .select(
            "doc_id",
            text.alias("text"),
            F.element_at(
                F.array(*[F.lit(x) for x in LANGS]),
                (F.pmod(F.xxhash64("doc_id", F.lit("lang")), F.lit(5)) + 1)
                .cast("int"),
            ).alias("lang"),
            F.concat(
                F.lit("src"),
                F.pmod(F.xxhash64("doc_id", F.lit("src")), F.lit(10)),
            ).alias("source"),
        )
        .withColumn("n_chars", F.length("text"))
    )
    return out


#: Dup-structured variants for the near-dup family's smokes: clusters
#: of 4, 40% dup chance per non-canonical member (≈30% of the corpus
#: is an exact or near duplicate — a realistic crawl rate).
DUP_SIZES = {
    "zipfdup_sf1": 50_000,
    "zipfdup_sf10": 500_000,
    "zipfdup_sf100": 5_000_000,
}
DUP_KW = dict(cluster_size=4, dup_pct=40)


def main() -> int:
    from data_ingestor_gluejob_script_spark.session import get_spark

    spark = get_spark("make-zipf-corpus")
    only = set(sys.argv[1:])
    plans = {**{n: (d, {}) for n, d in SIZES.items()},
             **{n: (d, DUP_KW) for n, d in DUP_SIZES.items()}}
    for name, (n_docs, kw) in plans.items():
        if only and name not in only:
            continue
        out = os.path.join(OUT_ROOT, name, "documents.parquet")
        if os.path.exists(out):
            print(f"skip {name} (exists)")
            continue
        # ~25k docs (~5 MB) per file: enough files that the scan's
        # real parallelism (one row group per sub-128MB file — see
        # queries._util.spread's phantom-splits note) covers the
        # cluster at every size. The first cut wrote sf10 as FOUR
        # 27 MB single-row-group files: Spark planned 28 byte-range
        # splits but only 4 contained a row-group start, so every
        # sf10 measurement ran ~4-way — re-measured after the fix.
        parts = max(8, n_docs // 25_000)
        zipf_documents(spark, n_docs, **kw).repartition(
            parts
        ).write.mode("overwrite").parquet(out)
        n = spark.read.parquet(out).count()
        print(f"wrote {name}: {n} docs -> {out}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
