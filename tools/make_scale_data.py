"""Generate the sf1 scale-smoke dataset: a deterministic 10x
replication of /root/testdata/sf0.1 with FK-consistent key remapping
(round-10 verdict item #1 — measure one order of magnitude above the
bench scale so the 100-TB scaling claims are observed, not argued).

Replication recipe (seedless — fully determined by the source data):

- region/nation: copied as-is (TPC-H dims are SF-invariant).
- customer/supplier/part/orders/lineitem/events: R copies; every
  PK/FK shifts by ``replica * (max_key + 1)`` of its home table, so
  join fan-in/fan-out per key is IDENTICAL to sf0.1 — the joins get
  10x the rows, not 10x the matches per key.
- documents: R copies with doc_id shifted; each replica's text is a
  deterministic word-level permutation (sort by xxhash64(word, pos,
  doc_id, replica)) — word/char counts, vocabulary, and the
  EXACT-duplicate rate survive, while 3-gram shingles and MinHash/
  SimHash signatures decorrelate across replicas (a verbatim copy
  would make every doc a 10-way near-duplicate and quadratically
  explode every LSH band bucket, which is NOT what a 10x-bigger crawl
  looks like).
- embeddings: R copies with vec_id shifted and the vector multiplied
  by a per-replica diagonal ±1 sign pattern (signs keyed on
  (replica, position)). A diagonal ±1 matrix is orthogonal, so norms
  AND within-replica geometry survive exactly (the natural near-dup
  structure replicates, like the text dup groups), while
  cross-replica cosines decorrelate. Sign patterns COMPOSE safely:
  sf1→sf10 applies a second independent pattern, and two composed
  64-bit patterns collide with probability ~2^-64. The first version
  of this tool used cyclic ROTATION instead, which degenerates under
  composition — rotation offsets ADD, so sf10-from-sf1 had only
  2000 x 19 distinct vectors among 200k rows (162k manufactured
  exact clones), and the sf10 scale smoke measured
  q_embed_neardup_pairs at 67.9x: the band join correctly emitted the
  quadratic clone-pair output the degenerate data demanded. The
  operator was right; the data was wrong — kept here as the recipe's
  cautionary note.

Output: $OUT (default /root/repo/scale_data/sf1)/<table>.parquet,
written once; reruns skip tables whose output already exists.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from data_ingestor_gluejob_script_spark.session import get_spark  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")
OUT = os.environ.get("SPARK_GRAFT_SCALE_OUT", os.path.join(REPO, "scale_data", "sf1"))
R = int(os.environ.get("SPARK_GRAFT_SCALE_R", "10"))

# table -> {column: stride table} ; a column keyed by its own table is
# that table's PK. Strides are max_key+1 of the HOME table, so every
# replica's FKs land exactly on that replica's PKs.
KEYS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
PK_COL = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def main() -> int:
    spark = get_spark("make-scale-data")
    os.makedirs(OUT, exist_ok=True)

    src = {
        t: spark.read.parquet(os.path.join(SRC, f"{t}.parquet"))
        for t in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings"
        ).split()
    }
    strides = {
        t: src[t].agg(F.max(PK_COL[t])).first()[0] + 1 for t in PK_COL
    }
    strides["events_user"] = src["events"].agg(F.max("user_id")).first()[0] + 1

    reps = spark.range(R).withColumnRenamed("id", "_rep")

    for t, df in src.items():
        out_path = os.path.join(OUT, f"{t}.parquet")
        if os.path.exists(out_path):
            print(f"skip {t} (exists)")
            continue
        if t in ("region", "nation"):
            big = df
        else:
            big = df.crossJoin(F.broadcast(reps))
            for col, home in KEYS[t].items():
                big = big.withColumn(
                    col,
                    (
                        F.col(col)
                        + F.col("_rep") * F.lit(int(strides[home]))
                    ).cast(dict(df.dtypes)[col]),
                )
            if t == "documents":
                # deterministic per-replica word permutation; replica 0
                # keeps the original order (hash sort on _rep=0 would
                # not, so it is special-cased for a clean superset)
                # keyed on the TEXT (not doc_id): exact-duplicate
                # documents receive the same permutation per replica,
                # so the exact-dup group structure replicates with the
                # corpus instead of dissolving into singletons
                words = F.split(F.col("text"), " ")
                shuffled = F.array_join(
                    F.transform(
                        F.array_sort(
                            F.transform(
                                words,
                                lambda w, i: F.struct(
                                    F.xxhash64(
                                        w,
                                        i,
                                        F.xxhash64(F.col("text")),
                                        F.col("_rep"),
                                    ).alias("h"),
                                    w.alias("w"),
                                ),
                            )
                        ),
                        lambda s: s["w"],
                    ),
                    " ",
                )
                big = big.withColumn(
                    "text",
                    F.when(F.col("_rep") == 0, F.col("text")).otherwise(
                        shuffled
                    ),
                )
            if t == "embeddings":
                # per-replica ±1 sign flip: orthogonal (norms and
                # within-replica cosines exact), composition-safe
                # across decades — see module docstring for why
                # rotation is NOT used here
                # the pattern is ALSO keyed on this generation level's
                # stride: re-using one (replica, position) family at
                # both decades would make s_a∘s_b == s_b∘s_a (and
                # s_a∘s_a == identity) across levels and manufacture
                # clones all over again
                lvl = F.lit(int(strides["embeddings"]))
                flipped = F.transform(
                    F.col("embedding"),
                    lambda x, k: x
                    * F.when(
                        F.pmod(F.xxhash64(F.col("_rep"), k, lvl), 2)
                        == 0,
                        F.lit(1.0),
                    ).otherwise(F.lit(-1.0)).cast("float"),
                )
                big = big.withColumn(
                    "embedding",
                    F.when(F.col("_rep") == 0, F.col("embedding"))
                    .otherwise(flipped)
                    .cast("array<float>"),
                )
            big = big.drop("_rep")
        big.select(df.columns).repartition(
            max(4, R * df.rdd.getNumPartitions() // 2)
        ).write.mode("overwrite").parquet(out_path)
        n = spark.read.parquet(out_path).count()
        print(f"wrote {t}: {n} rows -> {out_path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
