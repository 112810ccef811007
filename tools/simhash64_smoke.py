"""64-bit SimHash corpus-scale smoke (r15 verdict #3).

The registered 16-bit near-miss op (q_simhash_neardup_pairs) keeps
the reference semantics but its fingerprint space saturates: past
~1e5 docs all 65k fingerprints are occupied, every 8-bit band bucket
exceeds MAX_SIMHASH_BUCKET, and the pair join returns ZERO pairs
(SCALE.md r15 tail — MinHash was named the corpus-scale owner). The
r16 closer is simhash64_neardup_pairs: 64-bit fingerprints, the
dhash64 pigeonhole band machinery (4 disjoint 16-bit slices for
max_hamming=3), exact-collapse representatives first.

This smoke records, per zipfdup corpus size (planted ~30% dups):
- pair COUNTS for the 16-bit and 64-bit ops — the saturation claim
  made visible: n16 collapses to 0 at 500k docs while n64 stays
  proportional to the planted near-dup mass;
- wall seconds (best-of-$SPARK_GRAFT_SCALE_REPS, noop sink) and the
  per-decade ratio for the 64-bit op.

Protocol: one JVM, quiet host, never under concurrent Spark (memory:
bench-timing-discipline). Usage:
  python tools/simhash64_smoke.py [corpus ...]
(defaults: zipfdup_sf1 zipfdup_sf10; pass zipfdup_sf100 for decade 3)

Output: scale_data/simhash64_smoke.json; analysis in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIZES = ["zipfdup_sf1", "zipfdup_sf10"]
REPS = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2"))


def main() -> int:
    from data_ingestor_gluejob_script_spark.queries.textops import (
        q_simhash_neardup_pairs,
        simhash64_neardup_pairs,
    )
    from data_ingestor_gluejob_script_spark.queries._util import load, spread
    from data_ingestor_gluejob_script_spark.session import get_spark

    sizes = sys.argv[1:] or SIZES
    spark = get_spark("simhash64-smoke")
    out: dict[str, dict] = {}
    for name in sizes:
        d = os.path.join(REPO, "scale_data", name)
        if not os.path.exists(os.path.join(d, "documents.parquet")):
            print(f"skip {name} (no corpus)")
            continue
        docs = spread(spark, load(spark, d, "documents")).select(
            "doc_id", "text"
        )
        docs.limit(1).count()  # warm footer/JIT
        n_docs = docs.count()

        def t_noop(df_fn) -> float:
            best = None
            for _ in range(REPS):
                t0 = time.perf_counter()
                df_fn().write.mode("overwrite").format("noop").save()
                dt = round(time.perf_counter() - t0, 3)
                best = dt if best is None else min(best, dt)
            return best

        # assume_unique_ids: the zipfdup generator keys docs uniquely,
        # and the timing should isolate the operator (the identity
        # guard is one id-column scan, measured in the bench entry)
        t64 = t_noop(
            lambda: simhash64_neardup_pairs(docs, assume_unique_ids=True)
        )
        n64 = simhash64_neardup_pairs(docs, assume_unique_ids=True).count()
        t16 = t_noop(lambda: q_simhash_neardup_pairs(spark, d))
        n16 = q_simhash_neardup_pairs(spark, d).count()
        out[name] = {
            "n_docs": n_docs,
            "pairs_16bit": n16,
            "pairs_64bit": n64,
            "sec_16bit": t16,
            "sec_64bit": t64,
        }
        print(f"{name}: {out[name]}", flush=True)

    decades = {}
    order = [s for s in ("zipfdup_sf1", "zipfdup_sf10", "zipfdup_sf100")
             if s in out]
    for a, b in zip(order, order[1:]):
        decades[f"{a}->{b}"] = {
            "ratio_64bit": round(out[b]["sec_64bit"] / out[a]["sec_64bit"], 2)
        }
    doc = {"reps": REPS, "sizes": out, "decades": decades}
    path = os.path.join(REPO, "scale_data", "simhash64_smoke.json")
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc["decades"]))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
