"""Clone-flood smoke for knn_graph_frame (round 13): a corpus where
every vector is repeated CLONES times has the SAME distinct-vector
count as the base corpus, so with the exact-clone pre-collapse its
kNN cost should grow roughly with the ROW count (the member
expansions are k-capped per row), never with clones² — without the
collapse every c-clone class lands whole in one bucket per band and
the per-bucket numpy stage pays (c·g)² where the base corpus paid g².

Measures (one JVM, best-of-REPS, noop sink):
  base     — knn_graph_frame over $SPARK_GRAFT_SF_DIR embeddings
  clonesX  — same corpus with every vector repeated CLONES times
             (fresh vec_ids), default path (collapse on)
  [clonesX_nocollapse — only when SPARK_GRAFT_KNN_NOCOLLAPSE=1; the
   quadratic arm, skipped by default so the smoke terminates fast]

Writes scale_data/knn_clone_smoke.json; copy to a named artifact.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CLONES = int(os.environ.get("SPARK_GRAFT_KNN_CLONES", "20"))
REPS = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2"))


def main() -> int:
    from pyspark.sql import functions as F

    from data_ingestor_gluejob_script_spark.queries.extras import _emb
    from data_ingestor_gluejob_script_spark.queries.similarity import (
        knn_graph_frame,
    )
    from data_ingestor_gluejob_script_spark.session import get_spark

    spark = get_spark("knn-clone-smoke")
    base = _emb(spark, SF_DIR).localCheckpoint()
    n = base.count()
    flood = (
        base.select(
            "vec_id",
            "emb",
            F.explode(
                F.array(*[F.lit(i) for i in range(CLONES)])
            ).alias("_c"),
        )
        .select(
            (F.col("vec_id") + F.col("_c") * F.lit(10_000_000)).alias(
                "vec_id"
            ),
            "emb",
        )
        .localCheckpoint()
    )
    n_flood = flood.count()

    def timed(name, df, **kw):
        best = None
        for _ in range(REPS):
            t0 = time.monotonic()
            knn_graph_frame(df, k=10, **kw).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name}: {best:.2f}s", flush=True)
        return best

    out = {
        "sf_dir": SF_DIR,
        "clones": CLONES,
        "n_base": n,
        "n_flood": n_flood,
        "reps": REPS,
    }
    out["base_sec"] = timed("base", base)
    out["flood_sec"] = timed(f"clones{CLONES}", flood)
    out["flood_over_base"] = round(out["flood_sec"] / out["base_sec"], 2)
    if os.environ.get("SPARK_GRAFT_KNN_NOCOLLAPSE") == "1":
        out["flood_nocollapse_sec"] = timed(
            "nocollapse", flood, collapse_clones=False
        )
    path = os.path.join(REPO, "scale_data", "knn_clone_smoke.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
