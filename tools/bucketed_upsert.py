"""Bucketed-layout measurement for the upsert/merge path (round-12
verdict item #1).

q_upsert_dedup is the last core entry with a superlinear decade number
(11.17x at decade 2, 6.65x at decade 3, SCALE.md): the registered
window formulation hash-shuffles the UNION of incoming+existing — the
whole lake — every run, and Spark cannot elide that Exchange even over
bucketed inputs because UnionExec reports unknown partitioning. The
engine's answer is operators/upsert.merge_upsert (join-formulated,
row-for-row equal — pinned by tests/test_merge_upsert.py): the lake
side becomes the null-stream of an anti join, so layout/size contracts
delete its shuffle. This tool MEASURES that at sf10/sf100, in four
arms over the same data:

 registered scenario (incoming = the WM_UPSERT slice, ~62% of orders —
 a backfill too big to broadcast):
   A window_registered  q_upsert_dedup's exact frame (baseline)
   B merge_plain        merge_upsert, sort-merge anti, unbucketed lake
   C merge_bucketed     same over a lake written bucketed+sorted on
                        o_orderkey (pipeline.write_bucketed) — asserted
                        one Exchange fewer than B (the lake's is gone)

 daily-increment scenario (incoming = last month, ~1.3% of orders —
 the shape a 100-TB lake actually upserts every day):
   D window_increment   upsert_dedup on the small slice
   E merge_broadcast    merge_upsert broadcast arm — asserted ZERO
                        shuffle Exchanges (the lake never leaves its
                        executors; plan is scan -> BHJ LeftAnti -> union)

Protocol (memory: bench-timing-discipline): one JVM, noop sink,
best-of-REPS, quiet host; the bucketed layout is written AFTER all
unbucketed arms so the scratch disk never holds both a lake copy and
the window shuffle at sf100.

Usage: python tools/bucketed_upsert.py [sf_dir ...]
Output: scale_data/bucketed_upsert_r13.json
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REPS = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2"))
N_BUCKETS = int(os.environ.get("SPARK_GRAFT_UPSERT_BUCKETS", "128"))
INCREMENT_WM = "2001-07-01 00:00:00"


def n_shuffles(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"(?<![A-Za-z])Exchange hashpartitioning", plan))


def main() -> int:
    from pyspark.sql import functions as F

    from data_ingestor_gluejob_script_spark.operators.relational import (
        watermark_filter,
    )
    from data_ingestor_gluejob_script_spark.operators.upsert import (
        merge_upsert,
        upsert_dedup,
    )
    from data_ingestor_gluejob_script_spark.pipeline import write_bucketed
    from data_ingestor_gluejob_script_spark.queries._util import (
        WM_UPSERT,
        load,
    )
    from data_ingestor_gluejob_script_spark.session import get_spark

    dirs = sys.argv[1:] or [
        os.path.join(REPO, "scale_data", "sf10"),
        os.path.join(REPO, "scale_data", "sf100"),
    ]
    spark = get_spark("bucketed-upsert")

    def incoming_of(orders, wm):
        return watermark_filter(orders, "o_orderdate", wm).withColumn(
            "o_totalprice", F.lit(0.0)
        )

    def timed(mk) -> float:
        t0 = time.perf_counter()
        mk().write.mode("overwrite").format("noop").save()
        return round(time.perf_counter() - t0, 3)

    out: dict[str, dict] = {}
    for d in dirs:
        tag = os.path.basename(d.rstrip("/"))
        lake_t = "bup_lake_" + re.sub(r"[^A-Za-z0-9_]", "_", tag)
        res: dict[str, object] = {}
        try:
            orders = load(spark, d, "orders")

            # --- registered scenario: backfill-sized incoming ---
            arm_a = lambda: upsert_dedup(  # noqa: E731
                incoming_of(orders, WM_UPSERT), orders, "o_orderkey"
            )
            arm_b = lambda: merge_upsert(  # noqa: E731
                incoming_of(orders, WM_UPSERT),
                orders,
                "o_orderkey",
                dedup_within=False,
                broadcast_incoming=False,
                keys_nullable=False,
            )
            res["window_registered_sec"] = min(
                timed(arm_a) for _ in range(REPS)
            )
            res["merge_plain_sec"] = min(timed(arm_b) for _ in range(REPS))
            res["merge_plain_shuffles"] = n_shuffles(arm_b())

            # --- daily-increment scenario, unbucketed arms ---
            arm_d = lambda: upsert_dedup(  # noqa: E731
                incoming_of(orders, INCREMENT_WM), orders, "o_orderkey"
            )
            arm_e = lambda: merge_upsert(  # noqa: E731
                incoming_of(orders, INCREMENT_WM),
                orders,
                "o_orderkey",
                dedup_within=False,
                broadcast_incoming=True,
            )
            assert n_shuffles(arm_e()) == 0, "broadcast arm must not shuffle"
            res["window_increment_sec"] = min(
                timed(arm_d) for _ in range(REPS)
            )
            res["merge_broadcast_sec"] = min(
                timed(arm_e) for _ in range(REPS)
            )

            # --- bucketed lake, written last (scratch headroom) ---
            t0 = time.perf_counter()
            write_bucketed(
                orders,
                lake_t,
                ["o_orderkey"],
                num_buckets=N_BUCKETS,
                sort_cols=["o_orderkey"],
            )
            res["layout_write_sec"] = round(time.perf_counter() - t0, 3)
            lake = spark.table(lake_t)
            arm_c = lambda: merge_upsert(  # noqa: E731
                incoming_of(orders, WM_UPSERT),
                lake,
                "o_orderkey",
                dedup_within=False,
                broadcast_incoming=False,
                keys_nullable=False,
            )
            nc, nb = n_shuffles(arm_c()), res["merge_plain_shuffles"]
            assert nc == nb - 1, (
                f"bucketed lake side still exchanges ({nc} vs plain {nb})"
            )
            res["merge_bucketed_shuffles"] = nc
            res["merge_bucketed_sec"] = min(timed(arm_c) for _ in range(REPS))
            res["rows"] = arm_c().count()
            res["n_buckets"] = N_BUCKETS
            res["speedup_backfill"] = round(
                res["window_registered_sec"] / res["merge_bucketed_sec"], 2
            )
            res["speedup_increment"] = round(
                res["window_increment_sec"] / res["merge_broadcast_sec"], 2
            )
        except Exception as ex:  # noqa: BLE001 — record, keep measuring
            res["error"] = f"{type(ex).__name__}: {ex}"[:300]
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {lake_t}")
        out[tag] = res
        print(f"{tag}: {res}", flush=True)

    path = os.path.join(REPO, "scale_data", "bucketed_upsert_r13.json")
    with open(path, "w") as f:
        json.dump(
            {"reps": REPS, "increment_wm": INCREMENT_WM, "results": out},
            f,
            indent=1,
        )
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
