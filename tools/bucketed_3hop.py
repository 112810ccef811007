"""Bucketed-layout measurement for the 3-hop chain (round-12 task 2).

q_join_3hop's decade-3 ratio (12.30x for 10x data, SCALE.md) is the
lineitem-orders fact-fact shuffle getting denser spill as both sides
grow. The lake already ships the fix — pipeline.write_bucketed — this
tool MEASURES it at scale: materialize lineitem and orders bucketed
(and sorted) on the join key, run the same 3-hop chain over the
bucketed tables, and compare wall-time against the unbucketed run in
the same JVM. The bucketed plan is asserted Exchange-free on the
fact-fact join (the 100-TB claim being tested: a layout choice at
write time deletes the dominant shuffle from every subsequent read).

Usage:
  python tools/bucketed_3hop.py [sf_dir ...]
(defaults: scale_data/sf10 scale_data/sf100)

Output: scale_data/bucketed_3hop.json with per-dir
{unbucketed_sec, bucketed_sec, speedup, rows, bucketed_plan_fact_exchanges}
plus the write (amortized layout) cost. Bucketed tables are dropped
afterwards — this is a measurement, not a migration.

Protocol notes (memory: bench-timing-discipline): one JVM, noop sink,
best-of-REPS; run on a quiet host, never under concurrent Spark.
All unbucketed reps run BEFORE the layout write, not interleaved with
the bucketed reps: at sf100 the two bucketed tables (~20 GB) and the
unbucketed fact-fact shuffle (~40+ GB) do not fit this host's 57 GB
scratch together — the first (interleaved) version of this tool died
disk-full exactly there. Same-JVM sequential is the comparison the
host can actually hold; both sides still share one warmed JVM.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REPS = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2"))
N_BUCKETS = int(os.environ.get("SPARK_GRAFT_3HOP_BUCKETS", "128"))


def main() -> int:
    from pyspark.sql import functions as F

    from data_ingestor_gluejob_script_spark.operators.relational import (
        join_chain,
        watermark_filter,
    )
    from data_ingestor_gluejob_script_spark.pipeline import write_bucketed
    from data_ingestor_gluejob_script_spark.queries._util import WM, load
    from data_ingestor_gluejob_script_spark.queries.core import q_join_3hop
    from data_ingestor_gluejob_script_spark.session import get_spark

    dirs = sys.argv[1:] or [
        os.path.join(REPO, "scale_data", "sf10"),
        os.path.join(REPO, "scale_data", "sf100"),
    ]
    spark = get_spark("bucketed-3hop")

    def chain_from(lineitem, orders, sf_dir):
        orders = watermark_filter(orders, "o_orderdate", WM)
        customer = load(spark, sf_dir, "customer")
        nation = load(spark, sf_dir, "nation").filter(
            F.col("n_name") == "NATION_7"
        )
        return join_chain(
            lineitem,
            [
                (orders, "l_orderkey", "o_orderkey"),
                (customer, "o_custkey", "c_custkey"),
                (nation, "c_nationkey", "n_nationkey"),
            ],
        )

    def timed(df) -> float:
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        return round(time.perf_counter() - t0, 3)

    out: dict[str, dict] = {}
    for d in dirs:
        tag = os.path.basename(d.rstrip("/"))
        li_t, ord_t = f"b3h_li_{tag}", f"b3h_ord_{tag}"
        ub, bk = [], []
        try:
            # unbucketed reps FIRST, with the full scratch to themselves
            for _ in range(REPS):
                ub.append(timed(q_join_3hop(spark, d)))

            t0 = time.perf_counter()
            write_bucketed(
                load(spark, d, "lineitem"),
                li_t,
                ["l_orderkey"],
                num_buckets=N_BUCKETS,
                sort_cols=["l_orderkey"],
            )
            write_bucketed(
                load(spark, d, "orders"),
                ord_t,
                ["o_orderkey"],
                num_buckets=N_BUCKETS,
                sort_cols=["o_orderkey"],
            )
            layout_sec = round(time.perf_counter() - t0, 3)

            bucketed = chain_from(spark.table(li_t), spark.table(ord_t), d)
            plan = bucketed._jdf.queryExecution().executedPlan().toString()
            fact_exchanges = sum(
                1
                for ln in plan.splitlines()
                if "Exchange hashpartitioning" in ln
                and ("l_orderkey" in ln or "o_orderkey" in ln)
            )
            # the docstring's promise: a non-zero count means the
            # bucketing silently failed to line up and the "bucketed"
            # timing would measure an ordinary shuffled join
            assert fact_exchanges == 0, (
                f"bucketed fact join still exchanges ({fact_exchanges})"
            )

            for _ in range(REPS):
                bk.append(
                    timed(chain_from(spark.table(li_t), spark.table(ord_t), d))
                )
            rows = chain_from(
                spark.table(li_t), spark.table(ord_t), d
            ).count()
            out[tag] = {
                "unbucketed_sec": min(ub),
                "bucketed_sec": min(bk),
                "speedup": round(min(ub) / min(bk), 2) if min(bk) else -1.0,
                "layout_write_sec": layout_sec,
                "n_buckets": N_BUCKETS,
                "rows": rows,
                "bucketed_plan_fact_exchanges": fact_exchanges,
            }
        except Exception as ex:  # noqa: BLE001 — record, keep measuring
            out[tag] = {"error": f"{type(ex).__name__}: {ex}"[:300]}
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {li_t}")
            spark.sql(f"DROP TABLE IF EXISTS {ord_t}")
        print(f"{tag}: {out[tag]}", flush=True)

    path = os.path.join(REPO, "scale_data", "bucketed_3hop.json")
    with open(path, "w") as f:
        json.dump({"reps": REPS, "results": out}, f, indent=1)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
