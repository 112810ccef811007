"""Benchmark harness: wall-clock per declared query at one scale factor.

Runs every ``__spark_entry__.queries()`` entry against
``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {"q_...": sec, ...}, "sf": 0.1}

Execution is forced with the ``noop`` datasource sink, so each timing
covers the full distributed plan (scan → shuffle → result) without
driver-side collect serialization; that matches how a query would be
consumed at 100 TB (written to a sink, not collected).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from data_ingestor_gluejob_script_spark.session import get_spark  # noqa: E402


def sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)/?$", sf_dir)
    return float(m.group(1)) if m else -1.0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")

    # Warm the JVM + parquet footer caches so per-query numbers measure
    # the plan, not first-touch JIT/IO (same treatment for every query).
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).limit(1).count()

    timings: dict[str, float] = {}
    for name, fn in sorted(entry_mod.queries().items()):
        # Best of 3: this host shows sporadic external CPU contention
        # (multi-second spikes on sub-second plans); the min measures
        # the plan rather than the noisy neighbor.
        best = None
        try:
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                dt = time.perf_counter() - t0
                best = dt if best is None or dt < best else best
            timings[name] = round(best, 3)
        except Exception as ex:  # noqa: BLE001 — record, keep benching
            timings[name] = -1.0
            print(f"bench error {name}: {type(ex).__name__}: {ex}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_of(sf_dir),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
