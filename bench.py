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

Protocol hardening (round-4): the harness waits for the host's
1-minute load to drop below half the CPU count before timing (up to
2 minutes), runs best-of-``$SPARK_GRAFT_BENCH_REPS`` (default 5) per
query, and records the load at start/end in the JSON so a noisy run
is visible in the artifact instead of masquerading as a regression.
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


def loadavg_1m() -> float:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except (OSError, ValueError):
        return -1.0


def wait_for_quiet_host(max_load: float, timeout_sec: float = 120.0) -> float:
    """Round-to-round timing swings on this host are dominated by
    external CPU contention (r3 'regressed' 14% on byte-identical
    code). Refuse to start timing while the 1-minute load is above
    ``max_load``; give up after ``timeout_sec`` and record the load so
    the consumer can discount the numbers."""
    deadline = time.monotonic() + timeout_sec
    load = loadavg_1m()
    while load > max_load and time.monotonic() < deadline:
        time.sleep(5)
        load = loadavg_1m()
    return load


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))
    ncpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 32)))
    start_load = wait_for_quiet_host(max_load=0.5 * ncpus)
    spark = get_spark("bench")

    # Warm the JVM + parquet footer caches so per-query numbers measure
    # the plan, not first-touch JIT/IO (same treatment for every query).
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).limit(1).count()

    timings: dict[str, float] = {}
    for name, fn in sorted(entry_mod.queries().items()):
        # Best of N (default 5): contention is one-sided — a noisy
        # neighbor only ever ADDS time — so the min is the cleanest
        # estimator of the plan's own cost on a shared host.
        best = None
        try:
            for _ in range(reps):
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
                "reps": reps,
                "load_at_start": start_load,
                "load_at_end": loadavg_1m(),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
