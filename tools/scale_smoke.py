"""Scale smoke: measure every registered query (and the most
expensive extras) at sf0.1 AND at the 10x sf1 replica
(tools/make_scale_data.py), recording per-operator wall-time ratios —
the round-10 verdict's top item. The 100-TB design claims rest on plan
shapes; 10x data is the cheapest observation that catches a
superlinear term the plan tests miss (the round-7 sf0.1 smoke caught
an O(len^2) HOF bug exactly this way).

Protocol: one JVM, queries interleaved (rep k of a query times sf0.1
immediately before sf1, so JIT/footer-cache state is comparable),
best-of-``$SPARK_GRAFT_SCALE_REPS`` (default 2), noop sink (full
distributed plan, no driver collect). A 10x-data ratio around or
below 10 is linear-or-better (fixed overhead keeps tiny queries far
below it); the flag threshold is ``ratio > 13`` (10x data + 30%
headroom for the shuffle's n·log n and denser spills), matching the
verdict's "worse than ~13x for 10x data gets a filed fix or a
documented reason".

Output: scale_data/scale_smoke.json (per-query small/big/ratio +
environment); the committed analysis lives in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SMALL = os.environ.get("SPARK_GRAFT_SCALE_SMALL", "/root/testdata/sf0.1")
BIG = os.environ.get(
    "SPARK_GRAFT_SCALE_BIG", os.path.join(REPO, "scale_data", "sf1")
)
REPS = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2"))
N_EXTRAS = int(os.environ.get("SPARK_GRAFT_SCALE_EXTRAS", "12"))


def main() -> int:
    import __spark_entry__ as entry_mod
    from data_ingestor_gluejob_script_spark.queries.extras import extras
    from data_ingestor_gluejob_script_spark.session import get_spark

    only = set(sys.argv[1:])
    queries = dict(entry_mod.queries())
    with open(os.path.join(REPO, "EXTRAS_BASELINE.json")) as f:
        base = {k: v["sec"] for k, v in json.load(f).items()}
    ex = extras()
    top_extras = sorted(ex, key=lambda n: -base.get(n, 0.0))[:N_EXTRAS]
    queries.update({n: ex[n] for n in top_extras})
    # an explicitly named extras entry is measured even when its
    # baseline is too small for the default top-N cut
    queries.update({n: ex[n] for n in only if n in ex})
    names = sorted(queries)
    if only:
        names = [n for n in names if n in only]

    spark = get_spark("scale-smoke")
    # warm JVM + footer caches on both datasets (documents-only dirs —
    # the zipf corpora — carry no lineitem; warm what exists)
    for d in (SMALL, BIG):
        for t in ("lineitem", "documents"):
            p = os.path.join(d, f"{t}.parquet")
            if os.path.exists(p):
                spark.read.parquet(p).limit(1).count()
                break

    def t(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        return round(time.perf_counter() - t0, 3)

    out: dict[str, dict] = {}
    for name in names:
        small_ts, big_ts = [], []
        try:
            for _ in range(REPS):
                small_ts.append(t(name, SMALL))
                big_ts.append(t(name, BIG))
            small, big = min(small_ts), min(big_ts)
            out[name] = {
                "small": small,
                "big": big,
                "ratio": round(big / small, 2) if small > 0 else -1.0,
            }
        except Exception as ex_:  # noqa: BLE001 — record, keep smoking
            out[name] = {"error": f"{type(ex_).__name__}: {ex_}"[:300]}
        print(f"{name}: {out[name]}", flush=True)

    doc = {
        "small_dir": SMALL,
        "big_dir": BIG,
        "reps": REPS,
        "results": out,
        "flagged_over_13x": sorted(
            n for n, r in out.items() if r.get("ratio", 0) > 13
        ),
    }
    path = os.path.join(REPO, "scale_data", "scale_smoke.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"flagged": doc["flagged_over_13x"]}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
