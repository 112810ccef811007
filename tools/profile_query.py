"""Per-query runtime profile: wall seconds + stage-metric deltas +
final (post-AQE) plan node counts, for any registered query or extra.

Usage::

    python tools/profile_query.py q_ngram_jaccard_pairs x_cdc_apply ...
    python tools/profile_query.py --all-core
    python tools/profile_query.py --all-extras

One JVM, noop sink, warm scan first, best-of-``$SPARK_GRAFT_PROFILE_REPS``
(default 3). The Spark UI REST API is polled BETWEEN runs for
completed-stage deltas (shuffle read/write, input bytes, spill) and the
last SQL execution's final plan description (the post-AQE plan, where
ReusedExchange/broadcast decisions are visible — ``explain`` only shows
the initial plan). Output: one JSON line per query to stdout and a
combined ``scale_data/profile_<tag>.json``.

Measurement tool only — never part of a query path.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REPS = int(os.environ.get("SPARK_GRAFT_PROFILE_REPS", "3"))

_BYTE_FIELDS = {
    "shuffle_read_bytes": "shuffleReadBytes",
    "shuffle_write_bytes": "shuffleWriteBytes",
    "input_bytes": "inputBytes",
    "disk_spill_bytes": "diskBytesSpilled",
    "memory_spill_bytes": "memoryBytesSpilled",
}

_PLAN_NODES = (
    "Exchange",
    "ReusedExchange",
    "BroadcastExchange",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "Window",
    "Sort",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "Generate",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "PythonMapInArrow",
    "AQEShuffleRead",
    "Scan parquet",
)


def _api(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/{path}"
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read().decode())


def _stages(spark) -> list[dict]:
    return _api(spark, "stages?status=complete")


def _jobs(spark) -> list[dict]:
    return _api(spark, "jobs")


def _sql_execs(spark) -> list[dict]:
    try:
        return _api(spark, "sql?details=true&planDescription=true&length=10000")
    except Exception:  # noqa: BLE001
        return []


def _count_nodes(plan: str) -> dict[str, int]:
    # the SQL UI's planDescription appends the pre-AQE plan after an
    # "== Initial Plan ==" marker — count only the final plan
    plan = plan.split("== Initial Plan ==")[0]
    out = {}
    for node in _PLAN_NODES:
        # word-prefix match at line starts within the plan tree text
        n = len(re.findall(rf"(?m)^[\s+:*()\-]*{re.escape(node)}", plan))
        if node == "Exchange":
            # don't double-count BroadcastExchange / ReusedExchange
            n = len(re.findall(r"(?m)^[\s+:*()\-]*Exchange ", plan))
        if n:
            out[node] = n
    return out


def profile(names: list[str], tag: str) -> int:
    import __spark_entry__ as entry_mod
    from data_ingestor_gluejob_script_spark.queries.extras import extras
    from data_ingestor_gluejob_script_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = {**entry_mod.queries(), **extras()}

    spark = get_spark(
        "profile-query",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "20000",
            "spark.sql.ui.retainedExecutions": "2000",
        },
    )
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).limit(1).count()

    results: dict[str, dict] = {}
    for name in names:
        fn = registry.get(name)
        if fn is None:
            print(f"unknown query: {name}", file=sys.stderr)
            continue
        reps = []
        metrics = None
        plan_nodes = None
        n_stages = n_jobs = 0
        for rep in range(REPS):
            pre_stage = max((s["stageId"] for s in _stages(spark)), default=-1)
            pre_jobs = len(_jobs(spark))
            spark.sparkContext.setJobDescription(f"profile:{name}#{rep}")
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            except Exception as ex:  # noqa: BLE001
                print(f"profile error {name}: {ex}", file=sys.stderr)
                reps.append(-1.0)
                break
            dt = round(time.perf_counter() - t0, 3)
            spark.sparkContext.setJobDescription(None)
            reps.append(dt)
            if dt == min(t for t in reps if t >= 0):
                tot = {k: 0 for k in _BYTE_FIELDS}
                stages_after = [
                    s for s in _stages(spark) if s["stageId"] > pre_stage
                ]
                for st in stages_after:
                    for k, f in _BYTE_FIELDS.items():
                        tot[k] += int(st.get(f, 0) or 0)
                metrics = tot
                n_stages = len(stages_after)
                n_jobs = len(_jobs(spark)) - pre_jobs
        # final plan of the last execution (post-AQE)
        execs = _sql_execs(spark)
        if execs:
            last = max(execs, key=lambda e: e["id"])
            plan_nodes = _count_nodes(last.get("planDescription", ""))
        row = {
            "reps": reps,
            "best": min((t for t in reps if t >= 0), default=-1.0),
            "stages": n_stages,
            "jobs": n_jobs,
            **(metrics or {}),
            "plan_nodes": plan_nodes,
        }
        results[name] = row
        print(json.dumps({name: row}), flush=True)
    spark.stop()
    os.makedirs(os.path.join(REPO, "scale_data"), exist_ok=True)
    with open(
        os.path.join(REPO, "scale_data", f"profile_{tag}.json"), "w"
    ) as f:
        json.dump(results, f, indent=1)
    return 0


def main() -> int:
    import __spark_entry__ as entry_mod
    from data_ingestor_gluejob_script_spark.queries.extras import extras

    args = sys.argv[1:]
    tag = os.environ.get("SPARK_GRAFT_PROFILE_TAG", "r16")
    if args == ["--all-core"]:
        names = sorted(entry_mod.queries())
        tag += "_core"
    elif args == ["--all-extras"]:
        names = sorted(extras())
        tag += "_extras"
    else:
        names = args
    if not names:
        print("usage: profile_query.py <names...> | --all-core | --all-extras")
        return 2
    return profile(names, tag)


if __name__ == "__main__":
    sys.exit(main())
