"""Dump .explain("formatted") for declared queries to plans/r<N>/.

Usage::

    python tools/dump_plans.py before [name ...]
    python tools/dump_plans.py after  [name ...]

With no names, dumps every registered query (the 50 declared ones).
Extras can be named explicitly (``x_...``). Output files:
``plans/r16/<name>_<suffix>.txt``. Explain only — nothing executes, so
this is safe to run while other jobs own the host.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROUND = os.environ.get("SPARK_GRAFT_ROUND", "r16")


def explain_str(df) -> str:
    qe = df._jdf.queryExecution()
    try:
        return df._sc._jvm.PythonSQLUtils.explainString(qe, "formatted")
    except Exception:  # noqa: BLE001 — fall back to the simple form
        return qe.explainString(
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]

    import __spark_entry__ as entry_mod
    from data_ingestor_gluejob_script_spark.queries.extras import extras
    from data_ingestor_gluejob_script_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = {**entry_mod.queries(), **extras()}
    if not names:
        names = sorted(entry_mod.queries())

    out_dir = os.path.join(REPO, "plans", ROUND)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("dump-plans")
    for name in names:
        try:
            df = registry[name](spark, sf_dir)
            text = explain_str(df)
        except Exception as ex:  # noqa: BLE001 — record, keep dumping
            text = f"EXPLAIN FAILED: {type(ex).__name__}: {ex}\n"
            print(f"explain failed for {name}: {ex}", file=sys.stderr)
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(text)
        print(f"wrote {name}_{suffix}.txt", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
