"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet tables, then compares row count,
column names, and an order-insensitive value multiset (columns sorted
by name, values stringified). Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_cell(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if v != v:
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def to_multiset(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e
    from data_ingestor_gluejob_script_spark.session import get_spark

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
            o = con.execute(oracles[name])
            o_cols = [d[0] for d in o.description]
            o_rows = o.fetchall()
            problems = []
            if len(s_rows) != len(o_rows):
                problems.append(f"rows {len(s_rows)} vs {len(o_rows)}")
            if sorted(s_cols) != sorted(o_cols):
                problems.append(f"cols {sorted(s_cols)} vs {sorted(o_cols)}")
            if not problems and to_multiset(s_cols, s_rows) != to_multiset(
                o_cols, o_rows
            ):
                sm, om = to_multiset(s_cols, s_rows), to_multiset(o_cols, o_rows)
                diff = next(
                    (i for i, (a, b) in enumerate(zip(sm, om)) if a != b), -1
                )
                problems.append(
                    f"values differ (first at sorted idx {diff}: "
                    f"spark={sm[diff] if diff >= 0 else '?'} "
                    f"oracle={om[diff] if diff >= 0 else '?'})"
                )
            dt = time.time() - t0
            if problems:
                n_fail += 1
                print(f"FAIL {name} [{dt:.1f}s] rows={len(s_rows)}: "
                      + "; ".join(problems))
            else:
                n_pass += 1
                print(f"PASS {name} [{dt:.1f}s] rows={len(s_rows)}")
        except Exception as ex:  # noqa: BLE001
            n_fail += 1
            print(f"ERROR {name}: {type(ex).__name__}: {ex}")
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
