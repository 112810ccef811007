"""Streaming scale smoke (round-12 task 6): all prior scale evidence
is batch; this runs the web-curation STREAMING twin
(streaming.run_web_curation_ingest) over a chunked sf-scale crawl in
availableNow micro-batches and records, per batch, the wall time and
input rows, plus the state-lake's byte/row growth against docs
ingested. The bounded-state claim under test: per-batch cost must not
blow up as the ledger grows (the anti-join side is a column-pruned
32-byte digest scan — linear ledger bytes, near-flat batch times at
this scale), and ledger bytes must track CURATED docs, not raw input.

Usage:
  python tools/streaming_scale_smoke.py [sf_dir] [n_chunks]
(defaults: scale_data/sf10, 24 chunks)

Output: scale_data/streaming_scale_smoke.json. Protocol: one JVM,
quiet host, never under concurrent Spark (memory:
bench-timing-discipline).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _dir_bytes(d: str) -> int:
    total = 0
    for root, _, files in os.walk(d):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def main() -> int:
    from pyspark.sql import functions as F

    from data_ingestor_gluejob_script_spark.queries.extras import _html_docs
    from data_ingestor_gluejob_script_spark.session import get_spark
    from data_ingestor_gluejob_script_spark.streaming import (
        run_web_curation_ingest,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "scale_data", "sf10"
    )
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 24

    spark = get_spark("streaming-scale-smoke")
    work = tempfile.mkdtemp(prefix="spark_graft_streamsmoke_")
    pages_dir = os.path.join(work, "pages")
    lake_dir = os.path.join(work, "lake")
    ckpt_dir = os.path.join(work, "ckpt")

    pages = _html_docs(spark, sf_dir).select(
        "doc_id",
        F.concat(F.lit("http://bench.example/"), F.col("doc_id")).alias(
            "url"
        ),
        "html",
    )
    n_docs = pages.count()
    pages.repartition(n_chunks).write.mode("overwrite").parquet(pages_dir)

    t0 = time.perf_counter()
    q = run_web_curation_ingest(
        spark, pages_dir, lake_dir, ckpt_dir, min_line_words=3,
        min_kept_lines=1,
    )
    q.awaitTermination()
    wall = round(time.perf_counter() - t0, 3)

    batches = []
    for p in q.recentProgress:
        # skip availableNow's trailing empty progress entries: an
        # empty batch in batch_ms_last3 would understate end-of-run
        # cost (round-12 review: the old and/or precedence only
        # skipped an empty batch 0)
        if p is None or p.get("numInputRows", 0) == 0:
            continue
        batches.append(
            {
                "batch_id": p.get("batchId"),
                "input_rows": p.get("numInputRows"),
                "batch_ms": (p.get("durationMs") or {}).get(
                    "triggerExecution"
                ),
            }
        )

    lake = spark.read.parquet(lake_dir)
    doc = {
        "sf_dir": sf_dir,
        "n_chunks": n_chunks,
        "input_docs": n_docs,
        "wall_sec": wall,
        "curated_docs": lake.count(),
        "ledger_bytes": _dir_bytes(lake_dir),
        "checkpoint_bytes": _dir_bytes(ckpt_dir),
        "batches": batches,
        "batch_ms_first3": [b["batch_ms"] for b in batches[:3]],
        "batch_ms_last3": [b["batch_ms"] for b in batches[-3:]],
    }
    path = os.path.join(REPO, "scale_data", "streaming_scale_smoke.json")
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({k: doc[k] for k in (
        "input_docs", "wall_sec", "curated_docs", "ledger_bytes",
        "batch_ms_first3", "batch_ms_last3",
    )}))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
