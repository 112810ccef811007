"""BM25 decade smoke on the natural-vocabulary Zipf corpus
(tools/make_zipf_corpus.py) — round-15: measure the plan variants the
r14 verdict's by-construction claim could not distinguish on the
31-word testdata vocabulary.

Variants, all over the constant 64-query batch (doc_id < 64):
- plain:       the default plan (broadcast qterms restriction, one
               reused doc_id exchange carrying ~50% of ctf rows on
               Zipf text — the r15 measurement).
- pruned:      max_df_frac=0.1, no dictionary — TWO corpus passes,
               exchange restricted to selective-term postings.
- dict:        precomputed df_table (the index-time dictionary,
               persisted as parquet beside the corpus) — ONE corpus
               pass, df rides the broadcast. Build time reported
               separately as index_sec (amortized across batches).
- dict_pruned: dictionary + max_df_frac=0.1 — one pass AND the
               selective exchange.

Protocol (memory: bench timing discipline): one JVM, noop sink, warm
scan first, best-of-$SPARK_GRAFT_SCALE_REPS (default 2), variants
interleaved per corpus so JIT state is comparable. Output:
scale_data/bm25_zipf_smoke.json with per-size seconds and per-decade
ratios; the committed analysis lives in SCALE.md.

r16 (r15 verdict #4): per-variant EXCHANGE BYTES are recorded
directly, not inferred — the Spark UI REST API is polled for the
completed-stage deltas of each timed run (shuffle read/write bytes,
input bytes, disk/memory spill), so "the dictionary path's only
corpus exchange is the doc_id repartition and its bytes are flat
across variants" is a number in the artifact. The UI is enabled for
this tool only (the engine session keeps it off); stage metrics are
wall-clock-free counters, so reading them does not perturb timing —
the poll happens between runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

SIZES = ["zipf_sf0.1", "zipf_sf1", "zipf_sf10", "zipf_sf100"]
REPS = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2"))
FRAC = float(os.environ.get("SPARK_GRAFT_BM25_MAXDF", "0.1"))


def _completed_stages(spark) -> list[dict]:
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read().decode())


_BYTE_FIELDS = {
    "shuffle_read_bytes": "shuffleReadBytes",
    "shuffle_write_bytes": "shuffleWriteBytes",
    "input_bytes": "inputBytes",
    "disk_spill_bytes": "diskBytesSpilled",
    "memory_spill_bytes": "memoryBytesSpilled",
}


def _max_stage_id(spark) -> int:
    stages = _completed_stages(spark)
    return max((s["stageId"] for s in stages), default=-1)


def _bytes_since(spark, after_id: int) -> dict[str, int]:
    tot = {k: 0 for k in _BYTE_FIELDS}
    for st in _completed_stages(spark):
        if st["stageId"] > after_id:
            for k, f in _BYTE_FIELDS.items():
                tot[k] += int(st.get(f, 0) or 0)
    return tot


def main() -> int:
    from data_ingestor_gluejob_script_spark.queries.corpusstats import (
        bm25_search_join,
        vocab_frame,
    )
    from data_ingestor_gluejob_script_spark.session import get_spark

    sizes = sys.argv[1:] or SIZES
    spark = get_spark(
        "bm25-zipf-smoke",
        extra_conf={
            # exchange-bytes evidence rides the UI REST API; keep
            # enough completed stages retained that a full variant
            # run (tens of stages) never falls out of the window
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "20000",
        },
    )
    out: dict[str, dict] = {}
    for name in sizes:
        d = os.path.join(REPO, "scale_data", name)
        docs_path = os.path.join(d, "documents.parquet")
        if not os.path.exists(docs_path):
            print(f"skip {name} (no corpus)")
            continue
        docs = spark.read.parquet(docs_path).select("doc_id", "text")
        docs.limit(1).count()  # warm footer/JIT
        # index-time: build + persist the dictionary once; on rerun
        # the build is skipped and index_sec is null, NOT ~0 (review
        # r15: a cached rerun wrote a bogus 0.001s "build time" into
        # the artifact SCALE.md cites for amortization)
        dft_path = os.path.join(d, "df_table.parquet")
        if os.path.exists(dft_path):
            index_sec = None
        else:
            t0 = time.perf_counter()
            vocab_frame(docs).select(
                "token", F.col("n_docs").alias("df")
            ).write.parquet(dft_path)
            index_sec = round(time.perf_counter() - t0, 3)
        dft = spark.read.parquet(dft_path)
        # index-time corpus stats (n_docs, avg_dl) — in production
        # these ride the vocab lake (bm25_stats_from_vocab_lake); here
        # they are computed once per corpus and timed separately
        t0 = time.perf_counter()
        srow = docs.agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.size(F.split("text", " "))).alias("avgdl"),
        ).first()
        stats_sec = round(time.perf_counter() - t0, 3)
        nd, adl = int(srow["n"]), float(srow["avgdl"])
        queries = docs.filter(F.col("doc_id") < 64).selectExpr(
            "doc_id AS query_id", "text"
        )
        variants = {
            "plain": dict(),
            "pruned": dict(max_df_frac=FRAC),
            "dict": dict(df_table=dft),
            "dict_pruned": dict(df_table=dft, max_df_frac=FRAC),
            # r15 review follow-up: the FULL index-time shape — zero
            # corpus statistics jobs at query time
            "dict_full": dict(df_table=dft, n_docs=nd, avg_dl=adl),
            "dict_full_pruned": dict(
                df_table=dft, n_docs=nd, avg_dl=adl, max_df_frac=FRAC
            ),
        }
        res: dict[str, float] = {}
        run_bytes: dict[str, dict] = {}
        for rep in range(REPS):
            for v, kw in variants.items():
                mark = _max_stage_id(spark)
                t0 = time.perf_counter()
                bm25_search_join(docs, queries, k=5, **kw).write.mode(
                    "overwrite"
                ).format("noop").save()
                dt = round(time.perf_counter() - t0, 3)
                res[v] = min(res.get(v, dt), dt)
                # counters are deterministic per plan — any rep's
                # delta is THE number; keep the last
                run_bytes[v] = _bytes_since(spark, mark)
        out[name] = {"index_sec": index_sec, "stats_sec": stats_sec,
                     **res,
                     "bytes": run_bytes}
        print(f"{name}: {out[name]}", flush=True)

    decades = {}
    for a, b in zip(SIZES, SIZES[1:]):
        if a in out and b in out:
            decades[f"{a}->{b}"] = {
                v: round(out[b][v] / out[a][v], 2)
                for v in (
                    "plain", "pruned", "dict", "dict_pruned",
                    "dict_full", "dict_full_pruned",
                )
                if out[a].get(v) and out[b].get(v)
            }
    doc = {"reps": REPS, "max_df_frac": FRAC, "sizes": out,
           "decades": decades}
    path = os.path.join(
        REPO, "scale_data",
        os.environ.get("SPARK_GRAFT_BM25_OUT", "bm25_zipf_smoke.json"),
    )
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(decades))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
