"""Rebuild-as-compaction for the streaming source-of-truth lakes
(signature ledger + curated corpus) — r14 verdict #2. The band lake
heals by re-deriving from the signature lake; these lakes ARE the
truth, so compaction is a count-preserving rewrite behind a swap
marker. Covers: every crash window of the swap protocol, and the
end-to-end ingest keeping both lakes' file counts bounded while
content and replay parity stay exact."""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pyspark.sql.functions as F  # noqa: F401

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_ingestor_gluejob_script_spark import streaming  # noqa: E402
from data_ingestor_gluejob_script_spark.streaming import (  # noqa: E402
    _compact_append_lake,
    _lake_marker,
    _lake_staging,
    _n_parquet_files,
    _recover_lake_swap,
    run_neardup_ingest,
)


def _write(spark, path, rows):
    spark.createDataFrame(rows, "x long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def _vals(spark, path):
    return sorted(r["x"] for r in spark.read.parquet(path).collect())


def _touch(path):
    open(path, "w").close()


def test_recover_lake_swap_every_crash_window(spark, tmp_path):
    lake = str(tmp_path / "lake")

    # window 0: nothing pending — recovery is a no-op
    _write(spark, lake, [(1,), (2,)])
    _recover_lake_swap(spark, lake)
    assert _vals(spark, lake) == [1, 2]

    # window 1: crash DURING the staging write (no marker yet) —
    # the lake is authoritative, the orphan staging is dropped
    _write(spark, _lake_staging(lake), [(9,)])
    _recover_lake_swap(spark, lake)
    assert _vals(spark, lake) == [1, 2]
    assert not os.path.exists(_lake_staging(lake))

    # window 2: crash after the marker, before the swap — staging is
    # authoritative, recovery redoes the swap
    _write(spark, _lake_staging(lake), [(7, ), (8,)])
    _touch(_lake_marker(lake))
    _recover_lake_swap(spark, lake)
    assert _vals(spark, lake) == [7, 8]
    assert not os.path.exists(_lake_staging(lake))
    assert not os.path.exists(_lake_marker(lake))

    # window 3: crash between delete(lake) and rename — same redo
    _write(spark, _lake_staging(lake), [(5,)])
    _touch(_lake_marker(lake))
    import shutil

    shutil.rmtree(lake)
    _recover_lake_swap(spark, lake)
    assert _vals(spark, lake) == [5]

    # window 4: crash after the rename, before the marker delete —
    # swap already complete, recovery just drops the marker
    _touch(_lake_marker(lake))
    _recover_lake_swap(spark, lake)
    assert _vals(spark, lake) == [5]
    assert not os.path.exists(_lake_marker(lake))


def test_compact_append_lake_preserves_rows_and_bounds_files(
    spark, tmp_path
):
    lake = str(tmp_path / "lake")
    for i in range(12):
        spark.createDataFrame([(i,)], "x long").coalesce(1).write.mode(
            "append"
        ).parquet(lake)
    assert _n_parquet_files(spark, lake) == 12
    _compact_append_lake(spark, lake)
    assert _vals(spark, lake) == list(range(12))
    assert _n_parquet_files(spark, lake) <= 2
    assert not os.path.exists(_lake_marker(lake))
    assert not os.path.exists(_lake_staging(lake))


def test_neardup_ingest_compacts_both_lakes_and_stays_exact(
    spark, tmp_path, monkeypatch
):
    """16 single-file micro-batches with the threshold forced low:
    both source-of-truth lakes get compacted mid-stream (several
    times), the retained set still equals the batch twin, and a full
    replay appends nothing."""
    from data_ingestor_gluejob_script_spark.queries.textops import (
        minhash_dedup_frame,
    )

    monkeypatch.setattr(streaming, "APPEND_LAKE_COMPACT_FILES", 4)
    rows = [
        (i, f"alpha bravo charlie delta echo token{i} foxtrot golf")
        for i in range(16)
    ]
    docs_dir = str(tmp_path / "in")
    lake, sigs = str(tmp_path / "lake"), str(tmp_path / "sigs")
    for i, t in rows:  # one file per batch -> 16 micro-batches
        spark.createDataFrame(
            [(i, t)], "doc_id long, text string"
        ).coalesce(1).write.mode("append").parquet(docs_dir)

    q = run_neardup_ingest(spark, docs_dir, lake, sigs, str(tmp_path / "ck"))
    q.awaitTermination(600)

    # bounded file counts: 16 appends with threshold 4 means both
    # lakes compacted at least twice and never exceed threshold+1
    # files for long (post-run: at most threshold + a few appends)
    assert _n_parquet_files(spark, sigs) <= 6
    assert _n_parquet_files(spark, lake) <= 6

    df_all = spark.createDataFrame(rows, "doc_id long, text string")
    want = sorted(
        r["doc_id"] for r in minhash_dedup_frame(df_all).collect()
    )
    got = sorted(r["doc_id"] for r in spark.read.parquet(lake).collect())
    assert got == want
    n_sigs = spark.read.parquet(sigs).count()
    assert n_sigs == len({t for _, t in rows})

    # replay with a fresh checkpoint: ledger absorbs everything
    q2 = run_neardup_ingest(
        spark, docs_dir, lake, sigs, str(tmp_path / "ck2")
    )
    q2.awaitTermination(600)
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(lake).collect()
    ) == want
    assert spark.read.parquet(sigs).count() == n_sigs
