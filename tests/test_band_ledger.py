"""r14 streaming-state additions: the precomputed band-bucketized
signature ledger behind run_neardup_ingest (layout, content parity
with a from-signature rebuild, self-healing migration when the band
lake is missing) and the broadcast-contract guard on micro-batches."""

from __future__ import annotations

import shutil
import sys
import tempfile
from pathlib import Path

import pytest
from pyspark.sql.streaming import StreamingQueryException

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_ingestor_gluejob_script_spark import streaming  # noqa: E402
from data_ingestor_gluejob_script_spark.queries._util import load  # noqa: E402
from data_ingestor_gluejob_script_spark.queries.textops import (  # noqa: E402
    minhash_dedup_frame,
)
from data_ingestor_gluejob_script_spark.streaming import (  # noqa: E402
    N_BAND_PFX,
    _minhash_band_ledger_rows,
    run_neardup_ingest,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(spark, n=150):
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    return [(r["doc_id"], r["text"]) for r in docs.collect()][:n]


def _write_batches(spark, rows, docs_dir, n_batches=3):
    rows = sorted(rows)
    per = (len(rows) + n_batches - 1) // n_batches
    for b in range(n_batches):
        chunk = rows[b * per : (b + 1) * per]
        if chunk:
            spark.createDataFrame(
                chunk, "doc_id long, text string"
            ).coalesce(1).write.mode("append").parquet(docs_dir)


def _band_content(df):
    return sorted(
        tuple(r)
        for r in df.select("band_key", "sig_cat", "band_pfx").collect()
    )


@pytest.mark.slow
def test_band_ledger_layout_and_rebuild_parity(spark):
    """After an ingest run the band lake carries the packed 3-column
    probe schema and holds exactly the rows a from-signature rebuild
    derives."""
    tmp = tempfile.mkdtemp(prefix="band_ledger_")
    try:
        docs_dir, lake, sigs, ckpt = (
            f"{tmp}/in", f"{tmp}/lake", f"{tmp}/sigs", f"{tmp}/ckpt",
        )
        _write_batches(spark, _rows(spark), docs_dir)
        run_neardup_ingest(
            spark, docs_dir, lake, sigs, ckpt
        ).awaitTermination()

        bands = spark.read.parquet(f"{sigs}_bands")
        assert "band_pfx" in bands.columns
        pfx = {r[0] for r in bands.select("band_pfx").distinct().collect()}
        assert pfx <= set(range(N_BAND_PFX)) and pfx
        # content parity: ledger rows == rebuild from the sig lake
        rebuilt = _minhash_band_ledger_rows(spark.read.parquet(sigs))
        assert _band_content(bands) == _band_content(rebuilt)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@pytest.mark.slow
def test_band_ledger_self_heals_when_missing(spark):
    """Pre-r14 state (signature lake without a band lake): deleting
    the band lake mid-stream rebuilds it from the signatures and the
    final corpus still matches the batch twin exactly."""
    rows = _rows(spark, 200)
    tmp = tempfile.mkdtemp(prefix="band_heal_")
    try:
        docs_dir, lake, sigs, ckpt = (
            f"{tmp}/in", f"{tmp}/lake", f"{tmp}/sigs", f"{tmp}/ckpt",
        )
        half = len(rows) // 2
        _write_batches(spark, rows[:half], docs_dir, n_batches=2)
        run_neardup_ingest(
            spark, docs_dir, lake, sigs, ckpt
        ).awaitTermination()
        shutil.rmtree(f"{sigs}_bands")  # simulate a pre-r14 ledger

        _write_batches(spark, rows[half:], docs_dir, n_batches=2)
        run_neardup_ingest(
            spark, docs_dir, lake, sigs, ckpt
        ).awaitTermination()

        got = sorted(
            r["doc_id"] for r in spark.read.parquet(lake).collect()
        )
        want = sorted(
            r["doc_id"]
            for r in minhash_dedup_frame(
                spark.createDataFrame(rows, "doc_id long, text string")
            ).collect()
        )
        assert got == want
        # ...and the rebuilt band lake is complete again
        bands = spark.read.parquet(f"{sigs}_bands")
        rebuilt = _minhash_band_ledger_rows(spark.read.parquet(sigs))
        assert _band_content(bands) == _band_content(rebuilt)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_broadcast_contract_guard_fails_fast(spark, monkeypatch):
    """A micro-batch over the contract ceiling aborts the query with
    an actionable message instead of an opaque broadcast failure."""
    monkeypatch.setattr(streaming, "BATCH_BROADCAST_MAX_ROWS", 10)
    tmp = tempfile.mkdtemp(prefix="band_guard_")
    try:
        docs_dir, lake, sigs, ckpt = (
            f"{tmp}/in", f"{tmp}/lake", f"{tmp}/sigs", f"{tmp}/ckpt",
        )
        _write_batches(spark, _rows(spark, 60), docs_dir, n_batches=1)
        q = run_neardup_ingest(spark, docs_dir, lake, sigs, ckpt)
        with pytest.raises(StreamingQueryException) as ei:
            q.awaitTermination()
        assert "broadcast contract" in str(ei.value)
        assert "maxFilesPerTrigger" in str(ei.value)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
