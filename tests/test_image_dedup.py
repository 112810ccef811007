"""Perceptual image dedup: python-twin differential for dhash64 (the
fake decode path is deterministic, so hashes compare exactly), a
brute-force oracle for image_dedup_frame, and crafted 72-byte
payloads — which the fake resize maps to THEMSELVES, giving precise
pixel control — to pin the banded hamming join on true near pairs.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_ingestor_gluejob_script_spark.operators.multimodal import (  # noqa: E402
    _fake_resize_one,
    dhash64,
    image_dedup_frame,
)
from data_ingestor_gluejob_script_spark.queries.multimodal import (  # noqa: E402
    _payloads,
)

SF_DIR = "/root/testdata/sf0.001"


def _dhash_py(payload: bytes) -> int:
    raw = _fake_resize_one(payload, 72)
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(8, 9)
    bits = (arr[:, 1:] > arr[:, :-1]).reshape(64)
    v = 0
    for j in range(64):
        if bits[j]:
            v |= 1 << j
    return v - (1 << 64) if v >= (1 << 63) else v


def image_dedup_oracle(rows, max_hamming=3):
    """rows: [(id, payload_bytes)] -> retained [(id, phash)]."""
    hashes = [(i, _dhash_py(p)) for i, p in sorted(rows)]
    reps = {}
    for i, h in hashes:
        reps.setdefault(h, i)
    surv = sorted((i, h) for h, i in reps.items())
    retained = []
    for idx, (i, h) in enumerate(surv):
        if not any(
            bin((h ^ hj) & ((1 << 64) - 1)).count("1") <= max_hamming
            for j, hj in surv[:idx]
        ):
            retained.append((i, h))
    return sorted(retained)


def test_dhash_matches_python_twin(spark):
    pay = _payloads(spark, SF_DIR)
    got = {
        r["doc_id"]: r["phash"] for r in dhash64(pay).collect()
    }
    rows = [(r["doc_id"], bytes(r["payload"])) for r in pay.collect()]
    assert got == {i: _dhash_py(p) for i, p in rows}


def test_image_dedup_differential_sf0001(spark):
    pay = _payloads(spark, SF_DIR)
    rows = [(r["doc_id"], bytes(r["payload"])) for r in pay.collect()]
    got = sorted(
        (r["doc_id"], r["phash"])
        for r in image_dedup_frame(pay).collect()
    )
    assert got == image_dedup_oracle(rows)


def test_image_dedup_near_pairs_with_crafted_pixels(spark):
    """72-byte payloads resize to themselves under the fake path, so
    pixels are controlled exactly: a gradient row pattern, a 1-pixel
    flip of it (hamming <= 2), a clone, and an inverted pattern
    (far). Oracle-checked AND hand-checked."""
    base = bytes(
        [(16 * (c % 2) + r) % 256 for r in range(8) for c in range(9)]
    )
    near = bytearray(base)
    near[4] = 255  # flip one comparison in row 0
    far = bytes(255 - b for b in base)
    rows = [
        (0, base),
        (1, bytes(near)),
        (2, base),  # exact clone of 0
        (3, far),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = sorted(
        (r["doc_id"], r["phash"])
        for r in image_dedup_frame(df).collect()
    )
    want = image_dedup_oracle(rows)
    assert got == want
    ids = [i for i, _ in got]
    assert 0 in ids and 2 not in ids  # clone collapsed
    assert 3 in ids  # inverted pattern survives
    # the 1-pixel variant must be a true near pair (exercises the
    # band join + verify, not just the exact collapse)
    h0, h1 = _dhash_py(base), _dhash_py(bytes(near))
    assert 1 <= bin((h0 ^ h1) & ((1 << 64) - 1)).count("1") <= 3
    assert 1 not in ids


def _write_payload_batches(spark, rows, out_dir, n_batches=3):
    """Id-ordered slices as separate parquet files so
    maxFilesPerTrigger=1 yields deterministic id-ordered batches."""
    rows = sorted(rows)
    per = (len(rows) + n_batches - 1) // n_batches
    for b in range(n_batches):
        chunk = rows[b * per : (b + 1) * per]
        if not chunk:
            continue
        spark.createDataFrame(
            chunk, "doc_id long, payload binary"
        ).coalesce(1).write.mode("append").parquet(out_dir)


@pytest.mark.slow
def test_image_dedup_ingest_matches_batch_twin_and_replays_clean(
    spark, tmp_path
):
    """Streaming dHash ingest == image_dedup_frame on the union of
    all batches (id-ordered arrival), on sf0.001 payloads spliced
    with the crafted near/clone/far pixel fixtures — including pairs
    that STRADDLE batch boundaries; then a full replay with a fresh
    checkpoint appends nothing to either lake."""
    import shutil

    from data_ingestor_gluejob_script_spark.streaming import (
        run_image_dedup_ingest,
    )

    pay = _payloads(spark, SF_DIR)
    rows = [
        (r["doc_id"], bytes(r["payload"])) for r in pay.collect()
    ][:120]
    base = bytes(
        [(16 * (c % 2) + r) % 256 for r in range(8) for c in range(9)]
    )
    near = bytearray(base)
    near[4] = 255
    far = bytes(255 - b for b in base)
    # ids spread far apart so the near-dup cluster straddles batches
    rows += [
        (10_000, base),
        (20_000, bytes(near)),   # near dup of 10_000, later batch
        (30_000, base),          # exact clone of 10_000, later batch
        (30_001, far),
    ]

    media = str(tmp_path / "in")
    lake = str(tmp_path / "lake")
    sigs = str(tmp_path / "sigs")
    _write_payload_batches(spark, rows, media)

    q = run_image_dedup_ingest(
        spark, media, lake, sigs, str(tmp_path / "ck1")
    )
    q.awaitTermination(300)

    got = sorted(r["doc_id"] for r in spark.read.parquet(lake).collect())
    df_all = spark.createDataFrame(rows, "doc_id long, payload binary")
    want = sorted(
        r["doc_id"] for r in image_dedup_frame(df_all).collect()
    )
    assert got == want
    assert 10_000 in got and 20_000 not in got and 30_000 not in got
    assert 30_001 in got
    # signature lake: one row per distinct payload, hashes populated
    sig_rows = spark.read.parquet(sigs).collect()
    assert len(sig_rows) == len({p for _, p in rows})
    assert all(r["phash"] is not None for r in sig_rows)
    # cross-check the ledger against the python twin
    twin = {r["doc_id"]: r["phash"] for r in sig_rows}
    by_payload = {}
    for i, p in sorted(rows):
        by_payload.setdefault(p, i)
    for p, i in by_payload.items():
        assert twin[i] == _dhash_py(p)

    # full replay, fresh checkpoint: ledger absorbs everything
    q2 = run_image_dedup_ingest(
        spark, media, lake, sigs, str(tmp_path / "ck2")
    )
    q2.awaitTermination(300)
    assert (
        sorted(r["doc_id"] for r in spark.read.parquet(lake).collect())
        == want
    )
    assert spark.read.parquet(sigs).count() == len(sig_rows)
    shutil.rmtree(str(tmp_path / "ck1"), ignore_errors=True)


@pytest.mark.slow
def test_image_dedup_ingest_null_id_image_still_guards_neardups(
    spark, tmp_path
):
    """Review finding: the phash was joined back on the id, so a
    NULL-id image persisted a NULL phash into the ledger and its
    future near-dups were silently exempt from dedup. The hash is now
    keyed on payload_md5 — a NULL-id image's signature lands in the
    state, and a near-dup arriving in a LATER batch is dropped."""
    from data_ingestor_gluejob_script_spark.streaming import (
        run_image_dedup_ingest,
    )

    base = bytes(
        [(16 * (c % 2) + r) % 256 for r in range(8) for c in range(9)]
    )
    near = bytearray(base)
    near[4] = 255
    media = str(tmp_path / "in")
    # batch 1: the null-id image; batch 2: its near-dup + a far image
    spark.createDataFrame(
        [(None, base)], "doc_id long, payload binary"
    ).coalesce(1).write.mode("append").parquet(media)
    spark.createDataFrame(
        [(7, bytes(near)), (8, bytes(255 - b for b in base))],
        "doc_id long, payload binary",
    ).coalesce(1).write.mode("append").parquet(media)

    q = run_image_dedup_ingest(
        spark, media, str(tmp_path / "lake"), str(tmp_path / "sigs"),
        str(tmp_path / "ck")
    )
    q.awaitTermination(300)

    sig_rows = spark.read.parquet(str(tmp_path / "sigs")).collect()
    assert all(r["phash"] is not None for r in sig_rows)  # incl. null id
    lake_ids = sorted(
        (r["doc_id"] is None, r["doc_id"])
        for r in spark.read.parquet(str(tmp_path / "lake")).collect()
    )
    # null-id original retained; its near-dup (7) dropped; far (8) kept
    assert lake_ids == [(False, 8), (True, None)]


def test_image_dedup_ingest_corrupt_sig_lake_aborts_batch(spark, tmp_path):
    """A signature-lake read failure that is NOT path-not-found must
    abort the micro-batch (same contract as the doc-dedup twin):
    treating a corrupt footer as 'first batch, no state yet' would
    skip the ledger anti-join and double-ingest on replay."""
    import os

    from pyspark.errors import StreamingQueryException

    from data_ingestor_gluejob_script_spark.streaming import (
        run_image_dedup_ingest,
    )

    base = bytes(range(72))
    media = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, base)], "doc_id long, payload binary"
    ).coalesce(1).write.parquet(media)
    sigs = tmp_path / "sigs"
    sigs.mkdir()
    (sigs / "part-00000.parquet").write_bytes(b"this is not parquet")

    q = run_image_dedup_ingest(
        spark, media, str(tmp_path / "lake"), str(sigs),
        str(tmp_path / "ck")
    )
    try:
        q.awaitTermination(120)
        failed = q.exception() is not None
    except StreamingQueryException:
        failed = True
    assert failed, "corrupt sig lake must abort the batch, not skip dedup"
    # nothing was appended on top of the corrupt state
    leftover = [
        f
        for f in os.listdir(sigs)
        if not f.startswith(("part-00000", "."))
    ]
    assert leftover == []


@pytest.mark.slow
def test_image_dedup_ingest_null_id_neardup_arriving_later_is_dropped(
    spark, tmp_path
):
    """Second review finding (live-repro'd): the drop set was keyed on
    the id, and a left_anti equi-join can never drop a NULL-key row —
    so a NULL-id near-duplicate of an already-ingested image was
    retained. The drop set is now keyed on payload_md5 and the
    precedence predicate is null-aware."""
    from data_ingestor_gluejob_script_spark.streaming import (
        run_image_dedup_ingest,
    )

    base = bytes(
        [(16 * (c % 2) + r) % 256 for r in range(8) for c in range(9)]
    )
    near = bytearray(base)
    near[4] = 255
    media = str(tmp_path / "in")
    # batch 1: the original with a real id; batch 2: a NULL-id near-dup
    spark.createDataFrame(
        [(1, base)], "doc_id long, payload binary"
    ).coalesce(1).write.mode("append").parquet(media)
    spark.createDataFrame(
        [(None, bytes(near))], "doc_id long, payload binary"
    ).coalesce(1).write.mode("append").parquet(media)

    q = run_image_dedup_ingest(
        spark, media, str(tmp_path / "lake"), str(tmp_path / "sigs"),
        str(tmp_path / "ck")
    )
    q.awaitTermination(300)
    lake = spark.read.parquet(str(tmp_path / "lake")).collect()
    assert [r["doc_id"] for r in lake] == [1]  # null-id near-dup dropped
    # and the dropped image's hash is still ledgered
    assert spark.read.parquet(str(tmp_path / "sigs")).count() == 2

    # in-BATCH mixed null/non-null ids: non-null beats null
    media2 = str(tmp_path / "in2")
    spark.createDataFrame(
        [(None, base), (5, bytes(near))], "doc_id long, payload binary"
    ).coalesce(1).write.parquet(media2)
    q2 = run_image_dedup_ingest(
        spark, media2, str(tmp_path / "lake2"), str(tmp_path / "sigs2"),
        str(tmp_path / "ck2")
    )
    q2.awaitTermination(300)
    lake2 = spark.read.parquet(str(tmp_path / "lake2")).collect()
    assert [r["doc_id"] for r in lake2] == [5]


@pytest.mark.slow
def test_image_ingest_rebuilds_band_lake_on_max_hamming_change(
    spark, tmp_path
):
    """Advice r14: band slice widths depend on max_hamming, so a run
    with a different value against an existing band lake silently
    missed every near-dup (wrong-width slices never equi-join). The
    parameter is now persisted as a _BANDING_mh<k> marker and a
    mismatch auto-rebuilds the lake with the current banding: a
    near-dup at hamming ~5 — invisible under the old mh2 banding —
    must be dropped by the mh8 run."""
    from data_ingestor_gluejob_script_spark.streaming import (
        _banding_tag_of,
        run_image_dedup_ingest,
    )

    base = bytes(
        [(16 * (c % 2) + r) % 256 for r in range(8) for c in range(9)]
    )
    mid = bytearray(base)
    for pos in (4, 13, 22, 31):  # one pixel in each of rows 0-3
        mid[pos] = 255
    d = bin(
        (_dhash_py(base) ^ _dhash_py(bytes(mid))) & ((1 << 64) - 1)
    ).count("1")
    assert 2 < d <= 8, d  # true mid-range pair: invisible at mh2

    media = str(tmp_path / "in")
    lake, sigs = str(tmp_path / "lake"), str(tmp_path / "sigs")
    band_dir = sigs + "_bands"
    spark.createDataFrame(
        [(1, base)], "doc_id long, payload binary"
    ).coalesce(1).write.mode("append").parquet(media)
    run_image_dedup_ingest(
        spark, media, lake, sigs, str(tmp_path / "ck1"), max_hamming=2
    ).awaitTermination(300)
    assert _banding_tag_of(spark, band_dir) == "mh2"

    # second run, wider radius, SAME sig/band lakes: the mid-range
    # variant arrives and must be caught by the rebuilt banding
    spark.createDataFrame(
        [(2, bytes(mid))], "doc_id long, payload binary"
    ).coalesce(1).write.mode("append").parquet(media)
    run_image_dedup_ingest(
        spark, media, lake, sigs, str(tmp_path / "ck2"), max_hamming=8
    ).awaitTermination(300)
    assert _banding_tag_of(spark, band_dir) == "mh8"
    lake_ids = sorted(
        r["doc_id"] for r in spark.read.parquet(lake).collect()
    )
    assert lake_ids == [1], lake_ids  # near-dup (2) dropped, not missed
