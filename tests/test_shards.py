"""Training-shard export: round-trip contracts on real packed data —
row conservation, per-file record bound, contiguous non-overlapping
key intervals, manifest/file agreement, and range-pruned read-back —
plus the quarantine split (every row lands on exactly one side with
the right diagnosis).
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyspark.sql.functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_ingestor_gluejob_script_spark.queries._util import load  # noqa: E402
from data_ingestor_gluejob_script_spark.queries.audit import (  # noqa: E402
    accepted_values,
    flag_violations,
    not_null,
    split_quarantine,
    unique_key,
)
from data_ingestor_gluejob_script_spark.queries.traindata import (  # noqa: E402
    seq_pack_frame,
)
from data_ingestor_gluejob_script_spark.shards import (  # noqa: E402
    read_training_shards,
    write_training_shards,
)

SF_DIR = "/root/testdata/sf0.001"


def _packed(spark):
    return seq_pack_frame(load(spark, SF_DIR, "documents"))


def test_shard_roundtrip_contracts(spark, tmp_path):
    out = str(tmp_path / "export")
    packed = _packed(spark)
    manifest = write_training_shards(
        packed, out, shard_key="pack_id",
        max_records_per_file=200, token_col="n_tokens",
    )
    rows = manifest.collect()
    assert len(rows) > 1, "max_records must force multiple files"
    # conservation: manifest row/token totals equal the input's
    assert sum(r.n_rows for r in rows) == packed.count()
    assert sum(r.n_tokens for r in rows) == (
        packed.agg(F.sum("n_tokens")).collect()[0][0]
    )
    # every file respects the record bound
    assert all(r.n_rows <= 200 for r in rows)
    # contiguous tiling: ordered by min_key, intervals only touch at
    # equal boundary keys (a pack can straddle two files)
    ordered = sorted(rows, key=lambda r: (r.min_key, r.shard))
    for prev, cur in zip(ordered, ordered[1:]):
        assert prev.min_key <= prev.max_key
        assert cur.min_key >= prev.max_key
    # read-back equals the input frame
    back = read_training_shards(spark, out)
    assert back.count() == packed.count()
    assert sorted(back.columns) == sorted(packed.columns)
    a = {tuple(r) for r in packed.select("doc_id", "pack_id").collect()}
    b = {tuple(r) for r in back.select("doc_id", "pack_id").collect()}
    assert a == b


def test_shard_range_pruned_read(spark, tmp_path):
    out = str(tmp_path / "export")
    packed = _packed(spark)
    write_training_shards(
        packed, out, shard_key="pack_id", max_records_per_file=200
    )
    lo, hi = 2, 5
    got = read_training_shards(spark, out, key_range=(lo, hi))
    want = packed.filter(
        (F.col("pack_id") >= lo) & (F.col("pack_id") < hi)
    )
    assert got.count() == want.count() > 0
    # the range predicate must reach the scan (footer-stats pruning)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "pack_id" in plan


def test_quarantine_split_partitions_input(spark):
    checks = [
        not_null("o_custkey"),
        accepted_values("o_orderstatus", ["O", "F", "P"]),
    ]
    rows = [
        (1, 10, "O"),
        (2, None, "O"),
        (3, 11, "X"),
        (4, None, "X"),
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string"
    )
    clean, bad = split_quarantine(df, checks)
    assert {r.o_orderkey for r in clean.collect()} == {1}
    diag = {r.o_orderkey: sorted(r._violations) for r in bad.collect()}
    assert diag == {
        2: ["not_null:o_custkey"],
        3: ["accepted:o_orderstatus"],
        4: ["accepted:o_orderstatus", "not_null:o_custkey"],
    }
    assert clean.count() + bad.count() == df.count()
    # clean side comes back with the original schema
    assert clean.columns == df.columns


def test_flag_violations_rejects_aggregated_checks(spark):
    df = spark.createDataFrame([(1,)], "o_orderkey long")
    try:
        flag_violations(df, [unique_key("o_orderkey")])
    except ValueError as e:
        assert "unique:o_orderkey" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_quarantine_clean_corpus_is_noop(spark):
    orders = load(spark, SF_DIR, "orders")
    clean, bad = split_quarantine(
        orders,
        [not_null("o_custkey"), accepted_values("o_orderstatus", ["O", "F", "P"])],
    )
    assert bad.count() == 0
    assert clean.count() == orders.count()


def test_jsonl_shard_export_roundtrip(spark, tmp_path):
    import glob
    import os

    from data_ingestor_gluejob_script_spark.shards import (
        select_shard_paths,
    )

    out = str(tmp_path / "jsonl_export")
    packed = _packed(spark)
    manifest = write_training_shards(
        packed, out, shard_key="pack_id",
        max_records_per_file=200, token_col="n_tokens", fmt="jsonl",
    )
    rows = manifest.collect()
    assert len(rows) > 1
    # gzip-compressed json-lines files on disk
    files = glob.glob(os.path.join(out, "shards", "*.json.gz"))
    assert len(files) == len(rows)
    # conservation + record bound, via the manifest
    assert sum(r.n_rows for r in rows) == packed.count()
    assert all(r.n_rows <= 200 for r in rows)
    # full read-back equals the input frame (schema declared, no infer)
    back = read_training_shards(
        spark, out, fmt="jsonl", schema=packed.schema
    )
    assert back.count() == packed.count()
    a = {tuple(r) for r in packed.select("doc_id", "pack_id").collect()}
    b = {tuple(r) for r in back.select("doc_id", "pack_id").collect()}
    assert a == b
    # manifest-driven pruning: a 1-key range opens only overlapping files
    lo = rows[0].min_key
    sel = select_shard_paths(spark, out, (lo, lo + 1))
    assert 1 <= len(sel) < len(rows)
    pruned = read_training_shards(
        spark, out, key_range=(lo, lo + 1), fmt="jsonl",
        schema=packed.schema,
    )
    expect = packed.filter(
        (F.col("pack_id") >= lo) & (F.col("pack_id") < lo + 1)
    ).count()
    assert pruned.count() == expect
    # empty overlap -> empty frame, no file opens
    hi = max(r.max_key for r in rows)
    assert select_shard_paths(spark, out, (hi + 10, hi + 20)) == []
    empty = read_training_shards(
        spark, out, key_range=(hi + 10, hi + 20), fmt="jsonl",
        schema=packed.schema,
    )
    assert empty.count() == 0


def test_shard_export_rejects_unknown_format(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError):
        write_training_shards(
            _packed(spark), str(tmp_path / "x"), fmt="avro"
        )
