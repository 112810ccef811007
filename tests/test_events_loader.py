"""Contract test for the events loader: both physical ts encodings the
driver's testdata generator has shipped (TIMESTAMP(NANOS) and
timestamp[us] / TIMESTAMP_NTZ) must decode to the SAME session-UTC
TimestampType values. A testdata regeneration changing the encoding
must never flip the events query family red again (round-6 regression:
a stale ns→µs shim applied to µs data collapsed 30 days into ~43 min
of 1970-01-20).
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_ingestor_gluejob_script_spark.queries._util import read_events
from data_ingestor_gluejob_script_spark.streaming import read_events_stream

# Deliberately includes a non-zero microsecond digit so truncation vs
# rounding mistakes surface, and a range wide enough that a unit mix-up
# (ns read as µs or vice versa) collapses/explodes it detectably.
_TS = [
    dt.datetime(2024, 1, 1, 0, 0, 7, 123456),
    dt.datetime(2024, 1, 15, 12, 30, 0, 1),
    dt.datetime(2024, 1, 30, 23, 57, 12, 999999),
]


def _write_events(path: str, unit: str) -> None:
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(_TS, pa.timestamp(unit)),
            "user_id": pa.array([10, 20, 30], pa.int64()),
            "event_type": pa.array(["view", "click", "purchase"]),
            "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
            "props": pa.array(['{"a":1}', "{}", "{}"]),
        }
    )
    # version 2.6 preserves nanos; older versions silently coerce to µs.
    pq.write_table(table, path, version="2.6")


@pytest.fixture(scope="module", params=["ns", "us"])
def events_file(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"events-{request.param}")
    path = str(d / "events.parquet")
    _write_events(path, request.param)
    # Sanity: the fixture really wrote the encoding it claims.
    assert pq.read_schema(path).field("ts").type == pa.timestamp(request.param)
    return path


def test_read_events_normalizes_ts(spark, events_file):
    df = read_events(spark, events_file)
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = [r.ts for r in df.orderBy("event_id").select("ts").collect()]
    assert got == _TS


def test_read_events_missing_path_raises_path_error(spark, tmp_path):
    """A nonexistent events path must raise the path error immediately
    — the NANOS fallback read must not swallow it into a confusing
    schema mismatch downstream (r7 watch item)."""
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException) as exc:
        read_events(spark, str(tmp_path / "no_such_events.parquet"))
    assert "PATH_NOT_FOUND" in str(exc.value)


def test_spread_is_noop_for_presplit_input(spark):
    """spread() must not inject a shuffle when the input already
    supplies enough partitions (r7 verdict item #4): at scale inputs
    arrive in many splits and an unconditional repartition is a full
    corpus shuffle for nothing."""
    from data_ingestor_gluejob_script_spark.queries._util import spread

    par = spark.sparkContext.defaultParallelism
    presplit = spark.range(1000).repartition(par)
    assert spread(spark, presplit) is presplit  # no-op, same object
    single = spark.range(1000).coalesce(1)
    out = spread(spark, single)
    assert out is not single
    assert out.rdd.getNumPartitions() == par


def test_read_events_stream_normalizes_ts(spark, events_file, tmp_path):
    stream = read_events_stream(spark, events_file)
    assert dict(stream.dtypes)["ts"] == "timestamp"
    # Watermarking must accept the normalized column (NTZ would throw
    # EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE at analysis time).
    wm = stream.withWatermark("ts", "1 hour")
    q = (
        wm.writeStream.format("memory")
        .queryName(f"events_contract_{os.path.basename(os.path.dirname(events_file))}".replace("-", "_").replace(".", "_"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    got = [
        r.ts
        for r in spark.sql(f"select ts from {q.name} order by ts").collect()  # noqa: S608
    ]
    assert got == _TS
