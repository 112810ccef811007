"""Z-order layout: Morton key correctness vs a Python bit-interleave
reference, and the property the layout exists for — a Z-ordered write
produces files whose per-file min/max span a small fraction of each
layout column's range (what parquet row-group pruning keys off),
while an unsorted write's files each span ~the whole range.
"""

from __future__ import annotations

import glob
import sys
from pathlib import Path

import pyarrow.parquet as pq
import pyspark.sql.functions as F
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_ingestor_gluejob_script_spark.operators.layout import (  # noqa: E402
    morton_key,
    zorder_layout,
)
from data_ingestor_gluejob_script_spark.queries._util import load  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def _py_morton(vals: list[int], bits: int) -> int:
    out = 0
    for b in range(bits):
        for j, v in enumerate(vals):
            out |= ((v >> b) & 1) << (b * len(vals) + j)
    return out


def test_morton_key_matches_reference(spark):
    rows = [(a, b) for a in [0, 1, 5, 255, 170] for b in [0, 3, 128, 255]]
    df = spark.createDataFrame(rows, "a long, b long")
    got = df.select(
        "a", "b", morton_key([F.col("a"), F.col("b")], 8).alias("z")
    ).collect()
    for r in got:
        assert r.z == _py_morton([r.a, r.b], 8), (r.a, r.b)


def test_morton_key_guards():
    with pytest.raises(ValueError):
        morton_key([], 8)
    with pytest.raises(ValueError):
        morton_key([F.col("a"), F.col("b")], 32)  # 64 bits > 62


def _file_spans(path_glob: str, col: str) -> list[float]:
    """Per-file (max-min) of ``col`` from parquet footer stats alone —
    exactly the information pruning uses."""
    spans = []
    for f in glob.glob(path_glob):
        meta = pq.ParquetFile(f).metadata
        idx = meta.schema.names.index(col)
        mins, maxs = [], []
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        spans.append(float(max(maxs) - min(mins)))
    return spans


def test_zorder_write_shrinks_file_spans(spark, tmp_path):
    """Each Z-ordered file must cover a small window of BOTH layout
    columns; an unsorted multi-file write covers ~the full range in
    every file. This is the pruning win, measured from the same footer
    stats the reader prunes with."""
    ev = load(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    zdir, udir = str(tmp_path / "z"), str(tmp_path / "u")
    zorder_layout(ev, ["user_id", "event_id"], bits=10, files=16).write.parquet(zdir)
    ev.repartition(16).write.parquet(udir)

    for col in ("user_id", "event_id"):
        full = ev.agg(
            (F.max(col) - F.min(col)).cast("double")
        ).collect()[0][0]
        z_spans = _file_spans(f"{zdir}/part-*.parquet", col)
        u_spans = _file_spans(f"{udir}/part-*.parquet", col)
        assert len(z_spans) > 4
        z_avg = sum(z_spans) / len(z_spans) / full
        u_avg = sum(u_spans) / len(u_spans) / full
        # unsorted files each span ~the whole range; z-ordered files a
        # fraction of it, on every layout dimension simultaneously
        assert u_avg > 0.9, (col, u_avg)
        assert z_avg < 0.6, (col, z_avg)
        assert z_avg < u_avg / 1.5


def test_zorder_preserves_rows(spark, tmp_path):
    ev = load(spark, SF_DIR, "events")
    out = zorder_layout(ev, ["user_id", "ts"], bits=8, files=4)
    assert out.columns == ev.columns
    assert out.count() == ev.count()
    # temporal layout column exercised the epoch path; constant column
    # degrades gracefully
    const = zorder_layout(
        ev.withColumn("k", F.lit(7)), ["k", "user_id"], bits=8, files=4
    )
    assert const.count() == ev.count()


def test_morton_key_property(spark):
    """Hypothesis fuzz vs the Python interleave reference, plus the
    defining monotonicity: the key restricted to one dimension (other
    held fixed) is strictly increasing."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        pairs=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=2**12 - 1),
                st.integers(min_value=0, max_value=2**12 - 1),
            ),
            min_size=1,
            max_size=20,
        )
    )
    def inner(pairs):
        df = spark.createDataFrame(pairs, "a long, b long")
        got = df.select(
            "a", "b", morton_key([F.col("a"), F.col("b")], 12).alias("z")
        ).collect()
        for r in got:
            assert r.z == _py_morton([r.a, r.b], 12)

    inner()
    # monotone in each dimension
    vals = [0, 1, 7, 100, 4095]
    df = spark.createDataFrame([(v,) for v in vals], "a long")
    keyed = df.select(
        "a", morton_key([F.col("a"), F.lit(9)], 12).alias("z")
    ).orderBy("a").collect()
    zs = [r.z for r in keyed]
    assert zs == sorted(zs) and len(set(zs)) == len(zs)
