"""WatermarkStore protocol tests (SURVEY.md §3.2): yesterday-midnight
default, advance-invisible-until-commit, crash semantics."""

from __future__ import annotations

import json
from datetime import datetime

from data_ingestor_gluejob_script_spark.watermarks import (
    WatermarkStore,
    default_watermark,
)


def test_default_is_yesterday_midnight():
    # gluejob.py:78-87: floor-to-midnight minus one day, second precision.
    now = datetime(2024, 5, 15, 13, 45, 59)
    assert default_watermark(now) == "2024-05-14 00:00:00"


def test_unseen_table_gets_default(tmp_path):
    store = WatermarkStore(
        str(tmp_path / "wm.json"), ["t1"], now=datetime(2024, 5, 15, 8)
    )
    assert store.get("t1") == "2024-05-14 00:00:00"


def test_advance_not_visible_until_commit(tmp_path):
    path = str(tmp_path / "wm.json")
    store = WatermarkStore(path, ["t1"], now=datetime(2024, 5, 15))
    store.advance("t1", "2024-05-15 04:00:00")
    # gluejob.py:136-139 — in-memory only; get() still serves committed.
    assert store.get("t1") == "2024-05-14 00:00:00"
    store.commit()
    assert store.get("t1") == "2024-05-15 04:00:00"
    assert json.load(open(path))["t1"] == "2024-05-15 04:00:00"


def test_crash_before_commit_loses_nothing(tmp_path):
    path = str(tmp_path / "wm.json")
    s1 = WatermarkStore(path, ["t1"], now=datetime(2024, 5, 15))
    s1.advance("t1", "2024-05-15 04:00:00")
    del s1  # no commit — crash
    s2 = WatermarkStore(path, ["t1"], now=datetime(2024, 5, 16))
    # Nothing persisted: t1 falls back to (the new) default.
    assert s2.get("t1") == "2024-05-15 00:00:00"


def test_commit_preserves_tables_outside_this_store(tmp_path):
    """A store constructed for a SUBSET of tables must not erase other
    tables' persisted watermarks on commit — losing one silently
    resets that table to the yesterday-midnight default and skips
    every older change on its next run."""
    import json

    path = str(tmp_path / "wm.json")
    with open(path, "w") as f:
        json.dump({"other_table": "2024-03-03 03:03:03"}, f)
    store = WatermarkStore(path, ["retail_orders"])
    store.advance("retail_orders", "2024-05-05 05:05:05")
    store.commit()
    with open(path) as f:
        persisted = json.load(f)
    assert persisted["other_table"] == "2024-03-03 03:03:03"
    assert persisted["retail_orders"] == "2024-05-05 05:05:05"


def test_commit_roundtrip_across_instances(tmp_path):
    path = str(tmp_path / "wm.json")
    s1 = WatermarkStore(path, ["t1", "t2"], now=datetime(2024, 5, 15))
    s1.advance("t1", "2024-05-15 04:00:00")
    s1.commit()
    s2 = WatermarkStore(path, ["t1", "t2"], now=datetime(2024, 6, 1))
    assert s2.get("t1") == "2024-05-15 04:00:00"
    # The reference persists the WHOLE dict at commit (gluejob.py:623),
    # defaults included — so t2 serves the persisted default from the
    # first run, not a fresh one. Preserved semantics.
    assert s2.get("t2") == "2024-05-14 00:00:00"
