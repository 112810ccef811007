"""CLI entry point: the reference's job-parameter surface end-to-end."""

from __future__ import annotations

import json
import os

from data_ingestor_gluejob_script_spark.__main__ import main
from data_ingestor_gluejob_script_spark.registry import CATALOG

SUBS = CATALOG["retail_subscriptions"]


def _write_csv(dirpath, spec, rows):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, f"{spec.name}.csv"), "w") as f:
        f.write(";".join(spec.columns) + "\n")
        for r in rows:
            full = {c: f"x_{c}" for c in spec.columns} | r
            f.write(";".join(full[c] for c in spec.columns) + "\n")


def test_cli_initial_load_single_table(spark, tmp_path, capsys):
    src = str(tmp_path / "load")
    _write_csv(f"{src}/corleone", SUBS, [
        {"id": "s1", "created_at": "2024-01-10 10:00:00",
         "updated_at": "2024-01-10 10:00:00"},
    ])
    rc = main([
        "--trigger-origin", "OnDemand",
        "--job-mode", "retail_subscriptions",
        "--source-root", src,
        "--lake-root", str(tmp_path / "lake"),
        "--watermark-path", str(tmp_path / "wm.json"),
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["flow"] == "initial_load"
    assert out["tables"] == {"retail_subscriptions": 1}
    assert os.path.isdir(
        f"{tmp_path}/lake/raw/locaweb/retail_subscriptions/company=Locaweb"
    )


def test_cli_unmapped_trigger_noop(spark, tmp_path, capsys):
    rc = main([
        "--trigger-origin", "Mystery",
        "--job-mode", "allTables",
        "--source-root", str(tmp_path),
        "--lake-root", str(tmp_path / "lake"),
        "--watermark-path", str(tmp_path / "wm.json"),
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["flow"] == "no-op"
    assert not os.path.exists(f"{tmp_path}/lake/raw")
