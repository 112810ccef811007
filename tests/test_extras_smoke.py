"""Execution smoke over the benched unregistered suite: every
queries/extras.py entry must RUN (not just plan) at sf0.001. The plan
sweep in test_plans.py catches analysis-time breakage (unresolved
columns, bad joins); this catches runtime-only failures (ANSI casts,
HOF edge cases, empty-frame degeneracies) locally under `make check`
instead of as a -1.0 in the next round's bench artifact.
"""

from __future__ import annotations

from data_ingestor_gluejob_script_spark.queries.extras import extras
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.slow
def test_every_extras_entry_executes(spark):
    failures = {}
    for name, fn in sorted(extras().items()):
        try:
            n = fn(spark, SF).limit(5).count()
            assert n >= 0
        except Exception as ex:  # noqa: BLE001 — collect all, report once
            failures[name] = f"{type(ex).__name__}: {ex}"
    assert not failures, failures
