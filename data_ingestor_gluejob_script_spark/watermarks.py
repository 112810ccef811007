"""WatermarkStore — the reference's incremental-extraction protocol
(SURVEY.md §3.2) behind a pluggable persistence interface.

Protocol, preserved exactly from the reference:
1. **t0 before read** — the next watermark value is a clock captured
   *before* any extraction starts (gluejob.py:616), so rows committed
   during the run land in the next window instead of being skipped.
2. **advance on success** — each table's watermark advances in memory
   only after its write succeeds (gluejob.py:136-139,161).
3. **commit at end** — one persist at job end (gluejob.py:623). A crash
   mid-run leaves every watermark unchanged → the next run re-extracts
   the whole window → the idempotent upsert sink (operators/upsert.py)
   dedups. ``>=`` predicates + t0-before-read = at-least-once delivery.
4. **default = yesterday midnight** for unseen tables
   (gluejob.py:85-101): ``floor_to_midnight(now) - 1 day``.

The reference persists to SSM Parameter Store as a JSON dict
``{table: 'YYYY-MM-DD HH:MM:SS'}`` (gluejob.py:103-134); here the
default backend is a local JSON file (same dict shape), and the
interface is the seam where an SSM/DynamoDB/JDBC-backed store plugs in
on a real deployment.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timedelta, timezone

WATERMARK_FORMAT = "%Y-%m-%d %H:%M:%S"  # second precision (gluejob.py:81,87)


def default_watermark(now: datetime | None = None) -> str:
    """Yesterday midnight, second precision (gluejob.py:78-87)."""
    now = now or datetime.now(timezone.utc)
    midnight = now.replace(hour=0, minute=0, second=0, microsecond=0)
    return (midnight - timedelta(days=1)).strftime(WATERMARK_FORMAT)


class WatermarkStore:
    """JSON-file-backed watermark dict with the §3.2 commit protocol."""

    def __init__(self, path: str, tables: list[str], now: datetime | None = None):
        self._path = path
        self._default = default_watermark(now)
        persisted: dict[str, str] = {}
        if os.path.exists(path):
            with open(path) as f:
                persisted = json.load(f)
        # Same shape as the reference's date_object (gluejob.py:89-118):
        # every known table gets a value, defaulting to yesterday midnight.
        self._committed = {t: persisted.get(t, self._default) for t in tables}
        self._pending = dict(self._committed)

    def get(self, table: str) -> str:
        """Watermark used to build the incremental predicate (F1)."""
        return self._committed.get(table, self._default)

    def advance(self, table: str, t0: str) -> None:
        """In-memory advance after a successful table write
        (gluejob.py:136-139). Not visible to ``get`` and not persisted
        until ``commit`` — a crash loses nothing."""
        self._pending[table] = t0

    def commit(self) -> None:
        """Single atomic persist at job end (gluejob.py:120-134,623).

        Merges over whatever the file holds NOW rather than rewriting
        it with only this store's tables: a store constructed for a
        subset (a single-table run) must not erase the other tables'
        persisted watermarks — losing a watermark silently resets that
        table to the yesterday-midnight default and skips every older
        change. The reference re-persists its whole dict wholesale
        (gluejob.py:120-134), which has the same preserving effect."""
        on_disk: dict[str, str] = {}
        if os.path.exists(self._path):
            with open(self._path) as f:
                on_disk = json.load(f)
        merged = {**on_disk, **self._pending}
        tmp = self._path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(merged, f, indent=2, sort_keys=True)
        os.replace(tmp, self._path)
        self._committed = dict(self._pending)

    def snapshot(self) -> dict[str, str]:
        return dict(self._committed)
