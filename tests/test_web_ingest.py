"""Streaming web-curation ingest (streaming.run_web_curation_ingest,
round-11 fourth wave): stream == batch twin over the shared
curate_page_maps chain, replay idempotence via the lake digest
ledger, and the C4-before-ledger property (dropped pages leave no
state)."""

from __future__ import annotations

import time as _time

import pandas as pd

from data_ingestor_gluejob_script_spark import streaming
from data_ingestor_gluejob_script_spark.queries.webpipeline import (
    curate_pages,
)


def _page(title: str, paras: list[str]) -> str:
    body = "".join(f"<p>{p}</p>" for p in paras)
    return (
        f"<html><head><title>{title}</title><style>p{{x:1}}</style>"
        f"</head><body>{body}<script>var a=1;</script></body></html>"
    )


def _batches():
    a = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "url": [f"http://x.example/{i}" for i in (1, 2, 3)],
            "html": [
                _page("One", ["Alpha beta gamma delta."]),
                _page("Two", ["Epsilon zeta eta theta iota."]),
                _page("Nav", ["nav nav"]),  # dies at C4
            ],
        }
    )
    b = pd.DataFrame(
        {
            "doc_id": [10, 11, 12],
            "url": [f"http://x.example/{i}" for i in (10, 11, 12)],
            "html": [
                # same prose as doc 1, different chrome: must dedup
                _page("One dup", ["Alpha​ beta gamma delta."]),
                _page("Three", ["Kappa lambda mu nu xi."]),
                _page("Empty", []),  # dies at C4
            ],
        }
    )
    return a, b


def _write_batches(src):
    a, b = _batches()
    src.mkdir()
    a.to_parquet(src / "a.parquet")
    _time.sleep(0.05)
    b.to_parquet(src / "b.parquet")


def test_stream_equals_batch_twin_and_replay(spark, tmp_path):
    src = tmp_path / "incoming"
    _write_batches(src)
    lake = str(tmp_path / "lake")
    q = streaming.run_web_curation_ingest(
        spark, str(src), lake, str(tmp_path / "ckpt1"),
        min_line_words=3, min_kept_lines=1,
    )
    q.awaitTermination(120)

    got = spark.read.parquet(lake)
    rows = {r.doc_id: r for r in got.collect()}
    # 3 and 12 die at C4; 10 dedups against 1 (zero-width space page)
    assert set(rows) == {1, 2, 11}
    assert rows[1].text == "Alpha beta gamma delta."
    assert rows[1].title == "One"
    assert rows[1].n_tokens == 4
    assert rows[11].text == "Kappa lambda mu nu xi."
    # streamed lake == batch twin over the same pages (same columns
    # modulo the persisted digest; file order feeds batch A first, so
    # first-arrival == min-doc_id here)
    pages = spark.read.parquet(str(src))
    batch = {
        r.doc_id: r
        for r in curate_pages(
            pages, min_line_words=3, min_kept_lines=1
        ).collect()
    }
    assert set(batch) == set(rows)
    for i in rows:
        assert (rows[i].url, rows[i].title, rows[i].text,
                rows[i].n_tokens) == (
            batch[i].url, batch[i].title, batch[i].text,
            batch[i].n_tokens,
        )

    # replay with a fresh checkpoint: ledger absorbs everything
    q2 = streaming.run_web_curation_ingest(
        spark, str(src), lake, str(tmp_path / "ckpt2"),
        min_line_words=3, min_kept_lines=1,
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(lake).count() == 3


def test_c4_dropped_pages_leave_no_ledger_state(spark, tmp_path):
    """A page that fails curation must not ledger its digest: if its
    PROSE later appears on a surviving page, that page is fresh."""
    src = tmp_path / "incoming"
    src.mkdir()
    pd.DataFrame(
        {
            "doc_id": [1],
            "url": ["http://x.example/1"],
            # the prose line passes, but the page has a brace in
            # visible text -> page dropped at the C4 page rule
            "html": [_page("Braced", ["Good prose line here.", "x { y"])],
        }
    ).to_parquet(src / "a.parquet")
    lake = str(tmp_path / "lake")
    q = streaming.run_web_curation_ingest(
        spark, str(src), lake, str(tmp_path / "c1"),
        min_line_words=3, min_kept_lines=1,
    )
    q.awaitTermination(120)
    # the sink appends an EMPTY frame (directory exists, zero rows,
    # zero ledgered digests)
    assert spark.read.parquet(lake).count() == 0

    _time.sleep(0.05)
    pd.DataFrame(
        {
            "doc_id": [2],
            "url": ["http://x.example/2"],
            "html": [_page("Clean", ["Good prose line here."])],
        }
    ).to_parquet(src / "b.parquet")
    q2 = streaming.run_web_curation_ingest(
        spark, str(src), lake, str(tmp_path / "c2"),
        min_line_words=3, min_kept_lines=1,
    )
    q2.awaitTermination(120)
    got = spark.read.parquet(lake).collect()
    assert [r.doc_id for r in got] == [2]
    assert got[0].text == "Good prose line here."