"""End-to-end web-crawl curation (queries/webpipeline.py, round-11
fourth wave): a crafted WARC of known pages goes through WARC parse →
HTML extract → normalize → C4 → exact dedup, and the output is
asserted against hand-computed survivors. Each stage has its own
differential suite; this pins the COMPOSITION — stage order, column
handoffs, and the normalize-before-hash property that makes dedup
catch visually-identical pages."""

from __future__ import annotations

from data_ingestor_gluejob_script_spark.queries.webpipeline import (
    curate_web_crawl,
)
from data_ingestor_gluejob_script_spark.sources.warc import build_warc


def _page(title: str, body: str) -> bytes:
    return (
        f"<html><head><title>{title}</title>"
        f"<style>p{{margin:0}}</style></head>"
        f"<body>{body}</body></html>"
    ).encode()


def _fixture() -> list[dict]:
    a_body = "<p>The quick brown fox jumps.</p><p>tiny</p>"
    # B renders identically to A: a zero-width space only
    # normalization removes, and uppercase paragraph tags only the
    # extractor's case-insensitive rules equate. Dedup must collapse
    # A/B; survivor = lexicographically lower record id.
    b_body = (
        "<P>The​ quick brown fox jumps.</P><p>tiny</p>"
    )
    return [
        {
            "warc_type": "response",
            "record_id": "<urn:p:a>",
            "target_uri": "http://x.example/a",
            "payload": _page("Page A", a_body),
            "http": True,
        },
        {
            "warc_type": "response",
            "record_id": "<urn:p:b>",
            "target_uri": "http://x.example/b",
            "payload": _page("Page A", b_body),
            "http": True,
        },
        {  # boilerplate only: no line survives the word/punct rules
            "warc_type": "response",
            "record_id": "<urn:p:c>",
            "target_uri": "http://x.example/c",
            "payload": _page(
                "Nav", "<script>var x=1;</script><div>nav nav</div>"
            ),
            "http": True,
        },
        {  # empty body
            "warc_type": "response",
            "record_id": "<urn:p:d>",
            "target_uri": "http://x.example/d",
            "payload": _page("Empty", ""),
            "http": True,
        },
        {  # unique survivor, second line dies (no terminal punct)
            "warc_type": "response",
            "record_id": "<urn:p:e>",
            "target_uri": "http://x.example/e",
            "payload": _page(
                "Page E",
                "<p>Alpha beta gamma delta epsilon.</p>"
                "<p>no terminal punct here</p>",
            ),
            "http": True,
        },
        {  # request records must never reach the corpus
            "warc_type": "request",
            "record_id": "<urn:p:req>",
            "target_uri": "http://x.example/a",
            "payload": b"GET /a HTTP/1.1\r\n",
        },
    ]


def test_curate_web_crawl_end_to_end(spark, tmp_path):
    (tmp_path / "crawl.warc.gz").write_bytes(
        build_warc(_fixture(), gz=True)
    )
    out = {
        r.doc_id: r
        for r in curate_web_crawl(
            spark, str(tmp_path), min_line_words=3, min_kept_lines=1
        ).collect()
    }
    # A/B collapse to A (lexicographically lower record id); C dies
    # at C4 (no kept line), D at empty text, req filtered at the source
    assert set(out) == {"<urn:p:a>", "<urn:p:e>"}
    a = out["<urn:p:a>"]
    assert a.url == "http://x.example/a"
    assert a.title == "Page A"
    assert a.text == "The quick brown fox jumps."
    assert a.n_tokens == 5
    e = out["<urn:p:e>"]
    assert e.text == "Alpha beta gamma delta epsilon."
    assert e.n_tokens == 5


def test_survivor_is_deterministic_under_partitioning(spark, tmp_path):
    (tmp_path / "crawl.warc").write_bytes(build_warc(_fixture()))
    ids = sorted(
        r.doc_id
        for r in curate_web_crawl(
            spark, str(tmp_path), min_line_words=3, min_kept_lines=1
        ).collect()
    )
    assert ids == ["<urn:p:a>", "<urn:p:e>"]


def test_no_cartesian_in_pipeline_plan(spark, tmp_path):
    import contextlib
    import io

    (tmp_path / "crawl.warc").write_bytes(build_warc(_fixture()))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        curate_web_crawl(spark, str(tmp_path)).explain("formatted")
    assert "CartesianProduct" not in buf.getvalue()