"""Differential tests for the URL/domain curation toolkit.

The python oracle mirrors the documented normalization policy with
urllib.parse + re, independently of the Catalyst implementation
(parse_url / HOF filter / element_at). Well-formed fixtures keep
java.net.URI and urllib in agreement; malformed-URL behavior (NULL
propagation, dedup keep-all) is pinned separately because the two
parsers legitimately disagree on garbage.
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import urlsplit

import pytest

from data_ingestor_gluejob_script_spark.queries.urlops import (
    SECOND_LEVEL_SUFFIXES,
    TRACKING_PARAM_RE,
    cap_per_domain_frame,
    domain_filter_frame,
    domain_stats_frame,
    parse_urls_frame,
    url_dedup_frame,
)

_DEFAULT_PORTS = {"http": 80, "https": 443, "ftp": 21}
_TRACK = re.compile(TRACKING_PARAM_RE)


def _oracle_norm(url: str):
    """(scheme, host, registered_domain, path, url_norm) per the
    documented policy, via urllib."""
    sp = urlsplit(url)
    scheme = sp.scheme.lower() if sp.scheme else None
    host = sp.hostname  # urlsplit lowercases
    if not host or not scheme:
        return scheme, None, None, None, None
    path = sp.path if sp.path else "/"
    kept = [
        kv
        for kv in sp.query.split("&")
        if kv != "" and not _TRACK.match(kv.lower())
    ]
    port = ""
    if sp.port is not None and sp.port != _DEFAULT_PORTS.get(scheme):
        port = f":{sp.port}"
    norm = f"{scheme}://{host}{port}{path}"
    if kept:
        norm += "?" + "&".join(kept)
    return scheme, host, _oracle_domain(host), path, norm


def _oracle_domain(host):
    if host is None or re.match(r"^\d{1,3}(\.\d{1,3}){3}$", host):
        return host
    labels = host.split(".")
    if len(labels) <= 2:
        return host
    if ".".join(labels[-2:]) in SECOND_LEVEL_SUFFIXES and len(labels) >= 3:
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])


WELL_FORMED = [
    "https://Example.COM/path/to/page",
    "HTTPS://WWW.Example.com:443/path",
    "http://example.com:80/",
    "http://example.com:8080/a",
    "https://example.com",
    "https://example.com/a?b=1&utm_source=x&c=2",
    "https://example.com/a?utm_source=x&utm_medium=y",
    "https://example.com/a?refresh=1&ref=tw",
    "https://example.com/a?gclid=123&fbclid=9&keep=yes",
    "https://example.com/a?b=2&b=1#frag",
    "https://example.com/#top",
    "https://www.bbc.co.uk/news/article",
    "https://a.b.deep.example.com/x",
    "http://sub.shop.com.au/item?id=3",
    "http://192.168.10.1/admin",
    "http://localhost:9000/health",
    "ftp://Files.example.org:21/pub",
    "https://example.com/a?a=1&&b=2",
]


@pytest.fixture(scope="module")
def parsed(spark):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(WELL_FORMED)], "doc_id long, url string"
    )
    rows = {
        r["doc_id"]: r
        for r in parse_urls_frame(df).collect()
    }
    return rows


def test_parse_normalize_differential(parsed):
    for i, u in enumerate(WELL_FORMED):
        scheme, host, dom, path, norm = _oracle_norm(u)
        r = parsed[i]
        assert r["scheme"] == scheme, u
        assert r["host"] == host, u
        assert r["registered_domain"] == dom, u
        assert r["path"] == path, u
        assert r["url_norm"] == norm, u


def test_tracking_params_policy(parsed):
    # all-tracking query drops the '?' entirely
    assert parsed[6]["url_norm"] == "https://example.com/a"
    # near-miss names survive, true trackers don't, order preserved
    assert parsed[7]["url_norm"] == "https://example.com/a?refresh=1"
    assert parsed[8]["url_norm"] == "https://example.com/a?keep=yes"
    # duplicate legit params keep their order (no reordering policy)
    assert parsed[9]["url_norm"] == "https://example.com/a?b=2&b=1"


def test_registered_domain_cases(parsed):
    assert parsed[11]["registered_domain"] == "bbc.co.uk"
    assert parsed[12]["registered_domain"] == "example.com"
    assert parsed[13]["registered_domain"] == "shop.com.au"
    assert parsed[14]["registered_domain"] == "192.168.10.1"
    assert parsed[15]["registered_domain"] == "localhost"


def test_malformed_urls_null_out(spark):
    df = spark.createDataFrame(
        [(0, "not a url"), (1, "://nohost"), (2, None)],
        "doc_id long, url string",
    )
    rows = parse_urls_frame(df).collect()
    for r in rows:
        assert r["url_norm"] is None
        assert r["registered_domain"] is None


def test_url_dedup_differential(spark):
    # variants 0-3 normalize identically; 4 differs by port; 5-6 malformed
    urls = [
        (0, "https://Example.com/a?utm_source=x"),
        (1, "https://example.com:443/a"),
        (2, "HTTPS://EXAMPLE.COM/a#frag"),
        (3, "https://example.com/a"),
        (4, "https://example.com:8443/a"),
        (5, "not a url"),
        (6, "also::bad"),
    ]
    df = spark.createDataFrame(urls, "doc_id long, url string")
    out = url_dedup_frame(df)
    kept = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    # oracle: min doc_id per oracle-norm among parseable; all malformed kept
    groups: dict[str, int] = {}
    malformed = []
    for i, u in urls:
        norm = _oracle_norm(u)[4]
        if norm is None:
            malformed.append(i)
        else:
            groups[norm] = min(groups.get(norm, i), i)
    assert kept == sorted(list(groups.values()) + malformed)
    # survivors keep the parse columns
    assert "url_norm" in out.columns and "registered_domain" in out.columns


def test_domain_stats_differential(spark):
    rows = [
        (0, "https://a.example.com/1", 100),
        (1, "https://b.example.com/2", 50),
        (2, "https://other.org/3", 30),
        (3, "https://www.bbc.co.uk/4", 20),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, n_chars long")
    got = {
        r["registered_domain"]: r
        for r in domain_stats_frame(df).collect()
    }
    assert got["example.com"]["n_docs"] == 2
    assert got["example.com"]["n_chars"] == 150
    assert got["example.com"]["doc_share"] == pytest.approx(0.5)
    assert got["example.com"]["char_share"] == pytest.approx(0.75)
    assert got["bbc.co.uk"]["n_docs"] == 1
    assert sum(r["n_docs"] for r in got.values()) == 4


def test_domain_filter_block_and_allow(spark):
    rows = [
        (0, "https://spam.com/x"),
        (1, "https://deep.sub.spam.com/y"),
        (2, "https://ham.org/z"),
        (3, "garbage url"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    blocked = url_ids(domain_filter_frame(df, ["SPAM.com"], mode="block"))
    # block: spam.com and every subdomain dropped; malformed kept
    assert blocked == [2, 3]
    allowed = url_ids(domain_filter_frame(df, ["spam.com"], mode="allow"))
    # allow: only provable members; malformed dropped
    assert allowed == [0, 1]
    with pytest.raises(ValueError):
        domain_filter_frame(df, ["x.com"], mode="nope")


def url_ids(frame):
    return sorted(r["doc_id"] for r in frame.select("doc_id").collect())


def test_cap_per_domain_deterministic(spark):
    rows = [(i, f"https://hot.com/{i}") for i in range(20)] + [
        (100, "https://cold.org/only")
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = cap_per_domain_frame(df, cap=5)
    by_dom: dict[str, list[int]] = {}
    for r in out.select("registered_domain", "doc_id").collect():
        by_dom.setdefault(r["registered_domain"], []).append(r["doc_id"])
    assert len(by_dom["hot.com"]) == 5
    assert by_dom["cold.org"] == [100]
    # survivor choice mirrors the documented md5(doc_id) ordering
    expect = sorted(range(20), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:5]
    assert sorted(by_dom["hot.com"]) == sorted(expect)
    # stable under repartitioning
    out2 = cap_per_domain_frame(df.repartition(7), cap=5)
    ids2 = sorted(
        r["doc_id"]
        for r in out2.filter("registered_domain = 'hot.com'").collect()
    )
    assert ids2 == sorted(by_dom["hot.com"])


def test_url_dedup_ingest_stream_matches_batch_twin(spark, tmp_path):
    """Streaming URL-dedup ingest: two arriving crawl files where the
    second revisits half of the first's pages under different
    syntactic URL forms. The lake must hold one survivor per
    normalized URL (first arrival), malformed rows must all land
    exactly once, a replay must append nothing, and — because
    earlier files carry smaller doc_ids — the final lake must equal
    the batch twin's min-id survivor set."""
    import pandas as pd
    import time as _time

    from data_ingestor_gluejob_script_spark import streaming

    src = tmp_path / "incoming"
    src.mkdir()
    a = pd.DataFrame(
        {
            "doc_id": list(range(10)),
            "url": [f"https://site{i % 3}.com/page/{i}" for i in range(10)],
        }
    )
    b = pd.DataFrame(
        {
            "doc_id": list(range(100, 110)),
            "url": [
                # 4 revisits of A's pages in different syntactic form
                "HTTPS://SITE0.COM:443/page/0",
                "https://site1.com/page/1?utm_source=rss",
                "https://site2.com/page/2#frag",
                "https://site0.com/page/3?gclid=9",
                # 4 fresh pages
                "https://site0.com/page/50",
                "https://site1.com/page/51",
                "https://site2.com/page/52",
                "https://site0.com/page/53",
                # 2 malformed
                "not a url at all",
                "::also bad",
            ],
        }
    )
    a.to_parquet(src / "a.parquet")
    _time.sleep(0.05)
    b.to_parquet(src / "b.parquet")

    lake = str(tmp_path / "lake")
    q = streaming.run_url_dedup_ingest(
        spark, str(src), lake, str(tmp_path / "ckpt1")
    )
    q.awaitTermination(120)

    got = spark.read.parquet(lake)
    # 10 A pages + 4 fresh B pages + 2 malformed B rows
    assert got.count() == 16
    assert got.select("url_md5").distinct().count() == 16
    kept = {r.doc_id for r in got.select("doc_id").collect()}
    assert set(range(10)) <= kept
    assert not kept & {100, 101, 102, 103}
    assert {108, 109} <= kept  # malformed rows ingested, not dropped

    # replay with a fresh checkpoint appends nothing
    q2 = streaming.run_url_dedup_ingest(
        spark, str(src), lake, str(tmp_path / "ckpt2")
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(lake).count() == 16

    # batch-twin parity: arrival order == id order here, so the lake's
    # survivor ids equal url_dedup_frame's min-id survivors
    all_rows = spark.createDataFrame(
        pd.concat([a, b], ignore_index=True)
    )
    batch_ids = sorted(
        r.doc_id for r in url_dedup_frame(all_rows).select("doc_id").collect()
    )
    assert sorted(kept) == batch_ids
