"""Differentials for HTML text extraction (queries/htmlextract.py,
round-11 fourth wave): a per-string stdlib-re oracle mirrors the
vectorized pandas pipeline step for step (module docstring order),
checked on handcrafted nasty pages plus a seeded random tag-soup
corpus, then through Spark for schema/NULL/pass-through/partitioning
plumbing."""

from __future__ import annotations

import html as _h
import random
import re

import pandas as pd
import pytest

from data_ingestor_gluejob_script_spark.queries.htmlextract import (
    _BLOCK,
    _extract,
    html_extract_frame,
    with_extracted_text,
)


def _ws(s):
    s = re.sub("[ \t\r\f\v]+", " ", s)
    s = re.sub(" ?\n ?", "\n", s)
    s = re.sub("\n{2,}", "\n\n", s)
    return s.strip()


def oracle(page):
    """Independent per-string twin of htmlextract._extract."""
    if page is None:
        return None, None, None, None
    no_c = re.sub("(?s)<!--.*?-->", "", page)
    stripped = re.sub(
        "(?is)<(script|style|noscript|template|svg|head)\\b[^>]*>"
        ".*?(</\\1\\s*>|$)",
        "",
        no_c,
    )
    m = re.search("(?is)<title\\b[^>]*>(.*?)</title\\s*>", no_c)
    title = (
        _ws(_h.unescape(m.group(1))).replace("\n", " ") if m else None
    )
    n_links = len(re.findall("(?i)<a[\\s>]", no_c))
    text = re.sub(_BLOCK, "\n", stripped)
    text = re.sub("(?s)<[^>]*>", "", text)
    text = _ws(_h.unescape(text))
    ratio = (len(text) / len(page)) if len(page) > 0 else 0.0
    return title, text, n_links, ratio


NASTY = [
    "<html><head><title>T &amp; U\n V</title><style>a{x:1}</style>"
    "</head><body><p>one</p><div>two <B>three</B></div>"
    "<a href='/'>l1</a><A HREF=x>l2</A></body></html>",
    "",
    None,
    "<p>unclosed <script>alert('<p>fake</p>')",
    "<SCRIPT src=x>var a=1;</SCRIPT>visible<br>line2",
    "text only, no tags &euro; &#233; &amp;amp;",
    "<!-- <p>commented out</p> --><p>kept</p>",
    "<svg><circle r=1/><text>vector label</text></svg>after svg",
    "<ul><li>a</li><li>b</li></ul><table><tr><td>c</td></tr></table>",
    "<TITLE>upper title</TITLE><noscript>no js</noscript>body",
    "<pre>  spaced\n   code  </pre>tail",
    "<p>&lt;not a tag&gt;</p>",
    "a<hr>b<dl><dt>t</dt><dd>d</dd></dl>",
    "<div class='x' data-y=\"z\">attrs</div>",
    "<head><meta charset=utf-8><title>in head</title></head>deep",
]


def _random_pages(n=200, seed=13):
    rng = random.Random(seed)
    tags = [
        "p", "div", "b", "i", "span", "li", "h2", "script", "style",
        "a", "title", "pre", "table", "svg",
    ]
    words = ["alpha", "beta", "&amp;", "&#65;", "x<y", "gamma", "&euro;"]
    pages = []
    for _ in range(n):
        parts = []
        for _ in range(rng.randrange(1, 25)):
            roll = rng.random()
            t = rng.choice(tags)
            if roll < 0.35:
                parts.append(rng.choice(words) + rng.choice([" ", "\n", "  "]))
            elif roll < 0.6:
                parts.append(f"<{t}>")
            elif roll < 0.8:
                parts.append(f"</{t}>")
            else:
                parts.append(
                    f"<{t} a='{rng.randrange(10)}'>{rng.choice(words)}</{t}>"
                )
        pages.append("".join(parts))
    return pages


def test_batch_matches_oracle_nasty():
    got = _extract(pd.Series(NASTY, dtype="string"))
    for i, page in enumerate(NASTY):
        t, x, nl, r = oracle(page)
        if page is None:
            assert pd.isna(got["text_extract"][i])
            continue
        assert (got["title"][i] if pd.notna(got["title"][i]) else None) == t, i
        assert got["text_extract"][i] == x, (i, page)
        assert got["n_links"][i] == nl
        assert got["text_ratio"][i] == pytest.approx(r)


def test_batch_matches_oracle_random():
    pages = _random_pages()
    got = _extract(pd.Series(pages, dtype="string"))
    for i, page in enumerate(pages):
        t, x, nl, r = oracle(page)
        assert (got["title"][i] if pd.notna(got["title"][i]) else None) == t
        assert got["text_extract"][i] == x, page
        assert got["n_links"][i] == nl


def test_spark_report_form_and_nulls(spark):
    rows = list(enumerate(NASTY))
    df = spark.createDataFrame(rows, "doc_id int, html string")
    out = {r.doc_id: r for r in html_extract_frame(df).collect()}
    assert len(out) == len(rows)
    assert out[2].text_extract is None and out[2].n_links is None
    assert out[1].text_extract == "" and out[1].text_ratio == 0.0
    assert out[0].title == "T & U V"
    assert out[0].n_links == 2


def test_passthrough_matches_report(spark):
    rows = [(i, p, f"s{i % 3}") for i, p in enumerate(NASTY)]
    df = spark.createDataFrame(rows, "doc_id int, html string, src string")
    rep = {
        r.doc_id: (r.title, r.text_extract, r.n_links)
        for r in html_extract_frame(df).collect()
    }
    thru = with_extracted_text(df).collect()
    assert len(thru) == len(rows)
    for r in thru:
        assert (r.title, r.text_extract, r.n_links) == rep[r.doc_id]
        assert r.src == f"s{r.doc_id % 3}"  # originals preserved


def test_partitioning_invariance(spark):
    pages = _random_pages(n=120, seed=29)
    rows = list(enumerate(pages))
    df1 = spark.createDataFrame(rows, "doc_id int, html string")
    a = sorted(map(tuple, html_extract_frame(df1).collect()))
    b = sorted(
        map(tuple, html_extract_frame(df1.repartition(7)).collect())
    )
    assert a == b
