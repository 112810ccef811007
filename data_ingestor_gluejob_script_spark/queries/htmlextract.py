"""HTML → text extraction for web-crawl curation: strip the markup,
keep the prose, surface the classic boilerplate signals (link count,
text-to-markup ratio). Together with sources/warc.py this completes
the front of the web pipeline: WARC → html_extract → textnorm →
c4_line_filter → dedup.

Reference parity note: the reference job (gluejob.py) has no web
ingestion; this extends the curation surface the same way
textnorm/docclean do, and mirrors what trafilatura / jusText /
resiliparse-style extractors compute before their DOM heuristics —
the regex tier is the scale-cheap 95% that needs no HTML5 parser
dependency.

What one pass does, in order (the oracle twin in tests/test_html.py
mirrors it step for step):

1. Drop comments ``<!-- ... -->`` (non-greedy, dotall).
2. Drop non-content ELEMENTS wholesale: script, style, noscript,
   template, svg, head (case-insensitive, non-greedy to the matching
   close tag; an unclosed tag swallows to end-of-document — the
   fail-safe direction, markup never leaks into prose).
3. Capture ``<title>`` (first match, entities unescaped, collapsed).
4. Count ``<a`` openings (the link-density numerator) on the
   pre-strip markup.
5. BLOCK-level tags (p div br li ul ol tr table th td h1-h6 section
   article header footer blockquote pre form figure main nav aside
   hr dl dt dd) → newline; remaining tags → empty string (inline
   markup like <b> joins its surroundings seamlessly).
6. Unescape HTML entities (&amp; &#233; ...).
7. Whitespace canonicalization: horizontal runs → one space,
   trimmed line ends, 2+ blank lines → one blank line, outer strip.

``text_ratio`` = len(extracted) / len(raw html) — the standard
cheap boilerplate-page signal (chrome-heavy pages score near 0).

Plan shape: one Arrow-batched ``mapInPandas`` over (id, html)
pruned input — per-row regex work with no cross-row state:
embarrassingly parallel, no shuffle, linear in corpus bytes. The
entity unescape is the one non-vectorized step (html.unescape per
row — C-backed and cheap relative to the regex passes).

NULL handling (package convention): NULL html → NULL outputs;
empty html → empty text with n_links 0 and ratio 0.0.
"""

from __future__ import annotations

import html as _html
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

HTML_SCHEMA = (
    "title string, text_extract string, n_links int, text_ratio double"
)

_COMMENT = "(?s)<!--.*?-->"
# Elements whose CONTENT must not leak into prose. Unclosed → strip
# to end of document ($ alternative).
_DROP_ELEMS = (
    "(?is)<(script|style|noscript|template|svg|head)\\b[^>]*>"
    ".*?(</\\1\\s*>|$)"
)
_TITLE = "(?is)<title\\b[^>]*>(.*?)</title\\s*>"
_LINK_OPEN = "(?i)<a[\\s>]"
_BLOCK_TAGS = (
    "p|div|br|li|ul|ol|tr|table|th|td|h[1-6]|section|article|header|"
    "footer|blockquote|pre|form|figure|figcaption|main|nav|aside|hr|"
    "dl|dt|dd"
)
_BLOCK = f"(?is)</?(?:{_BLOCK_TAGS})\\b[^>]*>"
_ANY_TAG = "(?s)<[^>]*>"


def _clean_ws(s: pd.Series) -> pd.Series:
    s = s.str.replace("[ \\t\\r\\f\\v]+", " ", regex=True)
    s = s.str.replace(" ?\\n ?", "\n", regex=True)
    s = s.str.replace("\\n{2,}", "\n\n", regex=True)
    return s.str.strip()


def _extract(htmls: pd.Series) -> pd.DataFrame:
    raw = htmls.astype("string")
    no_comment = raw.str.replace(_COMMENT, "", regex=True)
    stripped = no_comment.str.replace(_DROP_ELEMS, "", regex=True)
    title = no_comment.str.extract(_TITLE, expand=False)
    title = _clean_ws(
        title.map(_html.unescape, na_action="ignore").astype("string")
    ).str.replace("\n", " ", regex=False)
    n_links = no_comment.str.count(_LINK_OPEN).astype("Int64")
    text = stripped.str.replace(_BLOCK, "\n", regex=True)
    text = text.str.replace(_ANY_TAG, "", regex=True)
    text = text.map(_html.unescape, na_action="ignore").astype("string")
    text = _clean_ws(text)
    raw_len = raw.str.len()
    ratio = (
        text.str.len().astype("Float64") / raw_len.astype("Float64")
    ).where(raw_len > 0, 0.0)
    return pd.DataFrame(
        {
            "title": title,
            "text_extract": text,
            "n_links": n_links,
            "text_ratio": ratio.where(raw.notna()),
        }
    )


def html_extract_frame(
    docs: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """(id, title, text_extract, n_links, text_ratio) — the report
    form; only (id, html) cross the Arrow boundary (other columns
    are pruned, join the id back for more)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = _extract(b[html_col])
            out.insert(0, id_col, b[id_col])
            yield out

    pruned = docs.select(id_col, html_col)
    return pruned.mapInPandas(
        run, f"{id_col} {dict(docs.dtypes)[id_col]}, {HTML_SCHEMA}"
    )


def with_extracted_text(
    docs: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """All original columns + the four extraction columns — the
    pass-through form for when the very next stage consumes the text
    (trades a second Arrow transfer of the html for avoiding a
    corpus-side join; same trade as textnorm.with_normalized_text)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = _extract(b[html_col])
            yield pd.concat(
                [b.reset_index(drop=True), out.reset_index(drop=True)],
                axis=1,
            )

    schema = ", ".join(f"{n} {t}" for n, t in docs.dtypes)
    return docs.mapInPandas(run, f"{schema}, {HTML_SCHEMA}")
