"""End-to-end web-crawl curation: WARC container → HTML text
extraction → Unicode normalization → C4 line/page rules → exact
dedup → token count, composed from the already-differential-tested
stage operators the same way traindata.prepare_training_corpus
composes the document-side curation chain.

Reference parity note: the reference job (gluejob.py) moves database
rows into a lake; this is the crawl-side twin of that ingestion —
the front half of an LLM training-data pipeline (Common Crawl in,
curated text out), built entirely from this package's stages:

  sources/warc.read_warc          file-parallel container parse
  htmlextract.with_extracted_text Arrow-batched markup strip
  textnorm.with_normalized_text   NFC + control/zero-width + ws canon
  docclean.c4_filter              pure-Catalyst line/page rules
  textops.exact_dedup_frame       digest groupBy + LEFT SEMI
  token count                     split-size (the package-wide
                                  whitespace tokenization convention)

Stage ORDER is the part that carries semantics (and the e2e test
pins it): extraction before normalization (entity unescape can emit
the NBSPs normalization canonicalizes), normalization before C4
(the line filter splits on the canonical LF), C4 before dedup (two
pages identical after boilerplate removal ARE duplicates), dedup
last so survivors are final text.

Scale shape: the only shuffles in the whole chain are exact-dedup's
digest groupBy + LEFT SEMI — everything upstream is an
embarrassingly parallel map over file-sized tasks (no driver state,
payloads cross the Arrow boundary exactly twice: html strip and
normalization). At 100 TB this is the canonical "one pass over the
crawl, one metadata-sized shuffle" ingest.

NULL/degenerate handling is inherited from the stages: records with
no HTTP body extract to empty text, die at the C4 min-kept-lines
rule, and never reach dedup; NULL-text rows carry the row_digest
NULL sentinel and dedup among themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.warc import read_warc, warc_text
from .docclean import c4_filter
from .htmlextract import with_extracted_text
from .textnorm import with_normalized_text
from .textops import exact_dedup_frame, words_col


def curate_page_maps(
    pages: DataFrame,
    min_line_words: int = 5,
    min_kept_lines: int = 1,
) -> DataFrame:
    """(doc_id, url, title, text, n_tokens) from raw (doc_id, url,
    html) pages — the MAP-ONLY curation chain (extract → normalize →
    C4 → token count), no dedup. Shared by the batch entry point
    below (which adds ``exact_dedup_frame``) and the streaming
    ingest (streaming.run_web_curation_ingest, whose dedup is the
    lake-ledgered anti-join) so both surfaces curate
    byte-identically; token counting commutes with dedup because
    both are per-row."""
    extracted = with_extracted_text(pages, html_col="html").select(
        "doc_id", "url", "title", F.col("text_extract").alias("text")
    )
    normalized = with_normalized_text(extracted).drop(
        "changed", "mojibake_hits"
    )
    cleaned = c4_filter(
        normalized,
        min_line_words=min_line_words,
        min_kept_lines=min_kept_lines,
    )
    return cleaned.select(
        "doc_id",
        "url",
        "title",
        "text",
        F.size(words_col(F.col("text"))).alias("n_tokens"),
    )


def curate_pages(
    pages: DataFrame,
    min_line_words: int = 5,
    min_kept_lines: int = 1,
) -> DataFrame:
    """The batch form: map-only curation + exact dedup on the
    cleaned text (keep lowest doc_id)."""
    return exact_dedup_frame(
        curate_page_maps(
            pages,
            min_line_words=min_line_words,
            min_kept_lines=min_kept_lines,
        )
    )


def curate_web_crawl(
    spark: SparkSession,
    warc_path: str,
    min_line_words: int = 5,
    min_kept_lines: int = 1,
) -> DataFrame:
    """(doc_id, url, title, text, n_tokens) — curated corpus from a
    directory of .warc/.warc.gz files. doc_id is the WARC record id
    (globally unique by spec); dedup keeps the lexicographically
    lowest, making the survivor deterministic."""
    pages = warc_text(read_warc(spark, warc_path)).select(
        F.col("record_id").alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.col("text").alias("html"),
    )
    return curate_pages(
        pages,
        min_line_words=min_line_words,
        min_kept_lines=min_kept_lines,
    )
