"""Information-theoretic document quality signals: compression ratio
and character entropy.

The cheap lexical flags (``textops.quality_score_frame``) catch
structural junk — too short, no stopwords, over-punctuated. The two
signals here catch what those miss: machine-generated or boilerplate
text that LOOKS word-shaped but carries little information. A
document that deflate-compresses far below normal prose (prose sits
roughly at ratio 0.3-0.6) is repetitive template output; one whose
character distribution has abnormally low Shannon entropy is
degenerate (runs, dumps, padding). Both are standard wild-data
filters (Gopher's quality pipeline and Dolma's web pipeline both
gate on compressibility-style redundancy signals).

Plan shape: one Arrow-batched ``mapInPandas`` pass — zlib and the
entropy histogram are per-row CPU with no cross-row state, so the
operator is an embarrassingly parallel map: no shuffle, no driver
state, linear in corpus bytes. Two variants trade Arrow transfer
against a later join:

- ``compression_signals_frame``: input pruned to (id, text), output
  is the id-keyed signal REPORT — the cheapest form when the caller
  only aggregates or thresholds ids.
- ``with_compression_signals``: passes every input column through the
  Python worker and appends the signal columns — pays text twice over
  Arrow but keeps the pipeline join-free, the right shape when the
  very next stage filters on the signals (a doc_id join back onto a
  100 TB corpus would shuffle the corpus; double Arrow transfer is a
  per-partition stream).
"""

from __future__ import annotations

import math
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SIGNAL_SCHEMA = (
    "raw_bytes long, zlib_bytes long, comp_ratio double, char_entropy double"
)
_LEVEL = 6


def _signals(texts: pd.Series) -> pd.DataFrame:
    """Per-row signals for one Arrow batch. NULL text -> all-NULL
    signals (unknown, not zero); empty text -> raw_bytes 0 with NULL
    ratio/entropy (compressing nothing is not evidence of anything).

    zlib is per-row irreducible; the entropy histogram is numpy over
    the batch's decoded code points. Everything is per-row independent,
    so batch boundaries and partitioning cannot change the output.
    """
    raw_bytes, zlib_bytes, ratio, entropy = [], [], [], []
    for t in texts:
        if t is None:
            raw_bytes.append(None)
            zlib_bytes.append(None)
            ratio.append(None)
            entropy.append(None)
            continue
        b = t.encode("utf-8", "surrogatepass")
        raw_bytes.append(len(b))
        if not b:
            zlib_bytes.append(None)
            ratio.append(None)
            entropy.append(None)
            continue
        z = len(zlib.compress(b, _LEVEL))
        zlib_bytes.append(z)
        ratio.append(z / len(b))
        cps = np.frombuffer(
            t.encode("utf-32-le", "surrogatepass"), dtype=np.uint32
        )
        _, counts = np.unique(cps, return_counts=True)
        p = counts / counts.sum()
        entropy.append(float(-(p * np.log2(p)).sum()))
    return pd.DataFrame(
        {
            "raw_bytes": pd.array(raw_bytes, dtype="Int64"),
            "zlib_bytes": pd.array(zlib_bytes, dtype="Int64"),
            "comp_ratio": pd.array(ratio, dtype="float64"),
            "char_entropy": pd.array(entropy, dtype="float64"),
        }
    )


def compression_signals_frame(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, raw_bytes, zlib_bytes, comp_ratio, char_entropy) — the
    pruned report form: only (id, text) crosses into Python, and only
    (id, 4 scalars) comes back, so the corpus's other columns never
    leave the JVM."""
    pruned = docs.select(id_col, text_col)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = _signals(pdf[text_col])
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return pruned.mapInPandas(
        gen, f"{id_col} long, {SIGNAL_SCHEMA}"
    )


def with_compression_signals(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Every input column + the four signal columns, join-free (see
    module docstring for when to prefer this over the report form)."""
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in docs.schema.fields)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = _signals(pdf[text_col])
            yield pd.concat(
                [pdf.reset_index(drop=True), out], axis=1, copy=False
            )

    return docs.mapInPandas(gen, f"{ddl}, {SIGNAL_SCHEMA}")


def filter_low_information(
    docs: DataFrame,
    min_comp_ratio: float = 0.2,
    min_entropy: float = 2.0,
    text_col: str = "text",
) -> DataFrame:
    """Drop documents that compress suspiciously well or whose
    character distribution is degenerate; NULL/empty texts (NULL
    signals) are dropped too — a wild-data filter keeps only rows
    that PROVE normality. Built on the pass-through variant so the
    filter composes into a pipeline without a corpus-side join; the
    signal columns stay on the output (the caller just paid for
    them — same convention as ``url_dedup_frame``)."""
    scored = with_compression_signals(docs, text_col=text_col)
    return scored.filter(
        (F.col("comp_ratio") >= min_comp_ratio)
        & (F.col("char_entropy") >= min_entropy)
    )


def oracle_signals(text: str | None):
    """Independent python twin for the differentials: Counter + math
    instead of numpy, stdlib-only. Returns the 4-tuple or Nones."""
    from collections import Counter

    if text is None:
        return (None, None, None, None)
    b = text.encode("utf-8", "surrogatepass")
    if not b:
        return (0, None, None, None)
    z = len(zlib.compress(b, _LEVEL))
    counts = Counter(text)
    n = sum(counts.values())
    ent = -sum((c / n) * math.log2(c / n) for c in counts.values())
    return (len(b), z, z / len(b), ent)
