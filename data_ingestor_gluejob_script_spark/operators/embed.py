"""Document embedding generation — the bridge from the ``documents``
table to the embedding-space operators (ANN search, SemDeDup). The
encoder itself is a deterministic stand-in (no embedding model ships
in this environment): REPLACE ``_fake_embed_batch`` with the real
per-batch model call (sentence-transformers / torch forward pass) —
the Spark plumbing (Arrow batching, schema, normalization, downstream
consumers) is unchanged, the same swap-point convention as
``operators/multimodal._fake_decode``.

Scale shape: ``mapInPandas`` streams Arrow batches through the Python
worker — documents never materialize per-partition, the model loads
once per worker (module scope), and the output carries only
(id, dim floats), so the corpus's text payload drops out of the plan
right here. Batch inference at 100 TB is exactly this operator plus a
GPU scheduling conf; no collect, no per-row Python.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

EMBED_DIM = 64


def _fake_embed_batch(texts: pd.Series, dim: int) -> np.ndarray:
    """Deterministic hash-chain embedding: row i's vector is the first
    ``dim`` bytes of md5(text), md5(text||'\\x01'), ... scaled to
    [-1, 1) and L2-normalized. Identical texts embed identically
    (exactly what dedup-by-meaning needs from a stand-in);
    partitioning and batch boundaries cannot change the output.
    Swap-point for a real encoder — see module docstring."""
    out = np.empty((len(texts), dim), dtype=np.float64)
    n_blocks = (dim + 15) // 16
    for i, t in enumerate(texts):
        seed = (t if t is not None else "").encode("utf-8", "surrogatepass")
        raw = b"".join(
            hashlib.md5(seed + bytes([j])).digest() for j in range(n_blocks)
        )[:dim]
        v = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
        v = v / 127.5 - 1.0
        norm = float(np.sqrt((v * v).sum()))
        out[i] = v / norm if norm > 0 else v
    return out


def embed_documents(
    docs: DataFrame,
    dim: int = EMBED_DIM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, emb array<double>[dim]): Arrow-batched document encoding
    via ``mapInPandas``. Output vectors are unit-norm doubles — the
    shape ``semantic_dedup_frame`` / the ANN family consume directly
    (cosine == dot on unit vectors)."""
    schema = T.StructType(
        [
            docs.schema[id_col],
            T.StructField("emb", T.ArrayType(T.DoubleType())),
        ]
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = _fake_embed_batch(pdf[text_col], dim)
            yield pd.DataFrame(
                {id_col: pdf[id_col].values, "emb": list(vecs)}
            )

    return docs.select(id_col, text_col).mapInPandas(encode, schema)


def semantic_dedup_docs(
    docs: DataFrame,
    threshold: float | None = None,
    n_cells: int | None = None,
    target_cell_size: int = 100,
):
    """End-to-end semantic dedup FROM TEXT: encode (map-only, payload
    dropped at the encoder) then SemDeDup over the embedding space.
    Returns (doc_id, cell, group_id, is_representative). Identical
    texts embed identically (cosine 1.0, same cell), so exact dups are
    always grouped; near-dups group per the threshold.

    Cell count: SemDeDup's within-cell pair join costs Σ|cell|², so K
    must GROW with the corpus (the paper: K ≈ 11k at 100M docs). When
    ``n_cells`` is None it is auto-sized to n/``target_cell_size``
    (floor 16) from one count of the input — the count is one scan of
    the id column, and it keeps the pairwise stage O(n ·
    target_cell_size) instead of O(n²/16) no matter the corpus size."""
    from ..queries.similarity import (
        SEMANTIC_DEDUP_COSINE,
        semantic_dedup_frame,
    )

    if n_cells is None:
        # size K on the DISTINCT text count — the pairwise stage runs
        # on distinct vectors (clones collapse linearly first), so a
        # clone-heavy corpus shouldn't inflate the cell count
        n_cells = max(
            16, docs.select("text").distinct().count() // target_cell_size
        )
    emb = embed_documents(docs).selectExpr("doc_id as vec_id", "emb")
    out = semantic_dedup_frame(
        emb,
        threshold=(
            SEMANTIC_DEDUP_COSINE if threshold is None else threshold
        ),
        n_cells=n_cells,
    )
    return out.withColumnRenamed("vec_id", "doc_id")
