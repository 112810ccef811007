"""Distributed PCA over an embedding column — the dimensionality-
reduction / whitening stage curation pipelines run before clustering
or semantic dedup (SemDeDup-style setups reduce to 64-256 dims first;
a 4x narrower vector is a 4x cheaper pair join and codebook).

The classic n-huge / d-small decomposition: the corpus contributes
ONLY the d-vector sum and the d x d Gram matrix, both computed with
Arrow-batched numpy per partition (one matrix per PARTITION crosses
the wire, not per row) and summed element-wise in one
single-partition reduce of #partitions rows x d(d+1)/2 doubles —
metadata-sized for any real d (d=128 -> 66 KB per partition row).
The eigendecomposition runs driver-side on the d x d covariance
(microseconds), and projection is a map with the (k x d) component
matrix broadcast. No corpus-sized state ever reaches the driver and
the corpus is scanned once per phase (once to fit, once to project).

Sign convention: numpy's eigh returns eigenvectors up to sign, so
each component is normalized to have a positive entry at its
largest-|.|  coordinate (ties: lowest index) — making fit_pca
deterministic and directly comparable to the test oracle's numpy PCA
without sign gymnastics.

Not driver-registered (inventory pinned at 50); numpy-differential in
tests/test_pca.py, benched as x_pca_project.
"""

from __future__ import annotations

from typing import Iterator, NamedTuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class PCAModel(NamedTuple):
    mean: np.ndarray  # (d,)
    components: np.ndarray  # (k, d) rows = principal axes
    explained_variance: np.ndarray  # (k,) eigenvalues, descending
    n: int


def _fix_signs(components: np.ndarray) -> np.ndarray:
    out = components.copy()
    for i in range(out.shape[0]):
        j = int(np.argmax(np.abs(out[i])))
        if out[i, j] < 0:
            out[i] = -out[i]
    return out


def fit_pca(emb: DataFrame, k: int, vec_col: str = "emb") -> PCAModel:
    """Fit on (any id, array<double> ``vec_col``) — one corpus scan.
    Per Arrow batch: accumulate sum(x) and X^T X in numpy; per
    partition emit ONE row (n, sum, upper-triangular gram). Those
    partition rows are #partitions-many and d(d+1)/2 + d + 1 doubles
    each, so they collect directly and the final element-wise sum is
    numpy on the driver — a metadata-sized collect, same class as the
    z-order bounds probe. Covariance = gram/n - mean mean^T
    (population covariance, mirrored by the oracle)."""
    d_row = emb.select(F.size(vec_col).alias("d")).first()
    if d_row is None:
        raise ValueError("fit_pca: empty input")
    d = d_row["d"]
    if not 1 <= k <= d:
        raise ValueError(f"fit_pca: k={k} out of range for d={d}")
    tri = np.triu_indices(d)

    schema = "n long, s array<double>, g array<double>"

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(d)
        g = np.zeros((d, d))
        for pdf in batches:
            x = np.stack(pdf[vec_col].to_numpy())
            n += x.shape[0]
            s += x.sum(axis=0)
            g += x.T @ x
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g[tri].tolist()]}
            )

    parts = emb.select(vec_col).mapInPandas(stats, schema).collect()
    n = sum(r["n"] for r in parts)
    s = np.sum([np.array(r["s"]) for r in parts], axis=0)
    gt = np.sum([np.array(r["g"]) for r in parts], axis=0)
    gram = np.zeros((d, d))
    gram[tri] = gt
    gram = gram + gram.T - np.diag(np.diag(gram))
    mean = s / n
    cov = gram / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    return PCAModel(
        mean=mean,
        components=_fix_signs(vecs[:, order].T),
        explained_variance=np.maximum(vals[order], 0.0),
        n=n,
    )


def project_pca(
    emb: DataFrame,
    model: PCAModel,
    vec_col: str = "emb",
    out_col: str = "emb_pca",
    whiten: bool = False,
) -> DataFrame:
    """Replace ``vec_col`` with its k-dim projection (centered, then
    rotated by the components; ``whiten=True`` additionally scales
    each axis to unit variance — what cosine-based downstream steps
    usually want). Map-only: the (k x d) matrix and mean ride to
    executors inside the Arrow-batched UDF's closure (a few KB);
    matmul per batch, no per-row python."""
    comp = model.components
    if whiten:
        scale = np.sqrt(np.maximum(model.explained_variance, 1e-12))
        comp = comp / scale[:, None]
    mean = model.mean
    other = [c for c in emb.columns if c != vec_col]

    schema_fields = ", ".join(
        f"{c} {t}"
        for c, t in emb.dtypes
        if c != vec_col
    )
    schema = (
        f"{schema_fields}, {out_col} array<double>"
        if schema_fields
        else f"{out_col} array<double>"
    )

    def proj(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = np.stack(pdf[vec_col].to_numpy())
            y = (x - mean) @ comp.T
            out = pdf[other].copy()
            out[out_col] = [row.tolist() for row in y]
            yield out

    return emb.mapInPandas(proj, schema)
