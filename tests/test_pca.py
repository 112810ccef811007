"""Distributed PCA: numpy differential (the driver-side eigh runs on
a covariance assembled from distributed partial sums — the oracle
assembles the same covariance from the collected matrix, so any error
in the Gram/mean plumbing or the sign convention shows up as a value
mismatch, not a tolerance blur), plus the linear-algebra invariants
(orthonormal components, descending variance, whitened unit variance,
partitioning invariance).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyspark.sql.functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_ingestor_gluejob_script_spark.operators.pca import (  # noqa: E402
    _fix_signs,
    fit_pca,
    project_pca,
)
from data_ingestor_gluejob_script_spark.queries.similarity import (  # noqa: E402
    _load_emb,
)

SF_DIR = "/root/testdata/sf0.001"
K = 8


def _numpy_pca(x: np.ndarray, k: int):
    mean = x.mean(axis=0)
    cov = (x.T @ x) / x.shape[0] - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    return mean, _fix_signs(vecs[:, order].T), np.maximum(vals[order], 0.0)


def _collect_x(emb):
    rows = emb.select("vec_id", "emb").collect()
    rows.sort(key=lambda r: r["vec_id"])
    return np.stack([np.array(r["emb"]) for r in rows]), [
        r["vec_id"] for r in rows
    ]


def test_fit_matches_numpy(spark):
    emb = _load_emb(spark, SF_DIR)
    x, _ = _collect_x(emb)
    model = fit_pca(emb, K)
    mean, comps, var = _numpy_pca(x, K)
    assert model.n == x.shape[0]
    np.testing.assert_allclose(model.mean, mean, atol=1e-9)
    np.testing.assert_allclose(
        model.explained_variance, var, atol=1e-9
    )
    np.testing.assert_allclose(model.components, comps, atol=1e-7)
    # invariants: orthonormal rows, descending variance
    np.testing.assert_allclose(
        model.components @ model.components.T, np.eye(K), atol=1e-9
    )
    assert all(
        a >= b - 1e-12
        for a, b in zip(model.explained_variance, model.explained_variance[1:])
    )


def test_project_matches_numpy_and_whiten_unit_variance(spark):
    emb = _load_emb(spark, SF_DIR)
    x, ids = _collect_x(emb)
    model = fit_pca(emb, K)
    got = {
        r["vec_id"]: np.array(r["emb_pca"])
        for r in project_pca(emb, model).collect()
    }
    want = (x - model.mean) @ model.components.T
    for i, vid in enumerate(ids):
        np.testing.assert_allclose(got[vid], want[i], atol=1e-9)
    # projected coordinates: per-axis variance equals the eigenvalue
    y = np.stack([got[v] for v in ids])
    np.testing.assert_allclose(
        y.var(axis=0), model.explained_variance, atol=1e-7
    )
    # whitened: unit variance on every axis
    yw = np.stack(
        [
            np.array(r["emb_pca"])
            for r in sorted(
                project_pca(emb, model, whiten=True).collect(),
                key=lambda r: r["vec_id"],
            )
        ]
    )
    np.testing.assert_allclose(yw.var(axis=0), np.ones(K), atol=1e-6)
    # non-vec columns survive the projection map
    assert set(project_pca(emb, model).columns) == {"vec_id", "emb_pca"}


def test_fit_is_partitioning_invariant(spark):
    emb = _load_emb(spark, SF_DIR)
    m1 = fit_pca(emb.repartition(17), K)
    m2 = fit_pca(emb.coalesce(1), K)
    np.testing.assert_allclose(m1.mean, m2.mean, atol=1e-12)
    np.testing.assert_allclose(
        m1.components, m2.components, atol=1e-9
    )


def test_pca_feeds_semantic_dedup_shapes(spark):
    """Composition smoke: the reduced frame slots straight into the
    similarity stack's (id, emb) contract."""
    emb = _load_emb(spark, SF_DIR)
    model = fit_pca(emb, 4)
    red = project_pca(emb, model, out_col="emb")
    assert red.columns == ["vec_id", "emb"]
    row = red.first()
    assert len(row["emb"]) == 4


def test_fit_validates_inputs(spark):
    emb = _load_emb(spark, SF_DIR)
    import pytest

    with pytest.raises(ValueError):
        fit_pca(emb, 0)
    with pytest.raises(ValueError):
        fit_pca(emb, 10_000)
    with pytest.raises(ValueError):
        fit_pca(emb.filter(F.lit(False)), 2)
