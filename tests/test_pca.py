"""Distributed PCA/whitening (operators/pca.py) vs a driver-side
numpy reference — tolerance-pinned (float moments are partition-order
dependent by nature; the hash-exact twin of this plan shape is the
int8 Gram oracle query)."""

from __future__ import annotations

import numpy as np
import pytest

from udacitycapstonedataengineer_spark.operators.pca import (
    embedding_moments,
    pca_fit,
    pca_project,
    pca_whiten,
)
from udacitycapstonedataengineer_spark.sources.readers import load_table


def _collect_matrix(emb):
    rows = emb.select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r["vec_id"])
    return np.array([r["embedding"] for r in rows], dtype=np.float64)


def test_moments_match_numpy(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    X = _collect_matrix(emb)
    n, s, G = embedding_moments(emb)
    assert n == X.shape[0]
    np.testing.assert_allclose(s, X.sum(axis=0), rtol=1e-9)
    np.testing.assert_allclose(G, X.T @ X, rtol=1e-9)


def test_pca_fit_matches_numpy_reference(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    X = _collect_matrix(emb)
    k = 4
    model = pca_fit(emb, k)
    # reference PCA
    Xc = X - X.mean(axis=0)
    cov = (Xc.T @ Xc) / (X.shape[0] - 1)
    w, v = np.linalg.eigh(cov)
    ref_vals = w[::-1][:k]
    np.testing.assert_allclose(
        model.explained_variance, ref_vals, rtol=1e-6
    )
    # components orthonormal
    np.testing.assert_allclose(
        model.components @ model.components.T, np.eye(k), atol=1e-8
    )
    # each component spans the same direction as the reference (up to
    # sign, which the fit pins deterministically)
    for r in range(k):
        cos = abs(model.components[r] @ v[:, ::-1][:, r])
        assert cos == pytest.approx(1.0, abs=1e-6)
    # deterministic sign convention: pivot coefficient positive
    for r in range(k):
        assert model.components[r][np.argmax(np.abs(model.components[r]))] > 0


def test_projection_variance_equals_eigenvalues(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    model = pca_fit(emb, 3)
    proj = pca_project(emb, model)
    P = np.array(
        [r["proj"] for r in proj.select("proj").collect()], dtype=np.float64
    )
    np.testing.assert_allclose(
        P.var(axis=0, ddof=1), model.explained_variance, rtol=1e-6
    )
    # projection preserves the id columns
    assert set(proj.columns) == {"vec_id", "label", "proj"}


def test_whitening_gives_unit_variance(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    model = pca_fit(emb, 3)
    white = pca_whiten(emb, model)
    W = np.array(
        [r["white"] for r in white.select("white").collect()],
        dtype=np.float64,
    )
    np.testing.assert_allclose(W.var(axis=0, ddof=1), 1.0, rtol=1e-5)
    # whitened axes are decorrelated
    C = np.corrcoef(W.T)
    np.testing.assert_allclose(C, np.eye(3), atol=1e-6)


def test_pca_plan_is_narrow(spark, sf_dir):
    """The projection stage must stay shuffle-free (narrow mapInPandas
    over the scan) — the whole point of closure-shipping the model."""
    emb = load_table(spark, sf_dir, "embeddings")
    model = pca_fit(emb, 2)
    plan = (
        pca_project(emb, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "MapInPandas" in plan
