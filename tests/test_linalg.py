"""Distributed linear algebra (operators/linalg.py) vs numpy ground truth."""

from __future__ import annotations

import numpy as np
import pytest

from gpu_telemetry_lakehouse_spark.catalog import load_table
from gpu_telemetry_lakehouse_spark.operators import linalg as LA


@pytest.fixture(scope="module")
def emb_np(spark, sf_dir):
    df = load_table(spark, sf_dir, "embeddings").orderBy("vec_id")
    rows = df.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, X


def test_gram_stats_matches_numpy(spark, sf_dir, emb_np):
    _, X = emb_np
    n, s, g = LA.gram_stats(load_table(spark, sf_dir, "embeddings"))
    assert n == X.shape[0]
    np.testing.assert_allclose(s, X.sum(axis=0), rtol=1e-10)
    np.testing.assert_allclose(g, X.T @ X, rtol=1e-10)


def test_pca_components_match_numpy(spark, sf_dir, emb_np):
    _, X = emb_np
    mu, comps = LA.pca_components(load_table(spark, sf_dir, "embeddings"), k=2)
    np.testing.assert_allclose(mu, X.mean(axis=0), rtol=1e-10)
    cov = np.cov(X, rowvar=False, ddof=1)
    vals, vecs = np.linalg.eigh(cov)
    ref = vecs[:, ::-1][:, :2].T
    for i in range(2):
        j = int(np.argmax(np.abs(ref[i])))
        if ref[i, j] < 0:
            ref[i] = -ref[i]
    # eigenvectors are unique up to sign (fixed) and numerical noise
    np.testing.assert_allclose(np.abs(comps), np.abs(ref), atol=1e-8)
    np.testing.assert_allclose(comps, ref, atol=1e-8)
    # components are orthonormal
    np.testing.assert_allclose(comps @ comps.T, np.eye(2), atol=1e-10)


def test_projection_matches_numpy(spark, sf_dir, emb_np):
    ids, X = emb_np
    df = load_table(spark, sf_dir, "embeddings")
    mu, comps = LA.pca_components(df, k=2)
    proj = (
        LA.project(df, mu, comps)
        .select("vec_id", "pc1", "pc2")
        .orderBy("vec_id")
        .collect()
    )
    got = np.array([[r["pc1"], r["pc2"]] for r in proj])
    want = (X - mu) @ comps.T
    np.testing.assert_allclose(got, want, atol=1e-8)
    # variance along pc1 >= along pc2 (descending eigenvalue order)
    assert got[:, 0].var() >= got[:, 1].var()


def test_pca_fit_deterministic(spark, sf_dir):
    df = load_table(spark, sf_dir, "embeddings")
    mu1, c1 = LA.pca_components(df, k=2)
    mu2, c2 = LA.pca_components(df, k=2)
    np.testing.assert_array_equal(mu1, mu2)
    np.testing.assert_array_equal(c1, c2)
