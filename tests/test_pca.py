"""Distributed PCA training (stages/encode.py fit_pca/pca_project):
pinned against single-process numpy PCA on the same data, plus the
spectral invariants and partitioning invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from video_features_ray.stages.encode import fit_pca, pca_project


def _emb_df(n=400, d=16, seed=3):
    rng = np.random.RandomState(seed)
    # anisotropic data: a few dominant directions so PCA is non-trivial
    basis = rng.randn(d, d)
    scales = np.linspace(5.0, 0.1, d)
    x = rng.randn(n, d) * scales[None, :] @ basis
    return pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                         "embedding": [r.astype(np.float32) for r in x]})


def _reference_pca(df, k):
    x = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    mean = x.mean(axis=0)
    cov = np.cov(x, rowvar=False, ddof=1)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps, vals = vecs[:, order], vals[order]
    flip = np.sign(comps[np.argmax(np.abs(comps), axis=0),
                         np.arange(comps.shape[1])])
    flip[flip == 0] = 1.0
    return mean, comps * flip, vals


@pytest.mark.parametrize("parts", [1, 5])
def test_fit_pca_matches_single_process(parts):
    df = _emb_df()
    ds = ray.data.from_pandas(df).repartition(parts)
    mean, comps, vals = fit_pca(ds, "embedding", k=6)
    rmean, rcomps, rvals = _reference_pca(df, 6)
    # float32 storage of the embeddings → modest tolerance
    assert np.allclose(mean, rmean, atol=1e-4)
    assert np.allclose(vals, rvals, rtol=1e-5)
    assert np.allclose(comps, rcomps, atol=1e-6)


def test_fit_pca_spectral_invariants():
    df = _emb_df(seed=9)
    mean, comps, vals = fit_pca(ray.data.from_pandas(df), "embedding", k=5)
    # orthonormal components, descending nonnegative eigenvalues
    assert np.allclose(comps.T @ comps, np.eye(5), atol=1e-8)
    assert (np.diff(vals) <= 1e-9).all() and (vals >= -1e-9).all()


def test_pca_project_variance_matches_eigvals():
    df = _emb_df(seed=11)
    ds = ray.data.from_pandas(df)
    mean, comps, vals = fit_pca(ds, "embedding", k=4)
    out = pca_project(ds, mean, comps, "embedding").to_pandas()
    y = np.stack(out["pca"].to_numpy()).astype(np.float64)
    # projected coordinates: zero mean, per-axis variance == eigenvalue
    assert np.allclose(y.mean(axis=0), 0.0, atol=1e-3)
    assert np.allclose(y.var(axis=0, ddof=1), vals, rtol=1e-3)


def test_pca_project_whiten_unit_variance():
    df = _emb_df(seed=21)
    ds = ray.data.from_pandas(df)
    mean, comps, vals = fit_pca(ds, "embedding", k=4)
    out = pca_project(ds, mean, comps, "embedding",
                      whiten_eigvals=vals).to_pandas()
    y = np.stack(out["pca"].to_numpy()).astype(np.float64)
    assert np.allclose(y.var(axis=0, ddof=1), 1.0, rtol=1e-3)


def test_fit_pca_rejects_tiny_input():
    df = _emb_df(n=1)
    with pytest.raises(ValueError):
        fit_pca(ray.data.from_pandas(df), "embedding", k=2)
