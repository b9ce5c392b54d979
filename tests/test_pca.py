"""Distributed PCA (stages/pca.py) — parity with numpy on the gathered
matrix, streaming-partial exactness, empty-block tolerance."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from timezonemap_ray.stages.pca import pca_fit, pca_project


def _aniso_table(n=400, seed=4):
    rng = np.random.default_rng(seed)
    # anisotropic Gaussian: dominant axis along (1,1,0,...)/sqrt(2)
    base = rng.normal(size=(n, 6)) * np.array([5.0, 2.0, 1.0, .5, .2, .1])
    rot = np.linalg.qr(rng.normal(size=(6, 6)))[0]
    mat = base @ rot + 3.0  # offset mean
    return pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                     "embedding": pa.array(list(mat))}), mat


def test_pca_matches_numpy(ray_session):
    t, mat = _aniso_table()
    ds = rd.from_arrow(t).repartition(7)
    comps, info = pca_fit(ds, k=3)
    assert comps.shape == (3, 6) and info["n"] == mat.shape[0]
    assert np.allclose(info["mean"], mat.mean(axis=0), atol=1e-9)
    cov = np.cov(mat, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order]
    assert np.allclose(info["explained_variance"], evals[:3], rtol=1e-8)
    for i in range(3):
        # eigenvectors match up to sign; engine canonicalizes sign
        dot = abs(float(comps[i] @ evecs[:, i]))
        assert dot == pytest.approx(1.0, abs=1e-8)
    # variance ordering strictly decreasing for this spectrum
    ev = info["explained_variance"]
    assert (np.diff(ev) < 0).all()


def test_pca_project_roundtrip(ray_session):
    t, mat = _aniso_table(n=200, seed=9)
    ds = rd.from_arrow(t).repartition(5)
    comps, info = pca_fit(ds, k=6)  # full rank: projection is a rotation
    out = pca_project(ds, comps, info["mean"]).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    proj = np.array(out["pca"].tolist())
    # distances preserved under full-rank orthonormal projection
    a, b = proj[0] - proj[1], mat[0] - mat[1]
    assert np.linalg.norm(a) == pytest.approx(np.linalg.norm(b), rel=1e-9)
    # projected data is centered
    assert np.allclose(proj.mean(axis=0), 0.0, atol=1e-8)


def test_pca_empty_blocks_and_degenerate(ray_session):
    t, _ = _aniso_table(n=50)
    ds = rd.from_arrow(t).repartition(100)  # mostly empty blocks
    comps, info = pca_fit(ds, k=2)
    assert np.isfinite(comps).all() and info["n"] == 50
    with pytest.raises(ValueError):
        pca_fit(rd.from_arrow(t.slice(0, 1)), k=1)


def test_pca_project_whitened(ray_session):
    t, _ = _aniso_table(n=300, seed=2)
    ds = rd.from_arrow(t).repartition(4)
    comps, info = pca_fit(ds, k=4)
    out = pca_project(ds, comps, info["mean"],
                      explained_variance=info["explained_variance"]) \
        .to_pandas()
    proj = np.array(out["pca"].tolist())
    # whitened: each component has ~unit sample variance
    assert np.allclose(proj.var(axis=0, ddof=1), 1.0, rtol=1e-6)
