"""Distributed PCA over an embedding column — exact, two passes.

The classic embedding-pipeline pre-step (whitening / dimensionality
reduction before ANN, clustering or near-dup detection), shaped for
100 TB:

- **Moment partials, not vectors, reach the driver.** Pass 1 is one
  ``map_batches`` emitting per block (n, Σx (d), ΣxᵀX (d×d)) — O(d²)
  numbers regardless of block size — folded into an O(d²) accumulator as
  they stream. The exact covariance then comes from the moment identity
  cov = (ΣxᵀX − n·μμᵀ)/(n−1); no centering pass over the data is needed.
- **Eigendecomposition on the driver** of the tiny d×d symmetric matrix
  (``np.linalg.eigh``); component signs are canonicalized (largest-|.|
  coordinate positive) so results are reproducible run to run.
- **Projection is a streaming broadcast transform.** The (d, k) component
  matrix ships once via ``ray.put``; pass 2 appends the k-dim projection
  per row with one matmul per block.

d×d float64 partials bound the driver fold at d ≲ 10⁴ (768-dim
embeddings: 4.7 MB per partial — trivial).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..vecs import list_column_to_matrix


def pca_fit(ds, vec_col: str = "embedding", k: int | None = None):
    """Exact covariance PCA. Returns ``(components (k, d), info)`` where
    ``info`` has ``mean`` (d,), ``explained_variance`` (k,, descending
    eigenvalues) and ``n`` (rows seen). ``k=None`` keeps all d
    components."""
    tot_n = 0
    tot_sum = None
    tot_outer = None
    import pyarrow.compute as pc
    for t in ds.map_batches(_moment_partial(vec_col),
                            batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        if t.num_rows == 0:
            continue
        # flatten+reshape, no per-row Python: a 768-dim partial is ~590k
        # floats per block — to_pylist() would churn them all through
        # Python objects on the driver (review-found)
        ss = pc.list_flatten(t["s"]).to_numpy(zero_copy_only=False)
        oo = pc.list_flatten(t["o"]).to_numpy(zero_copy_only=False)
        d = ss.size // t.num_rows
        if tot_sum is None:
            tot_sum = np.zeros(d)
            tot_outer = np.zeros((d, d))
        tot_n += int(pc.sum(t["n"]).as_py())
        tot_sum += ss.reshape(t.num_rows, d).sum(axis=0)
        tot_outer += oo.reshape(t.num_rows, d, d).sum(axis=0)
    if tot_n < 2:
        raise ValueError("pca_fit needs at least 2 rows")
    d = tot_sum.size
    mean = tot_sum / tot_n
    cov = (tot_outer - tot_n * np.outer(mean, mean)) / (tot_n - 1)
    cov = (cov + cov.T) / 2.0  # exact symmetry for eigh
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order]
    k = d if k is None else min(k, d)
    comps = evecs[:, :k].T.copy()  # (k, d)
    # canonical sign: the largest-|coordinate| of each component positive
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return comps, {"mean": mean,
                   "explained_variance": np.maximum(evals[:k], 0.0),
                   "n": tot_n}


def _moment_partial(vec_col: str):
    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"n": pa.array([], type=pa.int64()),
                             "s": pa.array([], type=pa.list_(pa.float64())),
                             "o": pa.array([], type=pa.list_(pa.float64()))})
        v = list_column_to_matrix(b[vec_col])
        return pa.table({
            "n": pa.array([v.shape[0]], type=pa.int64()),
            "s": pa.array([v.sum(axis=0)]),
            "o": pa.array([(v.T @ v).ravel()])})
    return partial


def pca_project(ds, components: np.ndarray, mean: np.ndarray,
                vec_col: str = "embedding", out_col: str = "pca",
                explained_variance: np.ndarray | None = None):
    """Append the k-dim projection ``(x − mean) @ componentsᵀ`` to every
    row — a pure streaming ``map_batches`` over broadcast components.
    Pass ``explained_variance`` (from ``pca_fit``) to WHITEN: each
    coordinate is divided by √eigenvalue (unit variance per component —
    the usual pre-step before cosine ANN / near-dup on anisotropic
    embeddings). Zero-variance components divide by 1."""
    comps = np.asarray(components, dtype=np.float64)
    if explained_variance is not None:
        scale = np.sqrt(np.asarray(explained_variance, dtype=np.float64))
        scale[scale == 0] = 1.0
        comps = comps / scale[:, None]
    ref = ray.put({"c": comps,
                   "m": np.asarray(mean, dtype=np.float64)})

    def project(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column(out_col,
                                   pa.array([], type=pa.list_(pa.float64())))
        p = ray.get(ref)
        v = list_column_to_matrix(b[vec_col])
        proj = (v - p["m"]) @ p["c"].T
        return b.append_column(out_col, pa.array(list(proj)))

    return ds.map_batches(project, batch_format="pyarrow")
