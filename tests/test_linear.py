"""Distributed ridge regression (``stages/linear.py``): exact normal
equations, partition independence, numpy parity, predict stage."""

import numpy as np
import pyarrow as pa
import pytest

from timezonemap_ray.stages import linear


def _make_ds(x, y, n_blocks=1):
    import ray.data as rd
    d = x.shape[1]
    flat = pa.array(x.reshape(-1))
    tbl = pa.table({"vec": pa.FixedSizeListArray.from_arrays(flat, d),
                    "y": pa.array(y)})
    ds = rd.from_arrow(tbl)
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


@pytest.fixture(scope="module")
def int_data():
    rng = np.random.default_rng(11)
    x = rng.integers(-9, 10, size=(500, 6)).astype(np.int64)
    w_true = np.array([3, -1, 0, 2, 5, -4], dtype=np.int64)
    y = x @ w_true + rng.integers(-2, 3, size=500)
    return x, y.astype(np.int64)


def test_normal_equations_exact(ray_session, int_data):
    x, y = int_data
    g, b, n = linear.normal_equations(_make_ds(x, y), "vec", "y", 6)
    assert np.array_equal(g, x.T @ x)
    assert np.array_equal(b, x.T @ y)
    assert n == 500


def test_partition_independence_bit_exact(ray_session, int_data):
    """Integer sums are associative: any block layout must give the SAME
    statistics and therefore bit-identical solved weights."""
    x, y = int_data
    fits = [linear.ridge_fit(_make_ds(x, y, nb), "vec", "y", 6, l2=0.5)
            for nb in (1, 7, 23)]
    for f in fits[1:]:
        assert np.array_equal(f["gram"], fits[0]["gram"])
        assert np.array_equal(f["xty"], fits[0]["xty"])
        assert f["weights"].tobytes() == fits[0]["weights"].tobytes()


def test_ridge_matches_numpy(ray_session, int_data):
    x, y = int_data
    fit = linear.ridge_fit(_make_ds(x, y, 5), "vec", "y", 6, l2=2.0)
    a = (x.T @ x).astype(np.float64) + 2.0 * np.eye(6)
    w_ref = np.linalg.solve(a, (x.T @ y).astype(np.float64))
    assert np.allclose(fit["weights"], w_ref, rtol=0, atol=0)  # same inputs
    # near-noiseless data recovers the generating weights
    assert np.allclose(fit["weights"], [3, -1, 0, 2, 5, -4], atol=0.1)


def test_float_path(ray_session):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(400, 4))
    w_true = np.array([1.5, -2.0, 0.25, 3.0])
    y = x @ w_true + rng.normal(scale=0.01, size=400)
    fit = linear.ridge_fit(_make_ds(x, y, 4), "vec", "y", 4,
                           l2=1e-6, integer=False)
    assert np.allclose(fit["weights"], w_true, atol=0.01)


def test_predict_stage(ray_session, int_data):
    x, y = int_data
    fit = linear.ridge_fit(_make_ds(x, y, 3), "vec", "y", 6, l2=0.5)
    ds = _make_ds(x, y, 3).map_batches(
        linear.predict_stage(fit["weights"], "vec"),
        batch_format="pyarrow")
    pdf = ds.to_pandas()
    pred = np.asarray(pdf["prediction"])
    # in-sample fit on near-noiseless data is tight
    resid = pred - np.asarray(pdf["y"], dtype=np.float64)
    assert np.sqrt((resid ** 2).mean()) < 2.0


def test_empty_and_single_row(ray_session):
    x = np.array([[2, 3]], dtype=np.int64)
    y = np.array([7], dtype=np.int64)
    g, b, n = linear.normal_equations(_make_ds(x, y), "vec", "y", 2)
    assert np.array_equal(g, [[4, 6], [6, 9]])
    assert np.array_equal(b, [14, 21])
    assert n == 1


def test_empty_blocks_in_stream(ray_session):
    """Ray Data emits empty blocks (filters, more read tasks than rows);
    the partial/combine kernels must pass them through instead of dying
    in reshape (ADVICE r4 low)."""
    import ray.data as rd
    x = np.array([[2, 3], [1, -1], [0, 4]], dtype=np.int64)
    y = np.array([7, 1, 2], dtype=np.int64)
    d = x.shape[1]
    tbl = pa.table({"vec": pa.FixedSizeListArray.from_arrays(
        pa.array(x.reshape(-1)), d), "y": pa.array(y)})
    # the kernel itself must accept a 0-row batch (Ray's planner prunes
    # empty blocks in simple plans, but unions/zips can still emit them)
    m = linear._vec_matrix(tbl.slice(0, 0), "vec", np.int64)
    assert m.shape == (0, d)
    # a filter that drops entire blocks produces empty blocks downstream
    ds = rd.from_arrow(tbl).repartition(8) \
        .filter(lambda r: r["y"] >= 0)
    g, b, n = linear.normal_equations(ds, "vec", "y", d)
    assert np.array_equal(g, x.T @ x)
    assert np.array_equal(b, x.T @ y)
    assert n == 3
    # the logistic path shares _vec_matrix; IRLS must survive empties too
    ds01 = rd.from_arrow(pa.table({
        "vec": pa.FixedSizeListArray.from_arrays(
            pa.array(x.reshape(-1)), d),
        "y01": pa.array((y > 1).astype(np.int64))})) \
        .repartition(8).filter(lambda r: r["y01"] >= 0)
    out = linear.logistic_fit(ds01, "vec", "y01", d, max_iter=2)
    assert out["n"] == 3 and len(out["weights"]) == d


@pytest.fixture(scope="module")
def logit_data():
    rng = np.random.default_rng(29)
    x = rng.normal(size=(1200, 5))
    w_true = np.array([2.0, -1.5, 0.0, 1.0, -0.5])
    p = 1.0 / (1.0 + np.exp(-(x @ w_true)))
    y = (rng.uniform(size=1200) < p).astype(np.int64)
    return x, y, w_true


def test_logistic_matches_driver_newton(ray_session, logit_data):
    """Distributed IRLS == a single-process Newton reference on the same
    data (same algorithm, so agreement is near machine precision)."""
    x, y, _ = logit_data
    fit = linear.logistic_fit(_make_ds(x, y, 6), "vec", "y", 5, l2=1.0)
    assert fit["converged"]

    w = np.zeros(5)
    for _ in range(fit["n_iter"] + 5):
        z = x @ w
        p = 1.0 / (1.0 + np.exp(-z))
        s = np.clip(p * (1 - p), 1e-12, None)
        h = (x * s[:, None]).T @ x + 1.0 * np.eye(5)
        g = x.T @ (y - p) - 1.0 * w
        step = np.linalg.solve(h, g)
        nrm = float(np.abs(step).max())
        if nrm > 10.0:
            step *= 10.0 / nrm
        w = w + step
    assert np.allclose(fit["weights"], w, atol=1e-6)


def test_logistic_recovers_direction(ray_session, logit_data):
    x, y, w_true = logit_data
    fit = linear.logistic_fit(_make_ds(x, y, 4), "vec", "y", 5, l2=0.1)
    w = fit["weights"]
    # direction recovered (logistic scale is data-dependent)
    cos = (w @ w_true) / (np.linalg.norm(w) * np.linalg.norm(w_true))
    assert cos > 0.98
    # in-sample accuracy well above chance
    pred = (x @ w > 0).astype(np.int64)
    assert (pred == y).mean() > 0.85


def test_logistic_gradient_zero_at_solution(ray_session, logit_data):
    """First-order optimality: at the fitted weights the regularized
    gradient must vanish — independent of how the reference iterated."""
    x, y, _ = logit_data
    fit = linear.logistic_fit(_make_ds(x, y, 3), "vec", "y", 5, l2=1.0)
    w = fit["weights"]
    p = 1.0 / (1.0 + np.exp(-(x @ w)))
    grad = x.T @ (y - p) - 1.0 * w
    assert np.abs(grad).max() < 1e-4


def test_irls_step_int_partition_independent(ray_session):
    """The integer IRLS-step statistics are associative sums: any
    repartitioning yields bit-identical (H, g, n); and they match a
    single-machine numpy replay exactly."""
    import ray.data as rd

    from timezonemap_ray.stages.linear import IRLS_W0, irls_step_int

    rng = np.random.default_rng(42)
    n, d, q = 3000, 8, 1000
    x = rng.integers(-50, 120, size=(n, d)).astype(np.int64)
    y = rng.integers(0, 2, size=n).astype(np.int64)
    tbl = pa.table({
        "counts": pa.FixedSizeListArray.from_arrays(
            pa.array(x.reshape(-1)), d),
        "y": pa.array(y),
    })
    ds = rd.from_arrow(tbl)
    h1, g1, n1 = irls_step_int(ds, "counts", "y")
    h2, g2, n2 = irls_step_int(ds.repartition(13), "counts", "y")
    assert (h1 == h2).all() and (g1 == g2).all() and n1 == n2 == n

    # numpy replay
    w0 = np.asarray(IRLS_W0, dtype=np.int64)
    z = x @ w0
    az = np.abs(z)
    p = (q * (1 + az + z)) // (2 * (1 + az))
    s = p * (q - p)
    assert (h1 == (x * s[:, None]).T @ x).all()
    assert (g1 == x.T @ (y * q - p)).all()
    assert (p >= 0).all() and (p <= q).all()
