"""Distributed k-means (stages/cluster.py).

Blob worlds are deterministic (seeded numpy), well-separated, so cluster
MEMBERSHIP must be exactly recovered regardless of float reduce order.
"""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from timezonemap_ray.stages.cluster import (
    _pp_init, kmeans_assign, kmeans_cluster_profile, kmeans_fit)


def _blob_table(centers, per_blob=60, dim=8, spread=0.05, seed=3):
    rng = np.random.default_rng(seed)
    vecs, labels = [], []
    for li, c in enumerate(centers):
        base = np.zeros(dim)
        base[: len(c)] = c
        pts = base + rng.normal(scale=spread, size=(per_blob, dim))
        vecs.append(pts)
        labels.extend([li] * per_blob)
    mat = np.concatenate(vecs)
    return pa.table({
        "vec_id": pa.array(np.arange(mat.shape[0], dtype=np.int64)),
        "embedding": pa.array(list(mat)),
        "label": pa.array(np.asarray(labels, dtype=np.int64))}), mat


CENTERS = [(0.0, 0.0), (10.0, 0.0), (0.0, 10.0)]


def test_kmeans_recovers_separated_blobs(ray_session):
    t, mat = _blob_table(CENTERS)
    ds = rd.from_arrow(t).repartition(6)
    cents, info = kmeans_fit(ds, k=3, iters=25, seed=7)
    assert cents.shape == (3, 8)
    assert info["iters"] <= 25 and info["counts"].sum() == t.num_rows
    # each true blob center has exactly one centroid within spread-distance
    got = []
    for c in CENTERS:
        tgt = np.zeros(8)
        tgt[:2] = c
        d = np.sqrt(((cents - tgt) ** 2).sum(axis=1))
        assert d.min() < 0.5
        got.append(int(d.argmin()))
    assert sorted(got) == [0, 1, 2]  # distinct centroids, one per blob

    # membership purity: every vector assigned to its blob's centroid
    out = pa.concat_tables([b for b in kmeans_assign(ds, cents)
                            .iter_batches(batch_format="pyarrow")])
    by_id = out.sort_by("vec_id")
    assign = by_id["cluster_id"].to_numpy(zero_copy_only=False)
    labels = by_id["label"].to_numpy(zero_copy_only=False)
    for li in range(3):
        members = assign[labels == li]
        assert (members == members[0]).all()
        assert members[0] == got[li]


def test_kmeans_early_stop_and_sse(ray_session):
    t, mat = _blob_table(CENTERS)
    ds = rd.from_arrow(t).repartition(4)
    cents, info = kmeans_fit(ds, k=3, iters=50, seed=7, tol=1e-10)
    assert info["iters"] < 50  # converged well before the cap
    # SSE equals the true within-cluster squared error at the fitted cents
    a = np.argmin(((mat[:, None, :] - cents[None]) ** 2).sum(-1), axis=1)
    want = sum(((mat[a == j] - cents[j]) ** 2).sum() for j in range(3))
    assert info["sse"] == pytest.approx(want, rel=1e-9)


def test_kmeans_empty_clusters_keep_position(ray_session):
    # 2 distinct points, k=5: 3 clusters must stay empty, no NaN anywhere
    mat = np.array([[0.0] * 4, [9.0] * 4])
    t = pa.table({"embedding": pa.array(list(np.repeat(mat, 20, axis=0)))})
    ds = rd.from_arrow(t)
    cents, info = kmeans_fit(ds, k=5, iters=10, seed=1,
                             init_sample_n=40)
    assert np.isfinite(cents).all()
    assert (np.sort(info["counts"])[-2:] == [20, 20]).all()
    assert (info["counts"] == 0).sum() == 3


def test_kmeans_fewer_rows_than_k(ray_session):
    t = pa.table({"embedding": pa.array([[1.0, 2.0], [3.0, 4.0]])})
    cents, info = kmeans_fit(rd.from_arrow(t), k=8, iters=3, seed=2)
    assert cents.shape == (2, 2)


def test_pp_init_deterministic():
    x = np.random.default_rng(0).normal(size=(100, 4))
    a = _pp_init(x, 5, seed=11)
    b = _pp_init(x, 5, seed=11)
    assert (a == b).all()
    # duplicate-point corner: all mass at one point still yields k rows
    dup = np.zeros((10, 3))
    c = _pp_init(dup, 4, seed=1)
    assert c.shape == (4, 3) and (c == 0).all()


def test_cluster_profile_stable_shape(ray_session):
    t, _ = _blob_table(CENTERS, per_blob=40)
    prof = kmeans_cluster_profile(rd.from_arrow(t).repartition(3), k=3,
                                  seed=7)
    assert prof.column_names == ["rank", "n", "mean_dist2"]
    assert prof.num_rows == 3
    assert prof["n"].to_pylist() == [40, 40, 40]
    assert all(v >= 0 for v in prof["mean_dist2"].to_pylist())


def test_ivf_full_trainer_recall(ray_session, tmp_path):
    # full-corpus trainer routes well-separated blobs into pure partitions
    from timezonemap_ray.stages.ann import brute_topk, ivf_build, ivf_query
    # IVF routes in COSINE space — blobs must be distinct DIRECTIONS
    # (an origin-centered blob normalizes to random directions)
    t, mat = _blob_table([(10.0, 0.0), (0.0, 10.0), (7.0, 7.0)],
                         per_blob=50, dim=8)
    ds = rd.from_arrow(t).repartition(4)
    cents = ivf_build(ds, str(tmp_path / "ivf"), n_centroids=3,
                      trainer="full", seed=7)
    assert cents.shape == (3, 8)
    qids = np.array([0, 1, 2], dtype=np.int64)  # one blob → one probe dir
    qmat = mat[[0, 1, 2]]
    got, frac = ivf_query(str(tmp_path / "ivf"), qids, qmat, k=5, nprobe=1)
    want = brute_topk(rd.from_arrow(t), qids, qmat, k=5)
    assert frac < 1.0  # pruning actually happened
    assert got.sort_by([("query_id", "ascending"), ("rank", "ascending")]) \
        .select(["query_id", "vec_id"]).equals(
            want.sort_by([("query_id", "ascending"), ("rank", "ascending")])
            .select(["query_id", "vec_id"]))


def test_kmeans_tolerates_empty_blocks(ray_session):
    t, _ = _blob_table(CENTERS, per_blob=20)
    ds = rd.from_arrow(t).repartition(200)  # 60 rows → mostly empty blocks
    cents, info = kmeans_fit(ds, k=3, iters=10, seed=7)
    assert np.isfinite(cents).all() and info["counts"].sum() == t.num_rows
    out = pa.concat_tables([b for b in kmeans_assign(ds, cents)
                            .iter_batches(batch_format="pyarrow")])
    assert out.num_rows == t.num_rows


def test_kmeans_int_matches_sql_twin_and_partitioning(ray_session):
    """Integer-exact Lloyd's: SQL-twin bit parity on synthetic separable
    clusters + partition independence + empty-cluster carryover."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from timezonemap_ray.stages.cluster import kmeans_int, kmeans_int_sql
    rng = np.random.default_rng(2)
    centers = np.array([[0.0, 0.0, 0.0], [5.0, 5.0, 5.0], [-5.0, 5.0, 0.0]])
    pts = np.concatenate([c + 0.3 * rng.standard_normal((40, 3))
                          for c in centers])
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(pts)), type=pa.int64()),
        "embedding": pa.array([row.astype(np.float32) for row in pts],
                              type=pa.list_(pa.float32()))})
    for parts in (1, 6):
        got = kmeans_int(rd.from_arrow(tbl).repartition(parts),
                         k=3, iters=3).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        con = duckdb.connect()
        con.register("embeddings", tbl)
        want = con.execute(kmeans_int_sql(k=3, iters=3)
                           + " ORDER BY vec_id").df()
        pd.testing.assert_frame_equal(got, want, check_dtype=True)
    # well-separated data: membership recovers the generator blocks
    assert got["cluster"][:40].nunique() == 1
    assert got["cluster"][40:80].nunique() == 1
    assert got["cluster"][80:].nunique() == 1
    assert got["cluster"].nunique() == 3


def test_kmeans_int_empty_cluster_carryover(ray_session):
    """A far-away init centroid that captures nothing keeps its previous
    coordinates (engine) == COALESCE carryover (SQL)."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from timezonemap_ray.stages.cluster import kmeans_int, kmeans_int_sql
    # ids 0,1 near origin; id 2 is an outlier captured by nobody after
    # the first update pulls centroid 2 toward... construct: k=3 over 3
    # coincident groups where one init vector is a duplicate of another,
    # leaving its cluster empty from iteration 1 on
    vecs = [[0.0, 0.0], [0.0, 0.0], [9.0, 9.0],
            [0.1, 0.1], [9.1, 9.1], [8.9, 9.0]]
    tbl = pa.table({
        "vec_id": pa.array(np.arange(6), type=pa.int64()),
        "embedding": pa.array([np.asarray(v, dtype=np.float32)
                               for v in vecs], type=pa.list_(pa.float32()))})
    got = kmeans_int(rd.from_arrow(tbl), k=3, iters=2).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("embeddings", tbl)
    want = con.execute(kmeans_int_sql(k=3, iters=2) + " ORDER BY vec_id").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=True)


def test_prune_prototypes_int_matches_sql_twin(ray_session):
    """Prototypicality pruning: SQL bit parity at two partitionings;
    exactly floor(m/4) closest-to-centroid rows drop per cluster."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from timezonemap_ray.stages.cluster import (prune_prototypes_int,
                                                prune_prototypes_int_sql)
    rng = np.random.default_rng(7)
    centers = np.array([[0.0, 0.0, 0.0], [5.0, 5.0, 5.0], [-5.0, 5.0, 0.0]])
    pts = np.concatenate([c + 0.4 * rng.standard_normal((21, 3))
                          for c in centers])
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(pts)), type=pa.int64()),
        "embedding": pa.array([row.astype(np.float32) for row in pts],
                              type=pa.list_(pa.float32()))})
    con = duckdb.connect()
    con.register("embeddings", tbl)
    want = con.execute(prune_prototypes_int_sql(k=3, iters=2)
                       + " ORDER BY vec_id").df()
    for parts in (1, 6):
        got = prune_prototypes_int(rd.from_arrow(tbl).repartition(parts),
                                   k=3, iters=2).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=True)
    # well-separated blobs of 21 -> clusters of 21, each drops
    # floor(21/4)=5: 48 rows survive, and every cluster's kept minimum
    # d2 exceeds at least one dropped d2 (the closest were removed)
    assert len(got) == 63 - 3 * 5
    full = con.execute("SELECT * FROM (" + __import__(
        "timezonemap_ray.stages.cluster",
        fromlist=["kmeans_int_sql"]).kmeans_int_sql(k=3, iters=2) + ")").df()
    for cid, grp in full.groupby("cluster"):
        kept = got[got["cluster"] == cid]
        dropped = grp[~grp["vec_id"].isin(kept["vec_id"])]
        assert len(dropped) == len(grp) // 4
        if len(dropped) and len(kept):
            assert dropped["d2_int"].max() <= kept["d2_int"].min()


def test_prune_prototypes_int_tiny_groups(ray_session):
    """m < drop_den clusters drop nothing (floor(m·1/4) = 0); ties on
    d2 break by id — both sides must agree."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from timezonemap_ray.stages.cluster import (prune_prototypes_int,
                                                prune_prototypes_int_sql)
    # two coincident points (d2 tie) + one far point, k=2
    vecs = [[0.0, 0.0], [0.0, 0.0], [9.0, 9.0]]
    tbl = pa.table({
        "vec_id": pa.array([7, 3, 5], type=pa.int64()),
        "embedding": pa.array([np.asarray(v, dtype=np.float32)
                               for v in vecs], type=pa.list_(pa.float32()))})
    con = duckdb.connect()
    con.register("embeddings", tbl)
    want = con.execute(prune_prototypes_int_sql(k=2, iters=1, drop_num=1,
                                                drop_den=2)
                       + " ORDER BY vec_id").df()
    got = prune_prototypes_int(rd.from_arrow(tbl), k=2, iters=1,
                               drop_num=1, drop_den=2).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=True)


def test_int_assign_blas_path_bit_equals_int64_kernel():
    """_int_assign's exact-float64 expansion must reproduce the int64
    broadcast-subtract kernel bit-for-bit (incl. argmin tie-breaks) on
    adversarial near-tie inputs, and the guard must route huge values to
    the fallback."""
    import numpy as np
    from timezonemap_ray.stages.cluster import _int_assign

    rng = np.random.default_rng(3)
    for trial in range(20):
        n, d, k = int(rng.integers(1, 200)), int(rng.integers(1, 80)), \
            int(rng.integers(1, 9))
        x = rng.integers(-10**5, 10**5, (n, d)).astype(np.int64)
        c = rng.integers(-10**5, 10**5, (k, d)).astype(np.int64)
        # force exact ties: duplicate a centroid and plant rows ON
        # centroids
        if k >= 2:
            c[k - 1] = c[0]
        x[0] = c[0]
        ref_d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        ref_a = np.argmin(ref_d2, axis=1)
        a, d2a = _int_assign(x, c, need_d2=True)
        assert np.array_equal(a, ref_a)
        assert np.array_equal(d2a, ref_d2[np.arange(n), ref_a])
        assert d2a.dtype == np.int64

    # guard: values past the 2^53 bound use the int64 fallback and stay
    # exact
    big = np.array([[2**31, -2**31]], dtype=np.int64)
    cb = np.array([[2**31, 2**31], [-2**31, -2**31]], dtype=np.int64)
    a, d2a = _int_assign(big, cb, need_d2=True)
    want = ((big[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
    assert a[0] == int(np.argmin(want[0]))
    assert d2a[0] == want[0, a[0]]

    # empty block
    a, d2a = _int_assign(np.zeros((0, 4), dtype=np.int64),
                         np.zeros((2, 4), dtype=np.int64), need_d2=True)
    assert a.size == 0 and d2a.size == 0
