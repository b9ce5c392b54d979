"""pagerank_int: exact-integer PageRank — naive-loop equivalence,
partitioning-independence, and SQL-twin parity."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest


def _naive_pagerank_int(edges, iters=3, num=85, den=100, scale=1_000_000):
    """Single-threaded reference: same integer recurrence, plain dicts."""
    edges = sorted(set(edges))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    r = {n: scale for n in nodes}
    base = (scale * (den - num)) // den
    for _ in range(iters):
        m = {n: 0 for n in nodes}
        for u, v in edges:
            m[v] += r[u] // outdeg[u]
        r = {n: base + (num * m[n]) // den for n in nodes}
    return r


def _random_edges(rng, n_nodes=40, n_edges=160):
    e = rng.integers(0, n_nodes, size=(n_edges, 2))
    e = e[e[:, 0] != e[:, 1]]
    # make every node a source so nothing dangles (documented contract)
    loops = np.stack([np.arange(n_nodes), (np.arange(n_nodes) + 1) % n_nodes],
                     axis=1)
    return np.concatenate([e, loops])


def test_pagerank_matches_naive_and_is_partition_independent(ray_session):
    import ray.data as rd

    from timezonemap_ray.stages.graph import pagerank_int
    rng = np.random.default_rng(7)
    e = _random_edges(rng)
    want = _naive_pagerank_int([(int(u), int(v)) for u, v in e])
    tbl = pa.table({"src": pa.array(e[:, 0], type=pa.int64()),
                    "dst": pa.array(e[:, 1], type=pa.int64())})
    for parts in (1, 7):
        # driver plan, broadcast plan, AND join plan — identical output
        for bmax, dmax in ((5_000_000, 5_000_000), (5_000_000, 0), (0, 0)):
            got = pagerank_int(rd.from_arrow(tbl).repartition(parts),
                               iters=3, broadcast_nodes_max=bmax,
                               driver_edges_max=dmax).to_pandas()
            got_map = dict(zip(got["node_id"], got["rank_int"]))
            assert got_map == want, (parts, bmax, dmax)


def test_pagerank_sql_twin_bit_parity(ray_session):
    import ray.data as rd

    from timezonemap_ray.stages.graph import pagerank_int, pagerank_int_sql
    rng = np.random.default_rng(11)
    e = np.unique(_random_edges(rng, n_nodes=25, n_edges=90), axis=0)
    tbl = pa.table({"src": pa.array(e[:, 0], type=pa.int64()),
                    "dst": pa.array(e[:, 1], type=pa.int64())})
    got = pagerank_int(rd.from_arrow(tbl), iters=4).to_pandas() \
        .sort_values("node_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("edge_tbl", tbl)
    sql = pagerank_int_sql(
        "SELECT DISTINCT src, dst FROM edge_tbl", iters=4)
    want = con.execute(sql + " ORDER BY node_id").df()
    assert got["node_id"].tolist() == want["node_id"].tolist()
    assert got["rank_int"].tolist() == want["rank_int"].tolist()


def test_pagerank_mass_bounds(ray_session):
    """With no dangling nodes, total integer mass stays within the floor
    error envelope: N·scale ≥ Σr ≥ N·scale − iters·(E + N)·den."""
    import ray.data as rd

    from timezonemap_ray.stages.graph import pagerank_int
    rng = np.random.default_rng(3)
    e = np.unique(_random_edges(rng, n_nodes=30, n_edges=120), axis=0)
    tbl = pa.table({"src": pa.array(e[:, 0], type=pa.int64()),
                    "dst": pa.array(e[:, 1], type=pa.int64())})
    got = pagerank_int(rd.from_arrow(tbl), iters=3).to_pandas()
    n, scale = len(got), 1_000_000
    total = int(got["rank_int"].sum())
    assert total <= n * scale
    assert total >= n * scale - 3 * (len(e) + n) * 100


def _naive_triangles(edges):
    ce = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    adj = {}
    for a, b in ce:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {n: 0 for n in adj}
    for a, b in ce:
        for c in adj[a] & adj[b]:
            if a < b < c:
                ...
    # direct: for each canonical triple x<y<z with all three edges
    nodes = sorted(adj)
    for x, y in ce:
        common = adj[x] & adj[y]
        for z in common:
            if z > y:
                counts[x] += 1
                counts[y] += 1
                counts[z] += 1
    return counts


def test_triangle_counts_matches_naive_and_sql(ray_session):
    import ray.data as rd

    from timezonemap_ray.stages.graph import (triangle_counts,
                                              triangle_counts_sql)
    rng = np.random.default_rng(5)
    e = rng.integers(0, 30, size=(200, 2))
    e = e[e[:, 0] != e[:, 1]]
    want = _naive_triangles([(int(a), int(b)) for a, b in e])
    tbl = pa.table({"src": pa.array(e[:, 0], type=pa.int64()),
                    "dst": pa.array(e[:, 1], type=pa.int64())})
    for parts in (1, 5):
        for bmax in (5_000_000, 0):  # broadcast plan AND join plan
            got = triangle_counts(rd.from_arrow(tbl).repartition(parts),
                                  broadcast_edges_max=bmax).to_pandas()
            got_map = dict(zip(got["node_id"], got["n_triangles"]))
            assert got_map == want, (parts, bmax)
    con = duckdb.connect()
    con.register("edge_tbl", tbl)
    sql = triangle_counts_sql("SELECT src, dst FROM edge_tbl")
    want_sql = dict(con.execute(sql).fetchall())
    assert got_map == want_sql


def test_triangle_counts_no_triangles(ray_session):
    """A path graph has zero triangles — every node reports 0."""
    import ray.data as rd

    from timezonemap_ray.stages.graph import triangle_counts
    tbl = pa.table({"src": pa.array([0, 1, 2, 3], type=pa.int64()),
                    "dst": pa.array([1, 2, 3, 4], type=pa.int64())})
    for bmax in (5_000_000, 0):
        got = triangle_counts(rd.from_arrow(tbl),
                              broadcast_edges_max=bmax).to_pandas()
        assert sorted(got["node_id"].tolist()) == [0, 1, 2, 3, 4]
        assert sorted(got["n_triangles"].tolist()) == [0] * 5


def test_cooccur_edges_singleton_partitions(ray_session):
    """Regression (r4 review): a hash partition whose groups are ALL
    singletons yields zero pairs — the per-partition dedup must not
    index an empty array with a length-1 mask."""
    import ray.data as rd

    from timezonemap_ray.stages.graph import cooccur_edges
    tbl = pa.table({"g": pa.array([0, 0, 1, 2, 3], type=pa.int64()),
                    "i": pa.array([7, 8, 10, 20, 30], type=pa.int64())})
    got = cooccur_edges(rd.from_arrow(tbl), "g", "i").to_pandas()
    assert sorted(map(tuple, got[["src", "dst"]].to_numpy())) == [(7, 8)]


def test_cooccur_edges_giant_group_chunked(ray_session):
    """A single group whose pair count exceeds WEDGE_PAIR_BUDGET is
    enumerated in bounded i-row slices — same output as the small path."""
    import itertools

    import ray.data as rd

    from timezonemap_ray.stages import graph
    old = graph.WEDGE_PAIR_BUDGET
    graph.WEDGE_PAIR_BUDGET = 16  # force the giant-group path
    try:
        items = list(range(12))  # C(12,2)=66 > 16
        tbl = pa.table({"g": pa.array([5] * 12 + [6, 6], type=pa.int64()),
                        "i": pa.array(items + [100, 101], type=pa.int64())})
        got = graph.cooccur_edges(rd.from_arrow(tbl), "g", "i").to_pandas()
        want = sorted(itertools.combinations(items, 2)) + [(100, 101)]
        assert sorted(map(tuple, got[["src", "dst"]].to_numpy())) \
            == sorted(want)
    finally:
        graph.WEDGE_PAIR_BUDGET = old


def test_pagerank_big_node_ids_all_plans(ray_session):
    """Node ids ≥ 2^31 route the driver plan through the dense-code
    remap (sorted-unique + parallel searchsorted); all three plans must
    still match the naive reference bit-for-bit."""
    import ray.data as rd

    from timezonemap_ray.stages.graph import pagerank_int
    rng = np.random.default_rng(17)
    e = _random_edges(rng) + (3 << 31)  # every id above the packing bound
    want = _naive_pagerank_int([(int(u), int(v)) for u, v in e])
    tbl = pa.table({"src": pa.array(e[:, 0], type=pa.int64()),
                    "dst": pa.array(e[:, 1], type=pa.int64())})
    for bmax, dmax in ((5_000_000, 5_000_000), (5_000_000, 0), (0, 0)):
        got = pagerank_int(rd.from_arrow(tbl).repartition(3),
                           iters=3, broadcast_nodes_max=bmax,
                           driver_edges_max=dmax).to_pandas()
        assert dict(zip(got["node_id"], got["rank_int"])) == want, \
            (bmax, dmax)


def test_par_searchsorted_matches_numpy_across_chunk_boundaries():
    """The multithreaded probe helper is exactly np.searchsorted at every
    size class, including probes absent from the key table."""
    from timezonemap_ray.stages.graph import _par_searchsorted
    rng = np.random.default_rng(23)
    keys = np.sort(rng.choice(1 << 40, 5_000, replace=False)).astype(np.int64)
    for n in (0, 1, 999, 1_000, 1_001, 10_000):
        vals = np.concatenate([
            rng.choice(keys, n // 2 + 1),
            rng.integers(0, 1 << 40, size=n - n // 2 - 1 if n else 0),
        ])[:n].astype(np.int64)
        got = _par_searchsorted(keys, vals, chunk=1_000)
        assert got.dtype == np.int64
        assert (got == np.searchsorted(keys, vals)).all()


def test_triangle_counts_maximal_packable_id(ray_session):
    """Apex id 2^31-1 (the largest _validate_packable_ids allows): the
    broadcast plan's segment upper-bound probe `(u + 1) << 32`
    overflowed int64 and silently dropped that apex's wedges
    (review-found) — now probed via side='right' on (u << 32) | 0xFFFF_FFFF."""
    import ray.data as rd

    from timezonemap_ray.stages.graph import triangle_counts
    M = 2**31 - 1
    # M has the LOWEST degree, so orientation points both its edges away
    # from M and M is the wedge apex of the (M, 10, 20) triangle
    e = [(M, 10), (M, 20), (10, 20), (10, 30), (20, 40), (30, 40),
         (10, 40)]
    tbl = pa.table({"src": pa.array([a for a, _ in e], type=pa.int64()),
                    "dst": pa.array([b for _, b in e], type=pa.int64())})
    want = _naive_triangles(e)
    got = triangle_counts(rd.from_arrow(tbl),
                          broadcast_edges_max=5_000_000).to_pandas()
    got_map = dict(zip(got["node_id"], got["n_triangles"]))
    assert got_map == want
    assert want[M] >= 1  # the boundary apex really is in a triangle
