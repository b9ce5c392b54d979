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
        got = pagerank_int(rd.from_arrow(tbl).repartition(parts),
                           iters=3).to_pandas()
        got_map = dict(zip(got["node_id"], got["rank_int"]))
        assert got_map == want, parts


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
