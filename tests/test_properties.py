"""Property-based tests (hypothesis) for the geometry kernels and index —
SURVEY §5's property/contract tier."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from timezonemap_ray import geom, worlds
from timezonemap_ray.index import build_index, lookup_batch, lookup_linear_scan
from timezonemap_ray.stages.dedup import (_perm_params, minhash_signature)
from timezonemap_ray.stages.text import token_hashes

finite_lat = st.floats(min_value=-89.9, max_value=89.9)
finite_lng = st.floats(min_value=-179.9, max_value=179.9)


@pytest.fixture(scope="module")
def conf_index():
    return build_index(worlds.conformance_table())


@settings(max_examples=60, deadline=None)
@given(lat=finite_lat, lng=finite_lng)
def test_cell_path_equals_linear_scan_property(lat, lng):
    idx = _IDX
    fast = lookup_batch(idx, [lat], [lng], want_all=True)
    slow = lookup_linear_scan(idx, [lat], [lng], want_all=True)
    assert fast["zone_id"][0] == slow["zone_id"][0]
    assert fast["all_zones"][0] == slow["all_zones"][0]


@settings(max_examples=40, deadline=None)
@given(lat=finite_lat, lng=finite_lng)
def test_scoped_equals_everywhere_property(lat, lng):
    """Reference `TimeZoneMapTest.java:112-123` generalized to random points."""
    idx = _IDX
    scoped = build_index(_TABLE, region=(lat - 1, lng - 1, lat + 1, lng + 1))
    a = lookup_batch(idx, [lat], [lng])["zone_id"][0]
    b = lookup_batch(scoped, [lat], [lng])["zone_id"][0]
    assert a == b


@settings(max_examples=60, deadline=None)
@given(t=st.floats(min_value=0.0, max_value=1.0),
       edge=st.integers(min_value=0, max_value=11))
def test_points_on_edges_are_inside(t, edge):
    """Boundary inclusivity: every point ON any ring segment is contained."""
    xs, ys, rs = _SQUARE
    x1, y1, x2, y2 = (a[edge] for a in geom.all_edges(xs, ys, rs))
    px = x1 + t * (x2 - x1)
    py = y1 + t * (y2 - y1)
    assert geom.points_in_polygon(np.array([px]), np.array([py]), xs, ys, rs)[0]


@settings(max_examples=30, deadline=None)
@given(lat1=finite_lat, lng1=finite_lng, lat2=finite_lat, lng2=finite_lng)
def test_geodesic_symmetry_and_positivity(lat1, lng1, lat2, lng2):
    d1 = float(geom.geodesic_distance_m(lat1, lng1, lat2, lng2))
    d2 = float(geom.geodesic_distance_m(lat2, lng2, lat1, lng1))
    assert d1 >= 0 and np.isfinite(d1)
    assert d1 == pytest.approx(d2, rel=1e-9, abs=1e-6)
    if (lat1, lng1) == (lat2, lng2):
        assert d1 == 0.0


@settings(max_examples=20, deadline=None)
@given(words=st.lists(st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta",
     "iota", "kappa"]), min_size=6, max_size=40),
    drop=st.integers(min_value=0, max_value=3))
def test_minhash_estimates_jaccard(words, drop):
    """Signature agreement ≈ true shingle-set Jaccard (±0.25 at 128 perms)."""
    a_text = " ".join(words)
    b_words = words[drop:]
    b_text = " ".join(b_words)
    ha, hb = token_hashes(a_text), token_hashes(b_text)
    inter = np.intersect1d(ha, hb, assume_unique=True).size
    union = ha.size + hb.size - inter
    true_j = inter / union if union else 1.0
    a, b = _perm_params(128)
    sa = minhash_signature(ha, a, b)
    sb = minhash_signature(hb, a, b)
    est = float((sa == sb).mean())
    assert est == pytest.approx(true_j, abs=0.25)


def test_salting_splits_hot_cells():
    from timezonemap_ray import cells
    rng = np.random.default_rng(2)
    # 10k points in one cell, 100 spread out
    lats = np.concatenate([np.full(10_000, 40.2) + rng.uniform(0, 0.5, 10_000),
                           rng.uniform(-50, 50, 100)])
    lngs = np.concatenate([np.full(10_000, -74.3) + rng.uniform(0, 0.5, 10_000),
                           rng.uniform(-150, 150, 100)])
    cell = cells.cell_ids(lats, lngs, 5.0)
    hot_cell = int(cells.cell_ids([40.4], [-74.1], 5.0)[0])
    salt_counts = {hot_cell: 8}
    row_hash = rng.integers(0, 1 << 62, size=lats.size)
    keys = cells.salted_keys(cell, salt_counts, row_hash)
    hot_keys = set(keys[cell == hot_cell])
    assert len(hot_keys) == 8          # hot cell fans out over 8 keys
    cold = cell != hot_cell
    assert (keys[cold] == cell[cold] * 1024).all()  # cold cells: salt 0


_TABLE = worlds.conformance_table()
_IDX = build_index(_TABLE)
_SQUARE = worlds.square_with_island_zone().flat()


def test_cell_path_equals_linear_scan_adversarial_boundaries():
    """Eps-shell equivalence: points placed ON and within ±BOUNDARY_EPS of
    every zone-envelope edge (the knife-edge cases where the env prefilter,
    rect fast path and pip's d² ≤ eps² on-edge test can disagree under
    float rounding) — cell path must equal the linear scan EXACTLY."""
    import numpy as np
    from timezonemap_ray import worlds
    from timezonemap_ray.index import (build_index, lookup_batch,
                                       lookup_linear_scan)
    idx = build_index(worlds.conformance_table())
    rng = np.random.default_rng(41)
    n = 20000
    edges_lat = np.unique(np.concatenate([idx.envs[:, 1], idx.envs[:, 3]]))
    edges_lng = np.unique(np.concatenate([idx.envs[:, 0], idx.envs[:, 2]]))
    perturb = np.array([0.0, 1e-12, -1e-12, 1e-13, -1e-13, 5e-324, -5e-324])
    lats = rng.choice(edges_lat, n) + rng.choice(perturb, n)
    lngs = rng.choice(edges_lng, n) + rng.choice(perturb, n)
    np.clip(lats, -90, 90, out=lats)
    np.clip(lngs, -180, 180, out=lngs)
    f = lookup_batch(idx, lats, lngs, want_all=True)
    s = lookup_linear_scan(idx, lats, lngs, want_all=True)
    assert f["zone_id"].tolist() == s["zone_id"].tolist()
    assert f["all_zones"] == s["all_zones"]
    # the gathered-PIP hybrid path (normally auto-on only for ≥512-record
    # indexes) must ALSO agree on the same knife-edge points when forced
    h = lookup_batch(idx, lats, lngs, hybrid=True)
    assert h["zone_id"].tolist() == s["zone_id"].tolist()


def test_gathered_pip_straddle_uses_stored_y2():
    """Regression: pack_edge_rows must keep Y2 verbatim — reconstructing it
    as fl(y1 + fl(y2 - y1)) differs from y2 for ~9% of float64 pairs, and a
    query latitude exactly at such a vertex latitude flips crossing parity
    vs pip_edges (review-found). Checks the known-bad pair plus random
    polygons probed at their exact vertex latitudes."""
    import numpy as np
    from timezonemap_ray import geom
    rng = np.random.default_rng(23)
    polys = [np.array([[0.0, 69.98345340514712],
                       [10.0, -63.99591637904119],
                       [20.0, 50.0]])]
    for _ in range(50):
        k = rng.integers(3, 8)
        polys.append(np.column_stack([rng.uniform(-170, 170, k),
                                      rng.uniform(-85, 85, k)]))
    for pts in polys:
        xs, ys = pts[:, 0].copy(), pts[:, 1].copy()
        rs = np.array([0, len(xs)], dtype=np.int64)
        edges = geom.all_edges(xs, ys, rs)
        packed = geom.pack_edge_rows([edges])
        # probe at every vertex latitude, sweeping px across the envelope
        px = np.repeat(np.linspace(xs.min() - 1, xs.max() + 1, 9), len(ys))
        py = np.tile(ys, 9)
        a = geom.pip_edges(px, py, edges)
        b = geom.pip_edges_gathered(
            px, py, np.zeros(px.size, dtype=np.int64), packed)
        assert (a == b).all()


def test_hybrid_path_equals_linear_scan_big_world():
    """The many-record (auto-hybrid) index agrees with the linear scan and
    with the forced per-record path on mixed random + hotspot points."""
    import numpy as np
    from timezonemap_ray import worlds
    from timezonemap_ray.index import (HYBRID_MIN_RECS, build_index,
                                       lookup_batch, lookup_linear_scan)
    idx = build_index(worlds.grid_world_table(n=40, jagged=True),
                      check_version=False)
    assert len(idx) >= HYBRID_MIN_RECS and idx.edge_groups  # auto-on
    rng = np.random.default_rng(7)
    lats = np.concatenate([rng.uniform(-90, 90, 4000),
                           40.71 + rng.uniform(-0.05, 0.05, 4000)])
    lngs = np.concatenate([rng.uniform(-180, 180, 4000),
                           -74.0 + rng.uniform(-0.05, 0.05, 4000)])
    auto = lookup_batch(idx, lats, lngs)          # hybrid (auto)
    per_rec = lookup_batch(idx, lats, lngs, hybrid=False)
    lin = lookup_linear_scan(idx, lats, lngs)
    assert auto["zone_id"].tolist() == lin["zone_id"].tolist()
    assert auto["zone_id"].tolist() == per_rec["zone_id"].tolist()
    assert (auto["matched"] == lin["matched"]).all()


def test_hybrid_rect_fast_path_big_member():
    """The rect fast path inside the hybrid big-member branch
    (`_lookup_hybrid` → `_pip_record` with ``is_rect``): a ≥512-record
    RECT grid world with a ≥``SMALL_SEL``-point hotspot in one rect zone,
    plus knife-edge points exactly on that zone's envelope edges (the
    shell where env arithmetic and pip's d² ≤ eps² can disagree)."""
    import numpy as np
    from timezonemap_ray import worlds
    from timezonemap_ray.index import (HYBRID_MIN_RECS, SMALL_SEL,
                                       build_index, lookup_batch,
                                       lookup_linear_scan)
    idx = build_index(worlds.grid_world_table(n=40, jagged=False),
                      check_version=False)
    assert len(idx) >= HYBRID_MIN_RECS and idx.edge_groups  # auto-on
    # pick a rect record that is NOT one of the holed zones
    rects = np.nonzero(idx.is_rect)[0]
    assert rects.size, "rect grid world must yield is_rect records"
    rec = int(rects[rects.size // 2])
    e = idx.envs[rec]
    rng = np.random.default_rng(11)
    n_in = 4 * SMALL_SEL
    lats = np.concatenate([
        rng.uniform(e[1], e[3], n_in),              # dense interior hotspot
        np.full(64, e[1]), np.full(64, e[3]),       # exact envelope edges
        rng.uniform(-90, 90, 2000)])                # background
    lngs = np.concatenate([
        rng.uniform(e[0], e[2], n_in),
        np.linspace(e[0] - 1e-12, e[2] + 1e-12, 64),
        np.linspace(e[0], e[2], 64),
        rng.uniform(-180, 180, 2000)])
    np.clip(lats, -90, 90, out=lats)
    np.clip(lngs, -180, 180, out=lngs)
    auto = lookup_batch(idx, lats, lngs)            # hybrid (auto)
    per_rec = lookup_batch(idx, lats, lngs, hybrid=False)
    lin = lookup_linear_scan(idx, lats, lngs)
    assert auto["zone_id"].tolist() == lin["zone_id"].tolist()
    assert auto["zone_id"].tolist() == per_rec["zone_id"].tolist()
    # the hotspot really lands in the chosen rect zone
    assert (np.asarray(auto["zone_id"][:n_in], dtype=object)
            == idx.zone_ids[rec]).sum() >= SMALL_SEL


@settings(max_examples=25, deadline=None)
@given(data=st.lists(
    st.tuples(st.integers(0, 5),          # doc id
              st.integers(0, 200),        # start
              st.integers(1, 60)),        # length
    min_size=1, max_size=60))
def test_merge_spans_property(ray_session, data):
    """merge_spans == brute-force interval union for ANY input: output
    regions are disjoint with gaps between them, cover exactly the input
    union, and n_windows sums to the input count."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from timezonemap_ray.stages.spans import merge_spans
    tbl = pa.table({
        "doc_id": pa.array([d for d, _, _ in data], type=pa.int64()),
        "s": pa.array([s for _, s, _ in data], type=pa.int64()),
        "e": pa.array([s + ln for _, s, ln in data], type=pa.int64()),
    })
    out = merge_spans(rd.from_arrow(tbl).repartition(3)).to_pandas()
    assert out["n_windows"].sum() == len(data)
    for doc in set(d for d, _, _ in data):
        ivs = [(s, s + ln) for dd, s, ln in data if dd == doc]
        covered = set()
        for s, e in ivs:
            covered.update(range(s, e))
        regions = out[out["doc_id"] == doc] \
            .sort_values("span_start").to_numpy()
        got_cov = set()
        prev_end = None
        for _, ss, ee, _ in regions:
            assert ss < ee
            if prev_end is not None:
                assert ss > prev_end       # strict gap between regions
            prev_end = ee
            got_cov.update(range(ss, ee))
        assert got_cov == covered


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 10_000), window=st.integers(1, 7))
def test_events_rolling_property(ray_session, tmp_path_factory, seed,
                                 window):
    """Rolling sum/count/mean match a brute per-row window recompute for
    random keys/orders/values."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from timezonemap_ray.pipelines.relational import events_rolling
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 120))
    tbl = pa.table({
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "user_id": pa.array(rng.integers(0, 4, n).astype(np.int64)),
        "ts": pa.array(rng.integers(0, 50, n).astype("datetime64[us]")),
        "value": pa.array(np.round(rng.uniform(-9, 9, n), 2)),
    })
    d = tmp_path_factory.mktemp("roll")
    pq.write_table(tbl, d / "events.parquet")
    got = events_rolling(str(d), window=window).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("events", tbl)
    want = con.execute(f"""
        WITH c AS (SELECT event_id, user_id, ts,
                          CAST(round(value * 100.0) AS BIGINT) AS value_c
                   FROM events)
        SELECT event_id, user_id,
               CAST(sum(value_c) OVER w AS BIGINT) AS roll_sum_c,
               CAST(count(*) OVER w AS BIGINT) AS roll_n,
               (CAST(sum(value_c) OVER w AS BIGINT)::DOUBLE
                / CAST(count(*) OVER w AS BIGINT)::DOUBLE) AS roll_mean_c
        FROM c
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW)
        ORDER BY event_id""").df()
    pd.testing.assert_frame_equal(got, want, check_exact=True,
                                  check_dtype=False)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.lists(
    st.sampled_from(["a", "bb", "ccc", "a", "dd"]), min_size=0, max_size=12),
    min_size=1, max_size=8))
def test_repetition_scores_property(docs):
    """repetition_scores matches a per-doc pure-Python reference on random
    small-vocab token lists (the adversarial case for gram counting)."""
    import pyarrow as pa

    from timezonemap_ray.stages.text import repetition_scores
    texts = [" ".join(toks) for toks in docs]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts)})
    out = repetition_scores(t).to_pandas()
    for i, toks in enumerate(docs):
        n = len(toks)
        assert out.loc[i, "n_tokens"] == n
        if n:
            from collections import Counter
            top = max(Counter(toks).values())
            assert out.loc[i, "top_token_frac"] == top / n
        bigs = list(zip(toks, toks[1:]))
        assert out.loc[i, "n_bigrams"] == len(bigs)
        if bigs:
            from collections import Counter
            c = Counter(bigs)
            assert out.loc[i, "dup_bigram_frac"] == \
                (len(bigs) - len(c)) / len(bigs)
            assert out.loc[i, "top_bigram_frac"] == max(c.values()) / len(bigs)


@settings(max_examples=15, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 14), st.integers(0, 14)),
                min_size=1, max_size=60))
def test_pagerank_int_property(ray_session, edge_list):
    """pagerank_int's integer recurrence matches a dict-based reference on
    random digraphs (every node given an out-edge to avoid dangling)."""
    import pyarrow as pa
    import ray.data as rd

    from tests.test_graph import _naive_pagerank_int
    from timezonemap_ray.stages.graph import pagerank_int
    edges = [(u, v) for u, v in edge_list if u != v]
    nodes = {x for e in edges for x in e} | {0, 1}
    edges += [(n, (n + 1) % 15) for n in nodes if (n + 1) % 15 != n]
    want = _naive_pagerank_int(edges, iters=2)
    tbl = pa.table({
        "src": pa.array([u for u, _ in edges], type=pa.int64()),
        "dst": pa.array([v for _, v in edges], type=pa.int64())})
    got = pagerank_int(rd.from_arrow(tbl), iters=2).to_pandas()
    assert dict(zip(got["node_id"], got["rank_int"])) == want


@given(st.lists(st.integers(min_value=-10**12, max_value=10**12),
                min_size=1, max_size=200))
@settings(max_examples=60, deadline=None)
def test_fast_sigmoid_quantization_laws(zs):
    """irls_step_int's rational fast sigmoid p = floor(q(1+|z|+z)/(2(1+|z|)))
    must satisfy 0 <= p <= q, monotonicity in z, and the symmetry
    p(z) + p(-z) in {q-1, q} (exact rational symmetry up to one floor)."""
    q = 1000
    z = np.asarray(sorted(zs), dtype=np.int64)
    az = np.abs(z)
    p = (q * (1 + az + z)) // (2 * (1 + az))
    assert (p >= 0).all() and (p <= q).all()
    assert (np.diff(p) >= 0).all()
    pn = (q * (1 + az - z)) // (2 * (1 + az))
    assert np.isin(p + pn, (q - 1, q)).all()
    # z = 0 is exactly q/2
    assert (q * 1) // 2 == q // 2


@given(st.lists(st.integers(min_value=0, max_value=2**62),
                min_size=1, max_size=100),
       st.sampled_from(["us", "ms", "s", "ns"]))
@settings(max_examples=40, deadline=None)
def test_tv_ns_i8_unit_invariance(ns_vals, unit):
    """_tv_ns_i8 must give the SAME int64 ns values for a timestamp
    column regardless of its Arrow storage unit (the round-5 asof
    bucket-collapse bug class), for values representable in that unit."""
    import pyarrow as pa

    from timezonemap_ray.stages.join import _tv_ns_i8
    step = {"ns": 1, "us": 10**3, "ms": 10**6, "s": 10**9}[unit]
    ns = (np.asarray(ns_vals, dtype=np.int64) // step) * step
    ns = ns[np.abs(ns) < 2**62]  # stay clear of ns-overflow on cast
    col = pa.array(ns.astype("datetime64[ns]")).cast(pa.timestamp(unit))
    out = _tv_ns_i8(col)
    assert out.dtype == np.int64
    assert (out == ns).all()


def _naive_dup_mask(v, num, den):
    """O(n²·d) arbitrary-precision reference for _semantic_dup_mask."""
    m = len(v)
    dup = [False] * m
    for j in range(m):
        nj = sum(int(x) * int(x) for x in v[j])
        for i in range(j):
            d = sum(int(a) * int(b) for a, b in zip(v[i], v[j]))
            ni = sum(int(x) * int(x) for x in v[i])
            if d > 0 and den * d * d >= num * ni * nj:
                dup[j] = True
                break
    return dup


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_semantic_dup_mask_matches_naive_property(data):
    """The chunked-matmul kernel — FORCED to multi-chunk by patching the
    pair budget down to a few cells — equals the arbitrary-precision
    pairwise reference on random small int matrices, for random
    rational thresholds."""
    from timezonemap_ray.stages import dedup as dd
    m = data.draw(st.integers(min_value=0, max_value=12))
    d = data.draw(st.integers(min_value=1, max_value=4))
    v = np.array(
        data.draw(st.lists(
            st.lists(st.integers(min_value=-9, max_value=9),
                     min_size=d, max_size=d),
            min_size=m, max_size=m)),
        dtype=np.int64).reshape(m, d)
    num = data.draw(st.integers(min_value=0, max_value=100))
    want = _naive_dup_mask(v, num, 100)
    budget = data.draw(st.sampled_from([1, 7, dd.SEMANTIC_PAIR_BUDGET]))
    old = dd.SEMANTIC_PAIR_BUDGET
    try:
        # budget 1/7 at m>7 rows forces step < m: many j-chunks per call
        dd.SEMANTIC_PAIR_BUDGET = budget
        got = dd._semantic_dup_mask(v, num, 100)
    finally:
        dd.SEMANTIC_PAIR_BUDGET = old
    assert got.tolist() == want


@settings(max_examples=15, deadline=None)
@given(st.data())
def test_semantic_dup_mask_overflow_path_matches_naive(data):
    """Values big enough to trip the int64 guard route to the Python-int
    backstop — same answer as the reference."""
    from timezonemap_ray.stages.dedup import _semantic_dup_mask
    m = data.draw(st.integers(min_value=2, max_value=6))
    base = np.array(
        data.draw(st.lists(
            st.lists(st.integers(min_value=-9, max_value=9),
                     min_size=3, max_size=3),
            min_size=m, max_size=m)),
        dtype=np.int64).reshape(m, 3)
    v = base * (1 << 31)  # na ~ 2^62·k => den·na² overflows int64
    na_max = int((v * v).sum(axis=1).max())
    got = _semantic_dup_mask(v, 81, 100)
    if 100 * na_max * na_max >= 1 << 63:  # guard actually tripped
        assert got.tolist() == _naive_dup_mask(v, 81, 100)
    else:  # all-zero rows drawn; still must agree
        assert got.tolist() == _naive_dup_mask(v, 81, 100)
