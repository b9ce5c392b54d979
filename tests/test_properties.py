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
