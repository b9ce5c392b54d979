"""Even-odd normalization (``geom_simplify.py``) — the OperatorSimplify twin.

Differential contract (what Esri simplify guarantees for even-odd fill):
the normalized ring set has the SAME even-odd interior as the input, is
simple and pairwise non-crossing, conserves parity area, and is a fixed
point of the operator.
"""

import numpy as np
import pytest

from timezonemap_ray import geom
from timezonemap_ray.geom_simplify import polygon_is_simple, simplify_even_odd


def _flat(rings):
    xs = np.concatenate([ln for _, ln in rings])
    ys = np.concatenate([la for la, _ in rings])
    starts = np.zeros(len(rings) + 1, dtype=np.int64)
    for i, (la, _) in enumerate(rings):
        starts[i + 1] = starts[i] + len(la)
    return xs, ys, starts


def _signed_area(rings):
    tot = 0.0
    for la, ln in rings:
        tot += geom.ring_signed_area(np.asarray(ln, float),
                                     np.asarray(la, float))
    return tot


def _min_dist_to_edges(px, py, rings):
    """min distance from each probe to any ring edge."""
    best = np.full(px.shape, np.inf)
    for la, ln in rings:
        xs, ys = np.asarray(ln, float), np.asarray(la, float)
        x2, y2 = np.roll(xs, -1), np.roll(ys, -1)
        dx, dy = x2 - xs, y2 - ys
        den = dx * dx + dy * dy
        den[den == 0] = 1.0
        t = ((px[:, None] - xs[None, :]) * dx[None, :]
             + (py[:, None] - ys[None, :]) * dy[None, :]) / den[None, :]
        t = np.clip(t, 0, 1)
        cx = xs[None, :] + t * dx[None, :]
        cy = ys[None, :] + t * dy[None, :]
        d = np.hypot(px[:, None] - cx, py[:, None] - cy).min(axis=1)
        best = np.minimum(best, d)
    return best


def _assert_equivalent(in_rings, out_rings, seed=0, n_probe=4000):
    """Core contract: even-odd parity equal on probes away from edges,
    parity area conserved, output simple."""
    ixs, iys, istarts = _flat(in_rings)
    # area: parity scanline of the input == signed shoelace sum of output
    a_in = geom.polygon_area_deg2(ixs, iys, istarts)
    a_out = _signed_area(out_rings)
    assert a_out >= -1e-12
    assert abs(a_in - a_out) <= max(1e-9, 1e-9 * abs(a_in)), (a_in, a_out)
    if out_rings:
        oxs, oys, ostarts = _flat(out_rings)
        assert polygon_is_simple(oxs, oys, ostarts)
        for la, ln in out_rings:
            assert not geom.ring_self_intersects(np.asarray(ln), np.asarray(la))
    # parity-PIP equivalence on random probes (excluding a thin edge band)
    rng = np.random.default_rng(seed)
    lo_x, hi_x = ixs.min() - 0.5, ixs.max() + 0.5
    lo_y, hi_y = iys.min() - 0.5, iys.max() + 0.5
    px = rng.uniform(lo_x, hi_x, n_probe)
    py = rng.uniform(lo_y, hi_y, n_probe)
    d = _min_dist_to_edges(px, py, in_rings)
    if out_rings:
        d = np.minimum(d, _min_dist_to_edges(px, py, out_rings))
    keep = d > 1e-6
    px, py = px[keep], py[keep]
    got_in = geom._even_odd_interior(px, py, ixs, iys, istarts)
    if out_rings:
        got_out = geom._even_odd_interior(px, py, oxs, oys, ostarts)
    else:
        got_out = np.zeros(px.shape, dtype=bool)
    bad = got_in != got_out
    assert not bad.any(), (px[bad][:5], py[bad][:5])


def _ring(pts):
    a = np.asarray(pts, dtype=np.float64)
    return (a[:, 1], a[:, 0])  # pts given as (x, y) -> (lats, lngs)


def test_bowtie_splits_into_two_triangles():
    rings = [_ring([(0, 0), (2, 2), (2, 0), (0, 2)])]
    out = simplify_even_odd(rings)
    assert len(out) == 2
    for la, ln in out:
        assert len(la) == 3
    _assert_equivalent(rings, out)


def test_simple_square_unchanged_interior():
    rings = [_ring([(0, 0), (4, 0), (4, 3), (0, 3)])]
    out = simplify_even_odd(rings)
    assert len(out) == 1
    la, ln = out[0]
    assert len(la) == 4
    # CCW orientation (interior on the left)
    assert geom.ring_signed_area(np.asarray(ln), np.asarray(la)) > 0
    _assert_equivalent(rings, out)


def test_square_with_hole_preserved():
    rings = [_ring([(0, 0), (10, 0), (10, 10), (0, 10)]),
             _ring([(3, 3), (3, 7), (7, 7), (7, 3)])]
    out = simplify_even_odd(rings)
    assert len(out) == 2
    areas = sorted(geom.ring_signed_area(np.asarray(ln), np.asarray(la))
                   for la, ln in out)
    assert areas[0] < 0 < areas[1]          # one CW hole, one CCW outer
    assert abs(areas[0] + 16) < 1e-9
    assert abs(areas[1] - 100) < 1e-9
    _assert_equivalent(rings, out)


def test_duplicate_ring_cancels():
    sq = _ring([(0, 0), (5, 0), (5, 5), (0, 5)])
    assert simplify_even_odd([sq, sq]) == []


def test_overlapping_squares_even_odd():
    # even-odd interior of two overlapping squares = symmetric difference
    rings = [_ring([(0, 0), (6, 0), (6, 6), (0, 6)]),
             _ring([(3, 3), (9, 3), (9, 9), (3, 9)])]
    out = simplify_even_odd(rings)
    _assert_equivalent(rings, out)
    # area = 36 + 36 - 2*9
    assert abs(_signed_area(out) - 54) < 1e-9


def test_spike_collapses():
    # a ring with a zero-area spike: out-and-back edge cancels
    rings = [_ring([(0, 0), (4, 0), (4, 2), (6, 2), (4, 2), (4, 4), (0, 4)])]
    out = simplify_even_odd(rings)
    _assert_equivalent(rings, out)
    assert len(out) == 1 and len(out[0][0]) == 4


def test_crossing_rings_resolved():
    rings = [_ring([(0, 0), (8, 0), (8, 8), (0, 8)]),
             _ring([(6, 3), (12, 3), (12, 5), (6, 5)])]
    out = simplify_even_odd(rings)
    _assert_equivalent(rings, out)
    oxs, oys, ostarts = _flat(out)
    assert polygon_is_simple(oxs, oys, ostarts)


def test_t_junction_vertex_on_edge():
    # second square's corner lies exactly ON the first one's edge
    rings = [_ring([(0, 0), (4, 0), (4, 4), (0, 4)]),
             _ring([(4, 2), (7, 1), (7, 3)])]
    out = simplify_even_odd(rings)
    _assert_equivalent(rings, out)


def test_idempotent():
    rings = [_ring([(0, 0), (2, 2), (2, 0), (0, 2)]),
             _ring([(1, -1), (3, 1), (1, 3), (-1, 1)])]
    once = simplify_even_odd(rings)
    twice = simplify_even_odd(once)
    _assert_equivalent(once, twice, seed=7)
    assert abs(_signed_area(once) - _signed_area(twice)) < 1e-12
    assert len(once) == len(twice)


@pytest.mark.parametrize("seed", range(8))
def test_random_chaos_polygons(seed):
    """Random self-intersecting polygons: the hard differential case."""
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(5, 14))
    # snap to a coarse grid to provoke collinear / coincident degeneracies
    pts = rng.integers(0, 12, size=(n, 2)).astype(np.float64)
    # dedup consecutive duplicates
    keep = np.ones(n, bool)
    keep[1:] = (pts[1:] != pts[:-1]).any(axis=1)
    pts = pts[keep]
    if len(pts) < 3:
        pytest.skip("degenerate draw")
    rings = [(pts[:, 1], pts[:, 0])]
    out = simplify_even_odd(rings)
    _assert_equivalent(rings, out, seed=seed)


@pytest.mark.parametrize("seed", range(4))
def test_random_multi_ring_chaos(seed):
    rng = np.random.default_rng(500 + seed)
    rings = []
    for _ in range(3):
        n = int(rng.integers(4, 9))
        pts = rng.uniform(0, 10, size=(n, 2))
        rings.append((pts[:, 1], pts[:, 0]))
    out = simplify_even_odd(rings)
    _assert_equivalent(rings, out, seed=seed)


def test_chaos_stress_bounded():
    """A 200-vertex uniform-random-chord polygon (~quadratic crossings —
    the worst case by construction) must normalize in bounded time and
    produce a simple result. Measured: ~0.6 s for ~2.9k output rings."""
    import time
    rng = np.random.default_rng(3)
    th = rng.uniform(0, 2 * np.pi, 200)
    r = rng.uniform(0.5, 1.0, 200)
    rings = [(r * np.sin(th) * 10, r * np.cos(th) * 10)]
    t0 = time.time()
    out = simplify_even_odd(rings)
    assert time.time() - t0 < 30
    assert len(out) > 100
    oxs, oys, ostarts = _flat(out)
    assert polygon_is_simple(oxs, oys, ostarts)
    # area conservation at chaos scale
    ixs, iys, istarts = _flat(rings)
    a_in = geom.polygon_area_deg2(ixs, iys, istarts)
    assert abs(_signed_area(out) - a_in) <= 1e-6 * abs(a_in)


def test_polygon_is_simple_gate():
    xs, ys, st = _flat([_ring([(0, 0), (4, 0), (4, 3), (0, 3)])])
    assert polygon_is_simple(xs, ys, st)
    xs, ys, st = _flat([_ring([(0, 0), (2, 2), (2, 0), (0, 2)])])
    assert not polygon_is_simple(xs, ys, st)
    # two crossing rings, each individually simple
    xs, ys, st = _flat([_ring([(0, 0), (8, 0), (8, 8), (0, 8)]),
                        _ring([(6, 3), (12, 3), (12, 5), (6, 5)])])
    assert not polygon_is_simple(xs, ys, st)
    # hole inside an outer: simple (no crossings)
    xs, ys, st = _flat([_ring([(0, 0), (10, 0), (10, 10), (0, 10)]),
                        _ring([(3, 3), (3, 7), (7, 7), (7, 3)])])
    assert polygon_is_simple(xs, ys, st)


def test_dirty_world_build_rehearsal():
    """End-to-end build rehearsal with DIRTY geometry: a world of
    self-intersecting star rings goes through make_zone (normalization),
    the reference-format archive, and the engine — lookups must equal an
    engine built from the hand-normalized rings."""
    from timezonemap_ray.index import build_index, lookup_batch
    from timezonemap_ray.sources.archive import (read_map_archive,
                                                 write_map_archive)
    from timezonemap_ray.zonetable import make_zone, zones_to_table

    rng = np.random.default_rng(41)
    recs = []
    for i in range(40):
        cx, cy = (i % 8) * 10.0 - 35.0, (i // 8) * 10.0 - 20.0
        n = int(rng.integers(6, 12))
        th = rng.uniform(0, 2 * np.pi, n)     # unsorted angles => bowties
        r = rng.uniform(1.5, 4.0, n)
        lats = cy + r * np.sin(th)
        lngs = cx + r * np.cos(th)
        recs.append(make_zone(f"Dirty/Z{i}", [(lats, lngs)]))
    table = zones_to_table(recs)
    # every stored ring set is simple now
    from timezonemap_ray.zonetable import table_to_records
    for rec in table_to_records(table):
        assert polygon_is_simple(rec["xs"], rec["ys"], rec["ring_start"])
    # archive round-trip preserves the normalized geometry exactly
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        p = td + "/dirty.tar.zstd"
        write_map_archive(table, p, "2020d")
        loaded, _ = read_map_archive(p)
    assert loaded["rings"].to_pylist() == table["rings"].to_pylist()
    # lookups through the engine agree with direct even-odd PIP on the
    # ORIGINAL dirty rings (interior equivalence, the M3 contract)
    idx = build_index(table)
    pts_lat = rng.uniform(-25, 30, 4000)
    pts_lng = rng.uniform(-40, 45, 4000)
    got = lookup_batch(idx, pts_lat, pts_lng)["zone_id"]
    # rebuild expectation from the raw dirty rings per zone
    raw = {}
    for i in range(40):
        cx, cy = (i % 8) * 10.0 - 35.0, (i // 8) * 10.0 - 20.0
        raw[f"Dirty/Z{i}"] = i  # zones are spatially disjoint by layout
    # each point: expected zone = the single zone whose dirty interior
    # contains it (cells are 10 deg apart, radius <= 4 => no overlap)
    rng2 = np.random.default_rng(41)
    # regenerate the same dirty rings
    for i in range(40):
        cx, cy = (i % 8) * 10.0 - 35.0, (i // 8) * 10.0 - 20.0
        n = int(rng2.integers(6, 12))
        th = rng2.uniform(0, 2 * np.pi, n)
        r = rng2.uniform(1.5, 4.0, n)
        lats = cy + r * np.sin(th)
        lngs = cx + r * np.cos(th)
        xs, ys, st = _flat([(lats, lngs)])
        d = _min_dist_to_edges(pts_lng, pts_lat, [(lats, lngs)])
        inside = geom._even_odd_interior(pts_lng, pts_lat, xs, ys, st)
        sel = inside & (d > 1e-6)
        assert (got[sel] == f"Dirty/Z{i}").all(), f"zone {i}"


def test_gate_flags_t_junction_interior_entry():
    """Round-5 ADVICE: a ring entering another's interior through two
    boundary-TOUCH points (no proper crossing) must be flagged, so
    make_zone normalizes it and the area fast path never sees it.
    Diamond centered on the square's corner: touch points (1,2),(2,1)
    lie strictly interior to the square's edges."""
    rings = [_ring([(0, 0), (2, 0), (2, 2), (0, 2)]),
             _ring([(1, 2), (2, 1), (3, 2), (2, 3)])]
    xs, ys, st = _flat(rings)
    assert not polygon_is_simple(xs, ys, st)
    # wrong fast-path answer would be 4 + 2 = 6; even-odd is 4 + 2 - 2*0.5
    assert abs(geom.polygon_area_deg2(xs, ys, st) - 5.0) < 1e-12
    # normalization handles it, and the gate passes on its own output
    out = simplify_even_odd(rings)
    _assert_equivalent(rings, out)


def test_gate_idempotent_on_straightened_tangent_edge():
    """The simplify emit keeps collinear arrangement vertices where other
    boundary pieces are incident (out-degree >= 2) — otherwise the
    straightened edge would re-create the very T-junction the gate
    flags, breaking gate idempotence on simplify's own output."""
    rings = [_ring([(0, 0), (4, 0), (4, 4), (0, 4)]),
             _ring([(4, 2), (7, 1), (7, 3)])]
    out = simplify_even_odd(rings)
    oxs, oys, ostarts = _flat(out)
    assert polygon_is_simple(oxs, oys, ostarts)
    twice = simplify_even_odd(out)
    assert abs(_signed_area(out) - _signed_area(twice)) < 1e-12


def test_area_mixed_parity_shared_vertex_crossing():
    """A ring crossing another's boundary ONLY at shared vertices passes
    the simplicity gate (vertex-vertex contacts are benign in general),
    but its depth is not constant along the boundary — the all-free-
    vertex parity probe must detect the mix and fall back to the exact
    scanline."""
    rings = [_ring([(0, 0), (4, 0), (4, 4), (0, 4)]),
             _ring([(0, 0), (2, 1), (4, 4), (8, -2)])]
    xs, ys, st = _flat(rings)
    assert polygon_is_simple(xs, ys, st)
    fast = geom.polygon_area_deg2(xs, ys, st)
    exact = geom._even_odd_area_scanline(xs, ys, st)
    assert abs(fast - exact) < 1e-9
