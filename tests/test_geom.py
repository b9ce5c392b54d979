"""Geometry kernel conformance — the reference's square-with-island truth
table (`UtilTest.java:60-81`) ported verbatim, plus area/clip/envelope."""

import numpy as np
import pytest

from timezonemap_ray import geom
from timezonemap_ray.worlds import square_with_island_zone


@pytest.fixture(scope="module")
def square():
    z = square_with_island_zone()
    return z.flat()  # xs (lng), ys (lat), ring_start


# (x=lng, y=lat, expected) — exactly UtilTest.containsInclusive
TRUTH_TABLE = [
    (1.0, 1.65, True),    # on outer left side
    (1.1, 1.65, True),    # on hole left side
    (1.2, 1.65, True),    # on island left side
    (1.0, 1.0, True),     # outer LL corner
    (1.5, 1.5, True),     # hole UR corner
    (1.3, 1.6, True),     # island LR corner
    (1.3, 1.3, True),     # main area
    (1.25, 1.65, True),   # island interior
    (10.0, 10.0, False),  # far outside
    (1.4, 1.8, False),    # hole interior
]


def test_contains_inclusive_truth_table(square):
    xs, ys, rs = square
    # reference queries with Java float literals (Point(1.2f, 1.65f)) —
    # round-trip the test points through float32 the same way
    px = np.array([t[0] for t in TRUTH_TABLE], dtype=np.float32).astype(np.float64)
    py = np.array([t[1] for t in TRUTH_TABLE], dtype=np.float32).astype(np.float64)
    exp = np.array([t[2] for t in TRUTH_TABLE])
    got = geom.points_in_polygon(px, py, xs, ys, rs)
    assert got.tolist() == exp.tolist()


def test_area_even_odd(square):
    xs, ys, rs = square
    # |outer| - |hole| + |island| = 1 - 0.16 + 0.01
    assert geom.polygon_area_deg2(xs, ys, rs) == pytest.approx(0.85, abs=1e-6)


def test_envelope(square):
    xs, ys, rs = square
    assert geom.polygon_envelope(xs, ys) == (1.0, 1.0, 2.0, 2.0)


def test_clip_passthrough_and_cut(square):
    xs, ys, rs = square
    # clip to a rect containing everything → same containment behavior
    cx, cy, crs = geom.clip_polygon_to_rect(xs, ys, rs, 0.0, 0.0, 3.0, 3.0)
    px = np.array([t[0] for t in TRUTH_TABLE], dtype=np.float32).astype(np.float64)
    py = np.array([t[1] for t in TRUTH_TABLE], dtype=np.float32).astype(np.float64)
    exp = [t[2] for t in TRUTH_TABLE]
    assert geom.points_in_polygon(px, py, cx, cy, crs).tolist() == exp
    # clip to the left half: right-half points fall out, hole still a hole
    cx, cy, crs = geom.clip_polygon_to_rect(xs, ys, rs, 1.0, 1.0, 1.45, 2.0)
    assert geom.points_in_polygon(
        np.array([1.3, 1.25, 1.4]), np.array([1.3, 1.65, 1.8]),
        cx, cy, crs).tolist() == [True, True, False]
    # fully outside clip → empty
    cx, cy, crs = geom.clip_polygon_to_rect(xs, ys, rs, 5.0, 5.0, 6.0, 6.0)
    assert cx.size == 0


def test_clip_distributes_over_rings():
    # even-odd region of (outer xor hole) clipped == clip of each ring
    z = square_with_island_zone()
    xs, ys, rs = z.flat()
    rng = np.random.default_rng(3)
    px = rng.uniform(0.9, 2.1, 500)
    py = rng.uniform(0.9, 2.1, 500)
    rect = (1.05, 1.2, 1.8, 1.95)  # min_x, min_y, max_x, max_y
    cx, cy, crs = geom.clip_polygon_to_rect(xs, ys, rs, *rect)
    in_rect = ((px >= rect[0]) & (px <= rect[2]) &
               (py >= rect[1]) & (py <= rect[3]))
    expected = geom.points_in_polygon(px, py, xs, ys, rs) & in_rect
    got = geom.points_in_polygon(px, py, cx, cy, crs)
    # ignore points exactly on the clip boundary (measure-zero, none sampled)
    assert (got == expected).all()


def test_ring_orientation_irrelevant():
    # even-odd: reversing any ring's orientation changes nothing
    z = square_with_island_zone()
    xs, ys, rs = z.flat()
    xs2, ys2 = xs.copy(), ys.copy()
    s, e = rs[1], rs[2]
    xs2[s:e] = xs[s:e][::-1]
    ys2[s:e] = ys[s:e][::-1]
    rng = np.random.default_rng(4)
    px = rng.uniform(0.5, 2.5, 300)
    py = rng.uniform(0.5, 2.5, 300)
    a = geom.points_in_polygon(px, py, xs, ys, rs)
    b = geom.points_in_polygon(px, py, xs2, ys2, rs)
    assert (a == b).all()


def test_envelope_to_ring():
    lats, lngs = geom.envelope_to_ring(1.0, 2.0, 3.0, 4.0)
    assert lats.tolist() == [3.0, 3.0, 1.0, 1.0, 3.0]
    assert lngs.tolist() == [2.0, 4.0, 4.0, 2.0, 2.0]


def test_rect_intersects_polygon(square):
    xs, ys, rs = square
    assert geom.rect_intersects_polygon(1.2, 1.2, 1.4, 1.4, xs, ys, rs)
    assert not geom.rect_intersects_polygon(5, 5, 6, 6, xs, ys, rs)
    # rect entirely inside the hole (no island overlap) → no intersection
    assert not geom.rect_intersects_polygon(1.35, 1.75, 1.45, 1.85, xs, ys, rs)
    # rect inside the island → intersects
    assert geom.rect_intersects_polygon(1.22, 1.62, 1.28, 1.68, xs, ys, rs)


def test_ring_self_intersects_detection():
    """M3: crossing rings are detected; simple rings are not."""
    from timezonemap_ray.geom import ring_self_intersects
    # bowtie: (0,0) (2,2) (2,0) (0,2) — edges cross at (1,1)
    assert ring_self_intersects(np.array([0.0, 2.0, 2.0, 0.0]),
                                np.array([0.0, 2.0, 0.0, 2.0]))
    # plain rectangle — simple
    assert not ring_self_intersects(np.array([0.0, 2.0, 2.0, 0.0]),
                                    np.array([0.0, 0.0, 2.0, 2.0]))
    # concave but simple L-shape
    assert not ring_self_intersects(
        np.array([0.0, 2.0, 2.0, 1.0, 1.0, 0.0]),
        np.array([0.0, 0.0, 1.0, 1.0, 2.0, 2.0]))


def test_bowtie_even_odd_equals_simplified_pieces():
    """Even-odd PIP on a self-intersecting bowtie equals the union of the
    two simple triangles Esri simplify would split it into — the documented
    M3 divergence is value-neutral for crossing rings."""
    from timezonemap_ray.geom import points_in_polygon
    bow_x = np.array([0.0, 2.0, 2.0, 0.0])
    bow_y = np.array([0.0, 2.0, 0.0, 2.0])
    rs1 = np.array([0, 4])
    # simplified pieces: left triangle (0,0),(0,2),(1,1); right (2,0),(2,2),(1,1)
    lt_x, lt_y = np.array([0.0, 0.0, 1.0]), np.array([0.0, 2.0, 1.0])
    rt_x, rt_y = np.array([2.0, 2.0, 1.0]), np.array([0.0, 2.0, 1.0])
    rs3 = np.array([0, 3])
    gx, gy = np.meshgrid(np.linspace(-0.2, 2.2, 49),
                         np.linspace(-0.2, 2.2, 49))
    px, py = gx.ravel(), gy.ravel()
    bow = points_in_polygon(px, py, bow_x, bow_y, rs1)
    pieces = points_in_polygon(px, py, lt_x, lt_y, rs3) | \
        points_in_polygon(px, py, rt_x, rt_y, rs3)
    assert (bow == pieces).all()


def test_bowtie_area_equals_simplified_pieces():
    """M3 area fidelity: a self-intersecting ring's even-odd area must
    equal the sum of its simplified pieces (bowtie = two unit triangles
    = 2.0), NOT the raw signed shoelace (which cancels the lobes to 0)."""
    bow_x = np.array([0.0, 2.0, 2.0, 0.0])
    bow_y = np.array([0.0, 2.0, 0.0, 2.0])
    rs = np.array([0, 4])
    assert geom.polygon_area_deg2(bow_x, bow_y, rs) == 2.0
    # raw shoelace of the crossing ring is 0 — the pre-fix failure mode
    assert abs(geom.ring_signed_area(bow_x, bow_y)) == 0.0


def test_self_intersecting_area_matches_parity_sampling():
    """Random self-intersecting polygons: decomposed even-odd area agrees
    with a dense parity-sampled (grid Monte Carlo) estimate."""
    rng = np.random.default_rng(17)
    checked = 0
    while checked < 5:
        k = int(rng.integers(4, 7))
        xs = rng.uniform(0, 10, k)
        ys = rng.uniform(0, 10, k)
        if not geom.ring_self_intersects(xs, ys):
            continue
        rs = np.array([0, k])
        got = geom.polygon_area_deg2(xs, ys, rs)
        g = np.linspace(0, 10, 201)
        gx, gy = np.meshgrid(g, g)
        inside = geom.points_in_polygon(gx.ravel(), gy.ravel(), xs, ys, rs)
        est = inside.mean() * 100.0  # cell area 10x10
        assert abs(got - est) < 0.35, (xs, ys, got, est)
        checked += 1


def test_mixed_simple_and_crossing_rings_area():
    """A simple outer ring with a self-intersecting 'hole' ring: the
    crossing ring's lobes subtract like Esri's simplified pieces —
    100 − (4 + 4) = 92 (parity-sampled cross-check in-line)."""
    xs = np.array([0.0, 10.0, 10.0, 0.0, 2.0, 6.0, 6.0, 2.0])
    ys = np.array([0.0, 0.0, 10.0, 10.0, 2.0, 6.0, 2.0, 6.0])
    rs = np.array([0, 4, 8])
    assert geom.polygon_area_deg2(xs, ys, rs) == 92.0


def test_simple_polygon_area_unchanged_by_decomposition():
    """Simple (incl. hole/island) polygons keep their exact area through
    the decomposition-aware path."""
    # square with hole with island (same shape as the PIP fixture)
    xs = np.array([0.0, 4.0, 4.0, 0.0,   1.0, 3.0, 3.0, 1.0,
                   1.5, 2.5, 2.5, 1.5])
    ys = np.array([0.0, 0.0, 4.0, 4.0,   1.0, 1.0, 3.0, 3.0,
                   1.5, 1.5, 2.5, 2.5])
    rs = np.array([0, 4, 8, 12])
    assert geom.polygon_area_deg2(xs, ys, rs) == 16.0 - 4.0 + 1.0


def test_make_zone_normalizes_self_intersection(caplog):
    """Round 4 (M3 closed): make_zone resolves a bowtie into two simple
    triangles like the reference's OperatorSimplify, and says so."""
    import logging

    from timezonemap_ray.geom_simplify import polygon_is_simple
    from timezonemap_ray.zonetable import make_zone
    with caplog.at_level(logging.WARNING,
                         logger="timezonemap_ray.zonetable"):
        rec = make_zone("Test/Bowtie", [
            (np.array([0.0, 2.0, 0.0, 2.0]),   # lats
             np.array([0.0, 2.0, 2.0, 0.0]))])  # lngs
    assert any("self-intersects" in r.message for r in caplog.records)
    assert len(rec.rings) == 2
    assert all(len(la) == 3 for la, _ in rec.rings)
    xs, ys, rs = rec.flat()
    assert polygon_is_simple(xs, ys, rs)
    # even-odd area unchanged by normalization: two unit triangles
    assert abs(geom.polygon_area_deg2(xs, ys, rs) - 2.0) < 1e-9
