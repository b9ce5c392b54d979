"""Distance-from-boundary goldens — `TimeZoneTest.java:16-61` ported
verbatim (WGS84 geodesic meters to the planar-nearest boundary point)."""

import numpy as np
import pytest

from timezonemap_ray import geom
from timezonemap_ray.api import TimeZoneEngine
from timezonemap_ray.index import build_index, distance_from_boundary
from timezonemap_ray.worlds import square_with_island_zone
from timezonemap_ray.zonetable import zones_to_table


@pytest.fixture(scope="module")
def engine():
    table = zones_to_table([square_with_island_zone()])
    return TimeZoneEngine(build_index(table, cell_size=1.0))


ZERO_CASES = [  # (lat, lng) on a boundary → exactly 0.0
    (2.0, 2.0), (1.5, 2.0), (1.5, 1.5), (1.7, 1.5), (1.7, 1.2), (1.7, 1.25),
]

GOLDENS = [  # (lat, lng, meters, abs_tol)
    (1.5, 1.999, 111.286, 0.001),
    (1.5, 1.99, 1112.86, 0.1),
    (1.5, 1.9, 11128.0, 1.0),
    (1.8, 1.999, 111.270, 0.001),
    (1.001, 1.5, 110.579, 0.001),
    (1.01, 1.5, 1105.79, 0.1),
    (1.1, 1.5, 11057.9, 1.0),
    (1.25, 1.4, 27643.67, 0.01),
    (1.30, 1.4, 22114.97, 0.03),
    (1.20, 1.4, 22114.97, 0.03),
    (1.65, 1.501, 111.278, 0.001),
    (1.65, 1.201, 111.265, 0.001),
    (1.601, 1.25, 110.567, 0.001),
    (1.65, 1.25, 5563.676, 0.001),
]


def test_outside_raises(engine):
    with pytest.raises(ValueError):
        engine.get_distance_from_boundary("Square with island", 10.0, 10.0)
    with pytest.raises(ValueError):  # in the hole
        engine.get_distance_from_boundary("Square with island", 1.8, 1.4)


def _f32(v):
    # reference passes Java float literals (1.999f etc.) widened to double
    return float(np.float32(v))


def test_on_boundary_zero(engine):
    for lat, lng in ZERO_CASES:
        assert engine.get_distance_from_boundary(
            "Square with island", _f32(lat), _f32(lng)) == 0.0


@pytest.mark.parametrize("lat,lng,meters,tol", GOLDENS)
def test_goldens(engine, lat, lng, meters, tol):
    got = engine.get_distance_from_boundary(
        "Square with island", _f32(lat), _f32(lng))
    assert got == pytest.approx(meters, abs=tol)


def test_vectorized_matches_scalar(engine):
    lats = np.array([c[0] for c in GOLDENS], dtype=np.float32).astype(np.float64)
    lngs = np.array([c[1] for c in GOLDENS], dtype=np.float32).astype(np.float64)
    d = distance_from_boundary(engine.index, "Square with island", lats, lngs)
    for k, (la, ln, m, tol) in enumerate(GOLDENS):
        assert d[k] == pytest.approx(m, abs=tol)


def test_geodesic_known_values():
    # equator: 1° of longitude ≈ 111319.49 m on WGS84
    d = geom.geodesic_distance_m(0.0, 0.0, 0.0, 1.0)
    assert float(d) == pytest.approx(111319.49, abs=0.01)
    # 1° of latitude at the equator ≈ 110574.39 m
    d = geom.geodesic_distance_m(0.0, 0.0, 1.0, 0.0)
    assert float(d) == pytest.approx(110574.39, abs=0.01)
    # coincident points
    assert float(geom.geodesic_distance_m(12.3, 45.6, 12.3, 45.6)) == 0.0
