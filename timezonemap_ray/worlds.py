"""Deterministic synthetic zone worlds (FIXTURES.md §5-6).

The real timezone-boundary-builder 2020d GeoJSON is not reachable in-sandbox,
so conformance tests run against synthetic worlds that reproduce the
*structural* challenges of the reference corpus
(`/root/reference/timezonemap/src/test/java/us/dustinj/timezonemap/TimeZoneMapTest.java:60-141`):
land border pairs, territorial-water coastal strips, ocean Etc/GMT bands, a
disputed overlap pair, an enclave micro-boundary at 1e-4°, a 5-zone stripe,
and a hole+island zone. All coordinates are explicit constants — fully
deterministic, no RNG.
"""

from __future__ import annotations

import numpy as np

from .zonetable import ZoneRecord, make_zone, zones_to_table


def rect_rings(min_lat, min_lng, max_lat, max_lng):
    """One CW rectangular outer ring (lats, lngs)."""
    return [(np.array([max_lat, max_lat, min_lat, min_lat]),
             np.array([min_lng, max_lng, max_lng, min_lng]))]


def rect_zone(zone_id, min_lat, min_lng, max_lat, max_lng) -> ZoneRecord:
    return make_zone(zone_id, rect_rings(min_lat, min_lng, max_lat, max_lng))


def square_with_island_zone() -> ZoneRecord:
    """The reference's exact square-with-island fixture (`UtilTest.java:17-58`):
    outer [1,2]^2, hole in the upper-left quadrant, island in the hole."""
    return make_zone("Square with island", [
        # outer (CW): (lat,lng) pairs (2,1) (2,2) (1,2) (1,1)
        (np.array([2.0, 2.0, 1.0, 1.0]), np.array([1.0, 2.0, 2.0, 1.0])),
        # hole (CCW): (1.9,1.1) (1.5,1.1) (1.5,1.5) (1.9,1.5)
        (np.array([1.9, 1.5, 1.5, 1.9]), np.array([1.1, 1.1, 1.5, 1.5])),
        # island (CW): (1.7,1.2) (1.7,1.3) (1.6,1.3) (1.6,1.2)
        (np.array([1.7, 1.7, 1.6, 1.6]), np.array([1.2, 1.3, 1.3, 1.2])),
    ])


def _etc_gmt_name(offset: int) -> str:
    # POSIX-inverted sign, like the real Etc/GMT zones
    return "Etc/GMT" if offset == 0 else f"Etc/GMT{offset:+d}"


def ocean_band_zones(min_lat=-60.0, max_lat=90.0) -> list[ZoneRecord]:
    """25 Etc/GMT ocean bands, 15° of longitude each, centered at -15*offset.

    Mirrors timezones-with-oceans' Etc/GMT bands. Latitude floor -60 leaves
    room for the Antarctica zones (real ocean polygons exclude land; our
    background bands exclude the Antarctic belt instead).
    """
    zones = []
    for offset in range(-12, 13):
        center = -15.0 * offset
        lo, hi = max(center - 7.5, -180.0), min(center + 7.5, 180.0)
        zones.append(rect_zone(_etc_gmt_name(offset), min_lat, lo, max_lat, hi))
    return zones


# Conformance test points (lat, lng) → expected zone(s), smallest-area first.
CONFORMANCE_CASES = [
    # land border pair ~2 km apart (ref: Lisbon/Madrid pair)
    ((39.666304, -7.558607), ["Test/West"]),
    ((39.664104, -7.535549), ["Test/East"]),
    # territorial water ≤12 nmi off the coast — still the land zone
    ((39.361532, -9.440421), ["Test/West"]),
    # open ocean ~20 km off → Etc band
    ((39.315657, -9.920789), ["Etc/GMT+1"]),
    # coastal cutoff pair (ref: Madrid vs Etc/GMT)
    ((36.39823, -4.35621), ["Test/South"]),
    ((36.39258, -4.36047), ["Etc/GMT"]),
    # disputed overlap, smallest-area first (ref: Urumqi/Shanghai)
    ((42.534980, 87.615030), ["Test/Urumqi", "Test/Shanghai"]),
    # enclave micro-boundary at ~1e-4° (ref: Baarle Amsterdam/Brussels)
    ((51.4457, 4.9248), ["Test/Amsterdam"]),
    ((51.4457, 4.9250), ["Test/Brussels"]),
    # Antarctica wedge + GMT-offset ocean in the far south... sea lat > -60
    ((-70.91694, 54.67198), ["Test/Syowa"]),
    ((-47.91847, 106.91770), ["Etc/GMT-7"]),
    # square-with-island: main area, island, and the hole falls through to
    # the ocean band below it
    ((1.3, 1.3), ["Square with island", "Etc/GMT"]),
    ((1.65, 1.25), ["Square with island", "Etc/GMT"]),
    ((1.8, 1.4), ["Etc/GMT"]),
    # US-style stripe zones
    ((39.0, -120.0), ["Test/Los_Angeles"]),
    ((39.0, -110.0), ["Test/Denver"]),
    ((39.0, -100.0), ["Test/Chicago"]),
    ((39.0, -86.0), ["Test/Indianapolis"]),
    ((39.0, -80.0), ["Test/New_York"]),
]

# lng cut points of the 5-zone US stripe (ref scopedRegionTest_USA_Line,
# `TimeZoneMapTest.java:386-403`)
USA_STRIPE_ZONES = [
    ("Test/Los_Angeles", -125.0, -115.0),
    ("Test/Denver", -115.0, -105.0),
    ("Test/Chicago", -105.0, -87.0),
    ("Test/Indianapolis", -87.0, -85.0),
    ("Test/New_York", -85.0, -70.0),
]


def conformance_zones() -> list[ZoneRecord]:
    zones = []
    # land border pair; West extends 0.2° west over the sea (territorial water)
    zones.append(rect_zone("Test/West", 38.0, -9.65, 41.0, -7.55))
    zones.append(rect_zone("Test/East", 38.0, -7.55, 41.0, -5.0))
    # coastal cutoff
    zones.append(rect_zone("Test/South", 36.0, -4.358, 38.0, 0.0))
    # overlap pair (disputed area): small inside large
    zones.append(rect_zone("Test/Urumqi", 40.0, 80.0, 45.0, 90.0))
    zones.append(rect_zone("Test/Shanghai", 20.0, 75.0, 50.0, 125.0))
    # enclave micro-boundary
    zones.append(rect_zone("Test/Amsterdam", 51.40, 4.90, 51.50, 4.9249))
    zones.append(rect_zone("Test/Brussels", 51.40, 4.9249, 51.50, 4.95))
    # Antarctica belt: Syowa wedge + the rest
    zones.append(rect_zone("Test/Syowa", -90.0, 40.0, -60.0, 60.0))
    zones.append(rect_zone("Test/Antarctica_West", -90.0, -180.0, -60.0, 40.0))
    zones.append(rect_zone("Test/Antarctica_East", -90.0, 60.0, -60.0, 180.0))
    # US stripe
    for zid, lo, hi in USA_STRIPE_ZONES:
        zones.append(rect_zone(zid, 30.0, lo, 49.0, hi))
    # hole + island fixture
    zones.append(square_with_island_zone())
    # ocean background bands (largest areas → lowest priority)
    zones.extend(ocean_band_zones())
    return zones


def conformance_table():
    return zones_to_table(conformance_zones())


def _jagged_ring(la_min, ln_min, la_max, ln_max, rng, pts_per_side=10):
    """Sawtooth-perturbed rectangle outer ring (~4*pts_per_side vertices) —
    gives bench zones realistic vertex counts instead of 4-corner rects
    (real timezone polygons have hundreds of vertices)."""
    amp_la = 0.04 * (la_max - la_min)
    amp_ln = 0.04 * (ln_max - ln_min)
    lats, lngs = [], []
    for k in range(pts_per_side):  # top edge, left→right
        t = k / pts_per_side
        lats.append(la_max - amp_la * rng.uniform(0, 1))
        lngs.append(ln_min + t * (ln_max - ln_min))
    for k in range(pts_per_side):  # right edge, top→bottom
        t = k / pts_per_side
        lats.append(la_max - t * (la_max - la_min))
        lngs.append(ln_max - amp_ln * rng.uniform(0, 1))
    for k in range(pts_per_side):  # bottom edge, right→left
        t = k / pts_per_side
        lats.append(la_min + amp_la * rng.uniform(0, 1))
        lngs.append(ln_max - t * (ln_max - ln_min))
    for k in range(pts_per_side):  # left edge, bottom→top
        t = k / pts_per_side
        lats.append(la_min + t * (la_max - la_min))
        lngs.append(ln_min + amp_ln * rng.uniform(0, 1))
    return np.array(lats), np.array(lngs)


def grid_world_zones(n: int = 12, seed: int = 7,
                     lat0=-60.0, lat1=70.0, lng0=-170.0, lng1=170.0,
                     jagged: bool = False,
                     pts_per_side: int = 10) -> list[ZoneRecord]:
    """Jittered n×n grid of zones (rect, or jagged polygons of
    ``4·pts_per_side`` vertices with ``jagged=True``), every 4th with a
    hole, plus ocean background bands so every point on the planet matches
    something. Deterministic (seeded); used for scale tests and the bench
    harness."""
    rng = np.random.default_rng(seed)
    dla = (lat1 - lat0) / n
    dln = (lng1 - lng0) / n
    zones: list[ZoneRecord] = []
    k = 0
    for i in range(n):
        for j in range(n):
            la_min = lat0 + i * dla + rng.uniform(0, 0.2 * dla)
            la_max = lat0 + (i + 1) * dla - rng.uniform(0, 0.2 * dla)
            ln_min = lng0 + j * dln + rng.uniform(0, 0.2 * dln)
            ln_max = lng0 + (j + 1) * dln - rng.uniform(0, 0.2 * dln)
            if jagged:
                rings = [_jagged_ring(la_min, ln_min, la_max, ln_max, rng,
                                      pts_per_side=pts_per_side)]
            else:
                rings = rect_rings(la_min, ln_min, la_max, ln_max)
            if k % 4 == 0:
                # hole in the middle third
                hla = (la_max - la_min) / 3.0
                hln = (ln_max - ln_min) / 3.0
                rings.append((np.array([la_min + 2 * hla, la_min + hla,
                                        la_min + hla, la_min + 2 * hla]),
                              np.array([ln_min + hln, ln_min + hln,
                                        ln_min + 2 * hln, ln_min + 2 * hln])))
            zones.append(make_zone(f"Grid/Z{i:02d}_{j:02d}", rings))
            k += 1
    zones.extend(ocean_band_zones(min_lat=-90.0, max_lat=90.0))
    return zones


def grid_world_table(n: int = 12, seed: int = 7, jagged: bool = False):
    return zones_to_table(grid_world_zones(n=n, seed=seed, jagged=jagged))


def _star_ring(la_min, ln_min, la_max, ln_max, rng, n_pts=200):
    """Star-shaped ring of ``n_pts`` vertices inside the cell: radius
    perturbed per monotone angle — ALWAYS simple (no self-intersections),
    unlike dense sawtooth rectangles whose corner perturbations cross.
    Matches real boundary polygons (simple rings, irregular but dense)."""
    cy = 0.5 * (la_min + la_max)
    cx = 0.5 * (ln_min + ln_max)
    ry = 0.5 * (la_max - la_min)
    rx = 0.5 * (ln_max - ln_min)
    theta = np.linspace(0.0, 2.0 * np.pi, n_pts, endpoint=False)
    r = 0.75 + 0.25 * rng.uniform(0, 1, n_pts)
    return cy + ry * r * np.sin(theta), cx + rx * r * np.cos(theta)


def big_world_zones(n: int = 100, seed: int = 13,
                    edges_per_rec: int = 200,
                    lat0=-60.0, lat1=70.0, lng0=-170.0,
                    lng1=170.0) -> list[ZoneRecord]:
    """Real-data-scale rehearsal world: n² (default 10⁴) star-polygon
    records of ``edges_per_rec`` (default 200) edges each, every 4th with
    a hole — the vertex density of real timezone-boundary-builder polygons
    (reference corpus: ~450 features, but 2020d oceans-variant rings run
    to 10⁵ vertices; this world stresses the same per-record edge volume
    and the 10⁴-record dispatch regime ahead of the real-data day)."""
    rng = np.random.default_rng(seed)
    dla = (lat1 - lat0) / n
    dln = (lng1 - lng0) / n
    zones: list[ZoneRecord] = []
    for i in range(n):
        for j in range(n):
            la_min, la_max = lat0 + i * dla, lat0 + (i + 1) * dla
            ln_min, ln_max = lng0 + j * dln, lng0 + (j + 1) * dln
            rings = [_star_ring(la_min, ln_min, la_max, ln_max, rng,
                                n_pts=edges_per_rec)]
            if (i * n + j) % 4 == 0:  # hole in the middle third
                hla, hln = dla / 3.0, dln / 3.0
                rings.append((np.array([la_min + 2 * hla, la_min + hla,
                                        la_min + hla, la_min + 2 * hla]),
                              np.array([ln_min + hln, ln_min + hln,
                                        ln_min + 2 * hln, ln_min + 2 * hln])))
            zones.append(make_zone(f"Big/Z{i:03d}_{j:03d}", rings))
    zones.extend(ocean_band_zones(min_lat=-90.0, max_lat=90.0))
    return zones


def gap_world_zones() -> list[ZoneRecord]:
    """Fallback-oracle world: three nested rectangles of distinct areas
    whose envelopes all span the SAME 3×3 block of 5° grid cells
    (lat/lng ∈ (0, 15)), and NO ocean background. Most of the planet is
    uncovered, so the kNN fallback fires; points inside resolve normally
    (smallest-area wins — the nesting exercises the rank logic). Because
    every zone's cell cover is IDENTICAL, any candidate ring that hits
    one zone holds ALL of them — the ring-stop heuristic is provably the
    global argmin, which is what makes the fallback SQL-checkable."""
    return [
        rect_zone("Gap/Inner", 2.0, 2.0, 13.0, 11.0),
        rect_zone("Gap/Mid", 1.0, 1.0, 14.0, 12.0),
        rect_zone("Gap/Outer", 0.5, 0.5, 14.5, 14.5),
    ]


def gap_world_table():
    return zones_to_table(gap_world_zones())


def big_world_table(n: int = 100, seed: int = 13, edges_per_rec: int = 200):
    return zones_to_table(big_world_zones(n=n, seed=seed,
                                          edges_per_rec=edges_per_rec))
