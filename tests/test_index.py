"""Index build + lookup conformance: known-location corpus, cell-indexed ≡
linear-scan oracle, scoped == everywhere, region guards, version gate.
Mirrors the reference suite `TimeZoneMapTest.java` (see FIXTURES.md §5)."""

import numpy as np
import pytest

from timezonemap_ray import worlds, zonetable
from timezonemap_ray.api import TimeZoneEngine
from timezonemap_ray.index import build_index, lookup_batch, lookup_linear_scan


@pytest.fixture(scope="module")
def zone_table():
    return worlds.conformance_table()


@pytest.fixture(scope="module")
def engine(zone_table):
    return TimeZoneEngine(build_index(zone_table))


def test_known_locations(engine):
    """`sanityCheckKnownLocations` analogue: expected list is a prefix of
    all_zones (smallest-area first)."""
    for (lat, lng), expected in worlds.CONFORMANCE_CASES:
        got = engine.get_overlapping_time_zones(lat, lng)
        assert got[:len(expected)] == expected, (lat, lng, got, expected)
        top1 = engine.get_overlapping_time_zone(lat, lng)
        assert top1 == expected[0], (lat, lng, top1, expected)


def test_scoped_equals_everywhere(engine, zone_table):
    """Reference `TimeZoneMapTest.java:112-123`: each point re-checked on a
    ±1° scoped map; scoped result == everywhere result."""
    for (lat, lng), expected in worlds.CONFORMANCE_CASES:
        scoped = TimeZoneEngine.for_region(
            zone_table, lat - 1, lng - 1, lat + 1, lng + 1)
        assert scoped.get_overlapping_time_zone(lat, lng) == \
            engine.get_overlapping_time_zone(lat, lng), (lat, lng)


def test_cell_index_equals_linear_scan(engine):
    """Cell-cover join must equal the reference's linear-scan semantics
    (`TimeZoneMap.kt:84`) row-for-row on random points."""
    rng = np.random.default_rng(11)
    lats = rng.uniform(-89, 89, 4000)
    lngs = rng.uniform(-179, 179, 4000)
    fast = lookup_batch(engine.index, lats, lngs, want_all=True)
    slow = lookup_linear_scan(engine.index, lats, lngs, want_all=True)
    assert fast["zone_id"].tolist() == slow["zone_id"].tolist()
    assert fast["matched"].tolist() == slow["matched"].tolist()
    assert fast["all_zones"] == slow["all_zones"]


def test_region_guard(engine):
    with pytest.raises(ValueError):
        engine.get_overlapping_time_zone(91.0, 0.0)
    scoped = TimeZoneEngine.for_region(worlds.conformance_table(), 0, 0, 10, 10)
    with pytest.raises(ValueError):
        scoped.get_overlapping_time_zone(20.0, 5.0)
    # vectorized path flags instead of throwing
    res = lookup_batch(scoped.index, [20.0], [5.0])
    assert res["error"][0] == "outside_initialized_region"
    assert res["zone_id"][0] is None


def test_region_corners_inclusive(zone_table):
    """`scopedRegionTest_Africa_Rectangular` analogue: region corners resolve;
    a ULP outside raises (`TimeZoneMapTest.java:355-384`)."""
    r = (32.0, -110.0, 45.0, -90.0)  # inside the US stripe zones
    eng = TimeZoneEngine.for_region(zone_table, *r)
    for lat, lng in [(r[0], r[1]), (r[0], r[3]), (r[2], r[1]), (r[2], r[3])]:
        assert eng.get_overlapping_time_zone(lat, lng) is not None
    with pytest.raises(ValueError):
        eng.get_overlapping_time_zone(np.nextafter(r[0], -90), r[1])
    with pytest.raises(ValueError):
        eng.get_overlapping_time_zone(r[2], np.nextafter(r[3], 0))


def test_degenerate_stripe_region(zone_table):
    """`scopedRegionTest_USA_Line`: a 1e-6°-tall stripe across the US sees
    exactly the five stripe zones, in longitude order of query."""
    eng = TimeZoneEngine.for_region(zone_table, 39.0, -124.0, 39.000001, -71.0)
    zone_set = set(eng.get_time_zones())
    expected = {z for z, _, _ in worlds.USA_STRIPE_ZONES}
    assert expected <= zone_set
    for zid, lo, hi in worlds.USA_STRIPE_ZONES:
        assert eng.get_overlapping_time_zone(39.0000005, (lo + hi) / 2) == zid


def test_clipped_regions_within_envelope(zone_table):
    """Reference `:294-302`: all clipped geometries ⊆ init envelope
    (inflated 1e-10)."""
    region = (10.0, -50.0, 50.0, 30.0)
    eng = TimeZoneEngine.for_region(zone_table, *region)
    e = 1e-10
    for i in range(len(eng.index)):
        xs, ys = eng.index.xs[i], eng.index.ys[i]
        assert ys.min() >= region[0] - e and ys.max() <= region[2] + e
        assert xs.min() >= region[1] - e and xs.max() <= region[3] + e


def test_zone_order_area_ascending(engine):
    areas = engine.index.area_deg2
    assert (np.diff(areas) >= 0).all()
    ranks = engine.index.area_rank
    assert (np.diff(ranks) > 0).all()


def test_version_gate(tmp_path, zone_table):
    p = str(tmp_path / "zones.parquet")
    zonetable.write_zone_table(zone_table, p, "testworld-1")
    eng = TimeZoneEngine.for_everywhere(p)
    assert eng.map_version == f"{zonetable.ENGINE_VERSION}:testworld-1"
    # incompatible version marker → error (reference `TimeZoneMap.kt:171-182`)
    import pyarrow.parquet as pq
    t = pq.read_table(p)
    bad = t.replace_schema_metadata({b"map_version": b"99.0:testworld-1"})
    p2 = str(tmp_path / "bad.parquet")
    pq.write_table(bad, p2)
    with pytest.raises(ValueError, match="Incompatible"):
        TimeZoneEngine.for_everywhere(p2)
    # missing marker → error (`no_version_marker.tar` analogue)
    p3 = str(tmp_path / "nomarker.parquet")
    pq.write_table(t.replace_schema_metadata({}), p3)
    with pytest.raises(ValueError, match="[Nn]o version"):
        TimeZoneEngine.for_everywhere(p3)


def test_envelope_pushdown_prunes(tmp_path, zone_table):
    """M7 analogue: a small region load only deserializes overlapping zones
    (the reference asserts bytesRead < 1.5 MB; we assert record count)."""
    p = str(tmp_path / "zones.parquet")
    zonetable.write_zone_table(zone_table, p, "testworld-1")
    world = TimeZoneEngine.for_everywhere(p)
    small = TimeZoneEngine.for_region(p, 38.5, -8.0, 40.5, -6.0)
    assert len(small.index) < len(world.index)
    assert set(small.index.zone_ids) >= {"Test/West", "Test/East"}


def test_kn_fallback(zone_table):
    """north_star extension: unmatched points get the nearest zone."""
    # region clipped so the point has no containing zone: use a world with a
    # gap — scope to a region over the Antarctic/sea boundary gap... instead
    # build a tiny world with one zone and a far point
    t = zonetable.zones_to_table([worlds.rect_zone("Only/Zone", 0, 0, 10, 10)])
    eng = TimeZoneEngine(build_index(t, cell_size=5.0))
    res = lookup_batch(eng.index, [20.0], [5.0], fallback=True)
    assert res["zone_id"][0] == "Only/Zone"
    assert bool(res["fallback"][0])
    res2 = lookup_batch(eng.index, [20.0], [5.0], fallback=False)
    assert res2["zone_id"][0] is None
    assert not bool(res2["matched"][0])


def test_subcover_path_dense_overlaps():
    """Force the 4x4 subcell cover (many overlapping zones in one cell) and
    prove the routed lookup still equals the linear scan."""
    from timezonemap_ray.index import SPLIT_THRESHOLD
    from timezonemap_ray.zonetable import zones_to_table
    zones = []
    # 24 nested rectangles all overlapping the same 5-degree cell
    for k in range(SPLIT_THRESHOLD + 8):
        d = 0.1 + 0.08 * k
        zones.append(worlds.rect_zone(f"Nest/Z{k:02d}", 10.0, 10.0,
                                      10.0 + d, 10.0 + d))
    idx = build_index(zones_to_table(zones), cell_size=5.0)
    assert len(idx.subcover) > 0  # the dense cell split
    rng = np.random.default_rng(31)
    lats = rng.uniform(9.5, 13.0, 3000)
    lngs = rng.uniform(9.5, 13.0, 3000)
    fast = lookup_batch(idx, lats, lngs, want_all=True)
    slow = lookup_linear_scan(idx, lats, lngs, want_all=True)
    assert fast["zone_id"].tolist() == slow["zone_id"].tolist()
    assert fast["all_zones"] == slow["all_zones"]


def test_fallback_matches_brute_nearest():
    """Vectorized kNN fallback == brute nearest-zone-by-geodesic oracle."""
    from timezonemap_ray import geom
    from timezonemap_ray.zonetable import zones_to_table
    # gappy world: three separated zones, points in the gaps
    zones = [worlds.rect_zone("A", 0, 0, 5, 5),
             worlds.rect_zone("B", 0, 20, 5, 25),
             worlds.rect_zone("C", 30, 0, 35, 5)]
    idx = build_index(zones_to_table(zones), cell_size=5.0)
    rng = np.random.default_rng(41)
    lats = rng.uniform(-5, 40, 300)
    lngs = rng.uniform(-5, 30, 300)
    res = lookup_batch(idx, lats, lngs, fallback=True)
    # brute oracle: nearest zone over ALL zones by geodesic boundary distance
    for k in range(len(lats)):
        if res["matched"][k] and not res["fallback"][k]:
            continue
        best, best_d = None, np.inf
        for i in range(len(idx)):
            nx, ny = geom.nearest_on_boundary(
                np.array([lngs[k]]), np.array([lats[k]]),
                idx.xs[i], idx.ys[i], idx.ring_starts[i])
            d = float(np.asarray(geom.geodesic_distance_m(
                np.array([lats[k]]), np.array([lngs[k]]), ny, nx))[0])
            if d < best_d:
                best, best_d = idx.zone_ids[i], d
        assert res["zone_id"][k] == best, (lats[k], lngs[k])


def test_fallback_ring_candidates_equal_global_argmin():
    """kNN fallback on the gap world (all zones share ONE cell cover ⇒
    complete candidate sets): the ring-searched nearest zone equals the
    brute-force global argmin, in both metrics; ties break to the
    smaller area rank."""
    import numpy as np

    from timezonemap_ray import geom
    from timezonemap_ray.index import lookup_batch

    idx = build_index(worlds.gap_world_table())
    rng = np.random.default_rng(3)
    lats = rng.uniform(-24.0, 29.0, 400)
    lngs = rng.uniform(-24.0, 29.0, 400)
    for metric in ("planar_d2", "geodesic_m"):
        res = lookup_batch(idx, lats, lngs, fallback=True,
                           fallback_metric=metric)
        assert res["matched"].all()
        # brute global argmin over every zone's boundary
        best_d = np.full(lats.size, np.inf)
        best = np.full(lats.size, -1, dtype=np.int64)
        for rec_i in range(len(idx.zone_ids)):
            nx, ny = geom.nearest_on_boundary(
                lngs, lats, idx.xs[rec_i], idx.ys[rec_i],
                idx.ring_starts[rec_i])
            if metric == "planar_d2":
                d = (nx - lngs) ** 2 + (ny - lats) ** 2
            else:
                d = geom.geodesic_distance_m(lats, lngs, ny, nx)
            take = d < best_d
            best_d = np.where(take, d, best_d)
            best = np.where(take, rec_i, best)
        names = np.asarray(idx.zone_ids, dtype=object)
        fb_rows = np.flatnonzero(res["fallback"])
        assert fb_rows.size > 300
        got = np.asarray(res["zone_id"], dtype=object)[fb_rows]
        assert (got == names[best[fb_rows]]).all()
