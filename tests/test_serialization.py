"""Zone-table round-trip — the reference's serialization tests
(`serialization/src/test/.../SerializationTest.java:13-36`): a generated
multi-polygon/multi-ring/499-point zone survives parquet round trip with
identical float32-round-tripped coordinates."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from timezonemap_ray.api import TimeZoneEngine
from timezonemap_ray.zonetable import (make_zone, read_map_version,
                                       table_to_records, write_zone_table,
                                       zones_to_table)


def _gen_zone(n_polys=4, n_rings=2, n_points=499, seed=13):
    """One ZoneRecord per 'polygon' like the builder's post-cleanse shape."""
    rng = np.random.default_rng(seed)
    zones = []
    for p in range(n_polys):
        rings = []
        for r in range(n_rings):
            # random star-shaped simple ring so cleanse keeps all points
            center = rng.uniform(-50, 50, 2)
            ang = np.sort(rng.uniform(0, 2 * np.pi, n_points))
            rad = rng.uniform(1.0, 3.0, n_points) / (r + 1)
            rings.append((center[0] + rad * np.sin(ang),
                          center[1] + rad * np.cos(ang)))
        zones.append(make_zone(f"Gen/Zone_{p}", rings))
    return zones


def test_round_trip_exact(tmp_path):
    zones = _gen_zone()
    table = zones_to_table(zones)
    p = str(tmp_path / "gen.parquet")
    write_zone_table(table, p, "gen-1")
    assert read_map_version(p) == "1.0:gen-1"

    back = pq.read_table(p)
    recs = {r["zone_id"]: r for r in table_to_records(back)}
    for z in zones:
        xs, ys, rs = z.flat()
        got = recs[z.zone_id]
        assert np.array_equal(got["xs"], xs)
        assert np.array_equal(got["ys"], ys)
        assert np.array_equal(got["ring_start"], rs)
        assert got["xs"].size == 2 * 499  # all points survived cleanse


def test_engine_from_round_trip(tmp_path):
    zones = _gen_zone(n_polys=2, n_points=99)
    table = zones_to_table(zones)
    p = str(tmp_path / "gen.parquet")
    write_zone_table(table, p, "gen-2")
    eng = TimeZoneEngine.for_everywhere(p)
    assert len(eng.get_time_zones()) == 2
    rings = eng.get_zone_geometry("Gen/Zone_0")
    assert len(rings[0]) == 2  # two rings
    with pytest.raises(KeyError):
        eng.get_zone_geometry("No/Such_Zone")
