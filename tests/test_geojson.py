"""GeoJSON source/sink round trip: world → GeoJSON (zip) → rebuilt zone
table → identical lookup results (builder ETL parity, reference S1/S2/S6)."""

import json
import zipfile

import numpy as np
import pytest

from timezonemap_ray import worlds
from timezonemap_ray.index import build_index, lookup_linear_scan
from timezonemap_ray.sources import geojson as gj
from timezonemap_ray.zonetable import read_map_version, table_to_records


def test_round_trip_through_geojson(tmp_path):
    zones = worlds.conformance_zones()
    fc = gj.zone_records_to_geojson(zones)
    # write as zip (the reference's input shape)
    zpath = str(tmp_path / "zones.geojson.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.writestr("combined.json", json.dumps(fc))
    out = str(tmp_path / "zones.parquet")
    table = gj.build_zone_table_from_geojson(zpath, out, "roundtrip-1")
    assert read_map_version(out).endswith(":roundtrip-1")

    orig = build_index(worlds.conformance_table())
    rebuilt = build_index(table)
    assert orig.zone_ids == rebuilt.zone_ids

    rng = np.random.default_rng(5)
    lats = rng.uniform(-89, 89, 1500)
    lngs = rng.uniform(-179, 179, 1500)
    a = lookup_linear_scan(orig, lats, lngs)
    b = lookup_linear_scan(rebuilt, lats, lngs)
    assert a["zone_id"].tolist() == b["zone_id"].tolist()


def test_multipolygon_explode(tmp_path):
    fc = {"type": "FeatureCollection", "features": [{
        "type": "Feature", "properties": {"tzid": "Multi/Zone"},
        "geometry": {"type": "MultiPolygon", "coordinates": [
            [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]],
            [[[5, 5], [6, 5], [6, 6], [5, 6], [5, 5]]],
        ]},
    }]}
    from timezonemap_ray.zonetable import zones_from_geojson, zones_to_table
    zones = zones_from_geojson(fc)
    assert len(zones) == 2  # one record per component polygon (Main.kt:78-94)
    t = zones_to_table(zones)
    assert t.num_rows == 2
    assert set(t["zone_id"].to_pylist()) == {"Multi/Zone"}


def test_unknown_geometry_raises():
    from timezonemap_ray.zonetable import zones_from_geojson
    fc = {"type": "FeatureCollection", "features": [{
        "type": "Feature", "properties": {"tzid": "X"},
        "geometry": {"type": "LineString", "coordinates": [[0, 0], [1, 1]]},
    }]}
    with pytest.raises(ValueError, match="Unknown geometry"):
        zones_from_geojson(fc)


def test_dump_index_geojson(tmp_path):
    idx = build_index(worlds.conformance_table())
    p = str(tmp_path / "World.json")
    gj.dump_index_geojson(idx, p)
    with open(p) as f:
        fc = json.load(f)
    assert fc["type"] == "FeatureCollection"
    assert len(fc["features"]) == len(idx)
    # rings are closed
    ring = fc["features"][0]["geometry"]["coordinates"][0]
    assert ring[0] == ring[-1]
