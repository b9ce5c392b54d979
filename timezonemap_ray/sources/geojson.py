"""GeoJSON source / sink for the builder ETL.

Reference S1/S2 (`/root/reference/builder/src/main/java/us/dustinj/timezonemap/builder/Main.kt:33-39,99-102`):
open a local ``timezones-with-oceans.geojson.zip`` (or plain ``.geojson`` /
``.json``) and parse the single FeatureCollection. No network in-sandbox —
the HTTP fallback of the reference is intentionally absent; synthetic worlds
(``worlds.py``) stand in for the real 2020d dataset.

Reference S6 (test-only diagnostic GeoJSON sink,
`TimeZoneMapTest.java:233-270`): dump indexed zone geometries back to
GeoJSON (per-zone features + a World collection) for debugging.
"""

from __future__ import annotations

import json
import zipfile

from ..zonetable import ZoneRecord, zones_from_geojson, zones_to_table


def load_feature_collection(path: str) -> dict:
    """Read a FeatureCollection from .geojson/.json or a .zip holding one."""
    if path.endswith(".zip"):
        with zipfile.ZipFile(path) as zf:
            names = [n for n in zf.namelist() if n.endswith((".json", ".geojson"))]
            if not names:
                raise ValueError(f"No GeoJSON entry in {path}")
            with zf.open(names[0]) as f:
                return json.load(f)
    with open(path) as f:
        return json.load(f)


def build_zone_table_from_geojson(geojson_path: str, out_parquet: str,
                                  map_version: str):
    """The builder ETL end-to-end (reference `Main.kt:96-122`): parse →
    per-polygon explode → cleanse → envelope/area/rank → parquet + version."""
    from ..zonetable import write_zone_table
    fc = load_feature_collection(geojson_path)
    table = zones_to_table(zones_from_geojson(fc))
    write_zone_table(table, out_parquet, map_version)
    return table


def zone_records_to_geojson(records: list) -> dict:
    """Zone records / index records → FeatureCollection (diagnostic sink).

    Accepts ``ZoneRecord``s or index-style dicts with xs/ys/ring_start.
    """
    feats = []
    for rec in records:
        if isinstance(rec, ZoneRecord):
            rings = [[[float(ln), float(la)] for la, ln in zip(lats, lngs)]
                     for lats, lngs in rec.rings]
            zid = rec.zone_id
        else:
            xs, ys, rs = rec["xs"], rec["ys"], rec["ring_start"]
            rings = []
            for r in range(len(rs) - 1):
                s, e = int(rs[r]), int(rs[r + 1])
                rings.append([[float(x), float(y)]
                              for x, y in zip(xs[s:e], ys[s:e])])
            zid = rec["zone_id"]
        # close rings per GeoJSON spec
        rings = [r + [r[0]] for r in rings if len(r) >= 3]
        feats.append({
            "type": "Feature",
            "properties": {"tzid": zid},
            "geometry": {"type": "Polygon", "coordinates": rings},
        })
    return {"type": "FeatureCollection", "features": feats}


def dump_index_geojson(index, out_path: str) -> None:
    """Write the indexed (clipped) zones as one World.json (S6 analogue)."""
    recs = [{"zone_id": index.zone_ids[i], "xs": index.xs[i],
             "ys": index.ys[i], "ring_start": index.ring_starts[i]}
            for i in range(len(index))]
    with open(out_path, "w") as f:
        json.dump(zone_records_to_geojson(recs), f)
