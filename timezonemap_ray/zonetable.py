"""Polygon (zone) dimension-table build — the reference builder ETL, columnar.

Reimplements the semantics of the reference builder
(`/root/reference/builder/src/main/java/us/dustinj/timezonemap/builder/Main.kt:96-122`):
GeoJSON features → one record per polygon (MultiPolygon explode, `Main.kt:78-94`)
→ cleanse (ring closure/dedup; we target even-odd PIP so full Esri simplify is
unnecessary — divergence documented in SURVEY.md §2 M3) → float32 downcast
(`Main.kt:41-42`) → envelope + shoelace area → parquet with a version sidecar
(replacing the tar-of-FlatBuffers archive, `Main.kt:112-120`).

Table schema (FIXTURES.md §2)::

    zones(zone_id: string,
          rings: list<list<struct<lat:float32, lng:float32>>>,
          min_lat,min_lng,max_lat,max_lng: float64,
          area_deg2: float64, area_rank: int32, n_points: int32)

The real ~450-feature dataset needs no distribution; this module is
driver-side pure python/pyarrow. At 100 TB the zone table is still the tiny
broadcast side of the join — only the point side scales.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import geom

ENGINE_VERSION = "1.0"

RING_TYPE = pa.list_(pa.list_(pa.struct([("lat", pa.float32()), ("lng", pa.float32())])))

ZONE_SCHEMA = pa.schema([
    ("zone_id", pa.string()),
    ("rings", RING_TYPE),
    ("min_lat", pa.float64()),
    ("min_lng", pa.float64()),
    ("max_lat", pa.float64()),
    ("max_lng", pa.float64()),
    ("area_deg2", pa.float64()),
    ("area_rank", pa.int32()),
    ("n_points", pa.int32()),
])


@dataclass
class ZoneRecord:
    """One polygon record: zone id + rings as float32-round-tripped coords."""
    zone_id: str
    # list of (lats, lngs) float64 arrays, ALREADY round-tripped through f32
    rings: list = field(default_factory=list)

    def flat(self):
        """(xs=lng, ys=lat, ring_start) float64 for the geom kernels."""
        xs = np.concatenate([lngs for _, lngs in self.rings]) if self.rings else np.empty(0)
        ys = np.concatenate([lats for lats, _ in self.rings]) if self.rings else np.empty(0)
        starts = np.zeros(len(self.rings) + 1, dtype=np.int64)
        for i, (lats, _) in enumerate(self.rings):
            starts[i + 1] = starts[i] + lats.size
        return xs, ys, starts


def _f32_roundtrip(a) -> np.ndarray:
    """Downcast to float32 then widen back — the reference's storage precision
    (`Serialization.kt:12`, widened at query time `Util.kt:19-21`)."""
    return np.asarray(a, dtype=np.float32).astype(np.float64)


def cleanse_ring(lats, lngs):
    """Normalize one ring: f32 round-trip, drop explicit closure + consecutive
    duplicate vertices (reference cleanse, `Main.kt:44-60`, reduced to what
    even-odd PIP needs)."""
    lats = _f32_roundtrip(lats)
    lngs = _f32_roundtrip(lngs)
    if lats.size >= 2 and lats[0] == lats[-1] and lngs[0] == lngs[-1]:
        lats, lngs = lats[:-1], lngs[:-1]
    if lats.size == 0:
        return lats, lngs
    prev_la = np.roll(lats, 1)
    prev_ln = np.roll(lngs, 1)
    keep = ~((lats == prev_la) & (lngs == prev_ln))
    keep[0] = True
    return lats[keep], lngs[keep]


def make_zone(zone_id: str, rings) -> ZoneRecord:
    """rings: iterable of (lats, lngs) sequences (ring 0 outer, then holes...).

    M3 (closed in round 4): the reference force-runs Esri
    ``OperatorSimplify`` (`builder/Main.kt:44-60`), which resolves
    self-intersecting / mutually-crossing rings into simple pieces.
    Rounds 2-3 kept dirty rings and made every consumer
    representation-insensitive (even-odd PIP, parity-scanline area);
    round 4 normalizes the representation itself:
    ``geom_simplify.simplify_even_odd`` (planar arrangement + exact
    parity classification) replaces a non-simple ring set with simple,
    pairwise non-crossing rings of identical even-odd interior — so the
    stored geometry matches what the reference builder would serialize.
    Like the reference (simplify in doubles, store f32), normalized
    coordinates go through the f32 round-trip afterwards."""
    rec = ZoneRecord(zone_id)
    for lats, lngs in rings:
        la, ln = cleanse_ring(np.asarray(lats, float), np.asarray(lngs, float))
        if la.size >= 3:
            rec.rings.append((la, ln))
    if rec.rings:
        from .geom_simplify import polygon_is_simple, simplify_even_odd
        xs, ys, rs = rec.flat()
        if not polygon_is_simple(xs, ys, rs):
            import logging
            logging.getLogger(__name__).warning(
                "zone %r: ring set self-intersects or crosses; normalizing "
                "to simple rings (OperatorSimplify twin, M3)", zone_id)
            normalized = simplify_even_odd(rec.rings)
            rec.rings = []
            for la, ln in normalized:
                la2, ln2 = cleanse_ring(la, ln)
                if la2.size >= 3:
                    rec.rings.append((la2, ln2))
    return rec


def zones_from_geojson(feature_collection: dict) -> list[ZoneRecord]:
    """GeoJSON FeatureCollection → zone records.

    Flat-map semantics of ``convertFeatureToTimeZones`` (`Main.kt:78-94`):
    ``Polygon`` → 1 record (outer + holes); ``MultiPolygon`` → one record per
    component polygon; zone id from ``properties.tzid``; unknown geometry →
    ``ValueError``. Altitude dropped, doubles downcast to f32 (`Main.kt:41-42`).
    """
    out = []
    for feat in feature_collection.get("features", []):
        tzid = feat["properties"]["tzid"]
        g = feat["geometry"]
        gtype, coords = g["type"], g["coordinates"]
        if gtype == "Polygon":
            polys = [coords]
        elif gtype == "MultiPolygon":
            polys = coords
        else:
            raise ValueError(f"Unknown geometry type: {gtype}")
        for poly in polys:
            rings = []
            for ring in poly:
                arr = np.asarray([(pt[1], pt[0]) for pt in ring], dtype=np.float64)
                rings.append((arr[:, 0], arr[:, 1]))
            rec = make_zone(tzid, rings)
            if rec.rings:
                out.append(rec)
    return out


def zones_to_table(zones: list[ZoneRecord]) -> pa.Table:
    """Zone records → Arrow table, sorted area-ascending with dense
    ``area_rank`` (reference global sort, `TimeZoneMap.kt:216-217`; stable —
    ties keep input order, which makes top-1 overlap results deterministic)."""
    rows = []
    for i, z in enumerate(zones):
        xs, ys, rs = z.flat()
        if xs.size == 0:
            continue  # empty-after-cleanse filter (`Main.kt:107-109`)
        min_x, min_y, max_x, max_y = geom.polygon_envelope(xs, ys)
        rows.append({
            "zone_id": z.zone_id,
            "rings": [[{"lat": float(la), "lng": float(ln)}
                       for la, ln in zip(lats, lngs)] for lats, lngs in z.rings],
            "min_lat": min_y, "min_lng": min_x,
            "max_lat": max_y, "max_lng": max_x,
            "area_deg2": geom.polygon_area_deg2(xs, ys, rs),
            "n_points": int(xs.size),
            "_order": i,
        })
    rows.sort(key=lambda r: (r["area_deg2"], r["_order"]))
    for rank, r in enumerate(rows):
        r["area_rank"] = rank
        del r["_order"]
    if not rows:
        return ZONE_SCHEMA.empty_table()
    cols = {name: [r[name] for r in rows] for name in ZONE_SCHEMA.names}
    return pa.Table.from_pydict(cols, schema=ZONE_SCHEMA)


def write_zone_table(table: pa.Table, path: str, map_version: str) -> None:
    """Write the polygon table + version sidecar.

    Replaces the zero-byte ``"Version: <lib>:<map>"`` tar marker
    (`Main.kt:116,161`) with parquet KV metadata + a JSON sidecar.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    meta = dict(table.schema.metadata or {})
    meta[b"map_version"] = f"{ENGINE_VERSION}:{map_version}".encode()
    pq.write_table(table.replace_schema_metadata(meta), path, compression="zstd")
    with open(path + ".meta.json", "w") as f:
        json.dump({"map_version": f"{ENGINE_VERSION}:{map_version}"}, f)


def read_map_version(path: str) -> str:
    md = pq.read_schema(path).metadata or {}
    if b"map_version" in md:
        return md[b"map_version"].decode()
    sidecar = path + ".meta.json"
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            return json.load(f)["map_version"]
    raise ValueError("No version marker found in map archive")  # M5 analogue


# Library-version prefixes whose WIRE FORMAT this engine reads: the
# FlatBuffers+tar+zstd layout replayed in sources/flatbuf.py is the
# reference's 4.x format (pom.xml:7 `<version>4.5</version>`,
# `Serialization.kt:26-63`), so archives stamped by that Java build
# (e.g. "4.5:2020d") open directly.
REFERENCE_WIRE_VERSIONS = frozenset({"4.5"})


def check_version_string(v: str, accept=()) -> str:
    """Version compatibility gate on a version STRING (reference M5,
    `TimeZoneMap.kt:171-182`): engine-version prefix must match — or any
    prefix in ``accept`` (extra known-compatible writer versions, e.g.
    ``REFERENCE_WIRE_VERSIONS`` for Java-reference-built archives) —
    else ``ValueError``. Shared by the parquet table and the tar
    archive."""
    lib = v.split(":", 1)[0]
    if lib != ENGINE_VERSION and lib not in accept:
        raise ValueError(
            f"Incompatible map archive: engine version {ENGINE_VERSION}, archive {v}")
    return v


def check_map_version(path: str) -> str:
    """M5 gate for a parquet zone table path."""
    return check_version_string(read_map_version(path))


def table_to_records(table: pa.Table) -> list[dict]:
    """Zone table rows → flat numpy polygon records for the index/joiner.

    Each record: ``{zone_id, xs, ys, ring_start, env=(min_x,min_y,max_x,max_y),
    area_deg2, area_rank}`` with coords widened f32→f64.
    """
    recs = []
    zone_ids = table["zone_id"].to_pylist()
    areas = table["area_deg2"].to_pylist()
    ranks = table["area_rank"].to_pylist()
    envs = list(zip(table["min_lng"].to_pylist(), table["min_lat"].to_pylist(),
                    table["max_lng"].to_pylist(), table["max_lat"].to_pylist()))
    rings_col = table["rings"]
    for i in range(table.num_rows):
        rings = rings_col[i].as_py()
        xs_parts, ys_parts, starts = [], [], [0]
        for ring in rings:
            xs_parts.append(np.array([p["lng"] for p in ring], dtype=np.float64))
            ys_parts.append(np.array([p["lat"] for p in ring], dtype=np.float64))
            starts.append(starts[-1] + len(ring))
        recs.append({
            "zone_id": zone_ids[i],
            "xs": np.concatenate(xs_parts) if xs_parts else np.empty(0),
            "ys": np.concatenate(ys_parts) if ys_parts else np.empty(0),
            "ring_start": np.array(starts, dtype=np.int64),
            "env": envs[i],
            "area_deg2": areas[i],
            "area_rank": ranks[i],
        })
    return recs
