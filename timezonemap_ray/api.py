"""Public engine API mirroring the reference's surface.

Reference API (`/root/reference/timezonemap/src/main/java/us/dustinj/timezonemap/TimeZoneMap.kt:23-159`,
`TimeZone.kt:11-47`) → ours:

| reference                       | here                                  |
|---------------------------------|---------------------------------------|
| ``forEverywhere()``             | ``TimeZoneEngine.for_everywhere``     |
| ``forRegion(minLat..maxLng)``   | ``TimeZoneEngine.for_region``         |
| ``getOverlappingTimeZone``      | ``get_overlapping_time_zone``         |
| ``getOverlappingTimeZones``     | ``get_overlapping_time_zones``        |
| ``getTimeZones``                | ``get_time_zones``                    |
| ``getMapVersion``               | ``map_version`` property              |
| ``getInitializedRegion``        | ``initialized_region`` property       |
| ``TimeZone.getDistanceFromBoundary`` | ``get_distance_from_boundary``  |
| bring-your-own-archive stream   | zone-table path/Table argument        |

Point-at-a-time calls are driver-side conveniences; the engine's real query
surface is the Dataset methods ``lookup_points`` / ``lookup_points_shuffled``
/ ``boundary_distance`` which run the join distributed.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import ray

from . import index as index_mod
from .index import WORLD, ZoneIndex, build_index


class TimeZoneEngine:
    def __init__(self, idx: ZoneIndex):
        self.index = idx
        self._index_ref = None

    # -- constructors (reference TimeZoneMap.kt:97-159) ---------------------
    @classmethod
    def for_everywhere(cls, zone_table, **kw) -> "TimeZoneEngine":
        return cls(build_index(zone_table, region=WORLD, **kw))

    @classmethod
    def for_region(cls, zone_table, min_lat: float, min_lng: float,
                   max_lat: float, max_lng: float, **kw) -> "TimeZoneEngine":
        return cls(build_index(zone_table, region=(min_lat, min_lng, max_lat, max_lng), **kw))

    @classmethod
    def from_archive(cls, path: str, region: tuple | None = None,
                     check_version: bool = True, **kw) -> "TimeZoneEngine":
        """Open a tar+zstd zone ARCHIVE (the reference's bring-your-own-
        archive stream, `TimeZoneMap.kt:104-113`): region-scoped opens skip
        non-overlapping zones from the entry NAME alone — payload bytes for
        pruned zones are never parsed (``sources/archive.py``).

        Sniffs the payload format: the repo's parquet-payload twin
        (``ZSTDTAR1``) and the reference's EXACT wire format (standard
        zstd frame or plain tar of FlatBuffer payloads — round 4) both
        open. Java-reference-built archives (version stamps like
        "4.5:2020d") pass the gate via ``REFERENCE_WIRE_VERSIONS``;
        ``check_version=False`` skips the gate entirely (the caller
        vouches for wire compatibility)."""
        from .index import WORLD
        from .sources.archive import read_map_archive, read_zone_archive
        with open(path, "rb") as f:
            magic = f.read(8)
        if magic == b"ZSTDTAR1":
            table, stats = read_zone_archive(path, region=region,
                                             check_version=check_version)
        else:
            table, stats = read_map_archive(path, region=region,
                                            check_version=check_version)
        eng = cls(build_index(table, region=region or WORLD,
                              check_version=False, **kw))
        eng.index.map_version = stats["map_version"]
        return eng

    # -- metadata accessors -------------------------------------------------
    @property
    def map_version(self) -> Optional[str]:
        return self.index.map_version

    @property
    def initialized_region(self) -> tuple:
        return self.index.region

    def get_time_zones(self) -> list:
        """Zone ids, smallest-area first (reference ``getTimeZones``,
        `TimeZoneMap.kt:25-34`) — one entry per kept RECORD, where records
        are one per builder polygon (MultiPolygon exploded at build on both
        sides, `Main.kt:78-94` / ``zones_from_geojson``).

        Cardinality parity note (analyzed round 2): the reference's region
        clip (`TimeZoneMap.kt:218-235`) runs ``OperatorIntersection`` over a
        single geometry pair and wraps EACH returned polygon in a TimeZone —
        but the cursor yields ONE (possibly multi-part) polygon per record,
        so its cardinality equals ours (we too keep a clipped record's
        disjoint rings in one record). The only residual divergence is
        degenerate clips (zone touching the region in a line/point), which
        Esri may emit as lower-dimension geometry that terminates the
        reference's ``as? Polygon`` sequence and which we drop as empty —
        neither side emits a queryable area for those.
        """
        return list(self.index.zone_ids)

    def get_zone_geometry(self, zone_id: str) -> list:
        """Clipped geometry of a zone as rings of (lat, lng) float64 pairs —
        the ``TimeZone.getRegion`` accessor (`TimeZone.kt:21-24`). A zone may
        have multiple records after clipping; all are returned."""
        out = []
        for i in range(len(self.index)):
            if self.index.zone_ids[i] != zone_id:
                continue
            xs, ys = self.index.xs[i], self.index.ys[i]
            rs = self.index.ring_starts[i]
            rings = []
            for r in range(len(rs) - 1):
                s, e = int(rs[r]), int(rs[r + 1])
                rings.append(list(zip(ys[s:e].tolist(), xs[s:e].tolist())))
            out.append(rings)
        if not out:
            raise KeyError(zone_id)
        return out

    # -- point queries (driver-side; raise like the reference Q1 guard) -----
    def _require_in_region(self, lat: float, lng: float) -> None:
        if not bool(self.index.contains_region(lat, lng)):
            raise ValueError("Requested point is outside the initialized area")

    def get_overlapping_time_zone(self, lat: float, lng: float) -> Optional[str]:
        self._require_in_region(lat, lng)
        res = index_mod.lookup_batch(self.index, [lat], [lng])
        return res["zone_id"][0]

    def get_overlapping_time_zones(self, lat: float, lng: float) -> list:
        self._require_in_region(lat, lng)
        res = index_mod.lookup_batch(self.index, [lat], [lng], want_all=True)
        return res["all_zones"][0]

    def get_distance_from_boundary(self, zone_id: str, lat: float, lng: float) -> float:
        """Geodesic meters to the zone's boundary; raises if the point is not
        inside the zone (inclusive), matching ``TimeZone.kt:41-47``."""
        d = index_mod.distance_from_boundary(self.index, zone_id, [lat], [lng])
        if np.isnan(d[0]):
            raise ValueError("Point is not within the time zone (inclusive)")
        return float(d[0])

    # -- distributed queries ------------------------------------------------
    def broadcast(self):
        """`ray.put` the index once; all actor-pool stages share the copy."""
        if self._index_ref is None:
            self._index_ref = ray.put(self.index)
        return self._index_ref

    @staticmethod
    def _default_concurrency() -> tuple:
        """Autoscaling actor pool sized to the session: (1, num_cpus)."""
        try:
            n = int(ray.cluster_resources().get("CPU", 4))
        except Exception:
            n = 4
        return (1, max(2, n))

    def lookup_points(self, ds, lat_col="lat", lng_col="lng", want_all=False,
                      fallback=False, concurrency=None, batch_size=None,
                      compute="tasks"):
        """Broadcast PIP join: Dataset of points → + zone columns.

        The polygon index is tiny relative to the point side (~10^4 zones vs
        the full corpus), so the join is broadcast — the only data movement
        is the one-time index transfer per node; the point side streams.

        ``batch_size=None`` (default) feeds WHOLE BLOCKS to the kernel: an
        explicit batch_size inserts a slice/re-batch layer that measured
        ~40% slower on the 32M-point bench (13.4 → 19.8M pts/s); the PIP
        kernel chunks internally for cache residency, so large batches are
        safe. Pass a batch_size only to bound memory for ``want_all`` over
        giant blocks.

        ``compute="tasks"`` (default): plain task pool — the broadcast index
        is fetched from the node-local plasma store and memoized per worker
        process, so tasks are as warm as actors but fuse with upstream
        stages and have no pool-startup latency. ``compute="actors"``: the
        classic stateful actor pool (right when per-worker state is
        genuinely expensive, e.g. lazy geometry decode at the full 2020d
        dataset scale).
        """
        from .stages.joiner import ZoneJoiner, make_join_fn
        if compute == "tasks":
            return ds.map_batches(
                make_join_fn(self.broadcast(), lat_col=lat_col,
                             lng_col=lng_col, want_all=want_all,
                             fallback=fallback),
                batch_format="pyarrow", batch_size=batch_size)
        return ds.map_batches(
            ZoneJoiner,
            fn_constructor_kwargs=dict(
                index_ref=self.broadcast(), lat_col=lat_col, lng_col=lng_col,
                want_all=want_all, fallback=fallback),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency or self._default_concurrency(),
        )

    def lookup_points_shuffled(self, ds, lat_col="lat", lng_col="lng",
                               want_all=False, fallback=False,
                               salt_threshold: int = 250_000):
        """Co-partitioned join: assign cell ids (salting hot cells), shuffle by
        cell, then join per group. Same output as ``lookup_points`` (tested);
        exists to bound per-task candidate sets and give per-cell lineage at
        the 100 TB scale (SURVEY.md §4)."""
        from .pipelines.flagship import shuffled_join
        return shuffled_join(ds, self, lat_col=lat_col, lng_col=lng_col,
                             want_all=want_all, fallback=fallback,
                             salt_threshold=salt_threshold)

    def boundary_distance(self, ds, lat_col="lat", lng_col="lng",
                          zone_col="zone_id", concurrency=None,
                          batch_size=8192, metric="geodesic_m"):
        from .stages.joiner import BoundaryDistance
        return ds.map_batches(
            BoundaryDistance,
            fn_constructor_kwargs=dict(index_ref=self.broadcast(),
                                       lat_col=lat_col, lng_col=lng_col,
                                       zone_col=zone_col, metric=metric),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency or self._default_concurrency(),
        )
