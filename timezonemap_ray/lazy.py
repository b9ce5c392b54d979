"""LazyZoneIndex — decode zone geometry on first touch, bounded by LRU.

Mirrors the reference's memory posture: "conserve memory by not loading
regions that are unnecessary" (`/root/reference/README.MD:17`) via the
envelope prefilter that skips deserialization (`TimeZoneMap.kt:184-196`).
Here the compact Arrow zone table (float32 rings, a few MB for the world)
is what every actor holds; per-record float64 coordinate/edge arrays are
materialized only when a query batch first touches one of the record's
cells, and an LRU cap bounds resident decoded records.

Exposes the same attribute surface as ``ZoneIndex`` (`zone_ids``, ``envs``,
``cover``, ``xs[i]``/``ys[i]``/``ring_starts[i]``/``edges[i]``/
``is_rect[i]``, ``contains_region``), so ``index.lookup_batch`` works
unchanged — laziness is an implementation detail of the accessors.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np
import pyarrow as pa

from . import cells, geom
from .index import WORLD, _is_axis_rect


class _LazyField:
    def __init__(self, owner, field):
        self.owner = owner
        self.field = field

    def __getitem__(self, i):
        return self.owner._decoded(int(i))[self.field]


class LazyZoneIndex:
    def __init__(self, table: pa.Table, region: tuple = WORLD,
                 cell_size: float = cells.DEFAULT_CELL_SIZE_DEG,
                 max_cached: int = 512):
        from .zonetable import ZONE_SCHEMA  # noqa: F401 (schema contract)
        min_lat, min_lng, max_lat, max_lng = region
        if not (min_lat < max_lat and min_lng < max_lng):
            raise ValueError("Invalid region: min must be < max")
        # keep only the envelope-overlapping records, area-ascending
        import pyarrow.compute as pc
        mask = pc.and_(
            pc.and_(pc.greater_equal(table["max_lat"], pa.scalar(min_lat)),
                    pc.less_equal(table["min_lat"], pa.scalar(max_lat))),
            pc.and_(pc.greater_equal(table["max_lng"], pa.scalar(min_lng)),
                    pc.less_equal(table["min_lng"], pa.scalar(max_lng))))
        table = table.filter(mask)
        order = pc.sort_indices(table, sort_keys=[("area_rank", "ascending")])
        self.table = table.take(order)

        self.region = region
        self.cell_size = cell_size
        self.max_cached = max_cached
        self.zone_ids = self.table["zone_id"].to_pylist()
        self.area_rank = self.table["area_rank"].to_numpy(zero_copy_only=False)
        self.area_deg2 = self.table["area_deg2"].to_numpy(zero_copy_only=False)
        # stored (pre-clip) envelopes: superset of the clipped geometry, so
        # the lookup's envelope pre-check stays correct
        self.envs = np.column_stack([
            self.table[c].to_numpy(zero_copy_only=False)
            for c in ("min_lng", "min_lat", "max_lng", "max_lat")])
        self.cover = self._build_cover()
        self.map_version = None
        self._cache: OrderedDict[int, dict] = OrderedDict()
        self.decode_count = 0  # total decodes (cache misses), for tests
        self.xs = _LazyField(self, "xs")
        self.ys = _LazyField(self, "ys")
        self.ring_starts = _LazyField(self, "ring_start")
        self.edges = _LazyField(self, "edges")
        self.is_rect = _LazyField(self, "is_rect")

    def __len__(self):
        return len(self.zone_ids)

    def contains_region(self, lat, lng) -> np.ndarray:
        min_lat, min_lng, max_lat, max_lng = self.region
        lat = np.asarray(lat, dtype=np.float64)
        lng = np.asarray(lng, dtype=np.float64)
        return ((lat >= min_lat) & (lat <= max_lat) &
                (lng >= min_lng) & (lng <= max_lng))

    def _build_cover(self) -> dict:
        """Envelope-only cover — computed WITHOUT decoding any geometry
        (the reference's envelope-in-filename trick). Envelopes widened by
        BOUNDARY_EPS so the PIP's boundary-inclusive shell never reaches a
        cell the cover missed (same as the eager index)."""
        eps = geom.BOUNDARY_EPS
        cover: dict[int, list] = {}
        for i in range(len(self)):
            min_x, min_y, max_x, max_y = self.envs[i]
            for cid in cells.cells_overlapping_envelope(
                    min_y - eps, min_x - eps, max_y + eps, max_x + eps,
                    self.cell_size):
                cover.setdefault(int(cid), []).append(i)
        return {k: np.asarray(v, dtype=np.int64) for k, v in cover.items()}

    def _decoded(self, i: int) -> dict:
        rec = self._cache.get(i)
        if rec is not None:
            self._cache.move_to_end(i)
            return rec
        self.decode_count += 1
        rings = self.table["rings"][i].as_py()
        xs_parts, ys_parts, starts = [], [], [0]
        for ring in rings:
            xs_parts.append(np.array([p["lng"] for p in ring], dtype=np.float64))
            ys_parts.append(np.array([p["lat"] for p in ring], dtype=np.float64))
            starts.append(starts[-1] + len(ring))
        xs = np.concatenate(xs_parts) if xs_parts else np.empty(0)
        ys = np.concatenate(ys_parts) if ys_parts else np.empty(0)
        rs = np.array(starts, dtype=np.int64)
        min_lat, min_lng, max_lat, max_lng = self.region
        if self.region != WORLD:
            e = self.envs[i]
            inside = (e[1] >= min_lat and e[3] <= max_lat and
                      e[0] >= min_lng and e[2] <= max_lng)
            if not inside:  # M13, applied lazily at first touch
                xs, ys, rs = geom.clip_polygon_to_rect(
                    xs, ys, rs, min_lng, min_lat, max_lng, max_lat)
        env = (geom.polygon_envelope(xs, ys) if xs.size
               else (0.0, 0.0, 0.0, 0.0))
        # `lookup_batch`'s rect fast path treats the envelope pre-check
        # (against self.envs[i], the PRE-clip envelope) as the full PIP test.
        # That is only sound when the decoded (post-clip) geometry IS that
        # stored envelope — so require exact envelope equality too, else a
        # zone whose clip degenerates to a small rectangle would falsely
        # claim every point in the larger pre-clip envelope.
        rec = {"xs": xs, "ys": ys, "ring_start": rs,
               "edges": geom.all_edges(xs, ys, rs),
               "is_rect": (bool(xs.size)
                           and _is_axis_rect(xs, ys, rs, np.asarray(env))
                           and tuple(np.asarray(env, dtype=np.float64))
                           == tuple(self.envs[i]))}
        self._cache[i] = rec
        if len(self._cache) > self.max_cached:
            self._cache.popitem(last=False)  # evict LRU
        return rec
