"""Zone index build + vectorized lookup kernels.

Reimplements ``TimeZoneMap.forRegion`` / ``forEverywhere``
(`/root/reference/timezonemap/src/main/java/us/dustinj/timezonemap/TimeZoneMap.kt:97-243`)
as a build-once, broadcast-many index:

1. envelope predicate pushdown on the parquet zone table (reference M7,
   the envelope-in-filename prefilter, `TimeZoneMap.kt:184-196`);
2. exact-extents recompute + filter (M11/M12, `TimeZoneMap.kt:209-215`);
3. rectangle clip to the init region (M13, `TimeZoneMap.kt:218-235`);
4. records kept area-ascending (A1 global sort, `TimeZoneMap.kt:216-217` —
   pre-computed in the zone table as ``area_rank``; clip preserves order);
5. NEW vs reference: a cell → candidate-zone cover (SURVEY.md §3.2) so the
   per-point query tests only a handful of candidate polygons instead of the
   reference's full linear scan (`TimeZoneMap.kt:84`) — output must equal
   linear-scan semantics exactly (tested against the brute-force oracle).

The built index is a plain picklable object, `ray.put` once and shared by
every `ZoneJoiner` actor — the broadcast side of the join.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import cells, geom
from .zonetable import check_map_version, table_to_records

WORLD = (-90.0, -180.0, 90.0, 180.0)  # (min_lat, min_lng, max_lat, max_lng)


@dataclass
class ZoneIndex:
    """Compact, broadcastable polygon index (area-ascending records)."""
    zone_ids: list
    xs: list                      # per-record float64 lng arrays
    ys: list                      # per-record float64 lat arrays
    ring_starts: list
    envs: np.ndarray              # (n, 4): min_lng, min_lat, max_lng, max_lat
    area_rank: np.ndarray         # original table rank (pre-clip area order)
    area_deg2: np.ndarray
    region: tuple                 # (min_lat, min_lng, max_lat, max_lng)
    cell_size: float
    cover: dict = field(default_factory=dict)  # cell_id -> np.ndarray[rec idx]
    map_version: Optional[str] = None
    edges: list = field(default_factory=list)  # per-record (x1,y1,x2,y2)
    is_rect: np.ndarray = field(default_factory=lambda: np.zeros(0, dtype=bool))
    # second cover level: dense cells split 4x4; cell_id -> {sub_idx: recs}
    subcover: dict = field(default_factory=dict)
    # padded edge tensors for the gathered-PIP path (many-record indexes)
    edge_groups: list = field(default_factory=list)

    def __len__(self):
        return len(self.zone_ids)

    def contains_region(self, lat, lng) -> np.ndarray:
        """Init-region bounds check (reference Q1 guard, `TimeZoneMap.kt:80-82`)."""
        min_lat, min_lng, max_lat, max_lng = self.region
        lat = np.asarray(lat, dtype=np.float64)
        lng = np.asarray(lng, dtype=np.float64)
        return (lat >= min_lat) & (lat <= max_lat) & (lng >= min_lng) & (lng <= max_lng)


def _region_filter_expr(region):
    min_lat, min_lng, max_lat, max_lng = region
    f = pq.filters_to_expression  # build an envelope-overlap expression
    return f([("max_lat", ">=", min_lat), ("min_lat", "<=", max_lat),
              ("max_lng", ">=", min_lng), ("min_lng", "<=", max_lng)])


def build_index(zone_table, region: tuple = WORLD,
                cell_size: float = cells.DEFAULT_CELL_SIZE_DEG,
                refine_cover: bool = True,
                check_version: bool = True) -> ZoneIndex:
    """Build the queryable index for an init region.

    ``zone_table``: parquet path or in-memory ``pa.Table``. Region is
    (min_lat, min_lng, max_lat, max_lng); must satisfy min<max
    (`TimeZoneMap.kt:160-161`).
    """
    min_lat, min_lng, max_lat, max_lng = region
    if not (min_lat < max_lat and min_lng < max_lng):
        raise ValueError("Invalid region: min must be < max in both dimensions")

    map_version = None
    if isinstance(zone_table, str):
        if check_version:
            map_version = check_map_version(zone_table)  # M5 gate
        # M7: envelope predicate pushdown — non-overlapping zones never leave
        # the parquet row groups, mirroring the skip-deserialization win
        table = pq.read_table(zone_table, filters=_region_filter_expr(region))
    else:
        table = zone_table

    recs = table_to_records(table)

    zone_ids, xs_l, ys_l, rs_l, envs, ranks, areas = [], [], [], [], [], [], []
    whole_world = region == WORLD
    for rec in recs:
        xs, ys, rs = rec["xs"], rec["ys"], rec["ring_start"]
        if xs.size == 0:
            continue
        # M11/M12: recompute exact extents and filter again
        e_min_x, e_min_y, e_max_x, e_max_y = geom.polygon_envelope(xs, ys)
        if (e_min_x > max_lng or e_max_x < min_lng or
                e_min_y > max_lat or e_max_y < min_lat):
            continue
        # M13: clip unless extents fully inside the region
        fully_inside = (whole_world or
                        (e_min_y >= min_lat and e_max_y <= max_lat and
                         e_min_x >= min_lng and e_max_x <= max_lng))
        if not fully_inside:
            xs, ys, rs = geom.clip_polygon_to_rect(
                xs, ys, rs, min_lng, min_lat, max_lng, max_lat)
            if xs.size == 0:
                continue
            e_min_x, e_min_y, e_max_x, e_max_y = geom.polygon_envelope(xs, ys)
        zone_ids.append(rec["zone_id"])
        xs_l.append(xs)
        ys_l.append(ys)
        rs_l.append(rs)
        envs.append((e_min_x, e_min_y, e_max_x, e_max_y))
        ranks.append(rec["area_rank"])
        areas.append(rec["area_deg2"])

    order = np.argsort(np.asarray(ranks, dtype=np.int64), kind="stable")
    idx = ZoneIndex(
        zone_ids=[zone_ids[i] for i in order],
        xs=[xs_l[i] for i in order],
        ys=[ys_l[i] for i in order],
        ring_starts=[rs_l[i] for i in order],
        envs=np.asarray(envs, dtype=np.float64)[order] if envs else np.zeros((0, 4)),
        area_rank=np.asarray(ranks, dtype=np.int64)[order] if ranks else np.zeros(0, np.int64),
        area_deg2=np.asarray(areas, dtype=np.float64)[order] if areas else np.zeros(0),
        region=region,
        cell_size=cell_size,
        map_version=map_version,
    )
    idx.cover = _build_cover(idx, refine=refine_cover)
    # precompute per-record edge arrays once: the PIP hot path never
    # re-rolls ring vertices per batch
    idx.edges = [geom.all_edges(idx.xs[i], idx.ys[i], idx.ring_starts[i])
                 for i in range(len(idx))]
    # rectangle fast path: a single-ring polygon that IS its envelope needs
    # only the (already applied) envelope test — boundary-inclusive PIP on
    # an axis-aligned rect == inclusive envelope compare. Real timezone data
    # has such records too (clipped ocean pieces, builder rectangles).
    idx.is_rect = np.array([_is_axis_rect(idx.xs[i], idx.ys[i],
                                          idx.ring_starts[i], idx.envs[i])
                            for i in range(len(idx))], dtype=bool)
    if refine_cover:
        idx.subcover = _build_subcover(idx)
    if len(idx) >= HYBRID_MIN_RECS:
        idx.edge_groups = _build_edge_groups(idx)
        n_edges = sum(e[0].size for e in idx.edges)
        avg = max(1, n_edges // max(1, len(idx)))
        # dense geometry (≥ DENSE_EDGES edges/rec): small_sel=0 sends EVERY
        # candidate set down the per-record broadcast path (sel.size ≥ 0) —
        # the round-3 big-world sweep (10⁴ recs × 200 edges, PERF.md)
        # measured it 1.2× over any positive threshold (heavy edge arrays
        # amortize the per-record dispatch; the gathered kernel's padded
        # edge tensors pay 2× memory traffic at this density), and the
        # medium world (1625 recs × 40 edges) is flat within ±4%
        idx.small_sel = 0 if avg >= DENSE_EDGES else int(
            np.clip(SMALL_SEL_EDGE_BUDGET // avg, 64, SMALL_SEL))
    return idx


# Hybrid gathered-PIP path (many-record indexes): below this record count the
# per-record broadcast loop has little dispatch overhead and the gather
# kernel's extra memory traffic makes it a net loss (measured ~0.9× on the
# 41/169-record worlds, 1.5-1.6× on the 1625-record world — PERF.md round 2).
HYBRID_MIN_RECS = 512
GROUP_RECS = 32        # rank-contiguous records per group
SMALL_SEL = 256        # fallback per-record point count threshold
# The gather/per-record knee scales INVERSELY with edges-per-record: the
# gathered kernel's cost per point ∝ the group's (padded) edge rows, the
# per-record path's fixed dispatch amortizes over more points as records
# get heavier. Measured optima (round-2 continuation sweep, PERF.md):
# ~40 edges/rec → knee ≥ 384 single-thread; ~230 edges/rec → knee ≈ 64;
# both fit knee ≈ 15000 / avg_edges. Computed per index at build time,
# CLAMPED to ≤ SMALL_SEL: under 32-way parallelism the gathered kernel's
# extra memory traffic hits DRAM contention sooner than single-thread, so
# the rule only LOWERS the threshold for dense geometry (1.35-1.8×
# measured) and never raises it past the parallel-tested default.
SMALL_SEL_EDGE_BUDGET = 15_000
# Round-3 big-world re-sweep (10⁴ records × ~200 edges/rec — realistic
# 2020d density): the knee formula's dense end was wrong — small_sel=0
# (all candidate sets down the per-record broadcast path) measured
# 196-204k pts/s vs 162-170k for ANY positive threshold (interleaved A/B,
# min-of-4); at ~40 edges/rec all settings are flat within ±4%. Above
# this density the gathered kernel's padded edge tensors dominate memory
# traffic and never win.
DENSE_EDGES = 128


def _build_edge_groups(idx: ZoneIndex) -> list:
    """Pack rank-contiguous runs of ``GROUP_RECS`` records into padded edge
    tensors for ``geom.pip_edges_gathered``. Within a run, records are
    sub-bucketed by ceil(log2(edge_count)) so padding waste is bounded ≤ 2×
    (one giant polygon never inflates 31 tiny neighbors' rows).

    Returns a list of group dicts: ``members`` (global rec indices, rank
    ascending), ``packed`` (gather tensors), ``rec_to_local`` (global rec →
    row). Records with zero edges are excluded (they can never match)."""
    groups = []
    n = len(idx)
    for g0 in range(0, n, GROUP_RECS):
        members = [i for i in range(g0, min(g0 + GROUP_RECS, n))
                   if idx.edges[i][0].size > 0]
        if not members:
            continue
        buckets: dict[int, list] = {}
        for i in members:
            buckets.setdefault(int(idx.edges[i][0].size - 1).bit_length(),
                               []).append(i)
        for _, bucket in sorted(buckets.items()):
            arr = np.asarray(bucket, dtype=np.int64)
            packed = geom.pack_edge_rows([idx.edges[i] for i in bucket])
            groups.append({"members": arr, "packed": packed,
                           "rec_to_local": {int(r): li
                                            for li, r in enumerate(bucket)}})
    return groups


SPLIT_THRESHOLD = 16   # candidates per cell before a 4x4 split
SUBGRID = 4


def _build_subcover(idx: ZoneIndex) -> dict:
    """Split dense cells 4×4 and refine each subcell's candidate list with
    the exact rect∩polygon test — caps per-point candidate counts in dense
    corners of big worlds (quadtree-lite, SURVEY §7.3)."""
    sub: dict = {}
    s = idx.cell_size / SUBGRID
    eps = geom.BOUNDARY_EPS
    for cid, cand in idx.cover.items():
        if cand.size <= SPLIT_THRESHOLD:
            continue
        c_min_lat, c_min_lng, _, _ = cells.cell_bounds(cid, idx.cell_size)
        table = {}
        for qy in range(SUBGRID):
            for qx in range(SUBGRID):
                lo_lat = c_min_lat + qy * s
                lo_lng = c_min_lng + qx * s
                # eps-widened subcell: keep zones whose eps-inclusive
                # boundary shell reaches into this subcell
                keep = [int(i) for i in cand if geom.rect_intersects_polygon(
                    lo_lng - eps, lo_lat - eps, lo_lng + s + eps,
                    lo_lat + s + eps,
                    idx.xs[i], idx.ys[i], idx.ring_starts[i])]
                table[qy * SUBGRID + qx] = np.asarray(keep, dtype=np.int64)
        sub[cid] = table
    return sub


def _is_axis_rect(xs, ys, ring_start, env) -> bool:
    if len(ring_start) != 2 or xs.size != 4:
        return False
    min_x, min_y, max_x, max_y = env
    corners = {(min_x, min_y), (min_x, max_y), (max_x, min_y), (max_x, max_y)}
    return set(zip(xs.tolist(), ys.tolist())) == corners


def _build_cover(idx: ZoneIndex, refine: bool) -> dict:
    """cell_id → record indices (area-ascending) whose geometry may touch the
    cell. Envelope-based, optionally refined by an exact rect∩polygon test for
    records covering many cells (cheap at build time, shrinks per-cell
    candidate lists at query time)."""
    cover: dict[int, list] = {}
    eps = geom.BOUNDARY_EPS
    for i in range(len(idx)):
        min_x, min_y, max_x, max_y = idx.envs[i]
        # eps-widened: a zone's boundary-inclusive shell (PIP accepts points
        # within BOUNDARY_EPS of an edge) may reach into a neighboring cell
        # when the envelope sits exactly on a cell boundary
        cids = cells.cells_overlapping_envelope(
            min_y - eps, min_x - eps, max_y + eps, max_x + eps,
            idx.cell_size)
        do_refine = refine and cids.size > 4
        for cid in cids:
            if do_refine:
                c_min_lat, c_min_lng, c_max_lat, c_max_lng = cells.cell_bounds(
                    int(cid), idx.cell_size)
                if not geom.rect_intersects_polygon(
                        c_min_lng - eps, c_min_lat - eps,
                        c_max_lng + eps, c_max_lat + eps,
                        idx.xs[i], idx.ys[i], idx.ring_starts[i]):
                    continue
            cover.setdefault(int(cid), []).append(i)
    return {k: np.asarray(v, dtype=np.int64) for k, v in cover.items()}


# ---------------------------------------------------------------------------
# Vectorized lookup kernels (used by the ZoneJoiner actor and the driver API)
# ---------------------------------------------------------------------------

def lookup_batch(idx: ZoneIndex, lats, lngs, want_all: bool = False,
                 fallback: bool = False, hybrid: bool | None = None,
                 fallback_metric: str = "geodesic_m"):
    """Batched point → zone join.

    Returns dict of numpy/object arrays:
      ``zone_id`` (object, None where unmatched) — smallest-area containing
      zone, reference Q4 `first()` semantics (`TimeZoneMap.kt:56-57`);
      ``all_zones`` (list of lists, only if ``want_all``) — Q5 order
      (`TimeZoneMap.kt:77-78`);
      ``matched`` (bool), ``fallback`` (bool), ``error`` (object|None).
    Out-of-region points get error="outside_initialized_region" instead of
    the reference's IllegalArgumentException (Q1) — never throw mid-pipeline.

    ``hybrid``: None = auto (gathered-PIP path when the index carries
    ``edge_groups``, i.e. ≥ ``HYBRID_MIN_RECS`` records, and top-1 only);
    True/False force it for tests. Both paths are exactly equivalent
    (tested record-for-record against the linear-scan oracle).
    """
    lats = np.asarray(lats, dtype=np.float64)
    lngs = np.asarray(lngs, dtype=np.float64)
    m = lats.size
    zone_idx = np.full(m, -1, dtype=np.int32)  # index into idx.zone_ids
    matched = np.zeros(m, dtype=bool)
    used_fb = np.zeros(m, dtype=bool)
    hit_rows: list = []  # (rows, rec_i) pair arrays, rank-ascending
    hit_recs: list = []

    in_region = idx.contains_region(lats, lngs)

    cell = cells.cell_ids(lats, lngs, idx.cell_size)
    cell = np.where(in_region, cell, np.int64(-1))

    # group point indices by cell via one counting sort (cell key space is
    # tiny: (180/s)*(360/s) ids), then invert: gather each candidate ZONE's
    # points and run one vectorized PIP per zone — the heavy work is
    # per-zone numpy, never per-cell python
    n_lat, n_lng = cells.grid_dims(idx.cell_size)
    key_space = n_lat * n_lng + 1
    keys = np.where(cell >= 0, cell, key_space - 1)
    counts = np.bincount(keys, minlength=key_space)
    starts_all = np.concatenate([[0], np.cumsum(counts)])
    order = np.argsort(keys, kind="stable")
    present = np.nonzero(counts[:-1])[0]  # cell ids with points, sorted
    zone_points: dict[int, list] = {}
    subcover = getattr(idx, "subcover", {})
    for cid in present:
        cand = idx.cover.get(int(cid))
        if cand is None:
            continue
        sel = order[starts_all[cid]:starts_all[cid + 1]]
        sub = subcover.get(int(cid))
        if sub is not None:
            # dense cell: route points through the 4x4 refined sub-lists
            c_min_lat, c_min_lng, _, _ = cells.cell_bounds(
                int(cid), idx.cell_size)
            s = idx.cell_size / SUBGRID
            qy = np.clip(((lats[sel] - c_min_lat) // s).astype(np.int64),
                         0, SUBGRID - 1)
            qx = np.clip(((lngs[sel] - c_min_lng) // s).astype(np.int64),
                         0, SUBGRID - 1)
            q = qy * SUBGRID + qx
            for qi in np.unique(q):
                ssel = sel[q == qi]
                for rec_i in sub[int(qi)]:
                    zone_points.setdefault(int(rec_i), []).append(ssel)
            continue
        for rec_i in cand:
            zone_points.setdefault(int(rec_i), []).append(sel)

    use_hybrid = (hybrid if hybrid is not None
                  else bool(getattr(idx, "edge_groups", None)))
    if use_hybrid and not want_all:
        # forced-on small/lazy indexes: build groups LOCALLY — caching them
        # on the index would flip all later auto lookups onto the hybrid
        # path (slower below HYBRID_MIN_RECS, and eagerly decodes a lazy
        # index's whole geometry table)
        groups = getattr(idx, "edge_groups", None) or _build_edge_groups(idx)
        _lookup_hybrid(idx, groups, lats, lngs, zone_points, zone_idx,
                       matched)
        zone_points = {}  # consumed

    for rec_i in sorted(zone_points):  # area-ascending record order
        sel = np.concatenate(zone_points[rec_i])
        if not want_all:
            sel = sel[~matched[sel]]  # top-1: earlier (smaller) zones won
            if sel.size == 0:
                continue
        sel = _env_prefilter(idx, rec_i, sel, lats, lngs)
        if sel.size == 0:
            continue
        rows = _pip_record(idx, rec_i, sel, lats, lngs)
        if rows.size == 0:
            continue
        newly = rows[~matched[rows]]
        zone_idx[newly] = rec_i
        matched[rows] = True
        if want_all:
            hit_rows.append(rows)
            hit_recs.append(np.full(rows.size, rec_i, dtype=np.int32))

    if fallback:
        miss = np.nonzero(in_region & ~matched)[0]
        if miss.size:
            fz = _nearest_zone_fallback(idx, lats[miss], lngs[miss],
                                        cell[miss], metric=fallback_metric)
            name_to_i = {z: i for i, z in enumerate(idx.zone_ids)}
            for k, r in enumerate(miss):
                if fz[k] is not None:
                    zone_idx[r] = name_to_i[fz[k]]
                    matched[r] = True
                    used_fb[r] = True
                    if want_all:
                        hit_rows.append(np.array([r]))
                        hit_recs.append(np.array([name_to_i[fz[k]]],
                                                 dtype=np.int32))

    zone = np.full(m, None, dtype=object)
    hitrows = zone_idx >= 0
    if hitrows.any():
        names = np.asarray(idx.zone_ids, dtype=object)
        zone[hitrows] = names[zone_idx[hitrows]]
    out = {"zone_id": zone, "zone_idx": zone_idx, "in_region": in_region,
           "matched": matched, "fallback": used_fb,
           "error": np.where(in_region, None, "outside_initialized_region")}
    if want_all:
        out["all_zones"] = _assemble_all_zones(idx, m, hit_rows, hit_recs)
    return out


def _env_prefilter(idx, rec_i, sel, lats, lngs):
    """Envelope pre-check (M12 analogue), widened by 2×BOUNDARY_EPS: the
    PIP is boundary-inclusive within eps, so a point eps OUTSIDE the
    envelope can still be on-edge inside (hypothesis-found). The 2×
    slack makes the prefilter a strict SUPERSET of pip acceptance even
    under float rounding of (edge − eps) — pip remains the single
    decision procedure, so cell path ≡ linear scan exactly."""
    e = idx.envs[rec_i]
    eps = geom.BOUNDARY_EPS
    plats, plngs = lats[sel], lngs[sel]
    env_ok = ((plngs >= e[0] - 2 * eps) & (plngs <= e[2] + 2 * eps) &
              (plats >= e[1] - 2 * eps) & (plats <= e[3] + 2 * eps))
    return sel[env_ok]


def _pip_record(idx, rec_i, sel, lats, lngs):
    """Exact containment rows for ONE record over a candidate selection —
    the single decision procedure shared by the per-record loop and the
    hybrid path's big-member branch (divergence between copies of this
    block was a review-flagged hazard).

    Rect fast path: strictly-inside-the-envelope points need no PIP
    (boundary-inclusive PIP on an axis rect accepts them all); the eps
    SHELL around the rect must run the real on-edge test — env arithmetic
    and pip's d² ≤ eps² disagree at knife-edge distances ≈ eps (different
    float roundings)."""
    if idx.is_rect[rec_i]:
        e = idx.envs[rec_i]
        plats, plngs = lats[sel], lngs[sel]
        strict = ((plngs >= e[0]) & (plngs <= e[2]) &
                  (plats >= e[1]) & (plats <= e[3]))
        shell = sel[~strict]
        if shell.size:
            hit = geom.pip_edges(lngs[shell], lats[shell], idx.edges[rec_i])
            return np.concatenate([sel[strict], shell[hit]])
        return sel[strict]
    hit = geom.pip_edges(lngs[sel], lats[sel], idx.edges[rec_i])
    return sel[hit]


_NO_WINNER = np.int32(1 << 30)  # rank sentinel: "no zone yet"


def _lookup_hybrid(idx, groups, lats, lngs, zone_points, zone_idx, matched):
    """Top-1 record resolution via the gathered-PIP kernel (many-record
    indexes — the realistic-data regime, where per-record candidate point
    sets are small and ~n_records tiny numpy dispatches dominate the
    per-record broadcast loop; PERF.md round 2: 1.5-1.6× on 1625 records).

    Exact equivalence with the per-record loop:
    - suppression by CURRENT WINNER RANK (``winner[sel] > rec_i``) — in
      rank-ascending processing order this is the same pruning as the
      ``~matched`` early-exit, and it stays correct when a group's small
      members resolve after a higher-ranked big member (min wins);
    - records with ≥ ``idx.small_sel`` (adaptive; ``SMALL_SEL`` fallback)
      candidate points take the identical
      broadcast path (incl. the rect fast path) with immediate updates;
    - the small remainder of each group runs one gathered-PIP call, then
      ``np.minimum.at`` (duplicate rows possible) picks the smallest rank.
    Mutates ``zone_idx`` / ``matched`` in place.
    """
    m = lats.size
    winner = np.full(m, _NO_WINNER, dtype=np.int32)
    small_sel = getattr(idx, "small_sel", SMALL_SEL)
    for grp in groups:
        small_rows: list = []
        small_recs: list = []
        small_rloc: list = []
        for rec_i in grp["members"]:
            sels = zone_points.get(int(rec_i))
            if sels is None:
                continue
            sel = np.concatenate(sels) if len(sels) > 1 else sels[0]
            sel = sel[winner[sel] > rec_i]
            if sel.size == 0:
                continue
            sel = _env_prefilter(idx, rec_i, sel, lats, lngs)
            if sel.size == 0:
                continue
            if sel.size >= small_sel:
                rows = _pip_record(idx, rec_i, sel, lats, lngs)
                if rows.size:  # rows unique ⇒ plain vectorized min
                    winner[rows] = np.minimum(winner[rows], np.int32(rec_i))
            else:
                small_rows.append(sel)
                small_recs.append(np.full(sel.size, rec_i, dtype=np.int32))
                small_rloc.append(np.full(
                    sel.size, grp["rec_to_local"][int(rec_i)], dtype=np.int64))
        if small_rows:
            rows = np.concatenate(small_rows)
            recs = np.concatenate(small_recs)
            rloc = np.concatenate(small_rloc)
            live = winner[rows] > recs  # a big member may have won meanwhile
            rows, recs, rloc = rows[live], recs[live], rloc[live]
            if rows.size:
                hits = geom.pip_edges_gathered(lngs[rows], lats[rows], rloc,
                                               grp["packed"])
                if hits.any():
                    np.minimum.at(winner, rows[hits], recs[hits])
    won = winner < _NO_WINNER
    zone_idx[won] = winner[won]
    matched[won] = True


def _assemble_all_zones(idx, m, hit_rows, hit_recs):
    """Columnar assembly of the per-point zone lists (rank-ascending):
    stable-sort the (row, rec) hit pairs by row — append order was already
    rank-ascending — then split by row counts. No per-row python appends."""
    if not hit_rows:
        return [[] for _ in range(m)]
    rows = np.concatenate(hit_rows)
    recs = np.concatenate(hit_recs)
    order = np.argsort(rows, kind="stable")
    rows_s, recs_s = rows[order], recs[order]
    counts = np.bincount(rows_s, minlength=m)
    names = np.asarray(idx.zone_ids, dtype=object)
    flat = names[recs_s]
    out = []
    pos = 0
    for c in counts:
        out.append(flat[pos:pos + c].tolist())
        pos += c
    return out


def _nearest_zone_fallback(idx: ZoneIndex, lats, lngs, cell,
                           max_radius: int = 8,
                           metric: str = "geodesic_m"):
    """kNN fallback (north_star extension): nearest zone by geodesic
    boundary distance, searching candidates in expanding cell rings.

    Vectorized per CELL: all unmatched points in one cell share the same
    candidate pool (rings up to one past the first non-empty ring), so each
    candidate's nearest-boundary pass runs over the whole point group.

    ``metric="planar_d2"``: squared planar degree distance instead of
    geodesic meters — closed-form, so a DuckDB oracle can reproduce the
    argmin bit-for-bit (the ring-candidate stop rule is a heuristic, so
    the oracle world must keep every zone in one cover cell — complete
    candidate sets ⇒ ring argmin ≡ global argmin; see
    ``worlds.gap_world_table`` / ``oracle.sql_tz_lookup_fallback``).
    Ties break to the smallest record index (= area rank) in both metrics.
    """
    lats = np.asarray(lats, dtype=np.float64)
    lngs = np.asarray(lngs, dtype=np.float64)
    out = np.full(lats.size, None, dtype=object)
    names = np.asarray(idx.zone_ids, dtype=object)
    for cid in np.unique(cell):
        sel = np.nonzero(cell == cid)[0]
        cand: set = set()
        hit_radius = None
        for radius in range(0, max_radius + 1):
            for nc in cells.neighbor_cells(int(cid), radius, idx.cell_size):
                cand.update(int(i) for i in idx.cover.get(int(nc), ()))
            if cand and hit_radius is None:
                hit_radius = radius
            if hit_radius is not None and radius > hit_radius:
                break  # one extra ring past first hit guards edge cases
        if not cand:
            continue
        plats, plngs = lats[sel], lngs[sel]
        best_d = np.full(sel.size, np.inf)
        best_z = np.full(sel.size, -1, dtype=np.int64)
        for rec_i in sorted(cand):
            nx, ny = geom.nearest_on_boundary(
                plngs, plats, idx.xs[rec_i], idx.ys[rec_i],
                idx.ring_starts[rec_i])
            if metric == "planar_d2":
                ex = nx - plngs
                ey = ny - plats
                d = ex * ex + ey * ey
            else:
                d = geom.geodesic_distance_m(plats, plngs, ny, nx)
            better = d < best_d
            best_d = np.where(better, d, best_d)
            best_z = np.where(better, rec_i, best_z)
        ok = best_z >= 0
        out[sel[ok]] = names[best_z[ok]]
    return out


def lookup_linear_scan(idx: ZoneIndex, lats, lngs, want_all: bool = False):
    """Brute-force oracle: the reference's exact Q3 semantics — linear scan of
    the area-sorted zone list, no cell cover (`TimeZoneMap.kt:84`). Used in
    tests to prove cell-indexed output ≡ linear-scan output."""
    lats = np.asarray(lats, dtype=np.float64)
    lngs = np.asarray(lngs, dtype=np.float64)
    m = lats.size
    zone = np.full(m, None, dtype=object)
    matched = np.zeros(m, dtype=bool)
    all_zones = [[] for _ in range(m)]
    in_region = idx.contains_region(lats, lngs)
    for rec_i in range(len(idx)):
        hit = geom.pip_edges(lngs, lats, idx.edges[rec_i])
        hit &= in_region
        newly = hit & ~matched
        zone[newly] = idx.zone_ids[rec_i]
        matched |= hit
        for r in np.nonzero(hit)[0]:
            all_zones[r].append(idx.zone_ids[rec_i])
    out = {"zone_id": zone, "matched": matched}
    if want_all:
        out["all_zones"] = all_zones
    return out


def distance_from_boundary(idx: ZoneIndex, zone_id: str, lats, lngs,
                           metric: str = "geodesic_m") -> np.ndarray:
    """Distance from points to the named zone's boundary.

    Reference ``TimeZone.getDistanceFromBoundary`` (`TimeZone.kt:41-47`):
    requires the point inside the zone (inclusive) — here out-of-zone points
    get NaN instead of an exception (vectorized, never throws per-row).

    ``metric="geodesic_m"`` (default): geodesic meters to the planar-nearest
    boundary coordinate (matching Esri getNearestCoordinate +
    geodesicDistanceOnWGS84). ``metric="planar_d2"``: SQUARED planar degree
    distance to the same nearest coordinate — closed-form (+,*,min only), so
    a DuckDB oracle reproduces the exact float64 bits (the driver-checkable
    twin of the geodesic query; same candidate scan, same nearest-point
    kernel, no transcendental functions).
    """
    lats = np.asarray(lats, dtype=np.float64)
    lngs = np.asarray(lngs, dtype=np.float64)
    out = np.full(lats.size, np.nan)
    # zone_id → record indices, built once per index (repeated calls over a
    # Dataset batch stream would otherwise rescan all zone ids every batch)
    by_zone = getattr(idx, "_zone_rec_map", None)
    if by_zone is None:
        by_zone = {}
        for i, z in enumerate(idx.zone_ids):
            by_zone.setdefault(z, []).append(i)
        idx._zone_rec_map = by_zone
    matches = by_zone.get(zone_id, [])
    for rec_i in matches:
        inside = geom.points_in_polygon(lngs, lats, idx.xs[rec_i], idx.ys[rec_i],
                                        idx.ring_starts[rec_i])
        if not inside.any():
            continue
        sel = np.nonzero(inside & np.isnan(out))[0]
        if sel.size == 0:
            continue
        nx, ny = geom.nearest_on_boundary(lngs[sel], lats[sel], idx.xs[rec_i],
                                          idx.ys[rec_i], idx.ring_starts[rec_i])
        if metric == "planar_d2":
            ex = nx - lngs[sel]
            ey = ny - lats[sel]
            out[sel] = ex * ex + ey * ey
        else:
            out[sel] = geom.geodesic_distance_m(lats[sel], lngs[sel], ny, nx)
    return out
