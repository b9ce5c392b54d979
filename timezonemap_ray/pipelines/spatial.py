"""Geospatial tiling + proximity joins over the interleaved-span points.

The reference's query surface is point-in-polygon over an envelope-pruned
zone table (`TimeZoneMap.kt` getOverlappingTimeZones / the region-scoped
`forRegion` prefilter); a web-scale curation pipeline additionally needs
the TILING and SPATIAL-JOIN operators this module adds on the same point
stream:

- ``quadkey_counts``   — Bing-style quadkey (Morton / z-order) tiling
  rollup: points → level-L quadkeys → per-tile count + coordinate sums.
  The z-order key is the distributed analogue of the reference's flat
  cell grid (`cells.py`): prefix-truncating a quadkey coarsens the tile,
  and sorting by quadkey is a space-filling-curve clustering — the
  standard layout for 100 TB spatial data lakes.
- ``radius_pairs``     — ε-neighbor SELF-join (all point pairs within an
  L2 radius): grid-cell bucketing at cell = ε, forward-neighbor
  replication (5 of 9 cells), within-cell vectorized candidate test.
  Never all-pairs: candidates are bounded by local density.
- ``bbox_overlap_pairs`` — rectangle-intersection self-join (PBSM-style
  partitioned spatial join, Patel & DeWitt SIGMOD'96): boxes replicate to
  the ≤4 grid cells they cover, pairs are tested per cell and emitted
  ONLY in the canonical cell containing the overlap's min corner —
  exactly-once by construction, no global dedup.

All three run on the INTEGER lattice form of the geo points
(``sources/docgen.geo_points_int_for``): the span generator derives
lat/lng from doc_id by pure int64 arithmetic, so ``lat1e4/lng1e4`` are
exact int64 on both the engine and the DuckDB oracle side and every
aggregate below is associative integer math — bit-reproducible under any
partitioning or parallelism.

Scale notes (100 TB): each pipeline is one coarse hash shuffle on the
cell key; replication factors are constants (5× points, ≤4× boxes);
within-partition kernels are O(candidates) numpy with no Python
per-row loops. Quadkey rollup pre-aggregates per block before its
groupby, so the shuffle moves one partial row per (block, tile).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.docgen import geo_points_int_for

# shift to a non-negative grid anchored at the (-90, -180) world corner so
# integer floor-division bucketing needs no negative-floor care (DuckDB's
# ``//`` truncates toward zero; on non-negative ints truncate == floor)
LAT_OFF = 900_000   # 1e-4 deg units
LNG_OFF = 1_800_000
WORLD_X = 3_600_000
WORLD_Y = 1_800_000


def geo_points_int(sf_dir: str):
    """Dataset of (doc_id, span_idx, lat1e4, lng1e4) int64 rows — the
    integer-lattice twin of the flagship's geo-span extraction (one row
    per geo span; span_idx 1..n_geo mirrors ``sources/docgen`` layout)."""
    import ray.data as rd

    def gen(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        reps = 1 + (d % 3)
        doc = np.repeat(d, reps)
        total = int(reps.sum())
        j = (np.arange(total, dtype=np.int64)
             - np.repeat(np.cumsum(reps) - reps, reps))
        lat1e4, lng1e4 = geo_points_int_for(doc, j)
        return pa.table({
            "doc_id": pa.array(doc, type=pa.int64()),
            "span_idx": pa.array(j + 1, type=pa.int64()),
            "lat1e4": pa.array(lat1e4, type=pa.int64()),
            "lng1e4": pa.array(lng1e4, type=pa.int64()),
        })

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return ds.map_batches(gen, batch_format="pyarrow")


def _interleave_bits(ix: np.ndarray, iy: np.ndarray, level: int) -> np.ndarray:
    """Morton / z-order interleave: bit b of ix → bit 2b, of iy → bit 2b+1."""
    z = np.zeros_like(ix)
    for b in range(level):
        z |= ((ix >> b) & 1) << (2 * b)
        z |= ((iy >> b) & 1) << (2 * b + 1)
    return z


def quadkey_counts(sf_dir: str, level: int = 8):
    """Per-quadkey tile rollup at ``level`` (2^level × 2^level world grid):
    (quadkey, n_points, sum_lat1e4, sum_lng1e4), quadkey-ascending — the
    space-filling-curve histogram/centroid layout pass.

    One shuffle total: per-block partials (np.unique + exact int64
    accumulation) shrink each block to ≤ 4^level rows before the global
    groupby sum."""
    from ray.data.aggregate import Sum

    n = 1 << level

    def part(b: pa.Table) -> pa.Table:
        lat = b["lat1e4"].to_numpy(zero_copy_only=False)
        lng = b["lng1e4"].to_numpy(zero_copy_only=False)
        ix = (lng + LNG_OFF) * n // WORLD_X
        iy = (lat + LAT_OFF) * n // WORLD_Y
        z = _interleave_bits(ix, iy, level)
        uz, inv, cnt = np.unique(z, return_inverse=True, return_counts=True)
        slat = np.zeros(len(uz), dtype=np.int64)
        slng = np.zeros(len(uz), dtype=np.int64)
        np.add.at(slat, inv, lat)
        np.add.at(slng, inv, lng)
        return pa.table({
            "quadkey": pa.array(uz, type=pa.int64()),
            "n_points": pa.array(cnt.astype(np.int64)),
            "sum_lat1e4": pa.array(slat),
            "sum_lng1e4": pa.array(slng),
        })

    out = geo_points_int(sf_dir) \
        .map_batches(part, batch_format="pyarrow") \
        .groupby("quadkey").aggregate(
            Sum("n_points", alias_name="n_points"),
            Sum("sum_lat1e4", alias_name="sum_lat1e4"),
            Sum("sum_lng1e4", alias_name="sum_lng1e4"))
    return out.sort("quadkey")


def _part_of(keys: np.ndarray, n_parts: int) -> np.ndarray:
    from ..stages.dedup import _splitmix64
    return (_splitmix64(keys.astype(np.uint64))
            % np.uint64(n_parts)).astype(np.int64)


def _expand_pairs_chunked(starts: np.ndarray, ends: np.ndarray,
                          chunk: int = 4_000_000):
    """Yield (probe_idx, home_idx) int64 index-array chunks of the
    segmented searchsorted join expansion (probe row i pairs with home
    rows ``starts[i]..ends[i]``), slicing the probe range wherever the
    cumulative pair count crosses ``chunk``. Peak memory is
    O(chunk + one probe's run) regardless of cell density — a dense
    cell's expansion is quadratic in its population if materialized at
    once (the route_crossings 10×-scale lesson); every cell-join kernel
    in this module goes through here."""
    cnt = ends - starts
    if len(cnt) == 0:
        return
    cum = np.cumsum(cnt)
    tot = int(cum[-1])
    if tot == 0:
        return
    cuts = np.searchsorted(cum, np.arange(chunk, tot, chunk),
                           side="left") + 1
    bounds = np.unique(np.r_[0, cuts, len(cnt)])
    for s, e in zip(bounds[:-1], bounds[1:]):
        c = cnt[s:e]
        t = int(c.sum())
        if t == 0:
            continue
        ai = np.repeat(np.arange(s, e, dtype=np.int64), c)
        bi = (np.arange(t, dtype=np.int64)
              - np.repeat(np.cumsum(c) - c, c)
              + np.repeat(starts[s:e], c))
        yield ai, bi


# forward-neighbor offsets: (0,0) plus the 4 cells lexicographically after
# it — every unordered cross-cell pair is probed from exactly one side
_FWD = ((0, 0), (1, 0), (-1, 1), (0, 1), (1, 1))


def radius_pairs(sf_dir: str, eps1e4: int = 30000, n_parts: int = 64):
    """All unordered point pairs within L2 distance ``eps1e4`` (1e-4 deg
    units) of each other: (doc_a, span_a, doc_b, span_b, d2),
    d2 = exact int64 squared planar distance ≤ eps².

    Shape: grid cells of side ε ⇒ any qualifying pair is ≤ 1 cell apart
    per axis. PROBE side replicates to the 5 forward-neighbor cells,
    HOME side stays put; one hash shuffle on the cell key co-locates
    candidates; the within-partition test is a segmented searchsorted
    expansion (no Python loop over cells). Exactly-once: a cross-cell
    pair exists in exactly one probe direction; same-cell pairs are
    deduped by the key order test."""
    eps = np.int64(eps1e4)
    eps2 = eps * eps
    ncy = np.int64(WORLD_Y // eps1e4 + 4)

    def prep(b: pa.Table):
        lat = b["lat1e4"].to_numpy(zero_copy_only=False)
        lng = b["lng1e4"].to_numpy(zero_copy_only=False)
        key = (b["doc_id"].to_numpy(zero_copy_only=False) * 4
               + b["span_idx"].to_numpy(zero_copy_only=False))
        cx = (lng + LNG_OFF) // eps
        cy = (lat + LAT_OFF) // eps
        return key, lat, lng, cx, cy

    def probe(b: pa.Table) -> pa.Table:
        key, lat, lng, cx, cy = prep(b)
        ks, lats, lngs, cks = [], [], [], []
        for dx, dy in _FWD:
            ks.append(key)
            lats.append(lat)
            lngs.append(lng)
            cks.append((cx + dx) * ncy + (cy + dy))
        return pa.table({
            "ckey": pa.array(np.concatenate(cks), type=pa.int64()),
            "key": pa.array(np.concatenate(ks), type=pa.int64()),
            "lat": pa.array(np.concatenate(lats), type=pa.int64()),
            "lng": pa.array(np.concatenate(lngs), type=pa.int64()),
            "side": pa.array(
                np.zeros(len(key) * len(_FWD), dtype=np.int8)),
        })

    def home(b: pa.Table) -> pa.Table:
        key, lat, lng, cx, cy = prep(b)
        return pa.table({
            "ckey": pa.array(cx * ncy + cy, type=pa.int64()),
            "key": pa.array(key, type=pa.int64()),
            "lat": pa.array(lat, type=pa.int64()),
            "lng": pa.array(lng, type=pa.int64()),
            "side": pa.array(np.ones(len(key), dtype=np.int8)),
        })

    pts = geo_points_int(sf_dir)
    both = pts.map_batches(probe, batch_format="pyarrow") \
        .union(pts.map_batches(home, batch_format="pyarrow"))

    empty = pa.table({c: pa.array([], type=pa.int64())
                      for c in ("doc_a", "span_a", "doc_b", "span_b", "d2")})

    def add_part(b: pa.Table) -> pa.Table:
        part = _part_of(b["ckey"].to_numpy(zero_copy_only=False), n_parts)
        return b.append_column("_part", pa.array(part))

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        g = g.drop_columns(["_part"])
        side = g["side"].to_numpy(zero_copy_only=False)
        a = g.filter(pa.array(side == 0))
        h = g.filter(pa.array(side == 1))
        if a.num_rows == 0 or h.num_rows == 0:
            return empty
        hc = h["ckey"].to_numpy(zero_copy_only=False)
        order = np.argsort(hc, kind="stable")
        hc = hc[order]
        hk = h["key"].to_numpy(zero_copy_only=False)[order]
        hlat = h["lat"].to_numpy(zero_copy_only=False)[order]
        hlng = h["lng"].to_numpy(zero_copy_only=False)[order]
        ac = a["ckey"].to_numpy(zero_copy_only=False)
        a_key = a["key"].to_numpy(zero_copy_only=False)
        a_lat = a["lat"].to_numpy(zero_copy_only=False)
        a_lng = a["lng"].to_numpy(zero_copy_only=False)
        starts = np.searchsorted(hc, ac, side="left")
        ends = np.searchsorted(hc, ac, side="right")
        outs = []
        for ai, bi in _expand_pairs_chunked(starts, ends):
            ak, alat, alng = a_key[ai], a_lat[ai], a_lng[ai]
            bk, blat, blng = hk[bi], hlat[bi], hlng[bi]
            d2 = (alat - blat) ** 2 + (alng - blng) ** 2
            # same home cell ⇒ both probe directions exist: keep ak < bk;
            # cross-cell ⇒ single direction: keep ak != bk and normalize
            same = ((alng + LNG_OFF) // eps == (blng + LNG_OFF) // eps) \
                & ((alat + LAT_OFF) // eps == (blat + LAT_OFF) // eps)
            keep = (d2 <= eps2) & np.where(same, ak < bk, ak != bk)
            outs.append((ak[keep], bk[keep], d2[keep]))
        if not outs:
            return empty
        ak = np.concatenate([o[0] for o in outs])
        bk = np.concatenate([o[1] for o in outs])
        d2 = np.concatenate([o[2] for o in outs])
        lo = np.minimum(ak, bk)
        hi = np.maximum(ak, bk)
        return pa.table({
            "doc_a": pa.array(lo // 4, type=pa.int64()),
            "span_a": pa.array(lo % 4, type=pa.int64()),
            "doc_b": pa.array(hi // 4, type=pa.int64()),
            "span_b": pa.array(hi % 4, type=pa.int64()),
            "d2": pa.array(d2, type=pa.int64()),
        })

    return both.map_batches(add_part, batch_format="pyarrow") \
        .groupby("_part").map_groups(per_part, batch_format="pyarrow")


def doc_boxes(sf_dir: str):
    """One axis-aligned box per document: centered on the doc's FIRST geo
    point, half-size h = 1000 + (doc_id * 48271 % 2147483647) % 30001
    (0.1°–3.1001° in 1e-4 units) — a deterministic per-doc footprint in
    the shifted non-negative grid. Columns xlo/xhi/ylo/yhi int64."""
    import ray.data as rd

    def gen(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lat1e4, lng1e4 = geo_points_int_for(d, np.zeros(len(d), np.int64))
        x0 = lng1e4 + LNG_OFF
        y0 = lat1e4 + LAT_OFF
        h = 1000 + (d * np.int64(48271) % np.int64(2147483647)) % np.int64(30001)
        return pa.table({
            "doc_id": pa.array(d, type=pa.int64()),
            "xlo": pa.array(x0 - h, type=pa.int64()),
            "xhi": pa.array(x0 + h, type=pa.int64()),
            "ylo": pa.array(y0 - h, type=pa.int64()),
            "yhi": pa.array(y0 + h, type=pa.int64()),
        })

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return ds.map_batches(gen, batch_format="pyarrow")


def bbox_overlap_pairs(sf_dir: str, cell: int = 65536, n_parts: int = 64):
    """Rectangle-intersection SELF-join over the per-doc boxes
    (``doc_boxes``): (doc_a, doc_b, ox, oy) for every unordered pair of
    docs whose boxes intersect (closed intervals, both axes); ox/oy are
    the exact int64 overlap extents.

    PBSM shape: every box replicates to the grid cells it covers (cell >
    max box width ⇒ ≤ 2×2 = 4 replicas); one hash shuffle on the cell
    key; within a cell a segmented vectorized self-join tests all local
    pairs; a pair is emitted ONLY in the canonical cell containing
    (max(xlo), max(ylo)) — the overlap's min corner — so cross-cell
    duplicates never exist."""
    assert cell > 2 * 31001, "cell must exceed the max box width"
    ncy = np.int64(WORLD_Y // cell + 4)
    c = np.int64(cell)

    def replicate(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False)
        xlo = b["xlo"].to_numpy(zero_copy_only=False)
        xhi = b["xhi"].to_numpy(zero_copy_only=False)
        ylo = b["ylo"].to_numpy(zero_copy_only=False)
        yhi = b["yhi"].to_numpy(zero_copy_only=False)
        cxlo, cxhi = xlo // c, xhi // c
        cylo, cyhi = ylo // c, yhi // c
        parts = []
        for dx in (0, 1):
            for dy in (0, 1):
                m = (cxlo + dx <= cxhi) & (cylo + dy <= cyhi)
                if not m.any():
                    continue
                parts.append(pa.table({
                    "ckey": pa.array((cxlo[m] + dx) * ncy + (cylo[m] + dy),
                                     type=pa.int64()),
                    "doc_id": pa.array(d[m], type=pa.int64()),
                    "xlo": pa.array(xlo[m], type=pa.int64()),
                    "xhi": pa.array(xhi[m], type=pa.int64()),
                    "ylo": pa.array(ylo[m], type=pa.int64()),
                    "yhi": pa.array(yhi[m], type=pa.int64()),
                }))
        if not parts:
            return pa.table({k: pa.array([], type=pa.int64()) for k in
                             ("ckey", "doc_id", "xlo", "xhi", "ylo", "yhi")})
        return pa.concat_tables(parts)

    empty = pa.table({k: pa.array([], type=pa.int64())
                      for k in ("doc_a", "doc_b", "ox", "oy")})

    def add_part(b: pa.Table) -> pa.Table:
        part = _part_of(b["ckey"].to_numpy(zero_copy_only=False), n_parts)
        return b.append_column("_part", pa.array(part))

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        g = g.drop_columns(["_part"])
        idx = pc.sort_indices(g, sort_keys=[("ckey", "ascending"),
                                            ("doc_id", "ascending")])
        g = g.take(idx)
        ck = g["ckey"].to_numpy(zero_copy_only=False)
        seg_end = np.searchsorted(ck, ck, side="right")
        cnt = seg_end - np.arange(len(ck)) - 1
        tot = int(cnt.sum())
        if tot == 0:
            return empty
        ai = np.repeat(np.arange(len(ck), dtype=np.int64), cnt)
        bi = (ai + 1 + np.arange(tot, dtype=np.int64)
              - np.repeat(np.cumsum(cnt) - cnt, cnt))
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        xlo = g["xlo"].to_numpy(zero_copy_only=False)
        xhi = g["xhi"].to_numpy(zero_copy_only=False)
        ylo = g["ylo"].to_numpy(zero_copy_only=False)
        yhi = g["yhi"].to_numpy(zero_copy_only=False)
        mx = np.maximum(xlo[ai], xlo[bi])
        my = np.maximum(ylo[ai], ylo[bi])
        ox = np.minimum(xhi[ai], xhi[bi]) - mx
        oy = np.minimum(yhi[ai], yhi[bi]) - my
        canon = (mx // c) * ncy + (my // c) == ck[ai]
        keep = (ox >= 0) & (oy >= 0) & canon
        return pa.table({
            "doc_a": pa.array(d[ai][keep], type=pa.int64()),
            "doc_b": pa.array(d[bi][keep], type=pa.int64()),
            "ox": pa.array(ox[keep], type=pa.int64()),
            "oy": pa.array(oy[keep], type=pa.int64()),
        })

    return doc_boxes(sf_dir).map_batches(replicate, batch_format="pyarrow") \
        .map_batches(add_part, batch_format="pyarrow") \
        .groupby("_part").map_groups(per_part, batch_format="pyarrow")


def nearest_neighbor_within(sf_dir: str, eps1e4: int = 80000,
                            n_parts: int = 64):
    """Bounded nearest-neighbor join: for every point, the neighbor
    minimizing (d2, key) within L2 distance ``eps1e4`` — points with no
    neighbor inside the radius are dropped. Output (doc_id, span_idx,
    nn_doc, nn_span, nn_d2), all int64, key-ascending.

    Shape: the radius join's cell bucketing, but DIRECTED — the query
    side replicates to all 9 neighbor cells (a point's argmin needs all
    its candidates, not half of them); the partial argmin per point is
    taken inside each partition (lexsort + first-per-key — ≤ 1 row per
    (partition, point)), and a second coarse shuffle over those partials
    finishes the argmin. Two shuffles total, both over rows bounded by
    the point count; candidates never leave their partition."""
    # k=1 of the generalized kNN pipeline (identical cell bucketing,
    # partial argmins and tie order — `test_knn_within_k1_matches_argmin
    # _join` pins the equivalence), minus the rank column. One
    # implementation to maintain instead of two.
    out = knn_within(sf_dir, eps1e4=eps1e4, k=1, n_parts=n_parts)

    def drop_rank(b: pa.Table) -> pa.Table:
        return b.drop_columns(["rank"])

    return out.map_batches(drop_rank, batch_format="pyarrow")


def tile_counts_xy(sf_dir: str, level: int = 8):
    """Per-tile (ix, iy, n) rollup — the raster form of
    ``quadkey_counts`` (same lattice, axis-aligned keys). One shuffle;
    per-block partials as in ``quadkey_counts``."""
    from ray.data.aggregate import Sum

    n = 1 << level

    def part(b: pa.Table) -> pa.Table:
        lat = b["lat1e4"].to_numpy(zero_copy_only=False)
        lng = b["lng1e4"].to_numpy(zero_copy_only=False)
        ix = (lng + LNG_OFF) * n // WORLD_X
        iy = (lat + LAT_OFF) * n // WORLD_Y
        tk = ix * (2 * n) + iy
        ut, cnt = np.unique(tk, return_counts=True)
        return pa.table({
            "tkey": pa.array(ut, type=pa.int64()),
            "n": pa.array(cnt.astype(np.int64)),
        })

    return geo_points_int(sf_dir) \
        .map_batches(part, batch_format="pyarrow") \
        .groupby("tkey").aggregate(Sum("n", alias_name="n"))


def tile_density_smooth(sf_dir: str, level: int = 8):
    """3×3 box-filter density over the level-``level`` tile raster: for
    every OCCUPIED tile, the total point count in its 3×3 tile
    neighborhood — the raster-convolution smoothing pass of a density /
    heatmap pipeline. Output (quadkey, n_points, smooth_n), int64,
    quadkey-ascending.

    Shape: after the rollup the working set is TILES (≤ 4^level rows —
    bounded by the grid, not the data), so the convolution is a 9-offset
    scatter + one tile-keyed groupby sum, and the occupied-tile filter is
    a broadcast probe of the (bounded) occupied set. Point rows are
    touched exactly once, in the rollup."""
    import ray
    from ray.data.aggregate import Sum

    n = 1 << level
    # materialized: consumed twice (the scatter lineage AND the driver
    # fold below) — without this the point scan + rollup re-execute per
    # consumer. Grid-bounded (≤ 4^level rows), so the blocks are tiny.
    tiles = tile_counts_xy(sf_dir, level).materialize()

    def scatter(b: pa.Table) -> pa.Table:
        tk = b["tkey"].to_numpy(zero_copy_only=False)
        cnt = b["n"].to_numpy(zero_copy_only=False)
        ix = tk // (2 * n)
        iy = tk % (2 * n)
        outs = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                outs.append(pa.table({
                    "tkey": pa.array((ix + dx) * (2 * n) + (iy + dy),
                                     type=pa.int64()),
                    "c": pa.array(cnt, type=pa.int64()),
                }))
        return pa.concat_tables(outs)

    smooth = tiles.map_batches(scatter, batch_format="pyarrow") \
        .groupby("tkey").aggregate(Sum("c", alias_name="smooth_n"))

    # occupied-tile counts, broadcast (≤ 4^level rows by construction)
    occ = {}
    for b in tiles.iter_batches(batch_size=None, batch_format="pyarrow"):
        tk = b["tkey"].to_numpy(zero_copy_only=False)
        cn = b["n"].to_numpy(zero_copy_only=False)
        for t, c in zip(tk.tolist(), cn.tolist()):
            occ[t] = c
    okeys = np.array(sorted(occ), dtype=np.int64)
    ovals = np.array([occ[t] for t in okeys], dtype=np.int64)
    okeys_ref = ray.put(okeys)
    ovals_ref = ray.put(ovals)

    def attach(b: pa.Table) -> pa.Table:
        ks = ray.get(okeys_ref)
        vs = ray.get(ovals_ref)
        if b.num_rows == 0 or len(ks) == 0:
            return pa.table({c: pa.array([], type=pa.int64())
                             for c in ("quadkey", "n_points", "smooth_n")})
        tk = b["tkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ks, tk)
        pos_c = np.minimum(pos, len(ks) - 1)
        hit = ks[pos_c] == tk
        ix = tk[hit] // (2 * n)
        iy = tk[hit] % (2 * n)
        z = _interleave_bits(ix, iy, level)
        return pa.table({
            "quadkey": pa.array(z, type=pa.int64()),
            "n_points": pa.array(vs[pos_c[hit]], type=pa.int64()),
            "smooth_n": b["smooth_n"].filter(pa.array(hit)),
        })

    return smooth.map_batches(attach, batch_format="pyarrow") \
        .sort("quadkey")


def points_in_doc_boxes(sf_dir: str, cell: int = 65536, n_parts: int = 64):
    """BIG-BIG point-in-rectangle join: every (box, point) pair where the
    point lies inside the document's box (closed intervals, ``doc_boxes``)
    — neither side broadcasts. Output (box_doc, pt_doc, pt_span), int64,
    sorted.

    Exactly-once WITHOUT a dedup pass: the point side stays in its home
    cell (unique), the box side replicates to every cell it covers (≤ 4 by
    the cell > max-box-width invariant) — a point inside the box is inside
    a covered cell, so each qualifying pair meets in exactly one cell."""
    assert cell > 2 * 31001, "cell must exceed the max box width"
    ncy = np.int64(WORLD_Y // cell + 4)
    c = np.int64(cell)

    def rep_boxes(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False)
        xlo = b["xlo"].to_numpy(zero_copy_only=False)
        xhi = b["xhi"].to_numpy(zero_copy_only=False)
        ylo = b["ylo"].to_numpy(zero_copy_only=False)
        yhi = b["yhi"].to_numpy(zero_copy_only=False)
        cxlo, cxhi = xlo // c, xhi // c
        cylo, cyhi = ylo // c, yhi // c
        parts = []
        for dx in (0, 1):
            for dy in (0, 1):
                m = (cxlo + dx <= cxhi) & (cylo + dy <= cyhi)
                if not m.any():
                    continue
                parts.append(pa.table({
                    "ckey": pa.array((cxlo[m] + dx) * ncy + (cylo[m] + dy),
                                     type=pa.int64()),
                    "id": pa.array(d[m], type=pa.int64()),
                    "xlo": pa.array(xlo[m], type=pa.int64()),
                    "xhi": pa.array(xhi[m], type=pa.int64()),
                    "ylo": pa.array(ylo[m], type=pa.int64()),
                    "yhi": pa.array(yhi[m], type=pa.int64()),
                    "side": pa.array(np.zeros(int(m.sum()), dtype=np.int8)),
                }))
        schema = {"ckey": pa.int64(), "id": pa.int64(), "xlo": pa.int64(),
                  "xhi": pa.int64(), "ylo": pa.int64(), "yhi": pa.int64()}
        if not parts:
            t = {k: pa.array([], type=v) for k, v in schema.items()}
            t["side"] = pa.array([], type=pa.int8())
            return pa.table(t)
        return pa.concat_tables(parts)

    def points_home(b: pa.Table) -> pa.Table:
        x = b["lng1e4"].to_numpy(zero_copy_only=False) + LNG_OFF
        y = b["lat1e4"].to_numpy(zero_copy_only=False) + LAT_OFF
        key = (b["doc_id"].to_numpy(zero_copy_only=False) * 4
               + b["span_idx"].to_numpy(zero_copy_only=False))
        return pa.table({
            "ckey": pa.array((x // c) * ncy + (y // c), type=pa.int64()),
            "id": pa.array(key, type=pa.int64()),
            "xlo": pa.array(x, type=pa.int64()),
            "xhi": pa.array(x, type=pa.int64()),
            "ylo": pa.array(y, type=pa.int64()),
            "yhi": pa.array(y, type=pa.int64()),
            "side": pa.array(np.ones(len(key), dtype=np.int8)),
        })

    both = doc_boxes(sf_dir).map_batches(rep_boxes, batch_format="pyarrow") \
        .union(geo_points_int(sf_dir).map_batches(points_home,
                                                  batch_format="pyarrow"))

    empty = pa.table({k: pa.array([], type=pa.int64())
                      for k in ("box_doc", "pt_doc", "pt_span")})

    def add_part(b: pa.Table) -> pa.Table:
        part = _part_of(b["ckey"].to_numpy(zero_copy_only=False), n_parts)
        return b.append_column("_part", pa.array(part))

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        g = g.drop_columns(["_part"])
        side = g["side"].to_numpy(zero_copy_only=False)
        bx = g.filter(pa.array(side == 0))
        pt = g.filter(pa.array(side == 1))
        if bx.num_rows == 0 or pt.num_rows == 0:
            return empty
        pc_ = pt["ckey"].to_numpy(zero_copy_only=False)
        order = np.argsort(pc_, kind="stable")
        pc_ = pc_[order]
        pk = pt["id"].to_numpy(zero_copy_only=False)[order]
        px = pt["xlo"].to_numpy(zero_copy_only=False)[order]
        py = pt["ylo"].to_numpy(zero_copy_only=False)[order]
        bc = bx["ckey"].to_numpy(zero_copy_only=False)
        b_id = bx["id"].to_numpy(zero_copy_only=False)
        b_xlo = bx["xlo"].to_numpy(zero_copy_only=False)
        b_xhi = bx["xhi"].to_numpy(zero_copy_only=False)
        b_ylo = bx["ylo"].to_numpy(zero_copy_only=False)
        b_yhi = bx["yhi"].to_numpy(zero_copy_only=False)
        starts = np.searchsorted(pc_, bc, side="left")
        ends = np.searchsorted(pc_, bc, side="right")
        outs = []
        for ai, pi in _expand_pairs_chunked(starts, ends):
            x, y, k = px[pi], py[pi], pk[pi]
            keep = (b_xlo[ai] <= x) & (x <= b_xhi[ai]) \
                & (b_ylo[ai] <= y) & (y <= b_yhi[ai])
            outs.append((b_id[ai][keep], k[keep]))
        if not outs:
            return empty
        bid = np.concatenate([o[0] for o in outs])
        k = np.concatenate([o[1] for o in outs])
        return pa.table({
            "box_doc": pa.array(bid, type=pa.int64()),
            "pt_doc": pa.array(k // 4, type=pa.int64()),
            "pt_span": pa.array(k % 4, type=pa.int64()),
        })

    return both.map_batches(add_part, batch_format="pyarrow") \
        .groupby("_part").map_groups(per_part, batch_format="pyarrow")


def doc_segments(sf_dir: str):
    """Trajectory segments: consecutive geo-span point pairs per doc
    (n_geo − 1 = doc_id % 3 segments), endpoints in the shifted
    non-negative int64 grid, normalized so x1 ≤ x2.  Columns
    (seg_doc, seg_j, x1, y1, x2, y2) — seg_j is the 1-based index of the
    segment's FIRST span."""
    import ray.data as rd

    def gen(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nseg = d % 3
        doc = np.repeat(d, nseg)
        tot = int(nseg.sum())
        j = (np.arange(tot, dtype=np.int64)
             - np.repeat(np.cumsum(nseg) - nseg, nseg))
        lat1, lng1 = geo_points_int_for(doc, j)
        lat2, lng2 = geo_points_int_for(doc, j + 1)
        x1, y1 = lng1 + LNG_OFF, lat1 + LAT_OFF
        x2, y2 = lng2 + LNG_OFF, lat2 + LAT_OFF
        sw = x1 > x2
        x1s = np.where(sw, x2, x1)
        x2s = np.where(sw, x1, x2)
        y1s = np.where(sw, y2, y1)
        y2s = np.where(sw, y1, y2)
        return pa.table({
            "seg_doc": pa.array(doc, type=pa.int64()),
            "seg_j": pa.array(j + 1, type=pa.int64()),
            "x1": pa.array(x1s, type=pa.int64()),
            "y1": pa.array(y1s, type=pa.int64()),
            "x2": pa.array(x2s, type=pa.int64()),
            "y2": pa.array(y2s, type=pa.int64()),
        })

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return ds.map_batches(gen, batch_format="pyarrow")


def _segment_cell_cover(x1, y1, x2, y2, c: np.int64):
    """Vectorized supercover: grid cells (side ``c``) each segment passes
    through, assuming x1 <= x2 (doc_segments' normalization). Per covered
    grid column the segment's y-extent inside that column is computed in
    exact rational arithmetic (y·dx numerators, one floor-div), bounding
    the row range — world-spanning segments cost O(nx + ny) replicas,
    never the O(nx·ny) of their bbox. Returns (row_idx, col, row):
    row_idx indexes the input arrays, (col, row) the covered cell."""
    from .raster import _expand_ranges

    si, col = _expand_ranges(x1 // c, x2 // c)
    dx = x2[si] - x1[si]
    dy = y2[si] - y1[si]
    # y-extent of the segment inside this column (endpoints clamped to
    # the column's x-interval; y is monotone in x, so the two boundary
    # evaluations bound every segment point in the column)
    lox = np.maximum(x1[si], col * c)
    hix = np.minimum(x2[si], (col + 1) * c)
    den = np.maximum(dx, 1) * c  # dx==0 rows are overridden below
    na = y1[si] * np.maximum(dx, 1) + (lox - x1[si]) * dy
    nb = y1[si] * np.maximum(dx, 1) + (hix - x1[si]) * dy
    ia, ib = na // den, nb // den
    vert = dx == 0
    ylo_v = np.minimum(y1[si], y2[si]) // c
    yhi_v = np.maximum(y1[si], y2[si]) // c
    cylo = np.where(vert, ylo_v, np.minimum(ia, ib))
    cyhi = np.where(vert, yhi_v, np.maximum(ia, ib))
    ri, cy = _expand_ranges(cylo, cyhi)
    return si[ri], col[ri], cy


def segment_box_hits(sf_dir: str, cell: int = 225000, n_parts: int = 64):
    """Polyline×rectangle spatial join: every (trajectory segment, doc
    box) pair whose closed shapes intersect — the GIS overlay /
    route-vs-zone-footprint join.  Output (seg_doc, seg_j, box_doc),
    int64, distinct.

    The exact predicate is the separating-axis test for a segment vs an
    axis-aligned box (only three candidate axes exist — x, y, and the
    segment normal): closed bbox overlap AND the box's four corners not
    all strictly on one side of the segment's supporting line, all in
    exact int64 cross products (|coords| ≤ 3.6e6 ⇒ products ≤ 1.3e13).

    Shape: boxes replicate to the ≤ 4 grid cells they cover (cell > max
    box width); segments replicate to exactly the cells they PASS
    THROUGH — a vectorized supercover: per covered grid column, the
    segment's y-extent inside that column is computed in exact rational
    arithmetic (y·dx numerators, one floor-div), bounding the row range
    — world-spanning segments cost O(nx + ny) replicas, never the
    O(nx·ny) of their bbox.  One hash shuffle co-locates; within a cell
    a segmented searchsorted kernel tests candidates.  A pair can meet
    in up to 4 shared cells, so a final distinct-triple groupby dedups —
    it shuffles OUTPUT pairs only (bounded by the result), documented
    as the price of skipping per-pair rational clip canonicalization."""
    assert cell > 2 * 31001, "cell must exceed the max box width"
    c = np.int64(cell)
    ncy = np.int64(WORLD_Y // cell + 4)

    def rep_segments(b: pa.Table) -> pa.Table:
        x1 = b["x1"].to_numpy(zero_copy_only=False)
        y1 = b["y1"].to_numpy(zero_copy_only=False)
        x2 = b["x2"].to_numpy(zero_copy_only=False)
        y2 = b["y2"].to_numpy(zero_copy_only=False)
        key = (b["seg_doc"].to_numpy(zero_copy_only=False) * 4
               + b["seg_j"].to_numpy(zero_copy_only=False))
        ri, col, cy = _segment_cell_cover(x1, y1, x2, y2, c)
        # CAVEAT: the union with rep_boxes forces the shared xlo/../yhi
        # schema, but on the SEGMENT side these are endpoints (x sorted
        # ascending by doc_segments; y1 > y2 is common) — NOT intervals.
        # per_part re-derives min/max where an interval is needed.
        return pa.table({
            "ckey": pa.array(col * ncy + cy, type=pa.int64()),
            "id": pa.array(key[ri], type=pa.int64()),
            "xlo": pa.array(x1[ri], type=pa.int64()),
            "xhi": pa.array(x2[ri], type=pa.int64()),
            "ylo": pa.array(y1[ri], type=pa.int64()),
            "yhi": pa.array(y2[ri], type=pa.int64()),
            "side": pa.array(np.ones(len(ri), dtype=np.int8)),
        })

    def rep_boxes(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False)
        xlo = b["xlo"].to_numpy(zero_copy_only=False)
        xhi = b["xhi"].to_numpy(zero_copy_only=False)
        ylo = b["ylo"].to_numpy(zero_copy_only=False)
        yhi = b["yhi"].to_numpy(zero_copy_only=False)
        cxlo, cxhi = xlo // c, xhi // c
        cylo, cyhi = ylo // c, yhi // c
        parts = []
        for ox in (0, 1):
            for oy in (0, 1):
                m = (cxlo + ox <= cxhi) & (cylo + oy <= cyhi)
                if not m.any():
                    continue
                parts.append(pa.table({
                    "ckey": pa.array((cxlo[m] + ox) * ncy + (cylo[m] + oy),
                                     type=pa.int64()),
                    "id": pa.array(d[m], type=pa.int64()),
                    "xlo": pa.array(xlo[m], type=pa.int64()),
                    "xhi": pa.array(xhi[m], type=pa.int64()),
                    "ylo": pa.array(ylo[m], type=pa.int64()),
                    "yhi": pa.array(yhi[m], type=pa.int64()),
                    "side": pa.array(np.zeros(int(m.sum()), dtype=np.int8)),
                }))
        if not parts:
            t = {k: pa.array([], type=pa.int64()) for k in
                 ("ckey", "id", "xlo", "xhi", "ylo", "yhi")}
            t["side"] = pa.array([], type=pa.int8())
            return pa.table(t)
        return pa.concat_tables(parts)

    both = doc_segments(sf_dir) \
        .map_batches(rep_segments, batch_format="pyarrow") \
        .union(doc_boxes(sf_dir).map_batches(rep_boxes,
                                             batch_format="pyarrow"))

    empty = pa.table({k: pa.array([], type=pa.int64())
                      for k in ("seg_doc", "seg_j", "box_doc")})

    def add_part(b: pa.Table) -> pa.Table:
        part = _part_of(b["ckey"].to_numpy(zero_copy_only=False), n_parts)
        return b.append_column("_part", pa.array(part))

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        g = g.drop_columns(["_part"])
        side = g["side"].to_numpy(zero_copy_only=False)
        sg = g.filter(pa.array(side == 1))
        bx = g.filter(pa.array(side == 0))
        if sg.num_rows == 0 or bx.num_rows == 0:
            return empty
        bc = bx["ckey"].to_numpy(zero_copy_only=False)
        order = np.argsort(bc, kind="stable")
        bc = bc[order]
        bid = bx["id"].to_numpy(zero_copy_only=False)[order]
        bxlo = bx["xlo"].to_numpy(zero_copy_only=False)[order]
        bxhi = bx["xhi"].to_numpy(zero_copy_only=False)[order]
        bylo = bx["ylo"].to_numpy(zero_copy_only=False)[order]
        byhi = bx["yhi"].to_numpy(zero_copy_only=False)[order]
        sc = sg["ckey"].to_numpy(zero_copy_only=False)
        s_id = sg["id"].to_numpy(zero_copy_only=False)
        s_x1 = sg["xlo"].to_numpy(zero_copy_only=False)
        s_x2 = sg["xhi"].to_numpy(zero_copy_only=False)
        s_y1 = sg["ylo"].to_numpy(zero_copy_only=False)
        s_y2 = sg["yhi"].to_numpy(zero_copy_only=False)
        starts = np.searchsorted(bc, sc, side="left")
        ends = np.searchsorted(bc, sc, side="right")
        outs = []
        for ai, bi in _expand_pairs_chunked(starts, ends):
            k = s_id[ai]
            x1, x2 = s_x1[ai], s_x2[ai]
            y1, y2 = s_y1[ai], s_y2[ai]
            xlo, xhi = bxlo[bi], bxhi[bi]
            ylo, yhi = bylo[bi], byhi[bi]
            keep = (x1 <= xhi) & (x2 >= xlo) \
                & (np.minimum(y1, y2) <= yhi) \
                & (np.maximum(y1, y2) >= ylo)
            dx, dy = x2 - x1, y2 - y1
            cmin = None
            cmax = None
            for cx, cy in ((xlo, ylo), (xlo, yhi), (xhi, ylo),
                           (xhi, yhi)):
                cr = dx * (cy - y1) - dy * (cx - x1)
                cmin = cr if cmin is None else np.minimum(cmin, cr)
                cmax = cr if cmax is None else np.maximum(cmax, cr)
            keep &= (cmin <= 0) & (cmax >= 0)
            outs.append((k[keep], bid[bi][keep]))
        if not outs:
            return empty
        k = np.concatenate([o[0] for o in outs])
        bd = np.concatenate([o[1] for o in outs])
        # per-partition dedup (a pair can meet in ≤ 4 shared cells)
        u = np.unique(np.stack([k, bd], axis=1), axis=0)
        return pa.table({
            "seg_doc": pa.array(u[:, 0] // 4, type=pa.int64()),
            "seg_j": pa.array(u[:, 0] % 4, type=pa.int64()),
            "box_doc": pa.array(u[:, 1], type=pa.int64()),
        })

    cand = both.map_batches(add_part, batch_format="pyarrow") \
        .groupby("_part").map_groups(per_part, batch_format="pyarrow")

    # global distinct: shared cells can land in different partitions
    from ray.data.aggregate import Count

    out = cand.groupby(["seg_doc", "seg_j", "box_doc"]).aggregate(
        Count(alias_name="_n"))

    def strip(b: pa.Table) -> pa.Table:
        return pa.table({c2: b[c2].cast(pa.int64())
                         for c2 in ("seg_doc", "seg_j", "box_doc")})

    return out.map_batches(strip, batch_format="pyarrow")


def knn_within(sf_dir: str, eps1e4: int = 80000, k: int = 3,
               n_parts: int = 64):
    """Bounded k-nearest-neighbor join: for every point, its ≤ ``k``
    nearest neighbors within L2 distance ``eps1e4``, ranked by
    (d2, key) — the top-k generalization of
    ``nearest_neighbor_within`` (points with no neighbor in range are
    dropped; points with fewer than k emit fewer rows).  Output
    (doc_id, span_idx, rank, nn_doc, nn_span, nn_d2), int64, rank 1-based.

    Shape: identical cell bucketing to the argmin join — the query side
    replicates to its 9 neighbor cells, candidates stay home, and each
    (point, candidate) pair meets in EXACTLY one partition (the
    candidate's home cell), so per-partition partial top-k lists are
    disjoint and the union of partials contains the global top-k; a
    second bounded shuffle (≤ k rows per (partition, point)) merges.
    Top-k selection is vectorized: lexsort by (point, d2, key), rank =
    position minus segment start, keep rank < k — no Python loop."""
    eps = np.int64(eps1e4)
    eps2 = eps * eps
    ncy = np.int64(WORLD_Y // eps1e4 + 4)

    def prep(b: pa.Table):
        lat = b["lat1e4"].to_numpy(zero_copy_only=False)
        lng = b["lng1e4"].to_numpy(zero_copy_only=False)
        key = (b["doc_id"].to_numpy(zero_copy_only=False) * 4
               + b["span_idx"].to_numpy(zero_copy_only=False))
        cx = (lng + LNG_OFF) // eps
        cy = (lat + LAT_OFF) // eps
        return key, lat, lng, cx, cy

    def probe(b: pa.Table) -> pa.Table:
        key, lat, lng, cx, cy = prep(b)
        ks, lats, lngs, cks = [], [], [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                ks.append(key)
                lats.append(lat)
                lngs.append(lng)
                cks.append((cx + dx) * ncy + (cy + dy))
        n = len(key) * 9
        return pa.table({
            "ckey": pa.array(np.concatenate(cks), type=pa.int64()),
            "key": pa.array(np.concatenate(ks), type=pa.int64()),
            "lat": pa.array(np.concatenate(lats), type=pa.int64()),
            "lng": pa.array(np.concatenate(lngs), type=pa.int64()),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
        })

    def home(b: pa.Table) -> pa.Table:
        key, lat, lng, cx, cy = prep(b)
        return pa.table({
            "ckey": pa.array(cx * ncy + cy, type=pa.int64()),
            "key": pa.array(key, type=pa.int64()),
            "lat": pa.array(lat, type=pa.int64()),
            "lng": pa.array(lng, type=pa.int64()),
            "side": pa.array(np.ones(len(key), dtype=np.int8)),
        })

    pts = geo_points_int(sf_dir)
    both = pts.map_batches(probe, batch_format="pyarrow") \
        .union(pts.map_batches(home, batch_format="pyarrow"))

    empty = pa.table({c: pa.array([], type=pa.int64())
                      for c in ("key", "nn_key", "nn_d2")})

    def add_part(b: pa.Table) -> pa.Table:
        part = _part_of(b["ckey"].to_numpy(zero_copy_only=False), n_parts)
        return b.append_column("_part", pa.array(part))

    def _topk(ak, bk, d2, kk):
        """First kk rows per ak group under (ak, d2, bk) order."""
        o = np.lexsort((bk, d2, ak))
        ak, bk, d2 = ak[o], bk[o], d2[o]
        start = np.r_[True, ak[1:] != ak[:-1]]
        seg = np.cumsum(start) - 1
        seg_first = np.flatnonzero(start)
        rank = np.arange(len(ak), dtype=np.int64) - seg_first[seg]
        keep = rank < kk
        return ak[keep], bk[keep], d2[keep]

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        g = g.drop_columns(["_part"])
        side = g["side"].to_numpy(zero_copy_only=False)
        a = g.filter(pa.array(side == 0))
        h = g.filter(pa.array(side == 1))
        if a.num_rows == 0 or h.num_rows == 0:
            return empty
        hc = h["ckey"].to_numpy(zero_copy_only=False)
        order = np.argsort(hc, kind="stable")
        hc = hc[order]
        hk = h["key"].to_numpy(zero_copy_only=False)[order]
        hlat = h["lat"].to_numpy(zero_copy_only=False)[order]
        hlng = h["lng"].to_numpy(zero_copy_only=False)[order]
        ac = a["ckey"].to_numpy(zero_copy_only=False)
        a_key = a["key"].to_numpy(zero_copy_only=False)
        a_lat = a["lat"].to_numpy(zero_copy_only=False)
        a_lng = a["lng"].to_numpy(zero_copy_only=False)
        starts = np.searchsorted(hc, ac, side="left")
        ends = np.searchsorted(hc, ac, side="right")
        outs = []
        for ai, bi in _expand_pairs_chunked(starts, ends):
            ak, alat, alng = a_key[ai], a_lat[ai], a_lng[ai]
            bk, blat, blng = hk[bi], hlat[bi], hlng[bi]
            d2 = (alat - blat) ** 2 + (alng - blng) ** 2
            keep = (d2 <= eps2) & (ak != bk)
            # contract each chunk to its per-key top-k before
            # accumulating — top-k is a combiner (the global top-k is a
            # subset of the union of per-chunk top-ks), so the final
            # _topk over the concatenation below is exact even when one
            # key's probe rows land in different chunks
            outs.append(_topk(ak[keep], bk[keep], d2[keep], k))
        if not outs:
            return empty
        ak, bk, d2 = _topk(np.concatenate([o[0] for o in outs]),
                           np.concatenate([o[1] for o in outs]),
                           np.concatenate([o[2] for o in outs]), k)
        return pa.table({"key": pa.array(ak), "nn_key": pa.array(bk),
                         "nn_d2": pa.array(d2)})

    partials = both.map_batches(add_part, batch_format="pyarrow") \
        .groupby("_part").map_groups(per_part, batch_format="pyarrow")

    out_empty = pa.table({c: pa.array([], type=pa.int64())
                          for c in ("doc_id", "span_idx", "rank", "nn_doc",
                                    "nn_span", "nn_d2")})

    def add_kpart(b: pa.Table) -> pa.Table:
        part = _part_of(b["key"].to_numpy(zero_copy_only=False), n_parts)
        return b.append_column("_part", pa.array(part))

    def finish(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_empty
        kk = g["key"].to_numpy(zero_copy_only=False)
        nk = g["nn_key"].to_numpy(zero_copy_only=False)
        d2 = g["nn_d2"].to_numpy(zero_copy_only=False)
        kk, nk, d2 = _topk(kk, nk, d2, k)
        start = np.r_[True, kk[1:] != kk[:-1]]
        seg_first = np.flatnonzero(start)
        seg = np.cumsum(start) - 1
        rank = (np.arange(len(kk), dtype=np.int64) - seg_first[seg]) + 1
        return pa.table({
            "doc_id": pa.array(kk // 4, type=pa.int64()),
            "span_idx": pa.array(kk % 4, type=pa.int64()),
            "rank": pa.array(rank, type=pa.int64()),
            "nn_doc": pa.array(nk // 4, type=pa.int64()),
            "nn_span": pa.array(nk % 4, type=pa.int64()),
            "nn_d2": pa.array(d2, type=pa.int64()),
        })

    return partials.map_batches(add_kpart, batch_format="pyarrow") \
        .groupby("_part").map_groups(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# hexagonal tiling (H3-style hexbin rollup)
# ---------------------------------------------------------------------------
# Two interleaved rectangular center lattices A=(W·i, H·j) and
# B=(W·i + W/2, H·j + H/2) with H ≈ W·√3: the Voronoi diagram of their
# union is a hexagonal tiling (the classic hexbin construction —
# matplotlib's hexbin uses exactly this two-grid nearest-center rule).
# Working in DOUBLED coordinates keeps every quantity int64-exact with no
# parity constraint on W/H, so the assignment is bit-reproducible and has
# a closed-form DuckDB twin (floor-division on non-negative ints).
HEX_W = 40_000            # 4.0° center spacing in 1e-4-deg units
HEX_H = 69_282            # ≈ W·√3 → near-regular hexagons
HEX_NY = 64               # j-index stride for the packed hex key


def _hex_assign(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Exact nearest-center hex id for SHIFTED non-negative int64 grid
    coords. id = (i·HEX_NY + j)·2 + is_offset_lattice; ties (equal
    doubled-coordinate squared distance) go to lattice A."""
    w, h = np.int64(HEX_W), np.int64(HEX_H)
    ia = (2 * x + w) // (2 * w)
    ja = (2 * y + h) // (2 * h)
    ib = x // w
    jb = y // h
    da2 = (2 * x - 2 * w * ia) ** 2 + (2 * y - 2 * h * ja) ** 2
    db2 = (2 * x - (2 * w * ib + w)) ** 2 + (2 * y - (2 * h * jb + h)) ** 2
    use_b = db2 < da2
    i = np.where(use_b, ib, ia)
    j = np.where(use_b, jb, ja)
    return (i * HEX_NY + j) * 2 + use_b.astype(np.int64)


def hexbin_counts(sf_dir: str):
    """Hexagonal-tile rollup over the integer geo-point lattice: per-hex
    (hexkey, n_points, sum_lat1e4, sum_lng1e4), hexkey-ascending — the
    H3/S2-style hex tiling histogram/centroid pass (north_star: "H3/S2
    cell covers as a pre-filter index"; this is the hex analogue of
    ``quadkey_counts``'s square tiling).

    Shape: identical to ``quadkey_counts`` — per-block np partials
    (bounded by the hex-grid size, not the data) shrink each block before
    ONE groupby-sum shuffle. At 100 TB the shuffle moves one partial row
    per (block, occupied hex): O(blocks × 4k), never O(points)."""
    from ray.data.aggregate import Sum

    def part(b: pa.Table) -> pa.Table:
        lat = b["lat1e4"].to_numpy(zero_copy_only=False)
        lng = b["lng1e4"].to_numpy(zero_copy_only=False)
        hid = _hex_assign(lng + LNG_OFF, lat + LAT_OFF)
        uh, inv, cnt = np.unique(hid, return_inverse=True,
                                 return_counts=True)
        slat = np.zeros(len(uh), dtype=np.int64)
        slng = np.zeros(len(uh), dtype=np.int64)
        np.add.at(slat, inv, lat)
        np.add.at(slng, inv, lng)
        return pa.table({
            "hexkey": pa.array(uh, type=pa.int64()),
            "n_points": pa.array(cnt.astype(np.int64)),
            "sum_lat1e4": pa.array(slat),
            "sum_lng1e4": pa.array(slng),
        })

    out = geo_points_int(sf_dir) \
        .map_batches(part, batch_format="pyarrow") \
        .groupby("hexkey").aggregate(
            Sum("n_points", alias_name="n_points"),
            Sum("sum_lat1e4", alias_name="sum_lat1e4"),
            Sum("sum_lng1e4", alias_name="sum_lng1e4"))
    return out.sort("hexkey")


# ---------------------------------------------------------------------------
# DBSCAN density clustering
# ---------------------------------------------------------------------------

_NOISE_SENTINEL = np.int64(1) << np.int64(62)


def _minlabel_components(ids_sorted: np.ndarray, ea: np.ndarray,
                         eb: np.ndarray) -> np.ndarray:
    """Driver-local connected components, fully vectorized: min-label
    propagation over the edge arrays with pointer doubling — the same
    fixpoint `stages/dedup.UnionFind` computes (label = min id in the
    component) without a Python loop over edges. O(log diameter) rounds,
    each a couple of `minimum.at` passes over the edge arrays."""
    lab = ids_sorted.copy()
    ai = np.searchsorted(ids_sorted, ea)
    bi = np.searchsorted(ids_sorted, eb)
    if len(ai) == 0:
        return lab
    prev = -1
    while True:
        np.minimum.at(lab, ai, lab[bi])
        np.minimum.at(lab, bi, lab[ai])
        # pointer doubling: label <- label(label) (labels ARE member ids)
        lab = lab[np.searchsorted(ids_sorted, lab)]
        s = int(lab.sum())
        if s == prev:
            return lab
        prev = s


def dbscan_labels(sf_dir: str, eps1e4: int = 50000, min_pts: int = 4,
                  core_broadcast_limit: int = 20_000_000, n_parts: int = 64,
                  driver_pair_limit: int | None = None):
    """Distributed DBSCAN (Ester et al., KDD'96) over the integer
    geo-point lattice: (doc_id, span_idx, cluster, is_core) with

    - core      iff |N_eps(p)| >= min_pts (the count INCLUDES p itself);
    - cluster   = min key (doc_id*4 + span_idx) in the point's density
      component: core points take their component over core-core
      eps-edges; a border point (non-core with >= 1 core neighbor) takes
      the MIN cluster among its core neighbors (the classic DBSCAN
      border ambiguity resolved deterministically);
    - noise     -> cluster = -1.

    Everything is exact int64 arithmetic on the lattice, so the labeling
    is bit-reproducible under any partitioning and has a closed-form
    DuckDB twin (recursive-CTE reachability, `oracle.sql_dbscan_labels`).

    Shape: eps-neighbor pairs come from `radius_pairs` (grid-cell join,
    never all-pairs); degrees are per-block partial counts + ONE
    groupby-sum; components run on the CORE-CORE edge subgraph via
    `clusters_from_pairs_ds` (min-label propagation with pointer
    shortcutting, O(log diameter) shuffle rounds). Core membership and
    the core->label map are broadcast once via `ray.put` when the core
    set fits (`core_broadcast_limit`, default 20M keys = the pagerank
    broadcast-plan cutover) — the >limit path does the same filtering
    with two distributed hash joins instead; both plans are asserted
    bit-identical in tests/test_spatial.py. The pair table is
    materialized once (object-store blocks, spill-backed) because three
    passes read it: degree, core-edge filter, border attach."""
    from ray.data.aggregate import Max, Min, Sum

    from ..stages.dedup import _drop_empty_blocks, clusters_from_pairs_ds

    if min_pts < 2:
        raise ValueError("min_pts must be >= 2 (min_pts <= 1 marks every "
                         "point core; use a plain components pass)")

    pts = geo_points_int(sf_dir)

    def pair_keys(b: pa.Table) -> pa.Table:
        a = (b["doc_a"].to_numpy(zero_copy_only=False) * 4
             + b["span_a"].to_numpy(zero_copy_only=False))
        c = (b["doc_b"].to_numpy(zero_copy_only=False) * 4
             + b["span_b"].to_numpy(zero_copy_only=False))
        return pa.table({"a": pa.array(a, type=pa.int64()),
                         "b": pa.array(c, type=pa.int64())})

    pk = radius_pairs(sf_dir, eps1e4, n_parts=n_parts) \
        .map_batches(pair_keys, batch_format="pyarrow").materialize()

    def deg_part(b: pa.Table) -> pa.Table:
        k = np.concatenate([b["a"].to_numpy(zero_copy_only=False),
                            b["b"].to_numpy(zero_copy_only=False)])
        uk, cnt = np.unique(k, return_counts=True)
        return pa.table({"key": pa.array(uk, type=pa.int64()),
                         "deg": pa.array(cnt.astype(np.int64))})

    deg = pk.map_batches(deg_part, batch_format="pyarrow") \
        .groupby("key").aggregate(Sum("deg", alias_name="deg"))

    def core_only(b: pa.Table) -> pa.Table:
        keep = b["deg"].to_numpy(zero_copy_only=False) + 1 >= min_pts
        return pa.table(
            {"key": b["key"].filter(pa.array(keep)).combine_chunks()})

    core_ds = _drop_empty_blocks(
        deg.map_batches(core_only, batch_format="pyarrow").materialize())
    n_core = core_ds.count()

    def all_noise(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "doc_id": b["doc_id"],
            "span_idx": b["span_idx"],
            "cluster": pa.array(np.full(n, -1, dtype=np.int64)),
            "is_core": pa.array(np.zeros(n, dtype=np.int64)),
        })

    if n_core == 0:
        return pts.map_batches(all_noise, batch_format="pyarrow") \
            .sort(["doc_id", "span_idx"])

    broadcast = n_core <= core_broadcast_limit
    # shuffle width for the non-broadcast hash joins, sized like
    # clusters_from_pairs_ds (tiny tables don't pay 16 aggregator actors)
    width = max(2, min(16, pk.count() // 50_000 + 2))
    core_sorted: np.ndarray | None = None
    if broadcast:
        import ray
        core_sorted = np.sort(np.concatenate(
            [b["key"].to_numpy(zero_copy_only=False)
             for b in core_ds.iter_batches(batch_size=None,
                                           batch_format="pyarrow")]))
        core_ref = ray.put(core_sorted)

        def _member(keys: np.ndarray, sorted_arr: np.ndarray) -> np.ndarray:
            pos = np.searchsorted(sorted_arr, keys)
            return (pos < len(sorted_arr)) & (sorted_arr[np.minimum(
                pos, len(sorted_arr) - 1)] == keys)

        def both_core(b: pa.Table) -> pa.Table:
            import ray
            ck = ray.get(core_ref)
            a = b["a"].to_numpy(zero_copy_only=False)
            c = b["b"].to_numpy(zero_copy_only=False)
            keep = pa.array(_member(a, ck) & _member(c, ck))
            return b.filter(keep)

        cc_pairs = pk.map_batches(both_core, batch_format="pyarrow")
    else:
        flags = core_ds
        t1 = pk.join(flags, join_type="inner", num_partitions=width,
                     on=("a",), right_on=("key",))
        t1 = _drop_empty_blocks(t1.select_columns(["a", "b"]).materialize())
        cc_pairs = t1.join(flags, join_type="inner", num_partitions=width,
                           on=("b",), right_on=("key",)) \
            .select_columns(["a", "b"])

    # transitive closure over the core-core subgraph, auto-routed like
    # dedup.cluster_assign: pair volumes within driver RAM use union-find
    # (zero extra shuffles — the iterative label-propagation rounds cost
    # seconds of fixed overhead each on tiny graphs); beyond the limit
    # the distributed min-label fixpoint runs. Identical labels either
    # way (cluster = min key in component; forced-path equality tested).
    # The union-find route needs the core keys driver-side, so it is
    # gated on the broadcast plan (which already folded them, sorted).
    from ..stages.dedup import DRIVER_PAIR_LIMIT
    if driver_pair_limit is None:
        driver_pair_limit = DRIVER_PAIR_LIMIT
    cc_mat = cc_pairs.materialize()
    label_arrays: tuple | None = None  # (sorted keys, labels) if local
    if broadcast and cc_mat.count() <= driver_pair_limit:
        import ray.data as rd
        ea = np.concatenate(
            [b["a"].to_numpy(zero_copy_only=False)
             for b in cc_mat.iter_batches(batch_size=None,
                                          batch_format="pyarrow")]
            or [np.empty(0, dtype=np.int64)])
        eb = np.concatenate(
            [b["b"].to_numpy(zero_copy_only=False)
             for b in cc_mat.iter_batches(batch_size=None,
                                          batch_format="pyarrow")]
            or [np.empty(0, dtype=np.int64)])
        cl = _minlabel_components(core_sorted, ea, eb)
        label_arrays = (core_sorted, cl)
        labels = rd.from_arrow(pa.table({
            "key": pa.array(core_sorted, type=pa.int64()),
            "cluster_id": pa.array(cl, type=pa.int64()),
        })).materialize()
    else:
        labels = clusters_from_pairs_ds(core_ds, cc_mat, id_col="key") \
            .materialize()

    sent = int(_NOISE_SENTINEL)

    def core_rows(b: pa.Table) -> pa.Table:
        return pa.table({
            "key": b["key"],
            "label": b["cluster_id"],
            "corebit": pa.array(np.ones(b.num_rows, dtype=np.int64)),
        })

    def pts_rows(b: pa.Table) -> pa.Table:
        k = (b["doc_id"].to_numpy(zero_copy_only=False) * 4
             + b["span_idx"].to_numpy(zero_copy_only=False))
        return pa.table({
            "key": pa.array(k, type=pa.int64()),
            "label": pa.array(np.full(len(k), sent, dtype=np.int64)),
            "corebit": pa.array(np.zeros(len(k), dtype=np.int64)),
        })

    if broadcast:
        import ray
        if label_arrays is not None:  # union-find route: already local
            lab_ref = ray.put(label_arrays)
        else:
            lk_chunks, lv_chunks = [], []
            for b in labels.iter_batches(batch_size=None,
                                         batch_format="pyarrow"):
                lk_chunks.append(b["key"].to_numpy(zero_copy_only=False))
                lv_chunks.append(
                    b["cluster_id"].to_numpy(zero_copy_only=False))
            lk = np.concatenate(lk_chunks)
            order = np.argsort(lk, kind="stable")
            lab_ref = ray.put((lk[order],
                               np.concatenate(lv_chunks)[order]))

        def nbr_rows(b: pa.Table) -> pa.Table:
            import ray
            lk, lv = ray.get(lab_ref)
            a = b["a"].to_numpy(zero_copy_only=False)
            c = b["b"].to_numpy(zero_copy_only=False)
            u = np.concatenate([a, c])
            v = np.concatenate([c, a])
            pos = np.searchsorted(lk, v)
            hit = (pos < len(lk)) & (lk[np.minimum(pos, len(lk) - 1)] == v)
            return pa.table({
                "key": pa.array(u[hit], type=pa.int64()),
                "label": pa.array(lv[pos[hit]], type=pa.int64()),
                "corebit": pa.array(np.zeros(int(hit.sum()),
                                             dtype=np.int64)),
            })

        nbr = pk.map_batches(nbr_rows, batch_format="pyarrow")
    else:
        def directed(b: pa.Table) -> pa.Table:
            a = b["a"].combine_chunks()
            c = b["b"].combine_chunks()
            return pa.table({"u": pa.concat_arrays([a, c]),
                             "v": pa.concat_arrays([c, a])})

        j = pk.map_batches(directed, batch_format="pyarrow") \
            .join(labels, join_type="inner", num_partitions=width,
                  on=("v",), right_on=("key",))

        def from_join(b: pa.Table) -> pa.Table:
            return pa.table({
                "key": b["u"],
                "label": b["cluster_id"],
                "corebit": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
            })

        nbr = _drop_empty_blocks(j.materialize()) \
            .map_batches(from_join, batch_format="pyarrow")

    allr = pts.map_batches(pts_rows, batch_format="pyarrow") \
        .union(labels.map_batches(core_rows, batch_format="pyarrow")) \
        .union(nbr)
    agg = allr.groupby("key").aggregate(
        Min("label", alias_name="label"),
        Max("corebit", alias_name="is_core"))

    def finish(b: pa.Table) -> pa.Table:
        k = b["key"].to_numpy(zero_copy_only=False)
        lab = b["label"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(k // 4, type=pa.int64()),
            "span_idx": pa.array(k % 4, type=pa.int64()),
            "cluster": pa.array(np.where(lab == sent, -1, lab)),
            "is_core": pa.array(
                b["is_core"].to_numpy(zero_copy_only=False)
                .astype(np.int64)),
        })

    return agg.map_batches(finish, batch_format="pyarrow") \
        .sort(["doc_id", "span_idx"])


# ---------------------------------------------------------------------------
# route crossings (segment-segment intersection join)
# ---------------------------------------------------------------------------

def _segments_intersect(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2):
    """Exact closed segment-intersection predicate on int64 lattice
    coordinates (vectorized; determinants <= ~1.3e13 so int64 is exact).
    Returns (intersects, proper): proper = both segments STRICTLY
    straddle each other's supporting line; the non-proper intersections
    are endpoint touches and collinear overlaps (some orientation zero
    with that endpoint inside the other segment's bbox)."""
    adx, ady = ax2 - ax1, ay2 - ay1
    bdx, bdy = bx2 - bx1, by2 - by1
    d1 = bdx * (ay1 - by1) - bdy * (ax1 - bx1)  # orient(b1,b2,a1)
    d2 = bdx * (ay2 - by1) - bdy * (ax2 - bx1)  # orient(b1,b2,a2)
    d3 = adx * (by1 - ay1) - ady * (bx1 - ax1)  # orient(a1,a2,b1)
    d4 = adx * (by2 - ay1) - ady * (bx2 - ax1)  # orient(a1,a2,b2)
    proper = (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) \
        & (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0)))

    def on_bbox(qx, qy, px1, py1, px2, py2):
        return (np.minimum(px1, px2) <= qx) & (qx <= np.maximum(px1, px2)) \
            & (np.minimum(py1, py2) <= qy) & (qy <= np.maximum(py1, py2))

    touch = ((d1 == 0) & on_bbox(ax1, ay1, bx1, by1, bx2, by2)) \
        | ((d2 == 0) & on_bbox(ax2, ay2, bx1, by1, bx2, by2)) \
        | ((d3 == 0) & on_bbox(bx1, by1, ax1, ay1, ax2, ay2)) \
        | ((d4 == 0) & on_bbox(bx2, by2, ax1, ay1, ax2, ay2))
    return proper | touch, proper


def route_crossings(sf_dir: str, cell: int = 56250, n_parts: int = 64):
    """Trajectory-crossing join: every unordered pair of segments from
    DIFFERENT docs whose closed segments intersect — the map-overlay /
    route-conflict primitive. Output (doc_a, j_a, doc_b, j_b, proper),
    ordered so doc_a*4+j_a < doc_b*4+j_b; ``proper`` = 1 for a proper
    (transversal) crossing, 0 for an endpoint touch or collinear overlap.

    The predicate is the classic exact orientation test (e.g. Shewchuk,
    "Adaptive precision floating-point arithmetic", 1997 — here the
    lattice keeps every 2x2 determinant <= ~1.3e13, so plain int64 IS the
    exact arithmetic): with d1..d4 the four endpoint orientations,
    proper crossing iff both segments strictly straddle each other's
    supporting line; touching iff some d_i = 0 with that endpoint inside
    the other's bbox.

    Shape: segments replicate to their supercover cells
    (`_segment_cell_cover` — O(nx+ny) replicas for world-spanning
    chords); ONE hash shuffle on the cell key; per cell a vectorized
    sorted-run all-pairs expansion + the int64 predicate. A pair can
    meet in many shared cells, so a distinct groupby on the output
    quadruple dedups — it shuffles OUTPUT pairs only (same documented
    trade as `segment_box_hits`; canonical-cell emission would need the
    rational intersection point's cell, whose numerator overflows
    int64). Total per-cell work is scale-free in the cell size for line
    data (R²/C constant in c), so the cell knob tunes LOAD BALANCE, not
    work: the swept default 56250 (2048 world cells over 64 partitions)
    beat 225000 (128 cells — 3-vs-1 lumpy hash assignment) by ~15% at
    sf0.1."""
    c = np.int64(cell)
    ncy = np.int64(WORLD_Y // cell + 4)

    def rep(b: pa.Table) -> pa.Table:
        x1 = b["x1"].to_numpy(zero_copy_only=False)
        y1 = b["y1"].to_numpy(zero_copy_only=False)
        x2 = b["x2"].to_numpy(zero_copy_only=False)
        y2 = b["y2"].to_numpy(zero_copy_only=False)
        key = (b["seg_doc"].to_numpy(zero_copy_only=False) * 4
               + b["seg_j"].to_numpy(zero_copy_only=False))
        ri, col, cy = _segment_cell_cover(x1, y1, x2, y2, c)
        return pa.table({
            "ckey": pa.array(col * ncy + cy, type=pa.int64()),
            "key": pa.array(key[ri], type=pa.int64()),
            "x1": pa.array(x1[ri], type=pa.int64()),
            "y1": pa.array(y1[ri], type=pa.int64()),
            "x2": pa.array(x2[ri], type=pa.int64()),
            "y2": pa.array(y2[ri], type=pa.int64()),
        })

    def add_part(b: pa.Table) -> pa.Table:
        part = _part_of(b["ckey"].to_numpy(zero_copy_only=False), n_parts)
        return b.append_column("_part", pa.array(part))

    empty = pa.table({k: pa.array([], type=pa.int64())
                      for k in ("doc_a", "j_a", "doc_b", "j_b", "proper")})

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        ck = g["ckey"].to_numpy(zero_copy_only=False)
        order = np.argsort(ck, kind="stable")
        ck = ck[order]
        key = g["key"].to_numpy(zero_copy_only=False)[order]
        x1 = g["x1"].to_numpy(zero_copy_only=False)[order]
        y1 = g["y1"].to_numpy(zero_copy_only=False)[order]
        x2 = g["x2"].to_numpy(zero_copy_only=False)[order]
        y2 = g["y2"].to_numpy(zero_copy_only=False)[order]
        n = len(ck)
        # segmented all-pairs (i < j within each equal-ckey run),
        # enumerated in BOUNDED CHUNKS: the index arrays for a dense
        # cell are quadratic in its population (a 20k-replica cell is a
        # 200M-pair expansion — tens of GB if materialized at once), so
        # slice the element range wherever the cumulative pair count
        # crosses ~4M and run the filter cascade per slice. Peak memory
        # is O(chunk + one element's run), independent of cell density.
        run_end = np.searchsorted(ck, ck, side="right")
        starts = np.arange(1, n + 1, dtype=np.int64)  # i pairs with i+1..
        outs: list = []
        for ai, bi in _expand_pairs_chunked(starts, run_end):
            ka, kb = key[ai], key[bi]
            keep0 = (ka // 4) != (kb // 4)  # cross-doc only
            ai, bi = ai[keep0], bi[keep0]
            ka, kb = ka[keep0], kb[keep0]
            ax1, ay1, ax2, ay2 = x1[ai], y1[ai], x2[ai], y2[ai]
            bx1, by1, bx2, by2 = x1[bi], y1[bi], x2[bi], y2[bi]
            # closed bbox prefilter (x already normalized ascending)
            pre = (ax1 <= bx2) & (bx1 <= ax2) \
                & (np.minimum(ay1, ay2) <= np.maximum(by1, by2)) \
                & (np.minimum(by1, by2) <= np.maximum(ay1, ay2))
            ka, kb = ka[pre], kb[pre]
            ax1, ay1, ax2, ay2 = ax1[pre], ay1[pre], ax2[pre], ay2[pre]
            bx1, by1, bx2, by2 = bx1[pre], by1[pre], bx2[pre], by2[pre]
            keep, proper = _segments_intersect(ax1, ay1, ax2, ay2,
                                               bx1, by1, bx2, by2)
            outs.append((np.minimum(ka[keep], kb[keep]),
                         np.maximum(ka[keep], kb[keep]),
                         proper[keep]))
        if not outs:
            return empty
        lo = np.concatenate([o[0] for o in outs])
        hi = np.concatenate([o[1] for o in outs])
        pr = np.concatenate([o[2] for o in outs])
        if len(lo) == 0:
            return empty
        # per-partition dedup before the global distinct
        u, idx = np.unique(np.stack([lo, hi], axis=1), axis=0,
                           return_index=True)
        return pa.table({
            "doc_a": pa.array(u[:, 0] // 4, type=pa.int64()),
            "j_a": pa.array(u[:, 0] % 4, type=pa.int64()),
            "doc_b": pa.array(u[:, 1] // 4, type=pa.int64()),
            "j_b": pa.array(u[:, 1] % 4, type=pa.int64()),
            "proper": pa.array(pr[idx].astype(np.int64)),
        })

    cand = doc_segments(sf_dir) \
        .map_batches(rep, batch_format="pyarrow") \
        .map_batches(add_part, batch_format="pyarrow") \
        .groupby("_part").map_groups(per_part, batch_format="pyarrow")

    # global distinct: shared cells can land in different partitions.
    # ``proper`` is a FUNCTION of the pair (every cell computes the same
    # predicate on the same coordinates), so Max == the common value.
    from ray.data.aggregate import Max

    out = cand.groupby(["doc_a", "j_a", "doc_b", "j_b"]).aggregate(
        Max("proper", alias_name="proper"))

    def strip(b: pa.Table) -> pa.Table:
        return pa.table({c2: b[c2].cast(pa.int64())
                         for c2 in ("doc_a", "j_a", "doc_b", "j_b",
                                    "proper")})

    return out.map_batches(strip, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# map-matching: snap points to the nearest trajectory segment
# ---------------------------------------------------------------------------

def _ceil_sq_div(dot: np.ndarray, den: np.ndarray) -> np.ndarray:
    """Exact ceil(dot²/den), PRECONDITION 0 < dot < den < 2^46 (the
    clamped-interior case guarantees it) — dot² overflows int64, so:
    float64 estimate (the ratio is < dot < 2^46, two roundings cost
    2^-52 relative ⇒ absolute error < 2^-6), then EXACT python-int
    recomputation only where the estimate is within 1/32 of an integer
    (the filtered-exact-predicate recipe, cf. Shewchuk '97). The
    uncertain band is a tiny fraction of candidates; everything else
    stays vectorized."""
    t = dot.astype(np.float64) ** 2 / den.astype(np.float64)
    q = np.ceil(t)
    frac = t - np.floor(t)
    unc = (frac < 1.0 / 32) | (frac > 1 - 1.0 / 32)
    if unc.any():
        idx = np.nonzero(unc)[0]
        exact = np.fromiter(
            (-((-int(dot[i]) * int(dot[i])) // int(den[i]))
             for i in idx),
            dtype=np.int64, count=len(idx))
        q[idx] = exact
    return q.astype(np.int64)


def _point_segment_d2q(px, py, ax, ay, bx, by):
    """floor() of the exact squared point-to-segment distance, all int64
    in/out: d² = |w|² - dot²/den clamped to the endpoints (w = p-a,
    v = b-a, dot = w·v, den = |v|²); floor(|w|² - dot²/den) =
    |w|² - ceil(dot²/den). Degenerate zero-length segments fall back to
    the endpoint distance."""
    wx, wy = px - ax, py - ay
    vx, vy = bx - ax, by - ay
    den = vx * vx + vy * vy
    dot = wx * vx + wy * vy
    wsq = wx * wx + wy * wy
    start = (dot <= 0) | (den == 0)
    end = ~start & (dot >= den)
    d2q = wsq.copy()
    if end.any():
        d2q[end] = ((px[end] - bx[end]) ** 2 + (py[end] - by[end]) ** 2)
    mid = ~start & ~end
    if mid.any():
        d2q[mid] = wsq[mid] - _ceil_sq_div(dot[mid], den[mid])
    return d2q


def points_snap_segment(sf_dir: str, snap1e4: int = 1000,
                        cell: int = 25000, n_parts: int = 64):
    """Map-matching join: snap every geo point to the nearest CROSS-doc
    trajectory segment within ``snap1e4`` (1e-4 deg), under the
    QUANTIZED exact metric d2q = floor(true squared distance) — the
    floor keeps every comparison in int64 (the true squared distance to
    a segment interior is rational with denominator |v|²; its cross-
    segment comparisons would need int128·int128), and ties break on
    the segment key, so the winner is bit-deterministic and has a
    closed-form DuckDB twin (HUGEINT rebuilds the same floor). Points
    with no segment inside the radius are dropped. Output (doc_id,
    span_idx, seg_doc, seg_j, snap_d2q), key-ascending.

    Shape: two bounded shuffles, the `nearest_neighbor_within` recipe —
    segments sit in their supercover cells (cell >= snap radius keeps
    the 9-neighborhood sufficient: the foot point is within snap of the
    query, hence in an adjacent cell, hence in the segment's cover);
    points replicate to the 9 neighbor cells; per-partition partial
    argmins (<= 1 row per partition × point) meet in a second coarse
    shuffle. Candidates never leave their partition; duplicate
    candidates from shared cells are harmless under argmin."""
    # STRICT: the quantized keep (floor(d²) <= r²) admits true distances
    # up to sqrt(r²+1), so the 9-neighborhood coverage proof needs
    # cell >= r+1 — cell == r exactly could miss a boundary-sitting
    # point whose foot lands two rows away
    assert cell > snap1e4, "9-cell probe needs cell > snap radius"
    c = np.int64(cell)
    r2 = np.int64(snap1e4) * np.int64(snap1e4)
    ncy = np.int64(WORLD_Y // cell + 4)

    def rep_segs(b: pa.Table) -> pa.Table:
        x1 = b["x1"].to_numpy(zero_copy_only=False)
        y1 = b["y1"].to_numpy(zero_copy_only=False)
        x2 = b["x2"].to_numpy(zero_copy_only=False)
        y2 = b["y2"].to_numpy(zero_copy_only=False)
        key = (b["seg_doc"].to_numpy(zero_copy_only=False) * 4
               + b["seg_j"].to_numpy(zero_copy_only=False))
        ri, col, cy = _segment_cell_cover(x1, y1, x2, y2, c)
        return pa.table({
            "ckey": pa.array(col * ncy + cy, type=pa.int64()),
            "key": pa.array(key[ri], type=pa.int64()),
            "x1": pa.array(x1[ri], type=pa.int64()),
            "y1": pa.array(y1[ri], type=pa.int64()),
            "x2": pa.array(x2[ri], type=pa.int64()),
            "y2": pa.array(y2[ri], type=pa.int64()),
            "side": pa.array(np.ones(len(ri), dtype=np.int8)),
        })

    def rep_points(b: pa.Table) -> pa.Table:
        lat = b["lat1e4"].to_numpy(zero_copy_only=False)
        lng = b["lng1e4"].to_numpy(zero_copy_only=False)
        key = (b["doc_id"].to_numpy(zero_copy_only=False) * 4
               + b["span_idx"].to_numpy(zero_copy_only=False))
        px, py = lng + LNG_OFF, lat + LAT_OFF
        cx, cy = px // c, py // c
        ks, xs, ys, cks = [], [], [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                ks.append(key)
                xs.append(px)
                ys.append(py)
                cks.append((cx + dx) * ncy + (cy + dy))
        n = len(key) * 9
        z = np.zeros(n, dtype=np.int64)
        return pa.table({
            "ckey": pa.array(np.concatenate(cks), type=pa.int64()),
            "key": pa.array(np.concatenate(ks), type=pa.int64()),
            "x1": pa.array(np.concatenate(xs), type=pa.int64()),
            "y1": pa.array(np.concatenate(ys), type=pa.int64()),
            "x2": pa.array(z),
            "y2": pa.array(z),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
        })

    both = doc_segments(sf_dir) \
        .map_batches(rep_segs, batch_format="pyarrow") \
        .union(geo_points_int(sf_dir).map_batches(rep_points,
                                                  batch_format="pyarrow"))

    partial_schema = ("key", "seg_key", "snap_d2q")
    empty = pa.table({k: pa.array([], type=pa.int64())
                      for k in partial_schema})

    def add_part(b: pa.Table) -> pa.Table:
        part = _part_of(b["ckey"].to_numpy(zero_copy_only=False), n_parts)
        return b.append_column("_part", pa.array(part))

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        side = g["side"].to_numpy(zero_copy_only=False)
        p = g.filter(pa.array(side == 0))
        s = g.filter(pa.array(side == 1))
        if p.num_rows == 0 or s.num_rows == 0:
            return empty
        sc = s["ckey"].to_numpy(zero_copy_only=False)
        order = np.argsort(sc, kind="stable")
        sc = sc[order]
        sk = s["key"].to_numpy(zero_copy_only=False)[order]
        sx1 = s["x1"].to_numpy(zero_copy_only=False)[order]
        sy1 = s["y1"].to_numpy(zero_copy_only=False)[order]
        sx2 = s["x2"].to_numpy(zero_copy_only=False)[order]
        sy2 = s["y2"].to_numpy(zero_copy_only=False)[order]
        pc = p["ckey"].to_numpy(zero_copy_only=False)
        p_key = p["key"].to_numpy(zero_copy_only=False)
        p_x = p["x1"].to_numpy(zero_copy_only=False)
        p_y = p["y1"].to_numpy(zero_copy_only=False)
        starts = np.searchsorted(sc, pc, side="left")
        ends = np.searchsorted(sc, pc, side="right")
        outs = []
        for ai, bi in _expand_pairs_chunked(starts, ends):
            pk, px, py = p_key[ai], p_x[ai], p_y[ai]
            skk = sk[bi]
            keep0 = (pk // 4) != (skk // 4)  # cross-doc only
            pk, px, py, skk, bi = pk[keep0], px[keep0], py[keep0], \
                skk[keep0], bi[keep0]
            if len(pk) == 0:
                continue
            d2q = _point_segment_d2q(px, py, sx1[bi], sy1[bi],
                                     sx2[bi], sy2[bi])
            keep = d2q <= r2
            # per-chunk partial argmin (argmin is a combiner; the final
            # lexsort-first below stays exact across chunks)
            pk, skk, d2q = pk[keep], skk[keep], d2q[keep]
            if len(pk) == 0:
                continue
            o = np.lexsort((skk, d2q, pk))
            pk, skk, d2q = pk[o], skk[o], d2q[o]
            first = np.r_[True, pk[1:] != pk[:-1]]
            outs.append((pk[first], skk[first], d2q[first]))
        if not outs:
            return empty
        pk = np.concatenate([o[0] for o in outs])
        skk = np.concatenate([o[1] for o in outs])
        d2q = np.concatenate([o[2] for o in outs])
        o = np.lexsort((skk, d2q, pk))
        pk, skk, d2q = pk[o], skk[o], d2q[o]
        first = np.r_[True, pk[1:] != pk[:-1]]
        return pa.table({"key": pa.array(pk[first]),
                         "seg_key": pa.array(skk[first]),
                         "snap_d2q": pa.array(d2q[first])})

    partials = both.map_batches(add_part, batch_format="pyarrow") \
        .groupby("_part").map_groups(per_part, batch_format="pyarrow")

    out_empty = pa.table({k: pa.array([], type=pa.int64())
                          for k in ("doc_id", "span_idx", "seg_doc",
                                    "seg_j", "snap_d2q")})

    def add_kpart(b: pa.Table) -> pa.Table:
        part = _part_of(b["key"].to_numpy(zero_copy_only=False), n_parts)
        return b.append_column("_part", pa.array(part))

    def finish(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_empty
        k = g["key"].to_numpy(zero_copy_only=False)
        sk = g["seg_key"].to_numpy(zero_copy_only=False)
        d2 = g["snap_d2q"].to_numpy(zero_copy_only=False)
        o = np.lexsort((sk, d2, k))
        k, sk, d2 = k[o], sk[o], d2[o]
        first = np.r_[True, k[1:] != k[:-1]]
        k, sk, d2 = k[first], sk[first], d2[first]
        return pa.table({
            "doc_id": pa.array(k // 4, type=pa.int64()),
            "span_idx": pa.array(k % 4, type=pa.int64()),
            "seg_doc": pa.array(sk // 4, type=pa.int64()),
            "seg_j": pa.array(sk % 4, type=pa.int64()),
            "snap_d2q": pa.array(d2, type=pa.int64()),
        })

    return partials.map_batches(add_kpart, batch_format="pyarrow") \
        .groupby("_part").map_groups(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# spatial left-aggregate and anti-join over the point-in-box pairs
# ---------------------------------------------------------------------------

def box_point_counts(sf_dir: str, cell: int = 65536, n_parts: int = 64):
    """Spatial LEFT aggregate: per-box contained-point count, INCLUDING
    empty boxes at 0 — the zonal-count / coverage-report primitive.
    Output (doc_id, n_points), doc_id-ascending.

    Shape: `points_in_doc_boxes` emits each qualifying pair exactly once
    (canonical-cell construction), so counts are a per-block partial
    contraction + ONE groupby-sum; the zero fill unions the box table
    (one row per box) into the same aggregate instead of a left join."""
    from ray.data.aggregate import Sum

    pairs = points_in_doc_boxes(sf_dir, cell=cell, n_parts=n_parts)

    def part(b: pa.Table) -> pa.Table:
        d = b["box_doc"].to_numpy(zero_copy_only=False)
        ud, cnt = np.unique(d, return_counts=True)
        return pa.table({"doc_id": pa.array(ud, type=pa.int64()),
                         "n_points": pa.array(cnt.astype(np.int64))})

    def zero(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b["doc_id"].cast(pa.int64()),
            "n_points": pa.array(
                np.zeros(b.num_rows, dtype=np.int64)),
        })

    out = pairs.map_batches(part, batch_format="pyarrow") \
        .union(doc_boxes(sf_dir).map_batches(zero, batch_format="pyarrow")) \
        .groupby("doc_id").aggregate(Sum("n_points",
                                         alias_name="n_points"))
    return out.sort("doc_id")


def points_outside_boxes(sf_dir: str, cell: int = 65536, n_parts: int = 64):
    """Spatial ANTI-join: every point contained in NO document box — the
    coverage-gap / out-of-region filter. Output (doc_id, span_idx,
    lat1e4, lng1e4), key-ascending.

    Shape: matched point keys contract per block (np.unique) before ONE
    groupby that unions them with the full point list and keeps
    max(flag) = 0 — a distributed anti-join with no broadcast and no
    join operator (the same union-groupby trick the bloom anti joins
    fall back to). Coordinates are re-derived from the key by the
    generator (pure int64 function), so only (key, flag) ever
    shuffles."""
    from ray.data.aggregate import Max

    pairs = points_in_doc_boxes(sf_dir, cell=cell, n_parts=n_parts)

    def matched(b: pa.Table) -> pa.Table:
        k = np.unique(b["pt_doc"].to_numpy(zero_copy_only=False) * 4
                      + b["pt_span"].to_numpy(zero_copy_only=False))
        return pa.table({
            "key": pa.array(k, type=pa.int64()),
            "hit": pa.array(np.ones(len(k), dtype=np.int64)),
        })

    def allpts(b: pa.Table) -> pa.Table:
        k = (b["doc_id"].to_numpy(zero_copy_only=False) * 4
             + b["span_idx"].to_numpy(zero_copy_only=False))
        return pa.table({
            "key": pa.array(k, type=pa.int64()),
            "hit": pa.array(np.zeros(len(k), dtype=np.int64)),
        })

    agg = pairs.map_batches(matched, batch_format="pyarrow") \
        .union(geo_points_int(sf_dir).map_batches(
            allpts, batch_format="pyarrow")) \
        .groupby("key").aggregate(Max("hit", alias_name="hit"))

    def finish(b: pa.Table) -> pa.Table:
        k = b["key"].to_numpy(zero_copy_only=False)
        k = k[b["hit"].to_numpy(zero_copy_only=False) == 0]
        doc, span = k // 4, k % 4
        lat, lng = geo_points_int_for(doc, span - 1)
        return pa.table({
            "doc_id": pa.array(doc, type=pa.int64()),
            "span_idx": pa.array(span, type=pa.int64()),
            "lat1e4": pa.array(lat, type=pa.int64()),
            "lng1e4": pa.array(lng, type=pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow") \
        .sort(["doc_id", "span_idx"])


# hex 1-ring neighbor relation on the two-lattice tiling: (src_lattice,
# di, dj, dst_lattice) — 6 Voronoi neighbors per hex (A↔A along x at
# spacing W; A↔B at the four half-offset diagonals, distance
# sqrt((W/2)²+(H/2)²) = W for H = W·√3). SYMMETRIC by construction
# (each A→B row has its B→A inverse), so the same table serves both the
# gather (oracle) and scatter (engine) formulations.
_HEX_RING = (
    (0, 0, 0, 0), (1, 0, 0, 1),                      # self
    (0, -1, 0, 0), (0, 1, 0, 0),                     # A ↔ A
    (0, 0, 0, 1), (0, -1, 0, 1),                     # A → B
    (0, 0, -1, 1), (0, -1, -1, 1),
    (1, -1, 0, 1), (1, 1, 0, 1),                     # B ↔ B
    (1, 0, 0, 0), (1, 1, 0, 0),                      # B → A
    (1, 0, 1, 0), (1, 1, 1, 0),
)


def hexbin_kring_counts(sf_dir: str):
    """H3-style k-ring (k=1) smoothing over the hexagonal tiling: for
    every OCCUPIED hex, its own count plus the counts of its 6 Voronoi
    neighbors — the hex analogue of `tile_density_smooth`'s 3×3 box
    filter and the signature H3 neighborhood aggregation. Output
    (hexkey, n_points, kring_points), hexkey-ascending.

    Shape: runs entirely on the grid-bounded hex rollup (points touched
    once, in `hexbin_counts`' partial pass): each rollup row scatters to
    its ≤7 ring ids, one groupby-sum folds scatter + occupancy flags,
    halo rows (rings of occupied hexes that are themselves empty) drop
    on the occ flag. Out-of-range neighbor ids can alias only j-indices
    ≥ 27 or negative keys — never an occupiable hex (j ≤ 26 on this
    lattice), same arithmetic as the SQL twin."""
    from ray.data.aggregate import Max, Sum

    roll = hexbin_counts(sf_dir)

    def scatter(b: pa.Table) -> pa.Table:
        h = b["hexkey"].to_numpy(zero_copy_only=False)
        n = b["n_points"].to_numpy(zero_copy_only=False)
        lb = h & 1
        ij = h >> 1
        i, j = ij // HEX_NY, ij % HEX_NY
        outs = []
        for sb, di, dj, tb in _HEX_RING:
            m = lb == sb
            if not m.any():
                continue
            tgt = ((i[m] + di) * HEX_NY + (j[m] + dj)) * 2 + tb
            outs.append(pa.table({
                "hexkey": pa.array(tgt, type=pa.int64()),
                "kn": pa.array(n[m], type=pa.int64()),
                "n0": pa.array(np.zeros(int(m.sum()), dtype=np.int64)),
                "occ": pa.array(np.zeros(int(m.sum()), dtype=np.int64)),
            }))
        outs.append(pa.table({
            "hexkey": pa.array(h, type=pa.int64()),
            "kn": pa.array(np.zeros(len(h), dtype=np.int64)),
            "n0": pa.array(n, type=pa.int64()),
            "occ": pa.array(np.ones(len(h), dtype=np.int64)),
        }))
        return pa.concat_tables(outs)

    agg = roll.map_batches(scatter, batch_format="pyarrow") \
        .groupby("hexkey").aggregate(
            Sum("kn", alias_name="kring_points"),
            Sum("n0", alias_name="n_points"),
            Max("occ", alias_name="occ"))

    def finish(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["occ"], 1))
        return pa.table({
            "hexkey": t["hexkey"].cast(pa.int64()),
            "n_points": t["n_points"].cast(pa.int64()),
            "kring_points": t["kring_points"].cast(pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow").sort("hexkey")
