"""Raster↔vector operators over the integer-lattice tile grid.

The reference's spatial surface is vector-only (polygon PIP,
`TimeZoneMap.kt` getOverlappingTimeZones); the north rule's engine also
needs the RASTER side of a web-scale tiling pipeline — rasterize vector
footprints onto the tile grid, and vectorize rasters back into runs /
regions:

- ``box_coverage_raster``  — vector→raster: burn every per-doc bounding
  box (``spatial.doc_boxes``) onto the level-L tile grid and count, per
  tile, how many boxes overlap it (closed intervals) — the coverage /
  supply raster of an overlay pipeline.
- ``tile_runs``            — raster→vector, stage 1: run-length encode
  the occupied-tile raster — every maximal horizontal run of occupied
  tiles becomes one vector segment (the classic first step of raster
  polygonization).
- ``tile_regions``         — raster→vector, stage 2: 4-connected
  component labeling of the occupied-tile raster (at a finer level so
  occupancy stays subcritical); each region becomes one vector record
  with its bounding box and point mass — blob extraction.
- ``tile_pyramid_counts``  — the multi-resolution tile pyramid: per-tile
  point counts at a ladder of zoom levels, each coarser level derived
  from the finest rollup by pure quadkey arithmetic (z >> 2 per level),
  never re-reading the points.

All four run on the same exact int64 1e-4° lattice as
``pipelines/spatial`` (``sources/docgen.geo_points_int_for``), so every
count below is associative integer math with a bit-exact DuckDB twin
(`oracle.sql_box_coverage_raster` etc.), reproducible under any
partitioning.

Scale notes (100 TB): point rows are touched exactly once (the level-L
rollup); everything after operates on TILE tables, which are bounded by
the grid (≤ 4^L rows), not the data — per-block np.unique partials
shrink blocks before the one rollup shuffle, box rasterization fans out
≤ ceil(w/tile)+1 per axis (constant: boxes are ≤ 6.2e4 units wide), and
the connected-component fixpoint (`stages/dedup.clusters_from_pairs_ds`)
ships (tile, label) pairs only — O(log diameter) rounds of bounded
shuffles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .spatial import (LAT_OFF, LNG_OFF, WORLD_X, WORLD_Y, _interleave_bits,
                      doc_boxes, geo_points_int, tile_counts_xy)


def _expand_ranges(lo: np.ndarray, hi: np.ndarray):
    """Segmented expansion of int64 ranges: for each i emit lo[i]..hi[i]
    (inclusive).  Returns (row_index, value) — the vectorized twin of
    ``for i: for v in range(lo[i], hi[i]+1)``."""
    cnt = hi - lo + 1
    tot = int(cnt.sum())
    ri = np.repeat(np.arange(len(lo), dtype=np.int64), cnt)
    off = (np.arange(tot, dtype=np.int64)
           - np.repeat(np.cumsum(cnt) - cnt, cnt))
    return ri, lo[ri] + off


def box_coverage_raster(sf_dir: str, level: int = 8):
    """Vector→raster: per level-``level`` tile, the number of per-doc
    boxes (``spatial.doc_boxes``, closed intervals) overlapping it.
    Output (quadkey, n_boxes) int64 over tiles with ≥ 1 box,
    quadkey-ascending.

    Shape: each box covers the contiguous tile rectangle
    [xlo·n//WX .. xhi·n//WX] × [ylo·n//WY .. yhi·n//WY] (all coords are
    ≥ 0 in the shifted grid, so floor ≡ truncate on both engines); the
    fan-out is ≤ (⌈w/tile⌉+1)² ≈ 36 and collapses per block via
    np.unique before the single groupby-sum shuffle."""
    from ray.data.aggregate import Sum

    n = 1 << level

    def part(b: pa.Table) -> pa.Table:
        xlo = b["xlo"].to_numpy(zero_copy_only=False)
        xhi = b["xhi"].to_numpy(zero_copy_only=False)
        ylo = b["ylo"].to_numpy(zero_copy_only=False)
        yhi = b["yhi"].to_numpy(zero_copy_only=False)
        ixlo, ixhi = xlo * n // WORLD_X, xhi * n // WORLD_X
        iylo, iyhi = ylo * n // WORLD_Y, yhi * n // WORLD_Y
        # box → covered columns → covered (column, row) tiles
        bi, ix = _expand_ranges(ixlo, ixhi)
        ri, iy = _expand_ranges(iylo[bi], iyhi[bi])
        tk = ix[ri] * (2 * n) + iy
        ut, cnt = np.unique(tk, return_counts=True)
        return pa.table({
            "tkey": pa.array(ut, type=pa.int64()),
            "c": pa.array(cnt.astype(np.int64)),
        })

    agg = doc_boxes(sf_dir) \
        .map_batches(part, batch_format="pyarrow") \
        .groupby("tkey").aggregate(Sum("c", alias_name="n_boxes"))

    def to_quadkey(b: pa.Table) -> pa.Table:
        tk = b["tkey"].to_numpy(zero_copy_only=False)
        z = _interleave_bits(tk // (2 * n), tk % (2 * n), level)
        return pa.table({
            "quadkey": pa.array(z, type=pa.int64()),
            "n_boxes": b["n_boxes"].cast(pa.int64()),
        })

    return agg.map_batches(to_quadkey, batch_format="pyarrow") \
        .sort("quadkey")


def tile_runs(sf_dir: str, level: int = 8):
    """Raster→vector stage 1: run-length encode the occupied-tile raster
    (``spatial.tile_counts_xy`` point rollup).  Every maximal horizontal
    run of occupied tiles in a grid row becomes one vector segment:
    (iy, ix_start, ix_end, n_tiles, n_points), int64, (iy, ix_start)
    ascending.

    Shape: the rollup touches point rows once; runs are found inside one
    ``groupby(iy).map_groups`` over the grid-bounded tile table — sort
    the row's tiles by ix, break where the gap exceeds 1, segment-reduce
    counts.  Rows are the natural raster partitioning (≤ 2^level groups,
    ≤ 2^level tiles each)."""
    n = 1 << level
    tiles = tile_counts_xy(sf_dir, level)

    def add_iy(b: pa.Table) -> pa.Table:
        tk = b["tkey"].to_numpy(zero_copy_only=False)
        return b.append_column("iy", pa.array(tk % (2 * n), type=pa.int64()))

    empty = pa.table({c: pa.array([], type=pa.int64()) for c in
                      ("iy", "ix_start", "ix_end", "n_tiles", "n_points")})

    def runs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        tk = g["tkey"].to_numpy(zero_copy_only=False)
        cnt = g["n"].to_numpy(zero_copy_only=False)
        iy = tk % (2 * n)
        ix = tk // (2 * n)
        order = np.lexsort((ix, iy))
        ix, iy, cnt = ix[order], iy[order], cnt[order]
        # run starts: first tile, row change, or horizontal gap > 1
        start = np.ones(len(ix), dtype=bool)
        start[1:] = (iy[1:] != iy[:-1]) | (ix[1:] != ix[:-1] + 1)
        sid = np.cumsum(start) - 1
        n_runs = int(sid[-1]) + 1
        first = np.flatnonzero(start)
        last = np.concatenate([first[1:] - 1, [len(ix) - 1]])
        npts = np.zeros(n_runs, dtype=np.int64)
        np.add.at(npts, sid, cnt)
        return pa.table({
            "iy": pa.array(iy[first], type=pa.int64()),
            "ix_start": pa.array(ix[first], type=pa.int64()),
            "ix_end": pa.array(ix[last], type=pa.int64()),
            "n_tiles": pa.array(ix[last] - ix[first] + 1, type=pa.int64()),
            "n_points": pa.array(npts),
        })

    return tiles.map_batches(add_iy, batch_format="pyarrow") \
        .groupby("iy").map_groups(runs, batch_format="pyarrow") \
        .sort(["iy", "ix_start"])


def tile_regions(sf_dir: str, level: int = 11):
    """Raster→vector stage 2: 4-connected component labeling of the
    occupied-tile raster; one output record per region:
    (region_id, n_tiles, n_points, min_ix, max_ix, min_iy, max_iy),
    region_id = the smallest tile key in the region, region_id-ascending.

    ``level`` defaults FINER than the density rasters (2048² grid) so
    occupancy stays subcritical (no giant percolation component) at every
    test scale — the blob-extraction regime this op is for.

    Shape: points are touched once (the rollup); adjacency edges are
    emitted by probing each occupied tile's +x/+y neighbor against the
    sorted occupied-key set (grid-bounded, broadcast once via
    ``ray.put``); components run on the distributed min-label fixpoint
    (`stages/dedup.clusters_from_pairs_ds` — (tile, label) pairs only,
    pointer-shortcutted O(log diameter) rounds); region stats are one
    groupby over the labeled tile table."""
    import ray
    from ray.data.aggregate import Count, Max, Min, Sum

    from ..stages.dedup import clusters_from_pairs_ds

    n = 1 << level
    tiles = tile_counts_xy(sf_dir, level).materialize()

    # occupied key set: grid-bounded (≤ 4^level), broadcast once
    keys = []
    for b in tiles.iter_batches(batch_size=None, batch_format="pyarrow"):
        keys.append(b["tkey"].to_numpy(zero_copy_only=False))
    occ = np.sort(np.concatenate(keys)) if keys else np.array([], np.int64)
    occ_ref = ray.put(occ)

    def edges(b: pa.Table) -> pa.Table:
        ks = ray.get(occ_ref)
        tk = b["tkey"].to_numpy(zero_copy_only=False)
        if len(ks) == 0 or len(tk) == 0:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64())})
        outs_a, outs_b = [], []
        # +x neighbor: tkey + 2n (always same row); +y neighbor: tkey + 1
        # (valid only when iy + 1 < n — avoid wrapping into column ix+1)
        for nbr, ok in ((tk + 2 * n, np.ones(len(tk), dtype=bool)),
                        (tk + 1, tk % (2 * n) + 1 < n)):
            pos = np.searchsorted(ks, nbr)
            pos_c = np.minimum(pos, len(ks) - 1)
            hit = ok & (ks[pos_c] == nbr)
            outs_a.append(tk[hit])
            outs_b.append(nbr[hit])
        return pa.table({
            "a": pa.array(np.concatenate(outs_a), type=pa.int64()),
            "b": pa.array(np.concatenate(outs_b), type=pa.int64()),
        })

    pairs = tiles.map_batches(edges, batch_format="pyarrow")
    labels = clusters_from_pairs_ds(tiles, pairs, id_col="tkey")

    # labels table is grid-bounded too: broadcast and attach per block
    lab_k, lab_v = [], []
    for b in labels.iter_batches(batch_size=None, batch_format="pyarrow"):
        lab_k.append(b["tkey"].to_numpy(zero_copy_only=False))
        lab_v.append(b["cluster_id"].to_numpy(zero_copy_only=False))
    lk = np.concatenate(lab_k) if lab_k else np.array([], np.int64)
    lv = np.concatenate(lab_v) if lab_v else np.array([], np.int64)
    o = np.argsort(lk)
    lk_ref, lv_ref = ray.put(lk[o]), ray.put(lv[o])

    def attach(b: pa.Table) -> pa.Table:
        ks, vs = ray.get(lk_ref), ray.get(lv_ref)
        tk = b["tkey"].to_numpy(zero_copy_only=False)
        lab = tk.copy()  # isolated tiles label themselves
        if len(ks):
            pos = np.searchsorted(ks, tk)
            pos_c = np.minimum(pos, len(ks) - 1)
            hit = ks[pos_c] == tk
            lab[hit] = vs[pos_c[hit]]
        return pa.table({
            "region_id": pa.array(lab, type=pa.int64()),
            "ix": pa.array(tk // (2 * n), type=pa.int64()),
            "iy": pa.array(tk % (2 * n), type=pa.int64()),
            "n": b["n"].cast(pa.int64()),
        })

    out = tiles.map_batches(attach, batch_format="pyarrow") \
        .groupby("region_id").aggregate(
            Count(alias_name="n_tiles"),
            Sum("n", alias_name="n_points"),
            Min("ix", alias_name="min_ix"),
            Max("ix", alias_name="max_ix"),
            Min("iy", alias_name="min_iy"),
            Max("iy", alias_name="max_iy"))

    def fix_types(b: pa.Table) -> pa.Table:
        return pa.table({c: b[c].cast(pa.int64()) for c in
                         ("region_id", "n_tiles", "n_points",
                          "min_ix", "max_ix", "min_iy", "max_iy")})

    return out.map_batches(fix_types, batch_format="pyarrow") \
        .sort("region_id")


def tile_pyramid_counts(sf_dir: str, levels: tuple = (8, 6, 4, 2)):
    """Multi-resolution tile pyramid: (level, quadkey, n_points) for
    every zoom level in ``levels`` (finest first), (level, quadkey)
    ascending — the standard map-tile-serving layout pass.

    Shape: point rows are touched ONCE, at the finest level; every
    coarser level is derived from that tile table by quadkey arithmetic
    — dropping one zoom level is ``z >> 2`` exactly (Morton interleave:
    ix//2 and iy//2 drop the two low interleaved bits, and
    ⌊⌊x·2^L/W⌋/2⌋ = ⌊x·2^(L-1)/W⌋), so the pyramid costs one point
    shuffle plus per-level groupbys over grid-bounded tables."""
    from ray.data.aggregate import Sum

    finest = max(levels)

    def part(b: pa.Table) -> pa.Table:
        lat = b["lat1e4"].to_numpy(zero_copy_only=False)
        lng = b["lng1e4"].to_numpy(zero_copy_only=False)
        nf = 1 << finest
        ix = (lng + LNG_OFF) * nf // WORLD_X
        iy = (lat + LAT_OFF) * nf // WORLD_Y
        z = _interleave_bits(ix, iy, finest)
        uz, cnt = np.unique(z, return_counts=True)
        return pa.table({
            "quadkey": pa.array(uz, type=pa.int64()),
            "n": pa.array(cnt.astype(np.int64)),
        })

    base = geo_points_int(sf_dir) \
        .map_batches(part, batch_format="pyarrow") \
        .groupby("quadkey").aggregate(Sum("n", alias_name="n_points")) \
        .materialize()

    outs = []
    for lv in sorted(levels, reverse=True):
        shift = 2 * (finest - lv)

        def coarsen(b: pa.Table, shift=shift, lv=lv) -> pa.Table:
            z = b["quadkey"].to_numpy(zero_copy_only=False) >> shift
            cn = b["n_points"].to_numpy(zero_copy_only=False)
            uz, inv = np.unique(z, return_inverse=True)
            s = np.zeros(len(uz), dtype=np.int64)
            np.add.at(s, inv, cn)
            return pa.table({
                "level": pa.array(np.full(len(uz), lv, dtype=np.int64)),
                "quadkey": pa.array(uz, type=pa.int64()),
                "n": pa.array(s),
            })

        lvl = base.map_batches(coarsen, batch_format="pyarrow")
        if lv != finest:
            lvl = lvl.groupby(["level", "quadkey"]).aggregate(
                Sum("n", alias_name="n"))
        outs.append(lvl)

    ds = outs[0]
    for o in outs[1:]:
        ds = ds.union(o)

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({
            "level": b["level"].cast(pa.int64()),
            "quadkey": b["quadkey"].cast(pa.int64()),
            "n_points": b["n"].cast(pa.int64()),
        })

    return ds.map_batches(rename, batch_format="pyarrow") \
        .sort(["level", "quadkey"])
