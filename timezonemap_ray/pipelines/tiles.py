"""Raster ↔ vector tiling (north_rule component: "H3/S2 index,
point-in-polygon, kNN, raster↔vector").

- ``tile_assignments`` (vector → raster): every grid cell in a region gets
  the zone containing its center — the "per-cell tile assignment" the
  north_star references. Distributed as a synthetic cell-center point
  Dataset through the same broadcast PIP join as the flagship (so tile
  semantics match join semantics by construction).
- ``tiles_to_boxes`` (raster → vector): merge adjacent same-zone cells back
  into maximal axis-aligned boxes (greedy row-run + vertical merge) — the
  compact vector form of a raster zone map. Deterministic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import cells


def tile_centers(region: tuple, cell_size: float):
    """(cell_id, lat, lng) arrays for all cells whose center is in region."""
    min_lat, min_lng, max_lat, max_lng = region
    n_lat, n_lng = cells.grid_dims(cell_size)
    iy0 = max(0, int(np.floor((min_lat + 90.0) / cell_size)))
    iy1 = min(n_lat - 1, int(np.floor((max_lat + 90.0) / cell_size)))
    ix0 = max(0, int(np.floor((min_lng + 180.0) / cell_size)))
    ix1 = min(n_lng - 1, int(np.floor((max_lng + 180.0) / cell_size)))
    iys = np.arange(iy0, iy1 + 1, dtype=np.int64)
    ixs = np.arange(ix0, ix1 + 1, dtype=np.int64)
    iy_g, ix_g = np.meshgrid(iys, ixs, indexing="ij")
    cid = (iy_g * np.int64(n_lng) + ix_g).ravel()
    lat = (-90.0 + (iy_g.ravel() + 0.5) * cell_size)
    lng = (-180.0 + (ix_g.ravel() + 0.5) * cell_size)
    keep = ((lat >= min_lat) & (lat <= max_lat) &
            (lng >= min_lng) & (lng <= max_lng))
    return cid[keep], lat[keep], lng[keep]


def tile_assignments(engine, region: tuple | None = None,
                     cell_size: float = 1.0, batch_size: int = 65536):
    """Dataset of (cell_id, lat, lng, zone_id): the vector→raster pass."""
    import ray.data as rd
    region = region or engine.index.region
    cid, lat, lng = tile_centers(region, cell_size)
    tbl = pa.table({"cell_id": pa.array(cid, type=pa.int64()),
                    "lat": pa.array(lat), "lng": pa.array(lng)})
    ds = rd.from_arrow(tbl)
    n_blocks = max(1, min(64, len(cid) // 65536))
    if n_blocks > 1:
        ds = ds.repartition(n_blocks)
    return engine.lookup_points(ds, batch_size=batch_size)


def tiles_to_boxes(cell_ids: np.ndarray, zone_ids: list,
                   cell_size: float) -> pa.Table:
    """raster → vector: maximal boxes of same-zone cells.

    Greedy: per grid row, find horizontal runs of one zone; merge vertically
    adjacent runs with identical (x-extent, zone). Returns
    (zone_id, min_lat, min_lng, max_lat, max_lng, n_cells).
    """
    _, n_lng = cells.grid_dims(cell_size)
    by_zone: dict = {}
    for cid, z in zip(cell_ids, zone_ids):
        if z is None:
            continue
        iy, ix = divmod(int(cid), n_lng)
        by_zone.setdefault(z, set()).add((iy, ix))

    rows = []
    for z in sorted(by_zone):
        occupied = by_zone[z]
        # horizontal runs per row
        runs: dict = {}  # iy -> list[(ix0, ix1)]
        for iy in sorted({c[0] for c in occupied}):
            xs = sorted(ix for (y, ix) in occupied if y == iy)
            run_start = prev = xs[0]
            row_runs = []
            for x in xs[1:]:
                if x == prev + 1:
                    prev = x
                    continue
                row_runs.append((run_start, prev))
                run_start = prev = x
            row_runs.append((run_start, prev))
            runs[iy] = row_runs
        # vertical merge of identical runs
        open_boxes: dict = {}  # (ix0, ix1) -> (iy_start, iy_end)
        done = []
        for iy in sorted(runs):
            next_open = {}
            for r in runs[iy]:
                if r in open_boxes and open_boxes[r][1] == iy - 1:
                    next_open[r] = (open_boxes[r][0], iy)
                else:
                    next_open[r] = (iy, iy)
            for r, span in open_boxes.items():
                # close a box when its run is absent in this row OR restarts
                # after a row gap (same x-extent, non-consecutive iy — the
                # restarted box has a new iy_start)
                if next_open.get(r, (None,))[0] != span[0]:
                    done.append((r, span))
            open_boxes = next_open
        done.extend(open_boxes.items())
        for (ix0, ix1), (iy0, iy1) in sorted(done):
            rows.append({
                "zone_id": z,
                "min_lat": -90.0 + iy0 * cell_size,
                "min_lng": -180.0 + ix0 * cell_size,
                "max_lat": -90.0 + (iy1 + 1) * cell_size,
                "max_lng": -180.0 + (ix1 + 1) * cell_size,
                "n_cells": (ix1 - ix0 + 1) * (iy1 - iy0 + 1),
            })
    return pa.Table.from_pylist(rows) if rows else pa.table(
        {"zone_id": pa.array([], type=pa.string()),
         "min_lat": pa.array([], type=pa.float64()),
         "min_lng": pa.array([], type=pa.float64()),
         "max_lat": pa.array([], type=pa.float64()),
         "max_lng": pa.array([], type=pa.float64()),
         "n_cells": pa.array([], type=pa.int64())})


def _runs_block(t: pa.Table) -> pa.Table:
    """Horizontal gaps-and-islands over one coarse partition: the input
    holds EVERY cell of each (zone, iy) row it contains (partitioned by
    iy), so run extraction is local. Fully vectorized: one multi-key sort
    + one numpy break scan — no per-(zone,row) dispatch."""
    import pyarrow.compute as pc
    if "_part" in t.column_names:
        t = t.drop_columns(["_part"])
    if t.num_rows == 0:
        return pa.table({"zone_id": pa.array([], type=pa.string()),
                         "iy": pa.array([], type=pa.int64()),
                         "ix0": pa.array([], type=pa.int64()),
                         "ix1": pa.array([], type=pa.int64())})
    order = pc.sort_indices(t, sort_keys=[("zone_id", "ascending"),
                                          ("iy", "ascending"),
                                          ("ix", "ascending")])
    t = t.take(order)
    z = pc.dictionary_encode(t["zone_id"].combine_chunks()) \
        .indices.to_numpy(zero_copy_only=False).astype(np.int64)
    iy = t["iy"].to_numpy(zero_copy_only=False)
    ix = t["ix"].to_numpy(zero_copy_only=False)
    brk = np.empty(z.size, dtype=bool)
    brk[0] = True
    brk[1:] = (z[1:] != z[:-1]) | (iy[1:] != iy[:-1]) | (ix[1:] != ix[:-1] + 1)
    starts = np.flatnonzero(brk)
    ends = np.r_[starts[1:], z.size]
    return pa.table({
        "zone_id": t["zone_id"].take(pa.array(starts)),
        "iy": pa.array(iy[starts], type=pa.int64()),
        "ix0": pa.array(ix[starts], type=pa.int64()),
        "ix1": pa.array(ix[ends - 1], type=pa.int64()),
    })


def _vmerge_block(t: pa.Table, cell_size: float) -> pa.Table:
    """Vertical gaps-and-islands over one coarse partition: the input holds
    EVERY run of each (zone, ix0, ix1) x-extent it contains, so merging
    vertically adjacent identical runs is local. Same vectorized shape as
    ``_runs_block``; emits the final box rows."""
    import pyarrow.compute as pc
    if "_part" in t.column_names:
        t = t.drop_columns(["_part"])
    if t.num_rows == 0:
        return _EMPTY_BOXES
    order = pc.sort_indices(t, sort_keys=[("zone_id", "ascending"),
                                          ("ix0", "ascending"),
                                          ("ix1", "ascending"),
                                          ("iy", "ascending")])
    t = t.take(order)
    z = pc.dictionary_encode(t["zone_id"].combine_chunks()) \
        .indices.to_numpy(zero_copy_only=False).astype(np.int64)
    iy = t["iy"].to_numpy(zero_copy_only=False)
    ix0 = t["ix0"].to_numpy(zero_copy_only=False)
    ix1 = t["ix1"].to_numpy(zero_copy_only=False)
    brk = np.empty(z.size, dtype=bool)
    brk[0] = True
    brk[1:] = ((z[1:] != z[:-1]) | (ix0[1:] != ix0[:-1])
               | (ix1[1:] != ix1[:-1]) | (iy[1:] != iy[:-1] + 1))
    starts = np.flatnonzero(brk)
    ends = np.r_[starts[1:], z.size]
    iy0, iy1 = iy[starts], iy[ends - 1]
    bx0, bx1 = ix0[starts], ix1[starts]
    return pa.table({
        "zone_id": t["zone_id"].take(pa.array(starts)),
        "min_lat": pa.array(-90.0 + iy0 * cell_size),
        "min_lng": pa.array(-180.0 + bx0 * cell_size),
        "max_lat": pa.array(-90.0 + (iy1 + 1) * cell_size),
        "max_lng": pa.array(-180.0 + (bx1 + 1) * cell_size),
        "n_cells": pa.array((bx1 - bx0 + 1) * (iy1 - iy0 + 1),
                            type=pa.int64()),
    })


_EMPTY_BOXES = pa.table(
    {"zone_id": pa.array([], type=pa.string()),
     "min_lat": pa.array([], type=pa.float64()),
     "min_lng": pa.array([], type=pa.float64()),
     "max_lat": pa.array([], type=pa.float64()),
     "max_lng": pa.array([], type=pa.float64()),
     "n_cells": pa.array([], type=pa.int64())})


def tiles_to_boxes_distributed(tiles, cell_size: float, n_parts: int = 32):
    """Distributed raster→vector merge (VERDICT r2 #3): the grid NEVER
    lands on the driver. Double gaps-and-islands as two coarse-partition
    passes — horizontal runs inside iy-hash partitions (every (zone, iy)
    row is complete within its partition), then vertical merge inside
    (ix0, ix1)-hash partitions (every (zone, x-extent) column is complete
    within its partition). Both passes shuffle RUN rows, not cells, after
    the first projection; the driver only collects the final (small) box
    table. Output rows equal the in-memory ``tiles_to_boxes`` exactly
    (same oracle: sql_tiles_boxes)."""
    import pyarrow.compute as pc
    _, n_lng = cells.grid_dims(cell_size)

    def prep(b: pa.Table) -> pa.Table:
        keep = pc.and_kleene(pc.is_valid(b["zone_id"]),
                             pc.is_valid(b["cell_id"]))
        b = b.filter(pc.fill_null(keep, False))
        cid = b["cell_id"].to_numpy(zero_copy_only=False)
        iy = cid // n_lng
        return pa.table({
            "zone_id": pc.cast(b["zone_id"], pa.string()),
            "iy": pa.array(iy, type=pa.int64()),
            "ix": pa.array(cid % n_lng, type=pa.int64()),
            "_part": pa.array(iy % n_parts, type=pa.int64()),
        })

    runs = tiles.map_batches(prep, batch_format="pyarrow") \
        .groupby("_part").map_groups(_runs_block, batch_format="pyarrow")

    def part2(b: pa.Table) -> pa.Table:
        key = (b["ix0"].to_numpy(zero_copy_only=False) * np.int64(n_lng)
               + b["ix1"].to_numpy(zero_copy_only=False))
        return b.append_column(
            "_part", pa.array(key % n_parts, type=pa.int64()))

    boxes = runs.map_batches(part2, batch_format="pyarrow") \
        .groupby("_part").map_groups(
            lambda t: _vmerge_block(t, cell_size), batch_format="pyarrow")
    return boxes


def rasterize_then_vectorize(engine, region: tuple | None = None,
                             cell_size: float = 1.0) -> pa.Table:
    """Full raster→vector round: tile assignments → merged zone boxes.
    The merge runs distributed (``tiles_to_boxes_distributed``); only the
    final box table — |boxes| ≪ |cells| — is collected."""
    tiles = tile_assignments(engine, region=region, cell_size=cell_size)
    boxes = tiles_to_boxes_distributed(
        tiles.select_columns(["cell_id", "zone_id"]), cell_size)
    out = pa.Table.from_pandas(boxes.to_pandas(), preserve_index=False)
    if out.num_rows == 0:
        return _EMPTY_BOXES
    import pyarrow.compute as pc
    order = pc.sort_indices(out, sort_keys=[
        ("zone_id", "ascending"), ("min_lng", "ascending"),
        ("min_lat", "ascending")])
    return out.take(order)
