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


def rasterize_then_vectorize(engine, region: tuple | None = None,
                             cell_size: float = 1.0) -> pa.Table:
    """Full raster→vector round: tile assignments → merged zone boxes."""
    tiles = tile_assignments(engine, region=region, cell_size=cell_size)
    pdf = tiles.to_pandas()
    zone_vals = pdf["zone_id"].astype("object").where(pdf["zone_id"].notna(), None)
    return tiles_to_boxes(pdf["cell_id"].to_numpy(), zone_vals.tolist(),
                          cell_size)
