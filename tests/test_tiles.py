"""Raster↔vector tiling: tile assignments match point lookups; box merge
reconstructs the raster exactly."""

import numpy as np
import pytest

from timezonemap_ray import cells, worlds
from timezonemap_ray.api import TimeZoneEngine
from timezonemap_ray.index import build_index, lookup_batch
from timezonemap_ray.pipelines import tiles


@pytest.fixture(scope="module")
def engine(ray_session):
    return TimeZoneEngine(build_index(worlds.conformance_table()))


def test_tile_assignments_match_point_lookup(engine):
    region = (30.0, -130.0, 50.0, -60.0)  # over the US stripe zones
    ds = tiles.tile_assignments(engine, region=region, cell_size=1.0)
    pdf = ds.to_pandas()
    res = lookup_batch(engine.index, pdf["lat"].to_numpy(),
                       pdf["lng"].to_numpy())
    assert pdf["zone_id"].astype("object").where(
        pdf["zone_id"].notna(), None).tolist() == res["zone_id"].tolist()
    assert pdf["matched"].all()


def test_distributed_merge_equals_inmemory(engine):
    """The distributed double gaps-and-islands (coarse iy / x-extent
    partitions, grid never on the driver) emits EXACTLY the in-memory
    merge's box rows."""
    region = (30.0, -130.0, 50.0, -60.0)
    cs = 1.0
    ds = tiles.tile_assignments(engine, region=region, cell_size=cs)
    dist = tiles.tiles_to_boxes_distributed(
        ds.select_columns(["cell_id", "zone_id"]), cs, n_parts=7) \
        .to_pandas().sort_values(
            ["zone_id", "min_lng", "min_lat"]).reset_index(drop=True)
    pdf = ds.to_pandas()
    zone_vals = pdf["zone_id"].astype("object").where(
        pdf["zone_id"].notna(), None)
    mem = tiles.tiles_to_boxes(pdf["cell_id"].to_numpy(), zone_vals.tolist(),
                               cs).to_pandas().sort_values(
        ["zone_id", "min_lng", "min_lat"]).reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(
        dist[sorted(dist.columns)], mem[sorted(mem.columns)],
        check_dtype=False)


def test_boxes_reconstruct_raster(engine):
    region = (30.0, -130.0, 50.0, -60.0)
    cs = 1.0
    pdf = tiles.tile_assignments(engine, region=region, cell_size=cs).to_pandas()
    zone_vals = pdf["zone_id"].astype("object").where(pdf["zone_id"].notna(),
                                                      None)
    boxes = tiles.tiles_to_boxes(pdf["cell_id"].to_numpy(),
                                 zone_vals.tolist(), cs).to_pandas()
    # box cell counts must sum to the raster cell count per zone
    per_zone_boxes = boxes.groupby("zone_id")["n_cells"].sum()
    per_zone_raster = zone_vals.value_counts()
    for z, n in per_zone_raster.items():
        assert per_zone_boxes[z] == n, z
    # boxes are disjoint per zone & rebuild the exact cell set
    _, n_lng = cells.grid_dims(cs)
    for z in per_zone_raster.index:
        want = {int(c) for c, zz in zip(pdf["cell_id"], zone_vals) if zz == z}
        got = set()
        for r in boxes[boxes["zone_id"] == z].itertuples():
            iy0 = round((r.min_lat + 90) / cs)
            iy1 = round((r.max_lat + 90) / cs)
            ix0 = round((r.min_lng + 180) / cs)
            ix1 = round((r.max_lng + 180) / cs)
            for iy in range(iy0, iy1):
                for ix in range(ix0, ix1):
                    cid = iy * n_lng + ix
                    assert cid not in got, "overlapping boxes"
                    got.add(cid)
        assert got == want, z
