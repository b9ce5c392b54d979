"""Raster↔vector operators (`pipelines/raster.py`): numpy differential
tests (the distributed plan must equal a dense-grid oracle computed on
the driver), structural invariants (runs are maximal, regions are
4-connected and complete), and level/pyramid consistency."""

import numpy as np
import pyarrow.parquet as pq

from timezonemap_ray.sources.docgen import geo_points_int_for
from timezonemap_ray.pipelines.spatial import LAT_OFF, LNG_OFF, WORLD_X, \
    WORLD_Y, _interleave_bits
from timezonemap_ray.pipelines.raster import (box_coverage_raster,
                                              tile_pyramid_counts,
                                              tile_regions, tile_runs)


def _all_points(sf_dir):
    d = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id"])["doc_id"].to_numpy().astype(np.int64)
    reps = 1 + (d % 3)
    doc = np.repeat(d, reps)
    j = (np.arange(int(reps.sum()), dtype=np.int64)
         - np.repeat(np.cumsum(reps) - reps, reps))
    lat, lng = geo_points_int_for(doc, j)
    return doc, j + 1, lat, lng


def _tiles(sf_dir, level):
    _, _, lat, lng = _all_points(sf_dir)
    n = 1 << level
    ix = (lng + LNG_OFF) * n // WORLD_X
    iy = (lat + LAT_OFF) * n // WORLD_Y
    return ix, iy


def test_box_coverage_equals_brute_force(ray_session, sf_dir):
    d = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id"])["doc_id"].to_numpy().astype(np.int64)
    lat, lng = geo_points_int_for(d, np.zeros(len(d), np.int64))
    x0, y0 = lng + LNG_OFF, lat + LAT_OFF
    h = 1000 + (d * np.int64(48271) % np.int64(2147483647)) % np.int64(30001)
    cover = {}
    for i in range(len(d)):
        for ix in range(int((x0[i] - h[i]) * 256 // WORLD_X),
                        int((x0[i] + h[i]) * 256 // WORLD_X) + 1):
            for iy in range(int((y0[i] - h[i]) * 256 // WORLD_Y),
                            int((y0[i] + h[i]) * 256 // WORLD_Y) + 1):
                z = int(_interleave_bits(np.array([ix]), np.array([iy]), 8)[0])
                cover[z] = cover.get(z, 0) + 1
    got = box_coverage_raster(sf_dir).to_pandas()
    assert len(got) == len(cover)
    assert got["quadkey"].is_monotonic_increasing
    want = dict(cover)
    for z, c in zip(got["quadkey"], got["n_boxes"]):
        assert want.pop(int(z)) == int(c)
    assert not want


def test_tile_runs_equals_numpy_rle(ray_session, sf_dir):
    ix, iy = _tiles(sf_dir, 8)
    occ = sorted(set(zip(iy.tolist(), ix.tolist())))
    cnt = {}
    for a, b in zip(iy.tolist(), ix.tolist()):
        cnt[(a, b)] = cnt.get((a, b), 0) + 1
    runs = []
    for (ry, rx) in occ:
        if runs and runs[-1][0] == ry and runs[-1][2] == rx - 1:
            runs[-1][2] = rx
            runs[-1][3] += 1
            runs[-1][4] += cnt[(ry, rx)]
        else:
            runs.append([ry, rx, rx, 1, cnt[(ry, rx)]])
    got = tile_runs(sf_dir).to_pandas()
    assert got[["iy", "ix_start", "ix_end", "n_tiles", "n_points"]] \
        .values.tolist() == runs
    # maximality: no two runs in a row touch or overlap
    for r1, r2 in zip(runs, runs[1:]):
        if r1[0] == r2[0]:
            assert r2[1] > r1[2] + 1


def test_tile_regions_equals_bfs(ray_session, sf_dir):
    level = 11
    n = 1 << level
    ix, iy = _tiles(sf_dir, level)
    pts = {}
    for a, b in zip(ix.tolist(), iy.tolist()):
        pts[(a, b)] = pts.get((a, b), 0) + 1
    occ = set(pts)
    seen, regions = set(), []
    for start in sorted(occ, key=lambda t: t[0] * 2 * n + t[1]):
        if start in seen:
            continue
        comp, stack = [], [start]
        seen.add(start)
        while stack:
            t = stack.pop()
            comp.append(t)
            for nb in ((t[0] + 1, t[1]), (t[0] - 1, t[1]),
                       (t[0], t[1] + 1), (t[0], t[1] - 1)):
                if nb in occ and nb not in seen:
                    seen.add(nb)
                    stack.append(nb)
        keys = [a * 2 * n + b for a, b in comp]
        regions.append((min(keys), len(comp), sum(pts[t] for t in comp),
                        min(a for a, _ in comp), max(a for a, _ in comp),
                        min(b for _, b in comp), max(b for _, b in comp)))
    regions.sort()
    got = tile_regions(sf_dir).to_pandas()
    assert [tuple(r) for r in got.values.tolist()] == regions


def test_tile_pyramid_consistency(ray_session, sf_dir):
    got = tile_pyramid_counts(sf_dir).to_pandas()
    doc, _, _, _ = _all_points(sf_dir)
    levels = sorted(got["level"].unique())
    assert levels == [2, 4, 6, 8]
    for lv in levels:
        sub = got[got["level"] == lv]
        # mass conservation at every level
        assert sub["n_points"].sum() == len(doc)
        # direct computation at this level agrees
        ix, iy = _tiles(str(sf_dir) if not isinstance(sf_dir, str) else sf_dir,
                        int(lv))
        z = _interleave_bits(ix, iy, int(lv))
        uz, cnt = np.unique(z, return_counts=True)
        assert (sub["quadkey"].to_numpy() == uz).all()
        assert (sub["n_points"].to_numpy() == cnt).all()
    # parent/child rollup: level-6 tile count == sum of its level-8 kids
    kids = got[got["level"] == 8].copy()
    kids["parent"] = kids["quadkey"] // 16
    roll = kids.groupby("parent")["n_points"].sum()
    l6 = got[got["level"] == 6].set_index("quadkey")["n_points"]
    assert roll.sort_index().equals(l6.sort_index())
