"""Spatial tiling + proximity joins (`pipelines/spatial.py`): brute-force
differential tests (the distributed plan must equal the O(n²) oracle),
exactly-once invariants, and partition-count independence."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from timezonemap_ray.sources.docgen import geo_points_int_for
from timezonemap_ray.pipelines.spatial import (
    HEX_H, HEX_NY, HEX_W, LAT_OFF, LNG_OFF, _hex_assign, _interleave_bits,
    bbox_overlap_pairs, doc_boxes, geo_points_int, hexbin_counts,
    quadkey_counts, radius_pairs)


def _all_points(sf_dir):
    d = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id"])["doc_id"].to_numpy().astype(np.int64)
    reps = 1 + (d % 3)
    doc = np.repeat(d, reps)
    j = (np.arange(int(reps.sum()), dtype=np.int64)
         - np.repeat(np.cumsum(reps) - reps, reps))
    lat, lng = geo_points_int_for(doc, j)
    return doc, j + 1, lat, lng


def test_interleave_bits_roundtrip():
    rng = np.random.RandomState(7)
    ix = rng.randint(0, 256, 1000).astype(np.int64)
    iy = rng.randint(0, 256, 1000).astype(np.int64)
    z = _interleave_bits(ix, iy, 8)
    # de-interleave and compare
    rx = np.zeros_like(z)
    ry = np.zeros_like(z)
    for b in range(8):
        rx |= ((z >> (2 * b)) & 1) << b
        ry |= ((z >> (2 * b + 1)) & 1) << b
    assert (rx == ix).all() and (ry == iy).all()
    # prefix property: the parent tile at level 7 is z >> 2
    z7 = _interleave_bits(ix >> 1, iy >> 1, 7)
    assert (z7 == (z >> 2)).all()


def test_quadkey_counts_equals_numpy(ray_session, sf_dir):
    _, _, lat, lng = _all_points(sf_dir)
    ix = (lng + LNG_OFF) * 256 // 3_600_000
    iy = (lat + LAT_OFF) * 256 // 1_800_000
    z = _interleave_bits(ix, iy, 8)
    uz, inv, cnt = np.unique(z, return_inverse=True, return_counts=True)
    got = quadkey_counts(sf_dir).to_pandas()
    assert (got["quadkey"].to_numpy() == uz).all()
    assert (got["n_points"].to_numpy() == cnt).all()
    slat = np.zeros(len(uz), dtype=np.int64)
    np.add.at(slat, inv, lat)
    assert (got["sum_lat1e4"].to_numpy() == slat).all()


def test_hex_assign_is_true_nearest_center():
    """The closed-form floor-division assignment must equal the explicit
    nearest-center rule over BOTH candidate lattices (A at (W·i, H·j),
    B offset by (W/2, H/2)), ties to A — checked on a random grid plus
    adversarial points sitting exactly on cell edges/corners."""
    rng = np.random.RandomState(11)
    x = rng.randint(0, 3_600_001, 4000).astype(np.int64)
    y = rng.randint(0, 1_800_001, 4000).astype(np.int64)
    # boundary adversaries: exact centers, half-offsets, edge midpoints
    gx = np.arange(0, 3_600_001, HEX_W // 2, dtype=np.int64)
    gy = np.arange(0, 1_800_001, HEX_H // 2, dtype=np.int64)
    bx, by = np.meshgrid(gx[:40], gy[:40])
    x = np.concatenate([x, bx.ravel()])
    y = np.concatenate([y, by.ravel()])
    got = _hex_assign(x, y)
    # brute force: enumerate the 8 candidate centers (4 nearest per
    # lattice) around each point in doubled coordinates; the chosen
    # center must be at MINIMAL distance (ties are broken
    # deterministically by the closed form, so only assert identity
    # where the minimum is unique)
    dists, ids = [], []
    for off in (0, 1):  # 0 = lattice A, 1 = lattice B (half-offset)
        ci = (x - off * (HEX_W // 2)) // HEX_W
        cj = (y - off * (HEX_H // 2)) // HEX_H
        for di in (0, 1):
            for dj in (0, 1):
                i, j = ci + di, cj + dj
                cx = 2 * HEX_W * i + off * HEX_W
                cy = 2 * HEX_H * j + off * HEX_H
                dists.append((2 * x - cx) ** 2 + (2 * y - cy) ** 2)
                ids.append((i * HEX_NY + j) * 2 + off)
    dists = np.stack(dists)
    ids = np.stack(ids)
    chosen_d = np.where(ids == got[None, :], dists,
                        np.iinfo(np.int64).max).min(axis=0)
    min_d = dists.min(axis=0)
    assert (chosen_d == min_d).all(), "assignment is not nearest-center"
    unique_min = (dists == min_d[None, :]).sum(axis=0) == 1
    assert (got[unique_min]
            == ids[dists.argmin(axis=0), np.arange(len(x))][unique_min]).all()


def test_hexbin_counts_equals_numpy(ray_session, sf_dir):
    _, _, lat, lng = _all_points(sf_dir)
    hid = _hex_assign(lng + LNG_OFF, lat + LAT_OFF)
    uh, inv, cnt = np.unique(hid, return_inverse=True, return_counts=True)
    got = hexbin_counts(sf_dir).to_pandas()
    assert (got["hexkey"].to_numpy() == uh).all()
    assert (got["n_points"].to_numpy() == cnt).all()
    slat = np.zeros(len(uh), dtype=np.int64)
    slng = np.zeros(len(uh), dtype=np.int64)
    np.add.at(slat, inv, lat)
    np.add.at(slng, inv, lng)
    assert (got["sum_lat1e4"].to_numpy() == slat).all()
    assert (got["sum_lng1e4"].to_numpy() == slng).all()


def _brute_radius(sf_dir, eps):
    doc, span, lat, lng = _all_points(sf_dir)
    key = doc * 4 + span
    d2 = ((lat[:, None] - lat[None, :]) ** 2
          + (lng[:, None] - lng[None, :]) ** 2)
    a, b = np.nonzero((d2 <= eps * eps) & (key[:, None] < key[None, :]))
    return set(zip(key[a].tolist(), key[b].tolist(),
                   d2[a, b].tolist()))


@pytest.mark.parametrize("eps", [30000, 80000])
def test_radius_pairs_equals_brute_force(ray_session, sf_dir, eps):
    got = radius_pairs(sf_dir, eps1e4=eps).to_pandas()
    keys = list(zip((got.doc_a * 4 + got.span_a).tolist(),
                    (got.doc_b * 4 + got.span_b).tolist(),
                    got.d2.tolist()))
    assert len(set(keys)) == len(keys), "duplicate pairs emitted"
    assert set(keys) == _brute_radius(sf_dir, eps)


def test_radius_pairs_partition_invariant(ray_session, sf_dir):
    a = radius_pairs(sf_dir, n_parts=3).to_pandas() \
        .sort_values(["doc_a", "span_a", "doc_b", "span_b"]) \
        .reset_index(drop=True)
    b = radius_pairs(sf_dir, n_parts=64).to_pandas() \
        .sort_values(["doc_a", "span_a", "doc_b", "span_b"]) \
        .reset_index(drop=True)
    assert a.equals(b)


def test_bbox_overlap_equals_brute_force(ray_session, sf_dir):
    boxes = doc_boxes(sf_dir).to_pandas().sort_values("doc_id")
    d = boxes.doc_id.to_numpy()
    xlo, xhi = boxes.xlo.to_numpy(), boxes.xhi.to_numpy()
    ylo, yhi = boxes.ylo.to_numpy(), boxes.yhi.to_numpy()
    ov = ((xlo[:, None] <= xhi[None, :]) & (xlo[None, :] <= xhi[:, None])
          & (ylo[:, None] <= yhi[None, :]) & (ylo[None, :] <= yhi[:, None])
          & (d[:, None] < d[None, :]))
    a, b = np.nonzero(ov)
    want = set(zip(d[a].tolist(), d[b].tolist()))
    got = bbox_overlap_pairs(sf_dir).to_pandas()
    pairs = list(zip(got.doc_a.tolist(), got.doc_b.tolist()))
    assert len(set(pairs)) == len(pairs), "canonical-cell dedup failed"
    assert set(pairs) == want
    # overlap extents are the exact closed-interval intersections
    ia = np.searchsorted(d, got.doc_a.to_numpy())
    ib = np.searchsorted(d, got.doc_b.to_numpy())
    assert (got.ox.to_numpy() == np.minimum(xhi[ia], xhi[ib])
            - np.maximum(xlo[ia], xlo[ib])).all()
    assert (got.oy.to_numpy() == np.minimum(yhi[ia], yhi[ib])
            - np.maximum(ylo[ia], ylo[ib])).all()


def test_geo_points_int_matches_float_form(ray_session, sf_dir):
    """The int lattice is the exact quantization of the float points the
    flagship extracts (lat = lat1e4/1e4 bit-for-bit after the generator's
    own float ops round-trip through the same int)."""
    pts = geo_points_int(sf_dir).to_pandas()
    from timezonemap_ray.sources.docgen import geo_points_for
    lat_f, lng_f = geo_points_for(pts.doc_id.to_numpy(),
                                  0, hotspots=False)
    # recompute per-row with the row's own j (vectorized float twin)
    j = (pts.span_idx - 1).to_numpy()
    d = pts.doc_id.to_numpy().astype(np.int64)
    s = (d * np.int64(37) + j) * np.int64(2654435761) % np.int64(1000000007)
    s2 = (d * np.int64(37) + j) * np.int64(1779033703) % np.int64(999999937)
    assert ((s % 1300001 - 650000) == pts.lat1e4.to_numpy()).all()
    assert ((s2 % 3400001 - 1700000) == pts.lng1e4.to_numpy()).all()


def test_nearest_neighbor_within_equals_brute_force(ray_session, sf_dir):
    from timezonemap_ray.pipelines.spatial import nearest_neighbor_within
    doc, span, lat, lng = _all_points(sf_dir)
    key = doc * 4 + span
    eps = 80000
    d2 = ((lat[:, None] - lat[None, :]) ** 2
          + (lng[:, None] - lng[None, :]) ** 2)
    np.fill_diagonal(d2, np.iinfo(np.int64).max)
    want = {}
    for i in range(len(key)):
        j = np.lexsort((key, d2[i]))[0]
        if d2[i, j] <= eps * eps:
            want[int(key[i])] = (int(key[j]), int(d2[i, j]))
    got = nearest_neighbor_within(sf_dir, eps1e4=eps).to_pandas()
    got_map = {int(r.doc_id * 4 + r.span_idx):
               (int(r.nn_doc * 4 + r.nn_span), int(r.nn_d2))
               for r in got.itertuples()}
    assert got_map == want


def test_nearest_neighbor_partition_invariant(ray_session, sf_dir):
    from timezonemap_ray.pipelines.spatial import nearest_neighbor_within
    a = nearest_neighbor_within(sf_dir, n_parts=5).to_pandas() \
        .sort_values(["doc_id", "span_idx"]).reset_index(drop=True)
    b = nearest_neighbor_within(sf_dir, n_parts=64).to_pandas() \
        .sort_values(["doc_id", "span_idx"]).reset_index(drop=True)
    assert a.equals(b)


def test_tile_density_smooth_equals_numpy(ray_session, sf_dir):
    from timezonemap_ray.pipelines.spatial import tile_density_smooth
    _, _, lat, lng = _all_points(sf_dir)
    ix = (lng + LNG_OFF) * 256 // 3_600_000
    iy = (lat + LAT_OFF) * 256 // 1_800_000
    from collections import Counter
    cnt = Counter(zip(ix.tolist(), iy.tolist()))
    want = {}
    for (x, y), n in cnt.items():
        s = sum(cnt.get((x + dx, y + dy), 0)
                for dx in (-1, 0, 1) for dy in (-1, 0, 1))
        z = int(_interleave_bits(np.array([x]), np.array([y]), 8)[0])
        want[z] = (n, s)
    got = tile_density_smooth(sf_dir).to_pandas()
    got_map = {int(r.quadkey): (int(r.n_points), int(r.smooth_n))
               for r in got.itertuples()}
    assert got_map == want
    assert got.quadkey.is_monotonic_increasing


def test_points_in_doc_boxes_equals_brute_force(ray_session, sf_dir):
    from timezonemap_ray.pipelines.spatial import (
        doc_boxes, points_in_doc_boxes)
    doc, span, lat, lng = _all_points(sf_dir)
    x = lng + LNG_OFF
    y = lat + LAT_OFF
    boxes = doc_boxes(sf_dir).to_pandas()
    want = set()
    for r in boxes.itertuples():
        inside = ((r.xlo <= x) & (x <= r.xhi)
                  & (r.ylo <= y) & (y <= r.yhi))
        for i in np.flatnonzero(inside):
            want.add((int(r.doc_id), int(doc[i]), int(span[i])))
    got = points_in_doc_boxes(sf_dir).to_pandas()
    pairs = list(zip(got.box_doc.tolist(), got.pt_doc.tolist(),
                     got.pt_span.tolist()))
    assert len(set(pairs)) == len(pairs), "pair emitted twice"
    assert set(pairs) == want


def _brute_segment_box(sf_dir):
    """O(segments × boxes) separating-axis oracle."""
    d = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id"])["doc_id"].to_numpy().astype(np.int64)
    nseg = d % 3
    doc = np.repeat(d, nseg)
    j = (np.arange(int(nseg.sum()), dtype=np.int64)
         - np.repeat(np.cumsum(nseg) - nseg, nseg))
    lat1, lng1 = geo_points_int_for(doc, j)
    lat2, lng2 = geo_points_int_for(doc, j + 1)
    x1, y1 = lng1 + LNG_OFF, lat1 + LAT_OFF
    x2, y2 = lng2 + LNG_OFF, lat2 + LAT_OFF
    lat0, lng0 = geo_points_int_for(d, np.zeros(len(d), np.int64))
    bx0, by0 = lng0 + LNG_OFF, lat0 + LAT_OFF
    h = 1000 + (d * np.int64(48271) % np.int64(2147483647)) % np.int64(30001)
    xlo, xhi, ylo, yhi = bx0 - h, bx0 + h, by0 - h, by0 + h
    hits = set()
    for s in range(len(doc)):
        dx, dy = x2[s] - x1[s], y2[s] - y1[s]
        bb = (np.minimum(x1[s], x2[s]) <= xhi) & \
             (np.maximum(x1[s], x2[s]) >= xlo) & \
             (np.minimum(y1[s], y2[s]) <= yhi) & \
             (np.maximum(y1[s], y2[s]) >= ylo)
        cs = [dx * (cy - y1[s]) - dy * (cx - x1[s])
              for cx, cy in ((xlo, ylo), (xlo, yhi), (xhi, ylo), (xhi, yhi))]
        cmin = np.minimum.reduce(cs)
        cmax = np.maximum.reduce(cs)
        for b in np.flatnonzero(bb & (cmin <= 0) & (cmax >= 0)):
            hits.add((int(doc[s]), int(j[s] + 1), int(d[b])))
    return hits


def test_segment_box_hits_equals_brute_force(ray_session, sf_dir):
    from timezonemap_ray.pipelines.spatial import segment_box_hits
    got = segment_box_hits(sf_dir).to_pandas()
    have = set(map(tuple, got[["seg_doc", "seg_j", "box_doc"]]
                   .values.tolist()))
    assert len(have) == len(got)  # distinct triples, no dup rows
    assert have == _brute_segment_box(sf_dir)


def test_segment_supercover_is_complete(ray_session):
    """Property: every cell containing a segment point is emitted by the
    column-walk replication (so no qualifying pair can be missed)."""
    from timezonemap_ray.pipelines.spatial import doc_segments  # noqa: F401
    rng = np.random.RandomState(11)
    cellw = np.int64(225000)
    for _ in range(200):
        x1, x2 = np.sort(rng.randint(0, 3_400_000, 2).astype(np.int64))
        y1, y2 = rng.randint(0, 1_580_000, 2).astype(np.int64)
        # engine's per-column row range
        cols = {}
        for colv in range(int(x1 // cellw), int(x2 // cellw) + 1):
            dx, dy = x2 - x1, y2 - y1
            if dx == 0:
                lo, hi = min(y1, y2) // cellw, max(y1, y2) // cellw
            else:
                lox = max(x1, colv * cellw)
                hix = min(x2, (colv + 1) * cellw)
                ia = (y1 * dx + (lox - x1) * dy) // (cellw * dx)
                ib = (y1 * dx + (hix - x1) * dy) // (cellw * dx)
                lo, hi = min(ia, ib), max(ia, ib)
            cols[colv] = (int(lo), int(hi))
        # dense sampling of the segment (parameter sweep) must stay inside
        for t in np.linspace(0, 1, 2000):
            px = x1 + (x2 - x1) * t
            py = y1 + (y2 - y1) * t
            cx, cy = int(px // cellw), int(py // cellw)
            assert cx in cols
            lo, hi = cols[cx]
            assert lo <= cy <= hi, (x1, y1, x2, y2, cx, cy, lo, hi)


def test_knn_within_equals_brute_force(ray_session, sf_dir):
    from timezonemap_ray.pipelines.spatial import knn_within
    doc, span, lat, lng = _all_points(sf_dir)
    key = doc * 4 + span
    eps, k = 80000, 3
    d2 = ((lat[:, None] - lat[None, :]) ** 2
          + (lng[:, None] - lng[None, :]) ** 2)
    np.fill_diagonal(d2, np.iinfo(np.int64).max)
    want = set()
    for i in range(len(key)):
        order = np.lexsort((key, d2[i]))
        rank = 0
        for j in order[:k]:
            if d2[i, j] > eps * eps:
                break
            rank += 1
            want.add((int(key[i]), rank, int(key[j]), int(d2[i, j])))
    got = knn_within(sf_dir, eps1e4=eps, k=k).to_pandas()
    got_set = {(int(r.doc_id * 4 + r.span_idx), int(r.rank),
                int(r.nn_doc * 4 + r.nn_span), int(r.nn_d2))
               for r in got.itertuples()}
    assert got_set == want


def test_knn_within_partition_invariant(ray_session, sf_dir):
    from timezonemap_ray.pipelines.spatial import knn_within
    cols = ["doc_id", "span_idx", "rank"]
    a = knn_within(sf_dir, n_parts=5).to_pandas() \
        .sort_values(cols).reset_index(drop=True)
    b = knn_within(sf_dir, n_parts=64).to_pandas() \
        .sort_values(cols).reset_index(drop=True)
    assert a.equals(b)


def test_knn_within_k1_matches_argmin_join(ray_session, sf_dir):
    """k=1 kNN must equal the dedicated argmin nearest-neighbor join."""
    from timezonemap_ray.pipelines.spatial import (knn_within,
                                                   nearest_neighbor_within)
    a = knn_within(sf_dir, k=1).to_pandas() \
        .drop(columns=["rank"]) \
        .sort_values(["doc_id", "span_idx"]).reset_index(drop=True)
    b = nearest_neighbor_within(sf_dir).to_pandas() \
        .sort_values(["doc_id", "span_idx"]).reset_index(drop=True)
    assert a.equals(b[a.columns.tolist()])


# ---------------------------------------------------------------------------
# DBSCAN
# ---------------------------------------------------------------------------

def _brute_dbscan(sf_dir, eps, min_pts):
    """Reference DBSCAN: O(n²) eps-graph + union-find over core-core
    edges, border -> min core-neighbor label, noise -> -1."""
    doc, span, lat, lng = _all_points(sf_dir)
    key = doc * 4 + span
    n = len(key)
    d2 = ((lat[:, None] - lat[None, :]) ** 2
          + (lng[:, None] - lng[None, :]) ** 2)
    adj = (d2 <= eps * eps)
    np.fill_diagonal(adj, False)
    core = adj.sum(axis=1) + 1 >= min_pts
    parent = {int(k): int(k) for k in key}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ci = np.nonzero(core)[0]
    for a in ci:
        for b in np.nonzero(adj[a])[0]:
            if core[b]:
                ra, rb = find(int(key[a])), find(int(key[b]))
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    label = {}
    for a in ci:
        label[int(key[a])] = find(int(key[a]))
    out = {}
    for u in range(n):
        k = int(key[u])
        if core[u]:
            out[k] = (label[k], 1)
        else:
            cn = [label[int(key[v])] for v in np.nonzero(adj[u])[0]
                  if core[v]]
            out[k] = (min(cn) if cn else -1, 0)
    return out


def test_dbscan_equals_brute_force(ray_session, sf_dir):
    from timezonemap_ray.pipelines.spatial import dbscan_labels
    eps, mp = 50000, 4
    got = dbscan_labels(sf_dir, eps1e4=eps, min_pts=mp).to_pandas()
    want = _brute_dbscan(sf_dir, eps, mp)
    assert len(got) == len(want)
    for _, r in got.iterrows():
        k = int(r.doc_id) * 4 + int(r.span_idx)
        assert (int(r.cluster), int(r.is_core)) == want[k], k
    # sanity: the parameter choice exercises all three point classes
    assert (got.is_core == 1).any()
    assert ((got.cluster >= 0) & (got.is_core == 0)).any(), "no border"
    assert (got.cluster == -1).any(), "no noise"


def test_dbscan_plans_are_identical(ray_session, sf_dir):
    """Broadcast+driver-UF (default), forced distributed components
    (driver_pair_limit=0) and forced join-plan core filtering
    (core_broadcast_limit=0) must emit bit-identical labelings."""
    from timezonemap_ray.pipelines.spatial import dbscan_labels
    base = dbscan_labels(sf_dir).to_pandas()
    dist = dbscan_labels(sf_dir, driver_pair_limit=0).to_pandas()
    joined = dbscan_labels(sf_dir, core_broadcast_limit=0,
                           driver_pair_limit=0).to_pandas()
    assert base.equals(dist)
    assert base.equals(joined)


@pytest.mark.parametrize("mp", [2, 30])
def test_dbscan_degenerate_params(ray_session, sf_dir, mp):
    """min_pts=2 -> every paired point is core (no border class);
    min_pts far above any degree -> everything is noise."""
    from timezonemap_ray.pipelines.spatial import dbscan_labels
    got = dbscan_labels(sf_dir, eps1e4=30000, min_pts=mp).to_pandas()
    want = _brute_dbscan(sf_dir, 30000, mp)
    for _, r in got.iterrows():
        k = int(r.doc_id) * 4 + int(r.span_idx)
        assert (int(r.cluster), int(r.is_core)) == want[k], k
    if mp == 30:
        assert (got.cluster == -1).all() and (got.is_core == 0).all()


# ---------------------------------------------------------------------------
# route crossings
# ---------------------------------------------------------------------------

def _segments(sf_dir):
    import pyarrow.parquet as _pq
    d = _pq.read_table(f"{sf_dir}/documents.parquet",
                       columns=["doc_id"])["doc_id"].to_numpy() \
        .astype(np.int64)
    nseg = d % 3
    doc = np.repeat(d, nseg)
    tot = int(nseg.sum())
    j = (np.arange(tot, dtype=np.int64)
         - np.repeat(np.cumsum(nseg) - nseg, nseg))
    lat1, lng1 = geo_points_int_for(doc, j)
    lat2, lng2 = geo_points_int_for(doc, j + 1)
    return (doc, j + 1, lng1 + LNG_OFF, lat1 + LAT_OFF,
            lng2 + LNG_OFF, lat2 + LAT_OFF)


def _seg_intersect(a, b):
    """Exact closed segment intersection + proper flag (python ints)."""
    (ax1, ay1, ax2, ay2), (bx1, by1, bx2, by2) = a, b

    def orient(ox, oy, px, py, qx, qy):
        return (px - ox) * (qy - oy) - (py - oy) * (qx - ox)

    d1 = orient(bx1, by1, bx2, by2, ax1, ay1)
    d2 = orient(bx1, by1, bx2, by2, ax2, ay2)
    d3 = orient(ax1, ay1, ax2, ay2, bx1, by1)
    d4 = orient(ax1, ay1, ax2, ay2, bx2, by2)
    proper = (((d1 > 0) != (d2 > 0)) and d1 != 0 and d2 != 0
              and ((d3 > 0) != (d4 > 0)) and d3 != 0 and d4 != 0)

    def on(qx, qy, px1, py1, px2, py2):
        return (min(px1, px2) <= qx <= max(px1, px2)
                and min(py1, py2) <= qy <= max(py1, py2))

    touch = ((d1 == 0 and on(ax1, ay1, bx1, by1, bx2, by2))
             or (d2 == 0 and on(ax2, ay2, bx1, by1, bx2, by2))
             or (d3 == 0 and on(bx1, by1, ax1, ay1, ax2, ay2))
             or (d4 == 0 and on(bx2, by2, ax1, ay1, ax2, ay2)))
    return (proper or touch), proper


def test_route_crossings_equals_brute_force(ray_session, sf_dir):
    from timezonemap_ray.pipelines.spatial import route_crossings
    doc, j, x1, y1, x2, y2 = _segments(sf_dir)
    key = doc * 4 + j
    n = len(key)
    want = {}
    for a in range(n):
        for b in range(a + 1, n):
            if doc[a] == doc[b]:
                continue
            hit, proper = _seg_intersect(
                (int(x1[a]), int(y1[a]), int(x2[a]), int(y2[a])),
                (int(x1[b]), int(y1[b]), int(x2[b]), int(y2[b])))
            if hit:
                lo, hi = sorted((int(key[a]), int(key[b])))
                want[(lo, hi)] = int(proper)
    got = route_crossings(sf_dir).to_pandas()
    gk = list(zip((got.doc_a * 4 + got.j_a).tolist(),
                  (got.doc_b * 4 + got.j_b).tolist()))
    assert len(set(gk)) == len(gk), "duplicate pairs emitted"
    assert dict(zip(gk, got.proper.tolist())) == want
    assert (got.proper == 1).any()
    # exact touches are measure-zero on the pseudo-random lattice
    # (none occur at any sf) — the touch/collinear branches are covered
    # by test_segments_intersect_touch_cases on handcrafted inputs


def test_segments_intersect_touch_cases():
    """The vectorized predicate vs the scalar reference on handcrafted
    proper / endpoint-touch / T-junction / collinear-overlap /
    collinear-disjoint / parallel / disjoint cases (the lattice data
    never produces exact touches, so these branches need direct
    coverage)."""
    from timezonemap_ray.pipelines.spatial import _segments_intersect
    cases = [
        # (a, b, want_hit, want_proper)
        ((0, 0, 10, 10), (0, 10, 10, 0), True, True),     # X crossing
        ((0, 0, 10, 0), (10, 0, 20, 5), True, False),     # endpoint touch
        ((0, 0, 10, 0), (5, 0, 5, 7), True, False),       # T-junction
        ((0, 0, 10, 0), (5, 0, 15, 0), True, False),      # collinear lap
        ((0, 0, 10, 0), (11, 0, 20, 0), False, False),    # collinear gap
        ((0, 0, 10, 0), (0, 1, 10, 1), False, False),     # parallel
        ((0, 0, 10, 10), (20, 0, 30, 10), False, False),  # disjoint
        ((0, 0, 10, 0), (10, 0, 10, 0), True, False),     # degenerate pt
        ((0, 0, 0, 0), (0, 0, 5, 5), True, False),        # point on seg
        ((3, 3, 3, 3), (0, 0, 5, 5), True, False),        # interior pt
        ((4, 3, 4, 3), (0, 0, 5, 5), False, False),       # pt off seg
    ]
    for a, b, want_hit, want_proper in cases:
        for (s1, s2) in ((a, b), (b, a)):               # symmetric
            arrs = [np.array([v], dtype=np.int64)
                    for v in (*s1, *s2)]
            hit, proper = _segments_intersect(*arrs)
            assert bool(hit[0]) == want_hit, (s1, s2)
            assert bool(proper[0]) == want_proper, (s1, s2)
            ref_hit, ref_proper = _seg_intersect(s1, s2)
            assert (bool(hit[0]), bool(proper[0])) == (ref_hit,
                                                       ref_proper)


def test_route_crossings_cell_invariant(ray_session, sf_dir):
    from timezonemap_ray.pipelines.spatial import route_crossings
    cols = ["doc_a", "j_a", "doc_b", "j_b", "proper"]
    a = route_crossings(sf_dir, cell=225000).to_pandas() \
        .sort_values(cols).reset_index(drop=True)
    b = route_crossings(sf_dir, cell=87000, n_parts=7).to_pandas() \
        .sort_values(cols).reset_index(drop=True)
    assert a.equals(b)


# ---------------------------------------------------------------------------
# map-matching snap
# ---------------------------------------------------------------------------

def test_ceil_sq_div_exact_on_adversarial_ratios():
    """_ceil_sq_div must equal python-int ceil(dot²/den) INCLUDING exact
    divisions and near-integer ratios (the float fast path's uncertain
    band), at the magnitude ceiling the snap join produces."""
    from timezonemap_ray.pipelines.spatial import _ceil_sq_div
    rng = np.random.RandomState(3)
    den = rng.randint(2, 1 << 45, 5000).astype(np.int64)
    # precondition of the clamped-interior branch: 0 < dot < den
    dot = (rng.random(5000) * (den - 1)).astype(np.int64) + 1
    # adversaries: exact squares (den | dot²), dot == den-1, and ratios
    # engineered within 2^-20 of an integer — all under dot < den
    dot = np.concatenate([dot, np.array([7, (1 << 44) - 1, 1],
                                        dtype=np.int64)])
    den = np.concatenate([den, np.array([49, 1 << 44, 2],
                                        dtype=np.int64)])
    k = rng.randint(1 << 11, 1 << 20, 200).astype(np.int64)
    dot = np.concatenate([dot, k * 1024])
    den = np.concatenate([den, k * k])  # dot²/den = 1024² exactly, dot<den
    got = _ceil_sq_div(dot, den)
    want = np.array([-((-int(a) * int(a)) // int(b))
                     for a, b in zip(dot, den)], dtype=np.int64)
    assert (got == want).all()


def _brute_snap(sf_dir, r):
    doc, span, lat, lng = _all_points(sf_dir)
    px, py = lng + LNG_OFF, lat + LAT_OFF
    pkey = doc * 4 + span
    sdoc, sj, sx1, sy1, sx2, sy2 = _segments(sf_dir)
    skey = sdoc * 4 + sj
    want = {}
    for i in range(len(px)):
        best = None
        for s in range(len(sx1)):
            if doc[i] == sdoc[s]:
                continue
            wx, wy = int(px[i] - sx1[s]), int(py[i] - sy1[s])
            vx, vy = int(sx2[s] - sx1[s]), int(sy2[s] - sy1[s])
            den = vx * vx + vy * vy
            dot = wx * vx + wy * vy
            if den == 0 or dot <= 0:
                d2q = wx * wx + wy * wy
            elif dot >= den:
                d2q = (int(px[i] - sx2[s]) ** 2
                       + int(py[i] - sy2[s]) ** 2)
            else:
                d2q = wx * wx + wy * wy - (-((-dot * dot) // den))
            if d2q <= r * r:
                cand = (d2q, int(skey[s]))
                if best is None or cand < best:
                    best = cand
        if best is not None:
            want[int(pkey[i])] = best
    return want


def test_snap_segment_equals_brute_force(ray_session, sf_dir):
    from timezonemap_ray.pipelines.spatial import points_snap_segment
    got = points_snap_segment(sf_dir).to_pandas()
    want = _brute_snap(sf_dir, 1000)
    gk = dict(zip((got.doc_id * 4 + got.span_idx).astype(int),
                  zip(got.snap_d2q.astype(int),
                      (got.seg_doc * 4 + got.seg_j).astype(int))))
    assert gk == want
    assert 0 < len(gk) < 999, "radius should match SOME but not all"


def test_snap_segment_partition_and_cell_invariant(ray_session, sf_dir):
    from timezonemap_ray.pipelines.spatial import points_snap_segment
    cols = ["doc_id", "span_idx"]
    a = points_snap_segment(sf_dir).to_pandas() \
        .sort_values(cols).reset_index(drop=True)
    b = points_snap_segment(sf_dir, cell=80000, n_parts=5).to_pandas() \
        .sort_values(cols).reset_index(drop=True)
    assert a.equals(b)


# ---------------------------------------------------------------------------
# spatial left-aggregate + anti-join
# ---------------------------------------------------------------------------

def test_box_point_counts_and_outside_equals_brute(ray_session, sf_dir):
    from timezonemap_ray.pipelines.spatial import (box_point_counts,
                                                   points_outside_boxes)
    boxes = doc_boxes(sf_dir).to_pandas()
    doc, span, lat, lng = _all_points(sf_dir)
    x, y = lng + LNG_OFF, lat + LAT_OFF
    inside = ((boxes.xlo.to_numpy()[:, None] <= x[None, :])
              & (x[None, :] <= boxes.xhi.to_numpy()[:, None])
              & (boxes.ylo.to_numpy()[:, None] <= y[None, :])
              & (y[None, :] <= boxes.yhi.to_numpy()[:, None]))
    got = box_point_counts(sf_dir).to_pandas()
    assert (got.doc_id.to_numpy()
            == np.sort(boxes.doc_id.to_numpy())).all()
    order = np.argsort(boxes.doc_id.to_numpy())
    assert (got.n_points.to_numpy() == inside.sum(axis=1)[order]).all()
    # every box is centered on its own doc's first geo point, so empty
    # boxes cannot occur on this data — the zero-fill union still runs
    # for every box (each contributes a +0 row to the aggregate); its
    # arithmetic is covered by the exact equality above
    assert (got.n_points >= 1).all()
    out = points_outside_boxes(sf_dir).to_pandas()
    want_out = ~inside.any(axis=0)
    key = doc * 4 + span
    assert set((out.doc_id * 4 + out.span_idx).tolist()) \
        == set(key[want_out].tolist())
    # coordinates re-derived from the key must match the generator
    assert (out.lat1e4.to_numpy()
            == lat[np.searchsorted(key, (out.doc_id * 4
                                         + out.span_idx).to_numpy())]).all()


def test_minlabel_components_equals_union_find():
    """The vectorized driver closure must equal UnionFind's min-root
    labeling on random graphs, including long paths (pointer-doubling
    convergence) and singletons."""
    from timezonemap_ray.pipelines.spatial import _minlabel_components
    from timezonemap_ray.stages.dedup import UnionFind
    rng = np.random.RandomState(5)
    for trial in range(20):
        n = rng.randint(2, 400)
        ids = np.unique(rng.randint(0, 10_000, n).astype(np.int64))
        m = rng.randint(0, 3 * len(ids))
        ea = ids[rng.randint(0, len(ids), m)]
        eb = ids[rng.randint(0, len(ids), m)]
        got = _minlabel_components(ids, ea, eb)
        uf = UnionFind()
        for a, b in zip(ea.tolist(), eb.tolist()):
            uf.union(a, b)
        want = np.array([uf.find(int(k)) for k in ids], dtype=np.int64)
        assert (got == want).all()
    # adversarial: one long path (diameter = n-1) in DESCENDING id order
    ids = np.arange(1000, dtype=np.int64)
    ea = np.arange(999, 0, -1, dtype=np.int64)
    eb = ea - 1
    got = _minlabel_components(ids, ea, eb)
    assert (got == 0).all()


def test_hexbin_kring_equals_numpy(ray_session, sf_dir):
    from timezonemap_ray.pipelines.spatial import (_HEX_RING,
                                                   hexbin_kring_counts)
    _, _, lat, lng = _all_points(sf_dir)
    hid = _hex_assign(lng + LNG_OFF, lat + LAT_OFF)
    uh, cnt = np.unique(hid, return_counts=True)
    counts = dict(zip(uh.tolist(), cnt.tolist()))
    want = {}
    for h, n in counts.items():
        b, ij = h & 1, h >> 1
        i, j = ij // HEX_NY, ij % HEX_NY
        s = 0
        for sb, di, dj, tb in _HEX_RING:
            if sb != b:
                continue
            s += counts.get(((i + di) * HEX_NY + (j + dj)) * 2 + tb, 0)
        want[h] = (n, s)
    got = hexbin_kring_counts(sf_dir).to_pandas()
    assert dict(zip(got.hexkey.tolist(),
                    zip(got.n_points.tolist(),
                        got.kring_points.tolist()))) == want
    # the ring adds neighbors somewhere (not all hexes are isolated)
    assert (got.kring_points > got.n_points).any()


def test_hex_ring_relation_is_true_voronoi_adjacency():
    """_HEX_RING must be exactly {self} + the 6 nearest center offsets
    (A↔A at distance W along x; A↔B at the four half-offset diagonals,
    also distance W for H = W·√3 — up to lattice rounding), symmetric,
    and closed under inversion."""
    from timezonemap_ray.pipelines.spatial import _HEX_RING
    rel = set(_HEX_RING)
    assert len(rel) == len(_HEX_RING) == 14
    # symmetry: every (sb, di, dj, tb) has its inverse edge
    for sb, di, dj, tb in rel:
        if sb == tb:
            assert (tb, -di, -dj, sb) in rel
        else:
            # A(i,j) -> B(i+di, j+dj) inverts to B(i',j') -> A(i'-di, ...)
            assert (tb, -di, -dj, sb) in rel
    # geometric check: each non-self target is among the 6 nearest
    # centers of its source (doubled coordinates, W=40000 H=69282)
    W, H = 40000, 69282
    for sb, di, dj, tb in rel:
        sx = 0 + sb * W  # doubled source center at i=j=10 offset removed
        sy = 0 + sb * H
        tx = 2 * W * di + tb * W
        ty = 2 * H * dj + tb * H
        d2 = (tx - sx) ** 2 + (ty - sy) ** 2
        if (sb, di, dj, tb) in ((0, 0, 0, 0), (1, 0, 0, 1)):
            assert d2 == 0
        else:
            # all six neighbors sit at doubled distance 2W or
            # sqrt(W²+H²)·... : accept the two shell radii only
            shell = {(2 * W) ** 2, W * W + H * H}
            assert d2 in shell, (sb, di, dj, tb, d2)
