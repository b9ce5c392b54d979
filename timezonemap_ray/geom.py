"""Pure-numpy geometry kernels (no Ray).

Reimplements the geometric semantics of the reference's Esri-geometry usage
(`/root/reference/timezonemap/src/main/java/us/dustinj/timezonemap/Util.kt:12-25`,
`TimeZone.kt:41-47`, `TimeZoneMap.kt:84`) as vectorized float64 kernels over a
flattened polygon representation.

Polygon model
-------------
A polygon record is ``(xs, ys, ring_start)``:

- ``xs`` / ``ys``: float64 arrays of ring vertices, all rings concatenated.
  ``x`` is longitude, ``y`` is latitude (matching Esri ``Point(lng, lat)``,
  reference ``TimeZoneMap.kt:81``). Rings are NOT explicitly closed; the
  closing edge last→first is implied.
- ``ring_start``: int64 array of length ``n_rings + 1`` with ring offsets
  into ``xs``/``ys``.

Containment uses the even-odd rule, so ring order/orientation is irrelevant:
ring 0 outer, later rings holes, islands-in-holes, etc.
(reference fixture: ``UtilTest.java:17-58``). Containment is
boundary-inclusive, replicating ``Util.containsInclusive`` =
``contains || touches`` (``Util.kt:12-13``).

Coordinates are stored float32 upstream and widened to float64 before these
kernels run, replicating ``Serialization.kt:12`` + ``TimeZoneMap.kt:81``.
"""

from __future__ import annotations

import numpy as np

# Tolerance for "point exactly on boundary" in degrees. Reference boundary
# tests use coordinates representable exactly (or via float32 round-trip), so
# the cross/offset products are exactly 0; the epsilon only guards float64
# rounding in the widening path.
BOUNDARY_EPS = 1e-12

# WGS84 ellipsoid (same datum as Esri geodesicDistanceOnWGS84, TimeZone.kt:45)
WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WGS84_B = WGS84_A * (1.0 - WGS84_F)

# Max cells in a (points x edges) broadcast before chunking the edge axis.
_MAX_BROADCAST = 4_000_000
# Target elements per (point-chunk x edges) temporary in pip_edges: ~2 MB of
# float64 keeps the whole working set in L2/L3.
_CHUNK_ELEMS = 262_144


def as_f64(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, dtype=np.float64))


# ---------------------------------------------------------------------------
# Ring / polygon basics
# ---------------------------------------------------------------------------

def ring_edges(xs: np.ndarray, ys: np.ndarray, ring_start: np.ndarray):
    """Yield per-ring edge arrays ``(x1, y1, x2, y2)`` (implied closure)."""
    for r in range(len(ring_start) - 1):
        s, e = int(ring_start[r]), int(ring_start[r + 1])
        if e - s < 2:
            continue
        rx, ry = xs[s:e], ys[s:e]
        yield rx, ry, np.roll(rx, -1), np.roll(ry, -1)


def all_edges(xs: np.ndarray, ys: np.ndarray, ring_start: np.ndarray):
    """All edges of all rings concatenated: ``(x1, y1, x2, y2)`` arrays."""
    parts = list(ring_edges(xs, ys, ring_start))
    if not parts:
        z = np.empty(0, dtype=np.float64)
        return z, z, z, z
    x1 = np.concatenate([p[0] for p in parts])
    y1 = np.concatenate([p[1] for p in parts])
    x2 = np.concatenate([p[2] for p in parts])
    y2 = np.concatenate([p[3] for p in parts])
    return x1, y1, x2, y2


def ring_signed_area(rx: np.ndarray, ry: np.ndarray) -> float:
    """Shoelace signed area of one ring (degrees^2, CCW positive)."""
    x2, y2 = np.roll(rx, -1), np.roll(ry, -1)
    return float(0.5 * np.sum(rx * y2 - x2 * ry))


def polygon_area_deg2(xs: np.ndarray, ys: np.ndarray, ring_start: np.ndarray) -> float:
    """Even-odd planar area in degrees²: the area of the region
    ``points_in_polygon`` accepts — |outer| − |holes| + |islands| for
    nested simple rings, and the SIMPLIFIED (lobes-summed) area for
    self-intersecting rings, replicating Esri ``calculateArea2D()`` after
    ``OperatorSimplify`` (reference sort key ``TimeZoneMap.kt:217``, M3
    repair ``builder/Main.kt:44-60``).

    Fast path (the normal case — all rings simple): per-ring |shoelace|
    signed by nesting depth, O(E) + O(rings²·E). SELF-INTERSECTING input
    routes to the exact parity scanline (``_even_odd_area_scanline``) —
    the raw shoelace would cancel a bowtie's lobes to |A1 − A2| instead
    of |A1| + |A2|, and loop-decomposition + depth probing is unsound
    when split loops cross through shared vertices (both failure modes
    regression-tested).
    """
    n_rings = len(ring_start) - 1
    rings = []
    for r in range(n_rings):
        s, e = int(ring_start[r]), int(ring_start[r + 1])
        if e - s >= 3:
            rings.append((xs[s:e], ys[s:e]))
    # route to the exact scanline on ANY proper crossing — within one ring
    # OR between rings (round 4: the depth-signed fast path below assumes
    # non-crossing nesting; two mutually-crossing simple rings would cancel
    # instead of XOR-ing — regression-tested in test_simplify.py)
    from .geom_simplify import polygon_is_simple
    if not polygon_is_simple(xs, ys, ring_start):
        return _even_odd_area_scanline(xs, ys, ring_start)
    total = 0.0
    for i, (rx, ry) in enumerate(rings):
        depth = 0
        for j, (ox, oy) in enumerate(rings):
            if i == j:
                continue
            rs = np.array([0, len(ox)], dtype=np.int64)
            # ring depth is containment of ring i's BOUNDARY in ring j —
            # constant along the boundary since rings don't cross. Probe
            # with the first vertex of i that is NOT exactly on ring j
            # (rings may touch at shared pinch vertices after even-odd
            # normalization — round 4, test_simplify.py); if every vertex
            # of i lies on j (fully coincident touching), give up on the
            # fast path rather than guess parity.
            on_j = points_on_boundary(as_f64(rx), as_f64(ry),
                                      ox, oy, rs, eps=0.0)
            free = np.flatnonzero(~on_j)
            if free.size == 0:
                return _even_odd_area_scanline(xs, ys, ring_start)
            if not on_j.any():
                # disjoint boundaries: crossings through shared vertices
                # are impossible (and proper crossings / T-junctions were
                # already excluded by the gate), so depth is constant
                # along ring i — one probe suffices, keeping the fast
                # path O(E) per ring pair.
                k = int(free[0])
                if _even_odd_interior(np.array([float(rx[k])]),
                                      np.array([float(ry[k])]),
                                      ox, oy, rs)[0]:
                    depth += 1
                continue
            # shared contact points exist: rings can still cross THROUGH
            # those vertices while passing the simplicity gate (round 5,
            # ADVICE) — then i's boundary is partly inside and partly
            # outside j and no single depth is right. Probe ALL free
            # vertices; mixed parity routes to the exact scanline.
            inside = _even_odd_interior(as_f64(rx)[free], as_f64(ry)[free],
                                        ox, oy, rs)
            if inside.any() != inside.all():
                return _even_odd_area_scanline(xs, ys, ring_start)
            if inside[0]:
                depth += 1
        a = abs(ring_signed_area(rx, ry))
        total += a if depth % 2 == 0 else -a
    return total


def _even_odd_area_scanline(xs, ys, ring_start) -> float:
    """EXACT area of the even-odd (crossing-parity) region of an arbitrary
    edge set — self-intersections, mutually crossing rings, anything.

    Slab boundaries at every vertex y and every pairwise edge-crossing y;
    inside a slab no two active edges cross, so sorting them by midpoint-x
    and pairing alternately yields the parity region as trapezoids,
    integrated exactly. O(E²) crossing detection + O(crit · E log E)
    slabs — acceptable because only self-intersecting (malformed) input
    lands here, at build time.
    """
    x1, y1, x2, y2 = all_edges(as_f64(xs), as_f64(ys), ring_start)
    keep = y1 != y2  # horizontal edges bound no vertical extent
    x1, y1, x2, y2 = x1[keep], y1[keep], x2[keep], y2[keep]
    n = x1.size
    if n == 0:
        return 0.0
    crit = [y1, y2]
    # pairwise proper crossings contribute slab boundaries too
    with np.errstate(divide="ignore", invalid="ignore"):
        d = ((x2[:, None] - x1[:, None]) * (y2[None, :] - y1[None, :])
             - (y2[:, None] - y1[:, None]) * (x2[None, :] - x1[None, :]))
        t = ((x1[None, :] - x1[:, None]) * (y2[None, :] - y1[None, :])
             - (y1[None, :] - y1[:, None]) * (x2[None, :] - x1[None, :])) / d
        u = ((x1[None, :] - x1[:, None]) * (y2[:, None] - y1[:, None])
             - (y1[None, :] - y1[:, None]) * (x2[:, None] - x1[:, None])) / d
        cross = (d != 0) & (t > 0) & (t < 1) & (u > 0) & (u < 1)
        if cross.any():
            ii, jj = np.nonzero(cross)
            crit.append(y1[ii] + t[ii, jj] * (y2[ii] - y1[ii]))
    ylev = np.unique(np.concatenate(crit))
    lo_y = np.minimum(y1, y2)
    hi_y = np.maximum(y1, y2)
    with np.errstate(divide="ignore", invalid="ignore"):
        slope = (x2 - x1) / (y2 - y1)
    total = 0.0
    for ya, yb in zip(ylev[:-1], ylev[1:]):
        act = np.nonzero((lo_y <= ya) & (hi_y >= yb))[0]
        if act.size == 0:
            continue
        xa = x1[act] + (ya - y1[act]) * slope[act]
        xb = x1[act] + (yb - y1[act]) * slope[act]
        order = np.argsort(xa + xb, kind="stable")
        xa, xb = xa[order], xb[order]
        gaps = (xa[1::2] - xa[0::2]) + (xb[1::2] - xb[0::2])
        total += float(gaps.sum()) * 0.5 * (yb - ya)
    return total


def polygon_envelope(xs: np.ndarray, ys: np.ndarray):
    """(min_x, min_y, max_x, max_y) = (min_lng, min_lat, max_lng, max_lat)."""
    return float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())


# ---------------------------------------------------------------------------
# Point-in-polygon (even-odd, boundary-inclusive)
# ---------------------------------------------------------------------------

def _even_odd_interior(px, py, xs, ys, ring_start) -> np.ndarray:
    """Strict even-odd crossing parity (boundary NOT handled specially)."""
    m = px.size
    inside = np.zeros(m, dtype=bool)
    for rx, ry, rx2, ry2 in ring_edges(xs, ys, ring_start):
        n = rx.size
        step = max(1, _MAX_BROADCAST // max(m, 1))
        for s in range(0, n, step):
            x1 = rx[s:s + step][None, :]
            y1 = ry[s:s + step][None, :]
            x2 = rx2[s:s + step][None, :]
            y2 = ry2[s:s + step][None, :]
            ppy = py[:, None]
            ppx = px[:, None]
            straddle = (y1 > ppy) != (y2 > ppy)
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = x1 + (ppy - y1) * (x2 - x1) / (y2 - y1)
            crossed = straddle & (ppx < xint)
            inside ^= (np.sum(crossed, axis=1) % 2).astype(bool)
    return inside


def pip_edges(px, py, edges, eps: float = BOUNDARY_EPS) -> np.ndarray:
    """Boundary-inclusive even-odd PIP against a precomputed edge list
    ``edges = (x1, y1, x2, y2)`` (all rings concatenated — even-odd parity
    over the union of ring edges equals the XOR of per-ring parities).
    One fused pass computes crossing parity AND the on-boundary test."""
    px, py = as_f64(px), as_f64(py)
    x1a, y1a, x2a, y2a = edges
    m = px.size
    n = x1a.size
    out = np.zeros(m, dtype=bool)
    if n == 0:
        return out
    # chunk the POINT axis so each (chunk × n_edges) temporary stays
    # cache-resident — the m×n broadcasts would otherwise stream hundreds of
    # MB per batch through memory and collapse multi-core scaling
    pt_step = max(256, min(m, _CHUNK_ELEMS // max(n, 1)))
    x1 = x1a[None, :]
    y1 = y1a[None, :]
    x2 = x2a[None, :]
    y2 = y2a[None, :]
    dx, dy = x2 - x1, y2 - y1
    seg2 = dx * dx + dy * dy
    seg2_safe = np.where(seg2 > 0, seg2, 1.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        slope = dx / np.where(dy == 0, 1.0, dy)
    for s in range(0, m, pt_step):
        ppx = px[s:s + pt_step][:, None]
        ppy = py[s:s + pt_step][:, None]
        straddle = (y1 > ppy) != (y2 > ppy)
        xint = x1 + (ppy - y1) * slope
        inside_c = (np.sum(straddle & (ppx < xint), axis=1) % 2).astype(bool)
        # boundary-inclusive = interior OR on-edge; parity-inside points are
        # already decided — run the (pricier) on-edge test only for the
        # parity-outside subset
        miss = np.nonzero(~inside_c)[0]
        if miss.size:
            mpx = ppx[miss]
            mpy = ppy[miss]
            wx = mpx - x1
            wy = mpy - y1
            t = np.clip((wx * dx + wy * dy) / seg2_safe, 0.0, 1.0)
            cx = wx - t * dx
            cy = wy - t * dy
            on_c = np.any(cx * cx + cy * cy <= eps * eps, axis=1)
            inside_c[miss] = on_c
        out[s:s + pt_step] = inside_c
    return out


def pack_edge_rows(edge_list, pad_to: int | None = None):
    """Stack per-record edge arrays into padded ``(k, emax)`` tensors for
    ``pip_edges_gathered``. Padding is a ZERO-LENGTH edge at the record's
    first vertex — provably inert: it never straddles a ray (y1 == y2), and
    its on-edge distance equals the distance to a real boundary vertex, whose
    acceptance the real incident edges already imply (no inf/nan needed).

    Returns dict of X1, Y1, DX, DY, seg2_safe, slope (each (k, emax)).
    Records with zero edges get an all-padding row at (0, 0) that can match
    only the exact point (0,0) within eps — callers must exclude empty
    records (they can never match anyway)."""
    k = len(edge_list)
    emax = pad_to if pad_to is not None else max(
        (e[0].size for e in edge_list), default=0)
    emax = max(emax, 1)
    X1 = np.zeros((k, emax)); Y1 = np.zeros((k, emax))
    X2 = np.zeros((k, emax)); Y2 = np.zeros((k, emax))
    for li, (x1, y1, x2, y2) in enumerate(edge_list):
        n = x1.size
        if n:
            X1[li, :n] = x1; Y1[li, :n] = y1
            X2[li, :n] = x2; Y2[li, :n] = y2
            X1[li, n:] = x1[0]; Y1[li, n:] = y1[0]
            X2[li, n:] = x1[0]; Y2[li, n:] = y1[0]
    DX, DY = X2 - X1, Y2 - Y1
    seg2 = DX * DX + DY * DY
    # Y2 is kept verbatim: the straddle test must compare against the STORED
    # endpoint, not y1+dy — fl(y1 + fl(y2-y1)) != y2 for ~9% of float64
    # pairs, and a query latitude exactly at such a vertex latitude would
    # flip crossing parity vs pip_edges (review-found)
    return {"X1": X1, "Y1": Y1, "Y2": Y2, "DX": DX, "DY": DY,
            "seg2_safe": np.where(seg2 > 0, seg2, 1.0),
            "slope": DX / np.where(DY == 0, 1.0, DY)}


def pip_edges_gathered(px, py, rloc, packed, eps: float = BOUNDARY_EPS) -> np.ndarray:
    """Boundary-inclusive even-odd PIP where each point tests against ITS OWN
    record's edge row — ``rloc[i]`` indexes the padded tensors from
    ``pack_edge_rows``. Same math as ``pip_edges`` (parity pass + on-edge
    test for parity-outside points); one numpy dispatch covers MANY records,
    which beats per-record broadcasting when per-record point counts are
    small (the many-record regime — see index.lookup_batch)."""
    px, py = as_f64(px), as_f64(py)
    m = px.size
    out = np.zeros(m, dtype=bool)
    if m == 0:
        return out
    emax = packed["X1"].shape[1]
    step = max(256, _CHUNK_ELEMS // max(emax, 1))
    for s in range(0, m, step):
        rl = rloc[s:s + step]
        x1 = packed["X1"][rl]
        y1 = packed["Y1"][rl]
        dx = packed["DX"][rl]
        dy = packed["DY"][rl]
        ppx = px[s:s + step][:, None]
        ppy = py[s:s + step][:, None]
        straddle = (y1 > ppy) != (packed["Y2"][rl] > ppy)
        xint = x1 + (ppy - y1) * packed["slope"][rl]
        inside_c = (np.sum(straddle & (ppx < xint), axis=1) % 2).astype(bool)
        miss = np.nonzero(~inside_c)[0]
        if miss.size:
            wx = ppx[miss] - x1[miss]
            wy = ppy[miss] - y1[miss]
            dxm, dym = dx[miss], dy[miss]
            t = np.clip((wx * dxm + wy * dym) / packed["seg2_safe"][rl[miss]],
                        0.0, 1.0)
            cx = wx - t * dxm
            cy = wy - t * dym
            inside_c[miss] = np.any(cx * cx + cy * cy <= eps * eps, axis=1)
        out[s:s + step] = inside_c
    return out


def points_on_boundary(px, py, xs, ys, ring_start, eps: float = BOUNDARY_EPS) -> np.ndarray:
    """True where a point lies on any ring edge (within eps, degrees)."""
    px, py = as_f64(px), as_f64(py)
    m = px.size
    on = np.zeros(m, dtype=bool)
    x1a, y1a, x2a, y2a = all_edges(xs, ys, ring_start)
    n = x1a.size
    if n == 0:
        return on
    step = max(1, _MAX_BROADCAST // max(m, 1))
    for s in range(0, n, step):
        x1 = x1a[s:s + step][None, :]
        y1 = y1a[s:s + step][None, :]
        x2 = x2a[s:s + step][None, :]
        y2 = y2a[s:s + step][None, :]
        dx, dy = x2 - x1, y2 - y1
        seg2 = dx * dx + dy * dy
        wx = px[:, None] - x1
        wy = py[:, None] - y1
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.clip(np.where(seg2 > 0, (wx * dx + wy * dy) / seg2, 0.0), 0.0, 1.0)
        cx = wx - t * dx
        cy = wy - t * dy
        d2 = cx * cx + cy * cy
        on |= np.any(d2 <= eps * eps, axis=1)
    return on


def points_in_polygon(px, py, xs, ys, ring_start, eps: float = BOUNDARY_EPS) -> np.ndarray:
    """Boundary-inclusive even-odd containment for a batch of points.

    Replicates ``Util.containsInclusive`` (``Util.kt:12-13``): interior via
    even-odd parity (honors holes and islands-in-holes), plus any point
    lying exactly on a ring edge counts as contained ("touches").
    Conformance: ``UtilTest.java:60-81`` truth table.
    """
    px, py = as_f64(px), as_f64(py)
    interior = _even_odd_interior(px, py, xs, ys, ring_start)
    boundary = points_on_boundary(px, py, xs, ys, ring_start, eps=eps)
    return interior | boundary


# ---------------------------------------------------------------------------
# Nearest boundary point (planar, degrees) — reference TimeZone.kt:46
# ---------------------------------------------------------------------------

def nearest_on_boundary(px, py, xs, ys, ring_start):
    """Planar nearest point on any ring edge for each query point.

    Returns ``(nx, ny)`` float64 arrays. Mirrors Esri
    ``getNearestCoordinate(region, point, bTestPolygonInterior=false)``
    (``TimeZone.kt:46``): nearest in planar degree space over ALL rings
    (outer, holes, islands).
    """
    px, py = as_f64(px), as_f64(py)
    m = px.size
    best_d2 = np.full(m, np.inf)
    nx = np.zeros(m)
    ny = np.zeros(m)
    x1a, y1a, x2a, y2a = all_edges(xs, ys, ring_start)
    n = x1a.size
    step = max(1, _MAX_BROADCAST // max(m, 1))
    for s in range(0, n, step):
        x1 = x1a[s:s + step][None, :]
        y1 = y1a[s:s + step][None, :]
        x2 = x2a[s:s + step][None, :]
        y2 = y2a[s:s + step][None, :]
        dx, dy = x2 - x1, y2 - y1
        seg2 = dx * dx + dy * dy
        wx = px[:, None] - x1
        wy = py[:, None] - y1
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.clip(np.where(seg2 > 0, (wx * dx + wy * dy) / seg2, 0.0), 0.0, 1.0)
        cx = x1 + t * dx
        cy = y1 + t * dy
        ex = cx - px[:, None]
        ey = cy - py[:, None]
        d2 = ex * ex + ey * ey
        j = np.argmin(d2, axis=1)
        rows = np.arange(m)
        dmin = d2[rows, j]
        better = dmin < best_d2
        best_d2 = np.where(better, dmin, best_d2)
        nx = np.where(better, cx[rows, j], nx)
        ny = np.where(better, cy[rows, j], ny)
    return nx, ny


# ---------------------------------------------------------------------------
# WGS84 geodesic distance (Vincenty inverse, vectorized)
# ---------------------------------------------------------------------------

def geodesic_distance_m(lat1, lng1, lat2, lng2, iters: int = 40) -> np.ndarray:
    """WGS84 geodesic distance in meters (vectorized Vincenty inverse).

    Stand-in for Esri ``geodesicDistanceOnWGS84`` (``TimeZone.kt:45``);
    accuracy ~0.5 mm, validated against the reference's meter-level goldens
    (``TimeZoneTest.java:26-60``).
    """
    lat1, lng1 = as_f64(lat1), as_f64(lng1)
    lat2, lng2 = as_f64(lat2), as_f64(lng2)
    lat1, lng1, lat2, lng2 = np.broadcast_arrays(lat1, lng1, lat2, lng2)
    phi1 = np.radians(lat1)
    phi2 = np.radians(lat2)
    L = np.radians(lng2 - lng1)
    U1 = np.arctan((1 - WGS84_F) * np.tan(phi1))
    U2 = np.arctan((1 - WGS84_F) * np.tan(phi2))
    sinU1, cosU1 = np.sin(U1), np.cos(U1)
    sinU2, cosU2 = np.sin(U2), np.cos(U2)

    lam = L.copy()
    coincident = np.zeros(lam.shape, dtype=bool)
    sin_sigma = np.zeros(lam.shape)
    cos_sigma = np.ones(lam.shape)
    sigma = np.zeros(lam.shape)
    cos_sq_alpha = np.ones(lam.shape)
    cos2sm = np.zeros(lam.shape)
    active = np.ones(lam.shape, dtype=bool)
    for _ in range(iters):
        sin_lam, cos_lam = np.sin(lam), np.cos(lam)
        t1 = cosU2 * sin_lam
        t2 = cosU1 * sinU2 - sinU1 * cosU2 * cos_lam
        ss = np.sqrt(t1 * t1 + t2 * t2)
        cs = sinU1 * sinU2 + cosU1 * cosU2 * cos_lam
        coincident |= (ss == 0)
        sg = np.arctan2(ss, cs)
        with np.errstate(divide="ignore", invalid="ignore"):
            sin_alpha = np.where(ss != 0, cosU1 * cosU2 * sin_lam / ss, 0.0)
        csa = 1.0 - sin_alpha * sin_alpha
        with np.errstate(divide="ignore", invalid="ignore"):
            c2 = np.where(csa != 0, cs - 2.0 * sinU1 * sinU2 / np.where(csa == 0, 1.0, csa), 0.0)
        C = WGS84_F / 16.0 * csa * (4 + WGS84_F * (4 - 3 * csa))
        lam_new = L + (1 - C) * WGS84_F * sin_alpha * (
            sg + C * ss * (c2 + C * cs * (-1 + 2 * c2 * c2)))
        upd = active & ~coincident
        sin_sigma = np.where(upd, ss, sin_sigma)
        cos_sigma = np.where(upd, cs, cos_sigma)
        sigma = np.where(upd, sg, sigma)
        cos_sq_alpha = np.where(upd, csa, cos_sq_alpha)
        cos2sm = np.where(upd, c2, cos2sm)
        converged = np.abs(lam_new - lam) < 1e-14
        lam = np.where(upd, lam_new, lam)
        active &= ~converged
        if not active.any():
            break

    u_sq = cos_sq_alpha * (WGS84_A * WGS84_A - WGS84_B * WGS84_B) / (WGS84_B * WGS84_B)
    A = 1 + u_sq / 16384.0 * (4096 + u_sq * (-768 + u_sq * (320 - 175 * u_sq)))
    Bc = u_sq / 1024.0 * (256 + u_sq * (-128 + u_sq * (74 - 47 * u_sq)))
    delta_sigma = Bc * sin_sigma * (
        cos2sm + Bc / 4.0 * (
            cos_sigma * (-1 + 2 * cos2sm * cos2sm)
            - Bc / 6.0 * cos2sm * (-3 + 4 * sin_sigma * sin_sigma) * (-3 + 4 * cos2sm * cos2sm)))
    dist = WGS84_B * A * (sigma - delta_sigma)
    # Vincenty fails to converge for (near-)antipodal pairs (classic ~0.5%
    # error); fall back to spherical great-circle on the authalic radius
    # there (worst-case 0.56% — irrelevant for boundary distances, which are
    # short, but never silently ~100 km wrong)
    if active.any():
        R = 6371007.180918475
        phi1a, phi2a = np.radians(lat1), np.radians(lat2)
        dphi = phi2a - phi1a
        dlam = np.radians(lng2 - lng1)
        h = (np.sin(dphi / 2) ** 2
             + np.cos(phi1a) * np.cos(phi2a) * np.sin(dlam / 2) ** 2)
        sphere = 2 * R * np.arcsin(np.minimum(1.0, np.sqrt(h)))
        dist = np.where(active, sphere, dist)
    return np.where(coincident, 0.0, dist)


# ---------------------------------------------------------------------------
# Rectangle clip (Sutherland–Hodgman per ring)
# ---------------------------------------------------------------------------

def clip_ring_to_rect(rx: np.ndarray, ry: np.ndarray,
                      min_x: float, min_y: float, max_x: float, max_y: float):
    """Clip one ring to an axis-aligned rectangle (Sutherland–Hodgman).

    The reference clips zones to the init region with a general polygon
    intersection (``TimeZoneMap.kt:218-235``); the init region is always an
    axis-aligned rectangle (``TimeZoneMap.kt:163-165, 245-252``), so a
    rectangle clip is exactly sufficient. Rings are clipped independently —
    valid under even-odd semantics because intersection distributes over
    symmetric difference: (R1 xor R2) ∩ rect == (R1 ∩ rect) xor (R2 ∩ rect).

    Returns ``(cx, cy)`` float64 arrays (possibly empty).
    """
    pts = np.column_stack([as_f64(rx), as_f64(ry)])
    for axis, bound, keep_ge in ((0, min_x, True), (0, max_x, False),
                                 (1, min_y, True), (1, max_y, False)):
        if len(pts) == 0:
            break
        out = []
        n = len(pts)
        vals = pts[:, axis]
        inside = (vals >= bound) if keep_ge else (vals <= bound)
        for i in range(n):
            j = (i + 1) % n
            a_in, b_in = inside[i], inside[j]
            a, b = pts[i], pts[j]
            if a_in:
                out.append(a)
            if a_in != b_in:
                denom = b[axis] - a[axis]
                t = (bound - a[axis]) / denom if denom != 0 else 0.0
                out.append(a + t * (b - a))
        pts = np.array(out) if out else np.empty((0, 2))
        if len(pts) > 0:
            inside = None  # recomputed next pass
    if len(pts) < 3:
        return np.empty(0), np.empty(0)
    # drop consecutive duplicates (incl. wraparound)
    keep = np.ones(len(pts), dtype=bool)
    prev = np.roll(pts, 1, axis=0)
    dup = np.all(pts == prev, axis=1)
    keep &= ~dup
    pts = pts[keep]
    if len(pts) < 3:
        return np.empty(0), np.empty(0)
    return pts[:, 0].copy(), pts[:, 1].copy()


def clip_polygon_to_rect(xs, ys, ring_start, min_x, min_y, max_x, max_y):
    """Clip all rings; returns new ``(xs, ys, ring_start)`` (may be empty)."""
    new_x, new_y, starts = [], [], [0]
    for r in range(len(ring_start) - 1):
        s, e = int(ring_start[r]), int(ring_start[r + 1])
        cx, cy = clip_ring_to_rect(xs[s:e], ys[s:e], min_x, min_y, max_x, max_y)
        if cx.size >= 3:
            new_x.append(cx)
            new_y.append(cy)
            starts.append(starts[-1] + cx.size)
    if not new_x:
        z = np.empty(0)
        return z, z.copy(), np.array([0], dtype=np.int64)
    return (np.concatenate(new_x), np.concatenate(new_y),
            np.array(starts, dtype=np.int64))


def envelope_to_ring(min_lat: float, min_lng: float, max_lat: float, max_lng: float):
    """Rectangle → 5-point closed ring UL→UR→LR→LL→UL (``TimeZoneMap.kt:245-252``).

    Returns (lats, lngs) float64 arrays.
    """
    lats = np.array([max_lat, max_lat, min_lat, min_lat, max_lat])
    lngs = np.array([min_lng, max_lng, max_lng, min_lng, min_lng])
    return lats, lngs


def rect_intersects_polygon(min_x, min_y, max_x, max_y, xs, ys, ring_start) -> bool:
    """Whether an axis-aligned rect intersects a polygon's even-odd region.

    Used for cell-cover refinement. True iff any polygon vertex is inside
    the rect, any rect corner is inside the polygon, or any polygon edge
    crosses the rect boundary.
    """
    if xs.size == 0:
        return False
    # quick envelope rejection
    if xs.min() > max_x or xs.max() < min_x or ys.min() > max_y or ys.max() < min_y:
        return False
    # any polygon edge touching the rect (Liang–Barsky, vectorized)
    x1, y1, x2, y2 = all_edges(xs, ys, ring_start)
    dx, dy = x2 - x1, y2 - y1
    t0 = np.zeros(x1.size)
    t1 = np.ones(x1.size)
    ok = np.ones(x1.size, dtype=bool)
    for p, q in ((-dx, x1 - min_x), (dx, max_x - x1),
                 (-dy, y1 - min_y), (dy, max_y - y1)):
        with np.errstate(divide="ignore", invalid="ignore"):
            r = q / p
        par = p == 0
        ok &= ~(par & (q < 0))               # parallel and outside
        ent = ~par & (p < 0)
        ext = ~par & (p > 0)
        t0 = np.where(ent, np.maximum(t0, r), t0)
        t1 = np.where(ext, np.minimum(t1, r), t1)
    if np.any(ok & (t0 <= t1)):
        return True
    # no edge touches the rect → the rect is entirely inside or outside the
    # even-odd region; one interior sample decides
    cx = np.array([(min_x + max_x) / 2.0])
    cy = np.array([(min_y + max_y) / 2.0])
    return bool(points_in_polygon(cx, cy, xs, ys, ring_start)[0])


def _proper_cross(ax, ay, bx, by, cx, cy, dx, dy) -> np.ndarray:
    """Elementwise: do segments (a,b) and (c,d) PROPERLY cross (strict
    orientation flips on both sides — touching at a shared vertex or an
    endpoint-on-edge does not count)?"""
    def orient(px, py, qx, qy, rx, ry):
        return np.sign((qx - px) * (ry - py) - (qy - py) * (rx - px))

    o1 = orient(ax, ay, bx, by, cx, cy)
    o2 = orient(ax, ay, bx, by, dx, dy)
    o3 = orient(cx, cy, dx, dy, ax, ay)
    o4 = orient(cx, cy, dx, dy, bx, by)
    return (o1 * o2 < 0) & (o3 * o4 < 0)


def ring_self_intersects(xs: np.ndarray, ys: np.ndarray) -> bool:
    """True iff any two NON-ADJACENT edges of the (implicitly closed) ring
    properly cross — the condition the reference repairs with Esri
    ``OperatorSimplify`` (`builder/Main.kt:44-60`, M3).

    Sweep-prefiltered: edges sort by x-interval start and only x-overlapping
    pairs reach the orientation test (near-linear on simple-ish rings —
    real boundary-builder rings run to 10⁵ vertices, where the dense O(n²)
    matrix is 10¹⁰ cells). Degenerate rings whose edges mostly share
    x-range fall back to the dense path, capped at the old cost.

    Proper crossings only: edges touching at a shared vertex are not
    flagged (those are valid in OGC-simple rings)."""
    xs = as_f64(xs)
    ys = as_f64(ys)
    n = xs.size
    if n < 4:
        return False  # a (deduped) triangle cannot self-intersect
    x2, y2 = np.roll(xs, -1), np.roll(ys, -1)
    exmin, exmax = np.minimum(xs, x2), np.maximum(xs, x2)
    eymin, eymax = np.minimum(ys, y2), np.maximum(ys, y2)
    order = np.argsort(exmin, kind="stable")
    sxmin, sxmax = exmin[order], exmax[order]
    # candidate pairs (i, j) in sorted position, i < j < hi[i]:
    # sxmin[j] ≤ sxmax[i] ⇔ x-intervals overlap (sorted ⇒ one-sided test)
    hi = np.searchsorted(sxmin, sxmax, side="right")
    counts = np.maximum(hi - np.arange(n) - 1, 0)
    total = int(counts.sum())
    if total == 0:
        return False
    if total > max(65536, 64 * n):
        # pathological x-sharing — dense pairwise, same cost as the old path
        ii, jj = np.triu_indices(n, k=1)
    else:
        starts = np.cumsum(counts) - counts
        ii = np.repeat(np.arange(n), counts)
        jj = (np.arange(total) - np.repeat(starts, counts)
              + np.repeat(np.arange(n) + 1, counts))
        ii, jj = order[ii], order[jj]
    gap = np.abs(ii - jj)
    keep = (gap > 1) & (gap != n - 1)
    # bbox prefilter (x is already guaranteed for sweep pairs; the dense
    # fallback needs both axes)
    keep &= (eymin[ii] <= eymax[jj]) & (eymin[jj] <= eymax[ii])
    keep &= (exmin[ii] <= exmax[jj]) & (exmin[jj] <= exmax[ii])
    if not keep.any():
        return False
    a, b = ii[keep], jj[keep]
    return bool(_proper_cross(xs[a], ys[a], x2[a], y2[a],
                              xs[b], ys[b], x2[b], y2[b]).any())
