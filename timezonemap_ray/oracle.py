"""DuckDB oracle-SQL generation for the geo pipeline.

The driver's correctness gate runs each ``queries()`` callable AND its
``oracle_sql()`` string side-by-side. The geo points are derived from
``documents.doc_id`` by pure int64 arithmetic (``sources/docgen.py``), so the
SQL reproduces the exact float64 coordinates; the conformance world's zones
are rectangles (plus one square-with-island), so containment is expressible
as BETWEEN predicates — including even-odd hole semantics (hole strictly
exclusive, island inclusive — matching boundary-inclusive PIP for nested
rects).

The zone predicates are GENERATED from the very same ``worlds`` table the
engine indexes, with float64 bounds emitted via ``repr`` so both sides
compare identical doubles.
"""

from __future__ import annotations



from . import worlds
from .sources.docgen import geo_point_sql_expr


def _sql_f(v: float) -> str:
    return repr(float(v))


def geo_points_cte() -> str:
    """CTE ``pts(doc_id, span_idx, lat, lng)`` reproducing the generator."""
    lat, lng = geo_point_sql_expr("g.j")
    return f"""pts AS (
  SELECT CAST(d.doc_id AS VARCHAR) AS doc_id,
         CAST(1 + g.j AS BIGINT) AS span_idx,
         {lat} AS lat,
         {lng} AS lng
  FROM documents d,
       LATERAL (SELECT unnest(generate_series(0, CAST(d.doc_id % 3 AS BIGINT))) AS j) g
)"""


def conformance_zone_predicates(table=None) -> list[tuple[str, int, str]]:
    """[(zone_id, area_rank, sql_boolean_expr_over(lat,lng))] for every zone
    in the given rectangle-zone world (default: conformance),
    area-ascending."""
    from .zonetable import table_to_records
    if table is None:
        table = worlds.conformance_table()
    recs = table_to_records(table)
    out = []
    for r in recs:
        xs, ys, rs = r["xs"], r["ys"], r["ring_start"]
        n_rings = len(rs) - 1
        ring_boxes = []
        for k in range(n_rings):
            s, e = int(rs[k]), int(rs[k + 1])
            ring_boxes.append((float(ys[s:e].min()), float(xs[s:e].min()),
                               float(ys[s:e].max()), float(xs[s:e].max())))
        # ring 0 inclusive; ring 1 (hole) strictly inside; ring 2 (island)
        # inclusive — even-odd + boundary-inclusive for nested rectangles
        parts = []
        b0 = ring_boxes[0]
        outer = (f"(lat BETWEEN {_sql_f(b0[0])} AND {_sql_f(b0[2])} "
                 f"AND lng BETWEEN {_sql_f(b0[1])} AND {_sql_f(b0[3])})")
        expr = outer
        if n_rings >= 2:
            h = ring_boxes[1]
            hole = (f"(lat > {_sql_f(h[0])} AND lat < {_sql_f(h[2])} "
                    f"AND lng > {_sql_f(h[1])} AND lng < {_sql_f(h[3])})")
            if n_rings >= 3:
                i = ring_boxes[2]
                isl = (f"(lat BETWEEN {_sql_f(i[0])} AND {_sql_f(i[2])} "
                       f"AND lng BETWEEN {_sql_f(i[1])} AND {_sql_f(i[3])})")
                expr = f"({outer} AND (NOT {hole} OR {isl}))"
            else:
                expr = f"({outer} AND NOT {hole})"
        out.append((r["zone_id"], int(r["area_rank"]), expr))
    out.sort(key=lambda t: t[1])
    return out


def zones_join_cte(key_cols=("doc_id", "span_idx"), src="pts",
                   table=None) -> str:
    """CTE ``zone_match(<keys>, lat, lng, zone_id, area_rank)``: every
    (point, containing zone) pair, for any point CTE with the given keys."""
    keys = ", ".join(key_cols)
    selects = []
    for zid, rank, expr in conformance_zone_predicates(table):
        zlit = zid.replace("'", "''")
        selects.append(
            f"SELECT {keys}, lat, lng, '{zlit}' AS zone_id, "
            f"{rank} AS area_rank FROM {src} WHERE {expr}")
    return "zone_match AS (\n" + "\nUNION ALL\n".join(selects) + "\n)"


def sql_tile_assignments(cell_size: float = 1.0) -> str:
    """Oracle for the vector→raster tile pass: every world grid cell's
    center joined to the conformance zones (smallest-area wins)."""
    n_lat = int(round(180.0 / cell_size))
    n_lng = int(round(360.0 / cell_size))
    cs = _sql_f(cell_size)
    grid = f"""pts AS (
  SELECT CAST(iy.v * {n_lng} + ix.v AS BIGINT) AS cell_id,
         (-90.0 + (CAST(iy.v AS DOUBLE) + 0.5) * {cs}) AS lat,
         (-180.0 + (CAST(ix.v AS DOUBLE) + 0.5) * {cs}) AS lng
  FROM (SELECT unnest(generate_series(0, {n_lat - 1})) AS v) iy,
       (SELECT unnest(generate_series(0, {n_lng - 1})) AS v) ix
)"""
    return f"""WITH {grid},
{zones_join_cte(key_cols=("cell_id",))},
ranked AS (
  SELECT cell_id, zone_id,
         row_number() OVER (PARTITION BY cell_id ORDER BY area_rank) AS rn
  FROM zone_match)
SELECT p.cell_id, p.lat, p.lng, r.zone_id AS zone_id,
       (r.zone_id IS NOT NULL) AS matched
FROM pts p
LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r USING (cell_id)"""


def sql_tiles_boxes(cell_size: float = 2.0) -> str:
    """Oracle for the raster→vector pass: maximal same-zone boxes from the
    tile assignments, via double gaps-and-islands (horizontal runs per grid
    row, then vertical merge of identical runs in consecutive rows — the
    same greedy decomposition ``tiles.tiles_to_boxes`` computes)."""
    n_lat = int(round(180.0 / cell_size))
    n_lng = int(round(360.0 / cell_size))
    cs = _sql_f(cell_size)
    grid = f"""pts AS (
  SELECT CAST(iy.v * {n_lng} + ix.v AS BIGINT) AS cell_id,
         (-90.0 + (CAST(iy.v AS DOUBLE) + 0.5) * {cs}) AS lat,
         (-180.0 + (CAST(ix.v AS DOUBLE) + 0.5) * {cs}) AS lng
  FROM (SELECT unnest(generate_series(0, {n_lat - 1})) AS v) iy,
       (SELECT unnest(generate_series(0, {n_lng - 1})) AS v) ix
)"""
    return f"""WITH {grid},
{zones_join_cte(key_cols=("cell_id",))},
ranked AS (
  SELECT cell_id, zone_id,
         row_number() OVER (PARTITION BY cell_id ORDER BY area_rank) AS rn
  FROM zone_match),
cells AS (
  SELECT zone_id, cell_id // {n_lng} AS iy, cell_id % {n_lng} AS ix
  FROM ranked WHERE rn = 1),
runs AS (
  SELECT zone_id, iy, min(ix) AS ix0, max(ix) AS ix1
  FROM (SELECT zone_id, iy, ix,
               ix - row_number() OVER (PARTITION BY zone_id, iy
                                       ORDER BY ix) AS grp
        FROM cells)
  GROUP BY zone_id, iy, grp),
boxes AS (
  SELECT zone_id, ix0, ix1, min(iy) AS iy0, max(iy) AS iy1
  FROM (SELECT zone_id, iy, ix0, ix1,
               iy - row_number() OVER (PARTITION BY zone_id, ix0, ix1
                                       ORDER BY iy) AS vgrp
        FROM runs)
  GROUP BY zone_id, ix0, ix1, vgrp)
SELECT zone_id,
       CAST(-90.0 + iy0 * {cs} AS DOUBLE) AS min_lat,
       CAST(-180.0 + ix0 * {cs} AS DOUBLE) AS min_lng,
       CAST(-90.0 + (iy1 + 1) * {cs} AS DOUBLE) AS max_lat,
       CAST(-180.0 + (ix1 + 1) * {cs} AS DOUBLE) AS max_lng,
       CAST((ix1 - ix0 + 1) * (iy1 - iy0 + 1) AS BIGINT) AS n_cells
FROM boxes"""


def conformance_zone_edges(table=None) -> list:
    """[(zone_id, area_rank, x1, y1, dx, dy, seg2)] for every ring edge of
    every zone in the given world (default: conformance) — the EXACT edge
    enumeration ``geom.all_edges`` feeds ``geom.nearest_on_boundary``
    (implied ring closure, all rings), with dx/dy/seg2 precomputed in
    float64 (the same IEEE subtract/multiply/add the engine performs), so
    SQL point-to-segment distances reproduce the engine's float64 bits
    exactly."""
    import numpy as np

    from . import geom
    from .zonetable import table_to_records
    if table is None:
        table = worlds.conformance_table()
    out = []
    for r in table_to_records(table):
        x1, y1, x2, y2 = geom.all_edges(r["xs"], r["ys"], r["ring_start"])
        dx = np.asarray(x2, dtype=np.float64) - np.asarray(x1, dtype=np.float64)
        dy = np.asarray(y2, dtype=np.float64) - np.asarray(y1, dtype=np.float64)
        seg2 = dx * dx + dy * dy
        for i in range(len(x1)):
            out.append((r["zone_id"], int(r["area_rank"]), float(x1[i]),
                        float(y1[i]), float(dx[i]), float(dy[i]),
                        float(seg2[i])))
    return out


def sql_tz_boundary_d2() -> str:
    """Oracle for the planar SQUARED boundary distance (degrees²) of each
    point to its top-1 zone's boundary — the driver-checkable twin of the
    geodesic ``tz_distance_boundary`` (reference ``TimeZone.kt:41-47``).

    Same candidate scan and the same nearest-point kernel as the geodesic
    query, but the metric is closed-form (sub/mul/add/div/clamp/min only —
    no transcendental functions), so DuckDB reproduces the engine's float64
    bits: both sides compute, per edge,
    ``t = clamp(((lng-x1)*dx + (lat-y1)*dy)/seg2, 0, 1)``,
    ``(cx,cy) = (x1,y1) + t*(dx,dy)``, ``d2 = (cx-lng)² + (cy-lat)²``, and
    take the exact MIN over the zone's edges."""
    edge_rows = ",\n    ".join(
        f"('{z.replace(chr(39), chr(39)*2)}', {_sql_f(x1)}, {_sql_f(y1)}, "
        f"{_sql_f(dx)}, {_sql_f(dy)}, {_sql_f(s2)})"
        for z, _rank, x1, y1, dx, dy, s2 in conformance_zone_edges())
    return f"""WITH {geo_points_cte()},
{zones_join_cte()},
ranked AS (
  SELECT doc_id, span_idx, lat, lng, zone_id,
         row_number() OVER (PARTITION BY doc_id, span_idx
                            ORDER BY area_rank) AS rn
  FROM zone_match),
top1 AS (SELECT * FROM ranked WHERE rn = 1),
edges(zone_id, x1, y1, dx, dy, seg2) AS (VALUES
    {edge_rows}),
cand AS (
  SELECT p.doc_id, p.span_idx, p.zone_id,
         ((e.x1 + tt.t * e.dx) - p.lng) * ((e.x1 + tt.t * e.dx) - p.lng)
         + ((e.y1 + tt.t * e.dy) - p.lat) * ((e.y1 + tt.t * e.dy) - p.lat)
             AS d2
  FROM top1 p JOIN edges e ON e.zone_id = p.zone_id,
       LATERAL (SELECT least(greatest(
                    ((p.lng - e.x1) * e.dx + (p.lat - e.y1) * e.dy) / e.seg2,
                    0.0), 1.0) AS t) tt),
agg AS (
  SELECT doc_id, span_idx, zone_id, min(d2) AS d2
  FROM cand GROUP BY doc_id, span_idx, zone_id)
SELECT p.doc_id, p.span_idx, a.zone_id, a.d2
FROM pts p LEFT JOIN agg a USING (doc_id, span_idx)"""


def sql_spans_passthrough() -> str:
    """Oracle for the FULL span-sequence invariant (input_hint:
    ``(kind, text, media_ref, order)`` per row): rebuild every document's
    exact span sequence — text span at pos 0 carrying the document text,
    geo spans 1..n_geo with the generator's bit-exact float64 coordinates
    (``sources/docgen.py`` int64 arithmetic), the media span last with its
    ``media://blob/<id>`` ref — and both the list position and the
    ``offset`` field."""
    lat, lng = geo_point_sql_expr("g.j")
    return f"""WITH n AS (
  SELECT doc_id, text, CAST(doc_id % 3 + 1 AS BIGINT) AS n_geo
  FROM documents),
t AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, CAST(0 AS BIGINT) AS pos,
         'text' AS kind, text AS stext, '' AS media_ref,
         CAST(0 AS BIGINT) AS soffset,
         CAST(NULL AS DOUBLE) AS lat, CAST(NULL AS DOUBLE) AS lng
  FROM n),
g AS (
  SELECT CAST(n.doc_id AS VARCHAR) AS doc_id,
         CAST(1 + g.j AS BIGINT) AS pos, 'geo' AS kind, '' AS stext,
         '' AS media_ref, CAST(1 + g.j AS BIGINT) AS soffset,
         {lat} AS lat, {lng} AS lng
  FROM n, LATERAL (SELECT unnest(generate_series(0, n.n_geo - 1)) AS j) g),
m AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         CAST(n_geo + 1 AS BIGINT) AS pos, 'media' AS kind, '' AS stext,
         'media://blob/' || CAST(doc_id AS VARCHAR) AS media_ref,
         CAST(n_geo + 1 AS BIGINT) AS soffset,
         CAST(NULL AS DOUBLE) AS lat, CAST(NULL AS DOUBLE) AS lng
  FROM n)
SELECT * FROM t UNION ALL SELECT * FROM g UNION ALL SELECT * FROM m"""


FALLBACK_BOX = (-25.0, -25.0, 30.0, 30.0)  # keeps every point ≤ 6 cell rings
#                                            from the gap world's cover cell


def sql_tz_lookup_fallback() -> str:
    """Oracle for the kNN-fallback lookup (north_star: 'kNN fallback to
    the nearest zone polygon') over the GAP world: contained points get
    their smallest-area zone; uncovered points get the zone with the
    minimum squared planar boundary distance (exact MIN over generated
    edge literals — same bit-exact kernel mirror as sql_tz_boundary_d2),
    ties to the smaller area_rank exactly like the engine's
    rank-ascending strict-< scan. The gap world keeps all zones in ONE
    cover cell and the point box within the ring-search radius, so the
    engine's ring-candidate heuristic is provably the global argmin."""
    table = worlds.gap_world_table()
    b = FALLBACK_BOX
    box = (f"lat BETWEEN {_sql_f(b[0])} AND {_sql_f(b[2])} "
           f"AND lng BETWEEN {_sql_f(b[1])} AND {_sql_f(b[3])}")
    edge_rows = ",\n    ".join(
        f"('{z.replace(chr(39), chr(39)*2)}', {rank}, {_sql_f(x1)}, "
        f"{_sql_f(y1)}, {_sql_f(dx)}, {_sql_f(dy)}, {_sql_f(s2)})"
        for z, rank, x1, y1, dx, dy, s2 in conformance_zone_edges(table))
    return f"""WITH {geo_points_cte()},
boxed AS (SELECT * FROM pts WHERE {box}),
{zones_join_cte(src="boxed", table=table)},
ranked AS (
  SELECT doc_id, span_idx, zone_id,
         row_number() OVER (PARTITION BY doc_id, span_idx
                            ORDER BY area_rank) AS rn
  FROM zone_match),
contained AS (SELECT doc_id, span_idx, zone_id FROM ranked WHERE rn = 1),
edges(zone_id, area_rank, x1, y1, dx, dy, seg2) AS (VALUES
    {edge_rows}),
unmatched AS (
  SELECT p.* FROM boxed p
  LEFT JOIN contained c USING (doc_id, span_idx)
  WHERE c.zone_id IS NULL),
cand AS (
  SELECT p.doc_id, p.span_idx, e.zone_id, e.area_rank,
         ((e.x1 + tt.t * e.dx) - p.lng) * ((e.x1 + tt.t * e.dx) - p.lng)
         + ((e.y1 + tt.t * e.dy) - p.lat) * ((e.y1 + tt.t * e.dy) - p.lat)
             AS d2
  FROM unmatched p CROSS JOIN edges e,
       LATERAL (SELECT least(greatest(
                    ((p.lng - e.x1) * e.dx + (p.lat - e.y1) * e.dy) / e.seg2,
                    0.0), 1.0) AS t) tt),
zd AS (
  SELECT doc_id, span_idx, zone_id, area_rank, min(d2) AS d2
  FROM cand GROUP BY doc_id, span_idx, zone_id, area_rank),
nearest AS (
  SELECT doc_id, span_idx, zone_id,
         row_number() OVER (PARTITION BY doc_id, span_idx
                            ORDER BY d2 ASC, area_rank ASC) AS rn
  FROM zd)
SELECT doc_id, span_idx, zone_id, FALSE AS fallback FROM contained
UNION ALL
SELECT doc_id, span_idx, zone_id, TRUE AS fallback
FROM nearest WHERE rn = 1"""


def sql_geo_span_extract() -> str:
    return f"WITH {geo_points_cte()} SELECT doc_id, span_idx, lat, lng FROM pts"


def sql_tz_lookup_top1() -> str:
    return f"""WITH {geo_points_cte()},
{zones_join_cte()},
ranked AS (
  SELECT doc_id, span_idx, lat, lng, zone_id,
         row_number() OVER (PARTITION BY doc_id, span_idx
                            ORDER BY area_rank) AS rn
  FROM zone_match)
SELECT p.doc_id, p.span_idx, p.lat, p.lng,
       r.zone_id AS zone_id,
       (r.zone_id IS NOT NULL) AS matched
FROM pts p
LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r
  USING (doc_id, span_idx)"""


def sql_tz_lookup_all() -> str:
    return f"""WITH {geo_points_cte()},
{zones_join_cte()}
SELECT doc_id, span_idx,
       string_agg(zone_id, '|' ORDER BY area_rank) AS all_zones_str,
       count(*)::BIGINT AS n_zones
FROM zone_match
GROUP BY doc_id, span_idx"""


# ---------------------------------------------------------------------------
# MinHash+LSH dedup SQL twin (md5 token-hash mode)
# ---------------------------------------------------------------------------

_M32 = 1 << 32
_M64 = 1 << 64
_HUGE64 = f"CAST('{_M64}' AS HUGEINT)"


def _sql_mul64(x: str, y: str) -> str:
    """(x*y) mod 2^64 for two HUGEINT expressions in [0, 2^64): split each
    into 32-bit halves; every intermediate stays < 2^66 ≪ HUGEINT max."""
    return (f"((({x} % {_M32}) * ({y} % {_M32})"
            f" + ((({x} % {_M32}) * ({y} >> 32)"
            f" + ({x} >> 32) * ({y} % {_M32})) % {_M32}) * {_M32})"
            f" % {_HUGE64})")


_SMIX_C1 = 0xBF58476D1CE4E5B9
_SMIX_C2 = 0x94D049BB133111EB


def _sql_smix_chain(v_expr: str, tag: str) -> tuple[str, str]:
    """LATERAL chain computing splitmix64(``v_expr``) in HUGEINT
    arithmetic; ``tag`` keeps aliases unique when several chains stack.
    Returns (joins_fragment, output_expr)."""
    a, b, c, d, e = (f"s{tag}{k}" for k in "abcde")
    return (f""",
  LATERAL (SELECT xor({v_expr}, {v_expr} >> 30) AS x) {a},
  LATERAL (SELECT {_sql_mul64(f'{a}.x', f"CAST('{_SMIX_C1}' AS HUGEINT)")} AS x) {b},
  LATERAL (SELECT xor({b}.x, {b}.x >> 27) AS x) {c},
  LATERAL (SELECT {_sql_mul64(f'{c}.x', f"CAST('{_SMIX_C2}' AS HUGEINT)")} AS x) {d},
  LATERAL (SELECT xor({d}.x, {d}.x >> 31) AS x) {e}""", f"{e}.x")


def _sql_md5_u64(w_expr: str) -> str:
    """First 16 hex digits of md5(``w_expr``) as a HUGEINT (big-endian
    positional parse — matches ``text.hash_u64_md5``)."""
    terms = " + ".join(
        f"CAST(strpos('0123456789abcdef', substr(md5({w_expr}), {k + 1}, 1)) - 1 "
        f"AS HUGEINT) * CAST('{16 ** (15 - k)}' AS HUGEINT)"
        for k in range(16))
    return f"({terms})"


def _sset_ctes(table: str, id_col: str, text_col: str, shingle: int) -> str:
    """Shared CTE block producing ``sset({id_col}, h)`` — the per-doc
    DISTINCT word-shingle hash set in md5 token-hash mode: ``\\S+``
    tokens NUL-padded to ``shingle`` when short, token hash = big-endian
    16-hex-digit parse of ``md5(token)``, shingle hash = positional
    splitmix64 fold over token-hash windows (LATERAL chains in
    HUGEINT). Mirrors ``text.token_hashes(hasher=hash_u64_md5)``.

    EMPTY-DOC EXCEPTION: an empty/whitespace-only doc pads to one
    all-NUL shingle here, while the engine's ``token_hashes`` returns an
    EMPTY set (signature = the all-MAX sentinel). Downstream CLUSTER
    outputs still coincide — all empty docs band-agree on both sides
    (shared all-NUL digest here, shared sentinel signature there) — but
    the documented bit-for-bit sset equivalence holds only for docs with
    ≥ 1 token."""
    golden = 0x9E3779B97F4A7C15
    fold_joins, prev = "", f"CAST('{golden}' AS HUGEINT)"
    for j in range(shingle):
        joins, out = _sql_smix_chain(f"xor({prev}, w.t{j})", f"f{j}")
        fold_joins += joins
        prev = out
    tok_cols = ", ".join(f"t{j}.h AS t{j}" for j in range(shingle))
    tok_joins = "".join(
        f"\n  JOIN tokh t{j} ON t{j}.{id_col} = t0.{id_col} "
        f"AND t{j}.i = t0.i + {j}" for j in range(1, shingle))
    return f"""t AS (SELECT {id_col}, regexp_extract_all({text_col}, '\\S+') AS toks
      FROM {table}),
padded AS (SELECT {id_col},
                  CASE WHEN len(toks) >= {shingle} THEN toks
                       ELSE list_concat(toks,
                            list_transform(range({shingle} - len(toks)),
                                           x -> chr(0)))
                  END AS toks
           FROM t),
tok AS (SELECT {id_col}, unnest(toks) AS w,
               generate_subscripts(toks, 1) AS i
        FROM padded),
tokh AS (SELECT {id_col}, i, {_sql_md5_u64('w')} AS h FROM tok),
sh AS (
  SELECT w.{id_col}, {prev} AS h
  FROM (SELECT t0.{id_col}, {tok_cols}
        FROM tokh t0{tok_joins}) w{fold_joins}),
sset AS (SELECT DISTINCT {id_col}, h FROM sh)"""


def _closure_sql(table: str, id_col: str) -> str:
    """Recursive-reachability transitive closure over CTE ``ver(a, b)``
    → (id, cluster_id = min reachable id, is_duplicate)."""
    return f"""edges AS (SELECT a AS u, b AS v FROM ver UNION ALL SELECT b, a FROM ver),
reach(u, v) AS (
  SELECT {id_col}, {id_col} FROM {table}
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
SELECT u AS {id_col}, min(v) AS cluster_id,
       (min(v) <> u) AS is_duplicate
FROM reach GROUP BY u"""


def minhash_dedup_sql(num_perm: int = 64, bands: int = 16, shingle: int = 3,
                      threshold: float = 0.5, seed: int = 17,
                      table: str = "documents", id_col: str = "doc_id",
                      text_col: str = "text") -> str:
    """Full SQL TWIN of ``stages.dedup.minhash_dedup(hash_fn="md5")`` —
    DuckDB rebuilds the ENTIRE pipeline bit-for-bit:

    1. tokens = ``\\S+`` split, NUL-padded to ``shingle`` when short;
    2. token hash = big-endian 16-hex-digit parse of ``md5(token)``
       (the engine's md5 mode — blake2b has no SQL form, which is the
       only reason the production default isn't directly checkable);
    3. shingle hash = positional splitmix64 fold over token-hash
       windows (LATERAL chains in HUGEINT), deduped per doc;
    4. signature_p = min over shingles of ``(a_p·h + b_p) mod 2^64 mod
       (2^61−1)`` with the exact wrapping multiply and the same inlined
       permutation constants (``_perm_params(seed)``);
    5. band key = splitmix64 fold of each band's signature rows seeded
       with ``0x51ED270B ^ band``, masked to 63 bits;
    6. candidates = doc pairs sharing any band key (band-agnostic, like
       the engine's run-slicing); verified at ≥ ``ceil(threshold ·
       num_perm)`` matching signature positions;
    7. transitive closure by recursive reachability, cluster_id = min
       reachable id.

    Assumes no LSH bucket exceeds the engine's MAX_BUCKET truncation cap
    (holds for the test corpora; a truncated bucket would surface as a
    gate mismatch, not silently).
    """
    from .stages.dedup import MERSENNE, _perm_params
    rpb = num_perm // bands
    a, b = _perm_params(num_perm, seed)
    perm_rows = ", ".join(f"({p}, CAST('{int(a[p])}' AS HUGEINT), "
                          f"CAST('{int(b[p])}' AS HUGEINT))"
                          for p in range(num_perm))
    import math
    c_min = math.ceil(threshold * num_perm)

    # band-key fold: k_0 = smix(salt ^ band); k_{j+1} = smix(k_j ^ s_j)
    bsalt = 0x51ED270B
    bk_joins, bk_prev = _sql_smix_chain(
        f"xor(CAST({bsalt} AS HUGEINT), CAST(g.band AS HUGEINT))", "k0")
    for j in range(rpb):
        joins, out = _sql_smix_chain(f"xor({bk_prev}, g.s{j})", f"k{j + 1}")
        bk_joins += joins
        bk_prev = out
    seg_cols = ", ".join(
        f"max(CASE WHEN p % {rpb} = {j} THEN sv END) AS s{j}"
        for j in range(rpb))

    return f"""WITH RECURSIVE
{_sset_ctes(table, id_col, text_col, shingle)},
perms(p, pa, pb) AS (VALUES {perm_rows}),
sig AS (
  SELECT s.{id_col}, p.p,
         min((({_sql_mul64('p.pa', 's.h')} + p.pb) % {_HUGE64})
             % CAST('{int(MERSENNE)}' AS HUGEINT)) AS sv
  FROM sset s CROSS JOIN perms p
  GROUP BY 1, 2),
bsig AS (SELECT {id_col}, p // {rpb} AS band, {seg_cols}
         FROM sig GROUP BY 1, 2),
bkey AS (
  SELECT g.{id_col},
         CAST({bk_prev} % CAST('{1 << 63}' AS HUGEINT) AS BIGINT) AS band_key
  FROM bsig g{bk_joins}),
cand AS (SELECT DISTINCT x.{id_col} AS a, y.{id_col} AS b
         FROM bkey x JOIN bkey y
           ON x.band_key = y.band_key AND x.{id_col} < y.{id_col}),
ver AS (
  SELECT c.a, c.b
  FROM cand c
  JOIN sig sa ON sa.{id_col} = c.a
  JOIN sig sb ON sb.{id_col} = c.b AND sb.p = sa.p
  GROUP BY c.a, c.b
  HAVING sum(CASE WHEN sa.sv = sb.sv THEN 1 ELSE 0 END) >= {c_min}),
{_closure_sql(table, id_col)}"""


def simhash_dedup_sql(max_hamming: int = 3, shingle: int = 3,
                      table: str = "documents", id_col: str = "doc_id",
                      text_col: str = "text") -> str:
    """Full SQL TWIN of ``stages.dedup.simhash_dedup(hash_fn="md5")``:

    - shingle hash sets as in :func:`_sset_ctes` (md5 token mode);
    - 64-bit SimHash: per bit j, vote = Σ over DISTINCT shingles of
      (2·bit_j − 1); bit set iff vote > 0; docs with NO tokens
      short-circuit to simhash 0 (the engine's early return);
    - band keys = ``(band << 16) | sh[16·band : 16·band+16]`` over 4
      bands; candidates share a band key; verified at Hamming ≤
      ``max_hamming`` via split-BIGINT popcount of the xor;
    - recursive-CTE transitive closure.
    """
    return f"""WITH RECURSIVE
{_sset_ctes(table, id_col, text_col, shingle)},
js(j) AS (SELECT unnest(range(64))),
votes AS (
  SELECT {id_col}, j,
         sum(CASE WHEN (h >> CAST(j AS INTEGER)) % 2 = 1
                  THEN 1 ELSE -1 END) AS v
  FROM sset CROSS JOIN js GROUP BY 1, 2),
shash0 AS (
  SELECT {id_col},
         sum(CASE WHEN v > 0
                  THEN CAST(1 AS HUGEINT) << CAST(j AS INTEGER)
                  ELSE CAST(0 AS HUGEINT) END) AS sh
  FROM votes GROUP BY 1),
shash AS (
  SELECT t.{id_col},
         CASE WHEN len(t.toks) = 0 THEN CAST(0 AS HUGEINT)
              ELSE s.sh END AS sh
  FROM t LEFT JOIN shash0 s USING ({id_col})),
bandix(band) AS (SELECT unnest(range(4))),
bkey AS (
  SELECT {id_col},
         band * 65536
         + CAST((sh >> CAST(16 * band AS INTEGER)) % 65536 AS BIGINT)
             AS band_key,
         sh
  FROM shash CROSS JOIN bandix),
cand AS (SELECT DISTINCT x.{id_col} AS a, y.{id_col} AS b,
                x.sh AS sha, y.sh AS shb
         FROM bkey x JOIN bkey y
           ON x.band_key = y.band_key AND x.{id_col} < y.{id_col}),
ver AS (
  SELECT a, b FROM cand
  WHERE bit_count(CAST(xor(sha, shb) % {_M32} AS BIGINT))
        + bit_count(CAST(xor(sha, shb) >> 32 AS BIGINT)) <= {max_hamming}),
{_closure_sql(table, id_col)}"""


def hash_embed_mips_sql(dim: int = 256, k: int = 10, n_probes: int = 3,
                        table: str = "documents", id_col: str = "doc_id",
                        text_col: str = "text") -> str:
    """SQL TWIN of the hashing-trick MIPS composite
    (``text.feature_hash_counts(hash_fn="md5")`` →
    ``ann.mips_topk_int``): per-occurrence token hashing (md5 →
    splitmix64 in HUGEINT), bucket ``h % dim``, sign bit 63, integer
    count vectors; exact integer dots over ALL (probe, candidate) pairs
    (missing bucket overlap ⇒ dot 0); rank by (dot DESC, id)."""
    chain = _sql_smix_chain("t.h0", "m")[0]
    sign_cut = 1 << 63
    return f"""WITH tok AS (
  SELECT {id_col}, unnest(regexp_extract_all({text_col}, '\\S+')) AS w
  FROM {table}),
th AS (SELECT {id_col}, {_sql_md5_u64('w')} AS h0 FROM tok),
hh AS (SELECT t.{id_col}, sme.x AS h FROM th t{chain}),
cnt AS (SELECT {id_col}, CAST(h % {dim} AS BIGINT) AS bucket,
               sum(CASE WHEN h >= CAST('{sign_cut}' AS HUGEINT)
                        THEN -1 ELSE 1 END) AS c
        FROM hh GROUP BY 1, 2),
probes AS (SELECT {id_col} FROM {table} ORDER BY 1 LIMIT {n_probes}),
dots AS (SELECT c1.{id_col} AS query_id, c2.{id_col} AS vec_id,
                sum(c1.c * c2.c) AS dot
         FROM cnt c1 JOIN probes p ON p.{id_col} = c1.{id_col}
         JOIN cnt c2 ON c2.bucket = c1.bucket
         GROUP BY 1, 2),
alld AS (SELECT p.{id_col} AS query_id, d.{id_col} AS vec_id
         FROM probes p CROSS JOIN {table} d),
scored AS (SELECT a.query_id, a.vec_id,
                  CAST(COALESCE(t.dot, 0) AS BIGINT) AS dot
           FROM alld a LEFT JOIN dots t
             ON t.query_id = a.query_id AND t.vec_id = a.vec_id)
SELECT query_id, vec_id, CAST(rn AS BIGINT) AS rank, dot
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY dot DESC, vec_id) AS rn
      FROM scored)
WHERE rn <= {k}"""


def target_selection_int_sql(dim: int = 64, target_rate_bp: int = 1_000,
                             table: str = "documents",
                             id_col: str = "doc_id",
                             text_col: str = "text") -> str:
    """SQL TWIN of ``stages.select.target_selection_int``: DuckDB
    rebuilds the hashed unigram multinomial counts (md5 → splitmix64 in
    HUGEINT, bucket ``h % dim``, +1 per occurrence), the deterministic
    target sample, the cross-multiplied count-ratio weights
    ``Δ_f = n_t·D_r − n_r·D_t``, and keeps documents with positive
    integer score — bit-for-bit against the engine's two-pass plan."""
    from .stages.select import sample_hash_sql_pred
    chain = _sql_smix_chain("t.h0", "m")[0]
    pred = sample_hash_sql_pred(id_col, target_rate_bp)
    return f"""WITH tok AS (
  SELECT {id_col}, unnest(regexp_extract_all({text_col}, '\\S+')) AS w
  FROM {table}),
th AS (SELECT {id_col}, {_sql_md5_u64('w')} AS h0 FROM tok),
hh AS (SELECT t.{id_col}, sme.x AS h FROM th t{chain}),
cnt AS (SELECT {id_col}, CAST(h % {dim} AS BIGINT) AS bucket,
               count(*) AS c
        FROM hh GROUP BY 1, 2),
tgt AS (SELECT {id_col} FROM {table} WHERE {pred}),
nt AS (SELECT bucket, sum(c) AS n FROM cnt JOIN tgt USING ({id_col})
       GROUP BY 1),
nr AS (SELECT bucket, sum(c) AS n FROM cnt GROUP BY 1),
dt AS (SELECT COALESCE(sum(n), 0) AS d FROM nt),
dr AS (SELECT COALESCE(sum(n), 0) AS d FROM nr),
delta AS (SELECT r.bucket, COALESCE(t.n, 0) * dr.d - r.n * dt.d AS w
          FROM nr r LEFT JOIN nt t ON t.bucket = r.bucket, dt, dr),
sc AS (SELECT c.{id_col}, sum(c.c * d.w) AS score
       FROM cnt c JOIN delta d ON d.bucket = c.bucket GROUP BY 1)
SELECT {id_col}, CAST(score AS BIGINT) AS score
FROM sc WHERE score > 0"""


def ridge_normal_eqs_sql(dim: int = 8, table: str = "documents",
                         id_col: str = "doc_id",
                         text_col: str = "text") -> str:
    """SQL TWIN of the distributed ridge sufficient statistics
    (``stages/linear.normal_equations`` over md5-mode
    ``text.feature_hash_counts`` features with y = token count): rebuilds
    the integer hashed-count vectors (md5 → splitmix64 in HUGEINT, bucket
    ``h % dim``, sign bit 63) and the EXACT sums G = Σ x xᵀ, b = Σ x·y,
    n — emitted as rows (i, j, v): G at j < dim, b at j = dim, n at
    (dim, dim)."""
    chain, out = _sql_smix_chain("t.h0", "rg")
    sign_cut = 1 << 63
    return f"""WITH tok AS (
  SELECT {id_col}, unnest(regexp_extract_all({text_col}, '\\S+')) AS w
  FROM {table}),
th AS (SELECT {id_col}, {_sql_md5_u64('w')} AS h0 FROM tok),
hh AS (SELECT t.{id_col}, {out} AS h FROM th t{chain}),
cnt AS (SELECT {id_col}, CAST(h % {dim} AS BIGINT) AS bucket,
               sum(CASE WHEN h >= CAST('{sign_cut}' AS HUGEINT)
                        THEN -1 ELSE 1 END) AS c
        FROM hh GROUP BY 1, 2),
yv AS (SELECT d.{id_col}, COALESCE(tc.yy, 0) AS y
       FROM {table} d LEFT JOIN (SELECT {id_col}, count(*) AS yy
                                 FROM tok GROUP BY 1) tc USING ({id_col})),
gsum AS (SELECT c1.bucket AS i, c2.bucket AS j, sum(c1.c * c2.c) AS v
         FROM cnt c1 JOIN cnt c2 USING ({id_col}) GROUP BY 1, 2),
bsum AS (SELECT c.bucket AS i, sum(c.c * y.y) AS v
         FROM cnt c JOIN yv y USING ({id_col}) GROUP BY 1),
grid AS (SELECT a.i, b.j
         FROM (SELECT unnest(range({dim})) AS i) a,
              (SELECT unnest(range({dim})) AS j) b)
SELECT g.i, g.j, CAST(COALESCE(s.v, 0) AS BIGINT) AS v
FROM grid g LEFT JOIN gsum s ON s.i = g.i AND s.j = g.j
UNION ALL
SELECT a.i, CAST({dim} AS BIGINT) AS j, CAST(COALESCE(b.v, 0) AS BIGINT) AS v
FROM (SELECT unnest(range({dim})) AS i) a LEFT JOIN bsum b ON b.i = a.i
UNION ALL
SELECT CAST({dim} AS BIGINT), CAST({dim} AS BIGINT),
       (SELECT count(*) FROM {table})"""


def irls_step_int_sql(dim: int = 8, q: int = 1000, y_cut: int = 50,
                      table: str = "documents", id_col: str = "doc_id",
                      text_col: str = "text") -> str:
    """SQL TWIN of ``stages/linear.irls_step_int`` over md5-mode hashed
    count features: rebuilds the integer vectors, z = x·w0 with the
    fixed probe weights, the rational fast-sigmoid quantization
    p = floor(q·(1+|z|+z) / (2(1+|z|))), and the EXACT int64 sums
    H = Σ p(q−p)·x xᵀ, g = Σ x·(q·y − p), n — rows (i, j, v): H at
    j < dim, g at j = dim, n at (dim, dim). y = 1 iff the document has
    at least ``y_cut`` whitespace tokens."""
    from .stages.linear import IRLS_W0
    chain, out = _sql_smix_chain("t.h0", "rg")
    sign_cut = 1 << 63
    w0_rows = ", ".join(f"({i}, {int(w)})" for i, w in enumerate(IRLS_W0))
    return f"""WITH tok AS (
  SELECT {id_col}, unnest(regexp_extract_all({text_col}, '\\S+')) AS w
  FROM {table}),
th AS (SELECT {id_col}, {_sql_md5_u64('w')} AS h0 FROM tok),
hh AS (SELECT t.{id_col}, {out} AS h FROM th t{chain}),
cnt AS (SELECT {id_col}, CAST(h % {dim} AS BIGINT) AS bucket,
               CAST(sum(CASE WHEN h >= CAST('{sign_cut}' AS HUGEINT)
                        THEN -1 ELSE 1 END) AS BIGINT) AS c
        FROM hh GROUP BY 1, 2),
xv AS (SELECT d.{id_col}, g.b AS bucket, COALESCE(c.c, 0) AS x
       FROM {table} d
       CROSS JOIN (SELECT unnest(range({dim})) AS b) g
       LEFT JOIN cnt c ON c.{id_col} = d.{id_col} AND c.bucket = g.b),
w0(b, w) AS (VALUES {w0_rows}),
zv AS (SELECT x.{id_col}, CAST(sum(x.x * w.w) AS BIGINT) AS z
       FROM xv x JOIN w0 w ON w.b = x.bucket GROUP BY 1),
pv AS (SELECT {id_col},
              ({q} * (1 + abs(z) + z)) // (2 * (1 + abs(z))) AS p
       FROM zv),
yv AS (SELECT d.{id_col},
              CASE WHEN COALESCE(tc.yy, 0) >= {y_cut} THEN 1 ELSE 0
              END AS y
       FROM {table} d LEFT JOIN (SELECT {id_col}, count(*) AS yy
                                 FROM tok GROUP BY 1) tc
       USING ({id_col})),
hsum AS (SELECT x1.bucket AS i, x2.bucket AS j,
                CAST(sum(p.p * ({q} - p.p) * x1.x * x2.x) AS BIGINT) AS v
         FROM xv x1 JOIN xv x2 USING ({id_col}) JOIN pv p USING ({id_col})
         GROUP BY 1, 2),
gsum AS (SELECT x.bucket AS i,
                CAST(sum(x.x * ({q} * y.y - p.p)) AS BIGINT) AS v
         FROM xv x JOIN yv y USING ({id_col}) JOIN pv p USING ({id_col})
         GROUP BY 1)
SELECT h.i, h.j, h.v FROM hsum h
UNION ALL
SELECT g.i, CAST({dim} AS BIGINT) AS j, g.v FROM gsum g
UNION ALL
SELECT CAST({dim} AS BIGINT), CAST({dim} AS BIGINT),
       (SELECT count(*) FROM {table})"""


def embedding_dedup_int_sql(dim: int = 64, threshold_num: int = 361,
                            threshold_den: int = 400, n_bits: int = 12,
                            scale: int = 10_000, seed: int = 23,
                            table: str = "embeddings",
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> str:
    """SQL TWIN of ``stages.dedup.embedding_dedup_int``: the same ±1
    hyperplanes inlined as literals, integer quantization, sign-bit
    buckets (dot > 0), the exact rational cosine predicate in HUGEINT,
    recursive-CTE closure."""
    from .stages.dedup import _int_planes
    planes = _int_planes(dim, n_bits, seed)
    rows = ", ".join(
        f"({d}, {p}, {int(planes[d, p])})"
        for d in range(dim) for p in range(n_bits))
    return f"""WITH RECURSIVE
vq AS (SELECT {id_col} AS vid, d,
              CAST(floor(CAST(x AS DOUBLE) * {float(scale)!r}) AS BIGINT)
                  AS x
       FROM (SELECT {id_col}, unnest({vec_col}) AS x,
                    generate_subscripts({vec_col}, 1) - 1 AS d
             FROM {table})),
planes(d, p, w) AS (VALUES {rows}),
na AS (SELECT vid, sum(x * x) AS na FROM vq GROUP BY 1),
pd AS (SELECT v.vid, p.p, sum(v.x * p.w) AS s
       FROM vq v JOIN planes p ON p.d = v.d GROUP BY 1, 2),
bucket AS (SELECT vid,
                  CAST(sum(CASE WHEN s > 0
                                THEN CAST(1 AS BIGINT) << CAST(p AS INTEGER)
                                ELSE 0 END) AS BIGINT) AS b
           FROM pd GROUP BY 1),
cand AS (SELECT x.vid AS a, y.vid AS b
         FROM bucket x JOIN bucket y ON x.b = y.b AND x.vid < y.vid),
dots AS (SELECT c.a, c.b, sum(va.x * vb.x) AS dot
         FROM cand c
         JOIN vq va ON va.vid = c.a
         JOIN vq vb ON vb.vid = c.b AND vb.d = va.d
         GROUP BY 1, 2),
ver AS (SELECT d.a, d.b
        FROM dots d
        JOIN na xa ON xa.vid = d.a
        JOIN na xb ON xb.vid = d.b
        WHERE d.dot > 0
          AND {threshold_den} * CAST(d.dot AS HUGEINT) * CAST(d.dot AS HUGEINT)
              >= {threshold_num} * CAST(xa.na AS HUGEINT)
                 * CAST(xb.na AS HUGEINT)),
{_closure_sql(table, id_col)}"""


def semantic_dedup_int_sql(k: int = 4, kmeans_iters: int = 2,
                           threshold_num: int = 9,
                           threshold_den: int = 100,
                           sim_scale: int = 1_000,
                           kmeans_scale: int = 10_000,
                           table: str = "embeddings",
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> str:
    """SQL TWIN of ``stages.dedup.semantic_dedup_int``: the unrolled
    integer-k-means CTE chain (:func:`stages.cluster.kmeans_int_sql`)
    supplies cluster assignments; a within-cluster pairwise self-join
    evaluates the exact rational cosine predicate in HUGEINT; the keep
    rule is the same pair-local anti-join (drop j iff an i<j in j's
    cluster is similar — NOT closure-based)."""
    from .stages.cluster import kmeans_int_sql
    km = kmeans_int_sql(k=k, iters=kmeans_iters, scale=kmeans_scale,
                        table=table, id_col=id_col, vec_col=vec_col)
    return f"""WITH
sq AS (SELECT {id_col} AS vid, d,
              CAST(floor(CAST(x AS DOUBLE) * {float(sim_scale)!r}) AS BIGINT)
                  AS x
       FROM (SELECT {id_col}, unnest({vec_col}) AS x,
                    generate_subscripts({vec_col}, 1) AS d
             FROM {table})),
asg AS (SELECT {id_col} AS vid, cluster FROM ({km})),
nn AS (SELECT vid, sum(CAST(x AS HUGEINT) * x) AS na FROM sq GROUP BY 1),
dots AS (SELECT ai.vid AS i, aj.vid AS j,
                sum(CAST(qi.x AS HUGEINT) * qj.x) AS dot
         FROM asg ai JOIN asg aj
              ON aj.cluster = ai.cluster AND ai.vid < aj.vid
         JOIN sq qi ON qi.vid = ai.vid
         JOIN sq qj ON qj.vid = aj.vid AND qj.d = qi.d
         GROUP BY 1, 2),
dup AS (SELECT DISTINCT d.j AS vid
        FROM dots d
        JOIN nn xi ON xi.vid = d.i
        JOIN nn xj ON xj.vid = d.j
        WHERE d.dot > 0
          AND {threshold_den} * CAST(d.dot AS HUGEINT)
              * CAST(d.dot AS HUGEINT)
              >= {threshold_num} * CAST(xi.na AS HUGEINT)
                 * CAST(xj.na AS HUGEINT))
SELECT a.vid AS {id_col}, a.cluster
FROM asg a WHERE a.vid NOT IN (SELECT vid FROM dup)"""


def media_similarity_int_sql(n: int = 150, w: int = 16, h: int = 12,
                             k: int = 5, n_queries: int = 3) -> str:
    """SQL TWIN of the ``media_similarity_int`` query: DuckDB recomputes
    every pixel from the arithmetic rule (splitmix64(mid·2²⁰ + p) mod
    256 — ``media.arith_pixels``; the splitmix chain runs in HUGEINT via
    :func:`_sql_smix_chain`), rebuilds the 27-slot integer features
    (channel = p mod 3; slots 0-23 = 8-bin histograms of v >> 5, slots
    24-26 = channel pixel sums), and ranks exact integer dots (dot DESC,
    vec_id ASC) — bit-for-bit against the engine's decode → feature →
    MIPS path. Self-contained: reads no tables."""
    from .stages.media import ARITH_MID_STRIDE
    joins, out = _sql_smix_chain("px0.x", "mpx")
    npx = w * h * 3
    return f"""WITH px0 AS (
  SELECT m.mid, p.p,
         CAST(m.mid AS HUGEINT) * {ARITH_MID_STRIDE} + p.p AS x
  FROM range({n}) m(mid), range({npx}) p(p)),
px AS (SELECT px0.mid, px0.p, {out} % 256 AS v FROM px0{joins}),
feat AS (
  SELECT mid, CAST((p % 3) * 8 + (v // 32) AS BIGINT) AS slot,
         CAST(count(*) AS HUGEINT) AS f
  FROM px GROUP BY 1, 2
  UNION ALL
  SELECT mid, CAST(24 + (p % 3) AS BIGINT) AS slot,
         CAST(sum(v) AS HUGEINT) AS f
  FROM px GROUP BY 1, 2),
dots AS (
  SELECT q.mid AS query_id, f.mid AS vec_id,
         CAST(sum(q.f * f.f) AS BIGINT) AS dot
  FROM (SELECT * FROM feat WHERE mid < {n_queries}) q
  JOIN feat f ON f.slot = q.slot
  GROUP BY 1, 2),
ranked AS (
  SELECT query_id, vec_id, dot,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dot DESC, vec_id) AS rank
  FROM dots)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(vec_id AS BIGINT) AS vec_id,
       CAST(rank AS BIGINT) AS rank, dot
FROM ranked WHERE rank <= {k}"""


def lm_score_docs_sql(q: int = 1_000_000, min_count: int = 1,
                      table: str = "documents", id_col: str = "doc_id",
                      text_col: str = "text") -> str:
    """Twin of ``stages/terms.lm_score_docs``: rebuild the corpus bigram
    LM (unigram + bigram MLE counts, bigrams below ``min_count`` pruned)
    and each document's exact-integer score
    sum(floor(q*C(w1 w2)/C(w1))). Tokens are ``\\S+`` runs, so the pair
    (w1, w2) is an injective stand-in for the engine's "w1 w2" gram key."""
    return f"""
WITH tok AS (
  SELECT {id_col}, unnest(toks) AS w, generate_subscripts(toks, 1) AS i
  FROM (SELECT {id_col}, regexp_extract_all({text_col}, '\\S+') AS toks
        FROM {table})),
uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c1 FROM tok GROUP BY w),
bg AS (SELECT a.{id_col}, a.w AS w1, b.w AS w2
       FROM tok a JOIN tok b ON b.{id_col} = a.{id_col} AND b.i = a.i + 1),
bic AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM bg
        GROUP BY w1, w2 HAVING count(*) >= {min_count}),
scored AS (
  SELECT g.{id_col},
         CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(({q} * coalesce(c.c2, 0)) // u.c1) AS BIGINT) AS lm_score
  FROM bg g
  JOIN uni u ON u.w = g.w1
  LEFT JOIN bic c ON c.w1 = g.w1 AND c.w2 = g.w2
  GROUP BY g.{id_col})
SELECT d.{id_col},
       coalesce(s.n_bigrams, CAST(0 AS BIGINT)) AS n_bigrams,
       coalesce(s.lm_score, CAST(0 AS BIGINT)) AS lm_score
FROM {table} d LEFT JOIN scored s ON s.{id_col} = d.{id_col}"""


def geo_points_int_cte() -> str:
    """CTE ``ipts(key, lat1e4, lng1e4)`` — the INTEGER-lattice form of the
    geo points (``sources/docgen.geo_points_int_for``): key = doc_id*4 +
    span_idx, coordinates in exact 1e-4-degree int64 units. Twin of
    ``pipelines/spatial.geo_points_int``."""
    from .sources.docgen import geo_points_int_sql_expr
    lat, lng = geo_points_int_sql_expr("g.j")
    return f"""ipts AS (
  SELECT CAST(d.doc_id * 4 + 1 + g.j AS BIGINT) AS key,
         CAST({lat} AS BIGINT) AS lat1e4,
         CAST({lng} AS BIGINT) AS lng1e4
  FROM documents d,
       LATERAL (SELECT unnest(generate_series(0, CAST(d.doc_id % 3 AS BIGINT))) AS j) g)"""


def sql_quadkey_counts(level: int = 8) -> str:
    """Twin of ``pipelines/spatial.quadkey_counts``: the Morton/z-order
    interleave is the closed-form bit sum Σ_b ((ix>>b)&1)·4^b +
    ((iy>>b)&1)·2·4^b — same int64 lattice as the engine."""
    n = 1 << level
    terms = []
    for b in range(level):
        terms.append(f"(((ix >> {b}) & 1) * {1 << (2 * b)})")
        terms.append(f"(((iy >> {b}) & 1) * {1 << (2 * b + 1)})")
    z = " + ".join(terms)
    return f"""
WITH {geo_points_int_cte()},
t AS (SELECT ((lng1e4 + 1800000) * {n}) // 3600000 AS ix,
             ((lat1e4 + 900000) * {n}) // 1800000 AS iy,
             lat1e4, lng1e4 FROM ipts)
SELECT CAST({z} AS BIGINT) AS quadkey,
       CAST(count(*) AS BIGINT) AS n_points,
       CAST(sum(lat1e4) AS BIGINT) AS sum_lat1e4,
       CAST(sum(lng1e4) AS BIGINT) AS sum_lng1e4
FROM t GROUP BY quadkey"""


def sql_radius_pairs(eps1e4: int = 30000) -> str:
    """Twin of ``pipelines/spatial.radius_pairs``: the engine's 5-cell
    forward-replication join re-stated as the full 9-offset equality
    join (same candidate set, hash-joinable) + the exact int64 L2 test."""
    e2 = eps1e4 * eps1e4
    d2 = ("(a.lat1e4 - b.lat1e4) * (a.lat1e4 - b.lat1e4)"
          " + (a.lng1e4 - b.lng1e4) * (a.lng1e4 - b.lng1e4)")
    return f"""
WITH {geo_points_int_cte()},
p AS (SELECT key, lat1e4, lng1e4,
             (lng1e4 + 1800000) // {eps1e4} AS cx,
             (lat1e4 + 900000) // {eps1e4} AS cy FROM ipts),
o(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1))
SELECT a.key // 4 AS doc_a, a.key % 4 AS span_a,
       b.key // 4 AS doc_b, b.key % 4 AS span_b,
       CAST({d2} AS BIGINT) AS d2
FROM p a
JOIN o ON true
JOIN p b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy AND a.key < b.key
WHERE {d2} <= {e2}"""


def sql_bbox_overlap_pairs() -> str:
    """Twin of ``pipelines/spatial.bbox_overlap_pairs``: the engine's
    PBSM canonical-cell partition join re-stated as a direct
    inequality (IEJoin) self-join over the same per-doc boxes."""
    from .sources.docgen import geo_points_int_sql_expr
    lat0, lng0 = geo_points_int_sql_expr("0")
    return f"""
WITH c AS (
  SELECT doc_id,
         CAST({lng0} + 1800000 AS BIGINT) AS x0,
         CAST({lat0} + 900000 AS BIGINT) AS y0,
         CAST(1000 + ((doc_id * 48271) % 2147483647) % 30001 AS BIGINT) AS h
  FROM documents),
bb AS (SELECT doc_id, x0 - h AS xlo, x0 + h AS xhi,
              y0 - h AS ylo, y0 + h AS yhi FROM c)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       least(a.xhi, b.xhi) - greatest(a.xlo, b.xlo) AS ox,
       least(a.yhi, b.yhi) - greatest(a.ylo, b.ylo) AS oy
FROM bb a JOIN bb b ON a.doc_id < b.doc_id
 AND a.xlo <= b.xhi AND b.xlo <= a.xhi
 AND a.ylo <= b.yhi AND b.ylo <= a.yhi"""


def sql_nation_trade_volume() -> str:
    """Twin of ``pipelines/relational.nation_trade_volume`` (TPC-H Q7
    flavor) in the same exact cent-discount integer units."""
    return """
WITH l AS (
  SELECT l_orderkey, l_suppkey,
         CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS vol,
         CAST(year(l_shipdate) AS BIGINT) AS l_year
  FROM lineitem)
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, l.l_year,
       CAST(sum(l.vol) AS BIGINT) AS revenue_c2
FROM l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer cst ON cst.c_custkey = o.o_custkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN nation n2 ON n2.n_nationkey = cst.c_nationkey
WHERE n1.n_nationkey <> n2.n_nationkey
GROUP BY 1, 2, 3"""


def sql_nearest_neighbor_within(eps1e4: int = 80000) -> str:
    """Twin of ``pipelines/spatial.nearest_neighbor_within``: 9-offset
    cell-equality candidates, then the (d2, key)-lexicographic argmin
    per point via row_number."""
    e2 = eps1e4 * eps1e4
    d2 = ("(a.lat1e4 - b.lat1e4) * (a.lat1e4 - b.lat1e4)"
          " + (a.lng1e4 - b.lng1e4) * (a.lng1e4 - b.lng1e4)")
    return f"""
WITH {geo_points_int_cte()},
p AS (SELECT key, lat1e4, lng1e4,
             (lng1e4 + 1800000) // {eps1e4} AS cx,
             (lat1e4 + 900000) // {eps1e4} AS cy FROM ipts),
o(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)),
cand AS (
  SELECT a.key AS key, b.key AS nn_key, CAST({d2} AS BIGINT) AS d2
  FROM p a
  JOIN o ON true
  JOIN p b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy AND b.key <> a.key
  WHERE {d2} <= {e2}),
best AS (SELECT key, nn_key, d2,
                row_number() OVER (PARTITION BY key
                                   ORDER BY d2, nn_key) AS rn
         FROM cand)
SELECT key // 4 AS doc_id, key % 4 AS span_idx,
       nn_key // 4 AS nn_doc, nn_key % 4 AS nn_span, d2 AS nn_d2
FROM best WHERE rn = 1"""


def sql_tile_density_smooth(level: int = 8) -> str:
    """Twin of ``pipelines/spatial.tile_density_smooth``: the 9-offset
    scatter + groupby is re-stated as a 3×3 BETWEEN self-join over the
    (ix, iy) tile rollup."""
    n = 1 << level
    terms = []
    for b in range(level):
        terms.append(f"(((a.ix >> {b}) & 1) * {1 << (2 * b)})")
        terms.append(f"(((a.iy >> {b}) & 1) * {1 << (2 * b + 1)})")
    z = " + ".join(terms)
    return f"""
WITH {geo_points_int_cte()},
t AS (SELECT ((lng1e4 + 1800000) * {n}) // 3600000 AS ix,
             ((lat1e4 + 900000) * {n}) // 1800000 AS iy,
             CAST(count(*) AS BIGINT) AS n
      FROM ipts GROUP BY ix, iy)
SELECT CAST({z} AS BIGINT) AS quadkey,
       a.n AS n_points,
       CAST(sum(b.n) AS BIGINT) AS smooth_n
FROM t a JOIN t b ON b.ix BETWEEN a.ix - 1 AND a.ix + 1
                 AND b.iy BETWEEN a.iy - 1 AND a.iy + 1
GROUP BY a.ix, a.iy, a.n"""


def sql_points_in_doc_boxes() -> str:
    """Twin of ``pipelines/spatial.points_in_doc_boxes``: direct BETWEEN
    (IEJoin) point-in-rectangle join over the same boxes and points."""
    from .sources.docgen import geo_points_int_sql_expr
    lat0, lng0 = geo_points_int_sql_expr("0")
    return f"""
WITH {geo_points_int_cte()},
c AS (
  SELECT doc_id,
         CAST({lng0} + 1800000 AS BIGINT) AS x0,
         CAST({lat0} + 900000 AS BIGINT) AS y0,
         CAST(1000 + ((doc_id * 48271) % 2147483647) % 30001 AS BIGINT) AS h
  FROM documents),
bb AS (SELECT doc_id, x0 - h AS xlo, x0 + h AS xhi,
              y0 - h AS ylo, y0 + h AS yhi FROM c),
p AS (SELECT key, lng1e4 + 1800000 AS x, lat1e4 + 900000 AS y FROM ipts)
SELECT bb.doc_id AS box_doc, p.key // 4 AS pt_doc, p.key % 4 AS pt_span
FROM bb JOIN p ON p.x BETWEEN bb.xlo AND bb.xhi
              AND p.y BETWEEN bb.ylo AND bb.yhi"""


def _morton_sql(ix: str, iy: str, level: int) -> str:
    """Closed-form Morton/z-order interleave of SQL expressions ``ix``/
    ``iy``: Σ_b ((ix>>b)&1)·4^b + ((iy>>b)&1)·2·4^b — the SQL twin of
    ``pipelines/spatial._interleave_bits``."""
    terms = []
    for b in range(level):
        terms.append(f"((({ix} >> {b}) & 1) * {1 << (2 * b)})")
        terms.append(f"((({iy} >> {b}) & 1) * {1 << (2 * b + 1)})")
    return " + ".join(terms)


def _doc_boxes_cte() -> str:
    """CTE ``bb(doc_id, xlo, xhi, ylo, yhi)`` — the per-doc boxes of
    ``pipelines/spatial.doc_boxes`` in the shifted non-negative grid."""
    from .sources.docgen import geo_points_int_sql_expr
    lat0, lng0 = geo_points_int_sql_expr("0")
    return f"""boxc AS (
  SELECT doc_id,
         CAST({lng0} + 1800000 AS BIGINT) AS x0,
         CAST({lat0} + 900000 AS BIGINT) AS y0,
         CAST(1000 + ((doc_id * 48271) % 2147483647) % 30001 AS BIGINT) AS h
  FROM documents),
bb AS (SELECT doc_id, x0 - h AS xlo, x0 + h AS xhi,
              y0 - h AS ylo, y0 + h AS yhi FROM boxc)"""


def sql_box_coverage_raster(level: int = 8) -> str:
    """Twin of ``pipelines/raster.box_coverage_raster``: each box expands
    to its covered tile rectangle via LATERAL generate_series (the same
    floor-division tile ranges — all coords non-negative, so DuckDB's
    truncating ``//`` ≡ floor), then a plain count per tile."""
    n = 1 << level
    z = _morton_sql("g.ix", "g.iy", level)
    return f"""
WITH {_doc_boxes_cte()},
t AS (SELECT (xlo * {n}) // 3600000 AS ixlo, (xhi * {n}) // 3600000 AS ixhi,
             (ylo * {n}) // 1800000 AS iylo, (yhi * {n}) // 1800000 AS iyhi
      FROM bb),
g AS (SELECT gx.ix, gy.iy FROM t,
      LATERAL (SELECT unnest(generate_series(t.ixlo, t.ixhi)) AS ix) gx,
      LATERAL (SELECT unnest(generate_series(t.iylo, t.iyhi)) AS iy) gy)
SELECT CAST({z} AS BIGINT) AS quadkey,
       CAST(count(*) AS BIGINT) AS n_boxes
FROM g GROUP BY quadkey"""


def sql_tile_runs(level: int = 8) -> str:
    """Twin of ``pipelines/raster.tile_runs``: gaps-and-islands — the
    run id is ix minus the row_number within the grid row, constant
    exactly along each maximal consecutive run."""
    n = 1 << level
    return f"""
WITH {geo_points_int_cte()},
t AS (SELECT ((lng1e4 + 1800000) * {n}) // 3600000 AS ix,
             ((lat1e4 + 900000) * {n}) // 1800000 AS iy,
             CAST(count(*) AS BIGINT) AS n
      FROM ipts GROUP BY ix, iy),
r AS (SELECT ix, iy, n,
             ix - row_number() OVER (PARTITION BY iy ORDER BY ix) AS grp
      FROM t)
SELECT CAST(iy AS BIGINT) AS iy,
       CAST(min(ix) AS BIGINT) AS ix_start,
       CAST(max(ix) AS BIGINT) AS ix_end,
       CAST(count(*) AS BIGINT) AS n_tiles,
       CAST(sum(n) AS BIGINT) AS n_points
FROM r GROUP BY iy, grp"""


def sql_tile_regions(level: int = 11) -> str:
    """Twin of ``pipelines/raster.tile_regions``: 4-connected component
    labeling as a recursive min-label propagation — a label l spreads
    across occupied-tile adjacency edges into any tile with key > l, so
    min(lbl) per tile is the component minimum (the engine's region_id).
    Subcritical occupancy at the fine level keeps the recursion's
    (tile, label) pair space small."""
    n = 1 << level
    return f"""
WITH RECURSIVE {geo_points_int_cte()},
t AS (SELECT ((lng1e4 + 1800000) * {n}) // 3600000 AS ix,
             ((lat1e4 + 900000) * {n}) // 1800000 AS iy,
             CAST(count(*) AS BIGINT) AS n
      FROM ipts GROUP BY ix, iy),
k AS (SELECT ix * {2 * n} + iy AS tkey, ix, iy, n FROM t),
e AS (SELECT a.tkey AS a, b.tkey AS b
      FROM k a JOIN k b ON (b.ix = a.ix + 1 AND b.iy = a.iy)
                        OR (b.ix = a.ix AND b.iy = a.iy + 1)),
es AS (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
lab AS (SELECT tkey, tkey AS lbl FROM k
        UNION
        SELECT es.b AS tkey, lab.lbl
        FROM lab JOIN es ON es.a = lab.tkey WHERE lab.lbl < es.b),
m AS (SELECT tkey, min(lbl) AS region_id FROM lab GROUP BY tkey)
SELECT CAST(m.region_id AS BIGINT) AS region_id,
       CAST(count(*) AS BIGINT) AS n_tiles,
       CAST(sum(k.n) AS BIGINT) AS n_points,
       CAST(min(k.ix) AS BIGINT) AS min_ix,
       CAST(max(k.ix) AS BIGINT) AS max_ix,
       CAST(min(k.iy) AS BIGINT) AS min_iy,
       CAST(max(k.iy) AS BIGINT) AS max_iy
FROM m JOIN k ON k.tkey = m.tkey
GROUP BY m.region_id"""


def sql_tile_pyramid_counts(levels: tuple = (8, 6, 4, 2)) -> str:
    """Twin of ``pipelines/raster.tile_pyramid_counts``: per-level direct
    tile group-bys UNION ALL'd (⌊⌊x·2^L/W⌋/2^k⌋ = ⌊x·2^(L-k)/W⌋, so the
    direct computation per level equals the engine's quadkey-shift
    coarsening of the finest rollup)."""
    parts = []
    for lv in sorted(levels, reverse=True):
        n = 1 << lv
        z = _morton_sql("ix", "iy", lv)
        parts.append(f"""
SELECT CAST({lv} AS BIGINT) AS level,
       CAST({z} AS BIGINT) AS quadkey,
       CAST(count(*) AS BIGINT) AS n_points
FROM (SELECT ((lng1e4 + 1800000) * {n}) // 3600000 AS ix,
             ((lat1e4 + 900000) * {n}) // 1800000 AS iy
      FROM ipts) GROUP BY quadkey""")
    body = "\nUNION ALL\n".join(parts)
    return f"""
WITH {geo_points_int_cte()}
{body}"""


def sql_segment_box_hits() -> str:
    """Twin of ``pipelines/spatial.segment_box_hits``: the direct
    separating-axis join — closed bbox overlap (IEJoin-able range
    predicates) plus the four exact int64 corner cross products against
    the segment's supporting line (not all strictly one side)."""
    from .sources.docgen import geo_points_int_sql_expr
    lat_a, lng_a = geo_points_int_sql_expr("g.j")
    lat_b, lng_b = geo_points_int_sql_expr("(g.j + 1)")
    corners = []
    for cx, cy in (("bb.xlo", "bb.ylo"), ("bb.xlo", "bb.yhi"),
                   ("bb.xhi", "bb.ylo"), ("bb.xhi", "bb.yhi")):
        corners.append(f"((s.x2 - s.x1) * ({cy} - s.y1)"
                       f" - (s.y2 - s.y1) * ({cx} - s.x1))")
    cmin = f"least({', '.join(corners)})"
    cmax = f"greatest({', '.join(corners)})"
    # MATERIALIZED: DuckDB 1.0's IEJoin hits an internal "requires a
    # flat vector" assertion when the range-join input is the lazy
    # lateral-unnest CTE; materializing the segment table first avoids it
    return f"""
WITH {_doc_boxes_cte()},
s AS MATERIALIZED (
  SELECT d.doc_id AS seg_doc, CAST(g.j + 1 AS BIGINT) AS seg_j,
         CAST({lng_a} + 1800000 AS BIGINT) AS x1,
         CAST({lat_a} + 900000 AS BIGINT) AS y1,
         CAST({lng_b} + 1800000 AS BIGINT) AS x2,
         CAST({lat_b} + 900000 AS BIGINT) AS y2
  FROM documents d,
       LATERAL (SELECT unnest(generate_series(
                    0, CAST(d.doc_id % 3 AS BIGINT) - 1)) AS j) g)
SELECT s.seg_doc, s.seg_j, bb.doc_id AS box_doc
FROM s JOIN bb
  ON least(s.x1, s.x2) <= bb.xhi AND greatest(s.x1, s.x2) >= bb.xlo
 AND least(s.y1, s.y2) <= bb.yhi AND greatest(s.y1, s.y2) >= bb.ylo
 AND {cmin} <= 0 AND {cmax} >= 0"""


def sql_knn_within(eps1e4: int = 80000, k: int = 3) -> str:
    """Twin of ``pipelines/spatial.knn_within``: the argmin oracle's
    candidate join with rn <= k kept and emitted as the 1-based rank."""
    e2 = eps1e4 * eps1e4
    d2 = ("(a.lat1e4 - b.lat1e4) * (a.lat1e4 - b.lat1e4)"
          " + (a.lng1e4 - b.lng1e4) * (a.lng1e4 - b.lng1e4)")
    return f"""
WITH {geo_points_int_cte()},
p AS (SELECT key, lat1e4, lng1e4,
             (lng1e4 + 1800000) // {eps1e4} AS cx,
             (lat1e4 + 900000) // {eps1e4} AS cy FROM ipts),
o(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)),
cand AS (
  SELECT a.key AS key, b.key AS nn_key, CAST({d2} AS BIGINT) AS d2
  FROM p a
  JOIN o ON true
  JOIN p b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy AND b.key <> a.key
  WHERE {d2} <= {e2}),
best AS (SELECT key, nn_key, d2,
                row_number() OVER (PARTITION BY key
                                   ORDER BY d2, nn_key) AS rn
         FROM cand)
SELECT key // 4 AS doc_id, key % 4 AS span_idx, CAST(rn AS BIGINT) AS rank,
       nn_key // 4 AS nn_doc, nn_key % 4 AS nn_span, d2 AS nn_d2
FROM best WHERE rn <= {k}"""


def _hexbin_assign_ctes() -> str:
    """CTE chain ending in ``k(lat1e4, lng1e4, hexkey)`` — the
    two-lattice nearest-center hex assignment restated in closed form
    (DuckDB ``//`` on the non-negative shifted grid is floor, so every
    quantity is the same int64 the engine computes: doubled
    coordinates, ties → lattice A)."""
    from .pipelines.spatial import HEX_H, HEX_NY, HEX_W
    w, h = HEX_W, HEX_H
    return f"""{geo_points_int_cte()},
g AS (SELECT lat1e4, lng1e4,
             lng1e4 + 1800000 AS x, lat1e4 + 900000 AS y FROM ipts),
c AS (SELECT lat1e4, lng1e4, x, y,
             (2*x + {w}) // {2 * w} AS ia, (2*y + {h}) // {2 * h} AS ja,
             x // {w} AS ib, y // {h} AS jb FROM g),
d AS (SELECT lat1e4, lng1e4, ia, ja, ib, jb,
             (2*x - 2*{w}*ia)*(2*x - 2*{w}*ia)
               + (2*y - 2*{h}*ja)*(2*y - 2*{h}*ja) AS da2,
             (2*x - (2*{w}*ib + {w}))*(2*x - (2*{w}*ib + {w}))
               + (2*y - (2*{h}*jb + {h}))*(2*y - (2*{h}*jb + {h})) AS db2
      FROM c),
k AS (SELECT lat1e4, lng1e4,
             CASE WHEN db2 < da2
                  THEN (ib * {HEX_NY} + jb) * 2 + 1
                  ELSE (ia * {HEX_NY} + ja) * 2 END AS hexkey
      FROM d)"""


def sql_hexbin_counts() -> str:
    """Twin of ``pipelines/spatial.hexbin_counts``: the closed-form hex
    assignment (`_hexbin_assign_ctes`) + the per-hex rollup."""
    return f"""
WITH {_hexbin_assign_ctes()}
SELECT CAST(hexkey AS BIGINT) AS hexkey,
       CAST(count(*) AS BIGINT) AS n_points,
       CAST(sum(lat1e4) AS BIGINT) AS sum_lat1e4,
       CAST(sum(lng1e4) AS BIGINT) AS sum_lng1e4
FROM k GROUP BY hexkey"""


def sql_hexbin_kring_counts() -> str:
    """Twin of ``pipelines/spatial.hexbin_kring_counts``: the same hex
    rollup, then a gather join over the symmetric 1-ring relation
    (self + 6 Voronoi neighbors, enumerated per source lattice) —
    identical id arithmetic to the engine's scatter."""
    from .pipelines.spatial import _HEX_RING, HEX_NY
    rel = ", ".join(f"({sb}, {di}, {dj}, {tb})"
                    for sb, di, dj, tb in _HEX_RING)
    return f"""
WITH {_hexbin_assign_ctes()},
roll AS (SELECT hexkey, CAST(count(*) AS BIGINT) AS n
         FROM k GROUP BY hexkey),
rel(sb, di, dj, tb) AS (VALUES {rel}),
x AS (SELECT hexkey, hexkey % 2 AS b,
             (hexkey // 2) // {HEX_NY} AS i,
             (hexkey // 2) % {HEX_NY} AS j, n FROM roll)
SELECT a.hexkey, CAST(a.n AS BIGINT) AS n_points,
       CAST(sum(t.n) AS BIGINT) AS kring_points
FROM x a
JOIN rel ON rel.sb = a.b
JOIN x t ON t.hexkey = ((a.i + rel.di) * {HEX_NY} + (a.j + rel.dj)) * 2
                       + rel.tb
GROUP BY a.hexkey, a.n"""


def sql_dbscan_labels(eps1e4: int = 50000, min_pts: int = 4) -> str:
    """Twin of ``pipelines/spatial.dbscan_labels``: the same eps-graph
    (9-offset cell-equality join + exact int64 L2 test), core = degree+1
    >= min_pts, components by recursive-CTE reachability over core-core
    edges (cluster = min reachable core key — identical to the engine's
    min-label fixpoint), border = min core-neighbor label, noise = -1."""
    e2 = eps1e4 * eps1e4
    sent = 1 << 62
    d2 = ("(a.lat1e4 - b.lat1e4) * (a.lat1e4 - b.lat1e4)"
          " + (a.lng1e4 - b.lng1e4) * (a.lng1e4 - b.lng1e4)")
    return f"""
WITH RECURSIVE {geo_points_int_cte()},
p AS (SELECT key, lat1e4, lng1e4,
             (lng1e4 + 1800000) // {eps1e4} AS cx,
             (lat1e4 + 900000) // {eps1e4} AS cy FROM ipts),
o(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)),
e AS (SELECT a.key AS u, b.key AS v
      FROM p a JOIN o ON true
      JOIN p b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
              AND a.key <> b.key
      WHERE {d2} <= {e2}),
deg AS (SELECT u AS key, count(*) AS deg FROM e GROUP BY u),
core AS (SELECT key FROM deg WHERE deg + 1 >= {min_pts}),
ce AS (SELECT e.u, e.v FROM e
       JOIN core ca ON e.u = ca.key
       JOIN core cb ON e.v = cb.key),
reach(u, v) AS (SELECT key, key FROM core
                UNION
                SELECT r.u, ce.v FROM reach r JOIN ce ON r.v = ce.u),
lab AS (SELECT u AS key, min(v) AS label FROM reach GROUP BY u),
nbr AS (SELECT e.u AS key, min(l.label) AS label
        FROM e JOIN lab l ON e.v = l.key GROUP BY e.u),
allv AS (SELECT key, CAST({sent} AS BIGINT) AS label, 0 AS c FROM ipts
         UNION ALL SELECT key, label, 1 FROM lab
         UNION ALL SELECT key, label, 0 FROM nbr)
SELECT CAST(key // 4 AS BIGINT) AS doc_id,
       CAST(key % 4 AS BIGINT) AS span_idx,
       CAST(CASE WHEN min(label) = {sent} THEN -1
                 ELSE min(label) END AS BIGINT) AS cluster,
       CAST(max(c) AS BIGINT) AS is_core
FROM allv GROUP BY key"""


def sql_route_crossings() -> str:
    """Twin of ``pipelines/spatial.route_crossings``: the direct bbox-
    prefiltered self-join + the same four int64 orientation determinants
    (the predicate is invariant under either segment's endpoint order,
    so the unnormalized CTE endpoints give the engine's answer)."""
    from .sources.docgen import geo_points_int_sql_expr
    lat_a, lng_a = geo_points_int_sql_expr("g.j")
    lat_b, lng_b = geo_points_int_sql_expr("(g.j + 1)")
    d1 = "((b.x2 - b.x1) * (a.y1 - b.y1) - (b.y2 - b.y1) * (a.x1 - b.x1))"
    d2 = "((b.x2 - b.x1) * (a.y2 - b.y1) - (b.y2 - b.y1) * (a.x2 - b.x1))"
    d3 = "((a.x2 - a.x1) * (b.y1 - a.y1) - (a.y2 - a.y1) * (b.x1 - a.x1))"
    d4 = "((a.x2 - a.x1) * (b.y2 - a.y1) - (a.y2 - a.y1) * (b.x2 - a.x1))"
    on_b = ("{x} BETWEEN least(b.x1, b.x2) AND greatest(b.x1, b.x2) "
            "AND {y} BETWEEN least(b.y1, b.y2) AND greatest(b.y1, b.y2)")
    on_a = ("{x} BETWEEN least(a.x1, a.x2) AND greatest(a.x1, a.x2) "
            "AND {y} BETWEEN least(a.y1, a.y2) AND greatest(a.y1, a.y2)")
    proper = (f"(({d1} > 0 AND {d2} < 0) OR ({d1} < 0 AND {d2} > 0)) "
              f"AND (({d3} > 0 AND {d4} < 0) OR ({d3} < 0 AND {d4} > 0))")
    touch = " OR ".join([
        f"({d1} = 0 AND " + on_b.format(x="a.x1", y="a.y1") + ")",
        f"({d2} = 0 AND " + on_b.format(x="a.x2", y="a.y2") + ")",
        f"({d3} = 0 AND " + on_a.format(x="b.x1", y="b.y1") + ")",
        f"({d4} = 0 AND " + on_a.format(x="b.x2", y="b.y2") + ")",
    ])
    return f"""
WITH s AS MATERIALIZED (
  SELECT d.doc_id AS seg_doc, CAST(g.j + 1 AS BIGINT) AS seg_j,
         CAST({lng_a} + 1800000 AS BIGINT) AS x1,
         CAST({lat_a} + 900000 AS BIGINT) AS y1,
         CAST({lng_b} + 1800000 AS BIGINT) AS x2,
         CAST({lat_b} + 900000 AS BIGINT) AS y2
  FROM documents d,
       LATERAL (SELECT unnest(generate_series(
                    0, CAST(d.doc_id % 3 AS BIGINT) - 1)) AS j) g)
SELECT a.seg_doc AS doc_a, a.seg_j AS j_a,
       b.seg_doc AS doc_b, b.seg_j AS j_b,
       CAST(CASE WHEN {proper} THEN 1 ELSE 0 END AS BIGINT) AS proper
FROM s a JOIN s b
  ON a.seg_doc < b.seg_doc
 AND least(a.x1, a.x2) <= greatest(b.x1, b.x2)
 AND least(b.x1, b.x2) <= greatest(a.x1, a.x2)
 AND least(a.y1, a.y2) <= greatest(b.y1, b.y2)
 AND least(b.y1, b.y2) <= greatest(a.y1, a.y2)
WHERE ({proper}) OR {touch}"""


def sql_points_snap_segment(snap1e4: int = 1000) -> str:
    """Twin of ``pipelines/spatial.points_snap_segment``: the direct
    cross-doc point×segment join + the same quantized distance —
    d2q = |w|² - ceil(dot²/den) on the interior, endpoint distances on
    the clamps; ``dot*dot`` is the one product that overflows BIGINT, so
    it alone goes through HUGEINT (the engine's filtered-exact float
    path computes the identical integer). Argmin by row_number over
    (d2q, segment key)."""
    from .sources.docgen import geo_points_int_sql_expr
    lat_a, lng_a = geo_points_int_sql_expr("g.j")
    lat_b, lng_b = geo_points_int_sql_expr("(g.j + 1)")
    r2 = snap1e4 * snap1e4
    return f"""
WITH {geo_points_int_cte()},
s AS MATERIALIZED (
  SELECT d.doc_id AS seg_doc, CAST(g.j + 1 AS BIGINT) AS seg_j,
         CAST({lng_a} + 1800000 AS BIGINT) AS x1,
         CAST({lat_a} + 900000 AS BIGINT) AS y1,
         CAST({lng_b} + 1800000 AS BIGINT) AS x2,
         CAST({lat_b} + 900000 AS BIGINT) AS y2
  FROM documents d,
       LATERAL (SELECT unnest(generate_series(
                    0, CAST(d.doc_id % 3 AS BIGINT) - 1)) AS j) g),
c1 AS (
  SELECT p.key, s.seg_doc * 4 + s.seg_j AS skey,
         p.lng1e4 + 1800000 AS px, p.lat1e4 + 900000 AS py,
         s.x2, s.y2,
         p.lng1e4 + 1800000 - s.x1 AS wx, p.lat1e4 + 900000 - s.y1 AS wy,
         s.x2 - s.x1 AS vx, s.y2 - s.y1 AS vy
  FROM ipts p JOIN s ON s.seg_doc <> p.key // 4),
c2 AS (
  SELECT key, skey, px, py, x2, y2,
         wx * wx + wy * wy AS wsq,
         wx * vx + wy * vy AS dot,
         vx * vx + vy * vy AS den
  FROM c1),
c3 AS (
  SELECT key, skey,
         CASE WHEN den = 0 OR dot <= 0 THEN wsq
              WHEN dot >= den
                THEN (px - x2) * (px - x2) + (py - y2) * (py - y2)
              ELSE wsq - CAST((CAST(dot AS HUGEINT) * dot + den - 1)
                              // den AS BIGINT)
         END AS d2q
  FROM c2),
best AS (
  SELECT key, skey, d2q,
         row_number() OVER (PARTITION BY key ORDER BY d2q, skey) AS rn
  FROM c3 WHERE d2q <= {r2})
SELECT CAST(key // 4 AS BIGINT) AS doc_id,
       CAST(key % 4 AS BIGINT) AS span_idx,
       CAST(skey // 4 AS BIGINT) AS seg_doc,
       CAST(skey % 4 AS BIGINT) AS seg_j,
       CAST(d2q AS BIGINT) AS snap_d2q
FROM best WHERE rn = 1"""


def sql_zone_point_stats() -> str:
    """Twin of the ``zone_point_stats`` composite: top-1 smallest-area
    zone per point (the flagship PIP rule, same ranked CTE as
    ``sql_tz_lookup_top1``), then the per-zone rollup."""
    return f"""WITH {geo_points_cte()},
{zones_join_cte()},
ranked AS (
  SELECT doc_id, span_idx, zone_id,
         row_number() OVER (PARTITION BY doc_id, span_idx
                            ORDER BY area_rank) AS rn
  FROM zone_match),
top1 AS (SELECT doc_id, zone_id FROM ranked WHERE rn = 1)
SELECT zone_id, CAST(count(*) AS BIGINT) AS n_points,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM top1 GROUP BY zone_id"""


def sql_box_point_counts() -> str:
    """Twin of ``pipelines/spatial.box_point_counts``: LEFT JOIN BETWEEN
    point-in-rectangle + count, zero for empty boxes."""
    return f"""
WITH {geo_points_int_cte()},
{_doc_boxes_cte()},
p AS (SELECT key, lng1e4 + 1800000 AS x, lat1e4 + 900000 AS y FROM ipts)
SELECT bb.doc_id AS doc_id, CAST(count(p.key) AS BIGINT) AS n_points
FROM bb LEFT JOIN p ON p.x BETWEEN bb.xlo AND bb.xhi
                   AND p.y BETWEEN bb.ylo AND bb.yhi
GROUP BY bb.doc_id"""


def sql_points_outside_boxes() -> str:
    """Twin of ``pipelines/spatial.points_outside_boxes``: NOT EXISTS
    anti-join over the same BETWEEN predicate."""
    return f"""
WITH {geo_points_int_cte()},
{_doc_boxes_cte()},
p AS (SELECT key, lat1e4, lng1e4,
             lng1e4 + 1800000 AS x, lat1e4 + 900000 AS y FROM ipts)
SELECT CAST(key // 4 AS BIGINT) AS doc_id,
       CAST(key % 4 AS BIGINT) AS span_idx,
       lat1e4, lng1e4
FROM p
WHERE NOT EXISTS (SELECT 1 FROM bb
                  WHERE p.x BETWEEN bb.xlo AND bb.xhi
                    AND p.y BETWEEN bb.ylo AND bb.yhi)"""
