"""Distributed iterative graph algorithms over edge Datasets.

The reference engine has no graph operators (its whole surface is the
timezone lookup — ``timezonemap/src/main/kotlin/.../TimeZoneMap.kt``); a
100 TB training-data pipeline does: link-graph ranking for crawl
prioritization and quality weighting (PageRank over the page/domain
graph is the canonical example). The twist here is DETERMINISM: ranks
accumulate in scaled int64 ("micro-rank" units) with floor division, so
per-edge contributions are exact integers, partial sums are associative
(order-independent across blocks — safe to shuffle), and a SQL twin can
reproduce every iteration bit-for-bit. The float version of PageRank is
not reproducible across reduction orders; the integer version is, at the
cost of ≤1 micro-rank of floor error per in-edge per iteration.

Scale notes: per iteration the work is ONE hash join (edges ⋈ ranks on
src — both sides partitioned by the same key, no broadcast) and ONE
groupby-sum over (dst, contribution) pairs; edges never materialize on
the driver. Rank state is a node-sized Dataset, re-materialized per
iteration (the iteration count is a small constant, not data-sized).
Dangling nodes (no out-edges) leak their damped mass — the standard
simplification; callers wanting strict mass conservation should add
reverse edges or a sink node.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _distinct_edges(edges_ds, src_col: str, dst_col: str):
    """DISTINCT (src, dst) via one groupby (dedup shuffles key pairs
    only, never payloads)."""
    from ray.data.aggregate import Count

    def pick(b: pa.Table) -> pa.Table:
        return pa.table({"src": b[src_col], "dst": b[dst_col]})

    return (edges_ds.map_batches(pick, batch_format="pyarrow")
            .groupby(["src", "dst"]).aggregate(Count(alias_name="_n"))
            .select_columns(["src", "dst"]))


def pagerank_int(edges_ds, src_col: str = "src", dst_col: str = "dst",
                 iters: int = 3, damping_num: int = 85,
                 damping_den: int = 100, scale: int = 1_000_000,
                 num_partitions: int = 16):
    """Fixed-iteration PageRank in exact integer arithmetic.

    r_0(v) = ``scale`` for every node (nodes = distinct src ∪ dst of the
    DISTINCT edge set); each iteration:

        r_{i+1}(v) = (scale·(den-num))//den
                     + (num · Σ_{(u,v)∈E} r_i(u)//outdeg(u)) // den

    All terms are int64; the inner sum is associative so block order /
    partitioning cannot change the result. Returns a Dataset of
    (node_id, rank_int) after ``iters`` iterations.
    """
    from ray.data.aggregate import Sum

    from .dedup import _drop_empty_blocks

    edges = _drop_empty_blocks(
        _distinct_edges(edges_ds, src_col, dst_col).materialize())

    # static per-edge out-degree: (src, dst, d)
    from ray.data.aggregate import Count
    deg = edges.groupby("src").aggregate(Count(alias_name="d"))
    edges_deg = _drop_empty_blocks(
        edges.join(deg, join_type="inner",
                   num_partitions=num_partitions,
                   on=("src",)).materialize())

    def node_half(col):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({"id": b[col]})
        return f

    nodes = _drop_empty_blocks(
        edges.map_batches(node_half("src"), batch_format="pyarrow")
        .union(edges.map_batches(node_half("dst"), batch_format="pyarrow"))
        .groupby("id").aggregate(Count(alias_name="_n"))
        .select_columns(["id"]).materialize())

    base = (scale * (damping_den - damping_num)) // damping_den

    def init(b: pa.Table) -> pa.Table:
        return pa.table({
            "id": b["id"],
            "r": pa.array(np.full(b.num_rows, scale, dtype=np.int64))})

    ranks = nodes.map_batches(init, batch_format="pyarrow").materialize()

    def zero_rows(b: pa.Table) -> pa.Table:
        return pa.table({
            "id": b["id"],
            "m": pa.array(np.zeros(b.num_rows, dtype=np.int64))})

    for _ in range(iters):
        joined = edges_deg.join(ranks, join_type="inner",
                                num_partitions=num_partitions,
                                on=("src",), right_on=("id",))

        def contrib(b: pa.Table) -> pa.Table:
            r = b["r"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = b["d"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"id": b["dst"],
                             "m": pa.array(r // d)})

        insum = (joined.map_batches(contrib, batch_format="pyarrow")
                 .union(nodes.map_batches(zero_rows, batch_format="pyarrow"))
                 .groupby("id").aggregate(Sum("m", alias_name="m")))

        def update(b: pa.Table) -> pa.Table:
            m = b["m"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({
                "id": b["id"],
                "r": pa.array(base + (damping_num * m) // damping_den)})

        # hash-shuffle aggregates emit schema-less empty blocks for empty
        # hash partitions; the next round's join aborts on them
        ranks = _drop_empty_blocks(
            insum.map_batches(update, batch_format="pyarrow").materialize())

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"node_id": b["id"], "rank_int": b["r"]})

    return ranks.map_batches(rename, batch_format="pyarrow")


def pagerank_int_sql(edges_sql: str, iters: int = 3, damping_num: int = 85,
                     damping_den: int = 100, scale: int = 1_000_000) -> str:
    """SQL TWIN of :func:`pagerank_int`: the same iterations unrolled as
    chained CTEs in exact integer arithmetic (``//`` floor division; the
    per-edge contribution divides BEFORE the sum, the damping divides
    AFTER, exactly like the engine). ``edges_sql`` must yield DISTINCT
    directed (src, dst) rows."""
    base = (scale * (damping_den - damping_num)) // damping_den
    parts = [f"""WITH edges AS ({edges_sql}),
deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
r0 AS (SELECT id, CAST({scale} AS BIGINT) AS r FROM nodes)"""]
    for i in range(iters):
        parts.append(f""",
r{i + 1} AS (
  SELECT n.id,
         CAST({base} + ({damping_num} * COALESCE(s.m, 0)) // {damping_den}
              AS BIGINT) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS id, sum(r{i}.r // deg.d) AS m
    FROM edges e
    JOIN r{i} ON r{i}.id = e.src
    JOIN deg ON deg.src = e.src
    GROUP BY e.dst) s ON s.id = n.id)""")
    parts.append(f"""
SELECT id AS node_id, r AS rank_int FROM r{iters}""")
    return "".join(parts)


def triangle_counts(edges_ds, src_col: str = "src", dst_col: str = "dst",
                    num_partitions: int = 16):
    """Per-node triangle counts over an undirected simple graph, exact.

    Degree-oriented wedge join (the standard distributed recipe —
    Suri & Vassilvitskii, "Counting Triangles and the Curse of the Last
    Reducer", WWW'11, public method): orient each edge from the
    lower-(degree, id) endpoint to the higher, so every out-degree is
    bounded by ~√(2m) on any graph and the wedge self-join cannot blow up
    on hubs; close wedges with one more hash join against the oriented
    edge set. Each triangle is generated exactly once (its unique
    orientation-minimal apex), then credits all three corners.

    Shuffle profile: degree groupby + two hash joins, all on node keys;
    wedge volume is Σ outdeg² ≤ m^1.5. Returns (node_id, n_triangles)
    for EVERY node of the edge set (zeros included) — an exact integer
    graph invariant, independent of partitioning and orientation.
    """
    from ray.data.aggregate import Count, Sum

    from .dedup import _drop_empty_blocks

    def canon(b: pa.Table) -> pa.Table:
        s = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({"a": pa.array(np.minimum(s, d)),
                         "b": pa.array(np.maximum(s, d))})

    edges = _drop_empty_blocks(
        edges_ds.map_batches(canon, batch_format="pyarrow")
        .groupby(["a", "b"]).aggregate(Count(alias_name="_n"))
        .select_columns(["a", "b"]).materialize())

    def halves(col, out):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({out: t[col]})
        return f

    incid = edges.map_batches(halves("a", "id"), batch_format="pyarrow") \
        .union(edges.map_batches(halves("b", "id"), batch_format="pyarrow"))
    deg = _drop_empty_blocks(
        incid.groupby("id").aggregate(Count(alias_name="deg")).materialize())

    # orientation key: (deg, id) packed into one int64 (id < 2^31 assumed
    # for the packed form; at larger id spaces switch to a struct sort key)
    def rank_of(b: pa.Table) -> pa.Table:
        d = b["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        i = b["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"id": b["id"], "rk": pa.array((d << 31) + i)})

    rank = deg.map_batches(rank_of, batch_format="pyarrow").materialize()

    with_ra = _drop_empty_blocks(
        edges.join(rank, join_type="inner", num_partitions=num_partitions,
                   on=("a",), right_on=("id",)).materialize())

    def swap_cols(b: pa.Table) -> pa.Table:
        return pa.table({"a": b["a"], "b": b["b"], "ra": b["rk"]})

    with_ra = with_ra.map_batches(swap_cols, batch_format="pyarrow")
    both = _drop_empty_blocks(
        with_ra.join(rank, join_type="inner", num_partitions=num_partitions,
                     on=("b",), right_on=("id",)).materialize())

    def orient(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        bb = b["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        ra = b["ra"].to_numpy(zero_copy_only=False).astype(np.int64)
        rb = b["rk"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo_first = ra < rb
        return pa.table({
            "u": pa.array(np.where(lo_first, a, bb)),
            "v": pa.array(np.where(lo_first, bb, a)),
            "rv": pa.array(np.where(lo_first, rb, ra))})

    o = _drop_empty_blocks(
        both.map_batches(orient, batch_format="pyarrow").materialize())

    # wedges at u: ordered out-neighbor pairs (v, w) with rank(v) < rank(w)
    wedges = o.join(o, join_type="inner", num_partitions=num_partitions,
                    on=("u",), right_on=("u",), right_suffix="_r")

    def wedge_pairs(b: pa.Table) -> pa.Table:
        rv = b["rv"].to_numpy(zero_copy_only=False)
        rw = b["rv_r"].to_numpy(zero_copy_only=False)
        keep = rv < rw
        return pa.table({"u": b["u"].filter(pa.array(keep)),
                         "v": b["v"].filter(pa.array(keep)),
                         "w": b["v_r"].filter(pa.array(keep))})

    wedges = _drop_empty_blocks(
        wedges.map_batches(wedge_pairs, batch_format="pyarrow").materialize())

    def vw_edges(b: pa.Table) -> pa.Table:
        return pa.table({"v": b["u"], "w": b["v"],
                         "_e": pa.array(np.ones(b.num_rows, dtype=np.int64))})

    def zeros(b: pa.Table) -> pa.Table:
        return pa.table({"id": b["id"],
                         "t": pa.array(np.zeros(b.num_rows, dtype=np.int64))})

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"node_id": b["id"], "n_triangles": b["t"]})

    # triangle-free graphs leave wedges/tris with ZERO blocks after the
    # empty-block drop — joining a schema-less dataset aborts, so route
    # those straight to the all-zeros answer
    tris = None
    if wedges.count() > 0:
        closing = o.map_batches(vw_edges, batch_format="pyarrow")
        tris = _drop_empty_blocks(
            wedges.join(closing, join_type="inner",
                        num_partitions=num_partitions,
                        on=("v", "w"), right_on=("v", "w")).materialize())
        if tris.count() == 0:
            tris = None
    if tris is None:
        return deg.map_batches(zeros, batch_format="pyarrow") \
            .map_batches(rename, batch_format="pyarrow")

    def corners(b: pa.Table) -> pa.Table:
        ids = pa.concat_arrays([b["u"].combine_chunks(),
                                b["v"].combine_chunks(),
                                b["w"].combine_chunks()])
        return pa.table({"id": ids,
                         "t": pa.array(np.ones(len(ids), dtype=np.int64))})

    counts = tris.map_batches(corners, batch_format="pyarrow") \
        .union(deg.map_batches(zeros, batch_format="pyarrow")) \
        .groupby("id").aggregate(Sum("t", alias_name="t"))

    return _drop_empty_blocks(counts.materialize()) \
        .map_batches(rename, batch_format="pyarrow")


def triangle_counts_sql(edges_sql: str) -> str:
    """SQL TWIN of :func:`triangle_counts`: canonical a<b edges, one
    3-way self-join generating each triangle once (x<y<z), per-node
    credit by unnest; zeros via the node list. A deliberately DIFFERENT
    plan than the engine's degree-oriented wedge join — the count is a
    graph invariant, so plan-independence strengthens the check."""
    return f"""WITH raw AS ({edges_sql}),
ce AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       FROM raw WHERE src <> dst),
nodes AS (SELECT a AS id FROM ce UNION SELECT b FROM ce),
tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM ce e1
        JOIN ce e2 ON e2.a = e1.b
        JOIN ce e3 ON e3.a = e1.a AND e3.b = e2.b),
corner AS (SELECT x AS id FROM tri
           UNION ALL SELECT y FROM tri
           UNION ALL SELECT z FROM tri)
SELECT n.id AS node_id,
       CAST(COALESCE(c.t, 0) AS BIGINT) AS n_triangles
FROM nodes n LEFT JOIN (SELECT id, count(*) AS t
                        FROM corner GROUP BY id) c ON c.id = n.id"""
