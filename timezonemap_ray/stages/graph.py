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
