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


def _distinct_edges(edges_ds, src_col: str, dst_col: str,
                    n_parts: int = 64):
    """DISTINCT (src, dst) via coarse hash partitions + vectorized
    per-partition dedup. A ``groupby([src, dst])`` aggregate pays Ray's
    per-key dispatch on millions of mostly-singleton keys (measured 11 s
    for 1.2M pairs at sf0.1 — the same pathology ``dedup._coarse_groupby``
    exists for); partitioning by hash(src) co-locates every copy of a
    pair, so one lexsort+mask per partition dedups it (0.9 s). The SAME
    lexsort+mask also runs map-side per block (the combiner), so repeated
    pairs never enter the shuffle — the co-order/partsupp graphs repeat
    each edge many times (12M raw → ~1.6M distinct at sf1.0)."""
    from .dedup import _coarse_groupby

    def uniq_arrays(s: np.ndarray, d: np.ndarray) -> pa.Table:
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        keep = np.r_[True, (s[1:] != s[:-1]) | (d[1:] != d[:-1])] \
            if len(s) else np.empty(0, dtype=bool)
        return pa.table({"src": pa.array(s[keep]), "dst": pa.array(d[keep])})

    def pick(b: pa.Table) -> pa.Table:
        return uniq_arrays(
            b[src_col].to_numpy(zero_copy_only=False).astype(np.int64),
            b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64))

    def uniq(g: pa.Table) -> pa.Table:
        return uniq_arrays(
            g["src"].to_numpy(zero_copy_only=False).astype(np.int64),
            g["dst"].to_numpy(zero_copy_only=False).astype(np.int64))

    return _coarse_groupby(edges_ds.map_batches(pick,
                                                batch_format="pyarrow"),
                           "src", uniq, n_parts=n_parts)


def _distinct_ids(ds, cols, n_parts: int = 64):
    """DISTINCT union of int id columns → Dataset of (id), via the same
    coarse-partition vectorized dedup as :func:`_distinct_edges`."""
    from .dedup import _coarse_groupby

    def halves(b: pa.Table) -> pa.Table:
        arrs = [b[c].to_numpy(zero_copy_only=False).astype(np.int64)
                for c in cols]
        # map-side combiner: dedup within the block before shuffling
        return pa.table({"id": pa.array(np.unique(np.concatenate(arrs)))})

    def uniq(g: pa.Table) -> pa.Table:
        return pa.table({"id": pa.array(np.unique(
            g["id"].to_numpy(zero_copy_only=False)))})

    return _coarse_groupby(ds.map_batches(halves, batch_format="pyarrow"),
                           "id", uniq, n_parts=n_parts)


BROADCAST_NODES_MAX = 5_000_000  # rank-state broadcast cutover

# Max dense int64 partials a broadcast-plan fold should ingest per pass:
# each edge block emits one n_nodes-sized blob, so many small blocks make
# the driver fold ingest n_blocks × 8·n_nodes bytes per iteration.
# Coalesce the edge Dataset to at most this many blocks first.
BROADCAST_FOLD_BLOCKS_MAX = 64


# Largest raw node id the driver folds remap through a dense scatter
# table instead of sort+searchsorted: bool presence map (64 MB) plus an
# int32 codebook (256 MB) at the cap — O(edges) gather/scatter replaces
# two O(n log n) sorts (measured 0.2 s vs 2.4 s at 12M edges, round-5).
DENSE_REMAP_ID_MAX = 1 << 26


def _sorted_unique_i64(x: np.ndarray) -> np.ndarray:
    """``np.unique`` for int64 arrays via polars' multithreaded hash +
    sort — measured 0.23 s vs np.unique's 2.15 s on 12M values (round-5
    profile). Output identical (sorted distinct values); np.unique is
    the fallback."""
    try:
        import polars as pl
        return pl.Series("x", x).unique(maintain_order=False).sort() \
                 .to_numpy().astype(np.int64, copy=False)
    except ImportError:  # pragma: no cover - polars is baked in
        return np.unique(x)


def _par_searchsorted(sorted_arr: np.ndarray, values: np.ndarray,
                      chunk: int = 2_000_000) -> np.ndarray:
    """``np.searchsorted``, multithreaded over probe chunks —
    searchsorted releases the GIL and the key table is read-shared, so
    driver-fold remaps parallelize cleanly (3.4 s → ~0.4 s for 24M
    probes into a 210k-key table, round-5 profile; the binary search is
    branchy enough that one core can't hide the latency even with the
    table L2-resident)."""
    n = len(values)
    if n <= chunk:
        return np.searchsorted(sorted_arr, values).astype(np.int64)
    import concurrent.futures as cf
    import os as _os
    out = np.empty(n, dtype=np.int64)

    def fill(span):
        s, e = span
        out[s:e] = np.searchsorted(sorted_arr, values[s:e])

    spans = [(i, min(n, i + chunk)) for i in range(0, n, chunk)]
    with cf.ThreadPoolExecutor(
            max_workers=min(16, _os.cpu_count() or 4)) as ex:
        list(ex.map(fill, spans))
    return out


def _sort_i64(x: np.ndarray) -> np.ndarray:
    """``np.sort`` for int64 arrays via polars' multithreaded sort
    (0.14 s vs 0.73 s at 12M values, round-5 profile)."""
    try:
        import polars as pl
        return pl.Series("x", x).sort().to_numpy().astype(np.int64,
                                                          copy=False)
    except ImportError:  # pragma: no cover - polars is baked in
        return np.sort(x)


def _validate_packable_ids(ids: np.ndarray, where: str) -> None:
    """The packed sort/edge keys ((deg<<31)+id, (u<<32)|v) require
    0 <= id < 2^31; out-of-range ids would silently corrupt counts, so
    fail loudly instead (ADVICE r3: graph.py id-packing bound)."""
    if len(ids) and (int(ids.min()) < 0 or int(ids.max()) >= 1 << 31):
        raise ValueError(
            f"{where}: node ids must satisfy 0 <= id < 2**31 for the "
            f"packed int64 keys (got min={int(ids.min())}, "
            f"max={int(ids.max())}); remap ids first")


def _coalesce_blocks(ds, max_blocks: int = BROADCAST_FOLD_BLOCKS_MAX):
    """Repartition a materialized Dataset down to ``max_blocks`` if it has
    more, so broadcast-plan passes emit a bounded number of dense
    partials per fold (ADVICE r3: block count excluded from cutover)."""
    try:
        n = ds.num_blocks()
    except Exception:
        return ds
    if n is not None and n > max_blocks:
        return ds.repartition(max_blocks).materialize()
    return ds


def pagerank_int(edges_ds, src_col: str = "src", dst_col: str = "dst",
                 iters: int = 3, damping_num: int = 85,
                 damping_den: int = 100, scale: int = 1_000_000,
                 num_partitions: int = 16,
                 broadcast_nodes_max: int = BROADCAST_NODES_MAX,
                 driver_edges_max: int | None = None,
                 raw_count_hint: int | None = None):
    """Fixed-iteration PageRank in exact integer arithmetic.

    r_0(v) = ``scale`` for every node (nodes = distinct src ∪ dst of the
    DISTINCT edge set); each iteration:

        r_{i+1}(v) = (scale·(den-num))//den
                     + (num · Σ_{(u,v)∈E} r_i(u)//outdeg(u)) // den

    All terms are int64; the inner sum is associative so block order /
    partitioning cannot change the result. Returns a Dataset of
    (node_id, rank_int) after ``iters`` iterations.

    Two physical plans, identical output (the zscore dual-path pattern):
    node tables ≤ ``broadcast_nodes_max`` BROADCAST the (rank, outdeg)
    state via ``ray.put`` and each iteration is ONE map-only pass over
    edges emitting a dense node-indexed int64 partial per block, folded
    O(n_nodes) on the driver — no join, no shuffle (the kmeans-partials
    shape). Larger graphs fall back to the per-iteration hash join +
    groupby-sum plan (rank state stays a Dataset; nothing node-sized on
    the driver).
    """
    from ray.data.aggregate import Sum

    from .dedup import _drop_empty_blocks

    base = (scale * (damping_den - damping_num)) // damping_den

    def pick(b: pa.Table) -> pa.Table:
        return pa.table({"src": b[src_col], "dst": b[dst_col]})

    # RAW pair sets small enough to fold to the driver (same memory bound
    # the triangle broadcast plan documents: ≤ ~320 MB of int64 pairs at
    # the cap) dedup AND iterate there — no distinct-edges shuffle, no
    # node-set shuffle, zero per-iteration Dataset executions. Output
    # identical (exact integer arithmetic, associative sums).
    # ``raw_count_hint`` (an UPPER bound the caller knows, e.g. from
    # parquet metadata) lets the cutover decide without materializing or
    # counting the raw pairs at all — the winning path then consumes the
    # lazy pipeline exactly once.
    if driver_edges_max is None:
        driver_edges_max = BROADCAST_EDGES_MAX
    raw = edges_ds.map_batches(pick, batch_format="pyarrow")
    if raw_count_hint is None:
        raw = _drop_empty_blocks(raw.materialize())
        raw_count_hint = raw.count()
    if raw_count_hint <= driver_edges_max:
        return _pagerank_int_driver(raw, iters, damping_num,
                                    damping_den, scale, base)

    edges = _drop_empty_blocks(
        _distinct_edges(raw, "src", "dst").materialize())
    raw = None  # release the raw-pair blocks

    from ray.data.aggregate import Count
    nodes = _drop_empty_blocks(
        _distinct_ids(edges, ["src", "dst"]).materialize())

    n_nodes = nodes.count()
    if n_nodes <= broadcast_nodes_max:
        return _pagerank_int_broadcast(edges, nodes, n_nodes, iters,
                                       damping_num, damping_den, scale, base)

    # static per-edge out-degree: (src, dst, d)
    deg = edges.groupby("src").aggregate(Count(alias_name="d"))
    edges_deg = _drop_empty_blocks(
        edges.join(deg, join_type="inner",
                   num_partitions=num_partitions,
                   on=("src",)).materialize())

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


def _pagerank_int_driver(raw, iters: int, damping_num: int,
                         damping_den: int, scale: int, base: int):
    """Driver-exact plan for RAW pair sets ≤ BROADCAST_EDGES_MAX: fold
    the pairs once, dedup the packed (src<<32)|dst keys with the
    multithreaded hash+sort (:func:`_sorted_unique_i64`), remap node ids
    to dense codes through an O(edges) scatter table (gated by
    ``DENSE_REMAP_ID_MAX``; sort+searchsorted beyond it or for arbitrary
    int64 ids), and run the integer iterations as ``np.bincount`` folds
    — bit-identical to the distributed plans (float64 bincount weights
    are exact: every partial sum is an integer below 2^53, asserted).
    The hash dedup + dense remap cut the sf1.0 fold (12M pairs) from
    8.5 s to ~2 s (round-5 profile)."""
    import ray.data as rd

    sp, dp = [], []
    for b in raw.iter_batches(batch_size=None, batch_format="pyarrow"):
        sp.append(b["src"].to_numpy(zero_copy_only=False).astype(np.int64))
        dp.append(b["dst"].to_numpy(zero_copy_only=False).astype(np.int64))
    c0 = np.concatenate(sp) if sp else np.empty(0, dtype=np.int64)
    c1 = np.concatenate(dp) if dp else np.empty(0, dtype=np.int64)
    sp = dp = None
    if len(c0) == 0:
        ids = np.empty(0, dtype=np.int64)
        s_idx = t_idx = np.empty(0, dtype=np.int64)
    else:
        remap = None
        if not (int(min(c0.min(), c1.min())) >= 0
                and int(max(c0.max(), c1.max())) < 1 << 31):
            # arbitrary int64 node ids: dense-code remap (sorted unique
            # node set + searchsorted codes < 2·edges ≤ 40M < 2^31)
            # makes the packed dedup applicable — measured 6.6 s vs the
            # old lexsort fallback's 11.5 s at 12M pairs (round-5)
            remap = _sorted_unique_i64(np.concatenate([c0, c1]))
            c0 = _par_searchsorted(remap, c0)
            c1 = _par_searchsorted(remap, c1)
        pairs_u = _sorted_unique_i64((c0 << 32) | c1)
        c0 = c1 = None
        cs = (pairs_u >> 32).astype(np.int64)
        cd = (pairs_u & 0xFFFFFFFF).astype(np.int64)
        if remap is not None:
            # codes from the remap are already dense in [0, n_nodes)
            ids, s_idx, t_idx = remap, cs, cd
        else:
            ids, s_idx, t_idx = _dense_remap(cs, cd)
    outdeg = np.bincount(s_idx, minlength=len(ids)).astype(np.int64)
    safe_deg = np.maximum(outdeg, 1)
    # float64 bincount is exact only while the max possible in-sum
    # (n_edges·scale) stays below 2^53; exotic scales fall back to the
    # slower exact int64 scatter-add
    exact_f64 = len(s_idx) * scale < 1 << 53

    ranks = np.full(len(ids), scale, dtype=np.int64)
    for _ in range(iters):
        contrib = ranks // safe_deg
        if exact_f64:
            m = np.bincount(t_idx, weights=contrib[s_idx]
                            .astype(np.float64),
                            minlength=len(ids)).astype(np.int64)
        else:
            m = np.zeros(len(ids), dtype=np.int64)
            np.add.at(m, t_idx, contrib[s_idx])
        ranks = base + (damping_num * m) // damping_den
    return rd.from_arrow(pa.table({"node_id": pa.array(ids),
                                   "rank_int": pa.array(ranks)}))


def _pagerank_int_broadcast(edges, nodes, n_nodes: int, iters: int,
                            damping_num: int, damping_den: int,
                            scale: int, base: int):
    """Broadcast-state plan: sorted node ids define a dense index; each
    iteration maps edges once against the broadcast (rank // outdeg)
    vector and folds dense int64 per-block partials on the driver
    (associative — same result as the join plan). Edge blocks are
    coalesced first so each fold ingests at most
    ``BROADCAST_FOLD_BLOCKS_MAX`` dense partials per iteration."""
    import ray

    edges = _coalesce_blocks(edges)
    ids = np.sort(np.concatenate(
        [b["id"].to_numpy(zero_copy_only=False)
         for b in nodes.iter_batches(batch_size=None, batch_format="pyarrow")]
        or [np.empty(0, dtype=np.int64)]).astype(np.int64))
    idx_ref = ray.put(ids)

    # static out-degrees, one map-only pass
    def deg_partial(b: pa.Table) -> pa.Table:
        lookup = ray.get(idx_ref)
        s = np.searchsorted(lookup, b["src"]
                            .to_numpy(zero_copy_only=False).astype(np.int64))
        out = np.zeros(len(lookup), dtype=np.int64)
        np.add.at(out, s, 1)
        return pa.table({"v": pa.array([out.tobytes()], type=pa.binary())})

    outdeg = np.zeros(n_nodes, dtype=np.int64)
    for b in edges.map_batches(deg_partial, batch_format="pyarrow") \
                  .iter_batches(batch_size=None, batch_format="pyarrow"):
        for blob in b["v"]:
            outdeg += np.frombuffer(blob.as_py(), dtype=np.int64)

    ranks = np.full(n_nodes, scale, dtype=np.int64)
    for _ in range(iters):
        safe_deg = np.maximum(outdeg, 1)  # every node has outdeg ≥ 1 here
        contrib_ref = ray.put(ranks // safe_deg)

        def msum_partial(b: pa.Table) -> pa.Table:
            lookup = ray.get(idx_ref)
            cv = ray.get(contrib_ref)
            s = np.searchsorted(lookup, b["src"]
                                .to_numpy(zero_copy_only=False)
                                .astype(np.int64))
            t = np.searchsorted(lookup, b["dst"]
                                .to_numpy(zero_copy_only=False)
                                .astype(np.int64))
            out = np.zeros(len(lookup), dtype=np.int64)
            np.add.at(out, t, cv[s])
            return pa.table({"v": pa.array([out.tobytes()],
                                           type=pa.binary())})

        m = np.zeros(n_nodes, dtype=np.int64)
        for b in edges.map_batches(msum_partial, batch_format="pyarrow") \
                      .iter_batches(batch_size=None, batch_format="pyarrow"):
            for blob in b["v"]:
                m += np.frombuffer(blob.as_py(), dtype=np.int64)
        ranks = base + (damping_num * m) // damping_den

    import ray.data as rd
    return rd.from_arrow(pa.table({"node_id": pa.array(ids),
                                   "rank_int": pa.array(ranks)}))


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


# Oriented-edge-set broadcast cutover, a MEMORY bound: the driver fold
# holds ~2 int64 arrays of raw pairs plus the packed set (≈ 24 B/pair →
# ~480 MB at the cap), and workers map the packed set zero-copy from the
# shared object store (one copy per node, not per task). Graphs past the
# cap route to the join plan; the raw canonical pairs both plans read are
# materialized TRANSIENTLY (one upstream execution, spills under
# pressure) and released once the join plan has its deduped edge set.
def _dense_remap(a: np.ndarray, b: np.ndarray):
    """Shared node remap (was copy-pasted between the pagerank and
    triangle broadcast plans — review-found): dense scatter table when
    ids are small enough (O(edges) gathers replace O(n log n)
    searchsorted probes), else sorted-unique + parallel probes. Returns
    (sorted node ids, a positions, b positions)."""
    mx = int(max(a.max(), b.max())) if a.size else 0
    if a.size and mx <= DENSE_REMAP_ID_MAX:
        present = np.zeros(mx + 1, dtype=bool)
        present[a] = True
        present[b] = True
        ids = np.flatnonzero(present).astype(np.int64)
        codebook = np.zeros(mx + 1, dtype=np.int32)
        codebook[ids] = np.arange(len(ids), dtype=np.int32)
        return ids, codebook[a], codebook[b]
    ids = _sorted_unique_i64(np.concatenate([a, b]))
    return ids, _par_searchsorted(ids, a), _par_searchsorted(ids, b)


BROADCAST_EDGES_MAX = 20_000_000

# Max wedge pairs materialized at once inside a count_block chunk. Small
# on purpose: the chunk's ~6 int64 intermediates (~3 MB at 64k pairs) stay
# cache-resident, which beats both the per-apex Python loop (interpreter
# overhead × n_apexes) and one huge vectorized pass (DRAM-bandwidth bound:
# 4M-pair chunks measured 1.9× slower than 64k on a 32-cpu box).
WEDGE_PAIR_BUDGET = 65_536


def _segmented_pairs(seg_len: np.ndarray):
    """All local index pairs (i, j) with i < j for each segment of a
    concatenated array, fully vectorized. Given segment lengths ``n_k``,
    returns (pair_i, pair_j, pair_seg) flat arrays of length
    Σ C(n_k, 2): local i, local j, and owning segment index."""
    n = seg_len.astype(np.int64)
    rows_per_seg = np.maximum(n - 1, 0)  # one row per 'i' value
    n_rows = int(rows_per_seg.sum())
    if n_rows == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, z
    row_seg = np.repeat(np.arange(len(n), dtype=np.int64), rows_per_seg)
    row_start = np.cumsum(rows_per_seg) - rows_per_seg
    local_i = np.arange(n_rows, dtype=np.int64) - row_start[row_seg]
    row_len = n[row_seg] - 1 - local_i  # j ranges i+1 .. n_k-1
    total = int(row_len.sum())
    if total == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, z
    pair_row = np.repeat(np.arange(n_rows, dtype=np.int64), row_len)
    pr_start = np.cumsum(row_len) - row_len
    offset = np.arange(total, dtype=np.int64) - pr_start[pair_row]
    pair_i = local_i[pair_row]
    pair_j = pair_i + 1 + offset
    return pair_i, pair_j, row_seg[pair_row]


def _triangle_counts_broadcast(edges, num_partitions: int):
    """Broadcast plan over canonical (a < b) pairs, duplicates allowed:
    the driver fold that computes degrees also DEDUPS (``np.unique`` on
    the packed pair) — no distributed-dedup shuffle on this path at all.
    The oriented edge set broadcasts as ONE sorted packed-int64 array
    ((u<<32)|v — ids < 2^31, validated, same packing bound as the join
    plan's rank key); wedge enumeration + closure probe run distributed
    over apex blocks with segmented vectorized searchsorted membership
    (no per-apex Python loop) — zero joins, zero shuffles. Output
    identical to the join plan."""
    import ray
    import ray.data as rd

    # fold pairs to the driver, dedup packed, derive ids + degrees
    ap, bp = [], []
    for b in edges.iter_batches(batch_size=None, batch_format="pyarrow"):
        ap.append(b["a"].to_numpy(zero_copy_only=False).astype(np.int64))
        bp.append(b["b"].to_numpy(zero_copy_only=False).astype(np.int64))
    ca = np.concatenate(ap) if ap else np.empty(0, dtype=np.int64)
    cb = np.concatenate(bp) if bp else np.empty(0, dtype=np.int64)
    ap = bp = None
    _validate_packable_ids(np.concatenate([ca, cb]), "triangle_counts")
    pairs_u = _sorted_unique_i64((ca << 32) | cb)
    ca = cb = None
    ab = np.stack([pairs_u >> 32, pairs_u & 0xFFFFFFFF])
    ids, a_pos, b_pos = _dense_remap(ab[0], ab[1])
    deg = (np.bincount(a_pos, minlength=len(ids))
           + np.bincount(b_pos, minlength=len(ids))).astype(np.int64)

    # orient low-(deg, id) → high, pack, sort
    rk = (deg << 31) + ids
    ra = rk[a_pos]
    rb = rk[b_pos]
    lo = ra < rb
    u = np.where(lo, ab[0], ab[1])
    v = np.where(lo, ab[1], ab[0])
    packed = _sort_i64((u << 32) | v)
    adj_ref = ray.put({"ids": ids, "rk": rk, "packed": packed})

    apex = rd.from_arrow(pa.table({"u": _sorted_unique_i64(u)})) \
        .repartition(num_partitions)

    def count_block(b: pa.Table) -> pa.Table:
        st = ray.get(adj_ref)
        ids_l, rk_l, pk = st["ids"], st["rk"], st["packed"]
        counts = np.zeros(len(ids_l), dtype=np.int64)
        us = b["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo_i = np.searchsorted(pk, us << 32)
        # upper bound via side="right" on (u << 32) | 0xFFFFFFFF — the
        # previous (us + 1) << 32 probe overflowed int64 for the maximal
        # packable apex id 2^31-1, wrapping the bound negative and
        # silently dropping that apex's wedges (review-found)
        hi_i = np.searchsorted(pk, (us << 32) | np.int64(0xFFFFFFFF),
                               side="right")
        seg_len = hi_i - lo_i
        keep = seg_len >= 2
        us, lo_i, seg_len = us[keep], lo_i[keep], seg_len[keep]
        if not len(us):
            return pa.table({"v": pa.array([counts.tobytes()],
                                           type=pa.binary())})
        # gather this block's concatenated out-neighbor segments ONCE and
        # rank-sort within each segment (ranks are distinct: (deg<<31)+id
        # with unique ids), so every position pair i<j is already oriented
        # low-rank → high-rank — matching `pk` with no per-pair swap
        total = int(seg_len.sum())
        seg_start = np.cumsum(seg_len) - seg_len
        owner = np.repeat(np.arange(len(seg_len), dtype=np.int64), seg_len)
        nb_idx = (np.arange(total, dtype=np.int64) - seg_start[owner]
                  + lo_i[owner])
        nb_all = pk[nb_idx] & 0xFFFFFFFF
        nb_rank = rk_l[np.searchsorted(ids_l, nb_all)]
        nb_srt = nb_all[np.lexsort((nb_rank, owner))]
        nb_pos = np.searchsorted(ids_l, nb_srt)  # credit index per neighbor
        apex_pos = np.searchsorted(ids_l, us)
        # chunk apexes so per-chunk pair intermediates stay cache-sized
        n_pairs = seg_len * (seg_len - 1) // 2
        cum = np.cumsum(n_pairs)
        start = 0
        while start < len(us):
            done = cum[start - 1] if start else 0
            stop = max(int(np.searchsorted(
                cum, done + WEDGE_PAIR_BUDGET)) + 1, start + 1)
            sl = slice(start, stop)
            pi, pj, ps = _segmented_pairs(seg_len[sl])
            base = seg_start[sl][ps]
            gi = base + pi
            gj = base + pj
            probe = (nb_srt[gi] << 32) | nb_srt[gj]
            pos = np.searchsorted(pk, probe)
            hit = (pos < len(pk)) & (pk[np.minimum(pos, len(pk) - 1)]
                                     == probe)
            if hit.any():
                np.add.at(counts, apex_pos[sl][ps[hit]], 1)
                np.add.at(counts, nb_pos[gi[hit]], 1)
                np.add.at(counts, nb_pos[gj[hit]], 1)
            start = stop
        return pa.table({"v": pa.array([counts.tobytes()],
                                       type=pa.binary())})

    total = np.zeros(len(ids), dtype=np.int64)
    for b in apex.map_batches(count_block, batch_format="pyarrow") \
                 .iter_batches(batch_size=None, batch_format="pyarrow"):
        for blob in b["v"]:
            total += np.frombuffer(blob.as_py(), dtype=np.int64)
    return rd.from_arrow(pa.table({"node_id": pa.array(ids),
                                   "n_triangles": pa.array(total)}))


def triangle_counts(edges_ds, src_col: str = "src", dst_col: str = "dst",
                    num_partitions: int = 16,
                    broadcast_edges_max: int = BROADCAST_EDGES_MAX):
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

    canon_ds = _drop_empty_blocks(
        edges_ds.map_batches(canon, batch_format="pyarrow").materialize())

    # cutover on the RAW canonical pair count — a conservative upper bound
    # on the distinct edge count, so the broadcast plan (which dedups in
    # its own driver fold, no shuffle) is never chosen on a graph the
    # deduped cutover would reject
    if canon_ds.count() <= broadcast_edges_max:
        return _triangle_counts_broadcast(canon_ds, num_partitions)

    def rename_ab(b: pa.Table) -> pa.Table:
        return pa.table({"a": b["src"], "b": b["dst"]})

    edges = _drop_empty_blocks(
        _distinct_edges(canon_ds, "a", "b")
        .map_batches(rename_ab, batch_format="pyarrow").materialize())
    canon_ds = None  # release the raw-pair blocks; only deduped edges live on

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
        _validate_packable_ids(i, "triangle_counts")
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


def cooccur_edges(ds, group_col: str, item_col: str, n_parts: int = 64):
    """Canonical co-occurrence edges: all item pairs (a < b) sharing a
    group (parts per order, tokens per doc, pages per session) — the
    standard edge-builder feeding :func:`triangle_counts` /
    :func:`pagerank_int`.

    ONE coarse hash shuffle on ``group_col`` co-locates each group, then
    a single vectorized pass per partition: lexsort (group, item), dedup
    (group, item) rows, segment per group, and enumerate position pairs
    with :func:`_segmented_pairs` (items sorted within a group, so pairs
    come out canonical a < b with no per-pair compare). Replaces the
    generic ``ds.join(ds, on=group)`` + filter plan — no join machinery,
    no oriented+reversed duplicate rows through the object store; pair
    volume is Σ C(group_size, 2), identical to the join's post-filter
    output. Pairs are deduped within each PARTITION (one lexsort+mask at
    partition end); the SAME pair from groups in different partitions can
    still repeat, so feed the result through ``_distinct_edges``
    (``triangle_counts`` does this anyway) when a simple graph is
    required. A group whose pair count alone exceeds the budget is
    enumerated in bounded i-row slices, so a hub group cannot blow the
    partition heap (its total pair VOLUME is still C(n, 2) — cap group
    sizes upstream if that is unacceptable).
    """

    def pick(b: pa.Table) -> pa.Table:
        return pa.table({"g": b[group_col], "i": b[item_col]})

    def emit(outs, a, b2):
        if len(a):
            outs[0].append(a)
            outs[1].append(b2)

    def giant_group(outs, items):
        # one group with C(n,2) > budget: slice the pair triangle by
        # i-rows so each materialized piece stays ≤ ~budget pairs
        n = len(items)
        i0 = 0
        while i0 < n - 1:
            # rows i0..i1-1; row i contributes n-1-i pairs
            rows = 0
            i1 = i0
            while i1 < n - 1 and rows + (n - 1 - i1) <= WEDGE_PAIR_BUDGET:
                rows += n - 1 - i1
                i1 += 1
            i1 = max(i1, i0 + 1)
            row_len = (n - 1) - np.arange(i0, i1, dtype=np.int64)
            pr = np.repeat(np.arange(i0, i1, dtype=np.int64), row_len)
            off = (np.arange(int(row_len.sum()), dtype=np.int64)
                   - np.repeat(np.cumsum(row_len) - row_len, row_len))
            emit(outs, items[pr], items[pr + 1 + off])
            i0 = i1

    def per_part(g: pa.Table) -> pa.Table:
        k = g["g"].to_numpy(zero_copy_only=False).astype(np.int64)
        it = g["i"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((it, k))
        k, it = k[order], it[order]
        keep = np.r_[True, (k[1:] != k[:-1]) | (it[1:] != it[:-1])]
        k, it = k[keep], it[keep]
        bounds = np.flatnonzero(np.r_[True, k[1:] != k[:-1], True])
        seg_len = np.diff(bounds)
        outs = ([], [])
        n_pairs = seg_len * (seg_len - 1) // 2
        giant = n_pairs > WEDGE_PAIR_BUDGET
        for s in np.flatnonzero(giant):
            giant_group(outs, it[bounds[s]:bounds[s + 1]])
        seg_len2 = seg_len[~giant]
        bounds2 = bounds[:-1][~giant]
        n_pairs2 = n_pairs[~giant]
        # chunk normal groups so pair intermediates stay cache-sized
        cum = np.cumsum(n_pairs2)
        start = 0
        while start < len(seg_len2):
            done = cum[start - 1] if start else 0
            stop = max(int(np.searchsorted(
                cum, done + WEDGE_PAIR_BUDGET)) + 1, start + 1)
            sl = slice(start, stop)
            pi, pj, ps = _segmented_pairs(seg_len2[sl])
            base = bounds2[sl][ps]
            emit(outs, it[base + pi], it[base + pj])
            start = stop
        if not outs[0]:
            e = np.empty(0, np.int64)
            return pa.table({"src": pa.array(e), "dst": pa.array(e)})
        # ONE partition-wide dedup (pairs can repeat across chunks and
        # across groups)
        a = np.concatenate(outs[0])
        b2 = np.concatenate(outs[1])
        o2 = np.lexsort((b2, a))
        a, b2 = a[o2], b2[o2]
        k2 = np.r_[True, (a[1:] != a[:-1]) | (b2[1:] != b2[:-1])]
        return pa.table({"src": pa.array(a[k2]), "dst": pa.array(b2[k2])})

    from .dedup import _coarse_groupby
    return _coarse_groupby(ds.map_batches(pick, batch_format="pyarrow"),
                           "g", per_part, n_parts=n_parts)


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
