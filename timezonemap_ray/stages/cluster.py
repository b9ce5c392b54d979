"""Distributed k-means (Lloyd's) over an embedding column.

The reference has no clustering (it is a geo lookup engine — SURVEY §2);
this is a training-data-pipeline extension: corpus bucketing for curricula,
IVF centroid training at full-corpus fidelity, and density diagnostics.

Scale shape (the part that matters at 100 TB):

- **Stage once, iterate over blocks.** The vector column is projected and
  materialized ONCE (``select_columns([vec_col]).materialize()``) before
  the loop — Lloyd's is a multi-scan algorithm, and re-executing the
  upstream pipeline per iteration would multiply the read cost by
  ``iters`` (same staging pattern as ``select.quantile_exact``).
- **Partials, not points, shuffle.** Each iteration is ONE
  ``map_batches`` pass emitting ≤ k×(d+2) numbers per block — non-empty
  centroids' vector sums, member counts, and the block's SSE — folded
  into an O(k·d) accumulator as they stream to the driver (memory
  independent of block count). No groupby, no all-to-all; the corpus
  itself never moves.
- **Broadcast centroids.** The k×d centroid matrix ships via ``ray.put``
  once per iteration and is read zero-copy by every task.
- Per-block assignment is a vectorized ``argmin`` over the full distance
  matrix; per-centroid sums use per-dimension ``np.bincount`` (one C pass
  per dimension — no ``np.add.at`` scatter, which is an order of
  magnitude slower).

Determinism: k-means++ init is seeded on a fixed-order driver sample;
per-block partials are exact; the driver reduce sums partials in cid-major
order. Cross-block float addition order follows block arrival, so centroid
coordinates are reproducible to ~1 ulp across runs — cluster MEMBERSHIP of
well-separated data is exactly reproducible.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..vecs import list_column_to_matrix


def _pp_init(x: np.ndarray, k: int, seed: int) -> np.ndarray:
    """Seeded k-means++ on a driver-side sample: first centroid uniform,
    each next ∝ squared distance to the nearest chosen one."""
    rng = np.random.default_rng(seed)
    n = x.shape[0]
    k = min(k, n)
    first = int(rng.integers(n))
    cents = [x[first]]
    d2 = ((x - x[first]) ** 2).sum(axis=1)
    for _ in range(1, k):
        tot = float(d2.sum())
        if tot <= 0:  # all remaining points coincide with a centroid
            nxt = int(rng.integers(n))
        else:
            nxt = int(rng.choice(n, p=d2 / tot))
        cents.append(x[nxt])
        d2 = np.minimum(d2, ((x - x[nxt]) ** 2).sum(axis=1))
    return np.asarray(cents, dtype=np.float64)


def _assign_block(v: np.ndarray, c: np.ndarray):
    """(assignments, per-point squared distance) — one matmul, no loops."""
    d2 = (v * v).sum(axis=1)[:, None] - 2.0 * (v @ c.T) \
        + (c * c).sum(axis=1)[None, :]
    a = np.argmin(d2, axis=1)
    return a, np.maximum(d2[np.arange(len(a)), a], 0.0)


def kmeans_fit(ds, k: int, vec_col: str = "embedding", iters: int = 20,
               seed: int = 7, init_sample_n: int = 4096, tol: float = 1e-7):
    """Full-corpus Lloyd's. Returns ``(centroids (k, d) float64, info)``
    where ``info`` has ``iters`` (actually run) plus ``sse`` / ``counts``
    from the LAST ASSIGNMENT PASS — i.e. measured against the centroids
    *before* the final update (standard Lloyd's bookkeeping; at
    convergence, ``tol``-close to the returned-centroid stats, but after
    an ``iters``-cap stop they describe the previous iterate — use
    ``kmeans_assign`` for exact stats of the returned centroids).

    Unlike ``ann.train_centroids`` (cosine mini-KMeans on a sample, good
    enough for IVF routing), this sees EVERY vector each iteration —
    use it when cluster quality matters more than build latency."""
    proj = ds if ds.schema().names == [vec_col] \
        else ds.select_columns([vec_col])
    staged = proj.materialize()
    sample_rows = staged.take(init_sample_n)
    if not sample_rows:
        raise ValueError("kmeans_fit: dataset is empty")
    sample = np.asarray([r[vec_col] for r in sample_rows], dtype=np.float64)
    cents = _pp_init(sample, k, seed)
    k = cents.shape[0]  # may shrink if the sample had < k rows
    d = cents.shape[1]

    info = {"iters": 0, "sse": float("inf"), "counts": None}
    for it in range(iters):
        ref = ray.put(cents)

        def partial(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:  # hash-shuffle ops can emit empty blocks
                return pa.table({"cid": pa.array([], type=pa.int64()),
                                 "n": pa.array([], type=pa.int64()),
                                 "vsum": pa.array([], type=pa.list_(
                                     pa.float64())),
                                 "sse": pa.array([], type=pa.float64())})
            c = ray.get(ref)
            v = list_column_to_matrix(b[vec_col])
            a, pd2 = _assign_block(v, c)
            counts = np.bincount(a, minlength=k).astype(np.int64)
            sums = np.empty((k, d), dtype=np.float64)
            for j in range(d):  # one C-speed bincount per dimension
                sums[:, j] = np.bincount(a, weights=v[:, j], minlength=k)
            sse = np.zeros(k, dtype=np.float64)
            np.add.at(sse, a, pd2)  # k-sized scatter, not n-sized — cheap
            nz = counts > 0
            return pa.table({
                "cid": pa.array(np.arange(k, dtype=np.int64)[nz]),
                "n": pa.array(counts[nz]),
                "vsum": pa.array(list(sums[nz])),
                "sse": pa.array(sse[nz])})

        # STREAMING driver fold: O(k·d) memory independent of block count
        # (a concat-all merge would hold k·n_blocks rows). Cross-block
        # float addition follows block arrival order → centroids
        # reproducible to ~1 ulp; membership of separated data is exact.
        tot_n = np.zeros(k, dtype=np.int64)
        tot_sum = np.zeros((k, d), dtype=np.float64)
        tot_sse = 0.0
        for t in staged.map_batches(partial, batch_format="pyarrow") \
                .iter_batches(batch_size=None, batch_format="pyarrow"):
            if t.num_rows == 0:
                continue
            cids = t["cid"].to_numpy(zero_copy_only=False)
            # np.add.at, not fancy-index +=: a batch may coalesce several
            # blocks' partials, so cids can repeat within one batch
            np.add.at(tot_n, cids, t["n"].to_numpy(zero_copy_only=False))
            np.add.at(tot_sum, cids, list_column_to_matrix(t["vsum"]))
            tot_sse += float(
                t["sse"].to_numpy(zero_copy_only=False).sum())

        new = cents.copy()  # empty clusters keep their position
        nz = tot_n > 0
        new[nz] = tot_sum[nz] / tot_n[nz, None]
        shift = float(np.sqrt(((new - cents) ** 2).sum(axis=1)).max())
        cents = new
        info = {"iters": it + 1, "sse": tot_sse, "counts": tot_n}
        if shift <= tol:
            break
    return cents, info


def kmeans_assign(ds, centroids: np.ndarray, vec_col: str = "embedding"):
    """Append ``cluster_id`` (int64 nearest centroid) and ``dist2``
    (float64 squared distance) to every row — a pure streaming
    ``map_batches`` over a broadcast centroid matrix."""
    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column("cluster_id",
                                   pa.array([], type=pa.int64())) \
                    .append_column("dist2", pa.array([], type=pa.float64()))
        c = ray.get(ref)
        v = list_column_to_matrix(b[vec_col])
        a, pd2 = _assign_block(v, c)
        return b.append_column("cluster_id", pa.array(a.astype(np.int64))) \
                .append_column("dist2", pa.array(pd2))

    return ds.map_batches(assign, batch_format="pyarrow")


def kmeans_cluster_profile(ds, k: int, vec_col: str = "embedding",
                           iters: int = 20, seed: int = 7) -> pa.Table:
    """Fit + assign + per-cluster summary → (cluster_id, n, mean_dist2),
    one row per non-empty cluster, cluster ids relabeled by descending
    size (ties by cluster_id) so the output is stable under centroid
    permutation. The summary is a partial-aggregate groupby over the
    tiny (cluster_id, dist2) projection."""
    from ray.data.aggregate import Count, Mean

    # Stage the projection ONCE: fit iterates over it (its internal
    # staging detects the 1-column schema and skips re-projection) and
    # the assign pass reuses the same materialized blocks — no second
    # scan of the full-width input (review-found).
    staged = ds.select_columns([vec_col]).materialize()
    cents, _ = kmeans_fit(staged, k, vec_col=vec_col, iters=iters,
                          seed=seed)
    assigned = kmeans_assign(staged, cents, vec_col=vec_col)
    prof = assigned.select_columns(["cluster_id", "dist2"]) \
        .groupby("cluster_id") \
        .aggregate(Count(alias_name="n"), Mean("dist2",
                                               alias_name="mean_dist2"))
    t = pa.concat_tables(
        [b for b in prof.iter_batches(batch_size=None, batch_format="pyarrow")])
    idx = pa.compute.sort_indices(
        t, sort_keys=[("n", "descending"), ("cluster_id", "ascending")])
    t = t.take(idx)
    return pa.table({
        "rank": pa.array(np.arange(t.num_rows, dtype=np.int64)),
        "n": pa.compute.cast(t["n"], pa.int64()),
        "mean_dist2": pa.compute.cast(t["mean_dist2"], pa.float64())})


# ---------------------------------------------------------------------------
# integer-exact Lloyd's (SQL-twin mode)
# ---------------------------------------------------------------------------

def _quant_matrix(col, scale: int) -> np.ndarray:
    """float vectors → int64 matrix: floor(float64(x) · scale), the exact
    quantization the SQL twin reproduces (float32 widens exactly; one
    IEEE multiply; floor)."""
    m = list_column_to_matrix(col, dtype=np.float64)
    return np.floor(m * float(scale)).astype(np.int64)


def _int_assign(x: np.ndarray, c: np.ndarray, need_d2: bool = False):
    """EXACT integer nearest-centroid assignment, BLAS-accelerated.

    argmin_j ‖x_i − c_j‖² over int64 inputs via the float64 expansion
    ‖x‖² − 2·x·cᵀ + ‖c‖² when every intermediate stays below 2^53: all
    terms are then integers exactly representable in float64 (partial
    matmul sums are bounded by d·m² ≤ the guard), so the expansion
    equals the int64 distances BIT-FOR-BIT and argmin ties break
    identically — measured 50× over the broadcast-subtract kernel at
    (20k, d=64, k=4). Falls back to the int64 broadcast-subtract kernel
    when the bound fails. Returns (assign, d2_of_assigned int64 |
    None)."""
    n = x.shape[0]
    if n == 0:
        return (np.zeros(0, dtype=np.int64),
                np.zeros(0, dtype=np.int64) if need_d2 else None)
    d = x.shape[1]
    m = float(max(np.abs(x).max(initial=0), np.abs(c).max(initial=0)))
    if d * (2.0 * m) ** 2 < 2.0 ** 53:
        xf = x.astype(np.float64)
        cf = c.astype(np.float64)
        d2 = ((xf * xf).sum(1)[:, None] - 2.0 * (xf @ cf.T)
              + (cf * cf).sum(1)[None, :])
        a = np.argmin(d2, axis=1)
        if need_d2:
            return a, d2[np.arange(n), a].astype(np.int64)
        return a, None
    d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
    a = np.argmin(d2, axis=1)
    if need_d2:
        return a, d2[np.arange(n), a]
    return a, None


def _coalesce_small(m, target_bytes: int = 32 << 20):
    """Coalesce a MATERIALIZED dataset's blocks so iterative consumers
    pay per-iteration task launch proportional to data, not to the
    reader's split count. A 10 MB table read as 64 blocks costs 64
    task launches PER LLOYD'S ROUND (~1.4 s/round of pure scheduling at
    sf1.0) versus one ~15 ms kernel; at real scale blocks exceed
    ``target_bytes`` and this is a no-op. Partition-independent results
    (exact integer partials) make the repartition semantics-free."""
    try:
        nb = m.num_blocks()
        sz = m.size_bytes() or 0
    except Exception:
        return m
    want = max(1, min(nb, int(sz // target_bytes) + 1))
    if nb > 4 * want:
        return m.repartition(want).materialize()
    return m


def kmeans_int(ds, k: int = 4, iters: int = 2, vec_col: str = "embedding",
               id_col: str = "vec_id", scale: int = 10_000):
    """Lloyd's k-means in EXACT integer arithmetic — the bit-reproducible
    twin of :func:`kmeans_fit` (same distributed shape: broadcast
    centroids, one partial-sums pass per iteration, O(k·d) driver fold):

    - vectors quantize to int64 as ``floor(x·scale)``;
    - assignment = argmin of integer squared distance, ties → lowest
      centroid id;
    - centroid update = per-dimension FLOOR division of the integer
      member sum by the member count (empty clusters keep their
      previous centroid);
    - init = the quantized vectors of the ``k`` smallest ids (cid in
      that order) — deterministic, no RNG.

    Because every partial is an int64 sum, block order / partitioning
    cannot change any iterate, and an unrolled SQL twin
    (:func:`kmeans_int_sql`) reproduces assignments bit-for-bit.
    Returns a Dataset of (``id_col``, cluster, d2_int) assigned against
    the FINAL centroids.
    """
    vecs = _coalesce_small(
        ds.select_columns([id_col, vec_col]).materialize())
    cents = kmeans_int_centroids(vecs, k, iters, vec_col=vec_col,
                                 id_col=id_col, scale=scale)
    ref = ray.put(cents)

    def assign(b: pa.Table) -> pa.Table:
        c = ray.get(ref)
        x = _quant_matrix(b[vec_col], scale)
        a, d2a = _int_assign(x, c, need_d2=True)
        return pa.table({
            id_col: b[id_col],
            "cluster": pa.array(a.astype(np.int64)),
            "d2_int": pa.array(d2a),
        })

    return vecs.map_batches(assign, batch_format="pyarrow")


def kmeans_int_centroids(vecs, k: int, iters: int,
                         vec_col: str = "embedding",
                         id_col: str = "vec_id",
                         scale: int = 10_000) -> np.ndarray:
    """The FIT loop of :func:`kmeans_int` over an already-materialized
    (``id_col``, ``vec_col``) Dataset: deterministic k-smallest-ids init,
    ``iters`` exact-integer Lloyd's rounds (broadcast centroids, one
    partial-sums pass per round, O(k·d) driver fold), returning the
    final k×d int64 centroid matrix. Factored out so compositions
    (``dedup.semantic_dedup_int``) can fit once and fuse their own
    assignment into a downstream pass instead of joining against the
    assignment table."""
    # init = the k smallest ids, WITHOUT a global sort shuffle: each block
    # prunes itself to its local bottom-k (vectorized argsort), the
    # ≤ k·n_blocks survivors merge on the driver — the sample_bottom_k
    # shape, keyed by raw id
    def bottom(t: pa.Table) -> pa.Table:
        v = t[id_col].to_numpy(zero_copy_only=False)
        sel = np.argsort(v, kind="stable")[:k]
        return t.take(pa.array(sel))

    parts = [b for b in vecs.map_batches(bottom, batch_format="pyarrow")
             .iter_batches(batch_size=None, batch_format="pyarrow")
             if b.num_rows]
    init_tbl = bottom(pa.concat_tables(parts))
    cents = np.stack([
        np.floor(np.asarray(r, dtype=np.float64)
                 * float(scale)).astype(np.int64)
        for r in init_tbl[vec_col].to_pylist()])
    d = cents.shape[1]

    for _ in range(iters):
        ref = ray.put(cents)

        def partials(b: pa.Table) -> pa.Table:
            c = ray.get(ref)
            x = _quant_matrix(b[vec_col], scale)
            a, _ = _int_assign(x, c)
            kk = c.shape[0]
            cnt = np.bincount(a, minlength=kk).astype(np.int64)
            sums = np.zeros((kk, x.shape[1]), dtype=np.int64)
            for j in range(x.shape[1]):
                # float64 weights are exact here: |x|·block_rows ≪ 2^53
                sums[:, j] = np.bincount(
                    a, weights=x[:, j].astype(np.float64),
                    minlength=kk).astype(np.int64)
            return pa.table({
                "cid": pa.array(np.arange(kk, dtype=np.int64)),
                "cnt": pa.array(cnt),
                "sums": pa.array(list(sums), type=pa.list_(pa.int64())),
            })

        tot_cnt = np.zeros(cents.shape[0], dtype=np.int64)
        tot_sum = np.zeros_like(cents)
        for batch in vecs.map_batches(partials, batch_format="pyarrow") \
                         .iter_batches(batch_size=None, batch_format="pyarrow"):
            cid = batch["cid"].to_numpy(zero_copy_only=False)
            # np.add.at, not fancy-index +=: one driver batch concatenates
            # MANY blocks' partials, so cids repeat — += keeps only the
            # last occurrence per cid
            np.add.at(tot_cnt, cid,
                      batch["cnt"].to_numpy(zero_copy_only=False))
            sm = batch["sums"].combine_chunks()
            # .flatten(), not .values: sliced list arrays keep the FULL
            # child buffer under .values and would misalign the reshape
            np.add.at(tot_sum, cid,
                      sm.flatten().to_numpy(zero_copy_only=False)
                      .reshape(len(cid), d))
        nonempty = tot_cnt > 0
        new_c = cents.copy()
        new_c[nonempty] = np.floor_divide(tot_sum[nonempty],
                                          tot_cnt[nonempty, None])
        cents = new_c

    return cents


def prune_prototypes_int(ds, k: int = 4, iters: int = 2,
                         drop_num: int = 1, drop_den: int = 4,
                         vec_col: str = "embedding",
                         id_col: str = "vec_id", scale: int = 10_000):
    """Prototypicality data pruning (Sorscher et al. 2022, "Beyond
    neural scaling laws", arXiv:2206.14486 — the SSL-prototypes metric)
    in EXACT integer arithmetic: cluster with :func:`kmeans_int`, then
    inside each cluster DROP the ``drop_num/drop_den`` fraction of
    points CLOSEST to their centroid (the most prototypical / easiest
    examples — the ones the paper shows are safe to discard when data
    is abundant) and keep the rest.

    Exact semantics so the SQL twin (:func:`prune_prototypes_int_sql`)
    reproduces the kept set bit-for-bit: per cluster of size m, order by
    (d2_int asc, id asc) and drop the first ``(drop_num·m) // drop_den``
    rows. Every input is an integer (d2_int from the integer k-means),
    so partitioning cannot change the ranking.

    Distributed shape: the k-means fit is the broadcast/partial-fold
    machinery; ranking is per-cluster (ONE groupby(cluster) shuffle of
    (id, cluster, d2_int) triples — vectors never move); the same
    k ∝ corpus-size assumption as ``semantic_dedup_int`` bounds group
    size. Returns kept rows as (``id_col``, cluster, d2_int)."""
    assigned = kmeans_int(ds, k=k, iters=iters, vec_col=vec_col,
                          id_col=id_col, scale=scale)

    def prune(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False)
        d2 = g["d2_int"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, d2))
        m = len(ids)
        cut = (drop_num * m) // drop_den
        keep = pa.array(order[cut:])
        return g.take(keep)

    return assigned.groupby("cluster").map_groups(prune,
                                                  batch_format="pyarrow")


def prune_prototypes_int_sql(k: int = 4, iters: int = 2,
                             drop_num: int = 1, drop_den: int = 4,
                             scale: int = 10_000,
                             table: str = "embeddings",
                             id_col: str = "vec_id",
                             vec_col: str = "embedding") -> str:
    """SQL TWIN of :func:`prune_prototypes_int`: the unrolled k-means
    CTE chain plus one window-ranked anti-filter (drop rank ≤
    floor(num·m/den) per cluster; positives, so DuckDB ``//`` is
    floor)."""
    km = kmeans_int_sql(k=k, iters=iters, scale=scale, table=table,
                        id_col=id_col, vec_col=vec_col)
    return f"""WITH r AS (
  SELECT {id_col}, cluster, d2_int,
         row_number() OVER (PARTITION BY cluster
                            ORDER BY d2_int, {id_col}) AS rn,
         count(*) OVER (PARTITION BY cluster) AS m
  FROM ({km}))
SELECT {id_col}, cluster, d2_int
FROM r WHERE rn > ({drop_num} * m) // {drop_den}"""


def _sql_floordiv(s: str, n: str) -> str:
    """Exact FLOOR division for SQL (DuckDB ``//`` truncates toward zero
    on negatives; numpy floors): subtract the canonical non-negative
    remainder first, so truncation equals floor."""
    return f"(({s}) - ((({s}) % ({n})) + ({n})) % ({n})) // ({n})"


def kmeans_int_sql(k: int = 4, iters: int = 2, scale: int = 10_000,
                   table: str = "embeddings", id_col: str = "vec_id",
                   vec_col: str = "embedding") -> str:
    """SQL TWIN of :func:`kmeans_int`: the same Lloyd's iterations
    unrolled as chained CTEs — integer quantization, integer squared
    distances, (d2, cid)-ordered argmin, floor-division centroid updates
    with empty-cluster carryover — reproducing the final assignment
    bit-for-bit."""
    parts = [f"""WITH vq AS (
  SELECT {id_col} AS vid, d,
         CAST(floor(CAST(x AS DOUBLE) * {float(scale)!r}) AS BIGINT) AS x
  FROM (SELECT {id_col}, unnest({vec_col}) AS x,
               generate_subscripts({vec_col}, 1) AS d
        FROM {table})),
ids AS (SELECT {id_col} AS vid FROM {table} ORDER BY 1 LIMIT {k}),
c0 AS (SELECT r.cid, v.d, v.x
       FROM (SELECT vid, row_number() OVER (ORDER BY vid) - 1 AS cid
             FROM ids) r
       JOIN vq v ON v.vid = r.vid)"""]
    for i in range(iters):
        parts.append(f""",
d{i} AS (SELECT v.vid, c.cid,
                sum((v.x - c.x) * (v.x - c.x)) AS d2
         FROM vq v JOIN c{i} c ON c.d = v.d GROUP BY 1, 2),
a{i} AS (SELECT vid, cid FROM (
           SELECT vid, cid,
                  row_number() OVER (PARTITION BY vid
                                     ORDER BY d2, cid) AS rn
           FROM d{i}) WHERE rn = 1),
n{i} AS (SELECT a.cid, v.d,
                CAST({_sql_floordiv('sum(v.x)', 'count(*)')} AS BIGINT) AS x
         FROM a{i} a JOIN vq v ON v.vid = a.vid GROUP BY 1, 2),
c{i + 1} AS (SELECT c.cid, c.d, COALESCE(n.x, c.x) AS x
             FROM c{i} c LEFT JOIN n{i} n ON n.cid = c.cid AND n.d = c.d)""")
    parts.append(f""",
df AS (SELECT v.vid, c.cid, sum((v.x - c.x) * (v.x - c.x)) AS d2
       FROM vq v JOIN c{iters} c ON c.d = v.d GROUP BY 1, 2)
SELECT vid AS {id_col}, cid AS cluster, CAST(d2 AS BIGINT) AS d2_int
FROM (SELECT vid, cid, d2,
             row_number() OVER (PARTITION BY vid ORDER BY d2, cid) AS rn
      FROM df) WHERE rn = 1""")
    return "".join(parts)
