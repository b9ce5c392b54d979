"""Approximate-nearest-neighbor search over an embedding column.

- ``brute_topk``: exact cosine top-k baseline — the query matrix is
  broadcast (`ray.put` once), each Arrow block computes a (block × queries)
  matmul and emits only its LOCAL top-k rows per query, so the final
  reduce sees at most ``k × n_blocks`` rows per query (never the corpus).
- ``ivf_topk``: the scale path — a driver-side mini-KMeans (on a sample)
  builds ``n_centroids`` centroids; vectors are assigned to centroids in a
  map_batches pass; queries probe only the ``nprobe`` nearest centroids.
  Recall vs brute force is tested in tests/test_ann.py.

Scores are float64 cosine computed as dot/(|a||b|) to match DuckDB's
``list_cosine_similarity`` for the oracle check.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..vecs import list_column_to_matrix


def _normalize(v: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(v, axis=1)
    n[n == 0] = 1.0
    return v / n[:, None]


class BlockTopK:
    """Per-block exact cosine scoring against the broadcast query matrix;
    emits the block-local top-k (query_id, vec_id, score) rows."""

    def __init__(self, queries_ref, k: int, vec_col="embedding",
                 id_col="vec_id"):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) \
            else queries_ref
        self.query_ids = q["query_ids"]
        self.qmat = _normalize(np.asarray(q["matrix"], dtype=np.float64))
        self.k = k
        self.vec_col, self.id_col = vec_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        v = list_column_to_matrix(batch[self.vec_col])
        sims = _normalize(v) @ self.qmat.T  # (n, q)
        k = min(self.k, sims.shape[0])
        if sims.shape[1] == 0 or k == 0:
            # empty query set / empty block: concatenate([]) raises
            return pa.table({
                "query_id": pa.array([], type=pa.int64()),
                "vec_id": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64())})
        out_q, out_v, out_s = [], [], []
        for qi in range(sims.shape[1]):
            col = sims[:, qi]
            top = np.argpartition(-col, k - 1)[:k] if k < col.size \
                else np.arange(col.size)
            out_q.append(np.full(top.size, self.query_ids[qi], dtype=np.int64))
            out_v.append(ids[top].astype(np.int64))
            out_s.append(col[top])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_v)),
            "score": pa.array(np.concatenate(out_s), type=pa.float64()),
        })


TOPK_FANIN = 32  # max partial blocks the driver merge may read


def _block_topk(k: int, score_col: str):
    """Per-block (query_id, score desc, vec_id asc) top-k combine —
    the tree-reduce round between map-side partials and the driver
    merge. Fully vectorized: one lexsort + segmented cumcount."""

    def f(b: pa.Table) -> pa.Table:
        q = b["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = b[score_col].to_numpy(zero_copy_only=False)
        v = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((v, -s, q))
        qs = q[order]
        starts = np.flatnonzero(np.r_[True, qs[1:] != qs[:-1]])
        seg_len = np.diff(np.r_[starts, len(qs)])
        cc = np.arange(len(qs)) - np.repeat(starts, seg_len)
        sel = order[cc < k]
        return pa.table({"query_id": pa.array(q[sel]),
                         "vec_id": pa.array(v[sel]),
                         score_col: pa.array(s[sel])})

    return f


def collapse_partials(partials, combine_fn, fanin: int = TOPK_FANIN):
    """Tree-reduce per-block partials: repartition + combine rounds until
    ≤ ``fanin`` blocks remain, so the driver merge reads
    O(rows_per_block · fanin) — flat in block count — instead of
    O(rows_per_block · n_blocks), which grows linearly with input size at
    a fixed block size (the 100 TB driver-merge bound)."""
    mat = partials.materialize()
    while True:
        n = mat.num_blocks()
        if n is None or n <= fanin:
            return mat
        mat = mat.repartition(max(fanin, n // fanin)).map_batches(
            combine_fn, batch_size=None,
            batch_format="pyarrow").materialize()


def _final_topk(partials, k: int, score_col: str = "score") -> pa.Table:
    """Merge block-local candidates → global top-k per query (ties broken
    by vec_id ascending — deterministic). Partials collapse through
    :func:`collapse_partials` first, so the driver merge input is bounded
    by nq·k·TOPK_FANIN regardless of how many blocks scanned."""
    import pandas as pd
    partials = collapse_partials(partials, _block_topk(k, score_col))
    pdf = partials.to_pandas()
    pdf = pdf.sort_values(["query_id", score_col, "vec_id"],
                          ascending=[True, False, True])
    pdf = pdf.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    pdf["rank"] = pdf.groupby("query_id").cumcount() + 1
    return pa.Table.from_pandas(
        pdf[["query_id", "vec_id", "rank", score_col]],
        preserve_index=False)


def mips_topk_int(ds, query_ids, query_matrix_int, k: int = 10,
                  vec_col="counts", id_col="doc_id"):
    """EXACT maximum-inner-product top-k over INTEGER vectors: block-local
    int64 matmul against the broadcast query matrix, block top-k by
    (dot desc, id asc), driver merge of ≤ nq·k rows per block. Integer
    dots are associative sums — partitioning cannot change the ranking,
    so the result is bit-reproducible (and SQL-checkable when the vectors
    are; cosine MIPS over floats is not, which is why this variant
    exists). Same task-pool shape as :func:`brute_topk`."""
    from ..vecs import list_column_to_matrix
    qids = np.asarray(query_ids, dtype=np.int64)
    qmat = np.asarray(query_matrix_int, dtype=np.int64)
    ref = ray.put({"ids": qids, "m": qmat})

    def block(b: pa.Table) -> pa.Table:
        p = ray.get(ref)
        x = list_column_to_matrix(b[vec_col], dtype=np.int64)
        dots = x @ p["m"].T  # (n, nq) int64
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        kk = min(k, len(ids))
        if len(p["ids"]) == 0 or kk == 0:
            # an empty query set (or empty block) otherwise dies in the
            # np.concatenate below (review-found empty-input hardening)
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "dot": pa.array([], type=pa.int64())})
        out_q, out_v, out_d = [], [], []
        for qi in range(len(p["ids"])):
            col = dots[:, qi]
            # top-k by (dot desc, id asc): lexsort on (-dot, id)
            sel = np.lexsort((ids, -col))[:kk]
            out_q.append(np.full(kk, p["ids"][qi], dtype=np.int64))
            out_v.append(ids[sel])
            out_d.append(col[sel])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_v)),
            "dot": pa.array(np.concatenate(out_d))})

    return _final_topk(ds.map_batches(block, batch_format="pyarrow"), k,
                       score_col="dot")


def brute_topk(ds, query_ids, query_matrix, k: int = 10,
               vec_col="embedding", id_col="vec_id", concurrency=None):
    """Exact cosine top-k of every query against the whole Dataset.

    Default is a stateless TASK pool: the broadcast query payload is
    re-wrapped per task (one (q, d) normalize — trivial next to the block
    matmul), tasks fan out across every CPU, and no actor-pool spin-up is
    paid per call (measured 2.7 s → 1.1 s on a cold 32-cpu session at
    sf0.1). Pass ``concurrency=(min, max)`` to pin an actor pool instead
    — worth it only when the query matrix is large enough that per-task
    re-normalization matters (≳ 10⁵ queries)."""
    payload = {"query_ids": np.asarray(query_ids, dtype=np.int64),
               "matrix": np.asarray(query_matrix, dtype=np.float64)}
    ref = ray.put(payload)
    if concurrency is None:
        def fn(batch: pa.Table) -> pa.Table:
            return BlockTopK(ref, k=k, vec_col=vec_col,
                             id_col=id_col)(batch)

        partials = ds.map_batches(fn, batch_format="pyarrow")
    else:
        partials = ds.map_batches(
            BlockTopK,
            fn_constructor_kwargs=dict(queries_ref=ref, k=k,
                                       vec_col=vec_col, id_col=id_col),
            batch_format="pyarrow", concurrency=concurrency)
    return _final_topk(partials, k)


# ---------------------------------------------------------------------------
# IVF (inverted-file) variant
# ---------------------------------------------------------------------------

def train_centroids(sample: np.ndarray, n_centroids: int, iters: int = 8,
                    seed: int = 5) -> np.ndarray:
    """Mini-KMeans on a driver-side sample (cosine/normalized space)."""
    sample = np.asarray(sample, dtype=np.float64)
    if sample.size == 0:
        # a zero-row sample otherwise dies inside _normalize with an
        # opaque AxisError (review-found empty-input hardening)
        raise ValueError("train_centroids: empty sample — the dataset "
                         "has no vectors to train on")
    rng = np.random.default_rng(seed)
    x = _normalize(sample)
    init = rng.choice(x.shape[0], size=min(n_centroids, x.shape[0]),
                      replace=False)
    c = x[init]
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(c.shape[0]):
            sel = x[assign == j]
            if len(sel):
                c[j] = sel.mean(axis=0)
        c = _normalize(c)
    return c


def ivf_build(ds, index_dir: str, n_centroids: int = 16,
              sample_n: int = 2000, vec_col="embedding", id_col="vec_id",
              seed: int = 5, trainer: str = "sample") -> np.ndarray:
    """Build a PHYSICALLY partitioned IVF index: one pass assigns every
    vector to its nearest centroid and the workers write
    ``index_dir/vectors/centroid_id=C/`` parquet partitions; centroids are
    saved beside them. Queries then read ONLY the ``nprobe`` probed
    partition directories — bytes read scale with nprobe / n_centroids,
    not corpus size (the piece the round-1 IVF lacked)."""
    import os

    import ray.data as rd  # noqa: F401 (ds is already a Dataset)

    if trainer == "full":
        # full-corpus spherical training via the distributed Lloyd's in
        # stages/cluster.py: normalize vectors in a streaming pass, run
        # Euclidean k-means (≡ cosine on the unit sphere), re-normalize
        # the centroids so the assign step's argmax-dot ranking matches.
        # Costs `iters` corpus scans (staged/materialized once) — use when
        # routing quality matters more than build latency.
        from .cluster import kmeans_fit

        def _norm_batch(b: pa.Table) -> pa.Table:
            v = _normalize(list_column_to_matrix(b[vec_col]))
            return pa.table({vec_col: pa.array(list(v))})

        cents, _ = kmeans_fit(
            ds.map_batches(_norm_batch, batch_format="pyarrow"),
            n_centroids, vec_col=vec_col, seed=seed,
            init_sample_n=sample_n)
        cents = _normalize(cents)
    elif trainer == "sample":
        sample = np.array([r[vec_col] for r in ds.take(sample_n)],
                          dtype=np.float64)
        cents = train_centroids(sample, n_centroids, seed=seed)
    else:
        raise ValueError(f"unknown trainer {trainer!r} "
                         "(expected 'sample' or 'full')")
    ref = ray.put(cents)

    def assign(b: pa.Table) -> pa.Table:
        c = ray.get(ref)
        v = _normalize(list_column_to_matrix(b[vec_col]))
        a = np.argmax(v @ c.T, axis=1).astype(np.int64)
        # centroid_id becomes the partition DIRECTORY (stripped from row
        # data); cid stays as a data column for per-query probe restriction
        return b.append_column("centroid_id", pa.array(a)) \
                .append_column("cid", pa.array(a))

    import shutil

    os.makedirs(index_dir, exist_ok=True)
    vec_dir = os.path.join(index_dir, "vectors")
    if os.path.isdir(vec_dir):
        # rebuilding into the same dir would APPEND beside the old files and
        # leave stale partitions keyed to previously-trained centroids —
        # same append-duplication hazard the checkpoint staging wipes
        shutil.rmtree(vec_dir)
    ds.map_batches(assign, batch_format="pyarrow") \
      .write_parquet(vec_dir, partition_cols=["centroid_id"])
    np.save(os.path.join(index_dir, "centroids.npy"), cents)
    return cents


def ivf_query(index_dir: str, query_ids, query_matrix, k: int = 10,
              nprobe: int = 4, vec_col="embedding", id_col="vec_id",
              concurrency=None):
    """Query a built IVF index: read only the union of the queries' probed
    centroid partitions (directory-level pruning via a partition filter),
    then per-query restrict to its own probe list and take block-local
    top-k. Returns (table, bytes_read_fraction) — the fraction of index
    bytes actually scanned, for the bench/scale evidence."""
    import glob
    import os

    import ray.data as rd

    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    qn = _normalize(np.asarray(query_matrix, dtype=np.float64))
    probe = np.argsort(-(qn @ cents.T), axis=1)[:, :nprobe]  # (q, nprobe)
    probed = sorted({int(c) for row in probe for c in row})

    root = os.path.join(index_dir, "vectors")
    if not os.path.isdir(root):
        raise FileNotFoundError(
            f"IVF index has no vectors dir: {root} — build crashed or "
            "was removed; rebuild with ivf_build")
    # physical pruning: ONLY the probed partitions' files are read —
    # non-probed centroids' bytes never leave storage
    probe_files = sorted(
        f for c in probed
        for f in glob.glob(os.path.join(root, f"centroid_id={c}",
                                        "*.parquet")))
    if not probe_files:
        # every probed centroid captured zero vectors (k-means can train
        # empty cells) — an empty result, not a read error
        empty = pa.table({"query_id": pa.array([], type=pa.int64()),
                          "vec_id": pa.array([], type=pa.int64()),
                          "rank": pa.array([], type=pa.int64()),
                          "score": pa.array([], type=pa.float64())})
        return empty, 0.0
    ds = rd.read_parquet(probe_files)

    def dir_bytes(dirs):
        return sum(os.path.getsize(f) for d in dirs
                   for f in glob.glob(os.path.join(d, "*.parquet")))

    all_dirs = glob.glob(os.path.join(root, "centroid_id=*"))
    probed_dirs = [os.path.join(root, f"centroid_id={c}") for c in probed]
    total = dir_bytes(all_dirs)
    frac = dir_bytes(probed_dirs) / total if total else 1.0

    payload = {"query_ids": np.asarray(query_ids, dtype=np.int64),
               "matrix": qn, "probe": probe}
    ref = ray.put(payload)

    class IVFBlockTopK:
        def __init__(self):
            p = ray.get(ref)
            self.query_ids = p["query_ids"]
            self.qmat = p["matrix"]
            self.probe = p["probe"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            assign = np.asarray(
                batch["cid"].to_numpy(zero_copy_only=False),
                dtype=np.int64)
            v = _normalize(list_column_to_matrix(batch[vec_col]))
            out_q, out_v, out_s = [], [], []
            for qi in range(self.qmat.shape[0]):
                mask = np.isin(assign, self.probe[qi])
                if not mask.any():
                    continue
                col = v[mask] @ self.qmat[qi]
                kk = min(k, col.size)
                top = np.argpartition(-col, kk - 1)[:kk] if kk < col.size \
                    else np.arange(col.size)
                out_q.append(np.full(top.size, self.query_ids[qi],
                                     dtype=np.int64))
                out_v.append(ids[mask][top].astype(np.int64))
                out_s.append(col[top])
            if not out_q:
                return pa.table({"query_id": pa.array([], type=pa.int64()),
                                 "vec_id": pa.array([], type=pa.int64()),
                                 "score": pa.array([], type=pa.float64())})
            return pa.table({
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "score": pa.array(np.concatenate(out_s), type=pa.float64()),
            })

    if concurrency is None:
        # stateless task pool: no per-call actor spin-up (same trade as
        # brute_topk — the payload re-wrap per task is trivial)
        partials = ds.map_batches(lambda b: IVFBlockTopK()(b),
                                  batch_format="pyarrow")
    else:
        partials = ds.map_batches(IVFBlockTopK, batch_format="pyarrow",
                                  concurrency=concurrency)
    return _final_topk(partials, k), frac


def ivf_topk(ds, query_ids, query_matrix, k: int = 10, n_centroids: int = 16,
             nprobe: int = 4, sample_n: int = 2000, vec_col="embedding",
             id_col="vec_id", concurrency=None, index_dir: str | None = None):
    """Build-then-query convenience wrapper (the ``queries()`` entry).
    ``index_dir=None`` builds a throwaway index under /tmp (removed after
    the query); pass a path to keep (and reuse) the physical partitioning."""
    import shutil
    import tempfile

    throwaway = index_dir is None
    if throwaway:
        index_dir = tempfile.mkdtemp(prefix="ivf_index_")
    try:
        ivf_build(ds, index_dir, n_centroids=n_centroids, sample_n=sample_n,
                  vec_col=vec_col, id_col=id_col)
        out, _frac = ivf_query(index_dir, query_ids, query_matrix, k=k,
                               nprobe=nprobe, vec_col=vec_col, id_col=id_col,
                               concurrency=concurrency)
    finally:
        if throwaway:
            shutil.rmtree(index_dir, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# Product quantization (PQ) — compressed-vector ADC scan
# ---------------------------------------------------------------------------

def _pq_train_raw(x: np.ndarray, m: int = 8, ks: int = 16,
                  iters: int = 12, seed: int = 7) -> np.ndarray:
    """PQ codebooks over PRE-TRANSFORMED vectors (no normalization) —
    the residual-encoding path trains on (x − centroid) directly."""
    x = np.asarray(x, dtype=np.float64)
    d = x.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    if ks > 256:
        raise ValueError(f"ks={ks} exceeds uint8 code space (max 256)")
    dsub = d // m
    rng = np.random.default_rng(seed)
    cbs = np.empty((m, ks, dsub), dtype=np.float64)
    for j in range(m):
        sub = x[:, j * dsub:(j + 1) * dsub]
        k_eff = min(ks, sub.shape[0])
        c = sub[rng.choice(sub.shape[0], size=k_eff, replace=False)]
        for _ in range(iters):
            dist = (-2.0 * sub @ c.T + (c ** 2).sum(1)[None, :])
            assign = np.argmin(dist, axis=1)
            for cj in range(k_eff):
                sel = sub[assign == cj]
                if len(sel):
                    c[cj] = sel.mean(axis=0)
        if k_eff < ks:  # degenerate tiny sample: pad by repeating
            c = np.vstack([c, np.repeat(c[:1], ks - k_eff, axis=0)])
        cbs[j] = c
    return cbs


def pq_train(sample: np.ndarray, m: int = 8, ks: int = 16,
             iters: int = 12, seed: int = 7) -> np.ndarray:
    """Train PQ codebooks on a driver-side sample → (m, ks, d/m).

    Standard FAISS-style recipe: split the (normalized) vector into ``m``
    subspaces and run plain-L2 Lloyd's per subspace. Training on a
    deterministic sample is the sanctioned scale path — codebooks are a
    few KB regardless of corpus size. Deterministic (seeded init, argmin
    first-wins ties)."""
    sample = np.asarray(sample, dtype=np.float64)
    if sample.size == 0:
        raise ValueError("pq_train: empty sample — the dataset has no "
                         "vectors to train on")
    return _pq_train_raw(_normalize(sample),
                         m=m, ks=ks, iters=iters, seed=seed)



def _exact_rerank(rerank_ds, shortlist, query_ids, qn, k,
                  vec_col="embedding", id_col="vec_id") -> pa.Table:
    """Shared exact re-rank for the PQ family: score the ≤ nq·L
    shortlisted candidates against their true float vectors (broadcast
    semi-filter over ``rerank_ds``), keep only (query, vec) pairs the
    ADC shortlist proposed, and emit the global top-k per query.
    One implementation for pq_topk / ivfpq_query (review-found drift
    risk in the duplicated copies)."""
    import pyarrow.compute as pc

    qids_arr = np.asarray(query_ids, dtype=np.int64)
    # per-query sorted shortlists, broadcast: the score pass emits ONLY
    # the (query, vec) pairs the ADC shortlist proposed — the previous
    # version shipped the full candidate×query cross product to the
    # driver and filtered it with a per-row Python set probe
    # (review-found: nq·(nq·L) rows instead of nq·L)
    allow = {int(q): np.sort(shortlist.loc[shortlist["query_id"] == q,
                                           "vec_id"]
                             .to_numpy().astype(np.int64))
             for q in qids_arr}
    cand_ref = ray.put(np.unique(shortlist["vec_id"].to_numpy()))
    qref = ray.put({"qids": qids_arr, "mat": qn, "allow": allow})

    def exact_scores(b: pa.Table) -> pa.Table:
        cd = ray.get(cand_ref)
        keep = pc.is_in(b[id_col], value_set=pa.array(cd))
        b = b.filter(keep)
        if b.num_rows == 0:
            return pa.table({
                "query_id": pa.array([], type=pa.int64()),
                "vec_id": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64())})
        p = ray.get(qref)
        v = _normalize(list_column_to_matrix(b[vec_col]))
        sims = v @ p["mat"].T                         # (n_cand, nq)
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out_q, out_v, out_s = [], [], []
        for qi, q in enumerate(p["qids"]):
            sl = p["allow"][int(q)]
            pos = np.searchsorted(sl, ids)
            hit = (pos < len(sl)) & (sl[np.minimum(pos, len(sl) - 1)]
                                     == ids)
            if hit.any():
                out_q.append(np.full(int(hit.sum()), q, dtype=np.int64))
                out_v.append(ids[hit])
                out_s.append(sims[hit, qi])
        if not out_q:
            return pa.table({
                "query_id": pa.array([], type=pa.int64()),
                "vec_id": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_v)),
            "score": pa.array(np.concatenate(out_s), type=pa.float64())})

    scored = rerank_ds.map_batches(exact_scores,
                                   batch_format="pyarrow").to_pandas()
    scored = scored.sort_values(
        ["query_id", "score", "vec_id"], ascending=[True, False, True])
    scored = scored.groupby("query_id", sort=True).head(k) \
        .reset_index(drop=True)
    scored["rank"] = scored.groupby("query_id").cumcount() + 1
    return pa.Table.from_pandas(
        scored[["query_id", "vec_id", "rank", "score"]],
        preserve_index=False)


def _pq_encode_kernel(v: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """Shared per-subspace argmin encode: (n, d) vectors → (n, m) uint8
    codes under codebooks (m, ks, d/m). ONE definition for pq_encode and
    ivfpq_build (review-found drift risk in the duplicated copies)."""
    m, ks, dsub = cb.shape
    codes = np.empty((v.shape[0], m), dtype=np.uint8)
    for j in range(m):
        sub = v[:, j * dsub:(j + 1) * dsub]
        dist = -2.0 * sub @ cb[j].T + (cb[j] ** 2).sum(1)[None, :]
        codes[:, j] = np.argmin(dist, axis=1).astype(np.uint8)
    return codes


def _pq_lut(q: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """Shared ADC lookup-table build: LUT[qi, j, c] = ‖q_sub − cent‖²
    → (nq, m, ks). ONE definition for pq_topk and ivfpq_query's
    non-residual path."""
    m, ks, dsub = cb.shape
    lut = np.empty((q.shape[0], m, ks), dtype=np.float64)
    for j in range(m):
        qs = q[:, j * dsub:(j + 1) * dsub]
        diff = qs[:, None, :] - cb[j][None, :, :]
        lut[:, j, :] = (diff ** 2).sum(axis=2)
    return lut


def pq_encode(ds, codebooks: np.ndarray, vec_col="embedding",
              id_col="vec_id"):
    """Encode every vector to ``m`` uint8 codes (argmin sub-centroid) —
    a 32×+ compression of the corpus (64 f32 dims → 8 bytes). Codebooks
    broadcast once via ``ray.put``; per block one (n, ks) matmul per
    subspace. Output: (vec_id, codes: fixed_size_list<uint8>[m])."""
    ref = ray.put(np.asarray(codebooks, dtype=np.float64))

    def enc(b: pa.Table) -> pa.Table:
        cb = ray.get(ref)
        v = _normalize(list_column_to_matrix(b[vec_col]))
        codes = _pq_encode_kernel(v, cb)
        flat = pa.array(codes.reshape(-1), type=pa.uint8())
        return pa.table({
            id_col: b[id_col],
            "codes": pa.FixedSizeListArray.from_arrays(flat, cb.shape[0])})

    return ds.map_batches(enc, batch_format="pyarrow")


def pq_topk(ds, query_ids, query_matrix, k: int = 10, m: int = 8,
            ks: int = 16, sample_n: int = 4000, iters: int = 12,
            rerank_l: int = 0, vec_col="embedding", id_col="vec_id"):
    """Approximate cosine top-k via PQ + ADC (asymmetric distance): train
    codebooks on a deterministic sample, encode the corpus to m-byte
    codes, then scan CODES ONLY — per block the distance is m table
    gathers per query (no float vector reads), block-local top-k, tiny
    driver merge. On unit vectors ‖q−x‖² = 2−2cos, so the emitted
    ``score = 1 − dist/2`` ranks like cosine; recall vs ``brute_topk``
    is pytest-bounded. The 100 TB story: the float corpus is read once
    at encode time; every subsequent query wave touches 8 bytes/vector."""
    from .select import sample_bottom_k

    samp_tbl = sample_bottom_k(ds.select_columns([id_col, vec_col]),
                               id_col, sample_n)
    sample = list_column_to_matrix(samp_tbl[vec_col])
    cbs = pq_train(sample, m=m, ks=ks, iters=iters)
    codes = pq_encode(ds, cbs, vec_col=vec_col, id_col=id_col)

    q = _normalize(np.asarray(query_matrix, dtype=np.float64))
    lut = _pq_lut(q, cbs)
    payload = ray.put({"lut": lut,
                       "qids": np.asarray(query_ids, dtype=np.int64)})

    def scan(b: pa.Table) -> pa.Table:
        p = ray.get(payload)
        lut_, qids = p["lut"], p["qids"]
        ids = b[id_col].to_numpy(zero_copy_only=False)
        flat = b["codes"].combine_chunks().flatten() \
            .to_numpy(zero_copy_only=False)
        cd = flat.reshape(-1, m)                       # (n, m) uint8
        nq = lut_.shape[0]
        dist = np.zeros((nq, cd.shape[0]), dtype=np.float64)
        for j in range(m):
            dist += lut_[:, j, :][:, cd[:, j]]        # (nq, n) gather
        # when re-ranking, every block must surface the full shortlist
        # width, not just k — otherwise ties are truncated per block and
        # the exact pass can never see them
        kk = min(max(k, rerank_l), cd.shape[0])
        out_q, out_v, out_s = [], [], []
        for qi in range(nq):
            row = dist[qi]
            top = np.argpartition(row, kk - 1)[:kk] if kk < row.size \
                else np.arange(row.size)
            out_q.append(np.full(top.size, qids[qi], dtype=np.int64))
            out_v.append(ids[top].astype(np.int64))
            out_s.append(1.0 - row[top] / 2.0)
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_v)),
            "score": pa.array(np.concatenate(out_s), type=pa.float64())})

    partials = codes.map_batches(scan, batch_format="pyarrow")
    if not rerank_l:
        return _final_topk(partials, k)

    # Exact re-rank (the standard IVF-PQ refinement): the ADC scan only
    # SHORTLISTS rerank_l candidates per query; their true float vectors
    # — ≤ nq·rerank_l rows by construction — are re-read via a broadcast
    # semi-filter and scored exactly. The corpus-wide pass still touches
    # only 1-byte codes.
    shortlist = _final_topk(partials, max(rerank_l, k)).to_pandas()
    return _exact_rerank(ds, shortlist, query_ids, q, k,
                         vec_col=vec_col, id_col=id_col)


def ivfpq_build(ds, index_dir: str, n_centroids: int = 16, m: int = 16,
                ks: int = 256, sample_n: int = 4000, iters: int = 12,
                vec_col="embedding", id_col="vec_id", seed: int = 5,
                residual: bool = False):
    """IVF-PQ index build — the FAISS-standard billion-vector layout,
    composing the two scale levers: coarse centroids give PHYSICAL
    partition pruning (ivf_build's win: bytes read ∝ nprobe/n_centroids)
    and product quantization shrinks what remains 16-32× (pq_encode's
    win: m uint8 codes per vector, floats never stored in the index).

    One corpus pass assigns + encodes; workers write
    ``index_dir/codes/centroid_id=C/`` parquet partitions holding ONLY
    (id, cid, codes). Codebooks + centroids (a few KB) sit beside them.
    ``residual=False`` encodes vectors directly — the query LUT is
    probe-independent (one table per query, the same ADC scan as
    ``pq_topk``). ``residual=True`` is the FAISS-standard accuracy
    upgrade: codebooks train on and codes store (x − centroid[assign]),
    whose spread is much tighter than the raw vectors', so the same m
    bytes quantize finer; the query side then builds one LUT per
    (query, probed centroid) — nprobe× more LUT work, identical scan
    cost. The flag is persisted beside the codebooks."""
    import os
    import shutil

    from .select import sample_bottom_k

    samp_tbl = sample_bottom_k(ds.select_columns([id_col, vec_col]),
                               id_col, sample_n)
    sample = list_column_to_matrix(samp_tbl[vec_col])
    cents = train_centroids(sample, n_centroids, seed=seed)
    if residual:
        sn = _normalize(np.asarray(sample, dtype=np.float64))
        res = sn - cents[np.argmax(sn @ cents.T, axis=1)]
        cbs = _pq_train_raw(res, m=m, ks=ks, iters=iters, seed=seed)
    else:
        cbs = pq_train(sample, m=m, ks=ks, iters=iters, seed=seed)
    cref, bref = ray.put(cents), ray.put(cbs)

    def assign_encode(b: pa.Table) -> pa.Table:
        c, cb = ray.get(cref), ray.get(bref)
        v = _normalize(list_column_to_matrix(b[vec_col]))
        a = np.argmax(v @ c.T, axis=1).astype(np.int64)
        if residual:
            v = v - c[a]
        codes = _pq_encode_kernel(v, cb)
        flat = pa.array(codes.reshape(-1), type=pa.uint8())
        return pa.table({
            id_col: b[id_col],
            "centroid_id": pa.array(a),
            "cid": pa.array(a),
            "codes": pa.FixedSizeListArray.from_arrays(flat, cb.shape[0])})

    os.makedirs(index_dir, exist_ok=True)
    code_dir = os.path.join(index_dir, "codes")
    if os.path.isdir(code_dir):  # same stale-partition hazard as ivf_build
        shutil.rmtree(code_dir)
    ds.map_batches(assign_encode, batch_format="pyarrow") \
        .write_parquet(code_dir, partition_cols=["centroid_id"])
    np.save(os.path.join(index_dir, "centroids.npy"), cents)
    np.save(os.path.join(index_dir, "codebooks.npy"), cbs)
    np.save(os.path.join(index_dir, "residual.npy"),
            np.array([1 if residual else 0], dtype=np.int64))
    return cents, cbs


def ivfpq_query(index_dir: str, query_ids, query_matrix, k: int = 10,
                nprobe: int = 4, rerank_ds=None, rerank_l: int = 0,
                vec_col="embedding", id_col="vec_id"):
    """Query an IVF-PQ index: probe ``nprobe`` centroid partitions
    (directory-level pruning — non-probed CODE bytes never leave
    storage), ADC-scan the probed codes per query, block-local shortlist,
    tiny driver merge; optionally re-rank the ≤ nq·rerank_l shortlist
    exactly against ``rerank_ds`` (the original float corpus) via a
    broadcast semi-filter. Returns (table, bytes_read_fraction)."""
    import glob
    import os

    import ray.data as rd

    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    cbs = np.load(os.path.join(index_dir, "codebooks.npy"))
    res_path = os.path.join(index_dir, "residual.npy")
    residual = bool(np.load(res_path)[0]) if os.path.exists(res_path) \
        else False
    m, ks, dsub = cbs.shape
    qn = _normalize(np.asarray(query_matrix, dtype=np.float64))
    probe = np.argsort(-(qn @ cents.T), axis=1)[:, :nprobe]
    probed = sorted({int(c) for row in probe for c in row})

    root = os.path.join(index_dir, "codes")
    probe_files = sorted(
        f for c in probed
        for f in glob.glob(os.path.join(root, f"centroid_id={c}",
                                        "*.parquet")))
    empty = pa.table({"query_id": pa.array([], type=pa.int64()),
                      "vec_id": pa.array([], type=pa.int64()),
                      "rank": pa.array([], type=pa.int64()),
                      "score": pa.array([], type=pa.float64())})
    if not probe_files:
        return empty, 0.0
    all_dirs = glob.glob(os.path.join(root, "centroid_id=*"))
    probed_dirs = [os.path.join(root, f"centroid_id={c}") for c in probed]

    def dir_bytes(dirs):
        return sum(os.path.getsize(f) for d in dirs
                   for f in glob.glob(os.path.join(d, "*.parquet")))

    total = dir_bytes(all_dirs)
    frac = dir_bytes(probed_dirs) / total if total else 1.0

    if residual:
        # one LUT per (query, PROBED centroid): dist²(q, c + r) over the
        # residual codebooks — LUT[qi][cid] built only for probed cells
        lut_rc = {}
        for qi in range(qn.shape[0]):
            per_c = {}
            for c in probe[qi]:
                qr = qn[qi] - cents[int(c)]
                t = np.empty((m, ks), dtype=np.float64)
                for j in range(m):
                    diff = qr[j * dsub:(j + 1) * dsub][None, :] - cbs[j]
                    t[j] = (diff ** 2).sum(axis=1)
                per_c[int(c)] = t
            lut_rc[qi] = per_c
        payload = ray.put({"lut_rc": lut_rc, "probe": probe,
                           "qids": np.asarray(query_ids,
                                              dtype=np.int64)})
    else:
        lut = _pq_lut(qn, cbs)
        payload = ray.put({"lut": lut, "probe": probe,
                           "qids": np.asarray(query_ids,
                                              dtype=np.int64)})
    kk_width = max(k, rerank_l)

    def scan(b: pa.Table) -> pa.Table:
        p = ray.get(payload)
        qids, probe_ = p["qids"], p["probe"]
        ids = b[id_col].to_numpy(zero_copy_only=False)
        cid = np.asarray(b["cid"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        flat = b["codes"].combine_chunks().flatten() \
            .to_numpy(zero_copy_only=False)
        cd = flat.reshape(-1, m)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(probe_)):
            mask = np.isin(cid, probe_[qi])
            if not mask.any():
                continue
            sub = cd[mask]
            dist = np.zeros(sub.shape[0], dtype=np.float64)
            if residual:
                sub_cid = cid[mask]
                for c, t in p["lut_rc"][qi].items():
                    cm = sub_cid == c
                    if not cm.any():
                        continue
                    sc = sub[cm]
                    dc = np.zeros(sc.shape[0], dtype=np.float64)
                    for j in range(m):
                        dc += t[j][sc[:, j]]
                    dist[cm] = dc
            else:
                lut_ = p["lut"]
                for j in range(m):
                    dist += lut_[qi, j, :][sub[:, j]]
            kk = min(kk_width, dist.size)
            top = np.argpartition(dist, kk - 1)[:kk] if kk < dist.size \
                else np.arange(dist.size)
            out_q.append(np.full(top.size, qids[qi], dtype=np.int64))
            out_v.append(ids[mask][top].astype(np.int64))
            out_s.append(1.0 - dist[top] / 2.0)
        if not out_q:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "score": pa.array([], type=pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_v)),
            "score": pa.array(np.concatenate(out_s), type=pa.float64())})

    partials = rd.read_parquet(probe_files) \
        .map_batches(scan, batch_format="pyarrow")
    if not rerank_l or rerank_ds is None:
        return _final_topk(partials, k), frac

    shortlist = _final_topk(partials, max(rerank_l, k)).to_pandas()
    if shortlist.empty:
        return empty, frac
    return _exact_rerank(rerank_ds, shortlist, query_ids, qn, k,
                         vec_col=vec_col, id_col=id_col), frac


def opq_rotation(sample: np.ndarray, m: int, seed: int = 7) -> np.ndarray:
    """Parametric OPQ rotation (Ge et al., OPQ-P; public method): rotate
    into the eigenbasis, then PERMUTE eigenvectors so every PQ subspace
    receives a balanced share of the variance (greedy: assign
    eigenvalues in descending order to the subspace with the smallest
    current log-product). Returns an orthogonal (d, d) matrix R; encode
    and query both apply ``x @ R`` — orthogonality preserves norms and
    distances, so ADC semantics are unchanged while per-subspace
    quantization error drops on anisotropic embeddings."""
    x = _normalize(np.asarray(sample, dtype=np.float64))
    d = x.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    cov = (x.T @ x) / max(len(x), 1)
    w, v = np.linalg.eigh(cov)            # ascending eigenvalues
    order = np.argsort(w)[::-1]
    w, v = w[order], v[:, order]
    # greedy balanced allocation of eigen-directions to subspaces.
    # SCALE-INVARIANT logs (centered on the mean log-eigenvalue): on
    # normalized vectors every eigenvalue is < 1, so raw logs are all
    # negative and the argmin greedy would keep refilling the same
    # subspace — the permutation degenerated to the identity
    # (review-found no-op). Centered, a large eigenvalue RAISES its
    # subspace's score and the next large one goes elsewhere.
    lw = np.log(np.maximum(w, 1e-12))
    lw = lw - lw.mean()
    logs = np.zeros(m)
    slots = np.zeros(m, dtype=np.int64)
    assign = np.empty(d, dtype=np.int64)
    for i in range(d):
        open_ = np.flatnonzero(slots < dsub)
        j = open_[np.argmin(logs[open_])]
        assign[i] = j
        logs[j] += lw[i]
        slots[j] += 1
    # column order: subspace 0's directions first, then subspace 1's, ...
    perm = np.concatenate([np.flatnonzero(assign == j) for j in range(m)])
    return v[:, perm]


def pq_topk_rotated(ds, query_ids, query_matrix, k: int = 10, m: int = 8,
                    ks: int = 16, sample_n: int = 4000, iters: int = 12,
                    rerank_l: int = 0, vec_col="embedding",
                    id_col="vec_id"):
    """`pq_topk` with a parametric-OPQ rotation learned from the same
    deterministic sample: vectors rotate inside a streaming pre-pass,
    queries rotate on the driver, then the standard PQ/ADC path runs in
    the rotated space (orthogonal ⇒ identical cosine semantics)."""
    from .select import sample_bottom_k

    samp_tbl = sample_bottom_k(ds.select_columns([id_col, vec_col]),
                               id_col, sample_n)
    sample = list_column_to_matrix(samp_tbl[vec_col])
    rot = opq_rotation(sample, m)
    rref = ray.put(rot)

    def rotate(b: pa.Table) -> pa.Table:
        r = ray.get(rref)
        v = _normalize(list_column_to_matrix(b[vec_col])) @ r
        flat = pa.array(v.reshape(-1).astype(np.float32))
        return pa.table({
            id_col: b[id_col],
            vec_col: pa.FixedSizeListArray.from_arrays(flat, v.shape[1])})

    rotated = ds.map_batches(rotate, batch_format="pyarrow")
    qrot = _normalize(np.asarray(query_matrix, dtype=np.float64)) @ rot
    return pq_topk(rotated, query_ids, qrot, k=k, m=m, ks=ks,
                   sample_n=sample_n, iters=iters, rerank_l=rerank_l,
                   vec_col=vec_col, id_col=id_col)
