"""Deduplication operators over the documents / embeddings tables.

Five flavors, each expressed Ray-Data-first:

- **exact**: content digest → ``groupby(digest)`` → min doc_id per group.
  The one shuffle moves only (digest, doc_id) pairs, never text.
- **MinHash + LSH**: shingle → minhash signature → band rows →
  ``groupby(band_key)`` buckets → in-bucket signature comparison → candidate
  pairs → driver-side union-find (pairs ≪ corpus). The signature matrix
  rides along the band rows so bucket verification is local to the group.
- **SimHash**: 64-bit fingerprints, banded into 4×16-bit keys; near-dup if
  Hamming distance ≤ k within a shared band (pigeonhole: any pair with ≤3
  differing bits shares at least one exact 16-bit band).
- **n-gram Jaccard**: exact shingle-set Jaccard verification of the LSH
  candidate pairs (broadcast of the candidate texts — candidates are small).
- **embedding cosine**: random-hyperplane LSH buckets over the embedding
  column, exact cosine within buckets.

Partitioning assumption (documented per SURVEY §2 custom-operator rule):
near-dup detection relies on LSH banding so that any near-pair co-locates in
at least one ``groupby`` bucket; bucket sizes are bounded w.h.p. by hash
uniformity, and a pathological giant bucket is capped (``MAX_BUCKET``) with
a logged drop counter rather than an O(n²) blowup.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .text import _splitmix64, md5_digest, token_hashes
from ..vecs import list_column_to_matrix

MERSENNE = np.uint64((1 << 61) - 1)
MAX_BUCKET = 2000  # cap pairwise work per LSH bucket


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------

def exact_dedup(ds, text_col: str = "text"):
    """→ (doc_id, n_dupes): smallest doc_id per identical-text group."""
    from ray.data.aggregate import Count, Min
    digested = ds.map_batches(
        lambda b: md5_digest(b, text_col).select(["doc_id", "digest"]),
        batch_format="pyarrow")
    agg = digested.groupby("digest").aggregate(
        Min("doc_id", alias_name="doc_id"), Count(alias_name="n_dupes"))
    return agg.select_columns(["doc_id", "n_dupes"])


# ---------------------------------------------------------------------------
# minhash
# ---------------------------------------------------------------------------

def _perm_params(num_perm: int, seed: int = 17):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(MERSENNE), size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, int(MERSENNE), size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(num_perm,) uint64 minhash of a shingle-hash set (vectorized)."""
    if hashes.size == 0:
        return np.full(a.size, np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        # (num_perm, n) universal hash; wrapping mult is fine for minhash
        m = (a[:, None] * hashes[None, :] + b[:, None]) % MERSENNE
    return m.min(axis=1)


MAX_TOKEN_CACHE = 1 << 20  # per-actor token-hash memo bound


class MinHasher:
    """Actor-pool stage: doc → ``bands`` rows (doc_id, band, band_key, sig).
    Permutation params are built once per actor in ``__init__``; the
    per-token hash memo persists across batches (bounded). Everything but
    the per-doc shingle pass is vectorized numpy: signatures fill one
    (n, num_perm) matrix, band keys are a splitmix64 fold over the band
    segments for ALL docs at once, and the output columns are assembled
    with repeat/tile — no per-(doc, band) Python loop."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle: int = 3,
                 text_col: str = "text", seed: int = 17,
                 emit_sig: bool = True, hash_fn: str = "blake2b"):
        assert num_perm % bands == 0
        self.a, self.b = _perm_params(num_perm, seed)
        self.num_perm, self.bands, self.shingle = num_perm, bands, shingle
        self.rows_per_band = num_perm // bands
        self.text_col = text_col
        self.emit_sig = emit_sig
        from .text import hash_u64, hash_u64_md5
        self.hasher = hash_u64_md5 if hash_fn == "md5" else hash_u64
        self.token_cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch[self.text_col].to_pylist()
        if len(self.token_cache) > MAX_TOKEN_CACHE:
            self.token_cache.clear()
        n = len(texts)
        sigs = np.empty((n, self.num_perm), dtype=np.uint64)
        for i, t in enumerate(texts):
            sigs[i] = minhash_signature(
                token_hashes(t or "", self.shingle,
                             token_cache=self.token_cache,
                             hasher=self.hasher),
                self.a, self.b)
        # vectorized band keys (deterministic across processes): fold each
        # band's signature rows through splitmix64, salted by band index
        segs = sigs.reshape(n, self.bands, self.rows_per_band)
        keys = _splitmix64(np.full((n, self.bands), np.uint64(0x51ED270B))
                           ^ np.arange(self.bands, dtype=np.uint64)[None, :])
        for j in range(self.rows_per_band):
            keys = _splitmix64(keys ^ segs[:, :, j])
        keys = (keys & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)

        bnd = self.bands
        cols = {
            "doc_id": pa.array(np.repeat(doc_ids, bnd)),
            "band": pa.array(np.tile(np.arange(bnd, dtype=np.int32), n)),
            "band_key": pa.array(keys.ravel(), type=pa.int64()),
        }
        if self.emit_sig:
            offsets = np.arange(0, n * bnd * self.num_perm + 1, self.num_perm,
                                dtype=np.int64)
            cols["sig"] = pa.LargeListArray.from_arrays(
                pa.array(offsets, type=pa.int64()),
                pa.array(np.repeat(sigs, bnd, axis=0).ravel(),
                         type=pa.uint64()))
        return pa.table(cols)


def _coarse_groupby(ds, key_col: str, part_fn, n_parts: int = 64):
    """ONE ``map_groups`` call per coarse hash partition of the key space —
    replaces ``groupby(key)`` when per-key groups are tiny (millions of
    mostly-singleton LSH buckets): Ray's per-group Python dispatch (µs ×
    n_groups) and per-key aggregation dominate wall time there, while a
    coarse partition keeps every key's rows co-located and hands
    ``part_fn`` a whole partition to process vectorized."""

    def add_part(b: pa.Table) -> pa.Table:
        k = b[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = (_splitmix64(k) % np.uint64(n_parts)).astype(np.int64)
        return b.append_column("_part", pa.array(part))

    parts = ds.map_batches(add_part, batch_format="pyarrow")
    return parts.groupby("_part").map_groups(part_fn, batch_format="pyarrow")


def _runs_map_groups(ds, key_col: str, run_fn, n_parts: int = 64,
                     empty_schema=None):
    """Per-bucket pair extraction over coarse partitions: inside each part,
    sort by key vectorized, slice runs, and invoke ``run_fn`` only on runs
    with ≥ 2 rows (true candidate buckets — their count is bounded by
    duplicate volume, not corpus size)."""

    def per_part(g: pa.Table) -> pa.Table:
        keys = g[key_col].to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        ks = keys[order]
        bounds = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1], True])
        outs = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            outs.append(run_fn(g.take(pa.array(order[s:e]))))
        if outs:
            return pa.concat_tables(
                [t for t in outs if t.num_rows] or outs[:1])
        return empty_schema if empty_schema is not None else pa.table(
            {"a": pa.array([], type=pa.int64()),
             "b": pa.array([], type=pa.int64())})

    return _coarse_groupby(ds, key_col, per_part, n_parts=n_parts)


def _hot_keys(rows, key_col: str, n_parts: int = 64):
    """Keys appearing ≥ 2 times, via vectorized per-partition ``np.unique``
    (a Ray ``groupby(key).count`` would per-key-aggregate millions of
    singletons). Output is bounded by candidate-bucket volume."""

    def per_part(g: pa.Table) -> pa.Table:
        uniq, cnt = np.unique(g[key_col].to_numpy(zero_copy_only=False),
                              return_counts=True)
        return pa.table({key_col: pa.array(uniq[cnt >= 2])})

    return _coarse_groupby(rows, key_col, per_part, n_parts=n_parts)


def _bucket_pairs(group: pa.Table, threshold: float):
    """Candidate pairs inside one LSH bucket whose estimated Jaccard
    (signature agreement rate) >= threshold."""
    n = group.num_rows
    if n < 2:
        return []
    if n > MAX_BUCKET:
        # no silent caps: a pathological giant bucket is truncated AND logged
        import logging
        logging.getLogger(__name__).warning(
            "LSH bucket truncated: %d rows > MAX_BUCKET=%d (%d dropped)",
            n, MAX_BUCKET, n - MAX_BUCKET)
        group = group.slice(0, MAX_BUCKET)
        n = MAX_BUCKET
    doc = group["doc_id"].to_pylist()
    arr = group["sig"].combine_chunks()  # fixed-length lists: zero-copy view
    sigs = arr.values.to_numpy(zero_copy_only=False).reshape(len(arr), -1)
    eq = (sigs[:, None, :] == sigs[None, :, :]).mean(axis=2)
    ii, jj = np.nonzero(np.triu(eq >= threshold, k=1))
    return [(min(doc[i], doc[j]), max(doc[i], doc[j])) for i, j in zip(ii, jj)]


HASH_BATCH = 4096  # split big blocks so the hasher stage parallelizes

# per-worker-process stage memo: hasher stages run as PLAIN TASKS (fused
# with upstream reads, no actor-pool ramp-up — the same lesson as the
# joiner's task pool, PERF.md) while still building params / token caches
# once per process
_STAGE_MEMO: dict = {}


def _memoized_stage(cls, **kwargs):
    key = (cls.__name__, tuple(sorted(kwargs.items())))

    def run(batch: pa.Table) -> pa.Table:
        inst = _STAGE_MEMO.get(key)
        if inst is None:
            inst = cls(**kwargs)
            _STAGE_MEMO[key] = inst
        return inst(batch)

    return run


def minhash_candidate_pairs_ds(ds, num_perm=64, bands=16, shingle=3,
                               threshold=0.5, text_col="text",
                               hash_fn="blake2b"):
    """documents → LSH → verified-by-signature candidate pairs, as a
    DATASET of (a, b) int64 rows with a < b (always a Dataset — an empty
    one for a duplicate-free corpus; ``minhash_candidate_pairs`` is the
    driver-side set view).

    Two passes, both vectorized end-to-end:

    1. **hot-bucket discovery** — hash only (no signature payload): band
       keys → ``groupby(band_key).count`` → keys with ≥ 2 docs. The shuffle
       moves (doc_id, band_key) ints; the hot-key set is bounded by
       duplicate volume and broadcast via ``ray.put``.
    2. **pair extraction** — recompute band rows WITH signatures but filter
       to hot keys inside the same ``map_batches`` (the full-size signature
       dataset never exists), then ``_runs_map_groups`` slices true buckets
       out of ``n_parts`` coarse groups and verifies signature agreement
       per bucket. (At 100 TB, persist the pass-1 band rows to parquet
       instead of recomputing the hashes — the hashing is cheap relative to
       the read, so recompute is the right local trade.)
    """
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    mk = dict(num_perm=num_perm, bands=bands, shingle=shingle,
              text_col=text_col, hash_fn=hash_fn)
    keys_only = ds.map_batches(
        _memoized_stage(MinHasher, emit_sig=False, **mk),
        batch_format="pyarrow", batch_size=HASH_BATCH)
    hot = _hot_keys(keys_only, "band_key").to_pandas()
    if hot.empty:
        # duplicate-free corpus: an EMPTY PAIRS DATASET (same schema), not
        # a set — every caller expects a Dataset
        return rd.from_arrow(pa.table({"a": pa.array([], type=pa.int64()),
                                       "b": pa.array([], type=pa.int64())}))
    hot_ref = ray.put(pa.array(hot["band_key"].to_numpy(), type=pa.int64()))

    def keep_hot(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b["band_key"], value_set=ray.get(hot_ref)))

    cand = ds.map_batches(
        _memoized_stage(MinHasher, emit_sig=True, **mk),
        batch_format="pyarrow", batch_size=HASH_BATCH) \
        .map_batches(keep_hot, batch_format="pyarrow")

    def pairs_of_run(g: pa.Table) -> pa.Table:
        ps = _bucket_pairs(g, threshold)
        if not ps:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64())})
        return pa.table({"a": [p[0] for p in ps], "b": [p[1] for p in ps]})

    return _runs_map_groups(cand, "band_key", pairs_of_run)


def minhash_candidate_pairs(ds, num_perm=64, bands=16, shingle=3,
                            threshold=0.5, text_col="text") -> set:
    """Driver-side set view of ``minhash_candidate_pairs_ds`` (kept for
    callers/tests that inspect the pair set directly)."""
    pdf = minhash_candidate_pairs_ds(
        ds, num_perm=num_perm, bands=bands, shingle=shingle,
        threshold=threshold, text_col=text_col).to_pandas()
    if pdf.empty or "a" not in pdf.columns:
        return set()
    return set(zip(pdf["a"].astype(int), pdf["b"].astype(int)))


class UnionFind:
    def __init__(self):
        self.parent = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = p = self.parent.setdefault(p, p)
            x, p = p, self.parent[p]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def clusters_from_pairs(doc_ids, pairs) -> dict:
    """doc_id → cluster_id (= smallest doc_id in the component)."""
    uf = UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    return {d: uf.find(d) for d in doc_ids}


def _drop_empty_blocks(mat_ds):
    """Rebuild a materialized Dataset without its empty blocks.

    Ray's hash-shuffle aggregate emits SCHEMA-LESS empty blocks for empty
    hash partitions; ``map_batches`` forwards empty blocks without invoking
    the UDF, so they cannot be repaired in-stream — and a later
    ``Dataset.join`` aborts on them ("No match ... FieldRef.Name(...) on
    right side"). Block metadata (not data) decides, so nothing is fetched
    to the driver."""
    import ray.data as rd
    refs = []
    for bundle in mat_ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if (meta.num_rows or 0) > 0:
                refs.append(ref)
    if not refs:
        return mat_ds
    return rd.from_arrow_refs(refs)


def clusters_from_pairs_ds(ids_ds, pairs_ds, id_col: str = "doc_id",
                           max_iters: int = 64, num_partitions: int = 16,
                           shortcut: bool = True):
    """Distributed connected components for pair volumes beyond driver RAM:
    iterative min-label propagation (hash-join labels to edges, then
    ``groupby(id).min(label)``) until fixpoint, with POINTER SHORTCUTTING
    (``shortcut=True``): after each edge round, labels join themselves
    (``label → label-of-label``), doubling the hop distance covered per
    round — O(log diameter) rounds instead of O(diameter), the classic
    Shiloach-Vishkin/hash-to-min recipe. Each round is 1-2 shuffle joins
    + one shuffle aggregate over (id, label) pairs only — never documents.

    Returns a Dataset of (``id_col``, cluster_id) with cluster_id = the
    smallest id in the component (identical to ``clusters_from_pairs`` —
    shortcutting only accelerates convergence to the same fixpoint)."""
    from ray.data.aggregate import Min

    def sym(b: pa.Table) -> pa.Table:
        a, bb = b["a"], b["b"]
        return pa.table({
            "src": pa.concat_arrays([a.combine_chunks(), bb.combine_chunks()]),
            "dst": pa.concat_arrays([bb.combine_chunks(), a.combine_chunks()]),
        })

    edges = pairs_ds.map_batches(sym, batch_format="pyarrow").materialize()
    n_edges = edges.count()
    # shuffle-partition count tracks data volume: 16 hash partitions (and
    # their aggregator actors) are pure overhead for a few thousand label
    # rows, while big graphs keep the full width
    num_partitions = max(2, min(num_partitions, n_edges // 50_000 + 2))

    def init_labels(b: pa.Table) -> pa.Table:
        return pa.table({"id": b[id_col], "label": b[id_col]})

    labels = ids_ds.map_batches(init_labels,
                                batch_format="pyarrow").materialize()
    if n_edges == 0:
        out = labels
    else:
        prev_sum = labels.sum("label")
        converged = False
        # +1: convergence is only OBSERVABLE as a no-change round, so a
        # component of diameter exactly max_iters needs one confirming pass
        for _ in range(max_iters + 1):
            prop = edges.join(labels, join_type="inner",
                              num_partitions=num_partitions,
                              on=("src",), right_on=("id",))
            prop = prop.map_batches(
                lambda b: pa.table({"id": b["dst"], "label": b["label"]}),
                batch_format="pyarrow")
            labels = _drop_empty_blocks(
                labels.union(prop).groupby("id").aggregate(
                    Min("label", alias_name="label")).materialize())
            if shortcut:
                # label ← label(label): doubles covered hops per round
                jl = labels.join(labels, join_type="inner",
                                 num_partitions=num_partitions,
                                 on=("label",), right_on=("id",),
                                 right_suffix="_r")
                labels = _drop_empty_blocks(jl.map_batches(
                    lambda b: pa.table({"id": b["id"],
                                        "label": b["label_r"]}),
                    batch_format="pyarrow").materialize())
            # label sums are strictly decreasing until fixpoint
            s = labels.sum("label")
            if s == prev_sum:
                converged = True
                break
            prev_sum = s
        if not converged:
            # min-label propagation advances one hop per round: a component
            # whose diameter exceeds max_iters would otherwise be SILENTLY
            # split into multiple clusters
            raise RuntimeError(
                f"connected components did not converge in {max_iters} "
                "rounds — a duplicate component's diameter exceeds the "
                "iteration budget; raise max_iters (rounds are O(diameter))")
        out = labels

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({id_col: b["id"], "cluster_id": b["label"]})

    return out.map_batches(rename, batch_format="pyarrow")



DRIVER_PAIR_LIMIT = 2_000_000  # pairs beyond this go distributed


def cluster_assign(ds, pairs_ds, id_col: str = "doc_id",
                   driver_pair_limit: int = DRIVER_PAIR_LIMIT):
    """→ (id, cluster_id, is_duplicate) from a PAIRS DATASET, auto-routing
    the transitive closure: pair volumes within driver RAM use the
    union-find broadcast path (fast, zero extra shuffles); beyond the limit
    the distributed label-propagation ``clusters_from_pairs_ds`` runs —
    identical output either way (equivalence tested)."""
    import pyarrow.compute as pc
    pairs_ds = pairs_ds.materialize()  # (a, b) ints only; count+read once
    n_pairs = pairs_ds.count()
    if n_pairs <= driver_pair_limit:
        pdf = pairs_ds.to_pandas()
        pairs = set() if (pdf.empty or "a" not in pdf.columns) else \
            set(zip(pdf["a"].astype(int), pdf["b"].astype(int)))
        return _cluster_output_ds(ds, pairs, id_col=id_col)
    labels = clusters_from_pairs_ds(ds, pairs_ds, id_col=id_col)

    def flag(b: pa.Table) -> pa.Table:
        return b.append_column(
            "is_duplicate", pc.not_equal(b["cluster_id"], b[id_col]))

    return labels.map_batches(flag, batch_format="pyarrow")


def _cluster_output_ds(ds, pairs, id_col: str = "doc_id"):
    """Distributed cluster assignment: only PAIRED ids hit the driver's
    union-find; their (sorted ids, cluster ids) arrays are broadcast and
    every row resolves cluster = lookup-or-self via one vectorized
    ``np.searchsorted`` per batch — no per-row Python on the hot path.
    Non-integer id columns (strings, nullable) route to the dict-lookup
    fallback instead, same output. Unpaired docs never leave the
    workers."""
    import ray as _ray
    paired = sorted({d for p in pairs for d in p})
    mapping = clusters_from_pairs(paired, pairs)
    try:
        int_ids = pa.types.is_integer(ds.schema().base_schema.field(
            id_col).type)
    except Exception:
        int_ids = False
    if not int_ids:
        ref0 = _ray.put(mapping)

        def assign_any(b: pa.Table) -> pa.Table:
            mp = _ray.get(ref0)
            ids = b[id_col].to_pylist()
            cl = [mp.get(i, i) for i in ids]
            return pa.table({
                id_col: b[id_col],
                "cluster_id": pa.array(cl),
                "is_duplicate": pa.array(
                    [c != i for c, i in zip(cl, ids)]),
            })

        return ds.map_batches(assign_any, batch_format="pyarrow")

    keys = np.asarray(paired, dtype=np.int64)
    vals = np.asarray([mapping[i] for i in paired], dtype=np.int64)
    ref = _ray.put((keys, vals))

    def assign(b: pa.Table) -> pa.Table:
        ks, vs = _ray.get(ref)
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cl = ids.copy()
        if len(ks):
            pos = np.minimum(np.searchsorted(ks, ids), len(ks) - 1)
            hit = ks[pos] == ids
            cl[hit] = vs[pos[hit]]
        return pa.table({
            id_col: b[id_col],
            "cluster_id": pa.array(cl),
            "is_duplicate": pa.array(cl != ids),
        })

    return ds.map_batches(assign, batch_format="pyarrow")


def minhash_dedup(ds, num_perm=64, bands=16, shingle=3, threshold=0.5,
                  text_col="text", hash_fn="blake2b"):
    """→ (doc_id, cluster_id, is_duplicate) for the whole corpus; the
    transitive closure auto-routes driver union-find vs distributed CC by
    pair volume (``cluster_assign``). ``hash_fn="md5"`` switches token
    hashing to the DuckDB-recomputable md5 mode so the WHOLE pipeline
    (shingle fold → signatures → band keys → agreement verify → closure)
    is oracle-checkable via :func:`timezonemap_ray.oracle.minhash_dedup_sql`."""
    pairs_ds = minhash_candidate_pairs_ds(ds, num_perm, bands, shingle,
                                          threshold, text_col,
                                          hash_fn=hash_fn)
    return cluster_assign(ds.select_columns(["doc_id"]), pairs_ds)


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def simhash64(text: str, shingle: int = 3, hasher=None) -> int:
    """64-bit SimHash over word-shingle hashes (vectorized bit counting).

    Shingles, not unigrams: unigram SimHash collapses on small
    vocabularies (any two docs sharing a word distribution hash close);
    shingle features keep word ORDER, matching the near-dup semantics of
    the rest of the dedup family.
    """
    if not text.split():
        return 0
    hs = token_hashes(text, shingle, hasher=hasher)
    if hs.size == 0:
        return 0
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    return int(((votes > 0).astype(np.uint64)
                << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))


class SimHasher:
    """doc → 4 band rows of the 64-bit simhash (16 bits per band)."""

    def __init__(self, text_col: str = "text", hash_fn: str = "blake2b"):
        self.text_col = text_col
        from .text import hash_u64, hash_u64_md5
        self.hasher = hash_u64_md5 if hash_fn == "md5" else hash_u64

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out_doc, out_band, out_key, out_sim = [], [], [], []
        for d, t in zip(doc_ids, texts):
            sh = simhash64(t or "", hasher=self.hasher)
            for band in range(4):
                out_doc.append(d)
                out_band.append(band)
                out_key.append((band << 16) | ((sh >> (16 * band)) & 0xFFFF))
                out_sim.append(sh)
        return pa.table({
            "doc_id": pa.array(out_doc),
            "band": pa.array(out_band, type=pa.int32()),
            "band_key": pa.array(out_key, type=pa.int64()),
            "simhash": pa.array(np.array(out_sim, dtype=np.uint64)),
        })


def simhash_dedup(ds, max_hamming: int = 3, text_col: str = "text",
                  hash_fn: str = "blake2b"):
    """→ (doc_id, cluster_id, is_duplicate); near-dup iff Hamming ≤ k.
    Banding guarantees recall for k ≤ 3 (4 bands, pigeonhole). Bucket pair
    extraction runs through ``_runs_map_groups`` (coarse partitions, runs
    sliced vectorized) — never one Python dispatch per tiny bucket.
    ``hash_fn="md5"`` → oracle-checkable via ``oracle.simhash_dedup_sql``."""
    band_rows = ds.map_batches(
        _memoized_stage(SimHasher, text_col=text_col, hash_fn=hash_fn),
        batch_format="pyarrow", batch_size=HASH_BATCH)

    def pairs_of_group(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n > MAX_BUCKET:
            import logging
            logging.getLogger(__name__).warning(
                "LSH bucket truncated: %d rows > MAX_BUCKET=%d", n, MAX_BUCKET)
            g = g.slice(0, MAX_BUCKET)
            n = MAX_BUCKET
        doc = g["doc_id"].to_pylist()
        sh = g["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        x = sh[:, None] ^ sh[None, :]
        ham = np.zeros_like(x, dtype=np.int64)
        for shift in range(0, 64, 8):
            ham += POPCOUNT8[(x >> np.uint64(shift)) & np.uint64(0xFF)]
        ii, jj = np.nonzero(np.triu(ham <= max_hamming, k=1))
        return pa.table({
            "a": [min(doc[i], doc[j]) for i, j in zip(ii, jj)],
            "b": [max(doc[i], doc[j]) for i, j in zip(ii, jj)]})

    pairs_ds = _runs_map_groups(band_rows, "band_key", pairs_of_group)
    return cluster_assign(ds.select_columns(["doc_id"]), pairs_ds)


POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


# ---------------------------------------------------------------------------
# exact n-gram jaccard (distributed shingle join — no text on the driver)
# ---------------------------------------------------------------------------

class ShingleExploder:
    """doc → one row per DISTINCT word-shingle: (doc_id, shingle, n_sh).

    ``pad=False`` shingling: docs with fewer than ``shingle`` tokens emit
    nothing (empty set ⇒ never a duplicate) so the DuckDB oracle needs no
    NUL-padding emulation."""

    def __init__(self, shingle: int = 3, text_col: str = "text"):
        self.shingle, self.text_col = shingle, text_col
        self.token_cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(self.token_cache) > MAX_TOKEN_CACHE:
            self.token_cache.clear()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch[self.text_col].to_pylist()
        per_doc = [token_hashes(t or "", self.shingle, pad=False,
                                token_cache=self.token_cache) for t in texts]
        counts = np.array([h.size for h in per_doc], dtype=np.int64)
        sh = (np.concatenate(per_doc) if per_doc
              else np.empty(0, dtype=np.uint64))
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, counts)),
            # uint64 → int64 bit view: a plain groupby key
            "shingle": pa.array(sh.view(np.int64), type=pa.int64()),
            "n_sh": pa.array(np.repeat(counts, counts), type=pa.int64()),
        })


def _pair_counts(pair_rows, n_parts: int = 64):
    """(a, b, na, nb) rows → (a, b, na, nb, inter) with inter = multiplicity,
    via coarse hash partitions + a vectorized lexsort/run-length count per
    partition. Replaces ``groupby([a,b,na,nb]).count()``, whose per-distinct-
    key aggregation cost dominated wall time at millions of mostly-unique
    pairs (measured 224 s vs ~5 s for 3.9M distinct pairs)."""

    def add_part(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = (_splitmix64(_splitmix64(a) ^ b) % np.uint64(n_parts)) \
            .astype(np.int64)
        return t.append_column("_part", pa.array(part))

    def count_part(g: pa.Table) -> pa.Table:
        a = g["a"].to_numpy(zero_copy_only=False)
        b = g["b"].to_numpy(zero_copy_only=False)
        na = g["na"].to_numpy(zero_copy_only=False)
        nb = g["nb"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b, na, nb = a[order], b[order], na[order], nb[order]
        bounds = np.flatnonzero(
            np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
        inter = np.diff(np.r_[bounds, a.size])
        return pa.table({
            "a": pa.array(a[bounds]), "b": pa.array(b[bounds]),
            "na": pa.array(na[bounds]), "nb": pa.array(nb[bounds]),
            "inter": pa.array(inter.astype(np.int64)),
        })

    return pair_rows.map_batches(add_part, batch_format="pyarrow") \
        .groupby("_part").map_groups(count_part, batch_format="pyarrow")


def ngram_jaccard_pairs(ds, shingle=3, threshold=0.5, text_col="text",
                        df_cap: int | None = None):
    """EXACT shingle-set Jaccard pairs, fully distributed:

    1. explode docs to distinct (shingle, doc_id, |set|) rows;
    2. ``groupby(shingle)`` → one (a, b, n_a, n_b) row per DOC PAIR PER
       SHARED SHINGLE (candidate generation is complete: any pair with
       Jaccard > 0 shares ≥ 1 shingle — no LSH false negatives);
    3. ``groupby(a, b)`` count = |A∩B| (the pair's multiplicity), so
       Jaccard = inter / (n_a + n_b − inter) with no second text pass;
    4. filter ≥ threshold.

    Text never leaves the explode stage; the driver sees nothing.
    Partitioning assumption: shingle document-frequency is bounded.
    ``df_cap`` (the 100 TB knob): shingles shared by more than ``df_cap``
    documents are DROPPED from pairing entirely — stop-shingles carry no
    similarity signal but cost O(df²) pairs each; dropping them
    under-counts |A∩B| by at most the number of dropped shingles, a
    documented completeness trade (default None = exact). Without a cap,
    ``MAX_BUCKET`` still truncates-and-logs pathological groups."""
    rows = ds.map_batches(
        _memoized_stage(ShingleExploder, shingle=shingle, text_col=text_col),
        batch_format="pyarrow", batch_size=HASH_BATCH)

    empty4 = pa.table({"a": pa.array([], type=pa.int64()),
                       "b": pa.array([], type=pa.int64()),
                       "na": pa.array([], type=pa.int64()),
                       "nb": pa.array([], type=pa.int64())})

    def pairs_of_group(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if df_cap is not None and n > df_cap:
            return empty4  # stop-shingle: no similarity signal, O(n²) cost
        if n > MAX_BUCKET:
            import logging
            logging.getLogger(__name__).warning(
                "shingle df %d > MAX_BUCKET=%d — group truncated (high-df "
                "shingles carry no similarity signal)", n, MAX_BUCKET)
            g = g.slice(0, MAX_BUCKET)
            n = MAX_BUCKET
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        ns = g["n_sh"].to_numpy(zero_copy_only=False)
        ii, jj = np.triu_indices(n, k=1)
        swap = ids[ii] > ids[jj]
        return pa.table({
            "a": pa.array(np.where(swap, ids[jj], ids[ii])),
            "b": pa.array(np.where(swap, ids[ii], ids[jj])),
            "na": pa.array(np.where(swap, ns[jj], ns[ii])),
            "nb": pa.array(np.where(swap, ns[ii], ns[jj])),
        })

    pair_rows = _runs_map_groups(rows, "shingle", pairs_of_group,
                                 empty_schema=empty4)
    agg = _pair_counts(pair_rows)

    def verify(b: pa.Table) -> pa.Table:
        inter = b["inter"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = b["na"].to_numpy(zero_copy_only=False).astype(np.float64)
        nb = b["nb"].to_numpy(zero_copy_only=False).astype(np.float64)
        jac = inter / (na + nb - inter)
        keep = pa.array(jac >= threshold)
        return pa.table({"a": b["a"], "b": b["b"]}).filter(keep)

    return agg.map_batches(verify, batch_format="pyarrow")


def ngram_jaccard_dedup(ds, shingle=3, threshold=0.5, text_col="text"):
    """→ (doc_id, cluster_id, is_duplicate) from EXACT n-gram Jaccard;
    transitive closure auto-routes driver union-find vs distributed CC by
    pair volume (``cluster_assign``)."""
    verified = ngram_jaccard_pairs(ds, shingle=shingle, threshold=threshold,
                                   text_col=text_col)
    return cluster_assign(ds.select_columns(["doc_id"]), verified)


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

class HyperplaneHasher:
    """embeddings → LSH bucket rows via random-hyperplane signs."""

    def __init__(self, dim: int, n_bits: int = 16, seed: int = 23,
                 vec_col: str = "embedding", id_col: str = "vec_id"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_bits))
        self.vec_col, self.id_col = vec_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = list_column_to_matrix(batch[self.vec_col])
        signs = (vecs @ self.planes) > 0
        keys = (signs.astype(np.uint64)
                << np.arange(signs.shape[1], dtype=np.uint64)[None, :]) \
            .sum(axis=1, dtype=np.uint64)
        # fixed-size-list output: one contiguous buffer, no per-row Python
        vec_col = pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.ravel(), type=pa.float64()), vecs.shape[1])
        return pa.table({
            "vec_id": batch[self.id_col],
            "bucket": pa.array(keys.astype(np.int64), type=pa.int64()),
            "vec": vec_col,
        })


def embedding_dedup(ds, dim: int, threshold: float = 0.95, n_bits: int = 12,
                    vec_col="embedding", id_col="vec_id"):
    """→ (vec_id, cluster_id, is_duplicate): cosine ≥ threshold within
    hyperplane-LSH buckets (near-dup by embedding similarity)."""
    buckets = ds.map_batches(
        _memoized_stage(HyperplaneHasher, dim=dim, n_bits=n_bits,
                        vec_col=vec_col, id_col=id_col),
        batch_format="pyarrow", batch_size=HASH_BATCH)

    def pairs_of_group(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n > MAX_BUCKET:
            import logging
            logging.getLogger(__name__).warning(
                "LSH bucket truncated: %d rows > MAX_BUCKET=%d", n, MAX_BUCKET)
            g = g.slice(0, MAX_BUCKET)
            n = MAX_BUCKET
        ids = g["vec_id"].to_pylist()
        v = list_column_to_matrix(g["vec"])
        norm = np.linalg.norm(v, axis=1)
        norm[norm == 0] = 1.0
        vn = v / norm[:, None]
        sim = vn @ vn.T
        ii, jj = np.nonzero(np.triu(sim >= threshold, k=1))
        return pa.table({
            "a": [min(ids[i], ids[j]) for i, j in zip(ii, jj)],
            "b": [max(ids[i], ids[j]) for i, j in zip(ii, jj)]})

    pairs_ds = _runs_map_groups(buckets, "bucket", pairs_of_group)
    return cluster_assign(ds.select_columns([id_col]), pairs_ds,
                          id_col=id_col)


def _int_planes(dim: int, n_bits: int, seed: int = 23) -> np.ndarray:
    """±1 hyperplanes from a seeded rng — (dim, n_bits) int64; shared by
    :func:`embedding_dedup_int` and its SQL twin (which inlines the same
    values as literals)."""
    rng = np.random.default_rng(seed)
    return rng.choice(np.array([-1, 1], dtype=np.int64),
                      size=(dim, n_bits))


def embedding_dedup_int(ds, dim: int, threshold_num: int = 361,
                        threshold_den: int = 400, n_bits: int = 12,
                        scale: int = 10_000, seed: int = 23,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id"):
    """Embedding near-dup dedup in EXACT integer arithmetic — the
    bit-reproducible twin of :func:`embedding_dedup`:

    - vectors quantize to ``floor(x·scale)`` int64;
    - LSH buckets = sign bits (dot > 0) of integer dots against ±1
      hyperplanes (:func:`_int_planes` — no float dispersion);
    - in-bucket verification is the EXACT rational predicate
      ``cos ≥ √(num/den)`` ⟺ ``dot > 0 ∧ den·dot² ≥ num·‖a‖²·‖b‖²``,
      evaluated in arbitrary-precision Python ints (dot² exceeds int64);
      defaults num/den = 361/400 ⟺ threshold 0.95;
    - transitive closure via ``cluster_assign``.

    Partitioning cannot change any step, so the SQL twin
    (``oracle.embedding_dedup_int_sql``) reproduces the output
    bit-for-bit.
    """
    planes = _int_planes(dim, n_bits, seed)

    def bucketize(b: pa.Table) -> pa.Table:
        m = list_column_to_matrix(b[vec_col], dtype=np.float64)
        x = np.floor(m * float(scale)).astype(np.int64)
        signs = (x @ planes) > 0
        keys = (signs.astype(np.uint64)
                << np.arange(n_bits, dtype=np.uint64)[None, :]) \
            .sum(axis=1, dtype=np.uint64)
        vec_out = pa.FixedSizeListArray.from_arrays(
            pa.array(x.ravel()), x.shape[1])
        return pa.table({
            "vec_id": b[id_col],
            "bucket": pa.array(keys.astype(np.int64), type=pa.int64()),
            "vec": vec_out,
        })

    buckets = ds.map_batches(bucketize, batch_format="pyarrow",
                             batch_size=HASH_BATCH)

    def pairs_of_group(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n > MAX_BUCKET:
            import logging
            logging.getLogger(__name__).warning(
                "LSH bucket truncated: %d rows > MAX_BUCKET=%d", n, MAX_BUCKET)
            g = g.slice(0, MAX_BUCKET)
            n = MAX_BUCKET
        ids = g["vec_id"].to_pylist()
        v = list_column_to_matrix(g["vec"], dtype=np.int64)
        na = (v * v).sum(axis=1)
        dots = v @ v.T
        out_a, out_b = [], []
        ii, jj = np.nonzero(np.triu(dots > 0, k=1))
        for i, j in zip(ii.tolist(), jj.tolist()):
            d = int(dots[i, j])
            # arbitrary-precision: den·dot² vs num·na·nb overflow int64
            if threshold_den * d * d >= \
                    threshold_num * int(na[i]) * int(na[j]):
                out_a.append(min(ids[i], ids[j]))
                out_b.append(max(ids[i], ids[j]))
        return pa.table({"a": pa.array(out_a, type=pa.int64()),
                         "b": pa.array(out_b, type=pa.int64())})

    pairs_ds = _runs_map_groups(buckets, "bucket", pairs_of_group)
    return cluster_assign(ds.select_columns([id_col]), pairs_ds,
                          id_col=id_col)


# pairwise-compare chunk budget for semantic_dedup_int: bound the G-matrix
# slice at ~8M int64 cells (64 MB) regardless of cluster size
SEMANTIC_PAIR_BUDGET = 8_000_000


def _semantic_dup_mask(v: np.ndarray, threshold_num: int,
                       threshold_den: int) -> np.ndarray:
    """The per-cluster kernel of :func:`semantic_dedup_int`: rows of
    ``v`` (int64, ALREADY in ascending-id order) → bool mask, True where
    an EARLIER row is cosine-similar (dot > 0 ∧ den·dot² ≥ num·‖a‖²·‖b‖²,
    exact). Vectorized chunked-matmul path while every product fits
    int64 (Cauchy-Schwarz bounds |dot| by max‖q‖²); arbitrary-precision
    Python-int backstop beyond."""
    m = len(v)
    dup = np.zeros(m, dtype=bool)
    num, den = threshold_num, threshold_den
    # route on an overflow-PROOF bound (Python ints): ‖q‖² ≤ d·max|q|²,
    # and by Cauchy-Schwarz |dot| ≤ max‖q‖² — deciding from the numpy
    # norms themselves would read already-wrapped values in the extreme
    # case the backstop exists for (hypothesis-found)
    mx_abs = int(np.abs(v).max()) if m else 0
    na_bound = v.shape[1] * mx_abs * mx_abs if m else 0
    if den * na_bound * na_bound < 1 << 63 \
            and num * na_bound * na_bound < 1 << 63:
        na = (v * v).sum(axis=1)  # exact: bounded by na_bound
        step = max(1, SEMANTIC_PAIR_BUDGET // max(m, 1))
        rows = np.arange(m)
        for j0 in range(1, m, step):
            j1 = min(m, j0 + step)
            gc = v @ v[j0:j1].T  # (m, j1-j0)
            hit = (gc > 0) & (den * gc * gc
                              >= num * na[:, None] * na[None, j0:j1])
            before = rows[:, None] < np.arange(j0, j1)[None, :]
            dup[j0:j1] |= (hit & before).any(axis=0)
    else:
        # arbitrary precision throughout — norms included (numpy int64
        # squares can wrap here); only reachable for
        # ‖x‖∞·sim_scale > ~3.8e8
        na_py = [sum(int(x) * int(x) for x in row) for row in v]
        for j in range(1, m):
            qj = [int(t) for t in v[j]]
            nj = na_py[j]
            for i in range(j):
                d = sum(int(a_) * b_ for a_, b_ in zip(v[i], qj))
                if d > 0 and den * d * d >= num * na_py[i] * nj:
                    dup[j] = True
                    break
    return dup


def semantic_dedup_int(ds, k: int = 4, kmeans_iters: int = 2,
                       threshold_num: int = 9, threshold_den: int = 100,
                       sim_scale: int = 1_000, kmeans_scale: int = 10_000,
                       vec_col: str = "embedding", id_col: str = "vec_id"):
    """SemDeDup-style SEMANTIC dedup (Abbas et al. 2023,
    arXiv:2303.09540) in EXACT integer arithmetic: cluster the embedding
    space with k-means, then drop every vector that has a LOWER-id
    near-duplicate (cosine ≥ √(num/den)) inside its OWN cluster — the
    clustering turns the quadratic all-pairs scan into k independent
    within-cluster scans, which is the entire scale story of the method.

    Exactness (so a SQL twin can reproduce it bit-for-bit):

    - clustering = :func:`cluster.kmeans_int_centroids` (quantization
      ``floor(x·kmeans_scale)``, integer Lloyd's, deterministic init) —
      assignments are partition-independent;
    - similarity vectors quantize separately as ``floor(x·sim_scale)``
      (default 1000 keeps every int64 product in range for ``|x| ≤ 1``:
      ``den·dot² ≤ 100·(64·10⁶)² < 2⁶³``);
    - the keep rule for vector j is pair-local — ``∄ i<j in the same
      cluster with dot(qᵢ,qⱼ) > 0 ∧ den·dot² ≥ num·‖qᵢ‖²·‖qⱼ‖²`` — NOT
      transitive-closure based, so j's fate never depends on whether i
      itself survived; every pair checks independently and the rule is
      one SQL anti-join (``oracle.semantic_dedup_int_sql``).

    Exactness domain: the binding bound is the K-MEANS quantization —
    int64 squared distances need ``d·(2·‖x‖∞·kmeans_scale)² < 2⁶³``
    (‖x‖∞ ≲ 1.9e4 at d=64, scale=10⁴ — any real embedding space);
    within it every similarity product fits BIGINT too, and the kernel's
    arbitrary-precision backstop covers the rest of ITS range anyway.

    Distributed shape: fit once (broadcast centroids, partial-sum folds);
    ONE map pass fuses assignment + quantization (no assignment join);
    ONE ``groupby(cluster)`` shuffle moves (id, quantized vec) only; the
    per-cluster kernel is a chunked integer matmul with
    O(``SEMANTIC_PAIR_BUDGET``) live cells. Partitioning assumption
    (SURVEY §2 custom-operator rule): k is chosen so clusters are
    block-sized (SemDeDup uses k ∝ corpus size, e.g. 11k clusters for
    LAION-440M) — within-cluster work is quadratic in CLUSTER size by
    design, never in corpus size.

    Returns the KEPT rows as a Dataset of (``id_col``, cluster).
    """
    import ray

    from .cluster import kmeans_int_centroids

    from .cluster import _coalesce_small
    vecs = _coalesce_small(
        ds.select_columns([id_col, vec_col]).materialize())
    cents = kmeans_int_centroids(vecs, k, kmeans_iters, vec_col=vec_col,
                                 id_col=id_col, scale=kmeans_scale)
    ref = ray.put(cents)

    def tag(b: pa.Table) -> pa.Table:
        c = ray.get(ref)
        # one list-column decode, two quantizations (same floor·scale
        # arithmetic as _quant_matrix — review-found double decode)
        m = list_column_to_matrix(b[vec_col], dtype=np.float64)
        x = np.floor(m * float(kmeans_scale)).astype(np.int64)
        from .cluster import _int_assign
        a, _ = _int_assign(x, c)
        q = np.floor(m * float(sim_scale)).astype(np.int64)
        qv = pa.FixedSizeListArray.from_arrays(pa.array(q.ravel()),
                                               q.shape[1])
        return pa.table({id_col: b[id_col],
                         "cluster": pa.array(a.astype(np.int64)),
                         "_qv": qv})

    tagged = vecs.map_batches(tag, batch_format="pyarrow")

    def dedup_group(g: pa.Table) -> pa.Table:
        raw_ids = g[id_col].to_numpy(zero_copy_only=False)
        order = np.argsort(raw_ids, kind="stable")
        ids = raw_ids[order]
        v = list_column_to_matrix(g["_qv"], dtype=np.int64)[order]
        keep = ~_semantic_dup_mask(v, threshold_num, threshold_den)
        return pa.table({
            id_col: pa.array(ids[keep]),
            "cluster": pa.array(g["cluster"].to_numpy(
                zero_copy_only=False)[order][keep]),
        })

    return tagged.groupby("cluster").map_groups(dedup_group,
                                                batch_format="pyarrow")


def window_dedup_events(ds, window_us: int = 3_600_000_000,
                        key_cols: tuple = ("user_id", "event_type"),
                        ts_col: str = "ts", id_col: str = "event_id"):
    """TEMPORAL dedup over an event stream (the log/telemetry dedup op):
    flag every event that repeats the same key within ``window_us``
    microseconds of an EARLIER event — retries, double-fires, at-least-
    once delivery artifacts. "Earlier" orders by (ts, id); an event is a
    duplicate iff its gap to the NEAREST earlier same-key event is ≤ the
    window, which equals the gap to the immediate predecessor (the
    nearest earlier event maximizes ts), so one ``lag()`` reproduces it
    in SQL and one sorted-diff reproduces it here — no pairwise scan.

    Scale shape: ONE coarse hash shuffle on the first key column
    (``_runs_map_groups`` — per-key groups are tiny, so per-key
    ``groupby`` dispatch would dominate); within a run, a vectorized
    lexsort + boundary-masked diff. Single-event keys never enter the
    kernel (runs < 2 are skipped by construction — they cannot contain a
    duplicate). Returns the DUPLICATE rows as (id, *key_cols, gap_us) —
    bounded by duplicate volume, not stream size.
    """
    import pyarrow.compute as pc

    k0, k1 = key_cols

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: b[id_col], k0: b[k0], k1: b[k1],
            "_ts": pc.cast(pc.cast(b[ts_col],
                                   pa.timestamp("us")), pa.int64()),
        })

    empty = pa.table({
        id_col: pa.array([], type=pa.int64()),
        k0: pa.array([], type=pa.int64()),
        k1: pa.array([], type=pa.string()),
        "gap_us": pa.array([], type=pa.int64()),
    })

    def run_fn(g: pa.Table) -> pa.Table:
        # one user's events: group by the second key locally, order by
        # (ts, id) inside each group, diff against the predecessor
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g["_ts"].to_numpy(zero_copy_only=False).astype(np.int64)
        # null keys form their own group (SQL PARTITION BY semantics):
        # map null dictionary indices to -1 instead of an undefined
        # NaN->int64 cast
        enc = g[k1].combine_chunks().dictionary_encode()
        code = pc.fill_null(enc.indices, -1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, ts, code))
        c, t = code[order], ts[order]
        same = np.r_[False, c[1:] == c[:-1]]
        gap = np.r_[0, t[1:] - t[:-1]]
        dup = same & (gap <= window_us)
        sel = order[dup]
        return pa.table({
            id_col: pa.array(ids[sel]),
            k0: g[k0].take(pa.array(sel)),
            k1: g[k1].take(pa.array(sel)),
            "gap_us": pa.array(gap[dup]),
        })

    rows = ds.map_batches(prep, batch_format="pyarrow")
    return _runs_map_groups(rows, k0, run_fn, empty_schema=empty)


def duplicated_spans(ds, window: int = 50, stride: int = 25,
                     text_col: str = "text", id_col: str = "doc_id"):
    """Cross-document EXACT substring duplication (the Lee et al. 2022
    "exact substring dedup" signal, shingle-window approximation): flag
    every ``window``-token span (stride ``stride``) whose normalized text
    occurs in ≥ 2 DISTINCT documents → Dataset of
    (doc_id, chunk_idx, n_tokens).

    Scale shape (composition of existing primitives):
    1. windows via ``text.chunk_documents`` (Arrow list-offset views, no
       Python loop);
    2. md5 digest per window (C-speed; comparing by digest ≡ comparing by
       text up to collisions — none at corpus scale for 128-bit md5);
    3. per-block DISTINCT (digest, doc) partials — a document never spans
       blocks, so summing per-block partials counts distinct docs exactly
       (same argument as ``terms.doc_frequencies``) and raw windows never
       shuffle, only one row per distinct (digest, doc) per block;
    4. digests with ≥ 2 docs broadcast back as a semi-join key set
       (``join.broadcast_semi_join``) over the streaming window set.
    """
    from ray.data.aggregate import Sum

    import ray

    from .join import broadcast_semi_join
    from .text import chunk_documents, md5_digest

    def windows(b: pa.Table) -> pa.Table:
        w = chunk_documents(b, chunk=window, stride=stride,
                            text_col=text_col, id_col=id_col)
        w = md5_digest(w, text_col="chunk_text", out_col="_dg")
        return w.drop_columns(["chunk_text"])

    wds = ds.map_batches(windows, batch_format="pyarrow")

    def pair_partial(b: pa.Table) -> pa.Table:
        # windows derived IN-CALL from whole document rows, so a doc's
        # windows can never straddle two partials — per-call distinct
        # (digest, doc) pairs then sum to the exact distinct-doc count
        # (same invariant argument as terms.doc_frequencies; deriving
        # windows in a separate stage would break it if Ray re-batched)
        import numpy as np
        import pyarrow.compute as pc
        w = windows(b)
        if w.num_rows == 0:
            return pa.table({"_dg": pa.array([], type=pa.string()),
                             "nd": pa.array([], type=pa.int64())})
        enc = w["_dg"].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # dictionary-encode doc ids too: works for string/any id type
        docs = w[id_col].combine_chunks().dictionary_encode() \
            .indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((docs, codes))
        c, d = codes[order], docs[order]
        first = np.r_[True, (c[1:] != c[:-1]) | (d[1:] != d[:-1])]
        keep = order[first]
        return pa.table({"_dg": pc.take(enc.dictionary,
                                        pa.array(codes[keep])),
                         "nd": pa.array(np.ones(keep.size, dtype=np.int64))})

    counts = ds.map_batches(pair_partial, batch_format="pyarrow") \
        .groupby("_dg").aggregate(Sum("nd", alias_name="nd"))
    dup = counts.filter(expr="nd >= 2")
    tabs = [t for t in (ray.get(r) for r in dup.to_arrow_refs())
            if t.num_rows]
    if not tabs:
        return wds.limit(0).select_columns([id_col, "chunk_idx",
                                            "n_tokens"])
    dup_keys = pa.concat_tables(tabs)["_dg"]
    flagged = broadcast_semi_join(wds, dup_keys, "_dg")
    return flagged.select_columns([id_col, "chunk_idx", "n_tokens"])


# stride=1 rolling-digest detector ------------------------------------------

_ROLL_B1 = np.uint64(0x9E3779B97F4A7C15 | 1)   # odd ⇒ invertible mod 2⁶⁴
_ROLL_B2 = np.uint64(0xC2B2AE3D27D4EB4F | 1)
_ROLL_B1_INV = np.uint64(pow(int(_ROLL_B1), -1, 1 << 64))
_ROLL_B2_INV = np.uint64(pow(int(_ROLL_B2), -1, 1 << 64))
_ROLL_SALT = np.uint64(0xA5A5A5A55A5A5A5A)


def _pow_table(base: np.uint64, n: int) -> np.ndarray:
    t = np.empty(n + 1, dtype=np.uint64)
    t[0] = 1
    if n:
        with np.errstate(over="ignore"):
            t[1:] = np.multiply.accumulate(
                np.full(n, base, dtype=np.uint64))
    return t


def _rolling_window_digests(b: pa.Table, window: int, text_col: str):
    """(doc_row, chunk_idx, n_tokens, h1, h2) numpy columns for every
    stride-1 window of the block (chunk_documents index semantics:
    nt ≤ window ⇒ one short window; else nt-window+1 full windows).
    Each DISTINCT token hashes once (blake2b); each position costs O(1)
    via inverse-base prefix sums in wrapping uint64 arithmetic."""
    from .terms import _flat_tokens
    from . import text as _text

    flat, parent = _flat_tokens(b, text_col)
    n_rows = b.num_rows
    nt = np.bincount(parent, minlength=n_rows).astype(np.int64)
    if len(flat) == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, z, z.astype(np.uint64), z.astype(np.uint64)
    enc = flat.dictionary_encode()
    dh = np.fromiter((_text.hash_u64(t) for t in enc.dictionary.to_pylist()),
                     dtype=np.uint64, count=len(enc.dictionary))
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    t1 = _splitmix64(dh)[codes]
    t2 = _splitmix64(dh ^ _ROLL_SALT)[codes]
    doc_start = np.r_[0, np.cumsum(nt)]
    p = (np.arange(len(flat), dtype=np.int64)
         - np.repeat(doc_start[:-1], nt))     # token position in doc
    maxlen = int(nt.max())
    pw1, pw2 = _pow_table(_ROLL_B1, maxlen), _pow_table(_ROLL_B2, maxlen)
    pi1, pi2 = _pow_table(_ROLL_B1_INV, maxlen), \
        _pow_table(_ROLL_B2_INV, maxlen)
    with np.errstate(over="ignore"):
        T1 = np.r_[np.uint64(0), np.add.accumulate(t1 * pi1[p])]
        T2 = np.r_[np.uint64(0), np.add.accumulate(t2 * pi2[p])]
    n_chunks = np.where(nt > 0, np.maximum(nt - window, 0) + 1, 0)
    doc_of = np.repeat(np.arange(n_rows), n_chunks)
    first = np.r_[0, np.cumsum(n_chunks)][:-1]
    cidx = np.arange(doc_of.size, dtype=np.int64) - first[doc_of]
    g = doc_start[doc_of] + cidx                 # global window start
    ln = np.minimum(window, nt[doc_of])          # short only when 1 win
    with np.errstate(over="ignore"):
        h1 = (T1[g + ln] - T1[g]) * pw1[cidx + ln - 1]
        h2 = (T2[g + ln] - T2[g]) * pw2[cidx + ln - 1]
        h2 ^= _splitmix64(ln.astype(np.uint64))  # length-mixed
    return doc_of, cidx, ln, h1, h2


def duplicated_spans_rolling(ds, window: int = 20,
                             text_col: str = "text",
                             id_col: str = "doc_id"):
    """Stride=1 exact-substring duplication via ROLLING double-hash window
    digests — the sorted-digest-run equivalent of the Lee et al. 2022
    suffix-array detector, and the crawl-scale replacement for
    ``duplicated_spans(stride=1)`` (VERDICT r2 #8):

    - each DISTINCT token hashes once per block (blake2b), never window-
      joined strings — hashing work ≈ 1× corpus tokens where the md5 path
      pays window× bytes per position;
    - per-position digests are O(1) each: two independent polynomial
      hashes in wrapping uint64 arithmetic, sliding via inverse-base
      prefix sums (B odd ⇒ invertible mod 2⁶⁴), window length mixed in;
    - digest equality ⟺ token-sequence equality up to double-hash
      collisions at ~2⁻¹²⁸ on RANDOM inputs. Unlike the md5 path, the two
      fixed-base polynomial hashes are NOT cryptographic: an adversary
      who knows the bases can craft corpora whose windows collide (false
      duplicate flags). If adversarial robustness matters, mix a per-run
      salt into both bases (or use the md5 mode); for crawl/training
      dedup the random-input bound is the operative one. (Tokens contain
      no whitespace, so token-sequence equality ⟺ normalized window-text
      equality.)

    Output is IDENTICAL to ``duplicated_spans(window, stride=1)``:
    (id_col, chunk_idx, n_tokens) for every window position whose text
    occurs in ≥ 2 distinct documents (asserted in tests/test_text_dedup).
    Scale shape unchanged: raw windows never shuffle — one distinct
    (digest, doc) row per block reaches the groupby; flagged digests
    broadcast back as a (prefiltered) key set.
    """
    import ray

    def win_digests(b: pa.Table):
        return _rolling_window_digests(b, window, text_col)

    def pair_partial(b: pa.Table) -> pa.Table:
        # distinct (digest, doc) per block — windows derived in-call from
        # whole documents, so a doc never straddles partials (the exact-
        # distinct invariant duplicated_spans documents)
        doc_of, _, _, h1, h2 = win_digests(b)
        if doc_of.size == 0:
            return pa.table({"_h1": pa.array([], type=pa.int64()),
                             "_h2": pa.array([], type=pa.int64()),
                             "nd": pa.array([], type=pa.int64())})
        order = np.lexsort((doc_of, h2.view(np.int64), h1.view(np.int64)))
        a, c, d = h1[order], h2[order], doc_of[order]
        keep = np.r_[True, (a[1:] != a[:-1]) | (c[1:] != c[:-1])
                     | (d[1:] != d[:-1])]
        return pa.table({
            "_h1": pa.array(a[keep].view(np.int64)),
            "_h2": pa.array(c[keep].view(np.int64)),
            "nd": pa.array(np.ones(int(keep.sum()), dtype=np.int64))})

    # count distinct docs per digest via coarse hash partitions +
    # vectorized run counting: a groupby([_h1,_h2]) aggregate pays Ray's
    # per-key dispatch on ~1 key/row (mostly-unique digests — the same
    # pathology _coarse_groupby exists for)
    def dup_of_part(g: pa.Table) -> pa.Table:
        h1 = g["_h1"].to_numpy(zero_copy_only=False)
        h2 = g["_h2"].to_numpy(zero_copy_only=False)
        order = np.lexsort((h2, h1))
        a, c = h1[order], h2[order]
        new = np.r_[True, (a[1:] != a[:-1]) | (c[1:] != c[:-1])]
        gid = np.cumsum(new) - 1
        # rows are distinct (digest, doc) per block and docs never
        # straddle blocks ⇒ run length = distinct-doc count
        cnt = np.bincount(gid)
        firsts = np.flatnonzero(new)
        sel = firsts[cnt >= 2]
        return pa.table({"_h1": pa.array(a[sel]), "_h2": pa.array(c[sel])})

    dup = _coarse_groupby(ds.map_batches(pair_partial,
                                         batch_format="pyarrow"),
                          "_h1", dup_of_part)
    tabs = [t.select(["_h1", "_h2"])
            for t in (ray.get(r) for r in dup.to_arrow_refs())
            if t.num_rows]
    if not tabs:
        def empty_out(b: pa.Table) -> pa.Table:
            return pa.table({id_col: b[id_col].slice(0, 0),
                             "chunk_idx": pa.array([], type=pa.int64()),
                             "n_tokens": pa.array([], type=pa.int64())})

        return ds.limit(1).map_batches(empty_out, batch_format="pyarrow")
    dupt = pa.concat_tables(tabs)
    dup_h1 = dupt["_h1"].to_numpy(zero_copy_only=False).view(np.uint64)
    dup_h2 = dupt["_h2"].to_numpy(zero_copy_only=False).view(np.uint64)
    pair_set = set(zip(dup_h1.tolist(), dup_h2.tolist()))
    ref = ray.put((np.unique(dup_h1), pair_set))

    def flag(b: pa.Table) -> pa.Table:
        doc_of, cidx, ln, h1, h2 = win_digests(b)
        h1_set, pairs = ray.get(ref)
        cand = np.flatnonzero(np.isin(h1, h1_set))   # vectorized prefilter
        if cand.size:
            # exact 128-bit membership only on the (few) h1 survivors
            keep = np.array([(int(h1[k]), int(h2[k])) in pairs
                             for k in cand], dtype=bool)
            rows = cand[keep]
        else:
            rows = cand
        import pyarrow.compute as pc
        return pa.table({
            id_col: pc.take(b[id_col], pa.array(doc_of[rows])),
            "chunk_idx": pa.array(cidx[rows]),
            "n_tokens": pa.array(ln[rows]),
        })

    return ds.map_batches(flag, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Edit-distance fuzzy-duplicate join (entity resolution, Levenshtein ≤ 1)
# ---------------------------------------------------------------------------

def _lev_le1(a: str, b: str) -> bool:
    """Exact Levenshtein(a, b) ≤ 1 in O(len) — substitution (equal length,
    ≤ 1 mismatch) or single indel (one-gap walk)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        seen = False
        for x, y in zip(a, b):
            if x != y:
                if seen:
                    return False
                seen = True
        return True
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def fuzzy_pairs_lev1(ds, id_col: str, name_col: str, n_parts: int = 64,
                     max_bucket: int = 4096):
    """All pairs of rows whose ``name_col`` values are within Levenshtein
    distance 1 → Dataset of (id_a, id_b), id_a < id_b — the k=1 entry of
    the entity-resolution fuzzy join (see :func:`fuzzy_pairs` for the
    blocking/verification design; this thin wrapper keeps the original
    public name)."""
    return fuzzy_pairs(ds, id_col, name_col, k=1, n_parts=n_parts,
                       max_bucket=max_bucket)

def _lev_le(a: str, b: str, k: int) -> bool:
    """Exact Levenshtein(a, b) ≤ k via a banded DP (band width 2k+1):
    O(k·len) per pair, early exit when the whole band exceeds k."""
    if k == 1:
        return _lev_le1(a, b)
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return False
    if a == b:
        return True
    big = k + 1
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        lo, hi = max(1, i - k), min(lb, i + k)
        cur = [big] * (lb + 1)
        if lo == 1:
            cur[0] = i
        best = big
        for j in range(lo, hi + 1):
            c = min(prev[j] + 1, cur[j - 1] + 1,
                    prev[j - 1] + (a[i - 1] != b[j - 1]))
            cur[j] = c
            if c < best:
                best = c
        if best > k and (lo > 1 or cur[0] > k):
            return False
        prev = cur
    return prev[lb] <= k


def fuzzy_pairs(ds, id_col: str, name_col: str, k: int = 1,
                n_parts: int = 64, max_bucket: int = 4096):
    """Generalized entity-resolution fuzzy join: all pairs within
    Levenshtein distance ``k`` (k = 1 or 2) → Dataset of (id_a, id_b).

    Blocking is the size-≤k deletion neighborhood (FastSS): if
    lev(a, b) ≤ k then a and b share a signature obtained by deleting ≤ k
    chars from each — exact blocking, no recall loss; ``_lev_le``
    verification removes the false candidates. Signature generation is
    vectorized per deletion-position combo (O(maxlen^k) slice+join passes
    over the whole block — ~170 passes at k=2 for 18-char keys, never a
    per-row Python loop). Signature volume is O(len^k) rows per input
    row — the documented cost of k=2 blocking; same coarse-shuffle /
    hot-bucket-cap / combiner-dedup shape as :func:`fuzzy_pairs_lev1`.
    """
    import logging
    from itertools import combinations

    import pyarrow.compute as pc

    from .select import _hash_part_of

    if k < 1:
        raise ValueError("k must be ≥ 1")
    if k > 2:
        # deletion-neighborhood volume is C(len, k) rows/input — the k ≥ 3
        # wall; route to the q-gram prefix-filter blocking (same verify)
        return fuzzy_pairs_qgram(ds, id_col, name_col, k=k,
                                 n_parts=n_parts, max_bucket=max_bucket)

    def sigs(b: pa.Table) -> pa.Table:
        names = b[name_col]
        if isinstance(names, pa.ChunkedArray):
            names = names.combine_chunks()
        lens = pc.utf8_length(names).to_numpy(zero_copy_only=False)
        maxlen = int(lens.max()) if len(lens) else 0
        ids = b[id_col]
        outs = []
        end = 1 << 30
        for size in range(k + 1):
            for combo in combinations(range(maxlen), size):
                # valid only when every deleted position exists
                need = (combo[-1] + 1) if combo else 0
                keep = pa.array(lens >= max(need, size))
                parts = []
                prev = 0
                for p in combo:
                    parts.append(pc.utf8_slice_codeunits(names, prev, p))
                    prev = p + 1
                parts.append(pc.utf8_slice_codeunits(names, prev, end))
                sig = parts[0] if len(parts) == 1 else \
                    pc.binary_join_element_wise(*parts, "")
                t = pa.table({"sig": sig, id_col: ids, name_col: names})
                outs.append(t.filter(keep))
        out = pa.concat_tables(outs)
        key = pc.binary_join_element_wise(
            out["sig"], pc.cast(out[id_col], pa.string()), "\x00")
        enc = key.combine_chunks().dictionary_encode()
        first = np.unique(enc.indices.to_numpy(zero_copy_only=False),
                          return_index=True)[1]
        return out.take(pa.array(np.sort(first)))

    return _pairs_from_sigs(ds.map_batches(sigs, batch_format="pyarrow"),
                            id_col, name_col, k, n_parts, max_bucket)


def _verify_pairs(names_a: list, names_b: list, k: int) -> np.ndarray:
    """Vectorized exact lev ≤ k verification for a batch of name pairs.

    Fast path: equal-length pairs with hamming ≤ k are within k by
    substitutions alone — one padded byte-matrix compare settles the bulk
    (all of it, for fixed-width keys like ``Customer#NNNNNNNNN``). Only
    unequal-length pairs and equal-length pairs with hamming > k (which
    may still be within k via insert+delete shifts) run the banded DP."""
    n = len(names_a)
    out = np.zeros(n, dtype=bool)
    if n == 0:
        return out
    la = np.fromiter((len(s) for s in names_a), dtype=np.int64, count=n)
    lb = np.fromiter((len(s) for s in names_b), dtype=np.int64, count=n)
    plausible = np.abs(la - lb) <= k
    eq = plausible & (la == lb)
    if eq.any():
        idx = np.flatnonzero(eq)
        width = int(la[idx].max()) + 1
        # UCS4 fixed-width view: unicode-safe, one uint32 per char
        A = np.array([names_a[i] for i in idx], dtype=f"U{width}") \
            .view(np.uint32).reshape(idx.size, width)
        B = np.array([names_b[i] for i in idx], dtype=f"U{width}") \
            .view(np.uint32).reshape(idx.size, width)
        ham = (A != B).sum(axis=1)
        out[idx[ham <= k]] = True
        slow = idx[ham > k]
    else:
        slow = np.empty(0, dtype=np.int64)
    uneq = np.flatnonzero(plausible & (la != lb))
    for i in np.concatenate([slow, uneq]):
        out[i] = _lev_le(names_a[i], names_b[i], k)
    return out


def _pairs_from_sigs(sig_ds, id_col: str, name_col: str, k: int,
                     n_parts: int, max_bucket: int):
    """Shared candidate→verify phase of the fuzzy joins: bucket rows by
    ``sig`` (coarse hash partitions), emit candidate pairs per bucket
    (inline-verifying oversized buckets), dedup each (ids, names)
    combination globally, then vectorized-verify each once
    (:func:`_verify_pairs`). Exact given a COMPLETE blocking: any true
    pair shares ≥ 1 sig value."""
    import logging

    import pyarrow.compute as pc

    from .select import _hash_part_of

    def add_part(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_part", pa.array(_hash_part_of(b["sig"], n_parts)))

    _EMPTY = pa.table({
        "id_a": pa.array([], type=pa.int64()),
        "id_b": pa.array([], type=pa.int64()),
        "name_a": pa.array([], type=pa.string()),
        "name_b": pa.array([], type=pa.string())})

    def per_part(g: pa.Table) -> pa.Table:
        # emit UNVERIFIED candidates (with both names): a true pair shares
        # MANY size-≤k deletion signatures, so verifying in-bucket repeats
        # the DP once per shared sig (~20× at k=2); instead candidates
        # dedup globally first and each unique pair verifies ONCE below
        if g.num_rows == 0:
            return _EMPTY
        g = g.drop_columns(["_part"])
        idx = pc.sort_indices(g, sort_keys=[("sig", "ascending"),
                                            (id_col, "ascending")])
        g = g.take(idx)
        codes = g["sig"].combine_chunks().dictionary_encode() \
            .indices.to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        bounds = np.r_[starts, len(codes)]
        ids = g[id_col].to_numpy(zero_copy_only=False)
        names = g[name_col].to_pylist()
        # small buckets emit UNVERIFIED candidate index pairs (the global
        # dedup-then-verify-once path); buckets above _VERIFY_INLINE rows
        # verify in place instead — a capped hot bucket would otherwise
        # materialize O(cap²) candidate rows (review-found blowup)
        _VERIFY_INLINE = 64
        _PAIR_CHUNK = 1 << 21
        ii, jj = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            if e - s > max_bucket:
                logging.getLogger(__name__).warning(
                    "fuzzy_pairs: bucket capped %d -> %d",
                    e - s, max_bucket)
                e = s + max_bucket
            m = e - s
            ti, tj = np.triu_indices(m, 1)
            gi, gj = ti + s, tj + s
            mask = ids[gi] != ids[gj]
            gi, gj = gi[mask], gj[mask]
            if m > _VERIFY_INLINE and gi.size:
                # hot bucket: verify in place (vectorized hamming fast
                # path + DP residue), chunked to bound pair-list memory
                for c0 in range(0, gi.size, _PAIR_CHUNK):
                    ci, cj = gi[c0:c0 + _PAIR_CHUNK], gj[c0:c0 + _PAIR_CHUNK]
                    ok = _verify_pairs([names[x] for x in ci],
                                       [names[x] for x in cj], k)
                    ii.append(ci[ok])
                    jj.append(cj[ok])
            else:
                ii.append(gi)
                jj.append(gj)
        if not ii:
            return _EMPTY
        ia = np.concatenate(ii)
        ja = np.concatenate(jj)
        if ia.size == 0:
            return _EMPTY
        a_ids, b_ids = ids[ia], ids[ja]
        swap = a_ids > b_ids
        a_ids, b_ids = np.where(swap, b_ids, a_ids), \
            np.where(swap, a_ids, b_ids)
        na = [names[x] for x in np.where(swap, ja, ia)]
        nb = [names[x] for x in np.where(swap, ia, ja)]
        t = pa.table({"id_a": pa.array(a_ids, type=pa.int64()),
                      "id_b": pa.array(b_ids, type=pa.int64()),
                      "name_a": pa.array(na, type=pa.string()),
                      "name_b": pa.array(nb, type=pa.string())})
        # block-local dedup keeps each (ids, NAMES) combination once — an
        # id may carry several names and each combination must verify
        # independently (review-found: pair-only dedup dropped true pairs)
        import pyarrow.compute as _pc
        key = _pc.binary_join_element_wise(
            _pc.cast(t["id_a"], pa.string()),
            _pc.cast(t["id_b"], pa.string()),
            t["name_a"], t["name_b"], "\x00")
        enc = key.combine_chunks().dictionary_encode()
        first = np.unique(enc.indices.to_numpy(zero_copy_only=False),
                          return_index=True)[1]
        return t.take(pa.array(np.sort(first)))

    cand = sig_ds.map_batches(add_part, batch_format="pyarrow") \
        .groupby("_part").map_groups(per_part, batch_format="pyarrow")

    def add_pair_part(b: pa.Table) -> pa.Table:
        a = b["id_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        c = b["id_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = _splitmix64(a * np.uint64(0x9E3779B9) ^ c)
        return b.append_column(
            "_part", pa.array((h % np.uint64(n_parts)).astype(np.int64)))

    def verify_part(g: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                          "id_b": pa.array([], type=pa.int64())})
        if g.num_rows == 0:
            return empty
        # dedup on the FULL (ids, names) tuple — every distinct name
        # combination of a pair verifies independently; the pair emits
        # if ANY combination is within distance k (review-found)
        key = pc.binary_join_element_wise(
            pc.cast(g["id_a"], pa.string()),
            pc.cast(g["id_b"], pa.string()),
            g["name_a"], g["name_b"], "\x00")
        enc = key.combine_chunks().dictionary_encode()
        first = np.unique(enc.indices.to_numpy(zero_copy_only=False),
                          return_index=True)[1]
        a = g["id_a"].to_numpy(zero_copy_only=False)
        c = g["id_b"].to_numpy(zero_copy_only=False)
        na = g["name_a"].to_pylist()
        nb = g["name_b"].to_pylist()
        sel = np.sort(first)
        ok = _verify_pairs([na[i] for i in sel], [nb[i] for i in sel], k)
        good = sel[ok]
        if good.size == 0:
            return empty
        ga = a[good]
        gc = c[good]
        u = np.unique(np.stack([ga, gc], 1), axis=0)
        return pa.table({"id_a": pa.array(u[:, 0], type=pa.int64()),
                         "id_b": pa.array(u[:, 1], type=pa.int64())})

    return cand.map_batches(add_pair_part, batch_format="pyarrow") \
        .groupby("_part").map_groups(verify_part, batch_format="pyarrow")

_SHORT_SIG = "\x00SHORT"


def fuzzy_pairs_qgram(ds, id_col: str, name_col: str, k: int = 3,
                      q: int = 2, n_parts: int = 64,
                      max_bucket: int = 4096):
    """Entity-resolution fuzzy join for ARBITRARY k via q-gram PREFIX
    filtering (the Ed-Join / AllPairs public method: Xiao-Wang-Lin 2008,
    Bayardo 2007) — the k ≥ 3 blocking where the deletion neighborhood's
    len^k signature volume is the documented wall (VERDICT r2 #9).

    Exactness argument: k edits destroy ≤ q·k distinct q-grams, so a true
    pair's distinct-gram overlap is ≥ max(|Dₐ|,|D_b|) − q·k; by the prefix
    -filter theorem under a GLOBAL (frequency, gram) order, prefixes of
    size q·k + 1 per side must then intersect — every true pair shares a
    prefix gram and reaches the banded-DP verifier (exact; no recall
    loss). Rows with ≤ q·k distinct grams (the only case the bound is
    vacuous) route to one all-pairs short bucket. Rare-first prefix order
    keeps hot grams (common bigrams) out of buckets.

    Scale shape: one (gram, n) partial groupby for the global order (gram
    vocab ≈ alphabet^q — tiny, broadcast once); signature volume is
    q·k + 1 rows per input row (vs C(len, k) for deletion blocking —
    816× smaller at len 18, k 3); then the shared coarse-bucket →
    dedup-candidates → verify-once pipeline of :func:`fuzzy_pairs`.
    """
    from ray.data.aggregate import Sum

    import ray
    import pyarrow.compute as pc

    prefix_n = q * k + 1

    def gram_rows(b: pa.Table):
        names = b[name_col]
        if isinstance(names, pa.ChunkedArray):
            names = names.combine_chunks()
        lens = pc.utf8_length(names).to_numpy(zero_copy_only=False)
        maxlen = int(lens.max()) if len(lens) else 0
        outs = []
        row_idx = np.arange(b.num_rows, dtype=np.int64)
        for p0 in range(max(0, maxlen - q + 1)):
            g = pc.utf8_slice_codeunits(names, p0, p0 + q)
            valid = lens >= p0 + q
            t = pa.table({"_row": pa.array(row_idx), "gram": g})
            outs.append(t.filter(pa.array(valid)))
        if not outs:
            return pa.table({"_row": pa.array([], type=pa.int64()),
                             "gram": pa.array([], type=pa.string())})
        cat = pa.concat_tables(outs)
        # distinct (row, gram)
        key = pc.binary_join_element_wise(
            pc.cast(cat["_row"], pa.string()), cat["gram"], "\x00")
        enc = key.combine_chunks().dictionary_encode()
        first = np.unique(enc.indices.to_numpy(zero_copy_only=False),
                          return_index=True)[1]
        return cat.take(pa.array(np.sort(first)))

    # pass 1: global gram frequencies (partial per block, tiny groupby)
    def freq_partial(b: pa.Table) -> pa.Table:
        g = gram_rows(b)
        if g.num_rows == 0:
            return pa.table({"gram": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        enc = g["gram"].combine_chunks().dictionary_encode()
        counts = np.bincount(
            enc.indices.to_numpy(zero_copy_only=False),
            minlength=len(enc.dictionary)).astype(np.int64)
        return pa.table({"gram": enc.dictionary,
                         "n": pa.array(counts)})

    freq = ds.map_batches(freq_partial, batch_format="pyarrow") \
        .groupby("gram").aggregate(Sum("n", alias_name="n")).to_pandas()
    # global rare-first total order: rank by (count, gram)
    freq = freq.sort_values(["n", "gram"]).reset_index(drop=True)
    vocab = freq["gram"].to_numpy()               # freq-rank order
    order_of = np.argsort(vocab, kind="stable")   # gram-sorted → rank map
    vocab_sorted = vocab[order_of]
    rank_sorted = order_of.astype(np.int64)       # freq rank of sorted gram
    ref = ray.put((vocab_sorted, rank_sorted))

    def sigs(b: pa.Table) -> pa.Table:
        vs, rs = ray.get(ref)
        g = gram_rows(b)
        names = b[name_col]
        ids = b[id_col]
        if g.num_rows == 0:
            return pa.table({"sig": pa.array([], type=pa.string()),
                             id_col: ids.slice(0, 0),
                             name_col: (names.combine_chunks()
                                        if isinstance(names, pa.ChunkedArray)
                                        else names).slice(0, 0)})
        row = g["_row"].to_numpy(zero_copy_only=False)
        grams = g["gram"].to_pylist()
        pos = np.searchsorted(vs, grams)
        rank = rs[pos]
        # per-row rare-first head of size prefix_n (vectorized segmented)
        order = np.lexsort((rank, row))
        r_o, rank_o = row[order], rank[order]
        seg_first = np.r_[True, r_o[1:] != r_o[:-1]]
        first_slot = np.flatnonzero(seg_first)
        seg_id = np.cumsum(seg_first) - 1
        pos_in_seg = np.arange(r_o.size) - first_slot[seg_id]
        keep = pos_in_seg < prefix_n
        sel = order[keep]
        sig = pc.take(g["gram"], pa.array(sel))
        out_row = row[sel]
        out = pa.table({
            "sig": sig,
            id_col: pc.take(ids, pa.array(out_row)),
            name_col: pc.take(names, pa.array(out_row)),
        })
        # short rows (≤ q·k distinct grams, incl. zero-gram rows): the
        # overlap bound is vacuous — ONE all-pairs bucket catches
        # short-short pairs (long-short pairs still share a prefix gram)
        n_grams = np.bincount(row, minlength=b.num_rows)
        short = np.flatnonzero(n_grams <= q * k)
        if short.size:
            out = pa.concat_tables([out, pa.table({
                "sig": pa.array([_SHORT_SIG] * short.size),
                id_col: pc.take(ids, pa.array(short)),
                name_col: pc.take(names, pa.array(short)),
            })])
        return out

    return _pairs_from_sigs(ds.map_batches(sigs, batch_format="pyarrow"),
                            id_col, name_col, k, n_parts, max_bucket)


def remove_duplicated_spans(ds, window: int = 20, stride: int = 10,
                            text_col: str = "text"):
    """END-TO-END exact-substring deduplication (Lee et al. 2022's
    remediation step): detect cross-document duplicated windows
    (:func:`duplicated_spans`), coalesce them into maximal token regions
    (:func:`spans.merge_spans`), then CUT those regions out of each
    document → (doc_id, clean_text, n_removed) with ``clean_text`` the
    surviving tokens joined by single spaces (the same canonicalization
    as the SQL twin).

    Scale shape: detection/merging shuffle only window digests and
    interval partials; the merged region table (flagged docs only — a
    small fraction of a real corpus) is broadcast via ``ray.put``; the
    removal pass is one streaming scan. Per-batch work is vectorized
    except one loop over the FLAGGED rows present in the batch (each
    does two ``searchsorted`` calls on that doc's region arrays)."""
    import ray

    from .spans import merge_spans
    from .terms import _flat_tokens as _ft

    hits = duplicated_spans(ds, window=window, stride=stride,
                            text_col=text_col)

    def to_intervals(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        s = pc.cast(pc.multiply(b["chunk_idx"], stride), pa.int64())
        return pa.table({
            "doc_id": b["doc_id"], "s": s,
            "e": pc.add(s, pc.cast(b["n_tokens"], pa.int64()))})

    merged = merge_spans(hits.map_batches(to_intervals,
                                          batch_format="pyarrow"))
    regions: dict = {}
    for r in merged.take_all():           # flagged docs only — bounded
        regions.setdefault(r["doc_id"], []).append(
            (int(r["span_start"]), int(r["span_end"])))
    packed = {}
    for d, v in regions.items():          # any id type (int or string)
        sv = sorted(v)
        packed[d] = (np.array([a for a, _ in sv], dtype=np.int64),
                     np.array([b for _, b in sv], dtype=np.int64))
    ref = ray.put(packed)

    def clean(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        reg = ray.get(ref)
        flat, parent = _ft(b, text_col)
        n_rows = b.num_rows
        doc_ids = b["doc_id"].to_numpy(zero_copy_only=False)
        valid = pc.is_valid(b[text_col])
        if len(flat) == 0:
            texts = pc.if_else(valid, pa.array([""] * n_rows),
                               pa.scalar(None, pa.string()))
            zeros = pc.if_else(valid,
                               pa.array(np.zeros(n_rows, dtype=np.int64)),
                               pa.scalar(None, pa.int64()))
            return pa.table({"doc_id": b["doc_id"], "clean_text": texts,
                             "n_removed": zeros})
        counts = np.bincount(parent, minlength=n_rows)
        offsets = np.concatenate([[0], np.cumsum(counts)])
        keep = np.ones(len(flat), dtype=bool)
        removed = np.zeros(n_rows, dtype=np.int64)
        for r in range(n_rows):
            starts_ends = reg.get(doc_ids[r])
            if starts_ends is None:
                continue
            starts_a, ends_a = starts_ends
            lo, nt = int(offsets[r]), int(counts[r])
            # merge_spans guarantees disjoint, sorted, in-bound regions:
            # direct slice assignment per region, O(regions) not O(nt)
            for a, b_ in zip(starts_a, ends_a):
                keep[lo + a:lo + min(b_, nt)] = False
            removed[r] = int(np.minimum(ends_a, nt).sum()
                             - starts_a.sum())
        toks = flat.filter(pa.array(keep))
        new_counts = counts - removed
        new_offsets = np.concatenate(
            [[0], np.cumsum(new_counts)]).astype(np.int32)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lst = pa.ListArray.from_arrays(
            pa.array(new_offsets, type=pa.int32()), toks)
        text_out = pc.binary_join(lst, " ")
        text_out = pc.if_else(valid, text_out, pa.scalar(None, pa.string()))
        rem = pc.if_else(valid, pa.array(removed),
                         pa.scalar(None, pa.int64()))
        return pa.table({"doc_id": b["doc_id"], "clean_text": text_out,
                         "n_removed": rem})

    return ds.map_batches(clean, batch_format="pyarrow")

