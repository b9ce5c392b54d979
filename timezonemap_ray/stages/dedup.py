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

from .text import md5_digest, token_hashes

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


class MinHasher:
    """Actor-pool stage: doc → ``bands`` rows (doc_id, band, band_key, sig).
    Permutation params are built once per actor in ``__init__``."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle: int = 3,
                 text_col: str = "text", seed: int = 17):
        assert num_perm % bands == 0
        self.a, self.b = _perm_params(num_perm, seed)
        self.num_perm, self.bands, self.shingle = num_perm, bands, shingle
        self.rows_per_band = num_perm // bands
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out_doc, out_band, out_key, out_sig = [], [], [], []
        for d, t in zip(doc_ids, texts):
            sig = minhash_signature(token_hashes(t or "", self.shingle),
                                    self.a, self.b)
            sig_list = sig.tolist()
            for band in range(self.bands):
                seg = sig[band * self.rows_per_band:(band + 1) * self.rows_per_band]
                # deterministic across processes (python hash() is salted)
                import hashlib
                key = int.from_bytes(
                    hashlib.blake2b(bytes([band]) + seg.tobytes(),
                                    digest_size=8).digest(), "little") \
                    & 0x7FFFFFFFFFFFFFFF
                out_doc.append(d)
                out_band.append(band)
                out_key.append(key)
                out_sig.append(sig_list)
        return pa.table({
            "doc_id": pa.array(out_doc),
            "band": pa.array(out_band, type=pa.int32()),
            "band_key": pa.array(out_key, type=pa.int64()),
            "sig": pa.array(out_sig, type=pa.list_(pa.uint64())),
        })


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
    sigs = np.array(group["sig"].to_pylist(), dtype=np.uint64)  # (n, num_perm)
    eq = (sigs[:, None, :] == sigs[None, :, :]).mean(axis=2)
    ii, jj = np.nonzero(np.triu(eq >= threshold, k=1))
    return [(min(doc[i], doc[j]), max(doc[i], doc[j])) for i, j in zip(ii, jj)]


def minhash_candidate_pairs(ds, num_perm=64, bands=16, shingle=3,
                            threshold=0.5, text_col="text",
                            concurrency=(1, 8)) -> set:
    """documents → LSH → verified-by-signature candidate pairs (set of
    (small_id, big_id)). The per-bucket work happens inside the groupby."""
    import pandas as pd

    band_rows = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(num_perm=num_perm, bands=bands,
                                   shingle=shingle, text_col=text_col),
        batch_format="pyarrow", concurrency=concurrency)

    def pairs_of_group(g: pa.Table) -> pa.Table:
        ps = _bucket_pairs(g, threshold)
        if not ps:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64())})
        return pa.table({"a": [p[0] for p in ps], "b": [p[1] for p in ps]})

    pairs_ds = band_rows.groupby("band_key").map_groups(
        pairs_of_group, batch_format="pyarrow")
    pdf = pairs_ds.to_pandas()
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



def _cluster_output_ds(ds, pairs, id_col: str = "doc_id"):
    """Distributed cluster assignment: only PAIRED ids hit the driver's
    union-find; the (id → cluster) mapping for those is broadcast and every
    row gets cluster = mapping.get(id, id) in map_batches. Unpaired docs
    never leave the workers."""
    import ray as _ray
    paired = sorted({d for p in pairs for d in p})
    mapping = clusters_from_pairs(paired, pairs)
    ref = _ray.put(mapping)

    def assign(b: pa.Table) -> pa.Table:
        mp = _ray.get(ref)
        ids = b[id_col].to_pylist()
        cl = [mp.get(i, i) for i in ids]
        return pa.table({
            id_col: b[id_col],
            "cluster_id": pa.array(cl, type=pa.int64()),
            "is_duplicate": pa.array([c != i for c, i in zip(cl, ids)]),
        })

    return ds.map_batches(assign, batch_format="pyarrow")


def minhash_dedup(ds, num_perm=64, bands=16, shingle=3, threshold=0.5,
                  text_col="text"):
    """→ (doc_id, cluster_id, is_duplicate) for the whole corpus."""
    pairs = minhash_candidate_pairs(ds, num_perm, bands, shingle, threshold,
                                    text_col)
    return _cluster_output_ds(ds.select_columns(["doc_id"]), pairs)


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def simhash64(text: str, shingle: int = 3) -> int:
    """64-bit SimHash over word-shingle hashes (vectorized bit counting).

    Shingles, not unigrams: unigram SimHash collapses on small
    vocabularies (any two docs sharing a word distribution hash close);
    shingle features keep word ORDER, matching the near-dup semantics of
    the rest of the dedup family.
    """
    if not text.split():
        return 0
    hs = token_hashes(text, shingle)
    if hs.size == 0:
        return 0
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    return int(((votes > 0).astype(np.uint64)
                << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))


class SimHasher:
    """doc → 4 band rows of the 64-bit simhash (16 bits per band)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out_doc, out_band, out_key, out_sim = [], [], [], []
        for d, t in zip(doc_ids, texts):
            sh = simhash64(t or "")
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
                  concurrency=(1, 8)):
    """→ (doc_id, cluster_id, is_duplicate); near-dup iff Hamming ≤ k.
    Banding guarantees recall for k ≤ 3 (4 bands, pigeonhole)."""
    band_rows = ds.map_batches(
        SimHasher, fn_constructor_kwargs=dict(text_col=text_col),
        batch_format="pyarrow", concurrency=concurrency)

    def pairs_of_group(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n < 2:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64())})
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

    pdf = band_rows.groupby("band_key").map_groups(
        pairs_of_group, batch_format="pyarrow").to_pandas()
    pairs = set() if (pdf.empty or "a" not in pdf.columns) else \
        set(zip(pdf["a"].astype(int), pdf["b"].astype(int)))
    return _cluster_output_ds(ds.select_columns(["doc_id"]), pairs)


POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


# ---------------------------------------------------------------------------
# exact n-gram jaccard verification
# ---------------------------------------------------------------------------

def ngram_jaccard_dedup(ds, shingle=3, threshold=0.5, text_col="text"):
    """LSH candidates verified with EXACT shingle-set Jaccard.
    → (doc_id, cluster_id, is_duplicate). Candidate texts are broadcast to
    the driver — candidates ≪ corpus by construction."""
    import pyarrow.compute as pc
    pairs = minhash_candidate_pairs(ds, threshold=max(0.3, threshold - 0.2),
                                    shingle=shingle, text_col=text_col)
    cand_ids = sorted({d for p in pairs for d in p})
    texts = {}
    if cand_ids:
        # distributed semi-join filter: only candidate texts reach the
        # driver (candidates ≪ corpus by LSH construction)
        cand_arr = pa.array(cand_ids)
        cand_rows = ds.map_batches(
            lambda b: b.filter(pc.is_in(b["doc_id"], value_set=cand_arr))
                       .select(["doc_id", text_col]),
            batch_format="pyarrow").take_all()
        texts = {r["doc_id"]: r[text_col] for r in cand_rows}
    verified = set()
    shingles = {d: token_hashes(texts.get(d, "") or "", shingle)
                for d in cand_ids}
    for a, b in pairs:
        sa, sb = shingles[a], shingles[b]
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        union = sa.size + sb.size - inter
        if union and inter / union >= threshold:
            verified.add((a, b))
    return _cluster_output_ds(ds.select_columns(["doc_id"]), verified)


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
        vecs = np.array(batch[self.vec_col].to_pylist(), dtype=np.float64)
        signs = (vecs @ self.planes) > 0
        keys = (signs.astype(np.uint64)
                << np.arange(signs.shape[1], dtype=np.uint64)[None, :]) \
            .sum(axis=1, dtype=np.uint64)
        return pa.table({
            "vec_id": batch[self.id_col],
            "bucket": pa.array(keys.astype(np.int64), type=pa.int64()),
            "vec": pa.array(vecs.tolist(), type=pa.list_(pa.float64())),
        })


def embedding_dedup(ds, dim: int, threshold: float = 0.95, n_bits: int = 12,
                    vec_col="embedding", id_col="vec_id", concurrency=(1, 8)):
    """→ (vec_id, cluster_id, is_duplicate): cosine ≥ threshold within
    hyperplane-LSH buckets (near-dup by embedding similarity)."""
    buckets = ds.map_batches(
        HyperplaneHasher,
        fn_constructor_kwargs=dict(dim=dim, n_bits=n_bits, vec_col=vec_col,
                                   id_col=id_col),
        batch_format="pyarrow", concurrency=concurrency)

    def pairs_of_group(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n < 2:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64())})
        if n > MAX_BUCKET:
            import logging
            logging.getLogger(__name__).warning(
                "LSH bucket truncated: %d rows > MAX_BUCKET=%d", n, MAX_BUCKET)
            g = g.slice(0, MAX_BUCKET)
            n = MAX_BUCKET
        ids = g["vec_id"].to_pylist()
        v = np.array(g["vec"].to_pylist(), dtype=np.float64)
        norm = np.linalg.norm(v, axis=1)
        norm[norm == 0] = 1.0
        vn = v / norm[:, None]
        sim = vn @ vn.T
        ii, jj = np.nonzero(np.triu(sim >= threshold, k=1))
        return pa.table({
            "a": [min(ids[i], ids[j]) for i, j in zip(ii, jj)],
            "b": [max(ids[i], ids[j]) for i, j in zip(ii, jj)]})

    pdf = buckets.groupby("bucket").map_groups(
        pairs_of_group, batch_format="pyarrow").to_pandas()
    pairs = set() if (pdf.empty or "a" not in pdf.columns) else \
        set(zip(pdf["a"].astype(int), pdf["b"].astype(int)))
    return _cluster_output_ds(ds.select_columns([id_col]), pairs,
                              id_col=id_col)
