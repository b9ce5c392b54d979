"""Corpus-management operators for training-data curation: deterministic
train/val/test splits, per-source quotas, and train/test decontamination.

The reference engine has none of these (it is a geo lookup engine —
SURVEY §2); they extend the LLM-data-pipeline surface the brief asks for.
All three are built on the repo's deterministic-hash discipline
(``select.SAMPLE_MULT/SAMPLE_MOD``) so every result is SQL-reproducible,
stable under retries/resumes, and free of RNG state:

- ``split_assign`` / ``split_counts`` — assign each row to
  train/val/test by ``hash(id) mod 10`` (8/1/1). The counts variant
  pre-aggregates per block (split × group partials — a few dozen rows per
  block) and folds the partials, so the shuffle-free driver merge sees
  O(blocks · splits · groups) rows, never the corpus.
- ``quota_per_group`` — keep at most ``k`` rows per group, chosen in
  deterministic hash order (a uniform "cap docs per domain/source"
  downsampler: heavily-crawled domains are capped, small ones kept
  whole). Rides ``topk_per_group``'s combiner: every block prunes itself
  to ≤ k rows per group before the (group-key-partitioned) exact
  re-selection, so the shuffle moves ≤ k·groups·blocks rows at 100 TB.
- ``decontaminate`` — flag corpus documents sharing any word-``shingle``
  n-gram with a benchmark/eval set (train/test-overlap scrubbing). The
  benchmark side is SMALL by contract (an eval set), so it is collected
  once and broadcast via ``ray.put`` (hash array + exact-string set);
  the corpus side streams through one vectorized ``map_batches``:
  per-doc shingle hashes (``text.token_hashes`` — equal strings ⇔ equal
  hashes) screened with ``np.isin`` against the sorted benchmark hashes,
  and the rare hash-hit docs re-verified against exact shingle STRINGS,
  so 64-bit collisions can never flip a verdict and the DuckDB oracle
  (exact string join) matches bit-for-bit. No shuffle at all: the big
  side never leaves its blocks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .select import SAMPLE_MULT, SAMPLE_MOD, topk_per_group
from .text import token_hashes

# split ids: hash mod 10 → 0..7 train, 8 val, 9 test
SPLIT_NAMES = ("train", "val", "test")


def _hash_of(ids: np.ndarray) -> np.ndarray:
    from .select import _hash_mod
    return _hash_mod(ids.astype(np.int64))


def _split_codes(ids: np.ndarray) -> np.ndarray:
    """0=train (h%10 in 0..7), 1=val (8), 2=test (9)."""
    d = _hash_of(ids) % np.int64(10)
    return np.where(d < 8, 0, np.where(d == 8, 1, 2)).astype(np.int64)


def split_sql_expr(id_col: str) -> str:
    """SQL expression matching ``_split_codes``'s split NAME exactly
    (same negative-id renormalization as ``sample_hash_sql_pred``)."""
    m = SAMPLE_MOD
    h = f"(((({id_col} * {SAMPLE_MULT}) % {m}) + {m}) % {m}) % 10"
    return (f"CASE WHEN ({h}) < 8 THEN 'train' "
            f"WHEN ({h}) = 8 THEN 'val' ELSE 'test' END")


def split_assign(ds, id_col: str):
    """Append a ``split`` column (train/val/test) by deterministic hash."""
    def assign(b: pa.Table) -> pa.Table:
        codes = _split_codes(b[id_col].to_numpy(zero_copy_only=False))
        names = np.array(SPLIT_NAMES, dtype=object)[codes]
        return b.append_column("split", pa.array(names, type=pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


def split_counts(ds, id_col: str, group_col: str,
                 sum_col: str | None = None) -> pa.Table:
    """(split, group, n_rows[, sum_<sum_col>]) — per-block partials folded
    on the driver (the driver sees only O(blocks·splits·groups) partial
    rows, never data rows)."""
    def partial(b: pa.Table) -> pa.Table:
        codes = _split_codes(b[id_col].to_numpy(zero_copy_only=False))
        g = b[group_col].to_numpy(zero_copy_only=False)
        gu, ginv = np.unique(g.astype(str), return_inverse=True)
        key = codes * len(gu) + ginv
        cnt = np.bincount(key, minlength=3 * len(gu)).astype(np.int64)
        keep = cnt > 0
        out = {"split": pa.array(
                   [SPLIT_NAMES[c] for c in
                    np.repeat(np.arange(3), len(gu))[keep]]),
               group_col: pa.array(list(np.tile(gu, 3)[keep])),
               "n_rows": pa.array(cnt[keep], type=pa.int64())}
        if sum_col is not None:
            s = b[sum_col].to_numpy(zero_copy_only=False).astype(np.int64)
            out[f"sum_{sum_col}"] = pa.array(
                np.bincount(key, weights=s.astype(np.float64),
                            minlength=3 * len(gu)).astype(np.int64)[keep],
                type=pa.int64())
        return pa.table(out)

    parts = [b for b in ds.map_batches(partial, batch_format="pyarrow")
                          .iter_batches(batch_size=None, batch_format="pyarrow") if b.num_rows]
    t = pa.concat_tables(parts)
    aggs = [("n_rows", "sum")]
    if sum_col is not None:
        aggs.append((f"sum_{sum_col}", "sum"))
    g = t.group_by(["split", group_col]).aggregate(aggs)
    ren = {"n_rows_sum": "n_rows"}
    if sum_col is not None:
        ren[f"sum_{sum_col}_sum"] = f"sum_{sum_col}"
    return g.rename_columns([ren.get(c, c) for c in g.column_names])


def quota_per_group(ds, group_col: str, id_col: str, k: int,
                    n_parts: int = 64):
    """Keep ≤ k rows per group, deterministically: the k rows whose
    hashed id is smallest (ties by id). SQL-reproducible via
    ``ROW_NUMBER() OVER (PARTITION BY group ORDER BY <hash>, id) <= k``
    (``quota_sql_order``). Combiner-shaped: block-local prune first."""
    def add_order(b: pa.Table) -> pa.Table:
        h = _hash_of(b[id_col].to_numpy(zero_copy_only=False))
        # negate: topk_per_group keeps LARGEST order values
        return b.append_column("_negh",
                               pa.array((-h).astype(np.float64)))

    kept = topk_per_group(ds.map_batches(add_order, batch_format="pyarrow"),
                          group_col, "_negh", k, id_col, n_parts=n_parts)
    return kept.map_batches(lambda t: t.drop_columns(["_negh"]),
                            batch_format="pyarrow")


def quota_sql_order(id_col: str) -> str:
    """ORDER BY expression matching ``quota_per_group``'s selection."""
    m = SAMPLE_MOD
    return f"(((({id_col} * {SAMPLE_MULT}) % {m}) + {m}) % {m}), {id_col}"


# ---------------------------------------------------------------------------
# Train/test decontamination
# ---------------------------------------------------------------------------

def _shingle_strings(text: str, shingle: int) -> set:
    toks = text.split()
    return {" ".join(toks[i:i + shingle])
            for i in range(len(toks) - shingle + 1)}


def collect_benchmark_shingles(bench_ds, shingle: int = 8,
                               text_col: str = "text"):
    """Distinct shingle hashes + exact strings of the (small) benchmark
    set. Per-block distinct first; the driver folds only distinct-per-
    block partials. Returns (sorted uint64 hashes, frozenset of strings)."""
    def explode(b: pa.Table) -> pa.Table:
        cache: dict = {}
        hs, ss = [], set()
        for t in b[text_col].to_pylist():
            hs.append(token_hashes(t or "", shingle, pad=False,
                                   token_cache=cache))
            ss |= _shingle_strings(t or "", shingle)
        h = (np.unique(np.concatenate(hs)) if hs
             else np.empty(0, dtype=np.uint64))
        s = sorted(ss)
        # pad the (shorter) hash column so one table carries both
        n = max(len(h), len(s))
        return pa.table({
            "h": pa.array(np.pad(h.view(np.int64), (0, n - len(h))),
                          type=pa.int64()),
            "hv": pa.array(np.arange(n) < len(h)),
            "s": pa.array(s + [None] * (n - len(s)), type=pa.string()),
        })

    parts = [b for b in bench_ds.map_batches(explode, batch_format="pyarrow")
                                .iter_batches(batch_size=None, batch_format="pyarrow")
             if b.num_rows]
    if not parts:
        return np.empty(0, dtype=np.uint64), frozenset()
    t = pa.concat_tables(parts)
    h = t.filter(t["hv"])["h"].to_numpy(zero_copy_only=False)
    strings = frozenset(s for s in t["s"].to_pylist() if s is not None)
    return np.unique(h.view(np.uint64)), strings


class Decontaminator:
    """Actor-pool stage: (doc_id, n_hits, contaminated) per corpus doc.

    ``__init__`` pulls the broadcast benchmark refs ONCE per actor;
    ``__call__`` is the vectorized hash screen + exact-string re-verify
    described in the module docstring."""

    def __init__(self, bench_hashes_ref, bench_strings_ref,
                 shingle: int = 8, text_col: str = "text"):
        import ray
        self.bh = ray.get(bench_hashes_ref)      # sorted uint64
        self.bs = ray.get(bench_strings_ref)     # frozenset of strings
        self.shingle, self.text_col = shingle, text_col
        self.cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(self.cache) > 2_000_000:
            self.cache.clear()
        texts = batch[self.text_col].to_pylist()
        n_hits = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            hs = token_hashes(t or "", self.shingle, pad=False,
                              token_cache=self.cache)
            if not hs.size or not self.bh.size:
                continue
            pos = np.searchsorted(self.bh, hs)
            pos[pos == self.bh.size] = 0
            cand = int(np.count_nonzero(self.bh[pos] == hs))
            if cand:  # rare: exact-string verification of hash hits
                n_hits[i] = sum(1 for s in
                                _shingle_strings(t or "", self.shingle)
                                if s in self.bs)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_hits": pa.array(n_hits, type=pa.int64()),
            "contaminated": pa.array(n_hits > 0),
        })


def decontaminate(corpus_ds, bench_ds, shingle: int = 8,
                  text_col: str = "text", concurrency: int = 4):
    """Flag corpus docs sharing ≥ 1 word-``shingle`` n-gram with the
    benchmark set. Benchmark broadcast once (``ray.put``); corpus
    streams — no shuffle, no driver data path."""
    import ray
    bh, bs = collect_benchmark_shingles(bench_ds, shingle, text_col)
    bh_ref, bs_ref = ray.put(bh), ray.put(bs)
    # An actor pool equal to the whole cluster starves the upstream read
    # (observed DEADLOCK: 4 actors on a 4-CPU session hold every CPU while
    # ReadParquet waits backpressured forever — same quirk class as the
    # hash-shuffle aggregator cap in stages/terms.py). Always leave ≥ 1
    # CPU for the feeding tasks; on a ≤ 2-CPU session even a 1-actor pool
    # can starve the read, so fall back to a stateless task pool there
    # (per-task re-init = one plasma ray.get, trivial).
    cpus = int(ray.cluster_resources().get("CPU", 8))
    if cpus <= 2:
        return corpus_ds.map_batches(
            lambda b: Decontaminator(bh_ref, bs_ref, shingle, text_col)(b),
            batch_format="pyarrow")
    concurrency = max(1, min(concurrency, cpus - 1))
    return corpus_ds.map_batches(
        Decontaminator, fn_constructor_args=(bh_ref, bs_ref, shingle,
                                             text_col),
        batch_format="pyarrow", concurrency=concurrency)


def mixture_sample(ds, group_col: str, id_col: str, rates_bp: dict):
    """Weighted dataset-mixture composition: keep each group (source /
    domain / language) at its OWN deterministic hash-sample rate in basis
    points — the training-mix step ("web 25 %, books 100 %, code 50 %").

    Vectorized per batch: group → rate via ``pc.index_in`` into the tiny
    broadcast rate table, then the same stateless int64 hash predicate as
    ``select.sample_hash`` (no RNG state: stable under retries/resumes,
    disjointness and SQL reproducibility inherited). Groups absent from
    ``rates_bp`` are dropped (rate 0)."""
    import pyarrow.compute as pc

    from .select import SAMPLE_MOD, SAMPLE_MULT, SAMPLE_SPACE

    keys = pa.array(list(rates_bp.keys()))
    rates = np.asarray(list(rates_bp.values()), dtype=np.int64)

    def keep(b: pa.Table) -> pa.Table:
        pos = pc.index_in(b[group_col], value_set=keys)
        posn = pc.fill_null(pos, -1).to_numpy(zero_copy_only=False)
        rate = np.where(posn >= 0, rates[np.clip(posn, 0, None)], 0)
        from .select import _hash_bp
        v = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.filter(pa.array(_hash_bp(v) < rate))

    return ds.map_batches(keep, batch_format="pyarrow")


def mixture_sql_pred(id_col: str, group_col: str, rates_bp: dict) -> str:
    """The SQL predicate matching ``mixture_sample`` exactly (same
    negative-id renormalization as ``sample_hash_sql_pred``)."""
    from .select import SAMPLE_MOD, SAMPLE_MULT, SAMPLE_SPACE
    cases = " ".join(f"WHEN '{k}' THEN {v}" for k, v in rates_bp.items())
    m = SAMPLE_MOD
    return (f"((((({id_col} * {SAMPLE_MULT}) % {m}) + {m}) % {m})"
            f" % {SAMPLE_SPACE}) < (CASE {group_col} {cases} ELSE 0 END)")
