"""Distributed selection operators: exact quantiles, deterministic hash
sampling, top-k per group.

The reference is a lookup engine with no selection operators (SURVEY §2);
these are the training-data-pipeline extensions a 100 TB corpus needs, each
built to avoid the operations that do not survive that scale:

- ``quantile_exact`` — EXACT order statistics without a global sort: an
  iterative histogram-refinement selection (the classic distributed
  selection algorithm). Each pass is one streaming scan that folds every
  block into a (n_active_intervals × B) counts matrix; the driver sees a
  few KB per pass and narrows each quantile's value interval by ~B×. A
  global ``ds.sort`` would shuffle every byte once; this does
  O(log_B(range)) cheap scans and shuffles nothing.
- ``sample_hash`` — deterministic pseudo-random sampling by pure int64
  arithmetic on an id column. Reproducible across engines (the same
  formula runs in SQL — see ``sample_hash_sql_pred``), stable under
  retries/restarts, and embarrassingly parallel: a filter inside
  ``map_batches``, no RNG state, no coordination.
- ``topk_per_group`` — per-group top-k with a block-local combiner: stage 1
  prunes every block to ≤ k rows per group (vectorized lexsort + run
  slicing), so the shuffle moves at most k × groups × blocks rows instead
  of the full table; stage 2 re-selects exactly within coarse hash
  partitions of the group key (one ``map_groups`` call per partition — the
  per-tiny-group dispatch lesson from the dedup family, PERF.md).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


# ---------------------------------------------------------------------------
# Exact quantiles (iterative histogram selection)
# ---------------------------------------------------------------------------

_HIST_BUCKETS = 1024
_EXACT_PULL_CAP = 262_144  # pull-and-sort threshold per interval


def _fold_extent(ds, column):
    """(n_nonnull, finite_min, finite_max, n_neginf, n_posinf) in one
    distributed pass (NaN/null ignored; ±inf counted separately so the
    histogram refinement always works on FINITE interval bounds — an
    infinite bound would make every bucket edge NaN)."""
    def fold(b: pa.Table) -> pa.Table:
        v = b[column].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        fin = v[np.isfinite(v)]
        return pa.table({
            "n": pa.array([v.size], type=pa.int64()),
            "lo": pa.array([float(fin.min()) if fin.size else math.inf]),
            "hi": pa.array([float(fin.max()) if fin.size else -math.inf]),
            "nneg": pa.array([int((v == -math.inf).sum())], type=pa.int64()),
            "npos": pa.array([int((v == math.inf).sum())], type=pa.int64())})

    n, lo, hi, nneg, npos = 0, math.inf, -math.inf, 0, 0
    for r in ds.map_batches(fold, batch_format="pyarrow").take_all():
        n += int(r["n"])
        lo = min(lo, float(r["lo"]))
        hi = max(hi, float(r["hi"]))
        nneg += int(r["nneg"])
        npos += int(r["npos"])
    return n, lo, hi, nneg, npos


def kth_smallest(ds, column: str, ks: list, n_buckets: int = _HIST_BUCKETS,
                 exact_cap: int = _EXACT_PULL_CAP, _extent=None) -> dict:
    """Exact k-th smallest values (0-based ranks ``ks``) of a float column.

    Multi-k histogram refinement with a GLOBAL-rank invariant: each round
    histograms every still-active interval in ONE scan (the per-block fold
    returns below-lo counts + an (intervals × n_buckets) counts matrix), so
    the number of full scans is O(log_B(value range)), independent of
    len(ks). The rank offset is recomputed from the scan's own ``below``
    count each round rather than carried across rounds, and bucket bounds are
    widened by one ulp — so bucket-edge float rounding can never desync the
    interval from the true k-th value. An interval finishes when it
    collapses to one float64 or holds ≤ ``exact_cap`` values (one filtered
    pull + driver sort resolves it exactly).
    """
    n, glo, ghi, nneg, npos = (_extent if _extent is not None
                               else _fold_extent(ds, column))
    if n == 0:
        return {int(k): None for k in ks}
    out: dict = {}
    # ±inf resolve by rank position alone; the refinement below then runs
    # entirely on finite interval bounds
    state: dict = {}
    targets: dict = {}
    for k in ks:
        kk = int(np.clip(k, 0, n - 1))
        if kk < nneg:
            out[int(k)] = -math.inf
        elif kk >= n - npos:
            out[int(k)] = math.inf
        else:
            state[int(k)] = [glo, ghi]
            targets[int(k)] = kk
    # per k: [lo, hi] known (by invariant) to contain the k-th value
    recoveries: dict = {}

    for _ in range(96):  # ulp-level convergence bound for any float64 range
        active = {k: s for k, s in state.items() if k not in out}
        if not active:
            break
        for k, (lo, hi) in list(active.items()):
            if lo == hi:  # single float left — no pull needed (dup-safe)
                out[k] = float(lo)
                del active[k]
        if not active:
            break
        intervals = sorted({tuple(s) for s in active.values()})
        stats = _histogram_pass(ds, column, intervals, n_buckets)
        pulled: dict = {}     # per-round pull caches, keyed by interval —
        pulled_dist: dict = {}  # ks sharing an interval share one scan
        for k, s in active.items():
            lo, hi = s
            below, c = stats[(lo, hi)]
            rank = targets[k] - below  # exact: recomputed THIS round
            total = int(c.sum())
            if rank < 0 or rank >= total:
                # the composite bucket-edge arithmetic can round by more
                # than the 1-ulp widening on pathological ranges (denormals,
                # 1e±300 magnitudes) and push the k-th just outside the
                # interval. The below-count recomputation DETECTS this
                # exactly; recover by widening the offending side back to
                # the global extent and re-refining (costs a few extra
                # rounds, never wrong).
                recoveries[k] = recoveries.get(k, 0) + 1
                if recoveries[k] > 8:
                    raise RuntimeError(
                        f"kth_smallest failed to converge for k={k}")
                state[k] = [glo if rank < 0 else lo,
                            ghi if rank >= total else hi]
                continue
            if total <= exact_cap:
                if (lo, hi) not in pulled:
                    v = _pull_range(ds, column, lo, hi)
                    v.sort()
                    pulled[(lo, hi)] = v
                out[k] = float(pulled[(lo, hi)][rank])
                continue
            cum = np.cumsum(c)
            b = int(np.searchsorted(cum, rank + 1))
            if not math.isfinite(hi - lo):
                # the FINITE extent can still overflow (values near both
                # ±1.7e308): the histogram pass bisected at mid — mirror
                # its two buckets here. The [lo,mid]/[mid,hi] overlap at
                # mid is harmless: ranks are recounted from below next
                # round (review-found)
                mid = lo / 2 + hi / 2
                state[k] = [lo, mid] if b == 0 else [mid, hi]
                continue
            width = (hi - lo) / n_buckets
            if width == 0.0:
                # (hi-lo)/B underflowed: ≤ ~B distinct denormal-spaced
                # floats remain — enumerate distinct values and resolve by
                # exact counts (row volume never pulled)
                if (lo, hi) not in pulled_dist:
                    pulled_dist[(lo, hi)] = _pull_distinct_range(
                        ds, column, lo, hi)
                out[k] = float(_kth_by_value_counts(
                    ds, column, pulled_dist[(lo, hi)], targets[k]))
                continue
            # one-ulp widening keeps the true k-th inside despite edge
            # rounding in the bucket-index arithmetic
            new_lo = max(lo, np.nextafter(lo + b * width, -math.inf))
            new_hi = hi if b == n_buckets - 1 else min(
                hi, np.nextafter(lo + (b + 1) * width, math.inf))
            if (new_lo, new_hi) == (lo, hi):
                # sub-ulp buckets can't split further — the interval spans
                # < n_buckets distinct float64s. Collect the DISTINCT values
                # (deduped per block, ≤ n_buckets rows each, dup-count-proof)
                # and binary-resolve the k-th by below-counts.
                if (lo, hi) not in pulled_dist:
                    pulled_dist[(lo, hi)] = _pull_distinct_range(
                        ds, column, lo, hi)
                out[k] = float(_kth_by_value_counts(
                    ds, column, pulled_dist[(lo, hi)], targets[k]))
                continue
            state[k] = [new_lo, new_hi]
    for k, s in state.items():  # safety net (should be unreachable)
        if k not in out:
            vals = _pull_range(ds, column, s[0], s[1])
            vals.sort()
            out[k] = float(vals[targets[k] - _count_below(ds, column, s[0])])
    return out


def _histogram_pass(ds, column, intervals, n_buckets):
    """One scan: for every [lo, hi] interval, (count of values < lo,
    per-bucket counts inside the interval); folded to the driver as tiny
    rows."""
    iv = list(intervals)

    def fold(b: pa.Table) -> pa.Table:
        v = b[column].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        blobs, belows = [], []
        for lo, hi in iv:
            belows.append(int((v < lo).sum()))
            x = v[(v >= lo) & (v <= hi)]
            span = hi - lo
            if not np.isfinite(span):
                # extent overflow (values near both ±1.7e308): bisect at
                # the overflow-safe midpoint; refinement mirrors this
                mid = lo / 2 + hi / 2
                bix = np.where(x < mid, 0, n_buckets - 1)
            elif span > 0:
                bix = np.clip(((x - lo) / span * n_buckets)
                              .astype(np.int64), 0, n_buckets - 1)
            else:
                bix = np.zeros(x.size, dtype=np.int64)
            blobs.append(np.bincount(bix, minlength=n_buckets).tobytes())
        return pa.table({
            "iv": pa.array(np.arange(len(iv)), type=pa.int64()),
            "below": pa.array(belows, type=pa.int64()),
            "counts": pa.array(blobs, type=pa.binary())})

    agg = {i: [0, np.zeros(n_buckets, dtype=np.int64)]
           for i in range(len(iv))}
    for r in ds.map_batches(fold, batch_format="pyarrow").take_all():
        a = agg[int(r["iv"])]
        a[0] += int(r["below"])
        a[1] += np.frombuffer(r["counts"], dtype=np.int64)
    return {iv[i]: (agg[i][0], agg[i][1]) for i in range(len(iv))}


def _pull_distinct_range(ds, column, lo, hi) -> np.ndarray:
    """DISTINCT values in [lo, hi], deduped inside each block — row volume
    never reaches the driver, only per-block uniques (callers guarantee the
    interval holds few distinct floats)."""
    def keep(b: pa.Table) -> pa.Table:
        v = b[column].to_numpy(zero_copy_only=False).astype(np.float64)
        m = ~np.isnan(v) & (v >= lo) & (v <= hi)
        return pa.table({"v": pa.array(np.unique(v[m]))})

    parts = [r["v"].to_numpy(zero_copy_only=False)
             for r in ds.map_batches(keep, batch_format="pyarrow")
             .iter_batches(batch_size=None, batch_format="pyarrow")]
    return np.unique(np.concatenate(parts)) if parts else np.empty(0)


def _count_below(ds, column, lo) -> int:
    def fold(b: pa.Table) -> pa.Table:
        v = b[column].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"n": pa.array([int((v[~np.isnan(v)] < lo).sum())],
                                       type=pa.int64())})
    return sum(int(r["n"]) for r in
               ds.map_batches(fold, batch_format="pyarrow").take_all())


def _kth_by_value_counts(ds, column, vals: np.ndarray, k_global: int):
    """Exact k-th when only a handful of DISTINCT values remain but their
    row counts may be huge: ONE pass counts rows per candidate value (plus
    rows below the smallest), then cumulative counts locate the k-th."""
    vals = np.sort(vals)

    def fold(b: pa.Table) -> pa.Table:
        v = b[column].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        below = int((v < vals[0]).sum())
        pos = np.searchsorted(vals, v)
        hit = (pos < vals.size)
        hit[hit] = vals[pos[hit]] == v[hit]  # exact value matches only
        counts = np.bincount(pos[hit], minlength=vals.size)
        return pa.table({
            "below": pa.array([below], type=pa.int64()),
            "counts": pa.array([counts.tobytes()], type=pa.binary())})

    below = 0
    counts = np.zeros(vals.size, dtype=np.int64)
    for r in ds.map_batches(fold, batch_format="pyarrow").take_all():
        below += int(r["below"])
        counts += np.frombuffer(r["counts"], dtype=np.int64)
    cum = below + np.cumsum(counts)
    return vals[int(np.searchsorted(cum, k_global + 1))]


def _pull_range(ds, column, lo, hi) -> np.ndarray:
    """All values in [lo, hi] (bounded by the exact_cap check upstream)."""
    def keep(b: pa.Table) -> pa.Table:
        v = b[column].to_numpy(zero_copy_only=False).astype(np.float64)
        m = ~np.isnan(v) & (v >= lo) & (v <= hi)
        return pa.table({"v": pa.array(v[m])})

    parts = [r["v"].to_numpy(zero_copy_only=False)
             for r in ds.map_batches(
                 keep, batch_format="pyarrow").iter_batches(
                     batch_size=None, batch_format="pyarrow")]
    return np.concatenate(parts) if parts else np.empty(0)


def quantile_exact(ds, column: str, qs: list, stage: bool = True) -> pa.Table:
    """EXACT discrete quantiles (DuckDB/Postgres ``quantile_disc``
    semantics: smallest value with cumulative count ≥ q·n, i.e. 0-based
    rank ``max(0, ceil(q·n) − 1)``; NaN/null ignored).

    Returns a table (q: double, value: double), one row per requested q.

    ``stage=True`` (default) projects the ONE needed column and
    materializes it before the refinement: the algorithm is multi-scan
    (extent + O(log value-range) histogram rounds), and without staging
    every round re-executes the whole upstream pipeline. A single f64
    column is ~8 bytes/row — object-store-resident (spilling beyond),
    which beats O(rounds) recomputes of arbitrary upstream work. Pass
    ``stage=False`` when the caller already staged (grouped_quantile's
    hot path) or when upstream is a bare parquet read it is cheaper to
    re-scan than to pin."""
    if stage:
        ds = ds.select_columns([column]).materialize()
    extent = _fold_extent(ds, column)  # ONE extent scan, shared with
    n = extent[0]                      # kth_smallest (review-found dup)
    if n == 0:
        return pa.table({"q": pa.array([float(q) for q in qs],
                                       type=pa.float64()),
                         "value": pa.array([None] * len(qs),
                                           type=pa.float64())})
    # list, not dict: duplicate qs each keep their output row
    pairs = [(float(q), max(0, math.ceil(q * n) - 1)) for q in qs]
    got = kth_smallest(ds, column, sorted({k for _, k in pairs}),
                       _extent=extent)
    return pa.table({
        "q": pa.array([q for q, _ in pairs], type=pa.float64()),
        "value": pa.array([got[k] for _, k in pairs], type=pa.float64())})


# ---------------------------------------------------------------------------
# Deterministic hash sampling
# ---------------------------------------------------------------------------

SAMPLE_MULT = 2654435761
SAMPLE_MOD = 1000000007
SAMPLE_SPACE = 10_000  # basis points


def _hash_mod(v: np.ndarray) -> np.ndarray:
    """The deterministic id hash ``(id·SAMPLE_MULT) mod SAMPLE_MOD`` —
    THE single definition of the sampling hash; every engine-side use
    must route through here (or :func:`_hash_bp`) so the rule can never
    diverge from ``sample_hash_sql_pred``. PRECONDITION |id| <
    2^63/SAMPLE_MULT ≈ 3.47e9 (true for every testdata id space): above
    it numpy wraps silently while the SQL twins raise an int64 overflow
    — a caller with wider ids (snowflake-style 64-bit) must pre-fold
    them (e.g. ``id % SAMPLE_MOD``) on BOTH sides."""
    return (v * np.int64(SAMPLE_MULT)) % np.int64(SAMPLE_MOD)


def _hash_bp(v: np.ndarray) -> np.ndarray:
    """Basis-point bucket of the sampling hash (``_hash_mod % 10000``) —
    compare against a rate_bp for membership."""
    return _hash_mod(v) % np.int64(SAMPLE_SPACE)


def sample_hash(ds, id_col: str, rate_bp: int, invert: bool = False):
    """Keep rows where ``((id·2654435761) mod 1000000007) mod 10000 <
    rate_bp`` — a deterministic ~rate_bp/10000 sample. Pure int64
    arithmetic (ids must stay below 2^63 / 2654435761 ≈ 3.4e9 — true for
    every testdata id space), so DuckDB reproduces the exact row set via
    ``sample_hash_sql_pred``. No RNG state: stable under retries, resumes
    and engine swaps. ``invert=True`` keeps the complement (the exact
    other rows — a disjoint holdout)."""
    def keep(b: pa.Table) -> pa.Table:
        v = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _hash_bp(v) < rate_bp
        return b.filter(pa.array(~m if invert else m))

    return ds.map_batches(keep, batch_format="pyarrow")


def sample_hash_sql_pred(id_col: str, rate_bp: int) -> str:
    """The SQL predicate matching ``sample_hash`` exactly — including for
    NEGATIVE ids: numpy's ``%`` follows the divisor's sign (always
    non-negative here) while SQL's follows the dividend's, so the SQL side
    re-normalizes with ``(x % m + m) % m`` (review-found divergence)."""
    m = SAMPLE_MOD
    return (f"((((({id_col} * {SAMPLE_MULT}) % {m}) + {m}) % {m})"
            f" % {SAMPLE_SPACE}) < {rate_bp}")


def sample_bottom_k(ds, id_col: str, k: int) -> pa.Table:
    """Deterministic uniform k-row sample: the k rows whose hashed id
    (``(id*SAMPLE_MULT) % SAMPLE_MOD``, ties by id) is smallest. Bottom-k
    of a pseudo-random hash IS a uniform sample, and it is mergeable:
    every block prunes itself to ≤ k rows (vectorized lexsort), the
    ≤ k×blocks survivors fold into the global bottom-k on the driver —
    no shuffle, no RNG state, stable under retries/resumes, and
    SQL-reproducible (``ORDER BY`` the same hash ``LIMIT k``; see
    ``sample_bottom_k_sql_order``). Complements ``sample_hash``: that one
    samples a RATE (size varies with input), this one a fixed SIZE."""

    def bottom(t: pa.Table) -> pa.Table:
        v = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = np.lexsort((v, _hash_mod(v)))[:k]
        return t.take(pa.array(sel))

    parts = [b for b in ds.map_batches(bottom, batch_format="pyarrow")
                          .iter_batches(batch_size=None, batch_format="pyarrow")
             if b.num_rows]
    if not parts:
        return ds.schema().base_schema.empty_table()
    return bottom(pa.concat_tables(parts))


def sample_bottom_k_sql_order(id_col: str) -> str:
    """The SQL ORDER BY expression matching ``sample_bottom_k`` exactly
    (same negative-id renormalization as ``sample_hash_sql_pred``)."""
    m = SAMPLE_MOD
    return (f"(((({id_col} * {SAMPLE_MULT}) % {m}) + {m}) % {m}), {id_col}")


def _hash_part_of(garr, n_parts: int) -> np.ndarray:
    """Deterministic coarse partition id per row for ANY group-key type
    (int, string, with or without nulls): dictionary-encode the batch,
    hash the (few) distinct values, gather. Nulls map to part 0 —
    consistent across batches, which is all partitioning needs."""
    import pyarrow.compute as pc
    from .text import _splitmix64, hash_u64
    if isinstance(garr, pa.ChunkedArray):
        garr = garr.combine_chunks()
    enc = garr.dictionary_encode()
    dict_vals = enc.dictionary.to_pylist()
    hv = np.empty(len(dict_vals) + 1, dtype=np.int64)
    for i, u in enumerate(dict_vals):
        if isinstance(u, (int, np.integer)):
            h = int(_splitmix64(np.uint64(int(u) & ((1 << 64) - 1))))
        else:
            h = hash_u64(str(u))
        hv[i] = h % n_parts
    hv[len(dict_vals)] = 0  # null sentinel
    codes = pc.fill_null(enc.indices, len(dict_vals)) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    return hv[codes]


def _group_codes(garr):
    """(codes int64 array, dictionary) — null keys get the sentinel code
    len(dictionary). Integer codes sort/run-slice safely for any key type
    (object arrays with None crash numpy comparisons)."""
    import pyarrow.compute as pc
    if isinstance(garr, pa.ChunkedArray):
        garr = garr.combine_chunks()
    enc = garr.dictionary_encode()
    codes = pc.fill_null(enc.indices, len(enc.dictionary)) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    return codes, enc.dictionary


def group_row_counts(ds, group_col: str, n_parts: int = 64) -> list:
    """(group_value, n_rows) per group via a per-block combiner: each block
    folds to its distinct (group, n) pairs, then the partials merge within
    coarse hash partitions of the key (NOT ``groupby(group_col)`` — Ray's
    sort-based groupby crashes on null keys, and null is a legitimate SQL
    group). The shuffle moves per-block group cardinality, never rows; the
    driver sees exactly #groups rows (the same cardinality any grouped
    result already assumes)."""

    def fold(b: pa.Table) -> pa.Table:
        vc = b[group_col].combine_chunks().value_counts()
        t = pa.table({group_col: vc.field("values"),
                      "_n": vc.field("counts").cast(pa.int64())})
        return t.append_column(
            "_part", pa.array(_hash_part_of(t[group_col], n_parts)))

    def merge(g: pa.Table) -> pa.Table:
        codes, dict_vals = _group_codes(g[group_col])
        sums = np.bincount(
            codes, weights=g["_n"].to_numpy(zero_copy_only=False),
            minlength=len(dict_vals) + 1).astype(np.int64)
        present = np.flatnonzero(sums)
        vals = [dict_vals[c].as_py() if c < len(dict_vals) else None
                for c in present]
        return pa.table({group_col: pa.array(vals,
                                             type=g[group_col].type),
                         "_n": pa.array(sums[present], type=pa.int64())})

    counted = ds.map_batches(fold, batch_format="pyarrow") \
        .groupby("_part").map_groups(
            lambda g: merge(g.drop_columns(["_part"])),
            batch_format="pyarrow")
    return [(r[group_col], int(r["_n"])) for r in counted.take_all()]


def grouped_quantile(ds, group_col: str, value_col: str, qs: list,
                     n_parts: int = 64,
                     hot_group_rows: int | None = None) -> "object":
    """EXACT per-group discrete quantiles (``quantile_disc`` semantics,
    NaN/null dropped). Returns a Dataset of (group, q, value).

    Scale shape: one shuffle of (group, value) PAIRS (columns pruned at the
    read), then one vectorized sort + run-slice per coarse hash partition
    of the group key — groups are co-located, never dispatched one by one.
    Complements ``quantile_exact``: that one scans-without-shuffling for
    GLOBAL quantiles; this one shuffles once for MANY groups (a scan per
    group would be O(groups) passes).

    Partitioning assumption: one group's rows fit in one partition task.
    ``hot_group_rows`` lifts that contract: a cheap combiner pre-count
    finds groups above the budget, and each hot group resolves through the
    scan-based ``quantile_exact`` machinery instead (bounded memory per
    task regardless of group size — a few extra scans for the handful of
    groups that are, by definition, huge). Normal groups still take the
    single shuffle."""
    import pyarrow.compute as pc
    qs = [float(q) for q in qs]

    if hot_group_rows is not None:
        # the hot path is multi-scan (pre-count + one quantile_exact per
        # hot group): stage the two needed columns ONCE so those scans
        # read pinned blocks instead of re-executing upstream each time
        ds = ds.select_columns([group_col, value_col]).materialize()
        counts = group_row_counts(ds, group_col)
        hot = [g for g, n in counts if n > hot_group_rows]
        if hot:
            gtype = ds.schema().base_schema.field(group_col).type
            hot_nonnull = pa.array([g for g in hot if g is not None],
                                   type=gtype)
            hot_has_null = any(g is None for g in hot)

            def drop_hot(b: pa.Table) -> pa.Table:
                keep = pc.invert(pc.fill_null(
                    pc.is_in(b[group_col], value_set=hot_nonnull), False))
                if hot_has_null:
                    keep = pc.and_(keep, pc.is_valid(b[group_col]))
                return b.filter(keep)

            cold = grouped_quantile(ds.map_batches(
                drop_hot, batch_format="pyarrow"), group_col, value_col,
                qs, n_parts=n_parts)
            tables = []
            for g in hot:
                mask = ((lambda b: pc.is_null(b[group_col])) if g is None
                        else (lambda b, _g=g: pc.fill_null(
                            pc.equal(b[group_col], pa.scalar(_g, type=gtype)),
                            False)))
                one = ds.map_batches(
                    lambda b, _m=mask: b.filter(_m(b)),
                    batch_format="pyarrow")
                qt = quantile_exact(one, value_col, qs, stage=False)
                if len(qt) and qt["value"].null_count == len(qt):
                    continue  # all-NaN group: cold path emits nothing
                tables.append(pa.table({
                    group_col: pa.array([g] * len(qt), type=gtype),
                    "q": qt["q"], "value": qt["value"]}))
            if not tables:  # every hot group was all-NaN
                return cold
            import ray.data as _rd
            return cold.union(_rd.from_arrow(pa.concat_tables(tables)))
        # no hot groups: fall through to the plain single-shuffle path

    def per_part(g: pa.Table) -> pa.Table:
        gtype = g[group_col].type
        # integer group codes sort safely for ANY key type, and NULL keys
        # get a sentinel code (SQL GROUP BY keeps NULL as its own group —
        # raw numpy lexsort on object arrays with None crashes,
        # verify-probe-found)
        codes, dict_vals = _group_codes(g[group_col])
        v = g[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~np.isnan(v)
        codes, v = codes[ok], v[ok]
        if codes.size == 0:
            return pa.table({group_col: pa.array([], type=gtype),
                             "q": pa.array([], type=pa.float64()),
                             "value": pa.array([], type=pa.float64())})
        order = np.lexsort((v, codes))
        gs, vs = codes[order], v[order]
        bounds = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1], True])
        out_g, out_q, out_v = [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            n = e - s
            code = int(gs[s])
            gval = dict_vals[code].as_py() if code < len(dict_vals) else None
            for q in qs:
                k = max(0, math.ceil(q * n) - 1)
                out_g.append(gval)
                out_q.append(q)
                out_v.append(vs[s + k])
        return pa.table({group_col: pa.array(out_g, type=gtype),
                         "q": pa.array(out_q, type=pa.float64()),
                         "value": pa.array(out_v, type=pa.float64())})

    def add_part(b: pa.Table) -> pa.Table:
        # dedup's _coarse_groupby assumes integer keys; group columns here
        # may be strings or carry nulls
        return b.append_column(
            "_part", pa.array(_hash_part_of(b[group_col], n_parts)))

    def run(g: pa.Table) -> pa.Table:
        if "_part" in g.column_names:
            g = g.drop_columns(["_part"])
        return per_part(g)

    return ds.map_batches(add_part, batch_format="pyarrow") \
        .groupby("_part").map_groups(run, batch_format="pyarrow")


def distinct_per_group(ds, group_col: str, value_col: str,
                       n_parts: int = 64):
    """EXACT COUNT(DISTINCT value) per group. Returns a Dataset of
    (group, n_distinct int64).

    Scale shape: per-block dedup FIRST (np.unique over (group, value)
    pairs inside ``map_batches``) so the shuffle moves at most the distinct
    pair count per block, never raw rows; then one vectorized unique+run
    count per coarse hash partition of the group key. Complements the HLL
    sketch (``stages/sketch``): that one is O(2^p) memory and ±2% for ONE
    global cardinality; this one is exact and per-group, at the cost of
    shuffling the distinct pairs once. Null group keys form their own
    group (SQL semantics); null values are not counted (SQL COUNT
    ignores NULL)."""

    def local_dedup(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = pa.table({group_col: b[group_col], value_col: b[value_col]})
        t = t.filter(pc.is_valid(t[value_col]))
        if t.num_rows == 0:
            return t.append_column("_part", pa.array([], type=pa.int64()))
        codes, _ = _group_codes(t[group_col])
        vcodes, _ = _group_codes(t[value_col])
        pair = codes * (vcodes.max() + 1) + vcodes
        _, first = np.unique(pair, return_index=True)
        t = t.take(pa.array(np.sort(first)))
        return t.append_column(
            "_part", pa.array(_hash_part_of(t[group_col], n_parts)))

    def per_part(g: pa.Table) -> pa.Table:
        gtype = g[group_col].type
        if "_part" in g.column_names:
            g = g.drop_columns(["_part"])
        if g.num_rows == 0:
            return pa.table({group_col: pa.array([], type=gtype),
                             "n_distinct": pa.array([], type=pa.int64())})
        codes, dict_vals = _group_codes(g[group_col])
        vcodes, _ = _group_codes(g[value_col])
        pair = codes * (np.int64(vcodes.max()) + 1) + vcodes
        upair = np.unique(pair)
        ug = upair // (np.int64(vcodes.max()) + 1)
        grp_ids, counts = np.unique(ug, return_counts=True)
        out_g = [dict_vals[int(c)].as_py() if c < len(dict_vals) else None
                 for c in grp_ids]
        return pa.table({group_col: pa.array(out_g, type=gtype),
                         "n_distinct": pa.array(counts.astype(np.int64))})

    return ds.map_batches(local_dedup, batch_format="pyarrow") \
        .groupby("_part").map_groups(per_part, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Top-k per group
# ---------------------------------------------------------------------------

def _take_topk_runs(t: pa.Table, group_col, order_col, id_col, k) -> pa.Table:
    """Vectorized top-k per group inside one table: lexsort by
    (group asc, order desc, id asc), slice ≤ k per group run. NaN order
    values are dropped (callers mirror this in SQL). Groups sort by
    dictionary CODE, never by raw value — safe for string keys and for
    NULL keys (their own group, SQL GROUP BY semantics)."""
    g, _ = _group_codes(t[group_col])
    v = t[order_col].to_numpy(zero_copy_only=False).astype(np.float64)
    i = t[id_col].to_numpy(zero_copy_only=False)
    ok = ~np.isnan(v)
    if not ok.all():
        t = t.filter(pa.array(ok))
        g, v, i = g[ok], v[ok], i[ok]
    if t.num_rows == 0:
        return t
    order = np.lexsort((i, -v, g))
    gs = g[order]
    bounds = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1], True])
    keep = np.concatenate([order[s:min(s + k, e)]
                           for s, e in zip(bounds[:-1], bounds[1:])])
    return t.take(pa.array(np.sort(keep)))


def topk_per_group(ds, group_col: str, order_col: str, k: int,
                   id_col: str, n_parts: int = 64):
    """Exact top-k rows per group by ``order_col`` DESC (ties broken by
    ``id_col`` ASC — fully deterministic, SQL ``row_number`` reproducible).
    Group keys may be int or string, with or without nulls.

    Combiner shape: block-local prune to ≤ k rows/group/block first, so the
    groupby shuffle moves at most k·groups·blocks rows — never the full
    table; then exact re-selection inside coarse hash partitions of the
    group key (one vectorized ``map_groups`` per partition)."""

    def local(b: pa.Table) -> pa.Table:
        pruned = _take_topk_runs(b, group_col, order_col, id_col, k)
        return pruned.append_column(
            "_part", pa.array(_hash_part_of(pruned[group_col], n_parts)))

    def per_part(g: pa.Table) -> pa.Table:
        if "_part" in g.column_names:
            g = g.drop_columns(["_part"])
        return _take_topk_runs(g, group_col, order_col, id_col, k)

    return ds.map_batches(local, batch_format="pyarrow") \
        .groupby("_part").map_groups(per_part, batch_format="pyarrow")


def sample_per_group(ds, group_col: str, id_col: str, k: int,
                     n_parts: int = 64):
    """Deterministic k-row uniform sample PER GROUP: each group keeps its
    k rows with the smallest hashed id (ties by id) — stratified
    ``sample_bottom_k``. Composes the hash order with the
    ``topk_per_group`` combiner (block-local prune to ≤ k rows/group/block
    before the shuffle), so it inherits the same scale shape: the shuffle
    moves ≤ k·groups·blocks rows, never the table. SQL-reproducible via
    ``QUALIFY row_number() OVER (PARTITION BY group ORDER BY
    <sample_bottom_k_sql_order(id)>) <= k``."""

    def add_h(b: pa.Table) -> pa.Table:
        v = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # topk_per_group orders DESC; negate so largest ≡ smallest hash
        return b.append_column("_negh", pa.array(-_hash_mod(v)))

    out = topk_per_group(ds.map_batches(add_h, batch_format="pyarrow"),
                         group_col, "_negh", k, id_col, n_parts=n_parts)
    return out.map_batches(lambda b: b.drop_columns(["_negh"]),
                           batch_format="pyarrow")


def winsorize(ds, column: str, lo_q: float = 0.05, hi_q: float = 0.95,
              out_col: str | None = None):
    """Percentile clipping (winsorization) — the standard outlier
    treatment before training: values clamp to the EXACT
    [quantile_disc(lo_q), quantile_disc(hi_q)] bounds from
    :func:`quantile_exact`, broadcast as two scalars into a streaming
    clip pass. Two passes total (bounds + clip); the bounds pass stages
    only the one needed column. NaN passes through (SQL ``GREATEST`` /
    ``LEAST`` NaN semantics differ — both sides guard explicitly); null
    stays null."""
    import pyarrow.compute as pc

    qt = quantile_exact(ds, column, [lo_q, hi_q])
    lo, hi = qt["value"].to_pylist()
    name = out_col or f"{column}_w"

    def clip(b: pa.Table) -> pa.Table:
        valid = pc.is_valid(b[column]).to_numpy(zero_copy_only=False)
        v = b[column].to_numpy(zero_copy_only=False).astype(np.float64)
        c = np.where(np.isnan(v), v, np.clip(v, lo, hi))
        return b.append_column(
            name, pa.array(c, type=pa.float64(), mask=~valid))

    return ds.map_batches(clip, batch_format="pyarrow")


def quality_weighted_sample(ds, text_col: str = "text"):
    """Quality-proportional curation sampling: keep each document with
    probability ≈ its quality score (``text.quality_score``; scores ≥ 1
    always kept), decided by the SAME deterministic id hash as
    ``sample_hash`` — keep iff ``hash_bp(doc_id) < floor(quality ·
    10000)``. Composes two already-oracle-checked pieces, so the whole
    op is SQL-reproducible, RNG-free, and stable under retries/resumes
    (the property that matters when a 100 TB curation job restarts)."""
    from .text import quality_score

    def keep(b: pa.Table) -> pa.Table:
        q = quality_score(b, text_col=text_col)
        v = q["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = np.floor(q["quality"].to_numpy(zero_copy_only=False)
                     * float(SAMPLE_SPACE)).astype(np.int64)
        return q.filter(pa.array(_hash_bp(v) < p))

    return ds.map_batches(keep, batch_format="pyarrow")


def target_selection_int(ds, dim: int = 64, target_rate_bp: int = 1_000,
                         text_col: str = "text", id_col: str = "doc_id",
                         hash_fn: str = "md5"):
    """Data selection toward a TARGET distribution (the DSIR shape —
    Xie et al. 2023, arXiv:2302.03169 — hashed bag-of-words importance
    scoring; this variant scores with exact integer COUNT-RATIO
    differences instead of float log-likelihood ratios + Gumbel
    resampling, so the whole op is RNG-free and a SQL twin reproduces
    the selected set bit-for-bit). PRECONDITION: ``id_col`` values are
    UNIQUE (true for doc_id). The engine scores each ROW independently
    while the SQL twin's string_agg groups rows per id and its target
    join multiplies duplicated target ids into ``n_t`` — duplicate ids
    would silently diverge from the oracle (review-found):

    1. a deterministic hash sample of documents (``sample_hash``
       semantics, ``target_rate_bp``/10000) stands in for the target
       domain;
    2. hashed unigram multinomial counts (``text.feature_hash_counts``
       with ``signed=False`` — +1 per occurrence) model both the target
       and the raw corpus: ONE streaming pass emits per-block
       (target_sums | raw_sums) partials, folded into two dim-vectors
       ``n_t``/``n_r`` on the driver (O(dim) bytes per block);
    3. each feature's weight is the cross-multiplied ratio difference
       ``Δ_f = n_t[f]·D_r − n_r[f]·D_t`` (D = Σ_f n) — positive exactly
       when the target uses feature f more than the raw average;
    4. a second map-only pass keeps documents with
       ``score(x) = Σ_f c_f(x)·Δ_f > 0`` — "looks more like the target
       than the average document" — and returns (id, score).

    Scale shape: two streaming passes over text, a broadcast dim-vector,
    zero shuffles. Every quantity is an integer count, so block order /
    partitioning cannot change the kept set (an int64 bound is asserted
    per block — at corpus sizes where Σc·max|Δ| approaches 2⁶³, shard
    the corpus or shrink ``dim``).
    """
    import ray

    from ..vecs import list_column_to_matrix
    from .text import feature_hash_counts

    def partials(b: pa.Table) -> pa.Table:
        t = feature_hash_counts(b, dim=dim, text_col=text_col,
                                hash_fn=hash_fn, signed=False,
                                id_col=id_col)
        c = list_column_to_matrix(t["counts"], dtype=np.int64)
        v = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        is_t = _hash_bp(v) < target_rate_bp
        nt = c[is_t].sum(axis=0, dtype=np.int64)
        nr = c.sum(axis=0, dtype=np.int64)
        return pa.table({"which": pa.array([0, 1], type=pa.int64()),
                         "sums": pa.array([nt, nr],
                                          type=pa.list_(pa.int64()))})

    n_t = np.zeros(dim, dtype=np.int64)
    n_r = np.zeros(dim, dtype=np.int64)
    for batch in ds.map_batches(partials, batch_format="pyarrow") \
                   .iter_batches(batch_size=None, batch_format="pyarrow"):
        which = batch["which"].to_numpy(zero_copy_only=False)
        sm = batch["sums"].combine_chunks().flatten() \
            .to_numpy(zero_copy_only=False).reshape(len(which), dim)
        n_t += sm[which == 0].sum(axis=0, dtype=np.int64)
        n_r += sm[which == 1].sum(axis=0, dtype=np.int64)
    d_t, d_r = int(n_t.sum()), int(n_r.sum())
    # exact in Python ints first; assert the int64 envelope before cast
    delta_py = [int(t) * d_r - int(r) * d_t for t, r in zip(n_t, n_r)]
    max_abs = max((abs(x) for x in delta_py), default=0)
    if max_abs >= 1 << 62:
        raise ValueError(
            f"target_selection_int: |delta| up to {max_abs} leaves no "
            f"int64 headroom for the score dot — shard the corpus or "
            f"reduce dim")
    delta = np.array(delta_py, dtype=np.int64)
    ref = ray.put(delta)

    def score(b: pa.Table) -> pa.Table:
        w = ray.get(ref)
        t = feature_hash_counts(b, dim=dim, text_col=text_col,
                                hash_fn=hash_fn, signed=False,
                                id_col=id_col)
        c = list_column_to_matrix(t["counts"], dtype=np.int64)
        if len(c):
            # score bound: Σ_f c_f · max|Δ| — must stay inside int64
            tot = int(c.sum(axis=1).max())
            if tot * int(np.abs(w).max() or 0) >= 1 << 63:
                raise ValueError(
                    "target_selection_int: per-document score would "
                    "overflow int64 — shard the corpus or reduce dim")
        s = c @ w
        keep = s > 0
        return pa.table({id_col: b[id_col].filter(pa.array(keep)),
                         "score": pa.array(s[keep])})

    return ds.map_batches(score, batch_format="pyarrow")
