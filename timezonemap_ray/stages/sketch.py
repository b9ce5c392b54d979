"""Distributed sketches — approximate distinct counting (HyperLogLog) and
EXACT heavy hitters via a Misra-Gries candidate pass.

SURVEY §2 notes the reference has no approximate operators; the 100 TB
engine needs them. HLL here is the canonical mergeable-sketch shape: each
Arrow block folds into a tiny register array inside ``map_batches``, block
sketches merge by elementwise max — an all-reduce of ``2^p`` bytes instead
of a distinct shuffle of the full key column.

``heavy_hitter_terms`` is the two-pass exact-at-scale pattern: a mergeable
Misra-Gries summary per block (k counters, error ≤ n_block/(k+1); merged
error ≤ N/(k+1) — Agarwal et al., "Mergeable Summaries", PODS'12) yields a
small candidate SUPERSET of every term with frequency ≥ φN; a second
streaming pass counts only the broadcast candidates exactly. Unlike a raw
sketch the output is bit-exact (SQL-oracle-checkable): the sketch only
bounds what the exact pass must count — the full vocabulary never
shuffles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _hash64(values: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix of an int64/any column (splitmix64)."""
    x = values.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += np.uint64(0x9E3779B97F4A7C15)
        z = x
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


def hll_register_block(values, p: int = 12) -> np.ndarray:
    """One block's HLL registers (uint8 array of size 2^p)."""
    m = 1 << p
    h = _hash64(np.asarray(values))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)
    # rank = leading zeros of the remaining 64-p bits, +1
    lz = np.full(h.size, 64 - p, dtype=np.uint8)
    found = np.zeros(h.size, dtype=bool)
    for bit in range(64 - p):
        is_set = ~found & ((rest >> np.uint64(63 - bit)) & np.uint64(1)).astype(bool)
        lz[is_set] = bit
        found |= is_set
    rank = (lz + 1).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with small-range correction."""
    m = regs.size
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def hll_merged_registers(ds, column: str, p: int = 12) -> np.ndarray:
    """Distributed HLL register fold: per-block registers stream back as
    2^p-byte rows and merge on the driver by elementwise max (the
    driver fold is O(2^p), data-size-independent)."""
    def fold(b: pa.Table) -> pa.Table:
        v = b[column].to_numpy(zero_copy_only=False)
        if v.dtype == object:
            from .text import hash_u64
            v = np.array([hash_u64(str(x)) for x in v], dtype=np.uint64)
        regs = hll_register_block(v, p=p)
        return pa.table({"regs": pa.array([regs.tobytes()], type=pa.binary())})

    merged = np.zeros(1 << p, dtype=np.uint8)
    for batch in ds.map_batches(fold, batch_format="pyarrow") \
                   .iter_batches(batch_size=None, batch_format="pyarrow"):
        for blob in batch["regs"]:
            merged = np.maximum(merged,
                                np.frombuffer(blob.as_py(), dtype=np.uint8))
    return merged


def approx_distinct(ds, column: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT column) over a Dataset."""
    return hll_estimate(hll_merged_registers(ds, column, p=p))


def hll_estimate_exact(regs: np.ndarray) -> tuple[float, int]:
    """HLL estimator with ORDER-INDEPENDENT arithmetic so a SQL twin can
    reproduce the exact float64 bits: the harmonic sum runs in arbitrary-
    precision integers (each 2^-reg term scaled by 2^63 is an exact int;
    the sum never rounds), then ONE int→float conversion and a fixed
    parenthesization of the remaining float ops. Returns (estimate,
    zero_register_count). Same formula as :func:`hll_estimate` — the two
    agree to float noise; this one is bit-reproducible."""
    import math
    m = regs.size
    counts = np.bincount(regs.astype(np.int64), minlength=64)
    zeros = int(counts[0])
    s_tot = sum(int(c) << (63 - r) for r, c in enumerate(counts.tolist()) if c)
    mf = float(m)
    raw = (((0.7213 / (1.0 + 1.079 / mf)) * mf) * mf) \
        * (9223372036854775808.0 / float(s_tot))
    if raw <= 2.5 * mf and zeros:
        return mf * math.log(mf / zeros), zeros
    return raw, zeros


def hll_estimate_sql(table: str = "events", key: str = "user_id",
                     p: int = 12, out_col: str = "approx_n") -> str:
    """Full SQL TWIN of :func:`hll_estimate_exact` over the verified
    register fold: the harmonic sum accumulates 2^(63-reg) terms in
    HUGEINT (exact — order-independent), and the float tail uses the
    identical parenthesization, so DuckDB reproduces the estimate
    bit-for-bit including the small-range ln branch."""
    m = 1 << p
    mf = f"{float(m):.1f}"
    return f"""WITH regs AS ({hll_registers_sql(table, key, p=p)}),
agg AS (SELECT count(*) AS nz,
               sum(CAST(1 AS HUGEINT) << CAST(63 - reg AS INTEGER)) AS s_nz
        FROM regs),
st AS (SELECT ({m} - nz) AS zeros,
              CAST(s_nz AS HUGEINT)
              + ({m} - nz) * CAST('9223372036854775808' AS HUGEINT) AS s_tot
       FROM agg),
est AS (SELECT zeros,
               (((0.7213 / (1.0 + 1.079 / {mf})) * {mf}) * {mf})
                * (9223372036854775808.0 / CAST(s_tot AS DOUBLE)) AS raw
        FROM st)
SELECT CASE WHEN raw <= 2.5 * {mf} AND zeros > 0
            THEN {mf} * ln({mf} / zeros) ELSE raw END AS {out_col},
       CAST(zeros AS BIGINT) AS zero_registers
FROM est"""


def hll_registers_sql(table: str = "events", key: str = "user_id",
                      p: int = 12) -> str:
    """Full SQL TWIN of the HLL register fold: DuckDB computes the same
    splitmix64(key + golden) hash in HUGEINT arithmetic, the same bucket
    (top p bits) and rank (leading zeros of the shifted remainder + 1,
    via an exact integer CASE chain — no float log2), then max per
    bucket. Verifies the DISTRIBUTED part of the sketch bit-for-bit; the
    driver-local float estimator stays pytest-bound."""
    golden = 0x9E3779B97F4A7C15
    chain = _smix_sql_chain("sv.v")
    # exact integer leading-zero count of the (64-p)-bit remainder
    branches = "\n             ".join(
        f"WHEN rest >= CAST('{1 << (63 - b)}' AS HUGEINT) THEN {b}"
        for b in range(64 - p))
    return f"""WITH ev AS (SELECT {key} FROM {table} WHERE {key} IS NOT NULL),
hashed AS (
  SELECT se.h
  FROM ev e,
       LATERAL (SELECT (CAST(e.{key} AS HUGEINT)
                        + CAST('{golden}' AS HUGEINT))
                       % CAST('{1 << 64}' AS HUGEINT) AS v) sv{chain}),
ranked AS (
  SELECT CAST(h >> {64 - p} AS BIGINT) AS idx,
         (CASE {branches}
             ELSE {64 - p} END) + 1 AS rank
  FROM (SELECT h, (h * {1 << p}) % CAST('{1 << 64}' AS HUGEINT) AS rest
        FROM hashed))
SELECT idx, CAST(max(rank) AS BIGINT) AS reg
FROM ranked GROUP BY idx"""


def _mg_prune(terms: pa.Array, counts: np.ndarray, k: int):
    """Misra-Gries summary from exact block counts: decrement every
    counter by the (k+1)-th largest count so ≤ k stay positive. The kept
    value understates the true block count by at most n_block/(k+1)."""
    if len(counts) <= k:
        return terms, counts
    t = np.partition(counts, len(counts) - (k + 1))[len(counts) - (k + 1)]
    keep = counts > t
    return terms.filter(pa.array(keep)), counts[keep] - t


def _heavy_hitters_core(ds, extract, key_name: str, key_type,
                        phi: float, k: int | None) -> pa.Table:
    """Shared two-pass exact heavy-hitter engine. ``extract(block)`` →
    flat null-free pa.Array of occurrences; see ``heavy_hitter_terms`` /
    ``heavy_hitter_keys`` for the semantics and the scale argument."""
    import math

    import pyarrow.compute as pc

    import ray

    if not (0 < phi <= 1):
        raise ValueError("phi must be in (0, 1]")
    if k is None:
        k = max(64, int(math.ceil(2.0 / phi)))
    # The absent-key argument below needs N/(k+1) < ⌈φN⌉, i.e. k ≥ ⌈1/φ⌉:
    # a smaller caller-supplied k would let a true heavy hitter be pruned
    # from every summary and silently dropped (review-found). Clamping up
    # only widens the candidate superset — the exact pass is unchanged.
    k = max(k, int(math.ceil(1.0 / phi)))

    def _res(keys, ns):
        return pa.table({key_name: keys, "n": ns})

    _empty_out = _res(pa.array([], type=key_type),
                      pa.array([], type=pa.int64()))

    def mg_partial(b: pa.Table) -> pa.Table:
        flat = extract(b)
        if len(flat) == 0:
            return pa.table({key_name: pa.array([], type=key_type),
                             "c": pa.array([], type=pa.int64()),
                             "block_n": pa.array([], type=pa.int64())})
        enc = flat.dictionary_encode()
        counts = np.bincount(enc.indices.to_numpy(zero_copy_only=False),
                             minlength=len(enc.dictionary)).astype(np.int64)
        keys, kept = _mg_prune(enc.dictionary, counts, k)
        if len(kept) == 0:
            # prune can empty a uniform block (all counts == t); keep one
            # zero-credit counter so the block token count still reaches
            # the driver — a c=0 row only widens the candidate superset
            keys, kept = enc.dictionary[:1], np.zeros(1, dtype=np.int64)
        bn = np.zeros(len(kept), dtype=np.int64)
        bn[0] = len(flat)  # block occurrence count rides on the first row
        return pa.table({key_name: keys, "c": pa.array(kept),
                         "block_n": pa.array(bn)})

    # STREAMING Misra-Gries merge on the driver: fold each block summary
    # into an O(k) accumulator (merge = counter add, then subtract the
    # (k+1)-th largest and drop non-positives — Agarwal et al.,
    # "Mergeable Summaries": the merged error stays ≤ N/(k+1)). Driver
    # memory is O(k) independent of block count; a concat-everything
    # merge would hold k·n_blocks rows (billions at 100 TB).
    acc: dict = {}
    total_n = 0
    for t in ds.map_batches(mg_partial, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        total_n += int(pc.sum(t["block_n"]).as_py() or 0)
        cs = t["c"].to_numpy(zero_copy_only=False)
        for key, c in zip(t[key_name].to_pylist(), cs):
            acc[key] = acc.get(key, 0) + int(c)
        if len(acc) > k:
            vals = np.fromiter(acc.values(), dtype=np.int64,
                               count=len(acc))
            t_sub = int(np.partition(
                vals, len(vals) - (k + 1))[len(vals) - (k + 1)])
            acc = {ky: v - t_sub for ky, v in acc.items() if v > t_sub}
    if total_n == 0:
        return _empty_out
    thresh = int(math.ceil(phi * total_n))
    # merged lower bound per key; total undercount ≤ N/(k+1). A key
    # ABSENT from acc has true count ≤ N/(k+1) < ⌈φN⌉ (k ≥ 2/φ), so the
    # candidate superset needs only the retained counters.
    slack = total_n // (k + 1)
    cand_keys = [ky for ky, v in acc.items() if v + slack >= thresh]
    if not cand_keys:
        return _empty_out
    cand = pa.array(cand_keys, type=key_type)
    cand_ref = ray.put(cand)

    def exact_partial(b: pa.Table) -> pa.Table:
        cv = ray.get(cand_ref)
        flat = extract(b)
        if len(flat) == 0:
            return _empty_out
        pos = pc.index_in(flat, value_set=cv)
        good = pc.is_valid(pos)
        hits = pos.filter(good).to_numpy(zero_copy_only=False)
        counts = np.bincount(hits, minlength=len(cv)).astype(np.int64)
        nz = counts > 0
        return _res(cv.filter(pa.array(nz)), pa.array(counts[nz]))

    ex = pa.concat_tables(
        [t for t in ds.map_batches(exact_partial, batch_format="pyarrow")
         .iter_batches(batch_size=None, batch_format="pyarrow")]
        + [_empty_out]).combine_chunks()
    tot = ex.group_by(key_name).aggregate([("n", "sum")])
    tot = tot.filter(pc.greater_equal(tot["n_sum"], thresh))
    out = pa.table({key_name: tot[key_name],
                    "n": pc.cast(tot["n_sum"], pa.int64())})
    idx = pc.sort_indices(out, sort_keys=[("n", "descending"),
                                          (key_name, "ascending")])
    return out.take(idx)


def heavy_hitter_terms(ds, phi: float = 0.001, text_col: str = "text",
                       k: int | None = None) -> pa.Table:
    """EXACT terms with frequency ≥ ⌈φ·N⌉ (N = total tokens) →
    (term: string, n: int64), ordered (n DESC, term ASC).

    Pass 1 streams block-local Misra-Gries summaries (k counters each) to
    the driver — k·n_blocks rows, never the vocabulary. Merged lower
    bounds + the global undercount ceiling N/(k+1) prune candidates that
    cannot reach the threshold. Pass 2 broadcasts the surviving candidate
    list and counts ONLY those terms exactly (per-block ``pc.index_in`` +
    bincount partials, tiny groupby-free driver reduce)."""
    from .terms import _flat_tokens

    def extract(b: pa.Table):
        flat, _ = _flat_tokens(b, text_col)
        return flat

    return _heavy_hitters_core(ds, extract, "term", pa.string(), phi, k)


def heavy_hitter_keys(ds, column: str, phi: float = 0.001,
                      k: int | None = None) -> pa.Table:
    """EXACT hot keys in ``column`` (count ≥ ⌈φ·N⌉ over non-null rows) →
    (<column>, n: int64), ordered (n DESC, key ASC). Null keys are
    dropped. Same two-pass Misra-Gries candidate machinery as
    ``heavy_hitter_terms`` — use it to find skewed join/groupby keys
    (hot users, hot cells) without shuffling the key column."""
    sch = ds.schema()
    key_type = sch.types[sch.names.index(column)]

    def extract(b: pa.Table):
        return b[column].combine_chunks().drop_null()

    return _heavy_hitters_core(ds, extract, column, key_type, phi, k)


# ---------------------------------------------------------------------------
# Mergeable approximate-quantile sketch (one-pass scale path)
# ---------------------------------------------------------------------------

def _qcompact(vals: np.ndarray, wts: np.ndarray, k: int):
    """Equi-weight compaction of a SORTED weighted summary down to ≤ k
    points: bucket boundaries at cumulative weight j·W/k, representative =
    the point covering each boundary, weight = bucket mass. Deterministic;
    one compaction adds ≤ W/k rank error. Total mass is preserved
    exactly (the last bucket always ends at W)."""
    if len(vals) <= k:
        return vals, wts
    cum = np.cumsum(wts)
    w_total = cum[-1]
    edges = np.arange(1, k + 1) * (w_total / k)
    idx = np.unique(np.clip(np.searchsorted(cum, edges), 0, len(vals) - 1))
    return vals[idx], np.diff(np.r_[0.0, cum[idx]])


def quantile_sketch(ds, column: str, qs, k: int = 2048, n_parts: int = 32):
    """One-pass mergeable approximate quantiles → pa.Table (q, value).

    The scale path next to the EXACT multi-scan quantiles
    (``select.quantile_exact``): a 100 TB column is sketched in a single
    streaming pass. Three levels, each deterministic:

      1. per block: sort + equi-weight compact to ≤ k weighted points
         (only k rows per block leave the map stage);
      2. coarse partitions: summary rows hash-scatter over ``n_parts``
         groups, each group merge-compacts to ≤ k points (the only
         shuffle, ≤ k rows/block in, ≤ k·n_parts rows total out);
      3. driver: merge the ≤ n_parts·k points and read quantiles off the
         cumulative weight — O(k·n_parts) memory, independent of data
         size.

    Rank error ≤ ~3·N/k (one compaction per level); k=2048 → ~0.15 %.
    NaN/null values are dropped (SQL aggregate semantics)."""
    import pyarrow.compute as pc

    def _clean(col) -> np.ndarray:
        keep = pc.is_valid(col)
        if pa.types.is_floating(col.type):
            keep = pc.and_kleene(keep, pc.invert(pc.is_nan(col)))
        v = col.filter(pc.fill_null(keep, False))
        return v.to_numpy(zero_copy_only=False).astype(np.float64)

    def partial(b: pa.Table) -> pa.Table:
        v = np.sort(_clean(b[column]))
        vals, wts = _qcompact(v, np.ones(len(v)), k)
        return pa.table({
            "value": pa.array(vals, type=pa.float64()),
            "weight": pa.array(wts, type=pa.float64()),
            "_part": pa.array((np.arange(len(vals)) * np.int64(2654435761))
                              % n_parts),
        })

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"value": pa.array([], type=pa.float64()),
                             "weight": pa.array([], type=pa.float64())})
        v = g["value"].to_numpy(zero_copy_only=False)
        w = g["weight"].to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        vals, wts = _qcompact(v[order], w[order], k)
        return pa.table({"value": pa.array(vals, type=pa.float64()),
                         "weight": pa.array(wts, type=pa.float64())})

    lvl2 = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("_part").map_groups(per_part, batch_format="pyarrow")
    parts = [t for t in lvl2.iter_batches(batch_size=None, batch_format="pyarrow")]
    merged = pa.concat_tables(parts) if parts else pa.table(
        {"value": pa.array([], type=pa.float64()),
         "weight": pa.array([], type=pa.float64())})
    qs = list(qs)
    if merged.num_rows == 0:
        return pa.table({"q": pa.array(qs, type=pa.float64()),
                         "value": pa.array([None] * len(qs),
                                           type=pa.float64())})
    v = merged["value"].to_numpy(zero_copy_only=False)
    w = merged["weight"].to_numpy(zero_copy_only=False)
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    cum = np.cumsum(w)
    ranks = np.asarray(qs, dtype=np.float64) * cum[-1]
    idx = np.clip(np.searchsorted(cum, ranks), 0, len(v) - 1)
    return pa.table({"q": pa.array(qs, type=pa.float64()),
                     "value": pa.array(v[idx], type=pa.float64())})


# ---------------------------------------------------------------------------
# Count-min sketch (mergeable approximate per-key counts)
# ---------------------------------------------------------------------------

_CMS_SEEDS = np.array([0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9,
                       0x94D049BB133111EB, 0xD6E8FEB86659FD93],
                      dtype=np.uint64)


def _cms_cols(keys: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(depth, n) bucket columns for int64 keys — one splitmix per row
    seed, vectorized. PRECONDITION keys >= 0 (loud, review-found): a
    negative key wraps through uint64 here while the DuckDB twin XORs a
    negative HUGEINT in 128-bit two's complement — the hashes silently
    diverge, so the oracle would compare the wrong cells. Pre-fold
    signed key spaces to non-negative (e.g. ``id & (2^63-1)``) on BOTH
    sides before sketching."""
    if len(keys) and keys.min() < 0:
        raise ValueError(
            "count-min sketch keys must be non-negative — the SQL twin's "
            "HUGEINT xor diverges from the engine's uint64 wrap for "
            "negative keys; pre-fold the key space on both sides")
    from .text import _splitmix64
    k = keys.astype(np.uint64)
    return np.stack([
        (_splitmix64(k ^ _CMS_SEEDS[d]) % np.uint64(width)).astype(np.int64)
        for d in range(depth)])


_SMIX_C1 = 0xBF58476D1CE4E5B9
_SMIX_C2 = 0x94D049BB133111EB
_M32 = 1 << 32
_M64 = 1 << 64


def _smix_sql_chain(v_expr: str) -> str:
    """LATERAL chain computing splitmix64(``v_expr``) in DuckDB HUGEINT
    arithmetic — the EXACT hash ``text._splitmix64`` computes: the 64×64
    wrapping multiplies split as (hi·b mod 2³²)·2³² + lo·b (all
    intermediates < 2⁹⁶ < HUGEINT max). Yields a relation alias ``se``
    with column ``h``."""
    def mul64(x, c):
        return (f"(((({x} >> 32) * CAST('{c}' AS HUGEINT)) % {_M32}) "
                f"* {_M32} + ({x} % {_M32}) * CAST('{c}' AS HUGEINT)) "
                f"% CAST('{_M64}' AS HUGEINT)")

    return f""",
       LATERAL (SELECT xor({v_expr}, {v_expr} >> 30) AS x0) sa,
       LATERAL (SELECT {mul64('sa.x0', _SMIX_C1)} AS x1) sb,
       LATERAL (SELECT xor(sb.x1, sb.x1 >> 27) AS x2) sc,
       LATERAL (SELECT {mul64('sc.x2', _SMIX_C2)} AS x3) sd,
       LATERAL (SELECT xor(sd.x3, sd.x3 >> 31) AS h) se"""


def cms_user_counts_sql(table: str = "events", key: str = "user_id",
                        depth: int = 4, width: int = 4096,
                        topn: int = 20) -> str:
    """Full SQL TWIN of the count-min sketch query: DuckDB rebuilds the
    identical sketch — same splitmix64 row hashes (seeds inlined), same
    cell counts, same min-over-rows estimate — so ``cms_user_counts``
    (exact top-N true counts + their CMS estimates) is oracle-checked
    bit-for-bit rather than rows-only. The sketch stops being
    'approximate-hence-uncheckable': the ESTIMATOR itself is the
    deterministic function being verified."""
    seed_rows = ", ".join(
        f"({d}, CAST('{int(_CMS_SEEDS[d])}' AS HUGEINT))"
        for d in range(depth))
    chain_ev = _smix_sql_chain("sv.v")
    return f"""WITH seeds(d, seed) AS (VALUES {seed_rows}),
ev AS (SELECT {key} FROM {table} WHERE {key} IS NOT NULL),
hashed AS (
  SELECT s.d, se.h
  FROM ev e CROSS JOIN seeds s,
       LATERAL (SELECT xor(CAST(e.{key} AS HUGEINT), s.seed) AS v) sv{chain_ev}),
cells AS (SELECT d, h % {width} AS cell, count(*) AS n
          FROM hashed GROUP BY 1, 2),
top AS (SELECT {key}, count(*)::BIGINT AS n_true FROM ev GROUP BY {key}
        ORDER BY n_true DESC, {key} LIMIT {topn}),
th AS (
  SELECT s.d, t.{key}, t.n_true, se.h
  FROM top t CROSS JOIN seeds s,
       LATERAL (SELECT xor(CAST(t.{key} AS HUGEINT), s.seed) AS v) sv{chain_ev})
SELECT th.{key}, th.n_true, CAST(min(c.n) AS BIGINT) AS n_est
FROM th JOIN cells c ON c.d = th.d AND c.cell = th.h % {width}
GROUP BY th.{key}, th.n_true"""


def cms_build(ds, column: str, depth: int = 4, width: int = 4096):
    """Build a count-min sketch over an int key column → dense
    (depth, width) int64 matrix on the driver.

    Mergeable + distributed: each block emits SPARSE (row, col, n) cell
    partials (≤ depth × distinct-keys-per-block rows — raw keys never
    shuffle), a combiner groupby sums cells, and only the fixed-size
    dense matrix (depth·width ints) reaches the driver. Estimates are
    one-sided: est ≥ true, est ≤ true + εN w.h.p. (ε ≈ e/width)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        col = b[column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.drop_null()  # null keys: not countable, never phantom
        v = col.to_numpy(zero_copy_only=False).astype(np.int64)
        uk, cnt = np.unique(v, return_counts=True)
        cols = _cms_cols(uk, depth, width)            # (depth, u)
        rows = np.repeat(np.arange(depth, dtype=np.int64), len(uk))
        cell = rows * width + cols.reshape(-1)
        return pa.table({
            "cell": pa.array(cell),
            "n": pa.array(np.tile(cnt.astype(np.int64), depth))})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("cell").aggregate(Sum("n", alias_name="n"))
    cms = np.zeros(depth * width, dtype=np.int64)
    for r in agg.take_all():
        cms[int(r["cell"])] += int(r["n"])
    return cms.reshape(depth, width)


def cms_estimate(cms: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Point-query the sketch: est(key) = min over rows of the hashed
    cell — vectorized for a key array."""
    depth, width = cms.shape
    cols = _cms_cols(np.asarray(keys, dtype=np.int64), depth, width)
    ests = np.stack([cms[d, cols[d]] for d in range(depth)])
    return ests.min(axis=0)
