"""Join operators beyond the spatial join.

- ``broadcast_lookup``: fact ⋈ small-dim via a `ray.put` dict — the 100 TB
  pattern for dimension joins (no shuffle; one object transfer per node).
- ``broadcast_semi_join``: semi/anti filter-join against a broadcast key
  set (``pc.is_in`` per batch; no shuffle, no row widening).
- ``hash_join``: big ⋈ big via Ray Data's hash-shuffle ``Dataset.join``.
- ``asof_join``: per-key ordered as-of join (each left row matched to the
  latest right row with ``right_on <= left_on``) — a custom operator Ray
  Data lacks, composed from coarse key-hash co-partitioning + one
  vectorized searchsorted per partition.  The default plan assumes one
  key's history fits one partition; ``time_salt=S`` removes that
  assumption by additionally range-partitioning the timeline into S
  buckets and running a carry-in boundary pass (the last preceding right
  row per key crosses each bucket edge), so a single pathological hot
  key distributes over S tasks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray


def broadcast_lookup(ds, small_table: pa.Table, key: str, small_key: str,
                     value_cols: list, concurrency=None):
    """Append ``value_cols`` from a small dimension table, broadcast once via
    ``ray.put``. The per-batch probe is fully vectorized Arrow:
    ``pc.index_in`` (hash probe into the dim key set) + ``pc.take`` on each
    value column — no per-row Python, nulls where the key has no match.
    Duplicate dim keys resolve to the FIRST occurrence (dim keys are unique
    in every use here)."""
    # a null dim key would otherwise MATCH null fact keys (pc.index_in's
    # default null semantics), contradicting the nulls-where-no-match
    # contract above — drop it at build time (review-found; mirrors
    # broadcast_semi_join's keys.drop_null())
    small_table = small_table.filter(pc.is_valid(small_table[small_key]))
    payload = {
        "keys": small_table[small_key].combine_chunks(),
        "vals": {c: small_table[c].combine_chunks() for c in value_cols},
    }
    ref = ray.put(payload)

    def attach(b: pa.Table) -> pa.Table:
        p = ray.get(ref)  # node-local plasma read, zero-copy
        import pyarrow.compute as pc
        idx = pc.index_in(b[key], value_set=p["keys"])
        for c in value_cols:
            b = b.append_column(c, pc.take(p["vals"][c], idx))
        return b

    return ds.map_batches(attach, batch_format="pyarrow")


def broadcast_semi_join(ds, keys, key_col: str, anti: bool = False):
    """Semi join (keep rows whose ``key_col`` is in ``keys``) / anti join
    (``anti=True``: keep rows whose key is NOT in ``keys``) against a
    broadcast key set — the 100 TB filter-join pattern: the key side ships
    once per node via ``ray.put``, the fact side streams through one
    vectorized ``pc.is_in`` per batch. No shuffle, no row widening.

    ``keys`` may be a pyarrow Array/ChunkedArray, numpy array or list.
    Null fact keys are never IN the set → dropped by semi, kept by anti
    (matching SQL ``WHERE [NOT] EXISTS`` with a non-null key side)."""
    import pyarrow.compute as pc
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    elif not isinstance(keys, pa.Array):
        keys = pa.array(keys)
    # a null IN the key set would make is_in(null_key) TRUE and invert the
    # documented null semantics (review-found) — enforce the non-null
    # key-side contract here
    keys = keys.drop_null()
    ref = ray.put(keys)

    def keep(b: pa.Table) -> pa.Table:
        kset = ray.get(ref)  # node-local plasma read
        m = pc.is_in(b[key_col], value_set=kset)
        m = pc.fill_null(m, False)
        return b.filter(pc.invert(m) if anti else m)

    return ds.map_batches(keep, batch_format="pyarrow")


def _bloom_hashes(values, n_bits: int, n_hashes: int):
    """(n_hashes, n) bit positions via Kirsch–Mitzenmacher double hashing
    over pandas' vectorized deterministic array hash (C-speed for ints AND
    strings, stable across processes — not PYTHONHASHSEED-dependent)."""
    import pandas as pd
    v = np.asarray(values)
    h1 = pd.util.hash_array(v, categorize=False).astype(np.uint64)
    # one splitmix64 round decorrelates h2 from h1
    with np.errstate(over="ignore"):
        z = h1 + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h2 = (z ^ (z >> np.uint64(31))) | np.uint64(1)  # odd → full cycle
        return np.stack([(h1 + np.uint64(i) * h2) % np.uint64(n_bits)
                         for i in range(n_hashes)])


def build_bloom(keys_ds, keys_col: str, n_bits: int = 1 << 23,
                n_hashes: int = 4) -> np.ndarray:
    """Distributed bloom build: each block folds its keys into a local
    ``n_bits``-bit bitmap (uint64 words); block bitmaps stream back as
    ``n_bits/8``-byte blobs and OR-merge on the driver (constant driver
    memory — one bitmap). Size ``n_bits`` ≈ 10 bits/key for ~1% false
    positives at 4 hashes. Null keys are skipped (never semi-match)."""
    n_words = (n_bits + 63) // 64

    def fold(b: pa.Table) -> pa.Table:
        arr = b[keys_col].combine_chunks().drop_null()
        bits = np.zeros(n_words, dtype=np.uint64)
        if len(arr):
            pos = _bloom_hashes(arr.to_numpy(zero_copy_only=False),
                                n_bits, n_hashes).ravel()
            np.bitwise_or.at(bits, (pos >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (pos & np.uint64(63)))
        return pa.table({"bits": pa.array([bits.tobytes()],
                                          type=pa.large_binary())})

    merged = np.zeros(n_words, dtype=np.uint64)
    for batch in keys_ds.map_batches(fold, batch_format="pyarrow") \
                        .iter_batches(batch_size=None, batch_format="pyarrow"):
        for blob in batch["bits"]:
            merged |= np.frombuffer(blob.as_py(), dtype=np.uint64)
    return merged


def _distinct_keys(keys_ds, keys_col: str, out_col: str, n_parts: int = 64):
    """Exact distinct non-null keys as a Dataset: per-block unique combiner,
    then dedup inside coarse hash partitions (vectorized — never a
    per-tiny-group dispatch, and never ``groupby(raw_key)`` which breaks on
    null keys)."""
    from .select import _hash_part_of

    def fold(b: pa.Table) -> pa.Table:
        arr = b[keys_col].combine_chunks().unique().drop_null()
        t = pa.table({out_col: arr})
        return t.append_column(
            "_part", pa.array(_hash_part_of(t[out_col], n_parts)))

    def dedup(g: pa.Table) -> pa.Table:
        arr = g[out_col].combine_chunks().unique()
        return pa.table({out_col: arr})

    return keys_ds.map_batches(fold, batch_format="pyarrow") \
        .groupby("_part").map_groups(
            lambda g: dedup(g.drop_columns(["_part"])),
            batch_format="pyarrow")


def bloom_semi_join(fact, keys_ds, key_col: str, keys_col: str | None = None,
                    n_bits: int = 1 << 23, n_hashes: int = 4,
                    exact: str = "shuffle", num_partitions: int = 16):
    """EXACT semi join (fact rows whose key appears in ``keys_ds``) with a
    bloom prefilter — the 100 TB shape for a key side too big to broadcast
    raw: the bloom bitmap (``n_bits/8`` bytes regardless of key count)
    ships once per node via ``ray.put``; the fact side streams through a
    vectorized k-probe bit test that discards definite non-members BEFORE
    any shuffle. False positives are then eliminated exactly:

    - ``exact="shuffle"``: hash join the (drastically reduced) survivors
      against the distinct key set — both sides shuffle, but the fact side
      is now ~selectivity-sized.
    - ``exact="broadcast"``: ``broadcast_semi_join`` against the distinct
      keys (when the exact key set fits in the object store).
    - ``exact="none"``: keep the ~1% false positives (approximate filter,
      e.g. as a pre-pass feeding an exact downstream join anyway).
    """
    keys_col = keys_col or key_col
    bits = build_bloom(keys_ds, keys_col, n_bits=n_bits, n_hashes=n_hashes)
    ref = ray.put(bits)

    def prefilter(b: pa.Table) -> pa.Table:
        bm = ray.get(ref)  # node-local plasma read
        keep = _bloom_member_mask(b[key_col], bm, n_bits, n_hashes)
        return b.filter(pa.array(keep))

    survivors = fact.map_batches(prefilter, batch_format="pyarrow")
    if exact not in ("none", "broadcast", "shuffle"):
        # fail fast like bloom_anti_join — a typo'd mode used to fall
        # through silently into the full shuffle join (review-found)
        raise ValueError(f"unknown exact mode {exact!r}")
    if exact == "none":
        return survivors
    if exact == "broadcast":
        distinct = _distinct_keys(keys_ds, keys_col, key_col)
        tabs = [ray.get(r) for r in distinct.to_arrow_refs()]
        tabs = [t for t in tabs if t.num_rows]
        if not tabs:
            return survivors.limit(0)
        return broadcast_semi_join(
            survivors, pa.concat_tables(tabs)[key_col], key_col)
    # the groupby inside _distinct_keys can emit schema-less empty blocks
    # for empty hash partitions, which a later Dataset.join aborts on —
    # drop them by block metadata (the known Ray workaround in dedup.py)
    from .dedup import _drop_empty_blocks
    distinct = _drop_empty_blocks(
        _distinct_keys(keys_ds, keys_col, key_col).materialize())
    return hash_join(survivors, distinct, on=key_col,
                     num_partitions=num_partitions)


def _bloom_member_mask(arr, bm: np.ndarray, n_bits: int,
                       n_hashes: int) -> np.ndarray:
    """Boolean bloom-membership mask per row of an Arrow array (nulls →
    False). drop_null BEFORE to_numpy: a null-carrying int64 column
    to_numpy's as float64 (NaN), and hash_array(float64) differs from the
    build side's hash_array(int64) for equal values (review-found, shared
    by the semi and anti probes)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    valid = np.asarray(arr.is_valid())
    member = np.zeros(len(arr), dtype=bool)
    if valid.any():
        pos = _bloom_hashes(arr.drop_null().to_numpy(zero_copy_only=False),
                            n_bits, n_hashes)
        mem = np.ones(int(valid.sum()), dtype=bool)
        for row in pos:
            mem &= (bm[(row >> np.uint64(6)).astype(np.int64)]
                    & (np.uint64(1) << (row & np.uint64(63)))) != 0
        member[valid] = mem
    return member


def bloom_anti_join(fact, keys_ds, key_col: str, keys_col: str | None = None,
                    n_bits: int = 1 << 23, n_hashes: int = 4,
                    exact: str = "broadcast", num_partitions: int = 16):
    """EXACT anti join (fact rows whose key does NOT appear in ``keys_ds``)
    with a bloom split — the big-big complement of ``bloom_semi_join``.

    The bloom bitmap has NO false negatives, so a bloom-NEGATIVE fact row
    is *definitely* anti-output and is emitted straight from a streaming
    scan — no shuffle, no join. Only the bloom-POSITIVE "maybe" rows
    (true members + ~1% false positives) need exact verification against
    the distinct key set (``exact="broadcast"`` when the distinct keys fit
    in plasma, else ``exact="shuffle"`` left-outer + null filter).

    Cost shape: TWO streaming scans of the fact side (the two branches of
    a Ray Dataset re-execute their shared lineage) but the exact-join
    input shrinks to the maybe-set — at 100 TB, two cheap parquet scans
    beat one full-table shuffle whenever most fact keys are absent from
    the key side (the usual anti-join regime: orphan detection,
    decontamination, holdout exclusion). Null fact keys are never IN the
    key set → always kept (SQL ``NOT EXISTS`` with a non-null key side).
    """
    keys_col = keys_col or key_col
    bits = build_bloom(keys_ds, keys_col, n_bits=n_bits, n_hashes=n_hashes)
    ref = ray.put(bits)

    def _split(b: pa.Table, want_maybe: bool) -> pa.Table:
        bm = ray.get(ref)  # node-local plasma read
        # nulls: member=False → definite anti-output stream
        member = _bloom_member_mask(b[key_col], bm, n_bits, n_hashes)
        return b.filter(pa.array(member if want_maybe else ~member))

    definite = fact.map_batches(lambda b: _split(b, False),
                                batch_format="pyarrow")
    maybes = fact.map_batches(lambda b: _split(b, True),
                              batch_format="pyarrow")
    if exact == "broadcast":
        distinct = _distinct_keys(keys_ds, keys_col, key_col)
        tabs = [t for t in (ray.get(r) for r in distinct.to_arrow_refs())
                if t.num_rows]
        if not tabs:
            return fact  # key side empty: everything is anti-output
        verified = broadcast_semi_join(
            maybes, pa.concat_tables(tabs)[key_col], key_col, anti=True)
    elif exact == "shuffle":
        from .dedup import _drop_empty_blocks
        distinct = _drop_empty_blocks(
            _distinct_keys(keys_ds, keys_col, key_col).materialize())
        if distinct.count() == 0:
            return fact  # key side empty/all-null: everything is output
        marked = distinct.map_batches(
            lambda b: b.append_column("_hit", pa.array(
                np.ones(b.num_rows, dtype=bool))),
            batch_format="pyarrow")
        joined = hash_join(maybes, marked, on=key_col,
                           join_type="left_outer",
                           num_partitions=num_partitions)
        import pyarrow.compute as pc
        verified = joined.map_batches(
            lambda b: b.filter(pc.is_null(b["_hit"]))
                       .drop_columns(["_hit"]),
            batch_format="pyarrow")
    else:
        raise ValueError(f"unknown exact mode {exact!r}")
    return definite.union(verified)


def hash_join(left, right, on, right_on=None, join_type="inner",
              num_partitions: int = 16):
    """Big-big equi-join via Ray Data's hash-shuffle join."""
    return left.join(right, join_type=join_type, num_partitions=num_partitions,
                     on=(on,) if isinstance(on, str) else tuple(on),
                     right_on=(right_on,) if isinstance(right_on, str)
                     else (tuple(right_on) if right_on else None))


def range_join(ds, lows, highs, labels, value_col: str,
               out_col: str = "bucket"):
    """Interval (range) join: label each row by the interval containing
    ``value_col`` (half-open [lo, hi)); null when none.

    Partitioning assumption: intervals are sorted, non-overlapping, and
    small enough to broadcast — the lookup is one ``np.searchsorted`` per
    batch, no shuffle. (Overlapping intervals would need the cell-cover
    pattern instead.)
    """
    lows = np.asarray(lows)
    highs = np.asarray(highs)
    # integer bounds stay int64 end-to-end: float64 loses exactness above
    # 2^53 (at ns-epoch magnitudes a value 2 below an interval start
    # rounds ONTO it — review-found), so only degrade to float when the
    # bounds themselves are fractional
    int_mode = lows.dtype.kind in "iu" and highs.dtype.kind in "iu"
    dt = np.int64 if int_mode else np.float64
    lows = lows.astype(dt)
    highs = highs.astype(dt)
    labels = list(labels)
    # lexsort by (lo, hi): a zero-width [x, x) sharing its lo with a real
    # interval must sort FIRST or the non-overlap check spuriously
    # rejects valid input (review-found)
    order = np.lexsort((highs, lows))
    lows, highs = lows[order], highs[order]
    labels = [labels[i] for i in order]
    if not (lows[1:] >= highs[:-1]).all():
        raise ValueError("range_join requires non-overlapping intervals")
    payload_ref = ray.put({"lows": lows, "highs": highs, "labels": labels,
                           "int_mode": int_mode})

    def attach(b: pa.Table) -> pa.Table:
        p = ray.get(payload_ref)
        v = b[value_col].to_numpy(zero_copy_only=False)
        if p["int_mode"] and v.dtype.kind in "iu":
            v = v.astype(np.int64)
            plo, phi = p["lows"], p["highs"]
        else:
            v = v.astype(np.float64)
            plo = p["lows"].astype(np.float64)
            phi = p["highs"].astype(np.float64)
        i = np.searchsorted(plo, v, side="right") - 1
        valid = (i >= 0) & (v < phi[np.clip(i, 0, None)])
        idx = pa.array(np.where(valid, i, 0).astype(np.int32), mask=~valid)
        col = pa.DictionaryArray.from_arrays(
            idx, pa.array(p["labels"], type=pa.string()))
        return b.append_column(out_col, col)

    return ds.map_batches(attach, batch_format="pyarrow")


def _time_i8(v):
    """Scalar time → int64 NANOSECOND epoch (datetimes of any flavor —
    ``np.datetime64``, ``pd.Timestamp``, stdlib ``datetime`` as returned
    by Ray's Min/Max aggregates — all normalize to ns so bucket math
    matches ``_tv_ns_i8``'s column view)."""
    if isinstance(v, (int, np.integer)):
        return np.int64(v)
    import datetime as _dt

    import pandas as pd
    if isinstance(v, (np.datetime64, pd.Timestamp, _dt.datetime, _dt.date)):
        return np.int64(pd.Timestamp(v).value)
    return np.int64(v)


def _tv_ns_i8(col) -> np.ndarray:
    """Arrow column → int64 array in NANOSECONDS for datetime/timedelta
    columns (whatever their storage unit), pass-through for ints — the
    unit-safe view for arithmetic against ``_time_i8`` bounds. (A plain
    ``.view('i8')`` of a timestamp[us] column is µs and would make every
    (tv − lo_ns) negative, collapsing all de-skew buckets to 0.)"""
    tv = col.to_numpy(zero_copy_only=False)
    if tv.dtype.kind == "M":
        tv = tv.astype("datetime64[ns]")
    elif tv.dtype.kind == "m":
        tv = tv.astype("timedelta64[ns]")
    if tv.dtype.kind in "Mm":
        return tv.view("i8")
    return tv


def asof_join(left, right, key: str, right_key: str, on: str, right_on: str,
              value_cols: list, time_salt: int | None = None,
              time_bounds: tuple | None = None):
    """As-of join: for each left row, the latest right row of the same key
    with ``right_on <= on``; appended ``value_cols`` are null when no right
    row precedes. Both sides shuffle once on the key.

    Arrow-native group merge: within each coarse hash partition the match
    is one vectorized ``np.searchsorted`` over (key-code, time-rank)
    packed int64 keys — the same per-partition sorted-probe shape as the
    events_rolling / window_funcs partitions; no pandas conversion, so
    value columns keep their exact Arrow types (no null-upcast to
    float64). Ties on (key, time) match the LAST right row in partition
    order, the ``pd.merge_asof`` convention this replaced.

    ``time_salt=S`` (de-skew plan, for hot keys whose history exceeds one
    partition): rows are additionally range-partitioned into S uniform
    time buckets, so one key's timeline spreads over up to S group tasks.
    Semantics are preserved by a boundary pass — for every (key, bucket)
    the last right row of any EARLIER bucket is replicated into the
    bucket as a carry-in (its time strictly precedes everything in the
    bucket, so the same searchsorted kernel picks it exactly when no
    in-bucket right row precedes a left row).  Bucket boundaries come
    from a min/max aggregate over the time columns (one column-pruned
    pass; pass ``time_bounds=(lo, hi)`` to skip it when the caller
    already knows the range — NANOSECOND-epoch ints for datetime
    columns, matching ``pd.Timestamp.value``).  Use the default plan
    unless keys are skewed: the carry table holds ≤
    distinct-right-keys × S rows.  Tie caveat: when several right rows
    share an exact (key, time) pair, the carried copy is the last in
    per-batch order, which can differ from the unsalted plan's
    last-in-partition-order pick — the plans are guaranteed identical
    when (key, time) is unique on the right side."""
    left_schema = left.schema()
    left_cols = [c for c in left_schema.names]
    left_types = dict(zip(left_schema.names, left_schema.types))
    right_schema = right.schema()
    right_types = dict(zip(right_schema.names, right_schema.types))

    # union needs identical schemas: pad each side with nulls for the
    # other side's columns
    def tag_left(b: pa.Table) -> pa.Table:
        n = b.num_rows
        b = b.append_column("_side", pa.array(np.zeros(n, dtype=np.int8)))
        for c in value_cols:
            b = b.append_column(c, pa.nulls(n, type=right_types[c]))
        return b

    def tag_right(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {key: b[right_key], on: b[right_on],
                "_side": pa.array(np.ones(n, dtype=np.int8))}
        out_cols = {}
        for c in left_cols:
            if c in cols:
                out_cols[c] = cols[c]
            else:
                out_cols[c] = pa.nulls(n, type=left_types[c])
        out = pa.table(out_cols)
        out = out.append_column("_side", cols["_side"])
        for c in value_cols:
            out = out.append_column(c, b[c])
        return out

    salt = int(time_salt) if time_salt and time_salt > 1 else 0
    lo_i8 = width = None
    if salt:
        if time_bounds is not None:
            lo_i8, hi_i8 = np.int64(time_bounds[0]), np.int64(time_bounds[1])
        else:
            # one column-pruned pass per side; upstream lineage re-executes
            # for the join itself (callers with expensive upstreams should
            # pass time_bounds or materialize first)
            from ray.data.aggregate import Max, Min
            ls = left.select_columns([on]).aggregate(Min(on), Max(on))
            rs = right.select_columns([right_on]).aggregate(
                Min(right_on), Max(right_on))
            cands = [v for v in (ls[f"min({on})"], rs[f"min({right_on})"])
                     if v is not None]
            cands_hi = [v for v in (ls[f"max({on})"], rs[f"max({right_on})"])
                        if v is not None]
            if not cands or not cands_hi:
                salt = 0  # an empty side: nothing to de-skew
            else:
                lo_i8 = min(_time_i8(v) for v in cands)
                hi_i8 = max(_time_i8(v) for v in cands_hi)
        if salt:
            width = np.int64(max(1, (int(hi_i8) - int(lo_i8)) // salt + 1))

    left = left.map_batches(tag_left, batch_format="pyarrow")
    right = right.map_batches(tag_right, batch_format="pyarrow")
    both = left.union(right)

    # coarse partitions, NOT one dispatch per key: the packed searchsorted
    # below performs the grouped as-of for every key in the partition in
    # one vectorized call (the `_coarse_groupby` lesson)
    import pyarrow.compute as pc

    from .select import _hash_part_of

    def _tv_i8(col) -> np.ndarray:
        tv = col.to_numpy(zero_copy_only=False)
        if tv.dtype.kind in "Mm":
            tv = tv.view("i8")
        return tv

    def add_part(b: pa.Table) -> pa.Table:
        b = b.append_column(
            "_part", pa.array(_hash_part_of(b[key], 64)))
        if salt:
            # ns-normalized view: lo_i8/width are ns-epoch (_time_i8)
            bkt = np.clip((_tv_ns_i8(b[on]) - lo_i8) // width, 0, salt - 1)
            b = b.append_column("_bkt", pa.array(bkt.astype(np.int64)))
        return b

    def merge_part(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        if g.num_rows == 0:
            return pa.table({c: g.column(c)
                             for c in left_cols + value_cols})
        side = g["_side"].to_numpy(zero_copy_only=False)
        lidx = np.flatnonzero(side == 0)
        ridx = np.flatnonzero(side == 1)
        # shared key codes across both sides (any key type, incl.
        # strings). Null keys NEVER match (pd.merge_asof / SQL ASOF
        # semantics): a null dictionary index to_numpy's as NaN whose
        # int64 cast is UB (INT64_MIN on both sides — nulls would match
        # each other AND overflow the packed key; review-found), so
        # null-key right rows leave the probe set and null-key left rows
        # force-invalidate below.
        karr = g.column(key).chunk(0)
        null_key = pc.is_null(karr).to_numpy(zero_copy_only=False)
        codes = pc.fill_null(karr.dictionary_encode().indices, -1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ridx = ridx[~null_key[ridx]]
        tv = g.column(on).to_numpy(zero_copy_only=False)
        if tv.dtype.kind in "Mm":
            tv = tv.view("i8")
        # rank-compress times so (key_code, time_rank) packs into one
        # int64: codes, ranks ≤ n_rows, so code·(n_ranks+1)+rank < n²
        uniq, rank = np.unique(tv, return_inverse=True)
        m = np.int64(len(uniq) + 1)
        pk_r = codes[ridx] * m + rank[ridx]
        ro = np.argsort(pk_r, kind="stable")  # stable: ties keep row order
        pk_rs = pk_r[ro]
        pos = np.searchsorted(pk_rs, codes[lidx] * m + rank[lidx],
                              side="right") - 1
        clamped = np.maximum(pos, 0)
        valid = (pos >= 0) & (pk_rs[clamped] // m == codes[lidx]) \
            if len(pk_rs) else np.zeros(len(lidx), dtype=bool)
        valid = valid & ~null_key[lidx]
        match = ridx[ro][clamped] if len(pk_rs) else clamped
        # emit left rows time-ordered (the merge_asof output convention)
        lorder = np.argsort(rank[lidx], kind="stable")
        lsel = pa.array(lidx[lorder])
        rsel = pa.array(match[lorder], mask=~valid[lorder])  # null → null
        out = {c: pc.take(g.column(c), lsel) for c in left_cols}
        out.update({c: pc.take(g.column(c), rsel) for c in value_cols})
        return pa.table(out)

    parted = both.map_batches(add_part, batch_format="pyarrow")
    if not salt:
        return parted.groupby("_part").map_groups(
            merge_part, batch_format="pyarrow")

    # --- de-skew boundary pass -------------------------------------
    # For every (key, bucket) the last right row of any earlier bucket
    # is replicated into the bucket; its time strictly precedes the
    # bucket start, so merge_part's searchsorted picks it exactly when
    # no in-bucket right row precedes a left row.

    def _last_per_key_bucket(b: pa.Table) -> pa.Table:
        """Keep the last right row per (key, bucket) of this batch — a
        combiner: each batch contributes ≤ distinct(key,bucket) rows.
        Null-key right rows drop here too (they can never match — see
        merge_part)."""
        b = b.filter(pc.and_(pc.equal(b["_side"], 1),
                             pc.is_valid(b[key]))).combine_chunks()
        if b.num_rows == 0:
            return b
        codes = b.column(key).chunk(0).dictionary_encode() \
            .indices.to_numpy(zero_copy_only=False).astype(np.int64)
        bkt = b.column("_bkt").to_numpy(zero_copy_only=False)
        tv = _tv_i8(b.column(on))
        seq = np.arange(len(codes))
        order = np.lexsort((seq, tv, bkt, codes))
        is_end = np.ones(len(order), dtype=bool)
        oc, ob = codes[order], bkt[order]
        is_end[:-1] = (oc[1:] != oc[:-1]) | (ob[1:] != ob[:-1])
        return b.take(pa.array(order[is_end]))

    def _carry_fill(g: pa.Table) -> pa.Table:
        """Forward-fill per key across buckets: emit each surviving right
        row once per target bucket in (its bucket, next occupied bucket]
        (or through S-1 for the key's last occupied bucket)."""
        g = g.combine_chunks()
        if g.num_rows == 0:
            return g
        codes = g.column(key).chunk(0).dictionary_encode() \
            .indices.to_numpy(zero_copy_only=False).astype(np.int64)
        bkt = g.column("_bkt").to_numpy(zero_copy_only=False)
        tv = _tv_i8(g.column(on))
        seq = np.arange(len(codes))
        order = np.lexsort((seq, tv, bkt, codes))
        oc, ob = codes[order], bkt[order]
        is_end = np.ones(len(order), dtype=bool)
        is_end[:-1] = (oc[1:] != oc[:-1]) | (ob[1:] != ob[:-1])
        keep = order[is_end]                  # (key,bucket)-sorted rows
        kc, kb = codes[keep], bkt[keep]
        nxt = np.full(len(keep), salt - 1, dtype=np.int64)
        if len(keep) > 1:
            same = kc[:-1] == kc[1:]
            nxt[:-1][same] = kb[1:][same]
        counts = (nxt - kb).astype(np.int64)  # targets kb+1 .. nxt
        total = int(counts.sum())
        rep = np.repeat(np.arange(len(keep)), counts)
        pos = np.arange(total) - np.repeat(
            np.concatenate(([0], np.cumsum(counts)[:-1])), counts)
        tgt = kb[rep] + 1 + pos
        sub = g.take(pa.array(keep[rep]))
        return pa.table({c: (pa.array(tgt) if c == "_bkt" else sub[c])
                         for c in sub.column_names})

    carries = parted.map_batches(
        _last_per_key_bucket, batch_format="pyarrow") \
        .groupby("_part").map_groups(_carry_fill, batch_format="pyarrow")
    return parted.union(carries).groupby(["_part", "_bkt"]).map_groups(
        merge_part, batch_format="pyarrow")


def interval_overlap_join(left, right, key_col: str, lo_col: str,
                          hi_col: str, left_id: str, right_id: str,
                          bucket_width: int, n_parts: int = 64,
                          max_run: int = 4096):
    """BIG-BIG interval overlap join: all (left, right) pairs with equal
    ``key_col`` whose half-open [lo, hi) int64 intervals intersect —
    neither side broadcasts (the existing ``range_join`` ships its
    interval side via ``ray.put``; this one scales when BOTH sides are
    large).

    Technique (standard interval binning / replication join): every row
    replicates to each ``bucket_width`` bucket its interval overlaps;
    one coarse hash shuffle on (key, bucket) co-locates candidates;
    within each (key, bucket) run the overlap test is vectorized; a pair
    is emitted ONLY in the bucket containing ``max(lo_l, lo_r)`` — the
    overlap's first bucket — so cross-bucket duplicates never exist and
    no global dedup pass is needed (exactly-once by construction).

    Cost: replication factor = avg interval span / bucket_width + 1;
    pick ``bucket_width`` near the median span. Runs above ``max_run``
    rows are capped with a log line (hot-key/hot-window contract)."""
    import logging

    import pyarrow.compute as pc

    from .select import _hash_part_of
    from ..stages.dedup import _splitmix64  # deterministic bucket salt

    def replicate(side: int):
        def fn(b: pa.Table) -> pa.Table:
            # a null key can never join (SQL inner semantics) and its
            # dictionary index would int64-cast through NaN downstream —
            # drop those rows before replication
            b = b.filter(pc.is_valid(b[key_col]))
            ids = b[left_id if side == 0 else right_id] \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            lo = b[lo_col].to_numpy(zero_copy_only=False).astype(np.int64)
            hi = b[hi_col].to_numpy(zero_copy_only=False).astype(np.int64)
            first = lo // bucket_width
            last = (np.maximum(hi, lo + 1) - 1) // bucket_width
            counts = (last - first + 1).astype(np.int64)
            idx = np.repeat(np.arange(len(ids)), counts)
            offs = np.arange(int(counts.sum())) - np.repeat(
                np.cumsum(counts) - counts, counts)
            bucket = first[idx] + offs
            keys = b[key_col]
            if isinstance(keys, pa.ChunkedArray):
                keys = keys.combine_chunks()
            return pa.table({
                "key": pc.take(keys, pa.array(idx)),
                "bucket": pa.array(bucket),
                "rid": pa.array(ids[idx]),
                "lo": pa.array(lo[idx]),
                "hi": pa.array(hi[idx]),
                "side": pa.array(np.full(len(idx), side, dtype=np.int8)),
            })
        return fn

    both = left.map_batches(replicate(0), batch_format="pyarrow") \
        .union(right.map_batches(replicate(1), batch_format="pyarrow"))

    def add_part(b: pa.Table) -> pa.Table:
        kp = _hash_part_of(b["key"], 1 << 20).astype(np.uint64)
        bk = b["bucket"].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = (_splitmix64(kp * np.uint64(0x9E3779B9) ^ bk)
                % np.uint64(n_parts)).astype(np.int64)
        return b.append_column("_part", pa.array(part))

    def per_part(g: pa.Table) -> pa.Table:
        empty = pa.table({"id_l": pa.array([], type=pa.int64()),
                          "id_r": pa.array([], type=pa.int64())})
        if g.num_rows == 0:
            return empty
        g = g.drop_columns(["_part"])
        idx = pc.sort_indices(g, sort_keys=[
            ("key", "ascending"), ("bucket", "ascending"),
            ("side", "ascending"), ("rid", "ascending")])
        g = g.take(idx)
        keys = g["key"].combine_chunks().dictionary_encode() \
            .indices.to_numpy(zero_copy_only=False).astype(np.int64)
        bk = g["bucket"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, (keys[1:] != keys[:-1])
                                      | (bk[1:] != bk[:-1])])
        bounds = np.r_[starts, len(keys)]
        rid = g["rid"].to_numpy(zero_copy_only=False)
        lo = g["lo"].to_numpy(zero_copy_only=False)
        hi = g["hi"].to_numpy(zero_copy_only=False)
        side = g["side"].to_numpy(zero_copy_only=False)
        # fully vectorized run processing (the old per-left-row Python
        # loop paid the small-batch dispatch tax on every row —
        # review-found): after the (key, bucket, side, rid) sort each
        # run is [lefts..., rights...], so every left row's candidate
        # range is (first_right_of_run, run_end) and the whole cross
        # product is one segmented expansion, memory-bounded by the
        # shared chunked enumerator.
        from ..pipelines.spatial import _expand_pairs_chunked
        runs_s = bounds[:-1]
        runs_e_full = bounds[1:]
        runs_e = np.minimum(runs_e_full, runs_s + max_run)
        capped = runs_e_full - runs_s > max_run
        if capped.any():
            logging.getLogger(__name__).warning(
                "interval_overlap_join: %d runs capped at %d rows",
                int(capped.sum()), max_run)
        c0 = np.cumsum(side == 0)
        nl = c0[runs_e - 1] - np.where(runs_s > 0, c0[runs_s - 1], 0)
        m = runs_s + nl                       # first right row per run
        tot_l = int(nl.sum())
        if tot_l == 0:
            return empty
        li = (np.arange(tot_l, dtype=np.int64)
              - np.repeat(np.cumsum(nl) - nl, nl)
              + np.repeat(runs_s, nl))        # global left row indices
        st = np.repeat(m, nl)
        en = np.repeat(runs_e, nl)
        outs = []
        for ai, ri_ in _expand_pairs_chunked(st, en):
            gl = li[ai]
            ov = (lo[gl] < hi[ri_]) & (lo[ri_] < hi[gl])
            # exactly-once: emit only in the overlap's FIRST bucket
            rep = (np.maximum(lo[gl], lo[ri_]) // bucket_width) == bk[gl]
            keep = ov & rep
            outs.append((rid[gl[keep]], rid[ri_[keep]]))
        if not outs:
            return empty
        return pa.table({
            "id_l": pa.array(np.concatenate([o[0] for o in outs]),
                             type=pa.int64()),
            "id_r": pa.array(np.concatenate([o[1] for o in outs]),
                             type=pa.int64())})

    return both.map_batches(add_part, batch_format="pyarrow") \
        .groupby("_part").map_groups(per_part, batch_format="pyarrow")
