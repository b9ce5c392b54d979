"""Join operators beyond the spatial join.

- ``broadcast_lookup``: fact ⋈ small-dim via a `ray.put` dict — the 100 TB
  pattern for dimension joins (no shuffle; one object transfer per node).
- ``broadcast_semi_join``: semi/anti filter-join against a broadcast key
  set (``pc.is_in`` per batch; no shuffle, no row widening).
- ``hash_join``: big ⋈ big via Ray Data's hash-shuffle ``Dataset.join``.
- ``asof_join``: per-key ordered as-of join (each left row matched to the
  latest right row with ``right_on <= left_on``) — a custom operator Ray
  Data lacks, composed from co-partitioning ``groupby(key)`` +
  ``map_groups`` with a pandas ``merge_asof`` inside each group.
  Partitioning assumption: all rows of one key fit in one group task
  (bounded per-key history); skewed keys would need the same salting as the
  spatial path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def broadcast_lookup(ds, small_table: pa.Table, key: str, small_key: str,
                     value_cols: list, concurrency=None):
    """Append ``value_cols`` from a small dimension table, broadcast once via
    ``ray.put``. The per-batch probe is fully vectorized Arrow:
    ``pc.index_in`` (hash probe into the dim key set) + ``pc.take`` on each
    value column — no per-row Python, nulls where the key has no match.
    Duplicate dim keys resolve to the FIRST occurrence (dim keys are unique
    in every use here)."""
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
    lows = np.asarray(lows, dtype=np.float64)
    highs = np.asarray(highs, dtype=np.float64)
    labels = list(labels)
    order = np.argsort(lows)
    lows, highs = lows[order], highs[order]
    labels = [labels[i] for i in order]
    if not (lows[1:] >= highs[:-1]).all():
        raise ValueError("range_join requires non-overlapping intervals")
    payload_ref = ray.put({"lows": lows, "highs": highs, "labels": labels})

    def attach(b: pa.Table) -> pa.Table:
        p = ray.get(payload_ref)
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        i = np.searchsorted(p["lows"], v, side="right") - 1
        valid = (i >= 0) & (v < p["highs"][np.clip(i, 0, None)])
        idx = pa.array(np.where(valid, i, 0).astype(np.int32), mask=~valid)
        col = pa.DictionaryArray.from_arrays(
            idx, pa.array(p["labels"], type=pa.string()))
        return b.append_column(out_col, col)

    return ds.map_batches(attach, batch_format="pyarrow")


def asof_join(left, right, key: str, right_key: str, on: str, right_on: str,
              value_cols: list):
    """As-of join: for each left row, the latest right row of the same key
    with ``right_on <= on``; appended ``value_cols`` are null when no right
    row precedes. Both sides shuffle once on the key."""
    import pandas as pd

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

    left = left.map_batches(tag_left, batch_format="pyarrow")
    right = right.map_batches(tag_right, batch_format="pyarrow")
    both = left.union(right)

    # declared output Arrow types: left columns keep theirs, appended value
    # columns keep the right side's. pandas null-upcasts int64 → float64 (the
    # union pads each side with nulls), so every group result is cast back to
    # the declared schema via pandas nullable ints before returning — the
    # Arrow conversion then yields the original int64, not double.
    out_types = dict(left_types)
    out_types.update({c: right_types[c] for c in value_cols})

    def _restore_dtypes(df: pd.DataFrame) -> pd.DataFrame:
        for c in df.columns:
            t = out_types.get(c)
            if t is None:
                continue
            if pa.types.is_integer(t):
                kind = "UInt" if pa.types.is_unsigned_integer(t) else "Int"
                df[c] = df[c].astype(f"{kind}{t.bit_width}")
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["_side"] == 0].drop(columns=["_side"] + value_cols,
                                    errors="ignore")
        r = g[g["_side"] == 1][[on] + value_cols].sort_values(on)
        l = l.sort_values(on)
        if len(r) == 0:
            for c in value_cols:
                l[c] = None
            return _restore_dtypes(l)
        return _restore_dtypes(pd.merge_asof(l, r, on=on, direction="backward"))

    return both.groupby(key).map_groups(merge, batch_format="pandas")
