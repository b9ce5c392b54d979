"""Aggregate-family operators: keep-latest dedup per key, integer-exact
grouped moments, static-column pivot, and ROLLUP grouping sets.

The reference has no relational aggregates (it is a geo lookup engine —
SURVEY §2); these extend the training-data-pipeline surface, each built
combiner-first so the shuffle moves per-block PARTIALS, never raw rows:

- ``latest_per_group`` — dedup keeping the last row per key under a
  lexicographic (order_cols DESC) contract: the canonical
  "latest-event-per-user" / "newest-crawl-per-url" op. Per-block local
  keep-latest first (≤ 1 row per group per block crosses the wire), exact
  re-select inside coarse hash partitions of the key.
- ``grouped_stats`` — count / sum / sum-of-squares per group with values
  cents-scaled to int64 BEFORE any aggregation, so the partials are exact
  integers and associative: no FP accumulation drift between the
  distributed sum order and any other engine's. Mean/std emitted as
  derived float columns. int64 bound: |value| ≤ ~9.6e6 at cents scale
  keeps sumsq per group under 2^63 for ≤ 1e8 rows — document and raise
  beyond.
- ``pivot_counts`` — long→wide counts per key over a STATIC category list
  (the same contract as SQL pivot: output columns are fixed up front).
  Per-block bincount over (key_code × n_cat + cat_code), groupby-sum of
  the wide partials.
- ``rollup_agg`` — GROUP BY ROLLUP(c1..ck): the finest level aggregates
  once from raw rows (cents-scaled partials); every coarser level
  re-aggregates the FINEST AGGREGATE, never the raw data — exact because
  the partials are integers, and the extra passes touch only the (small)
  distinct-combination table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .select import _hash_part_of


BROADCAST_STATS_MAX = 2_000_000  # zscore broadcast→join threshold


def _sql_cents(b_col, scale: float = 100.0):
    """SQL-round (ties away from zero) scale-to-int64 — the shared
    stabilization contract (see ``__ray_entry__._round_sql``)."""
    return pc.cast(pc.round(pc.multiply(b_col, pa.scalar(scale)),
                            round_mode="half_towards_infinity"), pa.int64())


def latest_per_group(ds, group_col: str, order_cols: list,
                     n_parts: int = 64):
    """One row per ``group_col``: the row that sorts LAST by
    ``order_cols`` (lexicographic, all descending — ties broken by the
    next column; make the last order col a unique id for determinism).
    SQL: ``QUALIFY row_number() OVER (PARTITION BY g ORDER BY o1 DESC,
    o2 DESC ...) = 1``.

    Scale shape: per-block local keep-latest is the combiner — at most one
    row per group per block ever shuffles — then the same vectorized
    select runs once per coarse hash partition of the key. Null group
    keys form their own group (SQL GROUP BY semantics)."""
    sort_keys = [(group_col, "ascending")] + \
        [(c, "descending") for c in order_cols]

    def keep_first_run(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        idx = pc.sort_indices(
            t, sort_keys=sort_keys, null_placement="at_end")
        t = t.take(idx)
        from .select import _group_codes
        codes, _ = _group_codes(t[group_col])
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        return t.take(pa.array(starts))

    def local(b: pa.Table) -> pa.Table:
        return keep_first_run(b)

    def add_part(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_part", pa.array(_hash_part_of(b[group_col], n_parts)))

    def per_part(g: pa.Table) -> pa.Table:
        if "_part" in g.column_names:
            g = g.drop_columns(["_part"])
        return keep_first_run(g)

    return ds.map_batches(local, batch_format="pyarrow") \
        .map_batches(add_part, batch_format="pyarrow") \
        .groupby("_part").map_groups(per_part, batch_format="pyarrow")


def _null_safe_grouped_sum(partials, group_col: str, sum_cols: list,
                           n_parts: int = 64):
    """``groupby(group_col).Sum(sum_cols)`` with SQL null-group
    semantics: Ray's sort-based groupby crashes on null keys (TypeError
    comparing None against the key type — review-found; the partials
    deliberately EMIT a null-group row because null is a legitimate SQL
    group), so partial rows merge inside coarse hash partitions of the
    key instead (`select.group_row_counts`' pattern). Sums are exact
    int64 (stable argsort + add.reduceat — never float bincount weights,
    whose 2^53 window the partials may already exceed)."""
    from .select import _group_codes

    def add_part(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_part", pa.array(_hash_part_of(b[group_col], n_parts)))

    def merge(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_part"])
        if g.num_rows == 0:
            return pa.table(
                {group_col: pa.array([], type=g[group_col].type),
                 **{c: pa.array([], type=pa.int64()) for c in sum_cols}})
        codes, dict_vals = _group_codes(g[group_col])
        order = np.argsort(codes, kind="stable")
        cc = codes[order]
        starts = np.flatnonzero(np.r_[True, cc[1:] != cc[:-1]])
        sel = cc[starts]
        vals = [dict_vals[c].as_py() if c < len(dict_vals) else None
                for c in sel]
        out = {group_col: pa.array(vals, type=g[group_col].type)}
        for c in sum_cols:
            v = g[c].to_numpy(zero_copy_only=False)[order]
            out[c] = pa.array(np.add.reduceat(v, starts)
                              .astype(np.int64))
        return pa.table(out)

    return partials.map_batches(add_part, batch_format="pyarrow") \
        .groupby("_part").map_groups(merge, batch_format="pyarrow")


def grouped_stats(ds, group_col: str, value_col: str, scale: float = 100.0,
                  n_parts: int = 64):
    """Per-group count / integer sum / integer sum-of-squares (+ derived
    float mean, std) → Dataset of (group, n, sum_c, sumsq_c, mean, std).

    Values are SQL-rounded to int64 at ``scale`` FIRST; every aggregate is
    then exact integer arithmetic, associative across any distribution
    order. NaN values are dropped (SQL aggregates over a NaN-filtered
    CTE). std is the population σ of the SCALED values divided back by
    ``scale`` (σ is shift/scale-covariant, so this equals σ of the rounded
    values exactly)."""

    def partial(b: pa.Table) -> pa.Table:
        v = b[value_col]
        # drop null AND NaN values (SQL: the NaN-filtered CTE also drops
        # nulls because NOT isnan(NULL) is NULL) — a null int64 would
        # otherwise become NaN in to_numpy and poison the bincount sums
        keep = pc.is_valid(v)
        if pa.types.is_floating(v.type):
            keep = pc.and_kleene(keep, pc.invert(pc.is_nan(v)))
        keep = pc.fill_null(keep, False)
        b = b.filter(keep)
        if b.num_rows == 0:
            return pa.table({group_col: pa.array([], type=b[group_col].type),
                             "n": pa.array([], type=pa.int64()),
                             "sum_c": pa.array([], type=pa.int64()),
                             "sumsq_c": pa.array([], type=pa.int64())})
        c = _sql_cents(b[value_col], scale).to_numpy(zero_copy_only=False)
        from .select import _group_codes
        codes, gdict = _group_codes(b[group_col])
        n_codes = len(gdict) + 1
        n = np.bincount(codes, minlength=n_codes)
        # np.bincount weights accumulate in float64 — exact only while
        # every intermediate integer stays < 2^53. Guard with the
        # monotone bounds (sum |c| and sum c²) and fall back to int64
        # segmented sums when a block could overflow the exact window.
        absbound = np.bincount(codes, weights=np.abs(c).astype(np.float64),
                               minlength=n_codes)
        sq = np.bincount(codes, weights=(c.astype(np.float64)) ** 2,
                         minlength=n_codes)
        if (absbound >= 2 ** 52).any() or (sq >= 2 ** 52).any():
            order = np.argsort(codes, kind="stable")
            cs, cc = c[order], codes[order]
            starts = np.flatnonzero(np.r_[True, cc[1:] != cc[:-1]])
            s = np.zeros(n_codes, dtype=np.int64)
            sq_i = np.zeros(n_codes, dtype=np.int64)
            s[cc[starts]] = np.add.reduceat(cs, starts)
            sq_i[cc[starts]] = np.add.reduceat(cs * cs, starts)
            sq = sq_i
        else:
            s = np.bincount(codes, weights=c.astype(np.float64),
                            minlength=n_codes)
        present = np.flatnonzero(n > 0)
        gvals = pa.concat_arrays(
            [gdict.cast(gdict.type),
             pa.array([None], type=gdict.type)])
        return pa.table({
            group_col: gvals.take(pa.array(present)),
            "n": pa.array(n[present].astype(np.int64)),
            "sum_c": pa.array(s[present].astype(np.int64)),
            "sumsq_c": pa.array(sq[present].astype(np.int64))})

    agg = _null_safe_grouped_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        group_col, ["n", "sum_c", "sumsq_c"])

    def finish(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = b["sum_c"].to_numpy(zero_copy_only=False).astype(np.float64)
        sq = b["sumsq_c"].to_numpy(zero_copy_only=False).astype(np.float64)
        var = np.maximum(sq / n - (s / n) ** 2, 0.0)  # population σ²
        return pa.table({
            group_col: b[group_col], "n": b["n"],
            "sum_c": b["sum_c"], "sumsq_c": b["sumsq_c"],
            "mean": pa.array(s / n / scale),
            "std": pa.array(np.sqrt(var) / scale)})

    return agg.map_batches(finish, batch_format="pyarrow")


def pivot_counts(ds, key_col: str, pivot_col: str, categories: list,
                 n_parts: int = 64):
    """Long→wide: one row per ``key_col``, one int64 count column per
    category in ``categories`` (static, like SQL pivot column lists —
    values outside the list are IGNORED, mirroring
    ``sum(CASE WHEN p = 'cat' THEN 1 ELSE 0 END)`` per listed cat).

    Per-block combiner: one flat bincount over
    ``key_code × n_cat + cat_code`` — a single vectorized pass, then the
    groupby sums wide partial rows (≤ keys-per-block rows per block)."""
    categories = list(categories)
    cat_arr = pa.array(categories, type=pa.string())
    ncat = len(categories)

    def partial(b: pa.Table) -> pa.Table:
        cat_idx = pc.index_in(b[pivot_col], value_set=cat_arr)
        mask = pc.is_valid(cat_idx)
        b2 = b.filter(mask)
        if b2.num_rows == 0:
            cols = {key_col: pa.array([], type=b[key_col].type)}
            for c in categories:
                cols[c] = pa.array([], type=pa.int64())
            return pa.table(cols)
        cat_codes = cat_idx.filter(mask).to_numpy(
            zero_copy_only=False).astype(np.int64)
        from .select import _group_codes
        key_codes, kdict = _group_codes(b2[key_col])
        counts = np.bincount(key_codes * ncat + cat_codes,
                             minlength=(len(kdict) + 1) * ncat) \
            .reshape(-1, ncat)
        present = np.flatnonzero(counts.sum(axis=1) > 0)
        kvals = pa.concat_arrays(
            [kdict.cast(kdict.type), pa.array([None], type=kdict.type)])
        cols = {key_col: kvals.take(pa.array(present))}
        for j, c in enumerate(categories):
            cols[c] = pa.array(counts[present, j].astype(np.int64))
        return pa.table(cols)

    return _null_safe_grouped_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        key_col, categories, n_parts=n_parts)


def rollup_agg(ds, cols: list, value_col: str | None = None,
               scale: float = 100.0):
    """GROUP BY ROLLUP(cols): count (and, when ``value_col`` given, an
    exact cents-scaled int64 sum ``total_c``) at every rollup level —
    (c1..ck), (c1..ck-1), …, (), with rolled-up columns null (SQL ROLLUP
    output shape).

    One pass over raw rows builds the FINEST level (per-block integer
    partials → groupby); every coarser level is a groupby over the
    previous LEVEL's aggregate — integer partials are associative, so this
    is exact, and the re-aggregated input is the distinct-combination
    table, not the data. Caveat (documented SQL divergence): a real null
    in a group column is indistinguishable from the rolled-up null in the
    output rows; use a sentinel upstream if inputs may be null."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        keep = {c: b[c] for c in cols}
        t = pa.table(keep)
        t = t.append_column("n", pa.array(
            np.ones(b.num_rows, dtype=np.int64)))
        if value_col is not None:
            t = t.append_column("total_c", _sql_cents(b[value_col], scale))
        aggs = [("n", "sum")] + (
            [("total_c", "sum")] if value_col is not None else [])
        g = pa.TableGroupBy(t, cols).aggregate(aggs)
        out = {c: g[c] for c in cols}
        out["n"] = pc.cast(g["n_sum"], pa.int64())
        if value_col is not None:
            out["total_c"] = pc.cast(g["total_c_sum"], pa.int64())
        return pa.table(out)

    metric_cols = ["n"] + (["total_c"] if value_col is not None else [])
    in_schema = ds.schema()
    group_types = {c: t for c, t in zip(in_schema.names, in_schema.types)
                   if c in cols}

    # materialize ONLY the finest aggregate (the small distinct-combination
    # table, not the data): every coarser level + the grand-total fold
    # re-reads it, and without pinning, each would re-execute the raw scan
    finest = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(cols).aggregate(
            *[Sum(m, alias_name=m) for m in metric_cols]).materialize()

    def make_pad(kept):
        def pad(b: pa.Table) -> pa.Table:
            out = {}
            for c in cols:
                out[c] = b[c] if c in kept \
                    else pa.nulls(b.num_rows, type=group_types[c])
            for m in metric_cols:
                out[m] = b[m]
            return pa.table(out)
        return pad

    levels = [finest]
    prev = finest
    for lvl in range(len(cols) - 1, 0, -1):
        kept = cols[:lvl]
        coarser = prev.groupby(kept).aggregate(
            *[Sum(m, alias_name=m) for m in metric_cols])
        levels.append(coarser.map_batches(make_pad(kept),
                                          batch_format="pyarrow"))
        prev = coarser

    # grand-total level: ONE row — a driver-side fold of the (small)
    # coarsest aggregate, not of the data
    import ray.data as rd
    tot = prev.aggregate(*[Sum(m, alias_name=m) for m in metric_cols])
    tot_cols = {c: pa.nulls(1, type=group_types[c]) for c in cols}
    for m in metric_cols:
        v = tot[m] if tot and tot.get(m) is not None else 0
        tot_cols[m] = pa.array([int(v)], type=pa.int64())
    levels.append(rd.from_arrow(pa.table(tot_cols)))

    return levels[0].union(*levels[1:])


def grouped_ohlc(ds, group_col: str, ts_col: str, id_col: str,
                 value_col: str, n_parts: int = 64):
    """Per-group OPEN/HIGH/LOW/CLOSE/N over a time-ordered value column —
    open = value at the smallest (ts, id), close = at the largest, ties
    broken by ``id_col`` (fully deterministic, SQL row_number
    reproducible). Output: (group, open, high, low, close, n).

    The ordered endpoints are ASSOCIATIVE argmin/argmax aggregates: each
    block folds to ONE row per group carrying its endpoint (ts, id, value)
    triples plus high/low/n, so the shuffle moves ≤ groups·blocks rows —
    never raw events — and the per-partition combine re-applies the same
    vectorized fold to partials. Values are picked, not summed: no float
    reduce-order drift, bit-exact vs the SQL oracle. Rows with null ts,
    id or value are dropped first (SQL aggregates ignore NULL; a null
    value becomes NaN in to_numpy and would poison the reduceat min/max
    — review-found)."""

    def fold(t: pa.Table, pre_folded: bool) -> pa.Table:
        if t.num_rows == 0:
            # derive the empty schema from the INPUT types (hardcoding
            # int64/timestamp[us] emitted schema-divergent empty blocks
            # for string groups or second-resolution timestamps —
            # review-found)
            gty = t[group_col].type
            tty = t["_ots" if pre_folded else ts_col].type
            ity = t["_oid" if pre_folded else id_col].type
            return pa.table({
                group_col: pa.array([], type=gty),
                "_ots": pa.array([], type=tty),
                "_oid": pa.array([], type=ity),
                "open": pa.array([], type=pa.float64()),
                "_cts": pa.array([], type=tty),
                "_cid": pa.array([], type=ity),
                "close": pa.array([], type=pa.float64()),
                "high": pa.array([], type=pa.float64()),
                "low": pa.array([], type=pa.float64()),
                "n": pa.array([], type=pa.int64())})
        ots, oid, ov = ("_ots", "_oid", "open") if pre_folded \
            else (ts_col, id_col, value_col)
        cts, cid, cv = ("_cts", "_cid", "close") if pre_folded \
            else (ts_col, id_col, value_col)
        asc = t.take(pc.sort_indices(t, sort_keys=[
            (group_col, "ascending"), (ots, "ascending"),
            (oid, "ascending")]))
        from .select import _group_codes
        codes, _ = _group_codes(asc[group_col])
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        ends = np.r_[starts[1:], codes.size] - 1
        first = asc.take(pa.array(starts))
        if pre_folded:
            # close endpoint needs its own ordering over close triples
            dsc = t.take(pc.sort_indices(t, sort_keys=[
                (group_col, "ascending"), (cts, "descending"),
                (cid, "descending")]))
            codes_d, _ = _group_codes(dsc[group_col])
            starts_d = np.flatnonzero(np.r_[True,
                                            codes_d[1:] != codes_d[:-1]])
            last = dsc.take(pa.array(starts_d))
            hi = np.maximum.reduceat(
                asc["high"].to_numpy(zero_copy_only=False), starts)
            lo = np.minimum.reduceat(
                asc["low"].to_numpy(zero_copy_only=False), starts)
            ns = np.add.reduceat(
                asc["n"].to_numpy(zero_copy_only=False), starts)
        else:
            last = asc.take(pa.array(ends))
            vals = asc[value_col].to_numpy(zero_copy_only=False)
            hi = np.maximum.reduceat(vals, starts)
            lo = np.minimum.reduceat(vals, starts)
            ns = np.diff(np.r_[starts, codes.size]).astype(np.int64)
        return pa.table({
            group_col: first[group_col],
            "_ots": first[ots], "_oid": first[oid],
            "open": pc.cast(first[ov], pa.float64()),
            "_cts": last[cts], "_cid": last[cid],
            "close": pc.cast(last[cv], pa.float64()),
            "high": pa.array(hi, type=pa.float64()),
            "low": pa.array(lo, type=pa.float64()),
            "n": pa.array(ns.astype(np.int64))})

    def local(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.and_(pc.is_valid(b[ts_col]),
                                     pc.is_valid(b[id_col])),
                             pc.is_valid(b[value_col])))
        p = fold(b, pre_folded=False)
        return p.append_column(
            "_part", pa.array(_hash_part_of(p[group_col], n_parts)))

    def per_part(g: pa.Table) -> pa.Table:
        if "_part" in g.column_names:
            g = g.drop_columns(["_part"])
        out = fold(g, pre_folded=True)
        return out.drop_columns(["_ots", "_oid", "_cts", "_cid"])

    return ds.map_batches(local, batch_format="pyarrow") \
        .groupby("_part").map_groups(per_part, batch_format="pyarrow")


def zscore_by_group(ds, group_col: str, value_col: str,
                    scale: float = 100.0, out_col: str = "zscore"):
    """Group-wise z-score normalization — the standard feature scaling
    pass — WITHOUT a window-function shuffle: per-group exact moments
    via :func:`grouped_stats` (combiner partials; only (group, n, Σ, Σ²)
    rows shuffle), the tiny stats table broadcast once via ``ray.put``,
    and every fact row normalized in a streaming ``map_batches``.

    Bit-reproducibility contract: the score is ONE fixed IEEE expression
    over int64-exact inputs, identical in numpy and SQL —

        z = (vc·n − sum_c) / sqrt(max(n·sumsq_c − sum_c², 0))

    with ``vc = SQL-round(value·scale)`` and every operand cast int64 →
    float64 first (exact while < 2^53; the same bound
    :func:`grouped_stats` already documents). Zero variance → NULL
    (SQL ``NULLIF``); NaN/null values and groups absent from the stats
    → NULL. No mean-then-subtract two-step: dividing scaled ints keeps
    the expression scale-free (the ·scale factors cancel).
    """
    import ray

    stats = grouped_stats(ds, group_col, value_col, scale=scale)
    # broadcast path up to BROADCAST_STATS_MAX groups (tens of MB in
    # plasma, shipped once per node); beyond that — a crawl-scale
    # high-cardinality group key — attach the stats by hash join on the
    # group key instead of pulling them through the driver (same
    # threshold contract as the distinctive_terms vocab join).
    stats = stats.materialize()
    if stats.count() > BROADCAST_STATS_MAX:
        from .dedup import _drop_empty_blocks
        cpus = int(ray.cluster_resources().get("CPU", 8))
        joined = ds.join(_drop_empty_blocks(stats), join_type="left_outer",
                         num_partitions=max(2, cpus * 2), on=(group_col,))
        # Ray's hash join never matches null keys, but the broadcast
        # path's pc.index_in DOES (and SQL GROUP BY treats null as its
        # own group) — fetch the at-most-one null-group stats row via a
        # distributed filter and patch null-key rows after the join so
        # both plans implement the same semantics (review-found
        # divergence at the broadcast→join threshold).
        null_rows = stats.map_batches(
            lambda b: b.filter(pc.is_null(b[group_col])),
            batch_format="pyarrow").take_all()
        null_stats = (null_rows[0] if null_rows else None)

        def apply_joined(b: pa.Table) -> pa.Table:
            nf = pc.fill_null(b["n"], 0).to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            sf = pc.fill_null(b["sum_c"], 0) \
                .to_numpy(zero_copy_only=False).astype(np.float64)
            sqf = pc.fill_null(b["sumsq_c"], 0) \
                .to_numpy(zero_copy_only=False).astype(np.float64)
            have = pc.is_valid(b["n"]).to_numpy(zero_copy_only=False)
            if null_stats is not None:
                isnull = pc.is_null(b[group_col]) \
                    .to_numpy(zero_copy_only=False)
                nf = np.where(isnull, float(null_stats["n"]), nf)
                sf = np.where(isnull, float(null_stats["sum_c"]), sf)
                sqf = np.where(isnull, float(null_stats["sumsq_c"]), sqf)
                have = have | isnull
            out = _z_apply(b, value_col, scale, nf, sf, sqf, have, out_col)
            return out.drop_columns(
                [c for c in ("n", "sum_c", "sumsq_c", "mean", "std")
                 if c in out.column_names])

        return joined.map_batches(apply_joined, batch_format="pyarrow")

    st = pa.concat_tables(
        stats.iter_batches(batch_size=None, batch_format="pyarrow")).combine_chunks()
    sref = ray.put(st)

    def apply(b: pa.Table) -> pa.Table:
        s = ray.get(sref)
        pos = pc.index_in(b[group_col], value_set=s[group_col])
        have = pc.is_valid(pos).to_numpy(zero_copy_only=False)
        posv = pc.fill_null(pos, 0)
        nf = pc.take(s["n"], posv).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        sf = pc.take(s["sum_c"], posv).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        sqf = pc.take(s["sumsq_c"], posv).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return _z_apply(b, value_col, scale, nf, sf, sqf, have, out_col)

    return ds.map_batches(apply, batch_format="pyarrow")


def _z_apply(b: pa.Table, value_col: str, scale: float,
             nf: np.ndarray, sf: np.ndarray, sqf: np.ndarray,
             have: np.ndarray, out_col: str) -> pa.Table:
    """Shared z-score kernel: one fixed IEEE expression over per-row
    exact moments (see zscore_by_group's contract)."""
    v = b[value_col]
    ok = pc.is_valid(v)
    if pa.types.is_floating(v.type):
        ok = pc.and_kleene(ok, pc.invert(pc.is_nan(v)))
    ok = pc.fill_null(ok, False).to_numpy(zero_copy_only=False) & have
    v0 = pc.fill_null(v, 0.0)
    v0 = pc.if_else(pc.is_nan(v0), pa.scalar(0.0, v0.type), v0) \
        if pa.types.is_floating(v.type) else v0
    vcf = _sql_cents(v0, scale).to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    den = np.sqrt(np.maximum(nf * sqf - sf * sf, 0.0))
    with np.errstate(divide="ignore", invalid="ignore"):
        z = (vcf * nf - sf) / den
    valid = ok & (den != 0.0)
    out = pa.array(np.where(valid, z, 0.0), type=pa.float64())
    out = pc.if_else(pa.array(valid), out, pa.scalar(None, pa.float64()))
    return b.append_column(out_col, out)


def cube_agg(ds, cols: list, value_col: str | None = None,
             scale: float = 100.0):
    """GROUP BY CUBE(cols): count (+ exact cents-scaled sum) at EVERY
    subset of the grouping columns — the full grouping-sets lattice,
    completing the family next to :func:`rollup_agg` (prefixes only).

    Same exactness shape: one raw-data pass builds the finest aggregate
    (materialized — it is the small distinct-combination table), every
    other subset re-aggregates THAT (integer partials are associative),
    and the grand total is a driver fold of the coarsest rows. 2^k − 2
    extra groupbys run over combo-table-sized inputs, never the data.
    Same null caveat as rollup: a real null group value is
    indistinguishable from the cube null."""
    from itertools import combinations

    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({c: b[c] for c in cols})
        t = t.append_column("n", pa.array(
            np.ones(b.num_rows, dtype=np.int64)))
        if value_col is not None:
            t = t.append_column("total_c", _sql_cents(b[value_col], scale))
        aggs = [("n", "sum")] + (
            [("total_c", "sum")] if value_col is not None else [])
        g = pa.TableGroupBy(t, cols).aggregate(aggs)
        out = {c: g[c] for c in cols}
        out["n"] = pc.cast(g["n_sum"], pa.int64())
        if value_col is not None:
            out["total_c"] = pc.cast(g["total_c_sum"], pa.int64())
        return pa.table(out)

    metric_cols = ["n"] + (["total_c"] if value_col is not None else [])
    in_schema = ds.schema()
    group_types = {c: t for c, t in zip(in_schema.names, in_schema.types)
                   if c in cols}

    finest = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(cols).aggregate(
            *[Sum(m, alias_name=m) for m in metric_cols]).materialize()

    def make_pad(kept):
        def pad(b: pa.Table) -> pa.Table:
            out = {}
            for c in cols:
                out[c] = b[c] if c in kept \
                    else pa.nulls(b.num_rows, type=group_types[c])
            for m in metric_cols:
                out[m] = b[m]
            return pa.table(out)
        return pad

    levels = [finest]
    for r in range(len(cols) - 1, 0, -1):
        for kept in combinations(cols, r):
            sub = finest.groupby(list(kept)).aggregate(
                *[Sum(m, alias_name=m) for m in metric_cols])
            levels.append(sub.map_batches(make_pad(set(kept)),
                                          batch_format="pyarrow"))

    import ray.data as rd
    tot = finest.aggregate(*[Sum(m, alias_name=m) for m in metric_cols])
    tot_cols = {c: pa.nulls(1, type=group_types[c]) for c in cols}
    for m in metric_cols:
        v = tot[m] if tot and tot.get(m) is not None else 0
        tot_cols[m] = pa.array([int(v)], type=pa.int64())
    levels.append(rd.from_arrow(pa.table(tot_cols)))

    return levels[0].union(*levels[1:])
