"""Relational operator coverage over the TPC-H-ish testdata tables.

These exercise the engine's wide operators (groupby aggregate, sort+limit,
broadcast hash join, temporal window bucketing) with exact DuckDB oracles.
Small dimension tables are broadcast (`ray.put` once, vectorized
``pc.index_in`` + ``take`` probe inside ``map_batches``) instead of
shuffle-joining — the 100 TB pattern for fact⋈dim.
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def lineitem_pricing_summary(sf_dir: str):
    """TPC-H Q1-flavored aggregate (groupby shuffle with map-side combine —
    Ray Data's hash aggregate pre-combines per block)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Mean, Sum

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"])

    def derive(b: pa.Table) -> pa.Table:
        disc = pc.multiply(b["l_extendedprice"],
                           pc.subtract(pa.scalar(1.0), b["l_discount"]))
        return b.append_column("disc_price", disc)

    ds = ds.map_batches(derive, batch_format="pyarrow")
    out = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Sum("l_extendedprice", alias_name="sum_base_price"),
        Sum("disc_price", alias_name="sum_disc_price"),
        Mean("l_quantity", alias_name="avg_qty"),
        Count(alias_name="count_order"),
    )
    return out.sort(["l_returnflag", "l_linestatus"])


def top_revenue_orders(sf_dir: str, limit: int = 20):
    """Top ``limit`` orders by totalprice, customer name attached.
    Deterministic: ordered by (o_totalprice DESC, o_orderkey).

    Scale shape: block-local top-k inside ``map_batches`` (each block emits
    ≤ limit rows), tree-reduced via ``collapse_partials`` so the driver
    merge reads ≤ limit × TOPK_FANIN rows — flat in block count, no global
    sort shuffle of the fact table for a top-20. The customer name joins
    AFTER the top-k, against ``limit`` rows only."""
    import ray.data as rd
    import pyarrow.parquet as pq

    from ..stages.ann import collapse_partials

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def local_topk(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            b, sort_keys=[("o_totalprice", "descending"),
                          ("o_orderkey", "ascending")])[:limit]
        return b.take(idx)

    partials = collapse_partials(
        ds.map_batches(local_topk, batch_format="pyarrow"), local_topk)
    merged = pa.Table.from_pandas(partials.to_pandas(), preserve_index=False)
    idx = pc.sort_indices(
        merged, sort_keys=[("o_totalprice", "descending"),
                           ("o_orderkey", "ascending")])[:limit]
    top = merged.take(idx)

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name"],
                         filters=[("c_custkey", "in",
                                   top["o_custkey"].to_pylist())])
    pos = pc.index_in(top["o_custkey"], value_set=cust["c_custkey"].combine_chunks())
    top = top.append_column("c_name", pc.take(cust["c_name"].combine_chunks(), pos))
    return top.select(["o_orderkey", "o_custkey", "c_name", "o_totalprice"])


def events_user_hourly(sf_dir: str):
    """Windowed aggregate: events bucketed to the hour per user."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])

    def bucket(b: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(b["ts"], unit="hour")
        return b.append_column("hour", hour)

    ds = ds.map_batches(bucket, batch_format="pyarrow")
    out = ds.groupby(["user_id", "hour"]).aggregate(
        Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    return out.sort(["user_id", "hour"])


def order_lineitem_revenue(sf_dir: str):
    """Big-big hash join (lineitem ⋈ orders on orderkey, Ray Data
    hash-shuffle join) → revenue per order priority."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum
    from ..stages.join import hash_join

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])
    joined = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey")
    out = joined.groupby("o_orderpriority").aggregate(
        Count(alias_name="n_items"),
        Sum("l_extendedprice", alias_name="sum_price"))
    return out.sort("o_orderpriority")


def events_asof_orders(sf_dir: str):
    """As-of join: each event matched to the customer's latest order at or
    before the event time (right side pre-reduced to one deterministic row
    per (customer, date): max orderkey)."""
    import ray.data as rd
    from ray.data.aggregate import Max
    from ..stages.join import asof_join

    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "user_id", "ts"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate", "o_orderkey"])
    last = orders.groupby(["o_custkey", "o_orderdate"]).aggregate(
        Max("o_orderkey", alias_name="last_orderkey"))
    return asof_join(events, last, key="user_id", right_key="o_custkey",
                     on="ts", right_on="o_orderdate",
                     value_cols=["last_orderkey"])


def events_sessionize(sf_dir: str, gap_minutes: int = 30,
                      n_parts: int = 64):
    """Gap-based sessionization: per user, a new session starts when the
    gap to the previous event exceeds ``gap_minutes``.

    Scale shape: ONE coarse hash shuffle on user_id, then each partition
    sessionizes ALL its users in one vectorized pass (sort + per-user
    boundary reset + cumsum + segment reduce) — never one dispatch per
    user (the `_coarse_groupby` lesson: per-tiny-group dispatch costs
    more than the work; this was the last per-key `map_groups` on a
    million-key space)."""
    import numpy as np
    import ray.data as rd
    from ..stages.select import _hash_part_of

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    # gap threshold in the COLUMN'S OWN timestamp unit (review-found:
    # hard-coded µs silently broke [s]/[ns] inputs)
    ts_type = dict(zip(ds.schema().names, ds.schema().types))["ts"]
    _PER_MIN = {"s": 60, "ms": 60_000, "us": 60_000_000,
                "ns": 60_000_000_000}
    gap_ticks = np.int64(gap_minutes) * _PER_MIN[ts_type.unit]

    def add_part(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_part", pa.array(_hash_part_of(b["user_id"], n_parts)))

    def per_part(g: pa.Table) -> pa.Table:
        if "_part" in g.column_names:
            g = g.drop_columns(["_part"])
        if g.num_rows == 0:
            return pa.table({
                "user_id": pa.array([], type=pa.int64()),
                "session_id": pa.array([], type=pa.int64()),
                "n_events": pa.array([], type=pa.int64()),
                "session_start": pa.array([], type=ts_type),
                "session_end": pa.array([], type=ts_type)})
        idx = pc.sort_indices(g, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")])
        g = g.take(idx)
        u = g["user_id"].to_numpy(zero_copy_only=False)
        ts = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        n = len(u)
        user_start = np.r_[True, u[1:] != u[:-1]]
        gap_break = np.r_[True, (ts[1:] - ts[:-1]) > gap_ticks]
        new_s = user_start | gap_break
        # session_id restarts at 1 per user: global cumsum minus the
        # cumsum value at each user's first row (+1)
        gs = np.cumsum(new_s)
        base = np.repeat(gs[user_start] - 1,
                         np.diff(np.r_[np.flatnonzero(user_start), n]))
        sid = gs - base
        starts = np.flatnonzero(new_s)
        bounds = np.r_[starts, n]
        return pa.table({
            "user_id": pc.take(g["user_id"], pa.array(starts)),
            "session_id": pa.array(sid[starts], type=pa.int64()),
            "n_events": pa.array((bounds[1:] - bounds[:-1])
                                 .astype(np.int64)),
            "session_start": pc.take(g["ts"], pa.array(starts)),
            "session_end": pc.take(g["ts"], pa.array(bounds[1:] - 1)),
        })

    return ds.map_batches(add_part, batch_format="pyarrow") \
        .groupby("_part").map_groups(per_part, batch_format="pyarrow") \
        .sort(["user_id", "session_id"])


def revenue_by_nation(sf_dir: str):
    """Multi-join composite: lineitem ⋈ orders ⋈ customer ⋈ nation →
    revenue per nation (TPC-H Q5 flavor).

    Scale shape, stage by stage: (1) lineitem pre-aggregates to
    (orderkey, revenue, n_items) PARTIALS inside ``map_batches`` — the
    big-big join's left side shrinks ~4× before any shuffle; (2) the only
    all-to-all is the hash join on orderkey; (3) customer and nation attach
    via broadcast ``pc.index_in`` probes (dim joins never shuffle);
    (4) the final groupby moves one partial row per nation per block."""
    import ray.data as rd
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum
    from ..stages.join import broadcast_lookup, hash_join

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount"])

    def pre_agg(b: pa.Table) -> pa.Table:
        rev = pc.multiply(b["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), b["l_discount"]))
        t = pa.table({"l_orderkey": b["l_orderkey"], "rev": rev})
        g = pa.TableGroupBy(t, "l_orderkey").aggregate(
            [("rev", "sum"), ("rev", "count")])
        return pa.table({"l_orderkey": g["l_orderkey"],
                         "rev": g["rev_sum"],
                         "n": pc.cast(g["rev_count"], pa.int64())})

    li = li.map_batches(pre_agg, batch_format="pyarrow")
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    joined = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey")

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    joined = broadcast_lookup(joined, cust, key="o_custkey",
                              small_key="c_custkey",
                              value_cols=["c_nationkey"])
    joined = broadcast_lookup(joined, nat, key="c_nationkey",
                              small_key="n_nationkey", value_cols=["n_name"])
    out = joined.groupby("n_name").aggregate(
        Sum("rev", alias_name="revenue"), Sum("n", alias_name="n_items"))
    return out.sort("n_name")


def customer_returns_topk(sf_dir: str, limit: int = 20):
    """TPC-H Q10 flavor: top customers by RETURNED-item revenue —
    lineitem(R) ⋈ orders ⋈ customer ⋈ nation, deci-milli-cents-exact.

    Scale shape: (1) the returnflag filter + per-orderkey integer partial
    aggregation run INSIDE the lineitem scan (the big side shrinks before
    any shuffle and revenue is int64 dm — no float reduce drift);
    (2) the only all-to-all is the orderkey hash join; (3) per-customer
    revenue is a combiner groupby of int partials; (4) customer/nation
    attach via broadcast probes AFTER aggregation (dim joins touch
    customer-count rows, not lineitems); (5) top-k is block-local → tiny
    driver merge, never a global sort."""
    import ray.data as rd
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum
    from ..stages.join import broadcast_lookup, hash_join

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount", "l_returnflag"])

    def pre_agg(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["l_returnflag"], "R"))
        dm = pc.cast(pc.round(
            pc.multiply(pc.multiply(b["l_extendedprice"],
                                    pc.subtract(pa.scalar(1.0),
                                                b["l_discount"])),
                        pa.scalar(10000.0)),
            round_mode="half_towards_infinity"), pa.int64())
        t = pa.table({"l_orderkey": b["l_orderkey"], "rev_dm": dm})
        g = pa.TableGroupBy(t, "l_orderkey").aggregate([("rev_dm", "sum")])
        return pa.table({"l_orderkey": g["l_orderkey"],
                         "rev_dm": g["rev_dm_sum"]})

    li = li.map_batches(pre_agg, batch_format="pyarrow")
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    joined = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey")
    per_cust = joined.groupby("o_custkey").aggregate(
        Sum("rev_dm", alias_name="rev_dm"))

    def local_topk(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(b, sort_keys=[
            ("rev_dm", "descending"), ("o_custkey", "ascending")])[:limit]
        return b.take(idx)

    partials = [t for t in per_cust.map_batches(
        local_topk, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow") if t.num_rows > 0]
    if not partials:
        partials = [pa.table({"o_custkey": pa.array([], type=pa.int64()),
                              "rev_dm": pa.array([], type=pa.int64())})]
    merged = pa.concat_tables(partials).combine_chunks()
    idx = pc.sort_indices(merged, sort_keys=[
        ("rev_dm", "descending"), ("o_custkey", "ascending")])[:limit]
    top = merged.take(idx)

    # dim reads are key-filtered at the parquet layer: only the ≤ limit
    # matching customer row-groups reach the driver, not the table
    keys = top["o_custkey"].to_pylist()
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name", "c_nationkey"],
                         filters=[("c_custkey", "in", keys)])
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    pos = pc.index_in(top["o_custkey"],
                      value_set=cust["c_custkey"].combine_chunks())
    top = top.append_column(
        "c_name", pc.take(cust["c_name"].combine_chunks(), pos))
    nk = pc.take(cust["c_nationkey"].combine_chunks(), pos)
    npos = pc.index_in(nk, value_set=nat["n_nationkey"].combine_chunks())
    top = top.append_column(
        "n_name", pc.take(nat["n_name"].combine_chunks(), npos))
    return top.select(["o_custkey", "c_name", "n_name", "rev_dm"])


def events_window_funcs(sf_dir: str, n_parts: int = 64):
    """Per-key ordered window functions over the events stream: running
    sum, row_number and lag-gap per user — SQL
    ``OVER (PARTITION BY user_id ORDER BY ts, event_id)`` semantics.

    Money values are cents-scaled to int64 FIRST (SQL ``round()`` ties
    away from zero), so the running sum is integer arithmetic — exact and
    order-independent across engines, no FP accumulation drift.

    Scale shape: one shuffle of the event rows into coarse hash partitions
    of user_id (users co-located, never dispatched one group at a time),
    then a single vectorized sort + segmented scan per partition:
    ``pc.sort_indices`` (C sort), numpy segmented cumsum / arange / diff.
    Partitioning assumption: one partition's rows fit in a worker task —
    the same contract as every co-partitioned group op here."""
    import numpy as np
    import ray.data as rd
    from ..stages.select import _hash_part_of

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])

    def add_cents_part(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(b["value"], pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        b = b.drop_columns(["value"]).append_column("value_c", cents)
        return b.append_column(
            "_part", pa.array(_hash_part_of(b["user_id"], n_parts)))

    def per_part(g: pa.Table) -> pa.Table:
        if "_part" in g.column_names:
            g = g.drop_columns(["_part"])
        idx = pc.sort_indices(g, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")])
        g = g.take(idx)
        n = g.num_rows
        if n == 0:
            return pa.table({
                "event_id": pa.array([], type=pa.int64()),
                "user_id": pa.array([], type=pa.int64()),
                "ts": pa.array([], type=pa.timestamp("us")),
                "value_c": pa.array([], type=pa.int64()),
                "running_sum_c": pa.array([], type=pa.int64()),
                "row_num": pa.array([], type=pa.int64()),
                "gap_us": pa.array([], type=pa.int64())})
        u = g["user_id"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        lens = np.diff(np.r_[starts, n])
        c = g["value_c"].to_numpy(zero_copy_only=False)
        cum = np.cumsum(c)
        base = np.repeat(cum[starts] - c[starts], lens)
        row_num = np.arange(n, dtype=np.int64) - np.repeat(starts, lens) + 1
        ts_us = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        gap = np.empty(n, dtype=np.int64)
        gap[1:] = ts_us[1:] - ts_us[:-1]
        gap[0] = 0
        first = np.zeros(n, dtype=bool)
        first[starts] = True  # lag(ts) is NULL on each user's first row
        return pa.table({
            "event_id": g["event_id"],
            "user_id": g["user_id"],
            "ts": g["ts"],
            "value_c": g["value_c"],
            "running_sum_c": pa.array(cum - base, type=pa.int64()),
            "row_num": pa.array(row_num, type=pa.int64()),
            "gap_us": pa.array(gap, type=pa.int64(), mask=first)})

    return ds.map_batches(add_cents_part, batch_format="pyarrow") \
        .groupby("_part").map_groups(per_part, batch_format="pyarrow")


def events_rolling(sf_dir: str, window: int = 5, n_parts: int = 64):
    """Fixed-size ROLLING window aggregate per key — SQL ``ROWS BETWEEN
    k-1 PRECEDING AND CURRENT ROW`` over (user_id, ts, event_id): rolling
    sum, rolling count and rolling mean of the cents-scaled value.

    Same scale shape as :func:`events_window_funcs` (one coarse hash
    shuffle on user_id, vectorized sort + segmented scan per partition);
    the rolling sum is ``cum[i] − cum[max(i−k, group_start−1)]`` — pure
    int64 prefix-sum arithmetic, exact in any engine; the mean is ONE
    float division of two exact ints (bit-equal to SQL)."""
    import numpy as np
    import ray.data as rd
    from ..stages.select import _hash_part_of

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])

    def add_cents_part(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(b["value"], pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        b = b.drop_columns(["value"]).append_column("value_c", cents)
        return b.append_column(
            "_part", pa.array(_hash_part_of(b["user_id"], n_parts)))

    def per_part(g: pa.Table) -> pa.Table:
        if "_part" in g.column_names:
            g = g.drop_columns(["_part"])
        idx = pc.sort_indices(g, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")])
        g = g.take(idx)
        n = g.num_rows
        if n == 0:
            return pa.table({
                "event_id": pa.array([], type=pa.int64()),
                "user_id": pa.array([], type=pa.int64()),
                "roll_sum_c": pa.array([], type=pa.int64()),
                "roll_n": pa.array([], type=pa.int64()),
                "roll_mean_c": pa.array([], type=pa.float64())})
        u = g["user_id"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        lens = np.diff(np.r_[starts, n])
        c = g["value_c"].to_numpy(zero_copy_only=False)
        cum0 = np.r_[0, np.cumsum(c)]          # cum0[j+1] = Σ c[:j+1]
        start_rep = np.repeat(starts, lens)
        i = np.arange(n, dtype=np.int64)
        base = np.maximum(i - window, start_rep - 1)  # exclusive-left idx
        roll_sum = cum0[i + 1] - cum0[base + 1]
        roll_n = np.minimum(i - start_rep + 1, window)
        mean = roll_sum.astype(np.float64) / roll_n.astype(np.float64)
        return pa.table({
            "event_id": g["event_id"],
            "user_id": g["user_id"],
            "roll_sum_c": pa.array(roll_sum, type=pa.int64()),
            "roll_n": pa.array(roll_n, type=pa.int64()),
            "roll_mean_c": pa.array(mean, type=pa.float64())})

    return ds.map_batches(add_cents_part, batch_format="pyarrow") \
        .groupby("_part").map_groups(per_part, batch_format="pyarrow")


def shipping_priority_topk(sf_dir: str, segment: str = "BUILDING",
                           cutoff: str = "1998-06-01", limit: int = 10):
    """TPC-H Q3 flavor: top unshipped-revenue orders for one market
    segment — customer(segment) ⋉ orders(< cutoff) ⋈ lineitem(> cutoff).

    Scale shape: (1) the segment's custkeys broadcast as a semi-join key
    set (dim side never shuffles); (2) orders filter on date + segment
    membership in one streaming pass; (3) lineitem filters on shipdate
    and pre-aggregates int revenue per orderkey INSIDE the scan; (4) the
    only all-to-all is the orderkey hash join; (5) top-k is block-local →
    tiny driver merge (no global sort)."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data.aggregate import Sum
    from ..stages.join import broadcast_semi_join, hash_join

    cut = np.datetime64(cutoff).astype("datetime64[us]")

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    keys = cust.filter(pc.equal(cust["c_mktsegment"],
                                segment))["c_custkey"].to_pylist()

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate", "o_orderpriority"])

    def ofilter(b: pa.Table) -> pa.Table:
        return b.filter(pc.less(b["o_orderdate"],
                                pa.scalar(cut, pa.timestamp("us"))))

    orders = broadcast_semi_join(orders.map_batches(
        ofilter, batch_format="pyarrow"), keys, "o_custkey")

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount", "l_shipdate"])

    def pre_agg(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater(b["l_shipdate"],
                                pa.scalar(cut, pa.timestamp("us"))))
        dm = pc.cast(pc.round(
            pc.multiply(pc.multiply(b["l_extendedprice"],
                                    pc.subtract(pa.scalar(1.0),
                                                b["l_discount"])),
                        pa.scalar(10000.0)),
            round_mode="half_towards_infinity"), pa.int64())
        t = pa.table({"l_orderkey": b["l_orderkey"], "rev_dm": dm})
        g = pa.TableGroupBy(t, "l_orderkey").aggregate([("rev_dm", "sum")])
        return pa.table({"l_orderkey": g["l_orderkey"],
                         "rev_dm": g["rev_dm_sum"]})

    li = li.map_batches(pre_agg, batch_format="pyarrow")
    joined = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey")
    per_order = joined.groupby(
        ["l_orderkey", "o_orderdate", "o_orderpriority"]).aggregate(
            Sum("rev_dm", alias_name="rev_dm"))

    def local_topk(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(b, sort_keys=[
            ("rev_dm", "descending"), ("o_orderdate", "ascending"),
            ("l_orderkey", "ascending")])[:limit]
        return b.take(idx)

    parts = [t for t in per_order.map_batches(
        local_topk, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow") if t.num_rows > 0]
    if not parts:
        return pa.table({
            "l_orderkey": pa.array([], type=pa.int64()),
            "o_orderdate": pa.array([], type=pa.timestamp("us")),
            "o_orderpriority": pa.array([], type=pa.string()),
            "rev_dm": pa.array([], type=pa.int64())})
    merged = pa.concat_tables(parts).combine_chunks()
    idx = pc.sort_indices(merged, sort_keys=[
        ("rev_dm", "descending"), ("o_orderdate", "ascending"),
        ("l_orderkey", "ascending")])[:limit]
    return merged.take(idx).select(
        ["l_orderkey", "o_orderdate", "o_orderpriority", "rev_dm"])


def forecast_revenue_delta(sf_dir: str):
    """TPC-H Q6 flavor: potential revenue delta from discounted small
    orders — ONE streaming scan with predicate + int-exact aggregate, no
    shuffle at all (the all-map baseline every engine should ace):
    sum(extendedprice·discount) over 1996 shipments with discount in
    [0.02, 0.04] and quantity < 25, deci-milli-cent exact."""
    import numpy as np
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_quantity", "l_extendedprice",
                                  "l_discount", "l_shipdate"])
    lo = np.datetime64("1996-01-01").astype("datetime64[us]")
    hi = np.datetime64("1997-01-01").astype("datetime64[us]")

    def fold(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(pc.greater_equal(b["l_shipdate"],
                                     pa.scalar(lo, pa.timestamp("us"))),
                    pc.less(b["l_shipdate"],
                            pa.scalar(hi, pa.timestamp("us")))),
            pc.and_(pc.and_(pc.greater_equal(b["l_discount"], 0.02),
                            pc.less_equal(b["l_discount"], 0.04)),
                    pc.less(b["l_quantity"], 25)))
        b = b.filter(keep)
        dm = pc.cast(pc.round(
            pc.multiply(pc.multiply(b["l_extendedprice"], b["l_discount"]),
                        pa.scalar(10000.0)),
            round_mode="half_towards_infinity"), pa.int64())
        tot = pc.sum(dm).as_py() or 0
        return pa.table({"rev_dm": pa.array([tot], type=pa.int64()),
                         "n": pa.array([b.num_rows], type=pa.int64())})

    rev, n = 0, 0
    for r in ds.map_batches(fold, batch_format="pyarrow").take_all():
        rev += int(r["rev_dm"])
        n += int(r["n"])
    return pa.table({"rev_dm": pa.array([rev], type=pa.int64()),
                     "n_items": pa.array([n], type=pa.int64())})


def priority_order_counts(sf_dir: str, grace_days: int = 60):
    """TPC-H Q4 flavor: orders with at least one LATE lineitem
    (shipdate > orderdate + grace), counted per priority — the
    EXISTS-semi-join aggregate shape.

    Scale shape: lineitem pre-reduces to DISTINCT (orderkey, max
    shipdate) partials inside the scan (per-block max + combiner
    groupby), the qualifying test is one vectorized timestamp compare
    after the orderkey hash join, and the count moves per-priority
    partials only. No EXISTS probe per row — the max-shipdate reduction
    IS the exists witness."""
    import numpy as np
    import ray.data as rd
    from ray.data.aggregate import Count, Max
    from ..stages.join import hash_join

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])

    def partial_max(b: pa.Table) -> pa.Table:
        t = pa.table({"l_orderkey": b["l_orderkey"],
                      "ship_us": pc.cast(b["l_shipdate"], pa.int64())})
        g = pa.TableGroupBy(t, "l_orderkey").aggregate([("ship_us", "max")])
        return pa.table({"l_orderkey": g["l_orderkey"],
                         "max_ship_us": g["ship_us_max"]})

    last_ship = li.map_batches(partial_max, batch_format="pyarrow") \
        .groupby("l_orderkey").aggregate(
            Max("max_ship_us", alias_name="max_ship_us"))

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate",
                                      "o_orderpriority"])
    joined = hash_join(last_ship, orders, on="l_orderkey",
                       right_on="o_orderkey")
    grace_us = np.int64(grace_days) * 86_400_000_000

    def qualify(b: pa.Table) -> pa.Table:
        odate = pc.cast(b["o_orderdate"], pa.int64())
        late = pc.greater(b["max_ship_us"], pc.add(odate, grace_us))
        return b.filter(late).select(["o_orderpriority"])

    return joined.map_batches(qualify, batch_format="pyarrow") \
        .groupby("o_orderpriority").aggregate(Count(alias_name="n_orders"))


def late_shipment_stats(sf_dir: str, grace_days: int = 30):
    """TPC-H Q12 flavor: late-shipment classification per order priority
    — lineitem ⋈ orders with a per-row date-interval predicate
    (shipdate > orderdate + grace), counted per priority.

    Scale shape: the orderkey hash join is the one all-to-all; the
    classification is a vectorized int64 timestamp comparison per batch;
    the groupby moves one (priority, late, total) partial per block."""
    import numpy as np
    import ray.data as rd
    from ray.data.aggregate import Sum
    from ..stages.join import hash_join

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate",
                                      "o_orderpriority"])
    joined = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey")
    grace_us = np.int64(grace_days) * 86_400_000_000

    def partial(b: pa.Table) -> pa.Table:
        ship = pc.cast(b["l_shipdate"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        odate = pc.cast(b["o_orderdate"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        late = (ship > odate + grace_us).astype(np.int64)
        t = pa.table({"o_orderpriority": b["o_orderpriority"],
                      "late": pa.array(late),
                      "total": pa.array(np.ones(b.num_rows,
                                                dtype=np.int64))})
        g = pa.TableGroupBy(t, "o_orderpriority").aggregate(
            [("late", "sum"), ("total", "sum")])
        return pa.table({"o_orderpriority": g["o_orderpriority"],
                         "late": pc.cast(g["late_sum"], pa.int64()),
                         "total": pc.cast(g["total_sum"], pa.int64())})

    return joined.map_batches(partial, batch_format="pyarrow") \
        .groupby("o_orderpriority").aggregate(
            Sum("late", alias_name="late"),
            Sum("total", alias_name="total"))


def event_transitions(sf_dir: str, n_parts: int = 64):
    """Event-type transition counts (the Markov/path-analysis pass):
    for each user's (ts, event_id)-ordered stream, count every adjacent
    (from_type → to_type) pair → (from_type, to_type, n).

    Scale shape: ONE coarse hash shuffle on user_id, per-partition
    vectorized sort + adjacent-pair mask (users never split, so per-
    partition pairs are globally exact), per-partition pair-count
    partials (dictionary-encode both sides, one bincount), then a tiny
    combiner groupby over (from_type, to_type) partials."""
    import numpy as np
    import ray.data as rd
    from ray.data.aggregate import Sum
    from ..stages.select import _hash_part_of

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts",
                                  "event_type"])

    def add_part(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_part", pa.array(_hash_part_of(b["user_id"], n_parts)))

    def per_part(g: pa.Table) -> pa.Table:
        empty = pa.table({"from_type": pa.array([], type=pa.string()),
                          "to_type": pa.array([], type=pa.string()),
                          "n": pa.array([], type=pa.int64())})
        if g.num_rows < 2:
            return empty
        g = g.drop_columns(["_part"])
        idx = pc.sort_indices(g, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")])
        g = g.take(idx)
        u = g["user_id"].to_numpy(zero_copy_only=False)
        same = u[1:] == u[:-1]
        if not same.any():
            return empty
        et = g["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = len(et.dictionary)
        pair = codes[:-1][same] * v + codes[1:][same]
        upair, cnt = np.unique(pair, return_counts=True)
        return pa.table({
            "from_type": pc.take(et.dictionary, pa.array(upair // v)),
            "to_type": pc.take(et.dictionary, pa.array(upair % v)),
            "n": pa.array(cnt.astype(np.int64))})

    return ds.map_batches(add_part, batch_format="pyarrow") \
        .groupby("_part").map_groups(per_part, batch_format="pyarrow") \
        .groupby(["from_type", "to_type"]).aggregate(
            Sum("n", alias_name="n"))


def customers_per_nation(sf_dir: str):
    """customer ⋈ nation (vectorized broadcast dim join) → count per nation
    name. The hot path is ``pc.index_in`` + ``take`` per batch (see
    ``stages.join.broadcast_lookup``), never a per-row dict probe."""
    import ray.data as rd
    import pyarrow.parquet as pq
    from ray.data.aggregate import Count
    from ..stages.join import broadcast_lookup

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    ds = rd.read_parquet(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    ds = broadcast_lookup(ds, nat, key="c_nationkey", small_key="n_nationkey",
                          value_cols=["n_name"])
    return ds.groupby("n_name").aggregate(Count(alias_name="n_customers")) \
             .sort("n_name")


def customer_order_distribution(sf_dir: str):
    """TPC-H Q13 flavor: the distribution of per-customer order counts,
    INCLUDING zero-order customers — without the customer⋈orders outer
    join. Orders fold to (custkey, n) partials per block (dictionary-
    encode + bincount), one customer-keyed groupby sums them, a second
    partial fold builds counts-of-counts, and the zero bucket is exact
    arithmetic: total customers (metadata count) minus distinct buyers
    (= Σ custdist). The all-to-all moves one row per distinct custkey
    per block — never an order row, never a customer row. Assumes
    orders.o_custkey ⊆ customer.c_custkey (the TPC-H FK)."""
    import numpy as np
    import ray.data as rd
    from ray.data.aggregate import Sum

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey"])

    def partial(b: pa.Table) -> pa.Table:
        enc = b["o_custkey"].combine_chunks().dictionary_encode()
        cnt = np.bincount(enc.indices.to_numpy(zero_copy_only=False),
                          minlength=len(enc.dictionary))
        return pa.table({"o_custkey": enc.dictionary.cast(pa.int64()),
                         "n": pa.array(cnt.astype(np.int64))})

    per_cust = orders.map_batches(partial, batch_format="pyarrow") \
        .groupby("o_custkey").aggregate(Sum("n", alias_name="c_count"))

    def dist_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"c_count": pa.array([], type=pa.int64()),
                             "custdist": pa.array([], type=pa.int64())})
        v, c = np.unique(b["c_count"].to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"c_count": pa.array(v.astype(np.int64)),
                         "custdist": pa.array(c.astype(np.int64))})

    dist = per_cust.map_batches(dist_partial, batch_format="pyarrow") \
        .groupby("c_count").aggregate(Sum("custdist", alias_name="custdist"))
    # tiny (distinct count values); driver assembles the zero bucket
    parts = [b for b in dist.iter_batches(batch_size=None,
                                          batch_format="pyarrow")
             if b.num_rows]
    tbl = pa.concat_tables(parts) if parts else pa.table(
        {"c_count": pa.array([], type=pa.int64()),
         "custdist": pa.array([], type=pa.int64())})
    n_cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey"]).count()
    zero = n_cust - int(pc.sum(tbl["custdist"]).as_py() or 0)
    if zero > 0:
        tbl = pa.concat_tables([tbl, pa.table(
            {"c_count": pa.array([0], type=pa.int64()),
             "custdist": pa.array([zero], type=pa.int64())})])
    return tbl.sort_by("c_count")


def large_volume_customers(sf_dir: str, threshold: int = 300):
    """TPC-H Q18 flavor: orders whose total lineitem quantity exceeds
    ``threshold``, with their customer. Lineitem folds to (orderkey,
    qty-sum) partials per block before the orderkey groupby (the big
    side never shuffles raw rows); the HAVING filter leaves a small
    outlier set that broadcast-semi-joins into the orders stream
    (``pc.index_in`` probe — no shuffle), and only the few qualifying
    orders hash-join against customer. l_quantity is integral-valued
    double, so per-block float sums are exact and the output is int64."""
    import numpy as np
    import ray.data as rd
    from ray.data.aggregate import Sum
    from ..stages.join import broadcast_lookup

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity"])

    def partial(b: pa.Table) -> pa.Table:
        enc = b["l_orderkey"].combine_chunks().dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        q = b["l_quantity"].to_numpy(zero_copy_only=False)
        s = np.bincount(idx, weights=q, minlength=len(enc.dictionary))
        return pa.table({"l_orderkey": enc.dictionary.cast(pa.int64()),
                         "q": pa.array(s.astype(np.int64))})

    per_order = li.map_batches(partial, batch_format="pyarrow") \
        .groupby("l_orderkey").aggregate(Sum("q", alias_name="sum_qty"))

    def having(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        return b.filter(pc.greater(b["sum_qty"], threshold))

    heavy = per_order.map_batches(having, batch_format="pyarrow")
    # HAVING survivors are outliers — bounded; collect + broadcast
    parts = [b for b in heavy.iter_batches(batch_size=None,
                                           batch_format="pyarrow")
             if b.num_rows]
    heavy_tbl = pa.concat_tables(parts) if parts else pa.table(
        {"l_orderkey": pa.array([], type=pa.int64()),
         "sum_qty": pa.array([], type=pa.int64())})

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate", "o_totalprice"])
    qualified = broadcast_lookup(orders, heavy_tbl, key="o_orderkey",
                                 small_key="l_orderkey",
                                 value_cols=["sum_qty"]) \
        .map_batches(lambda b: b.filter(pc.is_valid(b["sum_qty"])),
                     batch_format="pyarrow")
    # a shuffle join here would leave most of its partitions EMPTY on
    # the tiny qualified side (Ray's join chokes on schema-less empty
    # partitions); instead semi-probe the customer STREAM by the
    # qualified custkeys (broadcast is_in — customer rows never
    # shuffle) and attach the ≤|qualified| surviving names by a second
    # broadcast. qualified is bounded by the HAVING outliers.
    q_parts = [b for b in qualified.iter_batches(batch_size=None,
                                                 batch_format="pyarrow")
               if b.num_rows]
    if not q_parts:
        return pa.table({"c_custkey": pa.array([], type=pa.int64()),
                         "c_name": pa.array([], type=pa.string()),
                         "o_orderkey": pa.array([], type=pa.int64()),
                         "o_orderdate": pa.array(
                             [], type=pa.timestamp("us")),
                         "o_totalprice": pa.array([], type=pa.float64()),
                         "sum_qty": pa.array([], type=pa.int64())})
    q_tbl = pa.concat_tables(q_parts)
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"])
    from ..stages.join import broadcast_semi_join
    matched = broadcast_semi_join(cust, pc.unique(
        q_tbl["o_custkey"].combine_chunks()), "c_custkey")
    name_tbl = pa.concat_tables(
        [b for b in matched.iter_batches(batch_size=None,
                                         batch_format="pyarrow")
         if b.num_rows])
    out = broadcast_lookup(rd.from_arrow(q_tbl), name_tbl,
                           key="o_custkey", small_key="c_custkey",
                           value_cols=["c_name"])

    def project(b: pa.Table) -> pa.Table:
        return pa.table({"c_custkey": b["o_custkey"],
                         "c_name": b["c_name"],
                         "o_orderkey": b["o_orderkey"],
                         "o_orderdate": b["o_orderdate"],
                         "o_totalprice": b["o_totalprice"],
                         "sum_qty": b["sum_qty"]})

    return out.map_batches(project, batch_format="pyarrow")


def idle_customer_balance(sf_dir: str, cutoff: str = "2000-06-01"):
    """TPC-H Q22 flavor: per-nation count + total balance of customers
    whose balance beats the global positive-balance average AND who have
    placed no order since ``cutoff``. The global average is an EXACT
    integer rational — one streaming pass folds (Σ cents, count) over
    positive balances, the filter compares cents·C > S cross-multiplied
    (no float divide on either side) — and the recency anti join is a
    broadcast distinct-recent-buyers keyset probed with ``pc.is_in``
    (bounded by active customers in the window; the bloom path in
    ``stages/join.bloom_anti_join`` is the giant-keyset fallback).
    Output folds to one (nation, numcust, cents) partial per block."""
    import numpy as np
    import ray.data as rd
    from ray.data.aggregate import Sum
    from ..stages.agg import _sql_cents
    from ..stages.join import broadcast_semi_join

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey",
                                    "c_acctbal"])

    def scalar_partial(b: pa.Table) -> pa.Table:
        cents = _sql_cents(b["c_acctbal"]).to_numpy(zero_copy_only=False)
        pos = cents[cents > 0]
        return pa.table({"s": pa.array([int(pos.sum())], type=pa.int64()),
                         "c": pa.array([len(pos)], type=pa.int64())})

    S = C = 0
    for b in cust.map_batches(scalar_partial, batch_format="pyarrow") \
                 .iter_batches(batch_size=None, batch_format="pyarrow"):
        S += int(pc.sum(b["s"]).as_py() or 0)
        C += int(pc.sum(b["c"]).as_py() or 0)

    recent = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate"])
    cut_ts = pa.scalar(np.datetime64(cutoff, "us"),
                       type=pa.timestamp("us"))

    def key_partial(b: pa.Table) -> pa.Table:
        m = pc.greater_equal(pc.cast(b["o_orderdate"],
                                     pa.timestamp("us")), cut_ts)
        u = pc.unique(b["o_custkey"].filter(
            pc.fill_null(m, False)).combine_chunks())
        return pa.table({"k": u})

    keys = pa.concat_tables(
        [b for b in recent.map_batches(key_partial, batch_format="pyarrow")
         .iter_batches(batch_size=None, batch_format="pyarrow")
         if b.num_rows])["k"]
    keys = pc.unique(keys.combine_chunks())

    idle = broadcast_semi_join(cust, keys, "c_custkey", anti=True)

    def nation_partial(b: pa.Table) -> pa.Table:
        cents = _sql_cents(b["c_acctbal"]).to_numpy(zero_copy_only=False)
        keep = cents * C > S          # exact: |cents|·C ≪ 2^63
        nk = b["c_nationkey"].to_numpy(zero_copy_only=False)[keep]
        nk_type = b.schema.field("c_nationkey").type  # keep source dtype
        cents = cents[keep]
        if nk.size == 0:
            return pa.table({"c_nationkey": pa.array([], type=nk_type),
                             "numcust": pa.array([], type=pa.int64()),
                             "totacctbal_c": pa.array([], type=pa.int64())})
        u, inv = np.unique(nk, return_inverse=True)
        return pa.table({
            "c_nationkey": pa.array(u, type=nk_type),
            "numcust": pa.array(np.bincount(inv).astype(np.int64)),
            "totacctbal_c": pa.array(
                np.bincount(inv, weights=cents.astype(np.float64))
                .astype(np.int64)),
        })

    agg = idle.map_batches(nation_partial, batch_format="pyarrow") \
        .groupby("c_nationkey").aggregate(
            Sum("numcust", alias_name="numcust"),
            Sum("totacctbal_c", alias_name="totacctbal_c"))

    # Ray's aggregate upcasts the int32 key to int64 — restore the
    # source column dtype so the result schema matches the input's
    def recast(b: pa.Table) -> pa.Table:
        i = b.schema.get_field_index("c_nationkey")
        return b.set_column(i, pa.field("c_nationkey", pa.int32()),
                            pc.cast(b["c_nationkey"], pa.int32()))

    return agg.map_batches(recast, batch_format="pyarrow")


def min_cost_supplier(sf_dir: str):
    """TPC-H Q2 flavor (no partsupp table in this schema — lineitem is
    the part×supplier fact): per part, the supplier observed at the
    MINIMUM extended price (cents; ties → smallest suppkey), with
    supplier + nation attached. The argmin is ``topk_per_group``'s
    block-local combiner (prune to 1 row/part/block before the shuffle);
    supplier and nation are broadcast dims probed via ``pc.index_in``."""
    import ray.data as rd
    import pyarrow.parquet as pq
    from ..stages.agg import _sql_cents
    from ..stages.join import broadcast_lookup
    from ..stages.select import topk_per_group

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey",
                                  "l_extendedprice"])

    def prep(b: pa.Table) -> pa.Table:
        cents = _sql_cents(b["l_extendedprice"])
        return pa.table({"l_partkey": b["l_partkey"],
                         "l_suppkey": b["l_suppkey"],
                         "min_price_c": cents,
                         "_negp": pc.negate_checked(cents)})

    best = topk_per_group(li.map_batches(prep, batch_format="pyarrow"),
                          group_col="l_partkey", order_col="_negp", k=1,
                          id_col="l_suppkey")
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name", "s_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    best = broadcast_lookup(best, sup, key="l_suppkey",
                            small_key="s_suppkey",
                            value_cols=["s_name", "s_nationkey"])
    best = broadcast_lookup(best, nat, key="s_nationkey",
                            small_key="n_nationkey", value_cols=["n_name"])
    return best.select_columns(["l_partkey", "min_price_c", "l_suppkey",
                                "s_name", "n_name"])


def event_funnel(sf_dir: str, window_hours: int = 24,
                 steps: tuple = ("view", "click", "purchase")):
    """Ordered event funnel (the product-analytics staple): per user, the
    furthest step of ``steps`` reached where each step happens AT OR
    AFTER the previous one and within ``window_hours`` of it. EXISTS
    semantics — "is there ANY chain" — reduce to nearest-predecessor
    checks: a step-k event completes a chain iff the LATEST chain-(k−1)
    completion at or before it is within the window (the nearest
    predecessor maximizes its timestamp), so each hop is ONE
    :func:`stages.join.asof_join` (coarse key shuffle + packed
    searchsorted) instead of an inequality self-join that explodes on
    active users.

    Scale shape: three column/row-pruned parquet reads (one per step —
    predicate pushdown keeps non-step rows on disk), two asof hops, and
    a distinct-users pass; the per-stage user sets broadcast for the
    final stage attach (bounded by funnel users; swap in
    ``bloom_semi_join`` when user cardinality outgrows a broadcast).
    Returns (user_id, funnel_stage ∈ 0..len(steps)) for every user with
    ≥ 1 event of any type."""
    import numpy as np
    import ray
    import ray.data as rd
    import pyarrow.dataset as pads
    from ..stages.join import _distinct_keys, asof_join

    w_us = np.int64(window_hours) * 3_600_000_000
    path = f"{sf_dir}/events.parquet"

    def step_read(name: str):
        return rd.read_parquet(path, columns=["user_id", "ts"],
                               filter=pads.field("event_type") == name)

    def gap_filter(prev_col: str):
        def keep(b: pa.Table) -> pa.Table:
            lt = pc.cast(pc.cast(b["ts"], pa.timestamp("us")), pa.int64())
            rt = pc.cast(pc.cast(b[prev_col], pa.timestamp("us")),
                         pa.int64())
            ok = pc.and_kleene(pc.is_valid(b[prev_col]),
                               pc.less_equal(pc.subtract(lt, rt),
                                             pa.scalar(w_us)))
            return b.filter(pc.fill_null(ok, False)) \
                .select(["user_id", "ts"])
        return keep

    # hop chain: step k's qualifying events = asof(step_k, qualifying
    # step k-1) within the window; step 1 qualifies as-is
    step_user_sets = []
    qual = step_read(steps[0])
    step_user_sets.append(_distinct_keys(qual, "user_id", "user_id"))
    for s in steps[1:]:
        def cp_prev(b: pa.Table) -> pa.Table:
            return b.append_column("_prev_ts", b["ts"])
        right = qual.map_batches(cp_prev, batch_format="pyarrow")
        hop = asof_join(step_read(s), right, key="user_id",
                        right_key="user_id", on="ts", right_on="ts",
                        value_cols=["_prev_ts"])
        qual = hop.map_batches(gap_filter("_prev_ts"),
                               batch_format="pyarrow")
        step_user_sets.append(_distinct_keys(qual, "user_id", "user_id"))

    def collect_keys(d) -> pa.Array:
        parts = [b["user_id"].combine_chunks()
                 for b in d.iter_batches(batch_size=None,
                                         batch_format="pyarrow")
                 if b.num_rows]
        if not parts:
            return pa.array([], type=pa.int64())
        return pa.concat_arrays([p.combine_chunks()
                                 if isinstance(p, pa.ChunkedArray) else p
                                 for p in parts])

    refs = [ray.put(collect_keys(d)) for d in step_user_sets]
    all_users = _distinct_keys(
        rd.read_parquet(path, columns=["user_id"]), "user_id", "user_id")

    def attach_stage(b: pa.Table) -> pa.Table:
        stage = np.zeros(b.num_rows, dtype=np.int64)
        for lvl, r in enumerate(refs, start=1):
            m = pc.fill_null(pc.is_in(b["user_id"], value_set=ray.get(r)),
                             False).to_numpy(zero_copy_only=False)
            stage[m] = lvl  # sets are nested: level k ⊆ level k-1
        return pa.table({"user_id": b["user_id"],
                         "funnel_stage": pa.array(stage)})

    return all_users.map_batches(attach_stage, batch_format="pyarrow")


def nation_trade_volume(sf_dir: str):
    """TPC-H Q7 flavor: shipped revenue between every (supplier nation,
    customer nation) pair per ship year, supp ≠ cust, in exact integer
    "cent-discount" units (round(price·100)·(100 − round(disc·100)) —
    associative int64, bit-reproducible under any partitioning).

    Scale shape: (1) supplier's nation attaches to lineitem via a
    broadcast probe (supplier is the classic small dim); (2) lineitem
    pre-aggregates to (orderkey, supp_nation, year) partials inside
    map_batches BEFORE the one all-to-all — the hash join on orderkey;
    (3) customer/nation attach as broadcast probes after the join (at
    true 100 TB scale swap the customer probe for a second hash join —
    same plan as revenue_by_nation, documented there)."""
    import ray.data as rd
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum
    from ..stages.join import broadcast_lookup, hash_join

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    s_nat = dict(zip(sup["s_suppkey"].to_pylist(),
                     sup["s_nationkey"].to_pylist()))
    sup_keys = np.array(sorted(s_nat), dtype=np.int64)
    sup_nats = np.array([s_nat[k] for k in sup_keys], dtype=np.int64)

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey",
                                  "l_extendedprice", "l_discount",
                                  "l_shipdate"])

    def pre_agg(b: pa.Table) -> pa.Table:
        price_c = np.round(b["l_extendedprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        disc_c = np.round(b["l_discount"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        vol = price_c * (100 - disc_c)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        snat = sup_nats[np.searchsorted(sup_keys, sk)]
        year = pc.year(b["l_shipdate"]).to_numpy(
            zero_copy_only=False).astype(np.int64)
        t = pa.table({"l_orderkey": b["l_orderkey"],
                      "s_nat": pa.array(snat),
                      "l_year": pa.array(year),
                      "vol": pa.array(vol)})
        g = pa.TableGroupBy(t, ["l_orderkey", "s_nat", "l_year"]) \
            .aggregate([("vol", "sum")])
        return g.rename_columns(["l_orderkey", "s_nat", "l_year", "vol"])

    li = li.map_batches(pre_agg, batch_format="pyarrow")
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    joined = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey")

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    joined = broadcast_lookup(joined, cust, key="o_custkey",
                              small_key="c_custkey",
                              value_cols=["c_nationkey"])

    nat_keys = nat["n_nationkey"].to_numpy(zero_copy_only=False)
    nat_order = np.argsort(nat_keys)
    nat_keys = nat_keys[nat_order].astype(np.int64)
    nat_names = np.asarray(nat["n_name"].to_pylist(),
                           dtype=object)[nat_order]

    def name_pair(b: pa.Table) -> pa.Table:
        snat = b["s_nat"].to_numpy(zero_copy_only=False)
        cnat = b["c_nationkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = snat != cnat
        sn = nat_names[np.searchsorted(nat_keys, snat[keep])]
        cn = nat_names[np.searchsorted(nat_keys, cnat[keep])]
        return pa.table({
            "supp_nation": pa.array(sn, type=pa.string()),
            "cust_nation": pa.array(cn, type=pa.string()),
            "l_year": b["l_year"].filter(pa.array(keep)),
            "vol": b["vol"].filter(pa.array(keep)),
        })

    out = joined.map_batches(name_pair, batch_format="pyarrow") \
        .groupby(["supp_nation", "cust_nation", "l_year"]) \
        .aggregate(Sum("vol", alias_name="revenue_c2"))
    return out.sort(["supp_nation", "cust_nation", "l_year"])
