"""Relational operator coverage over the TPC-H-ish testdata tables.

These exercise the engine's wide operators (groupby aggregate, sort+limit,
broadcast hash join, temporal window bucketing) with exact DuckDB oracles.
Small dimension tables are broadcast (`ray.put` once, vectorized
``pc.index_in`` + ``take`` probe inside ``map_batches``) instead of
shuffle-joining — the 100 TB pattern for fact⋈dim.
"""

from __future__ import annotations


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
    ≤ limit rows), then one tiny driver merge of ≤ limit × n_blocks rows —
    no global sort shuffle of the fact table for a top-20. The customer
    name joins AFTER the top-k, against ``limit`` rows only."""
    import ray.data as rd
    import pyarrow.parquet as pq

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def local_topk(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            b, sort_keys=[("o_totalprice", "descending"),
                          ("o_orderkey", "ascending")])[:limit]
        return b.take(idx)

    partials = ds.map_batches(local_topk, batch_format="pyarrow")
    merged = pa.Table.from_pandas(partials.to_pandas(), preserve_index=False)
    idx = pc.sort_indices(
        merged, sort_keys=[("o_totalprice", "descending"),
                           ("o_orderkey", "ascending")])[:limit]
    top = merged.take(idx)

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name"])
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


def events_sessionize(sf_dir: str, gap_minutes: int = 30):
    """Gap-based sessionization: per user, a new session starts when the gap
    to the previous event exceeds ``gap_minutes``. The per-key stateful pass
    runs inside ``groupby(user_id).map_groups`` — each user's history is
    co-located by the shuffle, the cumulative scan is pandas-vectorized."""
    import pandas as pd
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])

    gap = pd.Timedelta(minutes=gap_minutes)

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        new_s = (g["ts"].diff().isna() | (g["ts"].diff() > gap)).astype("int64")
        g["session_id"] = new_s.cumsum()
        out = g.groupby("session_id", sort=True).agg(
            n_events=("event_id", "size"),
            session_start=("ts", "min"),
            session_end=("ts", "max"))
        out = out.reset_index()
        out.insert(0, "user_id", g["user_id"].iloc[0])
        return out

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas") \
             .sort(["user_id", "session_id"])


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
