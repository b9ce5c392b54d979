"""Relational operator coverage over the TPC-H-ish testdata tables.

These exercise the engine's wide operators (groupby aggregate, sort+limit,
broadcast hash join, temporal window bucketing) with exact DuckDB oracles.
Small dimension tables are broadcast (`ray.put` once, dict lookup inside
``map_batches``) instead of shuffle-joining — the 100 TB pattern for
fact⋈dim.
"""

from __future__ import annotations


import pyarrow as pa
import pyarrow.compute as pc

import ray


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
    """orders ⋈ customer (broadcast dim) → top orders by totalprice.
    Deterministic: ordered by (o_totalprice DESC, o_orderkey)."""
    import ray.data as rd
    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name"])
    lookup = dict(zip(cust["c_custkey"].to_pylist(),
                      cust["c_name"].to_pylist()))
    ref = ray.put(lookup)

    class AttachName:
        def __init__(self):
            self.lookup = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            names = [self.lookup.get(k) for k in b["o_custkey"].to_pylist()]
            return b.append_column("c_name", pa.array(names, type=pa.string()))

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_custkey", "o_totalprice"])
    ds = ds.map_batches(AttachName, batch_format="pyarrow", concurrency=(1, 4))
    top = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]) \
            .limit(limit)
    return top.select_columns(["o_orderkey", "o_custkey", "c_name",
                               "o_totalprice"])


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
    """customer ⋈ nation (broadcast) → count per nation name."""
    import ray.data as rd
    import pyarrow.parquet as pq
    from ray.data.aggregate import Count

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    lookup = dict(zip(nat["n_nationkey"].to_pylist(),
                      nat["n_name"].to_pylist()))
    ref = ray.put(lookup)

    class AttachNation:
        def __init__(self):
            self.lookup = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            names = [self.lookup.get(k) for k in b["c_nationkey"].to_pylist()]
            return b.append_column("n_name", pa.array(names, type=pa.string()))

    ds = rd.read_parquet(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    ds = ds.map_batches(AttachNation, batch_format="pyarrow", concurrency=(1, 4))
    return ds.groupby("n_name").aggregate(Count(alias_name="n_customers")) \
             .sort("n_name")
