"""Data-profiling card: the one-row quality summary a pipeline operator
checks before training on a corpus — row/source counts, exact size
moments, exact length quantiles, exact duplicate count.

Scale shape (three bounded passes, nothing driver-heavy):
  1. one streaming fold for count / int-exact sum / max plus per-block
     DISTINCT source partials (distinct-of-distinct via a combiner
     groupby — raw rows never shuffle for the cardinality);
  2. the exact-quantile histogram refinement on the single staged
     n_chars column (`select.quantile_exact` — no sort);
  3. per-block distinct content digests → combiner groupby for the
     exact duplicate count (digests shuffle, texts do not).
All outputs are int64 (value-hash stable vs the DuckDB oracle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def profile_documents(sf_dir: str, qs=(0.5, 0.95)) -> pa.Table:
    import ray.data as rd
    from ray.data.aggregate import Count

    from ..stages.select import quantile_exact
    from ..stages.text import md5_digest

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "source", "n_chars"])

    def fold(b: pa.Table) -> pa.Table:
        n = b.num_rows
        s = int(pc.sum(b["n_chars"]).as_py() or 0)
        mx = pc.max(b["n_chars"]).as_py()
        return pa.table({
            "n": pa.array([n], type=pa.int64()),
            "sum_c": pa.array([s], type=pa.int64()),
            "max_c": pa.array([mx if mx is not None else None],
                              type=pa.int64())})

    n_rows, sum_chars, max_chars = 0, 0, None
    for r in ds.map_batches(fold, batch_format="pyarrow").take_all():
        n_rows += int(r["n"])
        sum_chars += int(r["sum_c"])
        if r["max_c"] is not None:
            max_chars = r["max_c"] if max_chars is None \
                else max(max_chars, r["max_c"])

    def block_sources(b: pa.Table) -> pa.Table:
        u = b["source"].combine_chunks().unique() \
            if isinstance(b["source"], pa.ChunkedArray) \
            else b["source"].unique()
        return pa.table({"source": u})

    n_sources = ds.select_columns(["source"]) \
        .map_batches(block_sources, batch_format="pyarrow") \
        .groupby("source").aggregate(Count(alias_name="_n")).count()

    def block_digests(b: pa.Table) -> pa.Table:
        d = md5_digest(b)["digest"]
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        return pa.table({"digest": d.unique()})

    n_distinct_texts = ds.select_columns(["text"]) \
        .map_batches(block_digests, batch_format="pyarrow") \
        .groupby("digest").aggregate(Count(alias_name="_n")).count()

    qt = quantile_exact(ds, "n_chars", list(qs))
    qvals = [None if v is None else int(v)
             for v in qt["value"].to_pylist()]

    cols = {
        "n_rows": pa.array([n_rows], type=pa.int64()),
        "n_sources": pa.array([n_sources], type=pa.int64()),
        "sum_chars": pa.array([sum_chars], type=pa.int64()),
        "max_chars": pa.array([max_chars], type=pa.int64()),
    }
    for q, v in zip(qs, qvals):
        cols[f"p{int(round(q * 100)):02d}_chars"] = pa.array(
            [v], type=pa.int64())
    cols["n_dup_texts"] = pa.array([n_rows - n_distinct_texts],
                                   type=pa.int64())
    return pa.table(cols)


def audit_referential(sf_dir: str) -> pa.Table:
    """Referential-integrity audit across the relational schema — the
    data-quality gate a pipeline runs before joining at scale: counts of
    orphan rows per foreign-key relationship, one int64 row.

    Each check is the bloom-split exact anti join (`join.bloom_anti_join`)
    — bloom-negative fact rows stream straight to the count (no shuffle
    for the bulk), only the maybe-set verifies exactly. The audit never
    materializes data: three bounded anti-join counts."""
    import ray.data as rd

    from ..stages.join import bloom_anti_join

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey"])
    orders_k = rd.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_orderkey"])
    orphan_li = bloom_anti_join(li, orders_k, "l_orderkey",
                                "o_orderkey").count()

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey"])
    cust_k = rd.read_parquet(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey"])
    orphan_orders = bloom_anti_join(orders, cust_k, "o_custkey",
                                    "c_custkey").count()

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_nationkey"])
    nat_k = rd.read_parquet(f"{sf_dir}/nation.parquet",
                            columns=["n_nationkey"])
    orphan_cust = bloom_anti_join(cust, nat_k, "c_nationkey",
                                  "n_nationkey").count()

    return pa.table({
        "orphan_lineitems": pa.array([orphan_li], type=pa.int64()),
        "orphan_orders": pa.array([orphan_orders], type=pa.int64()),
        "orphan_customers": pa.array([orphan_cust], type=pa.int64()),
    })
