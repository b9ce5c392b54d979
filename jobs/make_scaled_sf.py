#!/usr/bin/env python
"""Deterministic scale-up of a driver testdata dir by integer replication.

    python jobs/make_scaled_sf.py [src=/root/testdata/sf0.1] [dst=/tmp/sf1.0] [factor=10]

Each replica k shifts every key column by k × (max_key + 1), so foreign
keys stay consistent within a replica and replicas are disjoint (the
co-order graph becomes `factor` disjoint copies — exercising the >5M-edge
join plans the sandbox scales can't reach). Document text gets a replica
suffix so cross-replica rows are not byte-identical (dedup workloads keep
their intra-replica duplicate rate instead of inheriting a degenerate
10×-exact-dup corpus). No randomness — same input ⇒ same output bytes.

Scratch output only (defaults under /tmp); never writes to /root/testdata.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# key columns to shift per table (FK-consistent within a replica)
SHIFT = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
}
COPY_ONLY = ["region", "nation"]
# key spaces shared across tables must shift by the SAME stride.
# events.user_id joins o_custkey/c_custkey in the driver workloads
# (events_asof_orders, orders_bloom_anti_events), so it shares the
# custkey stride — its own max (1/10 of custkey's) would land replica-k
# events inside replica-0's custkey range and silently cross-match.
STRIDE_GROUP = {
    "o_custkey": "c_custkey",
    "l_orderkey": "o_orderkey",
    "l_partkey": "p_partkey",
    "l_suppkey": "s_suppkey",
    "user_id": "c_custkey",
}


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1.0"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)

    # strides from the base tables that OWN each key space
    strides: dict[str, int] = {}
    for table, keys in SHIFT.items():
        t = pq.read_table(os.path.join(src, f"{table}.parquet"))
        for kcol in keys:
            owner = STRIDE_GROUP.get(kcol, kcol)
            if owner == kcol:
                strides[kcol] = int(pc.max(t[kcol]).as_py()) + 1

    for table in COPY_ONLY:
        t = pq.read_table(os.path.join(src, f"{table}.parquet"))
        pq.write_table(t, os.path.join(dst, f"{table}.parquet"))
        print(f"{table}: copied {t.num_rows}")

    for table, keys in SHIFT.items():
        t = pq.read_table(os.path.join(src, f"{table}.parquet"))
        reps = []
        for k in range(factor):
            r = t
            for kcol in keys:
                stride = strides[STRIDE_GROUP.get(kcol, kcol)]
                typ = r.schema.field(kcol).type
                shifted = pc.add(r[kcol], pa.scalar(k * stride, type=typ))
                r = r.set_column(r.schema.get_field_index(kcol), kcol,
                                 pc.cast(shifted, typ))
            if table == "documents" and k > 0:
                # perturb text so replicas are not byte-identical docs
                r = r.set_column(
                    r.schema.get_field_index("text"), "text",
                    pc.binary_join_element_wise(r["text"], f"r{k}", " "))
            reps.append(r)
        out = pa.concat_tables(reps)
        pq.write_table(out, os.path.join(dst, f"{table}.parquet"))
        print(f"{table}: {t.num_rows} -> {out.num_rows}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
