#!/usr/bin/env python
"""Generic query runner — the user-facing CLI for every pipeline the
engine exposes (a reference user's "run this query over that data" entry
point, submittable via ``ray job submit -- python jobs/run_query.py ...``).

    python jobs/run_query.py <query_name> [sf_dir] [--out DIR] [--list]

Runs ``__ray_entry__.queries()[name](sf_dir)``; prints the row count and
a preview, and with ``--out`` writes the result as parquet — Datasets
write distributed (workers write, one file per block), in-memory tables
write a single file.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("name", nargs="?", help="query name (see --list)")
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None, help="write result parquet here")
    ap.add_argument("--list", action="store_true", help="list query names")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as m
    qs = m.queries()
    if args.list or not args.name:
        oracles = m.oracle_sql()
        for n in sorted(qs):
            print(f"{n:28s} {'oracle-checked' if n in oracles else 'rows-only'}")
        return 0
    if args.name not in qs:
        print(f"unknown query {args.name!r} — try --list", file=sys.stderr)
        return 2

    t0 = time.perf_counter()
    res = qs[args.name](args.sf_dir)
    import pandas as pd
    import pyarrow as pa

    if args.out:
        if hasattr(res, "write_parquet"):          # Dataset: workers write
            res.write_parquet(args.out)
            n = "(written distributed)"
        else:
            import pyarrow.parquet as pq
            t = res if isinstance(res, pa.Table) \
                else pa.Table.from_pandas(res, preserve_index=False)
            os.makedirs(args.out, exist_ok=True)
            pq.write_table(t, os.path.join(args.out, f"{args.name}.parquet"))
            n = t.num_rows
        print(f"{args.name}: rows={n} -> {args.out} "
              f"[{time.perf_counter()-t0:.2f}s]")
    else:
        if hasattr(res, "limit") and hasattr(res, "count"):
            # Dataset: bounded driver footprint — 10 rows + a count
            head = res.limit(10).to_pandas()
            n = res.count()
        else:
            df = res.to_pandas() if hasattr(res, "to_pandas") else res
            if not isinstance(df, pd.DataFrame):
                df = df.to_pandas()
            head, n = df.head(10), len(df)
        print(head.to_string())
        print(f"{args.name}: rows={n} "
              f"[{time.perf_counter()-t0:.2f}s]")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
