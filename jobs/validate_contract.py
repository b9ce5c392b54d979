#!/usr/bin/env python
"""Standalone driver-gate replica: run every ``queries()`` entry at an sf
dir and compare SQL-expressible ones against ``oracle_sql()`` via DuckDB
(row count + column set + order-insensitive values). Prints one line per
query and a final summary; exit code 1 on any mismatch.

    python jobs/validate_contract.py [sf_dir=/root/testdata/sf0.01]
                                     [--strict] [--only=q1,q2,...]

``--strict`` additionally compares the physical pandas dtype of every
column between the engine result and the DuckDB oracle result (before
any coercion) and counts a drift as a failure even when the values
match.  The external driver's value hash IS dtype-sensitive — an
oracle ``sum()`` that comes back HUGEINT->float64 against an engine
int64 hashes differently despite equal values (the round-4 red row) —
so the default lenient compare would mask exactly the failure mode the
driver punishes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def dtype_drift(a, b):
    """Columns whose physical dtype differs between engine (a) and
    oracle (b) normalized frames."""
    drifted = []
    for c in a.columns:
        da, db = a[c].dtype, b[c].dtype
        if str(da) == str(db):
            continue
        # timestamp-RESOLUTION drift (s vs us) is tolerated by the
        # driver's hash (empirical: shipping_priority_topk carries
        # engine datetime64[s] vs oracle datetime64[us] and is
        # hash-green in CORRECTNESS_r04); numeric-kind drift is not
        if da.kind == "M" and db.kind == "M":
            continue
        drifted.append(f"{c}: engine={da} oracle={db}")
    return drifted


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    strict = "--strict" in sys.argv
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import logging
    logging.getLogger("ray.data").setLevel(logging.CRITICAL)

    import duckdb
    import pandas as pd
    import __ray_entry__ as m

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = m.queries(), m.oracle_sql()
    if only is not None:
        unknown = sorted(only - set(qs))
        if unknown:
            # a typo'd --only would otherwise run ZERO queries and exit 0
            # with a green-looking summary (round-5 review finding)
            print(f"--only names not in the registry: {', '.join(unknown)}",
                  file=sys.stderr)
            return 2
    failures = []
    n_run = 0
    for name in sorted(qs):
        if only is not None and name not in only:
            continue
        n_run += 1
        t0 = time.perf_counter()
        try:
            res = qs[name](sf_dir)
            df = res.to_pandas() if hasattr(res, "to_pandas") else res
            if name in oracles:
                exp = con.sql(oracles[name]).df()
                a, b = norm(df), norm(exp)
                assert list(a.columns) == list(b.columns), \
                    f"columns {list(a.columns)} != {list(b.columns)}"
                assert len(a) == len(b), f"rows {len(a)} != {len(b)}"
                drift = dtype_drift(a, b) if strict else []
                for c in a.columns:
                    if str(a[c].dtype) != str(b[c].dtype):
                        try:
                            b[c] = b[c].astype(a[c].dtype)
                        except (TypeError, ValueError):
                            pass
                pd.testing.assert_frame_equal(a, b, check_dtype=False)
                if drift:
                    raise AssertionError("dtype drift: " + "; ".join(drift))
                status = f"ORACLE-OK ({len(a)} rows)"
            else:
                assert len(df) > 0, "empty result"
                status = f"rows-only ({len(df)} rows)"
        except Exception as e:  # noqa: BLE001 — report and continue
            status = f"FAIL: {type(e).__name__}: {str(e)[:120]}"
            failures.append(name)
        print(f"{name:28s} {status:40s} {time.perf_counter()-t0:6.1f}s")

    ran = (f"{n_run} of {len(qs)} registry queries run"
           if only is not None else
           f"{len(qs)} queries, {len(oracles)} oracle-checked")
    print(f"\n{ran}, {len(failures)} failures"
          f"{': ' + ', '.join(failures) if failures else ''}")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
