#!/usr/bin/env python
"""Cluster entry point for the flagship pipeline.

Run on a Ray cluster via job submission::

    ray job submit --working-dir . -- \
        python jobs/run_flagship.py --sf-dir /data/sf0.1 --out /data/out \
        --checkpoint --partitions 64

Locally it starts its own session (guarded — never fights the driver's).
With ``--checkpoint`` the run is resumable: re-submitting after a failure
skips completed partitions (per-partition lineage manifest, SURVEY.md §4).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--out", default="/tmp/flagship_out")
    p.add_argument("--world", choices=["conformance", "grid"],
                   default="conformance")
    p.add_argument("--zone-table", default=None,
                   help="parquet zone table (bring-your-own-map hook); "
                        "overrides --world")
    p.add_argument("--checkpoint", action="store_true")
    p.add_argument("--partitions", type=int, default=16)
    p.add_argument("--shuffle", action="store_true",
                   help="cell-groupby co-partitioned join path")
    p.add_argument("--want-all", action="store_true")
    p.add_argument("--fallback", action="store_true")
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args(argv)

    import ray
    if not ray.is_initialized():
        kw = dict(include_dashboard=False, ignore_reinit_error=True,
                  logging_level="ERROR")
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(address="local", **kw)

    from timezonemap_ray import worlds
    from timezonemap_ray.api import TimeZoneEngine
    from timezonemap_ray.pipelines.flagship import flagship, geo_points
    from timezonemap_ray.pipelines.checkpoint import run_checkpointed

    if args.zone_table:
        engine = TimeZoneEngine.for_everywhere(args.zone_table)
    elif args.world == "grid":
        engine = TimeZoneEngine.for_everywhere(worlds.grid_world_table())
    else:
        engine = TimeZoneEngine.for_everywhere(worlds.conformance_table())

    t0 = time.perf_counter()
    if not args.checkpoint and os.path.isdir(args.out):
        # plain write_parquet APPENDS into an existing dir; a re-run would
        # duplicate rows — wipe first (the checkpoint path resumes instead)
        import shutil
        shutil.rmtree(args.out)
    if args.checkpoint:
        pts = geo_points(args.sf_dir)
        manifest = run_checkpointed(pts, engine, args.out,
                                    n_partitions=args.partitions,
                                    want_all=args.want_all,
                                    fallback=args.fallback)
        stats = manifest.counters()
    else:
        flagship(args.sf_dir, engine, out_dir=args.out,
                 want_all=args.want_all, fallback=args.fallback,
                 shuffle=args.shuffle)
        stats = {}
    print(json.dumps({"out": args.out, "sec": round(time.perf_counter() - t0, 3),
                      **stats}))
    ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
