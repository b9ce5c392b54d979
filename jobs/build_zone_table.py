#!/usr/bin/env python
"""Builder ETL CLI — GeoJSON(.zip) → cleansed zone-table parquet.

The reference's builder main (`builder/.../Main.kt:144-168`) as a job::

    python jobs/build_zone_table.py <geojson-or-zip> <map-version> <out.parquet>
    python jobs/build_zone_table.py --world conformance|grid|big <map-version> <out.parquet>

Driver-side pure python (the real dataset is ~450 features; no cluster
needed — SURVEY.md §3.1).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    args = list(argv or sys.argv[1:])
    if len(args) != 3 and not (len(args) == 4 and args[0] == "--world"):
        print(__doc__)
        return 2
    if args[0] == "--world":
        from timezonemap_ray import worlds
        from timezonemap_ray.zonetable import write_zone_table
        world, version, out = args[1], args[2], args[3]
        table = (worlds.grid_world_table(jagged=True) if world == "grid"
                 else worlds.big_world_table() if world == "big"
                 else worlds.conformance_table())
        write_zone_table(table, out, version)
    else:
        from timezonemap_ray.sources.geojson import build_zone_table_from_geojson
        src, version, out = args
        table = build_zone_table_from_geojson(src, out, version)
    print(f"wrote {out}: {table.num_rows} zone records")
    return 0


if __name__ == "__main__":
    sys.exit(main())
