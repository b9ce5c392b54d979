#!/usr/bin/env python
"""Builder ETL CLI — GeoJSON(.zip) → cleansed zone table, in any sink.

The reference's builder main (`builder/.../Main.kt:144-168`) as a job.
Like the reference CLI, multiple outputs may be produced in one pass::

    python jobs/build_zone_table.py <geojson-or-zip> <map-version> <out.parquet>
    python jobs/build_zone_table.py --world conformance|grid|big <map-version> <out.parquet>
    python jobs/build_zone_table.py <input> <map-version> <<sink> <outputPath>>+

where ``<sink>`` is one of:

- ``parquet``       — the engine's native zone-table parquet (+ version
  metadata), same as the 3-arg form;
- ``zstd``          — the reference's EXACT wire format: tar of
  FlatBuffer-serialized zones with envelope-in-filename, zstd level 22
  (`Main.kt:155`, ``sources/archive.py::write_map_archive``);
- ``uncompressed``  — the same tar without compression (the reference's
  other CLI mode);
- ``twin``          — the repo's parquet-payload tar twin
  (``write_zone_archive``).

Driver-side pure python (the real dataset is ~450 features; no cluster
needed — SURVEY.md §3.1).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SINKS = ("parquet", "zstd", "uncompressed", "twin")


def _write(table, sink, out, version):
    if sink == "parquet":
        from timezonemap_ray.zonetable import write_zone_table
        write_zone_table(table, out, version)
    elif sink in ("zstd", "uncompressed"):
        from timezonemap_ray.sources.archive import write_map_archive
        write_map_archive(table, out, version, compression=sink)
    elif sink == "twin":
        from timezonemap_ray.sources.archive import write_zone_archive
        write_zone_archive(table, out, version)
    else:
        raise ValueError(f"unknown sink {sink!r} (one of {SINKS})")


def main(argv=None):
    args = list(argv or sys.argv[1:])
    if args and args[0] == "--world":
        if len(args) < 4:
            print(__doc__)
            return 2
        from timezonemap_ray import worlds
        world, version, rest = args[1], args[2], args[3:]
        table = (worlds.grid_world_table(jagged=True) if world == "grid"
                 else worlds.big_world_table() if world == "big"
                 else worlds.conformance_table())
    elif len(args) >= 3:
        from timezonemap_ray.sources.geojson import (load_feature_collection,
                                                     zones_from_geojson,
                                                     zones_to_table)
        src, version, rest = args[0], args[1], args[2:]
        table = zones_to_table(zones_from_geojson(load_feature_collection(src)))
    else:
        print(__doc__)
        return 2

    if len(rest) == 1:
        outputs = [("parquet", rest[0])]       # legacy 3-arg form
    elif len(rest) % 2 == 0 and all(rest[i] in SINKS
                                    for i in range(0, len(rest), 2)):
        outputs = [(rest[i], rest[i + 1]) for i in range(0, len(rest), 2)]
    else:
        print(__doc__)
        return 2

    for sink, out in outputs:
        _write(table, sink, out, version)
        print(f"wrote {out} [{sink}]: {table.num_rows} zone records")
    return 0


if __name__ == "__main__":
    sys.exit(main())
