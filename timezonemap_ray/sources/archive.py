"""Tar+zstd zone ARCHIVE sink/source — the reference's wire format shape.

Mirrors the reference's packaging (`builder/Main.kt:112-161`,
`TimeZoneMap.kt:168-198`) rather than replacing it with a monolithic
parquet file:

- a **zstd-compressed tar** whose FIRST entry is a zero-byte
  ``"Version: <engine>:<map>"`` marker (M5 gate);
- one entry PER ZONE RECORD, named ``<zone_id>/<envelope>`` where the
  envelope is serialized INTO THE FILENAME — the reference's
  skip-deserialization trick: a region-scoped open can discard
  non-overlapping zones from the entry NAME alone, never touching the
  payload bytes (M7/S5);
- each payload is that record's single-row parquet (stand-in for the
  reference's FlatBuffer — same access pattern, self-describing bytes).

``read_zone_archive`` reports ``payload_bytes_read`` so tests can assert
the reference's "small region reads few bytes" property
(`TimeZoneMapTest.java:210`).

zstd framing via ``pyarrow.Codec`` (stdlib has no zstd); tar via stdlib.
"""

from __future__ import annotations

import io
import tarfile

import pyarrow as pa
import pyarrow.parquet as pq

from ..zonetable import ENGINE_VERSION, ZONE_SCHEMA, check_version_string

_ENV_SEP = "_"


def _env_name(row: dict) -> str:
    return _ENV_SEP.join(repr(float(row[c]))
                         for c in ("min_lat", "min_lng", "max_lat", "max_lng"))


def _parse_env(fragment: str) -> tuple:
    a = fragment.split(_ENV_SEP)
    return tuple(float(x) for x in a)


def write_zone_archive(table: pa.Table, path: str, map_version: str) -> None:
    """Zone table → tar+zstd archive (one entry per record, version first)."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tar:
        marker = tarfile.TarInfo(
            name=f"Version: {ENGINE_VERSION}:{map_version}")
        marker.size = 0
        tar.addfile(marker)
        for i in range(table.num_rows):
            row = {c: table[c][i].as_py()
                   for c in ("min_lat", "min_lng", "max_lat", "max_lng")}
            one = table.slice(i, 1)
            payload = io.BytesIO()
            pq.write_table(one, payload)
            data = payload.getvalue()
            zid = table["zone_id"][i].as_py()
            info = tarfile.TarInfo(name=f"{zid}/{_env_name(row)}")
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
    raw = buf.getvalue()
    codec = pa.Codec("zstd")
    with open(path, "wb") as f:
        f.write(b"ZSTDTAR1")
        f.write(len(raw).to_bytes(8, "little"))
        f.write(codec.compress(raw))


def read_zone_archive(path: str, region: tuple | None = None,
                      check_version: bool = True):
    """Archive → (pa.Table of overlapping records, stats dict).

    ``region`` = (min_lat, min_lng, max_lat, max_lng) or None for all.
    Non-overlapping entries are skipped FROM THE FILENAME — their payload
    bytes are never parsed; ``stats["payload_bytes_read"]`` counts only the
    deserialized payloads (the reference's bytes-read bound)."""
    with open(path, "rb") as f:
        magic = f.read(8)
        if magic != b"ZSTDTAR1":
            raise ValueError("not a zstd zone archive")
        raw_len = int.from_bytes(f.read(8), "little")
        raw = pa.Codec("zstd").decompress(f.read(), raw_len)
    stats = {"entries": 0, "skipped_by_name": 0, "payload_bytes_read": 0,
             "archive_bytes": len(raw)}
    tables = []
    version = None
    with tarfile.open(fileobj=io.BytesIO(raw), mode="r") as tar:
        for entry in tar:
            if version is None:
                if not entry.name.startswith("Version: "):
                    raise ValueError("No version marker found in map archive")
                version = entry.name[len("Version: "):]
                if check_version:
                    check_version_string(version)
                continue
            stats["entries"] += 1
            if region is not None:
                env = _parse_env(entry.name.rsplit("/", 1)[-1])
                e_min_lat, e_min_lng, e_max_lat, e_max_lng = env
                r_min_lat, r_min_lng, r_max_lat, r_max_lng = region
                if (e_min_lat > r_max_lat or e_max_lat < r_min_lat or
                        e_min_lng > r_max_lng or e_max_lng < r_min_lng):
                    stats["skipped_by_name"] += 1
                    continue  # envelope-in-filename: payload never touched
            data = tar.extractfile(entry).read()
            stats["payload_bytes_read"] += len(data)
            tables.append(pq.read_table(io.BytesIO(data)))
    if version is None:
        # zero-entry tar: the gate must not be silently bypassed
        raise ValueError("No version marker found in map archive")
    stats["map_version"] = version
    if tables:
        out = pa.concat_tables(tables)
    else:
        out = ZONE_SCHEMA.empty_table()
    return out, stats
