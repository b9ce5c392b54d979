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
- each payload is that record's single-row parquet (fast twin — same
  access pattern, self-describing bytes). Round 4 adds the reference's
  ACTUAL wire format too: ``write_map_archive``/``read_map_archive``
  emit/read FlatBuffer payloads (``sources/flatbuf.py``), comma-CSV
  envelopes, and a standard zstd frame — byte-level interoperable with
  the Java library's archives.

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


# ---------------------------------------------------------------------------
# Reference-EXACT wire format (FlatBuffer payloads, standard zstd frame)
# ---------------------------------------------------------------------------

_ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"


def write_map_archive(table: pa.Table, path: str, map_version: str,
                      compression: str = "zstd") -> None:
    """Zone table → the reference's ACTUAL wire format (`Main.kt:96-142`):

    a tar whose first entry is the zero-byte ``"Version: <engine>:<map>"``
    marker, followed by one entry per zone record named
    ``{tzid}/{envelope}`` — envelope as the comma-separated Java-float CSV
    of ``serializeEnvelope`` (`Serialization.kt:20-21`) — whose payload is
    the FlatBuffer-serialized TimeZone (`Serialization.kt:26-40`,
    ``sources/flatbuf.py``); the whole tar zstd-compressed as a STANDARD
    frame (`Main.kt:155`: ZstdCompressorOutputStream level 22), readable
    by any zstd implementation. ``compression="uncompressed"`` writes the
    plain tar (the reference's other CLI mode)."""
    import numpy as np

    from . import flatbuf as fb

    rings_col = table["rings"].to_pylist()
    zids = table["zone_id"].to_pylist()
    envs = [table[c].to_pylist()
            for c in ("min_lat", "min_lng", "max_lat", "max_lng")]
    entries = []
    for i in range(table.num_rows):
        rings = [np.asarray([(p["lat"], p["lng"]) for p in ring],
                            dtype=np.float32).reshape(-1, 2)
                 for ring in rings_col[i]]
        payload = fb.serialize_timezone(zids[i], [rings])
        env = fb.serialize_envelope(envs[0][i], envs[1][i],
                                    envs[2][i], envs[3][i])
        entries.append((f"{zids[i]}/{env}", payload))
    # USTAR matches the reference byte-for-byte but caps names at 100
    # chars; an unusually long zone id falls back to GNU long-name
    # entries (the Java TarArchiveInputStream reader side handles them)
    fmt = tarfile.USTAR_FORMAT
    if any(len(name.encode()) > 100 for name, _ in entries):
        fmt = tarfile.GNU_FORMAT
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=fmt) as tar:
        marker = tarfile.TarInfo(
            name=f"Version: {ENGINE_VERSION}:{map_version}")
        marker.size = 0
        tar.addfile(marker)
        for name, payload in entries:
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            tar.addfile(info, io.BytesIO(payload))
    raw = buf.getvalue()
    with open(path, "wb") as f:
        if compression == "zstd":
            f.write(pa.Codec("zstd", compression_level=22).compress(raw))
        elif compression == "uncompressed":
            f.write(raw)
        else:
            raise ValueError("compression must be 'zstd' or 'uncompressed'")


def read_map_archive(path: str, region: tuple | None = None,
                     check_version: bool = True):
    """Reference-format archive → (zone table, stats).

    Mirrors the reference reader (`TimeZoneMap.kt:168-198`): version
    marker gate first; region-scoped opens skip non-overlapping entries
    FROM THE NAME (envelope CSV) without touching payload bytes; kept
    payloads FlatBuffer-deserialize into zone records; extents/areas/ranks
    are recomputed over the loaded (scoped) set exactly like the
    reference's init-time sort (M11/M12/A1). Compression is sniffed from
    the zstd frame magic, so both CLI modes of the reference builder read
    back."""
    import numpy as np

    from . import flatbuf as fb
    from ..zonetable import ZoneRecord, zones_to_table

    with open(path, "rb") as f:
        raw = f.read()
    if raw[:4] == _ZSTD_MAGIC:
        raw = bytes(pa.CompressedInputStream(
            pa.BufferReader(raw), "zstd").read())
    stats = {"entries": 0, "skipped_by_name": 0, "payload_bytes_read": 0,
             "archive_bytes": len(raw)}
    zones = []
    version = None
    with tarfile.open(fileobj=io.BytesIO(raw), mode="r") as tar:
        for entry in tar:
            if version is None:
                if not entry.name.startswith("Version: "):
                    raise ValueError("No version marker found in map archive")
                version = entry.name[len("Version: "):]
                if check_version:
                    # reference-format archives stamped by the Java build
                    # (e.g. "4.5:2020d") are wire-compatible by design
                    from ..zonetable import REFERENCE_WIRE_VERSIONS
                    check_version_string(version,
                                         accept=REFERENCE_WIRE_VERSIONS)
                continue
            stats["entries"] += 1
            if region is not None:
                env = fb.deserialize_envelope(entry.name.rsplit("/", 1)[-1])
                e_min_lat, e_min_lng, e_max_lat, e_max_lng = env
                r_min_lat, r_min_lng, r_max_lat, r_max_lng = region
                if (e_min_lat > r_max_lat or e_max_lat < r_min_lat or
                        e_min_lng > r_max_lng or e_max_lng < r_min_lng):
                    stats["skipped_by_name"] += 1
                    continue  # envelope-in-filename: payload never touched
            data = tar.extractfile(entry).read()
            stats["payload_bytes_read"] += len(data)
            zone_id, polygons = fb.deserialize_timezone(data)
            rec = ZoneRecord(zone_id)
            for poly in polygons:
                for ring in poly:
                    # f32 storage widened to f64, like the twin reader
                    rec.rings.append((ring[:, 0].astype(np.float64),
                                      ring[:, 1].astype(np.float64)))
            if rec.rings:
                zones.append(rec)
    if version is None:
        raise ValueError("No version marker found in map archive")
    stats["map_version"] = version
    return zones_to_table(zones), stats
