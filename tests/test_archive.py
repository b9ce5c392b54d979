"""Tar+zstd zone archive: version gate, envelope-in-filename skip, bytes-read
bound (reference TimeZoneMapTest.java:210 analogue), index parity."""

import numpy as np
import pytest

from timezonemap_ray import worlds
from timezonemap_ray.index import build_index, lookup_batch
from timezonemap_ray.sources.archive import (read_zone_archive,
                                             write_zone_archive)


@pytest.fixture(scope="module")
def archive(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("arc") / "zones.tzmap")
    write_zone_archive(worlds.conformance_table(), path, "2020d")
    return path


def test_archive_roundtrip_world(archive):
    table, stats = read_zone_archive(archive)
    full = worlds.conformance_table()
    assert table.num_rows == full.num_rows
    assert stats["map_version"] == "1.0:2020d"
    assert stats["skipped_by_name"] == 0
    # index from the archive == index from the table (same query results)
    ia = build_index(table)
    ib = build_index(full)
    rng = np.random.default_rng(13)
    lats = rng.uniform(-89, 89, 2000)
    lngs = rng.uniform(-179, 179, 2000)
    assert lookup_batch(ia, lats, lngs)["zone_id"].tolist() == \
        lookup_batch(ib, lats, lngs)["zone_id"].tolist()


def test_archive_region_scoped_reads_few_bytes(archive):
    """The reference asserts a 2°x2° region load reads a small fraction of
    the archive — here: payload bytes read only for envelope-overlapping
    entries, everything else skipped FROM THE FILENAME."""
    region = (39.0, -8.0, 41.0, -6.0)  # 2x2 deg over Test/West+East
    table, stats = read_zone_archive(archive, region=region)
    assert stats["skipped_by_name"] > 0
    full_bytes = read_zone_archive(archive)[1]["payload_bytes_read"]
    assert stats["payload_bytes_read"] < full_bytes / 3
    zones = set(table["zone_id"].to_pylist())
    assert {"Test/West", "Test/East"} <= zones
    # scoped archive index answers the region's queries identically
    idx = build_index(table, region=region)
    full_idx = build_index(worlds.conformance_table(), region=region)
    assert lookup_batch(idx, [39.7], [-7.6])["zone_id"][0] == \
        lookup_batch(full_idx, [39.7], [-7.6])["zone_id"][0] == "Test/West"


def test_archive_version_gate(tmp_path):
    import pyarrow as pa
    from timezonemap_ray.sources import archive as arc
    path = str(tmp_path / "bad.tzmap")
    write_zone_archive(worlds.conformance_table(), path, "2020d")
    # tamper the engine version (the gate lives in zonetable, shared by
    # the parquet table and the archive)
    from timezonemap_ray import zonetable
    orig = zonetable.ENGINE_VERSION
    try:
        zonetable.ENGINE_VERSION = "99.0"
        with pytest.raises(ValueError, match="Incompatible map archive"):
            read_zone_archive(path)
    finally:
        zonetable.ENGINE_VERSION = orig
    with pytest.raises(ValueError, match="not a zstd zone archive"):
        bad = str(tmp_path / "junk.tzmap")
        open(bad, "wb").write(b"garbage bytes")
        read_zone_archive(bad)


def test_engine_from_archive(tmp_path):
    from timezonemap_ray.api import TimeZoneEngine
    from timezonemap_ray.sources.archive import write_zone_archive
    path = str(tmp_path / "zones.tzmap")
    write_zone_archive(worlds.conformance_table(), path, "2020d")
    eng = TimeZoneEngine.from_archive(path, region=(38.0, -10.0, 42.0, -5.0))
    assert eng.map_version == "1.0:2020d"
    assert eng.get_overlapping_time_zone(39.666304, -7.558607) == "Test/West"


def test_archive_zero_entries_rejected(tmp_path):
    import io
    import tarfile
    import pyarrow as pa
    path = str(tmp_path / "empty.tzmap")
    buf = io.BytesIO()
    tarfile.open(fileobj=buf, mode="w").close()  # valid, zero-entry tar
    raw = buf.getvalue()
    with open(path, "wb") as f:
        f.write(b"ZSTDTAR1")
        f.write(len(raw).to_bytes(8, "little"))
        f.write(pa.Codec("zstd").compress(raw))
    with pytest.raises(ValueError, match="No version marker"):
        read_zone_archive(path)
