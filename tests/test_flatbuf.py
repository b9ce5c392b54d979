"""FlatBuffers wire format (``sources/flatbuf.py``) + reference-exact
archive (``write_map_archive``/``read_map_archive``).

The byte-level fixture below is hand-assembled from the PUBLIC FlatBuffers
format spec (root uoffset; vtable = [vt_len:u16][table_size:u16]
[field_offsets:u16...]; table starts with soffset32 to its vtable; vectors
length-prefixed; strings NUL-terminated; struct Point 8 bytes inline) —
it pins the exact wire layout the Java library reads, independent of the
builder implementation.
"""

import io
import tarfile

import numpy as np
import pytest

from timezonemap_ray import worlds
from timezonemap_ray.index import build_index, lookup_batch
from timezonemap_ray.sources import flatbuf as fb
from timezonemap_ray.sources.archive import (read_map_archive,
                                             read_zone_archive,
                                             write_map_archive,
                                             write_zone_archive)


def test_wire_fixture_single_point():
    """serialize_timezone("AB", [[[(1.0, 2.0)]]]) must produce exactly the
    canonical 84-byte buffer (derived by hand from the format spec)."""
    expected = bytes.fromhex(
        "0c000000"              # root uoffset -> TimeZone table at 12
        "08000c0004000800"      # TimeZone vtable: len 8, table 12, name@4, regions@8
        "08000000"              # table@12: soffset +8 -> vtable at 4
        "08000000"              # name uoffset -> string at 24
        "0c000000"              # regions uoffset -> vector at 32
        "0200000041420000"      # string: len 2, "AB", NUL, pad
        "01000000"              # regions vector: len 1
        "04000000"              # regions[0] uoffset -> Polygon table at 40
        "eeffffff"              # Polygon table@40: soffset -18 -> shared vtable at 58
        "04000000"              # rings uoffset -> vector at 48
        "01000000"              # rings vector: len 1
        "0c000000"              # rings[0] uoffset -> Ring table at 64
        "0000"                  # alignment pad
        "060008000400"          # shared Ring/Polygon vtable: len 6, table 8, field@4
        "06000000"              # Ring table@64: soffset +6 -> vtable at 58
        "04000000"              # points uoffset -> vector at 72
        "01000000"              # points vector: len 1
        "0000803f"              # lat 1.0f
        "00000040"              # lng 2.0f
    )
    ring = np.array([[1.0, 2.0]], dtype=np.float32)
    got = fb.serialize_timezone("AB", [[ring]])
    assert got == expected
    # and the parser reads the hand-assembled bytes (not just its own)
    zid, polys = fb.deserialize_timezone(expected)
    assert zid == "AB"
    assert np.array_equal(polys[0][0], ring)


def test_roundtrip_multi_ring_multi_polygon():
    r1 = np.array([[1.5, 2.5], [3.25, -4.75], [5.0, 6.0]], dtype=np.float32)
    r2 = np.array([[0.1, 0.2], [0.3, 0.4], [0.5, 0.6], [0.7, 0.8]],
                  dtype=np.float32)
    buf = fb.serialize_timezone("Europe/Amsterdam", [[r1, r2], [r2]])
    zid, polys = fb.deserialize_timezone(buf)
    assert zid == "Europe/Amsterdam"
    assert len(polys) == 2 and len(polys[0]) == 2 and len(polys[1]) == 1
    assert np.array_equal(polys[0][0], r1)
    assert np.array_equal(polys[0][1], r2)
    assert np.array_equal(polys[1][0], r2)


def test_roundtrip_unicode_and_empty():
    r = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]], dtype=np.float32)
    zid, polys = fb.deserialize_timezone(
        fb.serialize_timezone("Ülan/Bätor™", [[r]]))
    assert zid == "Ülan/Bätor™"
    zid2, polys2 = fb.deserialize_timezone(fb.serialize_timezone("X", []))
    assert zid2 == "X" and polys2 == []


def test_vtable_dedup_shared_across_tables():
    # Ring and Polygon tables have identical vtables; N rings must reuse
    # ONE vtable — the 6-byte pattern appears exactly once in the buffer
    rings = [np.array([[i, i]], dtype=np.float32) for i in range(5)]
    buf = fb.serialize_timezone("Z", [[r] for r in rings])
    assert buf.count(bytes.fromhex("060008000400")) == 1


def test_java_float_str():
    cases = {
        0.0: "0.0", 1.0: "1.0", -5.5: "-5.5", 0.001: "0.001",
        12345678.0: "1.2345678E7", 1e7: "1.0E7", 1e-7: "1.0E-7",
        float(np.float32(179.99998)): "179.99998",
        float(np.float32(-73.456)): "-73.456",
    }
    for v, want in cases.items():
        assert fb.java_float_str(v) == want, (v, want)
    assert fb.java_float_str(float("nan")) == "NaN"
    assert fb.java_float_str(float("inf")) == "Infinity"
    # roundtrip: the string must parse back to the same float32
    for v in np.random.default_rng(5).uniform(-180, 180, 200):
        s = fb.java_float_str(v)
        assert np.float32(s) == np.float32(v), (v, s)


def test_envelope_csv_roundtrip():
    s = fb.serialize_envelope(-12.5, 3.75, 80.0, 179.99998)
    assert s == "-12.5,3.75,80.0,179.99998"
    assert fb.deserialize_envelope(s) == (
        -12.5, 3.75, 80.0, float(np.float32(179.99998)))


# ---------------------------------------------------------------------------
# reference-exact archive
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def fb_archive(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("fbarc") / "zones.tar.zstd")
    write_map_archive(worlds.conformance_table(), path, "2020d")
    return path


def test_map_archive_is_standard_zstd_tar(fb_archive):
    import pyarrow as pa
    raw = open(fb_archive, "rb").read()
    assert raw[:4] == b"\x28\xb5\x2f\xfd"  # standard zstd frame magic
    tar_bytes = bytes(pa.CompressedInputStream(
        pa.BufferReader(raw), "zstd").read())
    with tarfile.open(fileobj=io.BytesIO(tar_bytes)) as tar:
        names = [e.name for e in tar]
    assert names[0] == "Version: 1.0:2020d"
    # entry names: {tzid}/{comma CSV envelope} (Main.kt:127)
    frag = names[1].rsplit("/", 1)[-1]
    assert len(frag.split(",")) == 4


def test_map_archive_roundtrip_equals_twin(fb_archive):
    fb_table, stats = read_map_archive(fb_archive)
    full = worlds.conformance_table()
    assert fb_table.num_rows == full.num_rows
    assert stats["map_version"] == "1.0:2020d"
    # identical zone set, identical area ordering, identical coordinates
    assert fb_table["zone_id"].to_pylist() == full["zone_id"].to_pylist()
    assert fb_table["area_rank"].to_pylist() == full["area_rank"].to_pylist()
    assert fb_table["rings"].to_pylist() == full["rings"].to_pylist()
    # lookup parity with an index built straight from the table
    ia, ib = build_index(fb_table), build_index(full)
    rng = np.random.default_rng(23)
    lats, lngs = rng.uniform(-89, 89, 1500), rng.uniform(-179, 179, 1500)
    assert lookup_batch(ia, lats, lngs)["zone_id"].tolist() == \
        lookup_batch(ib, lats, lngs)["zone_id"].tolist()


def test_map_archive_region_scoped_bytes_bound(fb_archive):
    region = (39.0, -8.0, 41.0, -6.0)
    table, stats = read_map_archive(fb_archive, region=region)
    assert stats["skipped_by_name"] > 0
    full_bytes = read_map_archive(fb_archive)[1]["payload_bytes_read"]
    assert stats["payload_bytes_read"] < full_bytes / 3
    assert {"Test/West", "Test/East"} <= set(table["zone_id"].to_pylist())


def test_map_archive_uncompressed_mode(tmp_path):
    path = str(tmp_path / "zones.tar")
    write_map_archive(worlds.conformance_table(), path, "2020d",
                      compression="uncompressed")
    raw = open(path, "rb").read()
    assert raw[:4] != b"\x28\xb5\x2f\xfd"
    table, stats = read_map_archive(path)  # sniffed as plain tar
    assert table.num_rows == worlds.conformance_table().num_rows


def test_map_archive_version_gate(tmp_path):
    # hand-build an archive whose version marker names a foreign engine
    bad = str(tmp_path / "bad.tar")
    ring = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]], dtype=np.float32)
    payload = fb.serialize_timezone("Test/Zone", [[ring]])
    with tarfile.open(bad, mode="w") as tar:
        marker = tarfile.TarInfo(name="Version: 9.9:2020d")
        marker.size = 0
        tar.addfile(marker)
        info = tarfile.TarInfo(name="Test/Zone/0.0,0.0,1.0,1.0")
        info.size = len(payload)
        tar.addfile(info, io.BytesIO(payload))
    with pytest.raises(ValueError, match="Incompatible"):
        read_map_archive(bad)
    # unchecked read still surfaces the version
    t, stats = read_map_archive(bad, check_version=False)
    assert stats["map_version"] == "9.9:2020d"
    assert t["zone_id"].to_pylist() == ["Test/Zone"]
    # an archive with no version marker is rejected outright
    noversion = str(tmp_path / "nov.tar")
    with tarfile.open(noversion, mode="w") as tar:
        info = tarfile.TarInfo(name="Test/Zone/0.0,0.0,1.0,1.0")
        info.size = len(payload)
        tar.addfile(info, io.BytesIO(payload))
    with pytest.raises(ValueError, match="No version marker"):
        read_map_archive(noversion)


def test_java_reference_version_stamp_accepted(tmp_path):
    """An archive stamped by the Java reference build ("4.5:2020d",
    pom.xml:7) must open under the DEFAULT gate — the wire format is
    the one we replay (ADVICE r4: the old gate only accepted the
    engine's own '1.0' prefix, rejecting genuine reference archives)."""
    from timezonemap_ray.api import TimeZoneEngine
    p = str(tmp_path / "javaref.tar")
    ring = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]], dtype=np.float32)
    payload = fb.serialize_timezone("Test/Zone", [[ring]])
    with tarfile.open(p, mode="w") as tar:
        marker = tarfile.TarInfo(name="Version: 4.5:2020d")
        marker.size = 0
        tar.addfile(marker)
        info = tarfile.TarInfo(name="Test/Zone/0.0,0.0,1.0,1.0")
        info.size = len(payload)
        tar.addfile(info, io.BytesIO(payload))
    t, stats = read_map_archive(p)          # default check_version=True
    assert stats["map_version"] == "4.5:2020d"
    eng = TimeZoneEngine.from_archive(p)    # full engine path too
    assert eng.map_version == "4.5:2020d"
    assert eng.get_time_zones() == ["Test/Zone"]
    # and an engine-level escape hatch for unknown-but-compatible stamps
    with tarfile.open(p, mode="w") as tar:
        marker = tarfile.TarInfo(name="Version: 7.0:2099z")
        marker.size = 0
        tar.addfile(marker)
        info = tarfile.TarInfo(name="Test/Zone/0.0,0.0,1.0,1.0")
        info.size = len(payload)
        tar.addfile(info, io.BytesIO(payload))
    with pytest.raises(ValueError, match="Incompatible"):
        TimeZoneEngine.from_archive(p)
    eng = TimeZoneEngine.from_archive(p, check_version=False)
    assert eng.map_version == "7.0:2099z"


def test_long_zone_id_archive_roundtrip(tmp_path):
    """A zone id pushing the entry name past USTAR's 100-char cap must
    round-trip (GNU long-name fallback) instead of dying in tarfile
    (ADVICE r4 low)."""
    import pyarrow as pa
    from timezonemap_ray.zonetable import make_zone, zones_to_table
    long_id = "Region/" + "VeryLongZoneNameSegment" * 6   # 145 chars
    z = make_zone(long_id, [(np.array([0.0, 1.0, 1.0, 0.0]),
                             np.array([0.0, 0.0, 1.0, 1.0]))])
    tbl = zones_to_table([z])
    p = str(tmp_path / "long.tar.zstd")
    write_map_archive(tbl, p, "2020d")
    t, _ = read_map_archive(p)
    assert t["zone_id"].to_pylist() == [long_id]


def test_fb_and_parquet_archives_agree(tmp_path):
    """The twin (parquet payloads) and the reference-exact (FlatBuffer)
    archive must load the SAME zone table from the same input."""
    tbl = worlds.conformance_table()
    p1 = str(tmp_path / "twin.tzmap")
    p2 = str(tmp_path / "ref.tar.zstd")
    write_zone_archive(tbl, p1, "2020d")
    write_map_archive(tbl, p2, "2020d")
    t1, _ = read_zone_archive(p1)
    t2, _ = read_map_archive(p2)
    assert t1["zone_id"].to_pylist() == t2["zone_id"].to_pylist()
    assert t1["rings"].to_pylist() == t2["rings"].to_pylist()
    assert t1["area_rank"].to_pylist() == t2["area_rank"].to_pylist()


def test_archive_interop_system_zstd_and_gnu_tar(fb_archive, tmp_path):
    """EXTERNAL validation: the archive must decompress with the real
    zstd binary and list/extract with GNU tar — byte-level interop
    evidence independent of this repo's own reader."""
    import shutil
    import subprocess
    zstd = shutil.which("zstd")
    if zstd is None or shutil.which("tar") is None:
        pytest.skip("system zstd/tar unavailable")
    out = tmp_path / "out.tar"
    subprocess.run([zstd, "-d", "-q", fb_archive, "-o", str(out)],
                   check=True)
    res = subprocess.run(["tar", "-tf", str(out)], capture_output=True,
                         text=True, check=True)
    names = res.stdout.splitlines()
    assert names[0].rstrip("/") == "Version: 1.0:2020d"
    assert len(names) == 1 + worlds.conformance_table().num_rows
    # every zone entry: {tzid}/{4-float CSV}
    for nm in names[1:]:
        frag = nm.rstrip("/").rsplit("/", 1)[-1]
        assert len(frag.split(",")) == 4, nm
    # extract everything with GNU tar and FlatBuffer-parse one payload
    xdir = tmp_path / "x"
    xdir.mkdir()
    subprocess.run(["tar", "-xf", str(out), "-C", str(xdir)], check=True)
    payloads = [p for p in xdir.rglob("*") if p.is_file() and p.stat().st_size]
    assert payloads
    zid, polys = fb.deserialize_timezone(payloads[0].read_bytes())
    assert zid and polys and len(polys[0][0]) >= 3


def test_archive_reads_foreign_zstd_frames(tmp_path):
    """The reader must accept frames produced by the REAL zstd binary
    (arbitrary level, not pyarrow's)."""
    import shutil
    import subprocess
    zstd = shutil.which("zstd")
    if zstd is None:
        pytest.skip("system zstd unavailable")
    plain = tmp_path / "zones.tar"
    write_map_archive(worlds.conformance_table(), str(plain), "2020d",
                      compression="uncompressed")
    comp = tmp_path / "zones.tar.zst"
    subprocess.run([zstd, "-19", "-q", str(plain), "-o", str(comp)],
                   check=True)
    table, stats = read_map_archive(str(comp))
    assert table.num_rows == worlds.conformance_table().num_rows
    assert stats["map_version"] == "1.0:2020d"


def test_engine_from_reference_archive(fb_archive):
    """TimeZoneEngine.from_archive sniffs the reference wire format — a
    Java-built archive opens directly, region-scoped."""
    from timezonemap_ray.api import TimeZoneEngine
    eng = TimeZoneEngine.from_archive(fb_archive,
                                      region=(38.0, -10.0, 42.0, -5.0))
    assert eng.map_version == "1.0:2020d"
    assert eng.get_overlapping_time_zone(39.666304, -7.558607) == "Test/West"
