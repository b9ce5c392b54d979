"""Large-world rehearsal — real-data-day readiness (VERDICT r2 #3).

10⁴ records × ~200 edges/record (the vertex density of real
timezone-boundary-builder polygons) through the full ETL: build job →
tar+zstd archive → region-scoped engine — with the conformance-suite
invariants re-asserted at realistic edge density:

- known-location corpus analogue: every sampled cell's center resolves
  to its own zone (TimeZoneMapTest.java:60-141 shape, synthetic world);
- candidate scan ≡ linear scan (Q3) on random points;
- scoped(±1°) == everywhere (TimeZoneMapTest.java:112-123);
- region-scoped archive open reads a bounded fraction of payload bytes
  (TimeZoneMapTest.java:210) and answers identically to the everywhere
  engine inside the region.
"""

import numpy as np
import pytest

from timezonemap_ray import worlds
from timezonemap_ray.index import build_index, lookup_batch, lookup_linear_scan

N = 100  # N² zone records + ocean bands


@pytest.fixture(scope="module")
def big(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bigworld")
    pq_path = str(tmp / "zones.parquet")
    from jobs.build_zone_table import main as build_main
    assert build_main(["--world", "big", "big-test:2026a", pq_path]) == 0
    import pyarrow.parquet as pqio
    table = pqio.read_table(pq_path)
    assert table.num_rows >= N * N
    idx = build_index(table)
    return {"table": table, "idx": idx, "tmp": tmp}


def _zone_centers(sample=400, seed=2):
    """(lat, lng, expected_zone_id) for hole-free cells — each star ring
    contains its cell center (radius ≥ 0.75·half-extent), and cells don't
    overlap, so the center's smallest-area zone is its own cell's."""
    rng = np.random.default_rng(seed)
    lat0, lat1, lng0, lng1 = -60.0, 70.0, -170.0, 170.0
    dla, dln = (lat1 - lat0) / N, (lng1 - lng0) / N
    ks = rng.choice(N * N, size=sample, replace=False)
    cases = []
    for k in ks:
        if k % 4 == 0:
            continue  # holed cell: the center sits inside the hole
        i, j = divmod(int(k), N)
        cases.append((lat0 + (i + 0.5) * dla, lng0 + (j + 0.5) * dln,
                      f"Big/Z{i:03d}_{j:03d}"))
    return cases


def test_bigworld_known_locations(big):
    cases = _zone_centers()
    lats = np.array([c[0] for c in cases])
    lngs = np.array([c[1] for c in cases])
    res = lookup_batch(big["idx"], lats, lngs)
    assert res["matched"].all()
    for got, (_, _, want) in zip(res["zone_id"], cases):
        assert got == want


def test_bigworld_cell_cover_equals_linear_scan(big):
    # the linear-scan oracle is O(points × records × edges) — 300 random
    # points over 10⁴ × 200-edge records (~20 s) is the budgeted parity
    # sample; the fast path itself handles 200k pts/s on this world
    rng = np.random.default_rng(7)
    lats = rng.uniform(-85, 85, 300)
    lngs = rng.uniform(-179, 179, 300)
    fast = lookup_batch(big["idx"], lats, lngs, want_all=True)
    slow = lookup_linear_scan(big["idx"], lats, lngs, want_all=True)
    assert fast["zone_id"].tolist() == slow["zone_id"].tolist()
    assert fast["all_zones"] == slow["all_zones"]


def test_bigworld_scoped_equals_everywhere(big):
    cases = _zone_centers(sample=8, seed=9)
    for lat, lng, want in cases[:3]:
        scoped = build_index(big["table"],
                             region=(lat - 1.0, lng - 1.0,
                                     lat + 1.0, lng + 1.0))
        r = lookup_batch(scoped, np.array([lat]), np.array([lng]))
        assert r["zone_id"][0] == want


def test_bigworld_archive_region_scoped(big):
    from timezonemap_ray.api import TimeZoneEngine
    from timezonemap_ray.sources.archive import (read_zone_archive,
                                                 write_zone_archive)
    arch = str(big["tmp"] / "zones.tzv")
    write_zone_archive(big["table"], arch, "2026a")
    region = (10.0, 30.0, 20.0, 45.0)  # ~0.7% of cells
    _, stats = read_zone_archive(arch, region=region)
    # pruned payloads are never parsed: bytes read ∝ region, not corpus
    assert stats["skipped_by_name"] > 0.95 * stats["entries"]
    eng = TimeZoneEngine.from_archive(arch, region=region)
    assert eng.map_version.endswith("2026a")
    rng = np.random.default_rng(3)
    lats = rng.uniform(region[0], region[2], 3000)
    lngs = rng.uniform(region[1], region[3], 3000)
    scoped = lookup_batch(eng.index, lats, lngs)
    everywhere = lookup_batch(big["idx"], lats, lngs)
    assert scoped["zone_id"].tolist() == everywhere["zone_id"].tolist()
