"""LazyZoneIndex: decode-on-touch with LRU ≡ eager index, bounded decodes."""

import numpy as np
import pyarrow as pa
import pytest

from timezonemap_ray import worlds
from timezonemap_ray.index import build_index, lookup_batch
from timezonemap_ray.lazy import LazyZoneIndex


@pytest.fixture(scope="module")
def table():
    return worlds.conformance_table()


def test_lazy_equals_eager(table):
    eager = build_index(table)
    lazy = LazyZoneIndex(table)
    rng = np.random.default_rng(21)
    lats = rng.uniform(-89, 89, 3000)
    lngs = rng.uniform(-179, 179, 3000)
    a = lookup_batch(eager, lats, lngs, want_all=True)
    b = lookup_batch(lazy, lats, lngs, want_all=True)
    assert a["zone_id"].tolist() == b["zone_id"].tolist()
    assert a["all_zones"] == b["all_zones"]


def test_lazy_decodes_only_touched(table):
    lazy = LazyZoneIndex(table)
    # a regional workload: points only inside the US stripe
    rng = np.random.default_rng(22)
    lats = rng.uniform(31, 48, 500)
    lngs = rng.uniform(-124, -71, 500)
    lookup_batch(lazy, lats, lngs)
    assert 0 < lazy.decode_count < len(lazy)  # untouched zones never decoded


def test_lazy_lru_bound(table):
    lazy = LazyZoneIndex(table, max_cached=4)
    rng = np.random.default_rng(23)
    lats = rng.uniform(-89, 89, 2000)
    lngs = rng.uniform(-179, 179, 2000)
    lookup_batch(lazy, lats, lngs)
    assert len(lazy._cache) <= 4                 # LRU cap respected
    assert lazy.decode_count >= len(lazy._cache)


def test_lazy_region_clips_on_touch(table):
    region = (30.0, -124.0, 49.0, -71.0)
    eager = build_index(table, region=region)
    lazy = LazyZoneIndex(table, region=region)
    rng = np.random.default_rng(24)
    lats = rng.uniform(30, 49, 800)
    lngs = rng.uniform(-124, -71, 800)
    a = lookup_batch(eager, lats, lngs)
    b = lookup_batch(lazy, lats, lngs)
    assert a["zone_id"].tolist() == b["zone_id"].tolist()
    # out-of-region flagged identically
    r = lookup_batch(lazy, [0.0], [0.0])
    assert r["error"][0] == "outside_initialized_region"


def test_lazy_joiner_stage(ray_session, table):
    import ray
    import ray.data as rd
    from timezonemap_ray.api import TimeZoneEngine
    from timezonemap_ray.stages.joiner import LazyZoneJoiner
    ref = ray.put(table)
    rng = np.random.default_rng(25)
    pts = pa.table({"lat": rng.uniform(-80, 80, 2000),
                    "lng": rng.uniform(-170, 170, 2000)})
    ds = rd.from_arrow(pts)
    out = ds.map_batches(
        LazyZoneJoiner,
        fn_constructor_kwargs=dict(table_ref=ref, max_cached=64),
        batch_format="pyarrow", concurrency=2).to_pandas()
    eng = TimeZoneEngine(build_index(table))
    expect = eng.lookup_points(ds).to_pandas()
    out = out.sort_values(["lat", "lng"]).reset_index(drop=True)
    expect = expect.sort_values(["lat", "lng"]).reset_index(drop=True)
    assert out["zone_id"].astype("object").tolist() == \
        expect["zone_id"].astype("object").tolist()


def test_lazy_clipped_rect_no_false_match():
    """Regression: a non-rect zone whose clip degenerates to an axis-aligned
    rectangle must NOT claim points in the larger pre-clip envelope (the
    lazy index stores pre-clip envelopes; the rect fast path treats the
    envelope test as the PIP test, so is_rect must be disabled whenever the
    decoded geometry is smaller than the stored envelope)."""
    from timezonemap_ray.zonetable import make_zone, zones_to_table
    # two disjoint square lobes (even-odd union); pre-clip envelope spans both
    zone = make_zone("Test/TwoLobes", [
        (np.array([5.0, 5.0, 0.0, 0.0]), np.array([0.0, 5.0, 5.0, 0.0])),
        (np.array([10.0, 10.0, 6.0, 6.0]), np.array([5.0, 10.0, 10.0, 5.0])),
    ])
    table = zones_to_table([zone])
    region = (-1.0, -1.0, 5.5, 20.0)  # clips away the upper lobe entirely
    eager = build_index(table, region=region)
    lazy = LazyZoneIndex(table, region=region)
    # inside the region and the PRE-clip envelope, outside the clipped rect
    lats, lngs = np.array([2.5, 2.5]), np.array([7.5, 2.5])
    a = lookup_batch(eager, lats, lngs)
    b = lookup_batch(lazy, lats, lngs)
    assert a["zone_id"].tolist() == b["zone_id"].tolist()
    assert b["zone_id"][0] is None          # the false-match point
    assert b["zone_id"][1] == "Test/TwoLobes"
