"""Streaming tumbling windows: drained stream == batch groupby; late events
behind the watermark are dropped and counted."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from timezonemap_ray.pipelines.streaming import run_windowed_stream


def _events(n=20_000, users=20, seed=3):
    rng = np.random.default_rng(seed)
    base = 1_700_000_000_000_000  # us epoch
    ts = base + np.sort(rng.integers(0, 6 * 3600 * 1_000_000, n))
    return pa.table({
        "user_id": rng.integers(0, users, n).astype(np.int64),
        "ts": pa.array(ts, type=pa.int64()).cast(pa.timestamp("us")),
        "value": rng.uniform(0, 10, n),
    })


def test_stream_equals_batch_groupby(ray_session):
    import ray.data as rd
    tbl = _events()
    ds = rd.from_arrow(tbl).repartition(8)
    windows, stats = run_windowed_stream(ds, window_s=3600, lateness_s=600)
    assert stats["dropped_late"] == 0  # input is in order
    got = windows.to_pandas().sort_values(["window_start_us", "key"]) \
        .reset_index(drop=True)

    pdf = tbl.to_pandas()
    us = pdf["ts"].astype("int64")
    pdf["window_start_us"] = (us // (3600 * 1_000_000)) * (3600 * 1_000_000)
    exp = pdf.groupby(["window_start_us", "user_id"]).agg(
        n_events=("value", "size"), sum_value=("value", "sum")).reset_index() \
        .rename(columns={"user_id": "key"}) \
        .sort_values(["window_start_us", "key"]).reset_index(drop=True)
    assert got["n_events"].tolist() == exp["n_events"].tolist()
    assert got["sum_value"].to_numpy() == pytest.approx(
        exp["sum_value"].to_numpy())
    assert got["window_start_us"].tolist() == exp["window_start_us"].tolist()


def test_late_events_dropped(ray_session):
    import ray.data as rd
    base = 1_700_000_000_000_000
    hour = 3600 * 1_000_000
    rows = [
        {"user_id": 1, "ts": base + 0 * hour, "value": 1.0},
        {"user_id": 1, "ts": base + 3 * hour, "value": 1.0},  # watermark jumps
        {"user_id": 1, "ts": base + 0 * hour + 60_000_000, "value": 1.0},  # LATE
        {"user_id": 1, "ts": base + 3 * hour + 60_000_000, "value": 1.0},  # ok
    ]
    tbl = pa.table({
        "user_id": pa.array([r["user_id"] for r in rows], type=pa.int64()),
        "ts": pa.array([r["ts"] for r in rows], type=pa.int64()).cast(
            pa.timestamp("us")),
        "value": pa.array([r["value"] for r in rows], type=pa.float64()),
    })
    windows, stats = run_windowed_stream(
        rd.from_arrow(tbl), window_s=3600, lateness_s=600, micro_batch=1)
    assert stats["dropped_late"] == 1
    w = windows.to_pandas()
    first = w[w["window_start_us"] == (base // hour) * hour]
    assert first["n_events"].iloc[0] == 1  # the late event was NOT counted


def test_crash_replay_exactly_once(ray_session):
    """Kill the stream mid-run (fail_after, no flush — emit buffers die),
    then replay the SAME log from the per-shard drained watermarks: the
    union of pre-crash drained windows and replay output equals the
    no-crash run exactly — no duplicates, no gaps."""
    import ray.data as rd
    tbl = _events()
    ds = rd.from_arrow(tbl).repartition(8)
    full, _ = run_windowed_stream(ds, window_s=3600, lateness_s=600,
                                  num_shards=4, drain_every=2,
                                  micro_batch=1024)

    # crash after 7 micro-batches: 3 drains happened (at 2, 4, 6), the 7th
    # batch's finalized-but-undrained windows are lost with the actors
    pre, s_pre = run_windowed_stream(ds, window_s=3600, lateness_s=600,
                                     num_shards=4, drain_every=2,
                                     micro_batch=1024, fail_after=7)
    wms = s_pre["drained_watermarks"]
    assert len(wms) == 4 and any(w > -(1 << 61) for w in wms)
    assert 0 < pre.num_rows < full.num_rows  # a real partial run

    post, s_post = run_windowed_stream(ds, window_s=3600, lateness_s=600,
                                       num_shards=4, drain_every=2,
                                       micro_batch=1024,
                                       resume_watermarks=wms)
    assert s_post["replay_skipped"] > 0  # pre-crash windows were skipped
    combined = pa.concat_tables([pre, post]).to_pandas() \
        .sort_values(["window_start_us", "key"]).reset_index(drop=True)
    expected = full.to_pandas() \
        .sort_values(["window_start_us", "key"]).reset_index(drop=True)
    # exactly-once: no (window, key) appears twice across the two runs
    assert not combined.duplicated(["window_start_us", "key"]).any()
    pd.testing.assert_frame_equal(combined, expected)


def test_worker_fed_equals_batch_groupby(ray_session):
    """Worker-fed topology (blocks → feeder tasks → shard actors) agrees
    with the batch groupby; NO raw event batch is held by the driver —
    every feeder pid is a worker process, never the driver's."""
    import os

    import ray.data as rd
    from timezonemap_ray.pipelines.streaming import (
        run_windowed_stream_worker_fed)
    tbl = _events()
    ds = rd.from_arrow(tbl).repartition(8)
    windows, stats = run_windowed_stream_worker_fed(
        ds, window_s=3600, lateness_s=600, num_shards=4, drain_every=3)
    assert stats["dropped_late"] == 0
    assert stats["n_events"] == tbl.num_rows
    # the driver never feeds: all block→shard transfers happen off-driver
    assert stats["feeder_pids"] and os.getpid() not in stats["feeder_pids"]

    got = windows.to_pandas().sort_values(["window_start_us", "key"]) \
        .reset_index(drop=True)
    pdf = tbl.to_pandas()
    us = pdf["ts"].astype("int64")
    pdf["window_start_us"] = (us // (3600 * 1_000_000)) * (3600 * 1_000_000)
    exp = pdf.groupby(["window_start_us", "user_id"]).agg(
        n_events=("value", "size"), sum_value=("value", "sum")).reset_index() \
        .rename(columns={"user_id": "key"}) \
        .sort_values(["window_start_us", "key"]).reset_index(drop=True)
    assert got["n_events"].tolist() == exp["n_events"].tolist()
    assert got["sum_value"].to_numpy() == pytest.approx(
        exp["sum_value"].to_numpy())


def test_worker_fed_deterministic_late_drops(ray_session):
    """A DISORDERED log through the worker-fed topology drops late events
    deterministically (stamped watermarks depend only on block order and
    the inflight bound): two runs produce identical windows and stats."""
    import ray.data as rd
    from timezonemap_ray.pipelines.streaming import (
        run_windowed_stream_worker_fed)
    rng = np.random.default_rng(11)
    n = 20_000
    base = 1_700_000_000_000_000
    ts = base + rng.integers(0, 6 * 3600 * 1_000_000, n)  # NOT sorted
    tbl = pa.table({
        "user_id": rng.integers(0, 20, n).astype(np.int64),
        "ts": pa.array(ts, type=pa.int64()).cast(pa.timestamp("us")),
        "value": rng.uniform(0, 10, n),
    })
    ds = rd.from_arrow(tbl).repartition(16)
    runs = [run_windowed_stream_worker_fed(
        ds, window_s=600, lateness_s=60, num_shards=4,
        inflight=4, drain_every=3) for _ in range(2)]
    (w1, s1), (w2, s2) = runs
    assert s1["dropped_late"] == s2["dropped_late"]
    assert s1["dropped_late"] > 0  # the disorder actually exercises lateness
    pd.testing.assert_frame_equal(w1.to_pandas(), w2.to_pandas())
    # conservation: every event is either windowed or dropped-late
    assert int(w1.to_pandas()["n_events"].sum()) + s1["dropped_late"] == n


def test_worker_fed_crash_replay_exactly_once(ray_session):
    """fail_after on the worker-fed path: durably drained output + replay
    from the drained watermark equals the no-crash run exactly."""
    import ray.data as rd
    from timezonemap_ray.pipelines.streaming import (
        run_windowed_stream_worker_fed)
    tbl = _events()
    ds = rd.from_arrow(tbl).repartition(16)
    kw = dict(window_s=1800, lateness_s=300, num_shards=4,
              inflight=2, drain_every=2)
    full, _ = run_windowed_stream_worker_fed(ds, **kw)
    pre, s_pre = run_windowed_stream_worker_fed(ds, fail_after=10, **kw)
    wms = s_pre["drained_watermarks"]
    assert s_pre["crashed"] and len(wms) == 4
    assert 0 < pre.num_rows < full.num_rows
    post, s_post = run_windowed_stream_worker_fed(
        ds, resume_watermarks=wms, **kw)
    assert s_post["replay_skipped"] > 0
    combined = pa.concat_tables([pre, post]).to_pandas() \
        .sort_values(["window_start_us", "key"]).reset_index(drop=True)
    expected = full.to_pandas() \
        .sort_values(["window_start_us", "key"]).reset_index(drop=True)
    assert not combined.duplicated(["window_start_us", "key"]).any()
    pd.testing.assert_frame_equal(combined, expected)


def test_worker_fed_feed_retry_idempotent(ray_session):
    """A feeder task Ray retries after partial delivery must not
    double-accumulate: the same (batch, feed_key) applied twice counts
    once; a different key counts again."""
    from timezonemap_ray.pipelines.streaming import StreamingWindower
    base = 1_700_000_000_000_000
    t = pa.table({
        "user_id": pa.array([1, 1], type=pa.int64()),
        "ts": pa.array([base, base + 1_000_000],
                       type=pa.int64()).cast(pa.timestamp("us")),
        "value": pa.array([1.0, 2.0]),
    })
    shard = StreamingWindower.remote(3600, 600)
    import ray as _ray
    _ray.get(shard.feed_stamped.remote(t, -(1 << 62), feed_key=7))
    _ray.get(shard.feed_stamped.remote(t, -(1 << 62), feed_key=7))  # retry
    _ray.get(shard.feed_stamped.remote(t, -(1 << 62), feed_key=8))
    windows, _ = _ray.get(shard.flush.remote())
    w = windows.to_pandas()
    assert w["n_events"].sum() == 4          # 2 feeds, not 3
    assert w["sum_value"].sum() == pytest.approx(6.0)


def test_worker_fed_shard_side_writes(ray_session, tmp_path):
    """With out_dir the SHARDS write their drained windows as parquet —
    the driver sees only row counts; the files reproduce the in-memory
    result exactly."""
    import glob

    import pyarrow.parquet as pq
    import ray.data as rd
    from timezonemap_ray.pipelines.streaming import (
        run_windowed_stream_worker_fed)
    tbl = _events()
    ds = rd.from_arrow(tbl).repartition(8)
    kw = dict(window_s=3600, lateness_s=600, num_shards=4, drain_every=3)
    mem, _ = run_windowed_stream_worker_fed(ds, **kw)
    out = str(tmp_path / "windows")
    _, stats = run_windowed_stream_worker_fed(ds, out_dir=out, **kw)
    files = sorted(glob.glob(f"{out}/*.parquet"))
    assert files
    disk = pa.concat_tables([pq.read_table(f) for f in files]).to_pandas() \
        .sort_values(["window_start_us", "key"]).reset_index(drop=True)
    assert stats["drained_rows"] == len(disk)
    pd.testing.assert_frame_equal(
        disk, mem.to_pandas().sort_values(["window_start_us", "key"])
        .reset_index(drop=True))


def test_sharded_stream_equals_batch_groupby(ray_session):
    """2+ window shard actors (key-partitioned pool) agree with the batch
    groupby and with the single-actor stream."""
    import ray.data as rd
    tbl = _events()
    ds = rd.from_arrow(tbl).repartition(8)
    single, s1 = run_windowed_stream(ds, window_s=3600, lateness_s=600)
    sharded, s4 = run_windowed_stream(ds, window_s=3600, lateness_s=600,
                                      num_shards=4, drain_every=4)
    assert s4["num_shards"] == 4
    assert s4["dropped_late"] == 0
    a = single.to_pandas().reset_index(drop=True)
    b = sharded.to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_double_crash_replay_exactly_once(ray_session):
    """A replay run that crashes BEFORE its first drain must report the
    watermark it resumed FROM (drained_wm was initialized to -2^62, so a
    second resume re-emitted everything the first run had durably
    drained — review-found). Crash, resume-and-crash-immediately, then
    resume again: the three-run union must still equal the no-crash
    run exactly."""
    import ray.data as rd
    tbl = _events()
    ds = rd.from_arrow(tbl).repartition(8)
    kw = dict(window_s=3600, lateness_s=600, num_shards=4, drain_every=2,
              micro_batch=1024)
    full, _ = run_windowed_stream(ds, **kw)
    a, s_a = run_windowed_stream(ds, fail_after=7, **kw)
    # run B resumes but dies before its first drain (fail_after=1 <
    # drain_every=2): it drains nothing, and must NOT regress the
    # durable watermark below what run A reported
    b, s_b = run_windowed_stream(ds, fail_after=1,
                                 resume_watermarks=s_a[
                                     "drained_watermarks"], **kw)
    assert b.num_rows == 0
    assert s_b["drained_watermarks"] == s_a["drained_watermarks"]
    c, _ = run_windowed_stream(ds, resume_watermarks=s_b[
        "drained_watermarks"], **kw)
    combined = pa.concat_tables([a, b, c]).to_pandas() \
        .sort_values(["window_start_us", "key"]).reset_index(drop=True)
    assert not combined.duplicated(["window_start_us", "key"]).any()
    pd.testing.assert_frame_equal(
        combined, full.to_pandas()
        .sort_values(["window_start_us", "key"]).reset_index(drop=True))
