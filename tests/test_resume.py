"""Checkpoint/resume: a killed run resumes without recomputing completed
partitions and produces byte-identical output (SURVEY.md §4)."""

import glob
import os

import pandas as pd
import pytest

from timezonemap_ray import worlds
from timezonemap_ray.api import TimeZoneEngine
from timezonemap_ray.index import build_index
from timezonemap_ray.pipelines import flagship as fs
from timezonemap_ray.pipelines.checkpoint import run_checkpointed
from timezonemap_ray.state.manifest import Manifest


@pytest.fixture(scope="module")
def engine(ray_session):
    return TimeZoneEngine(build_index(worlds.conformance_table()))


def _result_df(out_dir):
    files = sorted(glob.glob(os.path.join(out_dir, "result", "**", "*.parquet"),
                             recursive=True))
    df = pd.concat([pd.read_parquet(f) for f in files])
    df["zone_id"] = df["zone_id"].astype("object")
    return df.sort_values(["doc_id", "span_idx"]).reset_index(drop=True)


def test_resume_after_failure(ray_session, sf_dir, engine, tmp_path):
    pts = fs.geo_points(sf_dir)
    full_dir = str(tmp_path / "full")
    run_checkpointed(pts, engine, full_dir, n_partitions=8)
    expected = _result_df(full_dir)

    # killed run: fails after 3 partitions
    part_dir = str(tmp_path / "partial")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_checkpointed(pts, engine, part_dir, n_partitions=8, fail_after=3)
    m = Manifest(part_dir)
    done_before = m.completed()
    assert len(done_before) == 3

    # record mtimes of completed partition outputs
    mtimes = {}
    for k in done_before:
        for f in glob.glob(os.path.join(part_dir, "result", f"part_id={k}", "*")):
            mtimes[f] = os.path.getmtime(f)

    # resume: completes the rest, does NOT rewrite finished partitions
    run_checkpointed(pts, engine, part_dir, n_partitions=8)
    for f, t in mtimes.items():
        assert os.path.getmtime(f) == t, f"recomputed completed partition: {f}"

    got = _result_df(part_dir)
    cols = ["doc_id", "span_idx", "lat", "lng", "zone_id", "matched"]
    pd.testing.assert_frame_equal(got[cols], expected[cols])

    # lineage counters aggregate
    c = Manifest(part_dir).counters()
    assert c["n_rows"] == len(got)
    assert c["n_matched"] == int(got["matched"].sum())

    # per-partition checksums identical between the two runs
    mf, mp = Manifest(full_dir), Manifest(part_dir)
    assert mf.completed() == mp.completed()
    for k in mf.completed():
        assert mf.read(k)["checksum"] == mp.read(k)["checksum"]


def test_resume_after_staging_crash(ray_session, sf_dir, engine, tmp_path):
    """A crash DURING staging leaves partial files without the marker; the
    restart must wipe and re-stage, not append duplicate rows."""
    import shutil
    pts = fs.geo_points(sf_dir)
    out = str(tmp_path / "stagecrash")
    run_checkpointed(pts, engine, out, n_partitions=4)
    expected = _result_df(out)

    out2 = str(tmp_path / "stagecrash2")
    # simulate the crash: stage fully, then remove the marker and one shard
    # (partial staging state), keep stale files in the remaining shards
    run_checkpointed(pts, engine, out2, n_partitions=4)
    shutil.rmtree(os.path.join(out2, "result"))
    shutil.rmtree(os.path.join(out2, "_manifest"))
    os.remove(os.path.join(out2, "_staged_done"))
    shutil.rmtree(glob.glob(os.path.join(out2, "staged", "part_id=*"))[0])

    run_checkpointed(pts, engine, out2, n_partitions=4)
    got = _result_df(out2)
    cols = ["doc_id", "span_idx", "lat", "lng", "zone_id", "matched"]
    pd.testing.assert_frame_equal(got[cols], expected[cols])


def test_resume_rejects_changed_partitioning(ray_session, sf_dir, engine,
                                             tmp_path):
    """Resuming with a different n_partitions used to silently drop the
    staged dirs beyond the new range (review-found) — the staged marker
    now records the partitioning parameters and the resume validates
    them."""
    pts = fs.geo_points(sf_dir)
    d = str(tmp_path / "mismatch")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_checkpointed(pts, engine, d, n_partitions=8, fail_after=3)
    with pytest.raises(ValueError, match="parameter mismatch"):
        run_checkpointed(pts, engine, d, n_partitions=16)
    # the original parameters still resume cleanly
    run_checkpointed(pts, engine, d, n_partitions=8)
    assert len(Manifest(d).completed()) == 8
