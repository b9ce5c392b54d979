"""Checkpointed, resumable join runs (SURVEY.md §4).

Two stages, both idempotent:

1. **Stage** the cell-keyed point table once, hash-partitioned by cell id
   into ``n_partitions`` shards (``out/staged/part_id=K/``). At 100 TB this
   is the one full pass over the input; it streams block-by-block and its
   completion is marked atomically.
2. **Join per partition**: every shard not yet in the manifest is read back
   (only its own directory — no rescan), joined against the broadcast index,
   and written by the WORKERS via ``write_parquet(partition_cols=["part_id"])``
   — the driver never touches a data block. Lineage
   ``(partition, n_rows, n_matched, n_fallback, checksum)`` is then computed
   from the COMMITTED files (a distributed read-back of the wave's own
   output): exactly-once by construction, immune to task-retry
   double-counting, and the ORDER-INDEPENDENT checksum (sum of per-row
   hashes mod 2^64, associative) certifies the bytes actually on disk. A
   killed run resumes by skipping manifested shards; non-manifested partial
   result dirs from a crashed wave are wiped before rewrite, so re-runs are
   value-identical.

The partition key is ``hash(cell_id) % n_partitions`` — co-located with the
join's cell granularity, so one shard's candidate polygon set is a small
subset of the index.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa


from .. import cells
from ..state.manifest import Manifest

STAGED_DONE = "_staged_done"
CHECKSUM_COLS = ("doc_id", "span_idx", "zone_id")


def _assign_partition(batch: pa.Table, cell_size: float, n_partitions: int,
                      lat_col="lat", lng_col="lng") -> pa.Table:
    c = cells.cell_ids(batch[lat_col].to_numpy(zero_copy_only=False),
                       batch[lng_col].to_numpy(zero_copy_only=False),
                       cell_size)
    part = (c * np.int64(2654435761) % np.int64(2 ** 31)) % n_partitions
    batch = batch.append_column("cell_id", pa.array(c, type=pa.int64()))
    return batch.append_column("part_id", pa.array(part, type=pa.int64()))


def _partial_stats(t: pa.Table, cols=CHECKSUM_COLS) -> dict:
    """Per-partition partial counters for ONE block: row/match/fallback
    counts plus an order-independent checksum (sum of deterministic per-row
    hashes — ``pd.util.hash_pandas_object`` uses a fixed key)."""
    import pandas as pd
    parts = t["part_id"].to_numpy(zero_copy_only=False)
    use = [c for c in cols if c in t.column_names]
    if use and t.num_rows:
        hashes = pd.util.hash_pandas_object(
            t.select(use).to_pandas(), index=False).to_numpy()
    else:
        hashes = np.zeros(len(parts), dtype=np.uint64)
    matched = (t["matched"].to_numpy(zero_copy_only=False)
               if "matched" in t.column_names else np.zeros(len(parts), bool))
    fb = (t["fallback"].to_numpy(zero_copy_only=False)
          if "fallback" in t.column_names else np.zeros(len(parts), bool))
    out = {}
    for k in np.unique(parts):
        m = parts == k
        out[int(k)] = {
            "n_rows": int(m.sum()),
            "n_matched": int(matched[m].sum()),
            "n_fallback": int(fb[m].sum()),
            "csum": int(hashes[m].sum(dtype=np.uint64)),
        }
    return out


def run_checkpointed(points_ds, engine, out_dir: str, n_partitions: int = 16,
                     want_all: bool = False, fallback: bool = False,
                     fail_after: int | None = None,
                     wave_size: int = 8) -> Manifest:
    """Run the join with per-partition checkpointing; safe to re-invoke after
    a crash. Pending partitions are processed in WAVES of ``wave_size`` —
    one Dataset execution per wave (amortizes per-execution overhead) while
    lineage stays per-partition, so a crash re-runs at most one wave and
    resume still skips every manifested partition. ``fail_after`` aborts
    after K partitions (test hook)."""
    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    manifest = Manifest(out_dir)
    staged = os.path.join(out_dir, "staged")
    marker = os.path.join(out_dir, STAGED_DONE)

    cell_size = engine.index.cell_size
    if not os.path.exists(marker):
        # a crash mid-staging leaves partial files; re-running write_parquet
        # into the same dir would APPEND and duplicate rows — wipe first
        if os.path.isdir(staged):
            shutil.rmtree(staged)
        # bind the SCALAR cell_size, not the engine: a lambda closing
        # over `engine` cloudpickles the whole polygon index into the
        # staging UDF shipped to every worker (review-found; reattach
        # below already uses default-arg binding for the same reason)
        keyed = points_ds.map_batches(
            lambda b, _cs=cell_size, _np=n_partitions:
                _assign_partition(b, _cs, _np),
            batch_format="pyarrow")
        keyed.write_parquet(staged, partition_cols=["part_id"])
        with open(marker, "w") as f:
            # record the partitioning parameters: a resume with a
            # DIFFERENT n_partitions would silently drop staged dirs
            # beyond the new range (or scatter rows outside the wave's
            # wipe list) — review-found
            import json as _json
            f.write(_json.dumps({"n_partitions": n_partitions,
                                 "cell_size": float(cell_size)}))
    else:
        import json as _json
        with open(marker) as f:
            raw = f.read()
        if raw != "ok":  # legacy markers predate the parameter record
            rec = _json.loads(raw)
            if (rec["n_partitions"] != n_partitions
                    or rec["cell_size"] != float(cell_size)):
                raise ValueError(
                    "run_checkpointed resume parameter mismatch: staged "
                    f"state has n_partitions={rec['n_partitions']}, "
                    f"cell_size={rec['cell_size']} but this invocation "
                    f"passed n_partitions={n_partitions}, "
                    f"cell_size={float(cell_size)} — resume with the "
                    "original parameters or delete the output dir")

    pending = [k for k in range(n_partitions)
               if os.path.isdir(os.path.join(staged, f"part_id={k}"))
               and not manifest.is_done(k)]
    result_root = os.path.join(out_dir, "result")

    done_count = 0
    while pending:
        wave = pending[:wave_size]
        if fail_after is not None:
            if done_count >= fail_after:
                raise RuntimeError("injected failure after "
                                   f"{done_count} partitions (test hook)")
            wave = wave[:fail_after - done_count]
        pending = pending[len(wave):]
        import glob
        files = sorted(f for k in wave for f in glob.glob(
            os.path.join(staged, f"part_id={k}", "*.parquet")))
        shard = rd.read_parquet(files)

        def reattach(b: pa.Table, _cs=engine.index.cell_size,
                     _np=n_partitions) -> pa.Table:
            # partition_cols strips part_id from row data on read; recompute
            return _assign_partition(
                b.drop_columns([c for c in ("cell_id", "part_id")
                                if c in b.column_names]), _cs, _np)

        shard = shard.map_batches(reattach, batch_format="pyarrow")
        joined = engine.lookup_points(shard, want_all=want_all,
                                      fallback=fallback)

        # a crashed wave leaves partial, unmanifested partition dirs —
        # wipe before rewriting so resume stays value-identical
        for k in wave:
            d = os.path.join(result_root, f"part_id={k}")
            if os.path.isdir(d):
                shutil.rmtree(d)

        joined.write_parquet(result_root, partition_cols=["part_id"])

        # lineage stats from the COMMITTED files (read back distributed):
        # exactly-once by construction — no in-stream side effects to
        # double-count under task retry, and the checksum covers the bytes
        # actually on disk. One extra read of the wave's own output is the
        # price of a checksum that certifies the committed data.
        stats = _stats_from_written(result_root, wave, n_partitions,
                                    engine.index.cell_size)
        for k in wave:
            s = stats.get(k, {"n_rows": 0, "n_matched": 0,
                              "n_fallback": 0, "csum": 0})
            manifest.record(k, n_rows=s["n_rows"], n_matched=s["n_matched"],
                            n_fallback=s["n_fallback"], checksum=s["csum"])
            done_count += 1
    return manifest


def _stats_from_written(result_root: str, wave, n_partitions: int,
                        cell_size: float) -> dict:
    """Per-partition counters + order-independent checksum computed from the
    wave's WRITTEN parquet partitions (workers read + reduce; the driver
    sees only tiny per-block partial dicts)."""
    import glob

    import ray.data as rd

    files = sorted(f for k in wave for f in glob.glob(
        os.path.join(result_root, f"part_id={k}", "*.parquet")))
    if not files:
        return {}

    def partials(b: pa.Table) -> pa.Table:
        # part_id is the partition dir, stripped from row data — recompute
        b = _assign_partition(
            b.drop_columns([c for c in ("cell_id", "part_id")
                            if c in b.column_names]), cell_size, n_partitions)
        rows = [{"part": k, **s} for k, s in _partial_stats(b).items()]
        # explicit types: csum is uint64 and overflows pylist inference
        return pa.table({
            "part": pa.array([r["part"] for r in rows], type=pa.int64()),
            "n_rows": pa.array([r["n_rows"] for r in rows], type=pa.int64()),
            "n_matched": pa.array([r["n_matched"] for r in rows],
                                  type=pa.int64()),
            "n_fallback": pa.array([r["n_fallback"] for r in rows],
                                   type=pa.int64()),
            "csum": pa.array([r["csum"] for r in rows], type=pa.uint64()),
        })

    out: dict = {}
    for row in rd.read_parquet(files).map_batches(
            partials, batch_format="pyarrow").take_all():
        agg = out.setdefault(int(row["part"]),
                             {"n_rows": 0, "n_matched": 0,
                              "n_fallback": 0, "csum": 0})
        agg["n_rows"] += int(row["n_rows"])
        agg["n_matched"] += int(row["n_matched"])
        agg["n_fallback"] += int(row["n_fallback"])
        agg["csum"] = (agg["csum"] + int(row["csum"])) % (1 << 64)
    return out
