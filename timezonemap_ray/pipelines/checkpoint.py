"""Checkpointed, resumable join runs (SURVEY.md §4).

Two stages, both idempotent:

1. **Stage** the cell-keyed point table once, hash-partitioned by cell id
   into ``n_partitions`` shards (``out/staged/part_id=K/``). At 100 TB this
   is the one full pass over the input; it streams block-by-block and its
   completion is marked atomically.
2. **Join per partition**: every shard not yet in the manifest is read back
   (only its own directory — no rescan), joined against the broadcast index,
   written to ``out/result/part_id=K/``, then its lineage record
   ``(partition, n_rows, n_matched, n_fallback, checksum)`` is committed
   atomically. A killed run resumes by skipping manifested shards; the
   joiner is deterministic, so re-runs are byte-identical.

The partition key is ``hash(cell_id) % n_partitions`` — co-located with the
join's cell granularity, so one shard's candidate polygon set is a small
subset of the index.
"""

from __future__ import annotations

import os
import zlib

import pyarrow.parquet as pq

import numpy as np
import pyarrow as pa

from .. import cells
from ..state.manifest import Manifest

STAGED_DONE = "_staged_done"


def _assign_partition(batch: pa.Table, cell_size: float, n_partitions: int,
                      lat_col="lat", lng_col="lng") -> pa.Table:
    c = cells.cell_ids(batch[lat_col].to_numpy(zero_copy_only=False),
                       batch[lng_col].to_numpy(zero_copy_only=False),
                       cell_size)
    part = (c * np.int64(2654435761) % np.int64(2 ** 31)) % n_partitions
    batch = batch.append_column("cell_id", pa.array(c, type=pa.int64()))
    return batch.append_column("part_id", pa.array(part, type=pa.int64()))


def _checksum(table: pa.Table, cols=("doc_id", "span_idx", "zone_id")) -> int:
    use = [c for c in cols if c in table.column_names]
    if not use or table.num_rows == 0:
        return 0
    rows = sorted(zip(*[table[c].to_pylist() for c in use]))
    return zlib.crc32(repr(rows).encode())


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

    if not os.path.exists(marker):
        # a crash mid-staging leaves partial files; re-running write_parquet
        # into the same dir would APPEND and duplicate rows — wipe first
        if os.path.isdir(staged):
            import shutil
            shutil.rmtree(staged)
        keyed = points_ds.map_batches(
            lambda b: _assign_partition(b, engine.index.cell_size, n_partitions),
            batch_format="pyarrow")
        keyed.write_parquet(staged, partition_cols=["part_id"])
        with open(marker, "w") as f:
            f.write("ok")

    pending = [k for k in range(n_partitions)
               if os.path.isdir(os.path.join(staged, f"part_id={k}"))
               and not manifest.is_done(k)]

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
        per_part: dict[int, list] = {k: [] for k in wave}
        for b in joined.iter_batches(batch_size=65536, batch_format="pyarrow"):
            t = pa.table(b)
            parts = t["part_id"].to_numpy(zero_copy_only=False)
            for k in np.unique(parts):
                per_part[int(k)].append(t.filter(pa.array(parts == k)))
        for k in wave:
            tbl = pa.concat_tables(per_part[k]) if per_part[k] else pa.table({})
            res_dir = os.path.join(out_dir, "result", f"part_id={k}")
            os.makedirs(res_dir, exist_ok=True)
            pq.write_table(tbl, os.path.join(res_dir, "data.parquet"))
            n_matched = int(tbl["matched"].to_numpy(
                zero_copy_only=False).sum()) if tbl.num_rows else 0
            n_fb = int(tbl["fallback"].to_numpy(
                zero_copy_only=False).sum()) if tbl.num_rows else 0
            manifest.record(k, n_rows=tbl.num_rows, n_matched=n_matched,
                            n_fallback=n_fb, checksum=_checksum(tbl))
            done_count += 1
    return manifest
