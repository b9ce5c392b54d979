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
                     fail_after: int | None = None) -> Manifest:
    """Run the join with per-partition checkpointing; safe to re-invoke after
    a crash. ``fail_after`` aborts after K partitions (test hook)."""
    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    manifest = Manifest(out_dir)
    staged = os.path.join(out_dir, "staged")
    marker = os.path.join(out_dir, STAGED_DONE)

    if not os.path.exists(marker):
        keyed = points_ds.map_batches(
            lambda b: _assign_partition(b, engine.index.cell_size, n_partitions),
            batch_format="pyarrow")
        keyed.write_parquet(staged, partition_cols=["part_id"])
        with open(marker, "w") as f:
            f.write("ok")

    done_count = 0
    for k in range(n_partitions):
        part_dir = os.path.join(staged, f"part_id={k}")
        if not os.path.isdir(part_dir):
            continue  # no rows hashed into this shard
        if manifest.is_done(k):
            continue
        if fail_after is not None and done_count >= fail_after:
            raise RuntimeError("injected failure after "
                               f"{done_count} partitions (test hook)")
        shard = rd.read_parquet(part_dir)
        joined = engine.lookup_points(shard, want_all=want_all, fallback=fallback)
        result = joined.materialize()
        res_dir = os.path.join(out_dir, "result", f"part_id={k}")
        result.write_parquet(res_dir)
        batches = list(result.iter_batches(batch_format="pyarrow"))
        tbl = pa.concat_tables([pa.table(b) for b in batches]) if batches \
            else pa.table({})
        n_matched = int(sum(b["matched"].to_numpy(zero_copy_only=False).sum()
                            for b in batches))
        n_fb = int(sum(b["fallback"].to_numpy(zero_copy_only=False).sum()
                       for b in batches))
        manifest.record(k, n_rows=tbl.num_rows, n_matched=n_matched,
                        n_fallback=n_fb, checksum=_checksum(tbl))
        done_count += 1
    return manifest
