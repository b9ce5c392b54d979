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
   ``(partition, n_rows, n_matched, n_fallback, checksum)`` is collected by a
   tiny stats actor fed per-block partial counts + an ORDER-INDEPENDENT
   checksum (sum of per-row hashes mod 2^64, associative ⇒ identical however
   Ray schedules the blocks), then committed atomically per partition. A
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

import ray

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


@ray.remote(num_cpus=0)
class _StatsCollector:
    """Associative merge of per-block partial stats (tiny dicts, never data).

    Idempotent under Ray task RETRY: a re-executed block recomputes the
    identical partial (the join is deterministic), so partials are deduped
    by content fingerprint before merging — the manifest can never
    double-count a retried block. (Two distinct blocks colliding on the
    fingerprint requires equal per-partition row-hash sums — ~2^-64.)"""

    def __init__(self):
        self.stats: dict = {}
        self.seen: set = set()

    def add(self, partial: dict) -> None:
        fp = tuple(sorted((k, s["n_rows"], s["n_matched"],
                           s["n_fallback"], s["csum"])
                          for k, s in partial.items()))
        if fp in self.seen:
            return
        self.seen.add(fp)
        for k, s in partial.items():
            agg = self.stats.setdefault(
                k, {"n_rows": 0, "n_matched": 0, "n_fallback": 0, "csum": 0})
            agg["n_rows"] += s["n_rows"]
            agg["n_matched"] += s["n_matched"]
            agg["n_fallback"] += s["n_fallback"]
            agg["csum"] = (agg["csum"] + s["csum"]) % (1 << 64)

    def get(self) -> dict:
        return self.stats


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

        collector = _StatsCollector.remote()

        def tally(b: pa.Table, _c=collector) -> pa.Table:
            # blocking get ⇒ every partial is recorded before the block is
            # considered written; the payload is a tiny per-partition dict
            ray.get(_c.add.remote(_partial_stats(b)))
            return b

        joined.map_batches(tally, batch_format="pyarrow") \
              .write_parquet(result_root, partition_cols=["part_id"])
        stats = ray.get(collector.get.remote())
        for k in wave:
            s = stats.get(k, {"n_rows": 0, "n_matched": 0,
                              "n_fallback": 0, "csum": 0})
            manifest.record(k, n_rows=s["n_rows"], n_matched=s["n_matched"],
                            n_fallback=s["n_fallback"], checksum=s["csum"])
            done_count += 1
    return manifest
