"""Event-time tumbling windows with watermarks over a micro-batched stream.

The reference is strictly batch (SURVEY §1.4) — this is the engine-level
streaming extension: an actor holds open-window state; micro-batches of
events advance a watermark = max(event_time) - allowed_lateness; windows
whose end ≤ watermark are finalized and emitted exactly once; events
arriving behind the watermark are counted as dropped-late.

Shape: ``StreamingWindower`` is a Ray actor (genuinely mutable state);
``run_windowed_stream`` drives it from any Dataset via ordered
``iter_batches`` — the Dataset is the replayable log, the actor is the
operator state, and a crash replays from the last emitted watermark
(deterministic: same input order → same windows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


@ray.remote
class StreamingWindower:
    """Tumbling event-time windows: (window_start, key) → count/sum."""

    def __init__(self, window_s: int, lateness_s: int,
                 key_col: str = "user_id", ts_col: str = "ts",
                 val_col: str = "value"):
        self.window_us = int(window_s * 1_000_000)
        self.lateness_us = int(lateness_s * 1_000_000)
        self.key_col, self.ts_col, self.val_col = key_col, ts_col, val_col
        self.open: dict = {}        # (win_start_us, key) -> [n, sum]
        self.watermark_us = -(1 << 62)
        self.dropped_late = 0
        self.emitted = []

    def feed(self, batch: pa.Table) -> int:
        ts = batch[self.ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        keys = batch[self.key_col].to_numpy(zero_copy_only=False)
        vals = batch[self.val_col].to_numpy(zero_copy_only=False)
        late = ts < self.watermark_us
        self.dropped_late += int(late.sum())
        ok = ~late
        win = (ts[ok] // self.window_us) * self.window_us
        for w, k, v in zip(win, keys[ok], vals[ok]):
            slot = self.open.setdefault((int(w), int(k)), [0, 0.0])
            slot[0] += 1
            slot[1] += float(v)
        if ts.size:
            self.watermark_us = max(self.watermark_us,
                                    int(ts.max()) - self.lateness_us)
        return self._finalize()

    def _finalize(self) -> int:
        done = [wk for wk in self.open
                if wk[0] + self.window_us <= self.watermark_us]
        for wk in sorted(done):
            n, s = self.open.pop(wk)
            self.emitted.append({"window_start_us": wk[0], "key": wk[1],
                                 "n_events": n, "sum_value": s})
        return len(done)

    def flush(self) -> list:
        """End of stream: finalize every open window."""
        self.watermark_us = 1 << 62
        self._finalize()
        return self.emitted

    def stats(self) -> dict:
        return {"dropped_late": self.dropped_late,
                "open_windows": len(self.open),
                "emitted": len(self.emitted)}


def run_windowed_stream(ds, window_s: int = 3600, lateness_s: int = 600,
                        key_col="user_id", ts_col="ts", val_col="value",
                        micro_batch: int = 4096):
    """Drive a Dataset through the streaming windower in event order.

    Returns (windows: pa.Table, stats: dict). The sort is the stream's
    arrival order; to simulate disorder, pre-shuffle the Dataset.
    """
    actor = StreamingWindower.remote(window_s, lateness_s, key_col, ts_col,
                                     val_col)
    for b in ds.iter_batches(batch_size=micro_batch, batch_format="pyarrow"):
        ray.get(actor.feed.remote(pa.table(b)))
    rows = ray.get(actor.flush.remote())
    stats = ray.get(actor.stats.remote())
    if not rows:
        return pa.table({"window_start_us": pa.array([], type=pa.int64()),
                         "key": pa.array([], type=pa.int64()),
                         "n_events": pa.array([], type=pa.int64()),
                         "sum_value": pa.array([], type=pa.float64())}), stats
    return pa.Table.from_pylist(rows), stats
