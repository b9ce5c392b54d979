"""Per-partition lineage manifest for checkpoint/resume (SURVEY.md §4).

Each completed partition gets an atomically-written JSON record
``{partition, n_rows, n_matched, n_fallback, checksum, input_fingerprint}``.
A restarted job reads the manifest, skips completed partitions, and produces
byte-identical output for the rest (joiner stages are deterministic).
Atomicity = write to a temp file + ``os.replace`` (POSIX rename).
"""

from __future__ import annotations

import json
import os


class Manifest:
    def __init__(self, out_dir: str):
        self.dir = os.path.join(out_dir, "_manifest")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, partition) -> str:
        return os.path.join(self.dir, f"part-{partition}.json")

    def completed(self) -> set:
        done = set()
        for name in os.listdir(self.dir):
            if name.startswith("part-") and name.endswith(".json"):
                done.add(name[len("part-"):-len(".json")])
        return done

    def is_done(self, partition) -> bool:
        return os.path.exists(self._path(partition))

    def record(self, partition, **stats) -> None:
        tmp = self._path(partition) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"partition": str(partition), **stats}, f)
        os.replace(tmp, self._path(partition))

    def read(self, partition) -> dict:
        with open(self._path(partition)) as f:
            return json.load(f)

    def counters(self) -> dict:
        """Aggregate counters across completed partitions."""
        total = {"n_rows": 0, "n_matched": 0, "n_fallback": 0}
        for p in self.completed():
            rec = self.read(p)
            for k in total:
                total[k] += rec.get(k, 0)
        return total
