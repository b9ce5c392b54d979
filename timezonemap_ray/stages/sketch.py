"""Distributed sketches — approximate distinct counting (HyperLogLog).

SURVEY §2 notes the reference has no approximate operators; the 100 TB
engine needs them. HLL here is the canonical mergeable-sketch shape: each
Arrow block folds into a tiny register array inside ``map_batches``, block
sketches merge by elementwise max — an all-reduce of ``2^p`` bytes instead
of a distinct shuffle of the full key column.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _hash64(values: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix of an int64/any column (splitmix64)."""
    x = values.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += np.uint64(0x9E3779B97F4A7C15)
        z = x
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


def hll_register_block(values, p: int = 12) -> np.ndarray:
    """One block's HLL registers (uint8 array of size 2^p)."""
    m = 1 << p
    h = _hash64(np.asarray(values))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)
    # rank = leading zeros of the remaining 64-p bits, +1
    lz = np.full(h.size, 64 - p, dtype=np.uint8)
    found = np.zeros(h.size, dtype=bool)
    for bit in range(64 - p):
        is_set = ~found & ((rest >> np.uint64(63 - bit)) & np.uint64(1)).astype(bool)
        lz[is_set] = bit
        found |= is_set
    rank = (lz + 1).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with small-range correction."""
    m = regs.size
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def approx_distinct(ds, column: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT column) over a Dataset.

    Per-block register folds run distributed; block sketches stream back as
    2^p-byte rows and merge on the driver by elementwise max.
    """
    def fold(b: pa.Table) -> pa.Table:
        v = b[column].to_numpy(zero_copy_only=False)
        if v.dtype == object:
            from .text import hash_u64
            v = np.array([hash_u64(str(x)) for x in v], dtype=np.uint64)
        regs = hll_register_block(v, p=p)
        return pa.table({"regs": pa.array([regs.tobytes()], type=pa.binary())})

    merged = np.zeros(1 << p, dtype=np.uint8)
    for batch in ds.map_batches(fold, batch_format="pyarrow") \
                   .iter_batches(batch_format="pyarrow"):
        for blob in batch["regs"]:
            merged = np.maximum(merged,
                                np.frombuffer(blob.as_py(), dtype=np.uint8))
    return hll_estimate(merged)
