"""Arrow list-column ↔ numpy matrix conversion for embedding stages.

``to_pylist()`` on a ``list<float>`` column materializes one Python list
per row — the dominant cost of the ANN/embedding-dedup block kernels at
scale. Equal-width lists (every embedding column here) flatten to ONE
contiguous buffer and reshape without touching Python objects.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def list_column_to_matrix(col, dtype=np.float64) -> np.ndarray:
    """(n, dim) matrix from a ``list<T>`` / ``fixed_size_list<T>`` column.

    Fast path: flatten once + reshape (no per-row Python). Null rows or
    null ELEMENTS raise — both the reshape path and numpy's
    ``np.array(to_pylist())`` would otherwise silently map None → NaN and
    poison downstream similarities (review-found); embedding columns are
    equal-width and null-free by contract. Ragged lists raise in the
    numpy fallback."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, (pa.FixedSizeListArray, pa.ListArray,
                        pa.LargeListArray)):
        if col.null_count or col.flatten().null_count:
            raise ValueError(
                "embedding column contains null rows or null elements")
    if isinstance(col, pa.FixedSizeListArray):
        dim = col.type.list_size
        return col.flatten().to_numpy(zero_copy_only=False) \
            .reshape(len(col), dim).astype(dtype, copy=False)
    if isinstance(col, (pa.ListArray, pa.LargeListArray)) and len(col):
        offsets = col.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offsets)
        if widths.size and (widths == widths[0]).all():
            return col.flatten().to_numpy(zero_copy_only=False) \
                .reshape(widths.size, int(widths[0])) \
                .astype(dtype, copy=False)
    return np.array(col.to_pylist(), dtype=dtype)
