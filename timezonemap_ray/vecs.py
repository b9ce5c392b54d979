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

    Fast path: flatten once + reshape (no per-row Python). Ragged or
    null-bearing list columns fall through to ``np.array(to_pylist())``,
    which RAISES rather than silently building a wrong matrix — embedding
    columns are equal-width and null-free by contract."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.FixedSizeListArray) and col.null_count == 0:
        dim = col.type.list_size
        flat = col.flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(len(col), dim).astype(dtype, copy=False)
    if isinstance(col, (pa.ListArray, pa.LargeListArray)) \
            and col.null_count == 0 and len(col):
        offsets = col.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offsets)
        if widths.size and (widths == widths[0]).all():
            flat = col.flatten().to_numpy(zero_copy_only=False)
            return flat.reshape(widths.size, int(widths[0])) \
                .astype(dtype, copy=False)
    return np.array(col.to_pylist(), dtype=dtype)
