"""Zero-copy (n, d) matrix extraction from Arrow list<float/double>
columns.

Every embedding operator used to rebuild its batch matrix with
``np.array(list(series))`` — one ndarray OBJECT per row across the pandas
boundary (60k objects per batch at bench grain, 60M at 100x). A
rectangular Arrow list array is ONE flat values buffer plus offsets, so
the matrix is a single reshape of a strided view; the object churn was
the cost, not the matmul (guide §4.2).

Shared by operators/knn.py (brute-force scorer, IVF cell assignment) and
operators/cluster.py (k-means assignment, SemDeDup batch routing).
"""

from __future__ import annotations

import numpy as np

__all__ = ["matrix_from_list_array"]


def matrix_from_list_array(arr, dtype=np.float64):
    """``(n, d)`` ndarray from a pyarrow List/LargeList/FixedSizeList
    array whose rows are all the same nonzero length and null-free;
    ``None`` when ragged, empty-width, or nulls present (caller falls
    back to its per-row path)."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0 or arr.null_count:
        return None
    try:
        offs = arr.offsets.to_numpy(zero_copy_only=False)
    except AttributeError:  # FixedSizeListArray has no offsets
        flat = arr.values.to_numpy(zero_copy_only=False)
        d = arr.type.list_size
        if d <= 0:
            return None
        return flat.astype(dtype, copy=False).reshape(n, d)
    widths = np.diff(offs)
    if not len(widths) or not (widths == widths[0]).all() or widths[0] <= 0:
        return None
    d = int(widths[0])
    flat = arr.values.to_numpy(zero_copy_only=False)
    return flat[offs[0]: offs[0] + n * d].astype(dtype, copy=False).reshape(n, d)
