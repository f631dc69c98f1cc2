"""Zero-copy Arrow-native bulk measures (r9 — the 100 TB fast lane for
elementwise sweeps).

The pandas-UDF path materializes one Python ``bytes`` object per row when
Arrow hands the EWKB column to pandas — at 60 M rows that object churn IS
the cost (the r8 100x ramp's ``b1_elementwise`` was memory-bandwidth bound
at a 5.2 s floor). ``measure_arrow`` runs through ``mapInArrow`` instead:
the worker receives the raw Arrow buffers (validity / int32 offsets /
flat byte data) and the uniform-geometry fast parse operates directly on
the flat buffer as numpy strided views — no per-row objects anywhere.

Semantics are identical to ``st_area`` / ``st_length`` (same translated
shoelace / perimeter arithmetic as the pandas fast path in
``functions/scalar.py``; rows outside the uniform envelope fall back to
the exact per-row kernels), asserted row-for-row in
``tests/test_arrowpath.py`` and hash-checked against a closed-form DuckDB
oracle in the ``arrow_measure`` driver gate.

Reference: the measure surface of §2.3 (functions.rs:794-817); this module
is a physical-plan alternative, not new semantics.
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame

__all__ = ["bounds_arrow", "measure_arrow"]

_SRID_FLAG = 0x20000000
_ZM_FLAGS = 0x80000000 | 0x40000000


def _flat_views(arr):
    """(offsets int64 (n+1,), data uint8 view, valid mask or None) for a
    pyarrow Binary/LargeBinary array, honoring the array offset."""
    bufs = arr.buffers()
    off_dt = np.int64 if "large" in str(arr.type) else np.int32
    offs = np.frombuffer(bufs[1], dtype=off_dt)[arr.offset: arr.offset + len(arr) + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    valid = None
    if arr.null_count:
        vbits = np.frombuffer(bufs[0], dtype=np.uint8)
        idx = np.arange(arr.offset, arr.offset + len(arr))
        valid = (vbits[idx >> 3] >> (idx & 7) & 1).astype(bool)
    return offs.astype(np.int64), data, valid


def _uniform_measures(offs, data, valid):
    """(area, length) float64 arrays for a structurally-uniform batch, or
    None when the batch leaves the fast envelope (mixed layouts, Z/M,
    multi-ring, big-endian, nulls)."""
    n = len(offs) - 1
    if n == 0 or valid is not None:
        return None
    lens = np.diff(offs)
    L = int(lens[0])
    if L < 21 or not bool((lens == L).all()):
        return None
    base_off = int(offs[0])
    if data[base_off] != 1:
        return None
    (word,) = struct.unpack_from("<I", data, base_off + 1)
    if word & _ZM_FLAGS:
        return None
    head = 5 + (4 if word & _SRID_FLAG else 0)
    gtype = word & 0xFF
    if gtype == 1 and L == head + 16:  # Point
        prefix_len = head
        npts = 1
    elif gtype == 3 and L >= head + 8 + 4 * 16:  # Polygon
        (nrings,) = struct.unpack_from("<I", data, base_off + head)
        if nrings != 1:
            return None
        (npts,) = struct.unpack_from("<I", data, base_off + head + 4)
        if L != head + 8 + npts * 16:
            return None
        prefix_len = head + 8
    else:
        return None
    # every row must share the FULL structural prefix (endian, type word,
    # srid, count words) — same rule as wkb.batch_uniform
    mat = np.ndarray(shape=(n, prefix_len), dtype=np.uint8,
                     buffer=data, offset=base_off, strides=(L, 1))
    if not bool((mat == mat[0]).all()):
        return None
    coords = np.ndarray(shape=(n, npts * 2), dtype="<f8",
                        buffer=data, offset=base_off + prefix_len,
                        strides=(L, 8))
    if gtype == 1:
        z = np.zeros(n, dtype=np.float64)
        return z, z.copy()
    c = coords.reshape(n, npts, 2)
    # translate to each ring's first vertex (same cancellation robustness
    # and arithmetic order as scalar._area_udf's ring path)
    x = c[:, :, 0] - c[:, :1, 0]
    y = c[:, :, 1] - c[:, :1, 1]
    area = 0.5 * np.abs(
        np.sum(x * np.roll(y, -1, axis=1) - np.roll(x, -1, axis=1) * y, axis=1))
    d = np.diff(c, axis=1)
    length = np.sqrt((d * d).sum(axis=2)).sum(axis=1)
    return area, length


def _fallback_measures(arr):
    """Exact per-row kernels for batches outside the uniform envelope."""
    from polars_st_spark.geo import algos
    from polars_st_spark.geo.wkb import from_ewkb

    area = np.full(len(arr), np.nan)
    length = np.full(len(arr), np.nan)
    for i, v in enumerate(arr):
        b = v.as_py()
        if b is None:
            continue
        g = from_ewkb(bytes(b))
        area[i] = algos.area(g)
        length[i] = algos.length(g)
    return area, length


def measure_arrow(df: DataFrame, col: str, keep: tuple = ()) -> DataFrame:
    """``df`` + EWKB column → DataFrame of ``keep`` columns + ``area`` /
    ``length`` doubles, computed zero-copy on the Arrow buffers (see module
    docstring). Null geometry → null measures."""
    import pyarrow as pa

    names = list(keep) + ["area", "length"]
    in_schema = df.select(*keep, col).schema
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in in_schema if f.name != col
    )
    out_schema = (out_fields + ", " if out_fields else "") + "area double, length double"
    gcol = col

    def fn(batches):
        for rb in batches:
            arr = rb.column(rb.schema.get_field_index(gcol))
            offs, data, valid = _flat_views(arr)
            fast = _uniform_measures(offs, data, valid)
            if fast is None:
                area, length = _fallback_measures(arr)
            else:
                area, length = fast
            mask = None
            if valid is not None:
                mask = ~valid
            elif fast is None:
                mask = np.array([arr[i].as_py() is None for i in range(len(arr))])
            cols = [rb.column(rb.schema.get_field_index(k)) for k in names[:-2]]
            cols.append(pa.array(area, type=pa.float64(),
                                 mask=mask if mask is not None else None))
            cols.append(pa.array(length, type=pa.float64(),
                                 mask=mask if mask is not None else None))
            yield pa.RecordBatch.from_arrays(cols, names)

    return df.select(*keep, col).mapInArrow(fn, out_schema)


def _uniform_bounds(offs, data, valid):
    """(xmin, ymin, xmax, ymax) float64 arrays for a structurally-uniform
    batch, or None outside the fast envelope (same rules as
    _uniform_measures)."""
    n = len(offs) - 1
    if n == 0 or valid is not None:
        return None
    lens = np.diff(offs)
    L = int(lens[0])
    if L < 21 or not bool((lens == L).all()):
        return None
    base_off = int(offs[0])
    if data[base_off] != 1:
        return None
    (word,) = struct.unpack_from("<I", data, base_off + 1)
    if word & _ZM_FLAGS:
        return None
    head = 5 + (4 if word & _SRID_FLAG else 0)
    gtype = word & 0xFF
    if gtype == 1 and L == head + 16:
        prefix_len, npts = head, 1
    elif gtype == 3 and L >= head + 8 + 4 * 16:
        (nrings,) = struct.unpack_from("<I", data, base_off + head)
        if nrings != 1:
            return None
        (npts,) = struct.unpack_from("<I", data, base_off + head + 4)
        if L != head + 8 + npts * 16:
            return None
        prefix_len = head + 8
    else:
        return None
    mat = np.ndarray(shape=(n, prefix_len), dtype=np.uint8,
                     buffer=data, offset=base_off, strides=(L, 1))
    if not bool((mat == mat[0]).all()):
        return None
    coords = np.ndarray(shape=(n, npts * 2), dtype="<f8",
                        buffer=data, offset=base_off + prefix_len,
                        strides=(L, 8)).reshape(n, npts, 2)
    x, y = coords[:, :, 0], coords[:, :, 1]
    return (x.min(axis=1), y.min(axis=1), x.max(axis=1), y.max(axis=1))


def _fallback_bounds(arr):
    from polars_st_spark.geo.wkb import from_ewkb

    out = np.full((len(arr), 4), np.nan)
    for i, v in enumerate(arr):
        b = v.as_py()
        if b is None:
            continue
        out[i] = from_ewkb(bytes(b)).bounds()
    return out[:, 0], out[:, 1], out[:, 2], out[:, 3]


def bounds_arrow(df: DataFrame, col: str, keep: tuple = ()) -> DataFrame:
    """``df`` + EWKB column → ``keep`` columns + ``xmin/ymin/xmax/ymax``
    doubles, zero-copy on the Arrow buffers — the scale path for bbox
    materialization at ingest (the columns ``plans.materialize_bbox`` /
    ``filter_pairs``'s prune want native). Same values as ``st_bounds``
    (NaN for empties via the fallback kernel); null geometry → null row
    values."""
    import pyarrow as pa

    names = list(keep) + ["xmin", "ymin", "xmax", "ymax"]
    in_schema = df.select(*keep, col).schema
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in in_schema if f.name != col
    )
    out_schema = ((out_fields + ", " if out_fields else "")
                  + "xmin double, ymin double, xmax double, ymax double")
    gcol = col

    def fn(batches):
        for rb in batches:
            arr = rb.column(rb.schema.get_field_index(gcol))
            offs, data, valid = _flat_views(arr)
            fast = _uniform_bounds(offs, data, valid)
            if fast is None:
                vals = _fallback_bounds(arr)
                mask = np.array(
                    [arr[i].as_py() is None for i in range(len(arr))])
            else:
                vals = fast
                mask = None
            cols = [rb.column(rb.schema.get_field_index(k)) for k in names[:-4]]
            for v in vals:
                cols.append(pa.array(np.ascontiguousarray(v),
                                     type=pa.float64(), mask=mask))
            yield pa.RecordBatch.from_arrays(cols, names)

    return df.select(*keep, col).mapInArrow(fn, out_schema)
