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

__all__ = ["bounds_arrow", "measure_arrow", "predicate_arrow"]

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


def _uniform_coords(offs, data, valid):
    """Parsed coordinates for a structurally-uniform batch: ``(coords,
    gtype, rows)`` where ``coords`` is float64 ``(n_valid, npts, 2)``,
    ``gtype`` is 1 (Point) or 3 (single-ring Polygon) and ``rows`` is the
    int index array of the batch rows the coords belong to (all rows when
    the batch has no nulls). Returns None when the VALID rows leave the
    fast envelope (mixed layouts, Z/M, multi-ring, big-endian).

    Nulls no longer abort the batch (VERDICT r9 "What's wrong" #2 — one
    null row used to drop a whole 10k-row Arrow batch to the per-row
    kernels, so at 100 TB with sparse nulls the fast lane would rarely
    engage): null slots are simply excluded from the uniformity check and
    the coords are GATHERED from the valid slots' offsets — one vectorized
    fancy-index copy instead of n_valid Python objects. The no-null path
    stays a true zero-copy strided view."""
    n = len(offs) - 1
    if n == 0:
        return None
    if valid is None:
        rows = None
        starts = None
        lens = np.diff(offs)
        nv = n
    else:
        rows = np.flatnonzero(valid)
        nv = len(rows)
        if nv == 0:
            return None
        starts = offs[rows]
        lens = offs[rows + 1] - starts
    L = int(lens[0])
    if L < 21 or not bool((lens == L).all()):
        return None
    base_off = int(offs[0] if starts is None else starts[0])
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
    if starts is None:
        # every row must share the FULL structural prefix (endian, type
        # word, srid, count words) — same rule as wkb.batch_uniform
        mat = np.ndarray(shape=(nv, prefix_len), dtype=np.uint8,
                         buffer=data, offset=base_off, strides=(L, 1))
        if not bool((mat == mat[0]).all()):
            return None
        coords = np.ndarray(shape=(nv, npts * 2), dtype="<f8",
                            buffer=data, offset=base_off + prefix_len,
                            strides=(L, 8)).reshape(nv, npts, 2)
    else:
        pref = data[starts[:, None] + np.arange(prefix_len)]
        if not bool((pref == pref[0]).all()):
            return None
        cb = data[starts[:, None] + (prefix_len + np.arange(npts * 16))]
        coords = np.ascontiguousarray(cb).view("<f8").reshape(nv, npts, 2)
    return coords, gtype, rows


def _uniform_measures(offs, data, valid):
    """(area, length) float64 arrays (full batch length, NaN at null
    slots) for a structurally-uniform batch, or None when the valid rows
    leave the fast envelope."""
    parsed = _uniform_coords(offs, data, valid)
    if parsed is None:
        return None
    c, gtype, rows = parsed
    n = len(offs) - 1
    if gtype == 1:
        area = np.zeros(n, dtype=np.float64)
        length = np.zeros(n, dtype=np.float64)
        if rows is not None:
            area[:] = np.nan
            length[:] = np.nan
            area[rows] = 0.0
            length[rows] = 0.0
        return area, length
    # translate to each ring's first vertex (same cancellation robustness
    # and arithmetic order as scalar._area_udf's ring path)
    x = c[:, :, 0] - c[:, :1, 0]
    y = c[:, :, 1] - c[:, :1, 1]
    a = 0.5 * np.abs(
        np.sum(x * np.roll(y, -1, axis=1) - np.roll(x, -1, axis=1) * y, axis=1))
    d = np.diff(c, axis=1)
    ln = np.sqrt((d * d).sum(axis=2)).sum(axis=1)
    if rows is None:
        return a, ln
    area = np.full(n, np.nan)
    length = np.full(n, np.nan)
    area[rows] = a
    length[rows] = ln
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


def _rect_box(coords, gtype):
    """Per-row (xmin, ymin, xmax, ymax) plus an ``is_exact`` mask for rows
    whose geometry the box REPRESENTS EXACTLY under set predicates: points
    (degenerate box) and axis-aligned closed rectangles (5-point ring,
    every edge axis-parallel, positive bbox area equal to the shoelace
    area — excludes bowties and slivers). Rows outside that class get
    is_exact=False and must take the exact per-row kernel."""
    x, y = coords[:, :, 0], coords[:, :, 1]
    box = (x.min(axis=1), y.min(axis=1), x.max(axis=1), y.max(axis=1))
    if gtype == 1:
        return box, np.ones(len(coords), dtype=bool)
    if coords.shape[1] != 5:
        return box, np.zeros(len(coords), dtype=bool)
    dx = np.diff(x, axis=1)
    dy = np.diff(y, axis=1)
    closed = (x[:, 0] == x[:, 4]) & (y[:, 0] == y[:, 4])
    axis_par = ((dx == 0) | (dy == 0)).all(axis=1)
    bbox_area = (box[2] - box[0]) * (box[3] - box[1])
    shoelace = 0.5 * np.abs(
        np.sum(x * np.roll(y, -1, axis=1) - np.roll(x, -1, axis=1) * y, axis=1))
    return box, closed & axis_par & (bbox_area > 0) & (shoelace == bbox_area)


_BOX_PREDICATES = ("intersects", "within", "contains", "covers", "covered_by")


def _box_predicate(pred, lb, rb):
    """Exact predicate over boxes that ARE the geometries (see _rect_box).
    intersects: closed-set overlap. within/contains: containment, which for
    nondegenerate rectangles (and points strictly inside) implies the
    interior-interior condition; a point ON the container's boundary is NOT
    within (interiors disjoint), hence the strict form for degenerate
    left/right boxes."""
    lxmin, lymin, lxmax, lymax = lb
    rxmin, rymin, rxmax, rymax = rb
    if pred == "intersects":
        return ((lxmin <= rxmax) & (rxmin <= lxmax)
                & (lymin <= rymax) & (rymin <= lymax))
    if pred in ("contains", "covers"):  # X(l, r) == mirrored(r, l)
        lb, rb = rb, lb
        lxmin, lymin, lxmax, lymax = lb
        rxmin, rymin, rxmax, rymax = rb
    inside = ((lxmin >= rxmin) & (lxmax <= rxmax)
              & (lymin >= rymin) & (lymax <= rymax))
    if pred in ("covers", "covered_by"):
        # covers/covered_by: plain closed-set containment — no interior
        # condition, so a point ON the boundary IS covered
        return inside
    # within(l, r): l ⊆ r, with the strict boundary rule only when l is a
    # point and r is a proper rectangle (point ON the rect's boundary has
    # disjoint interiors → not within). When BOTH sides are points,
    # within/contains is plain equality — `inside` reduces to exactly that
    # (a point's interior is itself in DE-9IM point×point terms).
    degen_l = (lxmin == lxmax) & (lymin == lymax)  # point-like left side
    degen_r = (rxmin == rxmax) & (rymin == rymax)  # point-like right side
    strict = ((lxmin > rxmin) & (lxmax < rxmax)
              & (lymin > rymin) & (lymax < rymax))
    return np.where(degen_l & ~degen_r, strict, inside)


def predicate_arrow(df: DataFrame, lcol: str, rcol: str,
                    predicate: str = "intersects",
                    out_col: str = "pred",
                    keep: tuple | None = None) -> DataFrame:
    """All input columns + boolean ``out_col`` = ``predicate(lcol, rcol)``,
    evaluated zero-copy on the Arrow buffers (r10, VERDICT r9 item 2 — the
    fast lane for the b2 shape: survivor refinement after a codegen bbox
    prune, without the pandas path's one-bytes-object-per-row churn).

    Rows where BOTH sides are points or axis-aligned rectangles (the
    overwhelming case for bbox-shaped data; verified per row, see
    _rect_box) get the closed-form interval predicate, which is EXACT for
    that class; every other row takes the same per-row DE-9IM kernels as
    ``st_intersects``/``st_within``/``st_contains``. Null on either side →
    null, matching the column predicates. Parity is test-asserted
    (tests/test_arrowpath.py) and hash-checked in the ``arrow_predicate``
    driver gate.

    Reference: the binary-predicate surface of §2.3
    (/root/reference/src/functions.rs:900-1010); this is a physical-plan
    alternative, not new semantics."""
    import pyarrow as pa

    if predicate not in _BOX_PREDICATES:
        raise ValueError(
            f"predicate must be one of {_BOX_PREDICATES}, got {predicate!r}")
    if out_col in df.columns:
        raise ValueError(f"out_col={out_col!r} collides with an input column")
    from polars_st_spark.geo import predicates as _P
    from polars_st_spark.geo.wkb import from_ewkb

    exact_fn = getattr(_P, predicate)
    if keep is not None:
        # NARROW mode (r10, measured): yield only ``keep`` + the verdict.
        # mapInArrow replaces the stream, so in the default all-columns
        # mode the geometry binaries ROUND-TRIP JVM->Python->JVM — at the
        # 100x b2 grain that transfer made this lane 3x slower than the
        # one-way pandas-UDF refinement (30.4s vs 9.1s). When the consumer
        # needs only keys + verdict (count / id-pair sinks), narrow mode
        # ships keys+geoms in and keys+bool out — the transfer-optimal
        # shape for this node type.
        df = df.select(*keep, lcol, rcol)
        out_names = list(keep) + [out_col]
        out_schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in df.schema if f.name in keep
        ) + f", {out_col} boolean"
    else:
        out_names = list(df.columns) + [out_col]
        out_schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in df.schema
        ) + f", {out_col} boolean"
    names = out_names

    def _side(arr):
        """(box full-length arrays, exact mask, valid mask or None) or
        None when the side leaves the uniform envelope entirely."""
        offs, data, valid = _flat_views(arr)
        parsed = _uniform_coords(offs, data, valid)
        if parsed is None:
            return None
        coords, gtype, rows = parsed
        box, ok = _rect_box(coords, gtype)
        n = len(offs) - 1
        if rows is None:
            return box, ok, None
        full_box = []
        for v in box:
            fb = np.full(n, np.nan)
            fb[rows] = v
            full_box.append(fb)
        full_ok = np.zeros(n, dtype=bool)
        full_ok[rows] = ok
        vmask = np.zeros(n, dtype=bool)
        vmask[rows] = True
        return tuple(full_box), full_ok, vmask

    def _exact_rows(larr, rarr, idx, res):
        for i in idx:
            lv, rv = larr[int(i)].as_py(), rarr[int(i)].as_py()
            if lv is None or rv is None:
                continue
            res[int(i)] = exact_fn(from_ewkb(bytes(lv)), from_ewkb(bytes(rv)))

    def fn(batches):
        for rb in batches:
            larr = rb.column(rb.schema.get_field_index(lcol))
            rarr = rb.column(rb.schema.get_field_index(rcol))
            n = len(larr)
            res = np.zeros(n, dtype=bool)
            lparsed = _side(larr)
            rparsed = _side(rarr)
            null_mask = np.zeros(n, dtype=bool)
            if lparsed is not None and rparsed is not None:
                lb, lok, lvalid = lparsed
                rb_, rok, rvalid = rparsed
                if lvalid is not None:
                    null_mask |= ~lvalid
                if rvalid is not None:
                    null_mask |= ~rvalid
                fast = lok & rok & ~null_mask
                res[fast] = _box_predicate(
                    predicate,
                    tuple(v[fast] for v in lb),
                    tuple(v[fast] for v in rb_))
                slow = np.flatnonzero(~fast & ~null_mask)
                _exact_rows(larr, rarr, slow, res)
            else:
                null_mask = np.array([
                    larr[i].as_py() is None or rarr[i].as_py() is None
                    for i in range(n)
                ], dtype=bool)
                _exact_rows(larr, rarr, np.flatnonzero(~null_mask), res)
            if keep is not None:
                cols = [rb.column(rb.schema.get_field_index(k))
                        for k in names[:-1]]
            else:
                cols = [rb.column(i) for i in range(rb.num_columns)]
            cols.append(pa.array(res, type=pa.bool_(),
                                 mask=null_mask if null_mask.any() else None))
            yield pa.RecordBatch.from_arrays(cols, names)

    return df.mapInArrow(fn, out_schema)


def _uniform_bounds(offs, data, valid):
    """(xmin, ymin, xmax, ymax) float64 arrays (full batch length, NaN at
    null slots) for a structurally-uniform batch, or None outside the fast
    envelope (same rules and null handling as _uniform_measures)."""
    parsed = _uniform_coords(offs, data, valid)
    if parsed is None:
        return None
    c, _gtype, rows = parsed
    x, y = c[:, :, 0], c[:, :, 1]
    vals = (x.min(axis=1), y.min(axis=1), x.max(axis=1), y.max(axis=1))
    if rows is None:
        return vals
    n = len(offs) - 1
    out = []
    for v in vals:
        full = np.full(n, np.nan)
        full[rows] = v
        out.append(full)
    return tuple(out)


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
                mask = ~valid if valid is not None else None
            cols = [rb.column(rb.schema.get_field_index(k)) for k in names[:-4]]
            for v in vals:
                cols.append(pa.array(np.ascontiguousarray(v),
                                     type=pa.float64(), mask=mask))
            yield pa.RecordBatch.from_arrays(cols, names)

    return df.select(*keep, col).mapInArrow(fn, out_schema)
