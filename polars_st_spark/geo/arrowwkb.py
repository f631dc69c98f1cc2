"""Zero-copy uniform-batch EWKB parse over pyarrow Binary arrays.

The pandas-UDF boundary materializes one Python ``bytes`` object per row
when Arrow hands a binary column to pandas, and ``geo.wkb.batch_uniform``
then walks those objects in a Python loop (length + structural-prefix check
per row, plus a ``b"".join`` copy). At bench grain that object churn IS the
cost of the vectorized fast paths — the kernels themselves are numpy.

:func:`uniform_batch_pa` produces the **same contract as
``geo.wkb.batch_uniform``** — ``("point2d", x, y)`` /
``("ring", coords, axis_rect)`` / ``None`` — directly from the Arrow
buffers (validity / int32 offsets / flat byte data) as numpy strided views:
no per-row objects, no copies. Spark 4.1's ``arrow_udf`` hands scalar UDFs
the raw ``pyarrow.Array``, so the hot ``st_*`` functions
(``functions/scalar.py`` measures, ``functions/predicate.py`` pair
predicates) parse through here and fall back to their existing
pandas-Series bodies only for batches outside the uniform envelope —
identical results either way (guide §4.2: same kernels, cheaper boundary).

Structural rules are byte-for-byte those of ``batch_uniform``: every row
little-endian, no Z/M, all rows sharing the FULL structural prefix (endian
byte, type word, SRID, ring/point count words) and byte length; points or
single-ring polygons only. ``axis_rect`` is the same st_rectangle
vertex-order test. Mixed/complex batches return None.

The strided-view trick (rows of identical length L → one ``(n, L)`` uint8
view, coordinates as an ``(n, npts, 2)`` float64 view with row stride L) is
shared with ``operators.arrowpath`` (the mapInArrow lane); this module is
the Column-function (arrow_udf) counterpart.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["flat_views", "header_info_pa", "uniform_batch_pa"]

_SRID_FLAG = 0x20000000
_ZM_FLAGS = 0x80000000 | 0x40000000


def flat_views(arr):
    """(offsets int64 (n+1,), data uint8 view, valid bool mask or None) for
    a pyarrow Binary/LargeBinary array, honoring the array offset."""
    bufs = arr.buffers()
    off_dt = np.int64 if "large" in str(arr.type) else np.int32
    offs = np.frombuffer(bufs[1], dtype=off_dt)[arr.offset: arr.offset + len(arr) + 1]
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, np.uint8)
    )
    valid = None
    if arr.null_count:
        vbits = np.frombuffer(bufs[0], dtype=np.uint8)
        idx = np.arange(arr.offset, arr.offset + len(arr))
        valid = (vbits[idx >> 3] >> (idx & 7) & 1).astype(bool)
    return offs.astype(np.int64), data, valid


def uniform_batch_pa(arr):
    """``batch_uniform``'s contract from a null-free pyarrow binary array,
    zero-copy. Returns one of:

    - ``("point2d", x, y)`` — all rows little-endian 2-D points (x/y are
      float64 strided views into the Arrow data buffer)
    - ``("ring", coords, axis_rect)`` — all rows single-ring 2-D polygons
      with the same vertex count; ``coords`` is an ``(n, m, 2)`` float64
      strided view; ``axis_rect`` True when every row is an axis-aligned
      rectangle ring in st_rectangle vertex order
    - ``None`` — nulls present, or mixed/complex batch; caller falls back
      to its pandas/per-row path.
    """
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0 or arr.null_count:
        return None
    offs, data, _valid = flat_views(arr)
    lens = np.diff(offs)
    L = int(lens[0])
    if L < 21 or not bool((lens == L).all()):
        return None
    base = int(offs[0])
    if data[base] != 1:
        return None
    (word,) = struct.unpack_from("<I", data, base + 1)
    if word & _ZM_FLAGS:
        return None
    head = 5 + (4 if word & _SRID_FLAG else 0)
    gtype = word & 0xFF
    if gtype == 1 and L == head + 16:  # Point
        prefix_len = head
        npts = 1
    elif gtype == 3 and L >= head + 8 + 4 * 16:  # Polygon
        (nrings,) = struct.unpack_from("<I", data, base + head)
        if nrings != 1:
            return None
        (npts,) = struct.unpack_from("<I", data, base + head + 4)
        if L != head + 8 + npts * 16:
            return None
        prefix_len = head + 8
    else:
        return None
    # every row must share the FULL structural prefix (endian, type word,
    # srid, ring/point counts) — same rule as wkb.batch_uniform
    mat = np.ndarray(
        shape=(n, prefix_len), dtype=np.uint8, buffer=data,
        offset=base, strides=(L, 1),
    )
    if not bool((mat == mat[0]).all()):
        return None
    coords = np.ndarray(
        shape=(n, npts * 2), dtype="<f8", buffer=data,
        offset=base + prefix_len, strides=(L, 8),
    ).reshape(n, npts, 2)
    if gtype == 1:
        return ("point2d", coords[:, 0, 0], coords[:, 0, 1])
    x, y = coords[:, :, 0], coords[:, :, 1]
    axis_rect = False
    if npts == 5:
        axis_rect = bool(
            np.all(x[:, 0] == x[:, 3]) and np.all(x[:, 0] == x[:, 4])
            and np.all(x[:, 1] == x[:, 2])
            and np.all(y[:, 0] == y[:, 1]) and np.all(y[:, 0] == y[:, 4])
            and np.all(y[:, 2] == y[:, 3])
        )
    return ("ring", coords, axis_rect)


def header_info_pa(arr):
    """Vectorized ``geo.wkb.header_info`` over a pyarrow Binary array (r11):
    ``(base_type int32, has_z bool, has_m bool, srid int32, null_mask)``
    numpy arrays straight from the Arrow buffers — no per-row bytes objects,
    both endiannesses, EWKB flag bits AND ISO 1000/2000/3000 codes, exactly
    the scalar decoder's rules (``_decode_type_word``). Raises the scalar
    lane's ``ValueError`` on any too-short valid row."""
    offs, data, valid = flat_views(arr)
    n = len(arr)
    starts = offs[:-1]
    lens = np.diff(offs)
    null_mask = ~valid if valid is not None else np.zeros(n, dtype=bool)
    ok = ~null_mask
    if not ok.any():
        z = np.zeros(n, dtype=np.int32)
        return z, np.zeros(n, bool), np.zeros(n, bool), z, null_mask
    if int(lens[ok].min()) < 5:
        raise ValueError("Invalid WKB: too short")
    s = np.where(ok, starts, 0)

    def _u32(at, lit):
        b = [data[at + i].astype(np.uint32) for i in range(4)]
        le = b[0] | (b[1] << 8) | (b[2] << 16) | (b[3] << 24)
        be = b[3] | (b[2] << 8) | (b[1] << 16) | (b[0] << 24)
        return np.where(lit, le, be)

    little = data[s] == 1
    raw = _u32(s + 1, little)
    has_z = (raw & 0x80000000) != 0
    has_m = (raw & 0x40000000) != 0
    has_srid = (raw & _SRID_FLAG) != 0
    base = (raw & 0x0FFFFFFF).astype(np.int64)
    iso = np.where(base >= 1000, base // 1000, 0)
    has_z |= (iso == 1) | (iso == 3)
    has_m |= (iso == 2) | (iso == 3)
    base = np.where(base >= 1000, base % 1000, base)
    srid = np.zeros(n, dtype=np.int64)
    rd = has_srid & ok
    if rd.any():
        if (lens[rd] < 9).any():
            raise ValueError("Invalid WKB: too short")
        srid[rd] = _u32(s[rd] + 5, little[rd])
    return (base.astype(np.int32), has_z & ok, has_m & ok,
            srid.astype(np.int32), null_mask)
