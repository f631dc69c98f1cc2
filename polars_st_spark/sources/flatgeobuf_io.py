"""Native FlatGeobuf reader/writer — no GDAL, no flatbuffers package.

The reference reads/writes FlatGeobuf through pyogrio/GDAL (reference:
input.py:30-153, geodataframe.py:385-491); this runtime has neither, so the
format is implemented directly from the public specification
(https://flatgeobuf.org, spec/fgb_spec.md + header.fbs / feature.fbs at
github.com/flatgeobuf/flatgeobuf) on top of a ~100-line generic FlatBuffers
table reader (FlatBuffers wire format is public: google.github.io/flatbuffers
"Internals": root u32 offset, i32 table->vtable soffset, u16 vtable slots,
forward u32 offsets for strings/vectors/tables).

File layout (spec §"file structure"):
  magic  8 bytes  66 67 62 03 66 67 62 00  ("fgb", spec major 3)
  header u32 size prefix + Header flatbuffer (name, envelope, geometry_type,
         has_z/m/t/tm, columns, features_count, index_node_size, crs)
  index  optional packed Hilbert R-tree, 40-byte node items;
         size = numNodes(features_count, index_node_size) * 40
  data   features, each u32 size prefix + Feature flatbuffer
         (geometry {ends, xy, z, type, parts}, properties byte blob)

Properties blob: a sequence of (u16 column index, value) pairs; value width
comes from the column type; String/Json/DateTime/Binary carry a u32 length.

Like the Shapefile/GeoPackage paths this is a single-file interchange format
and both directions run driver-side (reader streams feature-by-feature; the
writer is ``max_rows``-bounded like write_geojson). A directory of .fgb files
parallelizes per file upstream of this call. The writer emits no spatial
index (index_node_size=0 — explicitly allowed by the spec) and features in
input order; readers that want Hilbert ordering can sort downstream.
"""

from __future__ import annotations

import os
import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from polars_st_spark.geo.types import Geometry, GeometryType

__all__ = ["read_flatgeobuf", "write_flatgeobuf"]

_MAGIC = bytes([0x66, 0x67, 0x62, 0x03, 0x66, 0x67, 0x62, 0x00])

# header.fbs ColumnType enum
_CT_BYTE, _CT_UBYTE, _CT_BOOL, _CT_SHORT, _CT_USHORT = 0, 1, 2, 3, 4
_CT_INT, _CT_UINT, _CT_LONG, _CT_ULONG, _CT_FLOAT, _CT_DOUBLE = 5, 6, 7, 8, 9, 10
_CT_STRING, _CT_JSON, _CT_DATETIME, _CT_BINARY = 11, 12, 13, 14

# header.fbs GeometryType enum (matches ISO WKB integer codes for 1-7)
_GT_UNKNOWN = 0
_GT_COLLECTION = 7


# ----------------------------------------------------------------------
# Minimal FlatBuffers table reader
# ----------------------------------------------------------------------

class _FB:
    """Read-only view of one FlatBuffers table at ``pos`` in ``buf``."""

    __slots__ = ("buf", "pos", "_vt", "_vt_size")

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        (soffset,) = struct.unpack_from("<i", buf, pos)
        self._vt = pos - soffset
        (self._vt_size,) = struct.unpack_from("<H", buf, self._vt)

    @classmethod
    def root(cls, buf: bytes, pos: int = 0) -> "_FB":
        (off,) = struct.unpack_from("<I", buf, pos)
        return cls(buf, pos + off)

    def _field_pos(self, fid: int) -> int | None:
        slot = 4 + 2 * fid
        if slot + 2 > self._vt_size:
            return None
        (fo,) = struct.unpack_from("<H", self.buf, self._vt + slot)
        return self.pos + fo if fo else None

    def scalar(self, fid: int, fmt: str, default=0):
        p = self._field_pos(fid)
        if p is None:
            return default
        return struct.unpack_from(fmt, self.buf, p)[0]

    def _indirect(self, fid: int) -> int | None:
        p = self._field_pos(fid)
        if p is None:
            return None
        (off,) = struct.unpack_from("<I", self.buf, p)
        return p + off

    def string(self, fid: int) -> str | None:
        t = self._indirect(fid)
        if t is None:
            return None
        (n,) = struct.unpack_from("<I", self.buf, t)
        return self.buf[t + 4 : t + 4 + n].decode("utf-8")

    def vector(self, fid: int):
        """(element_start, count) of a vector field, or None."""
        t = self._indirect(fid)
        if t is None:
            return None
        (n,) = struct.unpack_from("<I", self.buf, t)
        return t + 4, n

    def np_vector(self, fid: int, dtype: str, itemsize: int):
        v = self.vector(fid)
        if v is None:
            return None
        start, n = v
        return np.frombuffer(self.buf, dtype=dtype, count=n, offset=start)

    def bytes_vector(self, fid: int) -> bytes | None:
        v = self.vector(fid)
        if v is None:
            return None
        start, n = v
        return self.buf[start : start + n]

    def table(self, fid: int) -> "_FB | None":
        t = self._indirect(fid)
        return None if t is None else _FB(self.buf, t)

    def table_vector(self, fid: int) -> "list[_FB]":
        v = self.vector(fid)
        if v is None:
            return []
        start, n = v
        out = []
        for i in range(n):
            p = start + 4 * i
            (off,) = struct.unpack_from("<I", self.buf, p)
            out.append(_FB(self.buf, p + off))
        return out


# ----------------------------------------------------------------------
# Reader
# ----------------------------------------------------------------------

def _index_size(count: int, node_size: int) -> int:
    """Packed Hilbert R-tree byte size (spec packedrtree: 40-byte NodeItem,
    numNodes = Σ level widths from the feature leaves up to the root)."""
    if node_size < 2 or count == 0:
        return 0
    n = count
    num = n
    while n != 1:
        n = (n + node_size - 1) // node_size
        num += n
    return num * 40


def _decode_columns(header: _FB):
    """[(name, column_type)] from Header.columns (field id 7)."""
    return [(c.string(0), c.scalar(1, "<B")) for c in header.table_vector(7)]


_PROP_SCALARS = {
    _CT_BYTE: ("<b", 1), _CT_UBYTE: ("<B", 1), _CT_BOOL: ("<B", 1),
    _CT_SHORT: ("<h", 2), _CT_USHORT: ("<H", 2), _CT_INT: ("<i", 4),
    _CT_UINT: ("<I", 4), _CT_LONG: ("<q", 8), _CT_ULONG: ("<Q", 8),
    _CT_FLOAT: ("<f", 4), _CT_DOUBLE: ("<d", 8),
}


def _decode_props(blob: bytes | None, columns) -> list:
    out = [None] * len(columns)
    if not blob:
        return out
    pos = 0
    n = len(blob)
    while pos + 2 <= n:
        (idx,) = struct.unpack_from("<H", blob, pos)
        pos += 2
        if idx >= len(columns):
            break
        ctype = columns[idx][1]
        sc = _PROP_SCALARS.get(ctype)
        if sc is not None:
            fmt, width = sc
            (v,) = struct.unpack_from(fmt, blob, pos)
            pos += width
            if ctype == _CT_BOOL:
                v = bool(v)
            elif ctype == _CT_FLOAT:
                v = float(v)
            out[idx] = v
        else:  # length-prefixed
            (ln,) = struct.unpack_from("<I", blob, pos)
            pos += 4
            raw = blob[pos : pos + ln]
            pos += ln
            out[idx] = raw if ctype == _CT_BINARY else raw.decode("utf-8")
    return out


def _coords_of(geom: _FB, has_z: bool) -> np.ndarray:
    xy = geom.np_vector(1, "<f8", 8)
    if xy is None:
        xy = np.empty(0)
    pts = xy.reshape(-1, 2)
    if has_z:
        z = geom.np_vector(2, "<f8", 8)
        zcol = z if z is not None and len(z) == len(pts) else np.zeros(len(pts))
        pts = np.column_stack([pts, zcol])
    return pts.astype(np.float64)


def _split_ends(geom: _FB, pts: np.ndarray) -> list[np.ndarray]:
    """Partition the flat coordinate array at Geometry.ends (end indices are
    exclusive vertex positions per the spec); absent ends = one part."""
    ends = geom.np_vector(0, "<u4", 4)
    if ends is None or not len(ends):
        return [pts]
    out = []
    start = 0
    for e in ends:
        out.append(pts[start : int(e)].copy())
        start = int(e)
    return out


def _decode_geometry(geom: _FB | None, gtype: int, srid: int, has_z: bool) -> Geometry | None:
    if geom is None:
        return None
    t = geom.scalar(6, "<B", 0) or gtype
    if t == _GT_UNKNOWN:
        return None
    tid = GeometryType(t)
    if tid == GeometryType.Point:
        pts = _coords_of(geom, has_z)
        if not len(pts):
            return Geometry(GeometryType.Point, srid=srid, has_z=has_z, coords=None)
        return Geometry(GeometryType.Point, srid=srid, has_z=has_z, coords=pts[0].copy())
    if tid == GeometryType.LineString:
        return Geometry(tid, srid=srid, has_z=has_z, coords=_coords_of(geom, has_z))
    if tid == GeometryType.Polygon:
        return Geometry(tid, srid=srid, has_z=has_z,
                        rings=_split_ends(geom, _coords_of(geom, has_z)))
    if tid == GeometryType.MultiPoint:
        pts = _coords_of(geom, has_z)
        return Geometry(tid, srid=srid, has_z=has_z, geoms=[
            Geometry(GeometryType.Point, srid=srid, has_z=has_z, coords=p.copy())
            for p in pts
        ])
    if tid == GeometryType.MultiLineString:
        chains = _split_ends(geom, _coords_of(geom, has_z))
        return Geometry(tid, srid=srid, has_z=has_z, geoms=[
            Geometry(GeometryType.LineString, srid=srid, has_z=has_z, coords=c)
            for c in chains
        ])
    if tid == GeometryType.MultiPolygon:
        parts = geom.table_vector(7)
        if parts:
            polys = [_decode_geometry(p, GeometryType.Polygon, srid, has_z) for p in parts]
        else:  # single-part encoding: ends on the outer geometry
            polys = [Geometry(GeometryType.Polygon, srid=srid, has_z=has_z,
                              rings=_split_ends(geom, _coords_of(geom, has_z)))]
        return Geometry(tid, srid=srid, has_z=has_z, geoms=polys)
    if tid == GeometryType.GeometryCollection:
        parts = geom.table_vector(7)
        return Geometry(tid, srid=srid, has_z=has_z, geoms=[
            _decode_geometry(p, _GT_UNKNOWN, srid, has_z) for p in parts
        ])
    raise ValueError(f"Unsupported FlatGeobuf geometry type {t}")


_CT_TO_SPARK = {
    _CT_BYTE: "int", _CT_UBYTE: "int", _CT_BOOL: "boolean",
    _CT_SHORT: "int", _CT_USHORT: "int", _CT_INT: "int", _CT_UINT: "bigint",
    _CT_LONG: "bigint", _CT_ULONG: "bigint", _CT_FLOAT: "double",
    _CT_DOUBLE: "double", _CT_STRING: "string", _CT_JSON: "string",
    _CT_DATETIME: "string", _CT_BINARY: "binary",
}


def read_flatgeobuf(spark: SparkSession, path: str, geometry_name: str = "geometry") -> DataFrame:
    """Read a .fgb file into a DataFrame with an EWKB ``geometry_name``
    column; attribute columns keep their declared FlatGeobuf types. The
    optional packed R-tree index is skipped (its size is computable from the
    header); features stream driver-side."""
    from polars_st_spark.geo.wkb import to_ewkb

    with open(path, "rb") as f:
        data = f.read()
    if data[:8] != _MAGIC[:8] and data[:3] != b"fgb":
        raise ValueError(f"{path} is not a FlatGeobuf file (bad magic)")
    (hsize,) = struct.unpack_from("<I", data, 8)
    header = _FB.root(data, 12)
    gtype = header.scalar(2, "<B", 0)
    has_z = bool(header.scalar(3, "<B", 0))
    count = header.scalar(8, "<Q", 0)
    node_size = header.scalar(9, "<H", 16)
    columns = _decode_columns(header)
    srid = 0
    crs = header.table(10)
    if crs is not None:
        code = crs.scalar(1, "<i", 0)
        if code > 0:
            srid = code

    pos = 12 + hsize + _index_size(count, node_size)
    rows = []
    n = len(data)
    while pos + 4 <= n:
        (fsize,) = struct.unpack_from("<I", data, pos)
        if fsize == 0 or pos + 4 + fsize > n:
            break
        feat = _FB.root(data, pos + 4)
        g = _decode_geometry(feat.table(0), gtype, srid, has_z)
        props = _decode_props(feat.bytes_vector(1), columns)
        rows.append((*props, None if g is None else to_ewkb(g)))
        pos += 4 + fsize

    fields = ", ".join(
        [f"`{name}` {_CT_TO_SPARK.get(ct, 'string')}" for name, ct in columns]
        + [f"`{geometry_name}` binary"]
    )
    return spark.createDataFrame(rows, fields)



# ----------------------------------------------------------------------
# Writer — bottom-up FlatBuffers builder. Objects are emitted back-to-front
# (children before parents), so every reference is the forward u32 offset
# the wire format requires. Positions are tracked as distance-from-buffer-
# end ("revpos"); finish() prepends the root offset and alignment padding.
# ----------------------------------------------------------------------

class _RevBuilder:
    def __init__(self):
        self.chunks: list[bytearray] = []  # chunks[0] is nearest the END
        self.total = 0

    def emit(self, data: bytes, align: int = 1, prefix: int = 0) -> int:
        """Append an object; returns its revpos (distance from buffer end to
        the object's first byte). ``align``/``prefix``: the byte at
        ``start + prefix`` ends up ``align``-aligned in the final buffer."""
        pad = (prefix - (self.total + len(data))) % align if align > 1 else 0
        if pad:
            self.chunks.append(bytearray(pad))
            self.total += pad
        self.chunks.append(bytearray(data))
        self.total += len(data)
        return self.total

    def string(self, s: str) -> int:
        raw = s.encode("utf-8")
        return self.emit(struct.pack("<I", len(raw)) + raw + b"\x00", align=4)

    def np_vector(self, arr: np.ndarray) -> int:
        a = np.ascontiguousarray(arr)
        return self.emit(struct.pack("<I", len(a)) + a.tobytes(),
                         align=max(4, a.itemsize), prefix=4)

    def byte_vector(self, raw: bytes) -> int:
        return self.emit(struct.pack("<I", len(raw)) + raw, align=4)

    def offset_vector(self, targets: list[int]) -> int:
        """Vector of u32 offsets to already-emitted tables. The element
        values depend on the vector's own position, so the revpos is
        precomputed (emit() with the same align=4 pads identically)."""
        n = len(targets)
        size = 4 + 4 * n
        pad = (0 - (self.total + size)) % 4
        rev_start = self.total + pad + size
        body = struct.pack("<I", n) + b"".join(
            struct.pack("<I", (rev_start - 4 - 4 * i) - t)
            for i, t in enumerate(targets)
        )
        got = self.emit(body, align=4)
        assert got == rev_start
        return got

    def table(self, fields) -> int:
        """fields: [(fid, ("scalar", bytes, align) | ("ref", revpos))] in the
        order they should be laid out. Returns the table's revpos."""
        body = bytearray(4)  # i32 soffset placeholder
        slots: dict[int, int] = {}
        refs: list[tuple[int, int]] = []
        for fid, spec in fields:
            if spec[0] == "scalar":
                _, data, algn = spec
                while len(body) % algn:
                    body += b"\x00"
                slots[fid] = len(body)
                body += data
            else:
                while len(body) % 4:
                    body += b"\x00"
                slots[fid] = len(body)
                refs.append((len(body), spec[1]))
                body += b"\x00\x00\x00\x00"
        max_fid = max(slots)
        vt_slots = [0] * (max_fid + 1)
        for fid, off in slots.items():
            vt_slots[fid] = off
        vt = struct.pack("<2H", 4 + 2 * (max_fid + 1), len(body)) + b"".join(
            struct.pack("<H", o) for o in vt_slots
        )
        rev_t = self.emit(bytes(body), align=8)
        t_chunk = self.chunks[-1]
        for off, target in refs:
            struct.pack_into("<I", t_chunk, off, rev_t - off - target)
        rev_vt = self.emit(vt, align=2)
        struct.pack_into("<i", t_chunk, 0, rev_vt - rev_t)
        return rev_t

    def finish(self, root_revpos: int) -> bytes:
        body = b"".join(reversed(self.chunks))
        pad = (-4 - len(body)) % 8
        root_abs = 4 + pad + (len(body) - root_revpos)
        return struct.pack("<I", root_abs) + b"\x00" * pad + body


def _scalar(fmt: str, *vals) -> tuple:
    data = struct.pack(fmt, *vals)
    return ("scalar", data, struct.calcsize(fmt[-1] if fmt[-1].isalpha() else fmt))


def _spark_columns(schema_fields):
    """[(name, column_type)] for the non-geometry attribute columns."""
    from pyspark.sql.types import (BinaryType, BooleanType, DoubleType,
                                   FloatType, IntegerType, LongType)

    out = []
    for f in schema_fields:
        t = f.dataType
        if isinstance(t, BooleanType):
            ct = _CT_BOOL
        elif isinstance(t, IntegerType):
            ct = _CT_INT
        elif isinstance(t, LongType):
            ct = _CT_LONG
        elif isinstance(t, (DoubleType, FloatType)):
            ct = _CT_DOUBLE
        elif isinstance(t, BinaryType):
            ct = _CT_BINARY
        else:
            ct = _CT_STRING
        out.append((f.name, ct))
    return out


def _encode_props(values, columns) -> bytes:
    out = bytearray()
    for idx, ((_, ct), v) in enumerate(zip(columns, values)):
        if v is None:
            continue
        out += struct.pack("<H", idx)
        if ct == _CT_BOOL:
            out += struct.pack("<B", 1 if v else 0)
        elif ct == _CT_INT:
            out += struct.pack("<i", int(v))
        elif ct == _CT_LONG:
            out += struct.pack("<q", int(v))
        elif ct == _CT_DOUBLE:
            out += struct.pack("<d", float(v))
        elif ct == _CT_BINARY:
            raw = bytes(v)
            out += struct.pack("<I", len(raw)) + raw
        else:
            raw = str(v).encode("utf-8")
            out += struct.pack("<I", len(raw)) + raw
    return bytes(out)


def _flat_parts(g: Geometry):
    """(xy_flat, z|None, ends|None, parts|None) in the spec's encoding. Multi-
    Polygon/GeometryCollection return ``parts``; other types flatten to one
    coordinate stream with ``ends`` marking chain/ring boundaries."""
    t = g.type_id
    if t in (GeometryType.MultiPolygon, GeometryType.GeometryCollection):
        return None, None, None, list(g.geoms or [])
    if t == GeometryType.Point:
        chunks = [] if g.coords is None else [
            np.asarray(g.coords, dtype=np.float64).reshape(1, -1)]
        use_ends = False
    elif t == GeometryType.LineString:
        chunks = [np.asarray(g.coords, dtype=np.float64)]
        use_ends = False
    elif t == GeometryType.Polygon:
        chunks = [np.asarray(r, dtype=np.float64) for r in (g.rings or [])]
        use_ends = len(chunks) > 1
    elif t == GeometryType.MultiPoint:
        chunks = [np.asarray(p.coords, dtype=np.float64).reshape(1, -1)
                  for p in (g.geoms or []) if p.coords is not None]
        use_ends = False
    elif t == GeometryType.MultiLineString:
        chunks = [np.asarray(c.coords, dtype=np.float64) for c in (g.geoms or [])]
        use_ends = True
    else:
        raise ValueError(f"Unsupported geometry type for FlatGeobuf: {t}")
    if not chunks:
        return np.zeros(0), None, None, None
    all_pts = np.concatenate(chunks)
    xy = np.ascontiguousarray(all_pts[:, :2]).reshape(-1)
    z = np.ascontiguousarray(all_pts[:, 2]) if g.has_z and all_pts.shape[1] > 2 else None
    ends = (np.cumsum([len(c) for c in chunks]).astype("<u4")
            if use_ends and len(chunks) > 1 else None)
    return xy, z, ends, None


def _build_geometry(b: _RevBuilder, g: Geometry) -> int:
    """Emit one Geometry table (children first) and return its revpos."""
    xy, z, ends, parts = _flat_parts(g)
    fields = []
    if parts is not None:
        child_rev = [_build_geometry(b, p) for p in parts]
        vec = b.offset_vector(child_rev)
        fields.append((7, ("ref", vec)))
    else:
        if xy is not None and len(xy):
            fields.append((1, ("ref", b.np_vector(xy.astype("<f8")))))
        if z is not None and len(z):
            fields.append((2, ("ref", b.np_vector(z.astype("<f8")))))
        if ends is not None and len(ends):
            fields.append((0, ("ref", b.np_vector(ends))))
    fields.append((6, _scalar("<B", int(g.type_id))))
    return b.table(fields)


def _header_buf(name, gtype, has_z, count, columns, srid) -> bytes:
    b = _RevBuilder()
    fields = []
    if srid:
        crs = b.table([(0, ("ref", b.string("EPSG"))), (1, _scalar("<i", srid))])
        fields.append((10, ("ref", crs)))
    if columns:
        col_rev = [
            b.table([(0, ("ref", b.string(cname))), (1, _scalar("<B", ct))])
            for cname, ct in columns
        ]
        fields.append((7, ("ref", b.offset_vector(col_rev))))
    fields.append((0, ("ref", b.string(name))))
    fields.append((2, _scalar("<B", gtype)))
    if has_z:
        fields.append((3, _scalar("<B", 1)))
    fields.append((8, _scalar("<Q", count)))
    fields.append((9, _scalar("<H", 0)))  # index_node_size 0: no index
    return b.finish(b.table(fields))


def _feature_buf(g: Geometry | None, values, columns) -> bytes:
    b = _RevBuilder()
    fields = []
    if g is not None:
        fields.append((0, ("ref", _build_geometry(b, g))))
    props = _encode_props(values, columns)
    if props:
        fields.append((1, ("ref", b.byte_vector(props))))
    if not fields:  # fully-null row: emit an empty-but-valid table
        fields.append((1, ("ref", b.byte_vector(b""))))
    return b.finish(b.table(fields))


def write_flatgeobuf(
    df: DataFrame,
    path: str,
    geometry_name: str = "geometry",
    name: str | None = None,
    max_rows: int = 1_000_000,
) -> None:
    """Write a .fgb file (no spatial index — index_node_size=0 per spec;
    features in input order). Driver-side and ``max_rows``-bounded like
    write_geojson; the SRID is recorded in the header Crs when uniform."""
    from polars_st_spark.geo.wkb import from_ewkb

    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(f"write_flatgeobuf exceeds max_rows={max_rows}")
    attr_fields = [f for f in df.schema.fields if f.name != geometry_name]
    columns = _spark_columns(attr_fields)
    geoms = [None if r[geometry_name] is None else from_ewkb(bytes(r[geometry_name]))
             for r in rows]
    types = {g.type_id for g in geoms if g is not None}
    gtype = int(next(iter(types))) if len(types) == 1 else _GT_UNKNOWN
    has_z = any(g is not None and g.has_z for g in geoms)
    srids = {g.srid for g in geoms if g is not None and g.srid}
    srid = next(iter(srids)) if len(srids) == 1 else 0
    header = _header_buf(
        name or os.path.splitext(os.path.basename(path))[0],
        gtype, has_z, len(rows), columns, srid,
    )
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(header)))
        f.write(header)
        for g, r in zip(geoms, rows):
            fb = _feature_buf(g, [r[fld.name] for fld in attr_fields], columns)
            f.write(struct.pack("<I", len(fb)))
            f.write(fb)
