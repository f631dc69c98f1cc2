"""Native ESRI Shapefile reader/writer — no GDAL.

The reference reads/writes Shapefiles through pyogrio/GDAL
(reference: input.py:30-153, geodataframe.py:385-491); this runtime has no
GDAL, so the format is implemented directly from the public spec ("ESRI
Shapefile Technical Description", ESRI whitepaper, July 1998) plus the
dBase III .dbf layout.

Scope (the shapes the spec's own examples cover):
- shape types 0 (Null), 1/11 (Point/PointZ), 3/13 (PolyLine/Z),
  5/15 (Polygon/Z), 8/18 (MultiPoint/Z); M values are ignored on read and
  never written (documented deviation — M is rarely round-trippable even
  through GDAL defaults).
- .dbf field types C (string), N/F (numeric), L (logical), D (date →
  ISO string). Encoding from the sidecar .cpg when present, else latin-1.
- .prj: written as the EPSG WKT from functions/crs.py when the geometry
  column carries a uniform nonzero SRID; on read, a ``EPSG["...."]`` /
  AUTHORITY tail is sniffed back to an SRID (best effort).

Shapefiles are a single-file format hard-capped at ~2 GB by 32-bit word
offsets, so both directions run driver-side by design (same contract as the
reference's single-file read; the writer is additionally bounded by
``max_rows``). Polygon rings follow the spec convention: clockwise = outer
ring, counter-clockwise = hole; holes are assigned to the shell that
contains them.
"""

from __future__ import annotations

import math
import os
import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from polars_st_spark.geo.types import Geometry, GeometryType
from polars_st_spark.geo.wkb import from_ewkb, to_ewkb

__all__ = ["read_shapefile", "write_shapefile"]


# ----------------------------------------------------------------------
# Reader
# ----------------------------------------------------------------------

def _ring_signed_area(r: np.ndarray) -> float:
    x = r[:, 0] - r[0, 0]
    y = r[:, 1] - r[0, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def _point_in_ring(p, ring) -> bool:
    x, y = p
    inside = False
    j = len(ring) - 1
    for i in range(len(ring)):
        xi, yi = ring[i, 0], ring[i, 1]
        xj, yj = ring[j, 0], ring[j, 1]
        if (yi > y) != (yj > y) and x < (xj - xi) * (y - yi) / (yj - yi) + xi:
            inside = not inside
        j = i
    return inside


def _assemble_polygon(rings: list[np.ndarray], srid: int, has_z: bool) -> Geometry:
    """Spec convention: CW rings are shells, CCW rings are holes; each hole
    belongs to the shell that contains it."""
    shells = [r for r in rings if _ring_signed_area(r) <= 0]  # CW in spec = shell
    holes = [r for r in rings if _ring_signed_area(r) > 0]
    if not shells:  # degenerate: treat every ring as a shell
        shells, holes = rings, []
    parts: list[list[np.ndarray]] = [[s] for s in shells]
    for h in holes:
        placed = False
        for part in parts:
            if _point_in_ring(h[0, :2], part[0]):
                part.append(h)
                placed = True
                break
        if not placed:
            parts.append([h])
    if len(parts) == 1:
        return Geometry(GeometryType.Polygon, srid=srid, has_z=has_z, rings=parts[0])
    return Geometry(
        GeometryType.MultiPolygon, srid=srid, has_z=has_z,
        geoms=[Geometry(GeometryType.Polygon, srid=srid, has_z=has_z, rings=p) for p in parts],
    )


def _read_shape(content: bytes, srid: int) -> Geometry | None:
    (stype,) = struct.unpack_from("<i", content, 0)
    if stype == 0:
        return Geometry(GeometryType.Point, srid=srid, coords=None)
    has_z = stype in (11, 13, 15, 18)
    base = {1: 1, 11: 1, 3: 3, 13: 3, 5: 5, 15: 5, 8: 8, 18: 8}.get(stype)
    if base is None:
        raise ValueError(f"Unsupported shapefile shape type {stype}")
    if base == 1:  # Point
        x, y = struct.unpack_from("<2d", content, 4)
        coords = [x, y]
        if has_z:
            (z,) = struct.unpack_from("<d", content, 20)
            coords.append(z)
        return Geometry(GeometryType.Point, srid=srid, has_z=has_z,
                        coords=np.array(coords, dtype=np.float64))
    if base == 8:  # MultiPoint: bbox, n, points
        (n,) = struct.unpack_from("<i", content, 36)
        pts = np.frombuffer(content, dtype="<f8", count=2 * n, offset=40).reshape(n, 2)
        zs = None
        if has_z:
            off = 40 + 16 * n + 16  # skip zmin/zmax
            zs = np.frombuffer(content, dtype="<f8", count=n, offset=off)
        arr = np.column_stack([pts, zs]) if zs is not None else pts
        return Geometry(
            GeometryType.MultiPoint, srid=srid, has_z=has_z,
            geoms=[Geometry(GeometryType.Point, srid=srid, has_z=has_z,
                            coords=arr[i].copy()) for i in range(n)],
        )
    # PolyLine / Polygon: bbox, numparts, numpoints, parts[], points[]
    nparts, npoints = struct.unpack_from("<2i", content, 36)
    parts = struct.unpack_from(f"<{nparts}i", content, 44)
    pts_off = 44 + 4 * nparts
    pts = np.frombuffer(content, dtype="<f8", count=2 * npoints, offset=pts_off).reshape(npoints, 2)
    if has_z:
        z_off = pts_off + 16 * npoints + 16
        zs = np.frombuffer(content, dtype="<f8", count=npoints, offset=z_off)
        pts = np.column_stack([pts, zs])
    bounds = list(parts) + [npoints]
    chunks = [pts[bounds[i]:bounds[i + 1]].copy() for i in range(nparts)]
    if base == 3:
        if len(chunks) == 1:
            return Geometry(GeometryType.LineString, srid=srid, has_z=has_z, coords=chunks[0])
        return Geometry(
            GeometryType.MultiLineString, srid=srid, has_z=has_z,
            geoms=[Geometry(GeometryType.LineString, srid=srid, has_z=has_z, coords=c)
                   for c in chunks],
        )
    return _assemble_polygon(chunks, srid, has_z)


def _read_dbf(path: str):
    """(field_names, rows) from a dBase III .dbf; [] fields if absent."""
    if not os.path.exists(path):
        return [], None
    enc = "latin-1"
    cpg = os.path.splitext(path)[0] + ".cpg"
    if os.path.exists(cpg):
        with open(cpg) as f:
            token = f.read().strip()
        enc = {"UTF-8": "utf-8", "UTF8": "utf-8", "ISO-8859-1": "latin-1"}.get(
            token.upper(), token or "latin-1")
    with open(path, "rb") as f:
        head = f.read(32)
        n_rec = struct.unpack_from("<i", head, 4)[0]
        hdr_size, rec_size = struct.unpack_from("<2h", head, 8)
        fields = []
        while True:
            fd = f.read(32)
            if not fd or fd[0] == 0x0D:
                break
            name = fd[:11].split(b"\x00")[0].decode(enc, "replace")
            ftype = chr(fd[11])
            flen = fd[16]
            fdec = fd[17]
            fields.append((name, ftype, flen, fdec))
            if f.tell() >= hdr_size:
                break
        f.seek(hdr_size)
        rows = []
        for _ in range(n_rec):
            rec = f.read(rec_size)
            if len(rec) < rec_size or rec[:1] == b"\x1a":
                break
            if rec[:1] == b"*":  # deleted
                continue
            vals = []
            off = 1
            for name, ftype, flen, fdec in fields:
                raw = rec[off:off + flen]
                off += flen
                txt = raw.decode(enc, "replace").strip()
                if ftype in ("N", "F"):
                    if not txt or txt == "*" * len(txt):
                        vals.append(None)
                    elif fdec or "." in txt or "e" in txt or "E" in txt:
                        vals.append(float(txt))
                    else:
                        vals.append(int(txt))
                elif ftype == "L":
                    vals.append(None if txt in ("", "?") else txt in ("Y", "y", "T", "t"))
                elif ftype == "D":
                    vals.append(f"{txt[:4]}-{txt[4:6]}-{txt[6:8]}" if len(txt) == 8 else None)
                else:
                    vals.append(txt if txt else None)
            rows.append(vals)
    return [f[0] for f in fields], rows


def _srid_from_prj(path: str) -> int:
    if not os.path.exists(path):
        return 0
    try:
        with open(path, encoding="utf-8", errors="replace") as f:
            wkt = f.read()
    except OSError:
        return 0
    import re

    # last AUTHORITY/ID clause wins (it names the whole CRS)
    hits = re.findall(r'(?:AUTHORITY|ID)\s*\[\s*"EPSG"\s*,\s*"?(\d+)"?\s*\]', wkt)
    return int(hits[-1]) if hits else 0


def read_shapefile(spark: SparkSession, path: str, geometry_name: str = "geometry") -> DataFrame:
    """Read ``path`` (.shp with optional .dbf/.prj/.cpg sidecars) into a
    DataFrame with an EWKB ``geometry_name`` column. Driver-side: the
    format's 32-bit word offsets cap a shapefile at ~2 GB."""
    srid = _srid_from_prj(os.path.splitext(path)[0] + ".prj")
    with open(path, "rb") as f:
        head = f.read(100)
        if struct.unpack_from(">i", head, 0)[0] != 9994:
            raise ValueError(f"{path} is not a shapefile (bad magic)")
        flen_words = struct.unpack_from(">i", head, 24)[0]
        total = flen_words * 2
        geoms = []
        while f.tell() < total:
            rh = f.read(8)
            if len(rh) < 8:
                break
            _, clen_words = struct.unpack(">2i", rh)
            content = f.read(clen_words * 2)
            geoms.append(_read_shape(content, srid))
    names, rows = _read_dbf(os.path.splitext(path)[0] + ".dbf")
    out_rows = []
    for i, g in enumerate(geoms):
        attrs = rows[i] if rows is not None and i < len(rows) else [None] * len(names)
        out_rows.append((*attrs, None if g is None else to_ewkb(g)))
    from pyspark.sql.types import BinaryType, StructField, StructType

    if rows is not None and rows and names:
        attr_df = spark.createDataFrame([r[:-1] for r in out_rows], names)
        schema = StructType(attr_df.schema.fields + [StructField(geometry_name, BinaryType())])
    else:
        names = []
        schema = StructType([StructField(geometry_name, BinaryType())])
        out_rows = [(r[-1],) for r in out_rows]
    return spark.createDataFrame(out_rows, schema)


# ----------------------------------------------------------------------
# Writer
# ----------------------------------------------------------------------

_SHAPE_TYPE = {
    GeometryType.Point: 1,
    GeometryType.LineString: 3,
    GeometryType.MultiLineString: 3,
    GeometryType.Polygon: 5,
    GeometryType.MultiPolygon: 5,
    GeometryType.MultiPoint: 8,
}
_Z_SHIFT = {1: 11, 3: 13, 5: 15, 8: 18}


def _chains_of(g: Geometry) -> list[np.ndarray]:
    if g.type_id == GeometryType.LineString:
        return [g.coords]
    return [s.coords for s in (g.geoms or [])]


def _rings_of(g: Geometry) -> list[np.ndarray]:
    """Rings oriented to spec: shells CW, holes CCW."""
    polys = [g] if g.type_id == GeometryType.Polygon else list(g.geoms or [])
    out = []
    for p in polys:
        for k, r in enumerate(p.rings or []):
            a = _ring_signed_area(r)
            shell = k == 0
            # spec: shell CW (negative signed area), hole CCW (positive)
            if (shell and a > 0) or (not shell and a < 0):
                r = r[::-1].copy()
            out.append(r)
    return out


def _shape_record(g: Geometry, stype: int, has_z: bool) -> bytes:
    ndim = 3 if has_z else 2

    def pts_bytes(arr):
        return np.ascontiguousarray(arr[:, :2], dtype="<f8").tobytes()

    def z_block(arrs):
        z = np.concatenate([
            a[:, 2] if a.shape[1] > 2 else np.zeros(len(a)) for a in arrs
        ]) if arrs else np.zeros(0)
        zmin = float(z.min()) if len(z) else 0.0
        zmax = float(z.max()) if len(z) else 0.0
        return struct.pack("<2d", zmin, zmax) + np.ascontiguousarray(z, dtype="<f8").tobytes()

    base = stype if stype < 10 else {11: 1, 13: 3, 15: 5, 18: 8}[stype]
    if base == 1:
        if g is None or g.coords is None:
            return struct.pack("<i", 0)  # Null shape
        c = g.coords
        body = struct.pack("<i2d", stype, float(c[0]), float(c[1]))
        if has_z:
            body += struct.pack("<d", float(c[2]) if len(c) > 2 else 0.0)
        return body
    if g is None or g.is_empty():
        return struct.pack("<i", 0)
    if base == 8:
        pts = np.stack([p.coords[:ndim] for p in (g.geoms or [])])
        x0, y0 = pts[:, 0].min(), pts[:, 1].min()
        x1, y1 = pts[:, 0].max(), pts[:, 1].max()
        body = struct.pack("<i4di", stype, x0, y0, x1, y1, len(pts)) + pts_bytes(pts)
        if has_z:
            body += z_block([pts])
        return body
    chunks = _rings_of(g) if base == 5 else _chains_of(g)
    chunks = [np.asarray(c, dtype=np.float64) for c in chunks if c is not None and len(c)]
    allpts = np.concatenate(chunks)
    x0, y0 = allpts[:, 0].min(), allpts[:, 1].min()
    x1, y1 = allpts[:, 0].max(), allpts[:, 1].max()
    offs = []
    o = 0
    for c in chunks:
        offs.append(o)
        o += len(c)
    body = struct.pack("<i4d2i", stype, x0, y0, x1, y1, len(chunks), o)
    body += struct.pack(f"<{len(offs)}i", *offs)
    body += b"".join(pts_bytes(c) for c in chunks)
    if has_z:
        body += z_block(chunks)
    return body


def _dbf_fields(schema_fields, rows):
    """(name, type, len, dec) per non-geometry column — GDAL-style widths."""
    from pyspark.sql.types import (BooleanType, DateType, DoubleType, FloatType,
                                   IntegerType, LongType, StringType)

    out = []
    for i, f in enumerate(schema_fields):
        name = f.name[:10]
        t = f.dataType
        if isinstance(t, (IntegerType, LongType)):
            out.append((name, "N", 18, 0))
        elif isinstance(t, (DoubleType, FloatType)):
            out.append((name, "N", 24, 15))
        elif isinstance(t, BooleanType):
            out.append((name, "L", 1, 0))
        elif isinstance(t, DateType):
            out.append((name, "D", 8, 0))
        elif isinstance(t, StringType):
            width = max([10] + [len(str(r[i])) for r in rows if r[i] is not None])
            out.append((name, "C", min(width, 254), 0))
        else:
            out.append((name, "C", 64, 0))
    return out


def _dbf_bytes(fields, rows) -> bytes:
    rec_size = 1 + sum(f[2] for f in fields)
    hdr_size = 32 + 32 * len(fields) + 1
    head = struct.pack("<4Bi2h20x", 3, 95, 1, 1, len(rows), hdr_size, rec_size)
    fd = b""
    for name, ftype, flen, fdec in fields:
        fd += struct.pack("<11sc4xBB14x", name.encode("latin-1")[:11], ftype.encode(), flen, fdec)
    body = bytearray()
    for r in rows:
        body += b" "
        for (name, ftype, flen, fdec), v in zip(fields, r):
            if v is None:
                txt = "" if ftype == "C" else ("?" if ftype == "L" else "")
            elif ftype == "N" and fdec:
                txt = f"{float(v):.{fdec}f}"
                if len(txt) > flen:
                    txt = f"{float(v):.{max(0, flen - len(txt) + fdec)}f}"[:flen]
            elif ftype == "N":
                txt = str(int(v))
            elif ftype == "L":
                txt = "T" if v else "F"
            elif ftype == "D":
                txt = v.strftime("%Y%m%d") if hasattr(v, "strftime") else str(v).replace("-", "")[:8]
            else:
                txt = str(v)
            raw = txt.encode("latin-1", "replace")[:flen]
            pad = b" " * (flen - len(raw))
            body += (pad + raw) if ftype == "N" else (raw + pad)
    return head + fd + b"\x0d" + bytes(body) + b"\x1a"


def write_shapefile(
    df: DataFrame,
    path: str,
    geometry_name: str = "geometry",
    max_rows: int = 1_000_000,
) -> None:
    """Write .shp/.shx/.dbf (+.prj when the SRID is uniform and known).
    Driver-side and row-bounded like :func:`write_geojson` — the format
    itself caps at ~2 GB. All geometries must map to one shapefile shape
    type (Point / Line / Polygon / MultiPoint families)."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(f"write_shapefile exceeds max_rows={max_rows}")
    attr_fields = [f for f in df.schema.fields if f.name != geometry_name]
    geoms = [None if r[geometry_name] is None else from_ewkb(bytes(r[geometry_name]))
             for r in rows]
    first = next((g for g in geoms if g is not None and not g.is_empty()), None)
    if first is None:
        raise ValueError("write_shapefile needs at least one non-empty geometry")
    base = _SHAPE_TYPE.get(first.type_id)
    if base is None:
        raise ValueError(f"Geometry type {first.type_id} has no shapefile shape type")
    has_z = any(g is not None and g.has_z for g in geoms)
    stype = _Z_SHIFT[base] if has_z else base
    for g in geoms:
        if g is not None and not g.is_empty() and _SHAPE_TYPE.get(g.type_id) != base:
            raise ValueError("Shapefiles require a single shape type per file")

    records = [_shape_record(g, stype, has_z) for g in geoms]
    # global bbox
    xs0, ys0, xs1, ys1 = [], [], [], []
    for g in geoms:
        if g is not None and not g.is_empty():
            b = g.bounds()
            if not math.isnan(b[0]):
                xs0.append(b[0]); ys0.append(b[1]); xs1.append(b[2]); ys1.append(b[3])
    bbox = (min(xs0), min(ys0), max(xs1), max(ys1)) if xs0 else (0.0, 0.0, 0.0, 0.0)

    shp_len = 100 + sum(8 + len(r) for r in records)
    base_path = os.path.splitext(path)[0]

    def header(total_bytes):
        return (
            struct.pack(">i5i", 9994, 0, 0, 0, 0, 0)
            + struct.pack(">i", total_bytes // 2)
            + struct.pack("<2i", 1000, stype)
            + struct.pack("<4d", *bbox)
            + struct.pack("<4d", 0.0, 0.0, 0.0, 0.0)
        )

    with open(base_path + ".shp", "wb") as f:
        f.write(header(shp_len))
        for i, rec in enumerate(records):
            f.write(struct.pack(">2i", i + 1, len(rec) // 2))
            f.write(rec)
    with open(base_path + ".shx", "wb") as f:
        f.write(header(100 + 8 * len(records)))
        off = 50  # in 16-bit words
        for rec in records:
            f.write(struct.pack(">2i", off, len(rec) // 2))
            off += 4 + len(rec) // 2
    attr_idx = [i for i, f in enumerate(df.schema.fields) if f.name != geometry_name]
    attr_rows = [[r[i] for i in attr_idx] for r in rows]
    fields = _dbf_fields(attr_fields, attr_rows)
    with open(base_path + ".dbf", "wb") as f:
        f.write(_dbf_bytes(fields, attr_rows))
    srids = {g.srid for g in geoms if g is not None and g.srid}
    if len(srids) == 1:
        try:
            from polars_st_spark.functions.crs import get_crs_from_code

            with open(base_path + ".prj", "w") as f:
                f.write(get_crs_from_code(next(iter(srids))))
        except ValueError:
            pass  # unknown EPSG: skip the sidecar
