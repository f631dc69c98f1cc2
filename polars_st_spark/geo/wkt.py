"""WKT / EWKT parser and writer.

Output format mirrors the GEOS WKTWriter the reference uses
(reference: src/functions.rs:703-732): default ``rounding_precision=6``,
``trim=True``, ``output_dimension=3``; EWKT prefixes ``SRID=n;`` when the
SRID is nonzero (reference: functions.rs:717-732).
"""

from __future__ import annotations

import re

import numpy as np

from polars_st_spark.geo.types import (
    _COLLECTION_IDS,
    _LINEAL_IDS,
    _POLYGONAL_IDS,
    Geometry,
    GeometryType,
)

__all__ = ["from_wkt", "from_ewkt", "to_wkt", "to_ewkt"]

_TYPE_BY_NAME = {
    "POINT": GeometryType.Point,
    "LINESTRING": GeometryType.LineString,
    "POLYGON": GeometryType.Polygon,
    "MULTIPOINT": GeometryType.MultiPoint,
    "MULTILINESTRING": GeometryType.MultiLineString,
    "MULTIPOLYGON": GeometryType.MultiPolygon,
    "GEOMETRYCOLLECTION": GeometryType.GeometryCollection,
    "CIRCULARSTRING": GeometryType.CircularString,
    "COMPOUNDCURVE": GeometryType.CompoundCurve,
    "CURVEPOLYGON": GeometryType.CurvePolygon,
    "MULTICURVE": GeometryType.MultiCurve,
    "MULTISURFACE": GeometryType.MultiSurface,
    "POLYHEDRALSURFACE": GeometryType.PolyhedralSurface,
    "TIN": GeometryType.Tin,
    "TRIANGLE": GeometryType.Triangle,
}

_NAME_BY_TYPE = {v: k for k, v in _TYPE_BY_NAME.items()}

_TOKEN_RE = re.compile(
    r"\s*([A-Za-z]+|\(|\)|,|[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?)"
)


class _Tokens:
    def __init__(self, text: str) -> None:
        self.tokens: list[str] = []
        pos = 0
        n = len(text)
        while pos < n:
            m = _TOKEN_RE.match(text, pos)
            if m is None:
                if text[pos:].strip() == "":
                    break
                raise ValueError(f"Invalid WKT at position {pos}: {text[pos:pos+20]!r}")
            self.tokens.append(m.group(1))
            pos = m.end()
        self.i = 0

    def peek(self) -> str | None:
        return self.tokens[self.i] if self.i < len(self.tokens) else None

    def next(self) -> str:
        if self.i >= len(self.tokens):
            raise ValueError("Unexpected end of WKT")
        tok = self.tokens[self.i]
        self.i += 1
        return tok

    def expect(self, tok: str) -> None:
        got = self.next()
        if got != tok:
            raise ValueError(f"Expected {tok!r}, got {got!r} in WKT")


def from_ewkt(text: str) -> Geometry:
    """Parse ``SRID=n;WKT`` (reference: functions.rs:266-284)."""
    srid = 0
    s = text.strip()
    if s[:5].upper() == "SRID=":
        head, sep, rest = s.partition(";")
        if not sep:
            raise ValueError(f"Invalid EWKT (missing ';'): {text[:40]!r}")
        srid = int(head[5:])
        s = rest
    g = from_wkt(s)
    return g.with_srid(srid) if srid else g


def from_wkt(text: str) -> Geometry:
    tk = _Tokens(text)
    g = _parse_geometry(tk)
    if tk.peek() is not None:
        raise ValueError(f"Trailing content in WKT: {tk.peek()!r}")
    return g


def _parse_geometry(tk: _Tokens) -> Geometry:
    name = tk.next().upper()
    if name not in _TYPE_BY_NAME:
        raise ValueError(f"Unknown geometry type {name!r}")
    type_id = _TYPE_BY_NAME[name]

    has_z = False
    has_m = False
    nxt = tk.peek()
    if nxt is not None and nxt.upper() in ("Z", "M", "ZM"):
        flag = tk.next().upper()
        has_z = "Z" in flag
        has_m = "M" in flag

    nxt = tk.peek()
    if nxt is not None and nxt.upper() == "EMPTY":
        tk.next()
        return _make_empty(type_id, has_z, has_m)

    ndim = 2 + has_z + has_m
    if type_id == GeometryType.Point:
        tk.expect("(")
        coord = _parse_coord(tk, ndim)
        tk.expect(")")
        g = Geometry(type_id, has_z=has_z, has_m=has_m, coords=coord)
    elif type_id in _LINEAL_IDS:
        g = Geometry(type_id, has_z=has_z, has_m=has_m, coords=_parse_coord_seq(tk, ndim))
    elif type_id in _POLYGONAL_IDS:
        g = Geometry(type_id, has_z=has_z, has_m=has_m, rings=_parse_ring_seq(tk, ndim))
    elif type_id == GeometryType.GeometryCollection:
        geoms: list[Geometry] = []
        tk.expect("(")
        while True:
            geoms.append(_parse_geometry(tk))
            if tk.peek() == ",":
                tk.next()
                continue
            break
        tk.expect(")")
        g = Geometry(type_id, has_z=has_z, has_m=has_m, geoms=geoms)
    else:
        # Multi* — elements may be written with or without their own tag/parens
        geoms = []
        tk.expect("(")
        elem_name = {
            GeometryType.MultiPoint: GeometryType.Point,
            GeometryType.MultiLineString: GeometryType.LineString,
            GeometryType.MultiPolygon: GeometryType.Polygon,
            GeometryType.MultiCurve: GeometryType.LineString,
            GeometryType.MultiSurface: GeometryType.Polygon,
            GeometryType.PolyhedralSurface: GeometryType.Polygon,
            GeometryType.Tin: GeometryType.Triangle,
            GeometryType.CompoundCurve: GeometryType.LineString,
            GeometryType.CurvePolygon: GeometryType.LineString,
        }[type_id]
        while True:
            nxt = tk.peek()
            if nxt is not None and nxt.upper() in _TYPE_BY_NAME:
                geoms.append(_parse_geometry(tk))
            elif type_id == GeometryType.MultiPoint and nxt not in ("(",):
                # bare "MULTIPOINT (1 2, 3 4)" form
                coord = _parse_coord(tk, 2 + has_z + has_m)
                geoms.append(Geometry(GeometryType.Point, has_z=has_z, has_m=has_m, coords=coord))
            elif elem_name == GeometryType.Point:
                tk.expect("(")
                coord = _parse_coord(tk, 2 + has_z + has_m)
                tk.expect(")")
                geoms.append(Geometry(GeometryType.Point, has_z=has_z, has_m=has_m, coords=coord))
            elif elem_name == GeometryType.LineString:
                geoms.append(
                    Geometry(
                        GeometryType.LineString,
                        has_z=has_z,
                        has_m=has_m,
                        coords=_parse_coord_seq(tk, 2 + has_z + has_m),
                    )
                )
            else:  # Polygon / Triangle rings
                geoms.append(
                    Geometry(
                        elem_name,
                        has_z=has_z,
                        has_m=has_m,
                        rings=_parse_ring_seq(tk, 2 + has_z + has_m),
                    )
                )
            if tk.peek() == ",":
                tk.next()
                continue
            break
        tk.expect(")")
        g = Geometry(type_id, has_z=has_z, has_m=has_m, geoms=geoms)

    # infer Z from coord arity when no tag was given: "POINT (1 2 3)"
    return _fix_untagged_z(g)


def _fix_untagged_z(g: Geometry) -> Geometry:
    if g.has_z or g.has_m:
        return g
    width = None
    if g.type_id == GeometryType.Point and g.coords is not None:
        width = len(g.coords)
    elif g.type_id in _LINEAL_IDS and g.coords is not None and len(g.coords):
        width = g.coords.shape[1]
    elif g.type_id in _POLYGONAL_IDS and g.rings:
        width = g.rings[0].shape[1]
    elif g.geoms:
        g.geoms = [_fix_untagged_z(sub) for sub in g.geoms]
        # Multi* children are written untagged, so inherit their inferred dims;
        # GEOMETRYCOLLECTION children carry their own tags — don't inherit.
        if (
            g.type_id != GeometryType.GeometryCollection
            and g.geoms
            and (g.geoms[0].has_z or g.geoms[0].has_m)
        ):
            g.has_z = g.geoms[0].has_z
            g.has_m = g.geoms[0].has_m
        return g
    if width is not None and width >= 3:
        g.has_z = True
        if width >= 4:
            g.has_m = True
    return g


def _make_empty(type_id: int, has_z: bool, has_m: bool) -> Geometry:
    ndim = 2 + has_z + has_m
    if type_id == GeometryType.Point:
        return Geometry(type_id, has_z=has_z, has_m=has_m, coords=None)
    if type_id in _LINEAL_IDS:
        return Geometry(type_id, has_z=has_z, has_m=has_m, coords=np.empty((0, ndim)))
    if type_id in _POLYGONAL_IDS:
        return Geometry(type_id, has_z=has_z, has_m=has_m, rings=[])
    return Geometry(type_id, has_z=has_z, has_m=has_m, geoms=[])


def _parse_coord(tk: _Tokens, ndim: int) -> np.ndarray:
    vals = [float(tk.next())]
    while tk.peek() not in (",", ")", None):
        vals.append(float(tk.next()))
    return np.asarray(vals, dtype=np.float64)


def _parse_coord_seq(tk: _Tokens, ndim: int) -> np.ndarray:
    nxt = tk.peek()
    if nxt is not None and nxt.upper() == "EMPTY":
        tk.next()
        return np.empty((0, ndim))
    tk.expect("(")
    rows = []
    while True:
        rows.append(_parse_coord(tk, ndim))
        if tk.peek() == ",":
            tk.next()
            continue
        break
    tk.expect(")")
    width = max(len(r) for r in rows)
    return np.asarray([np.pad(r, (0, width - len(r))) for r in rows], dtype=np.float64)


def _parse_ring_seq(tk: _Tokens, ndim: int) -> list[np.ndarray]:
    nxt = tk.peek()
    if nxt is not None and nxt.upper() == "EMPTY":
        tk.next()
        return []
    tk.expect("(")
    rings = []
    while True:
        rings.append(_parse_coord_seq(tk, ndim))
        if tk.peek() == ",":
            tk.next()
            continue
        break
    tk.expect(")")
    return rings


# ----------------------------------------------------------------------
# Writer
# ----------------------------------------------------------------------

def _fmt_num(v: float, precision: int, trim: bool) -> str:
    if v != v:  # NaN
        return "NaN"
    if precision < 0:
        s = repr(float(v))
    else:
        s = f"{v:.{precision}f}"
    # trim trailing zeros from the mantissa only — never from an exponent
    if trim and "." in s and "e" not in s and "E" not in s:
        s = s.rstrip("0").rstrip(".")
    if s in ("-0", ""):
        s = "0"
    return s


def to_ewkt(
    g: Geometry,
    rounding_precision: int = 6,
    trim: bool = True,
    output_dimension: int = 3,
    old_3d: bool = False,
) -> str:
    """WKT prefixed with ``SRID=n;`` when srid != 0 (reference: functions.rs:717-732)."""
    wkt = to_wkt(g, rounding_precision, trim, output_dimension, old_3d)
    if g.srid:
        return f"SRID={g.srid};{wkt}"
    return wkt


def to_wkt(
    g: Geometry,
    rounding_precision: int = 6,
    trim: bool = True,
    output_dimension: int = 3,
    old_3d: bool = False,
) -> str:
    return _write(g, rounding_precision, trim, output_dimension, old_3d)


def _dim_tag(keep_z: bool, keep_m: bool, old_3d: bool) -> str:
    if old_3d:
        return ""
    tag = ("Z" if keep_z else "") + ("M" if keep_m else "")
    return f" {tag}" if tag else ""


def _select_cols(g: Geometry, arr: np.ndarray, keep_z: bool, keep_m: bool) -> np.ndarray:
    cols = [0, 1]
    idx = 2
    if g.has_z:
        if keep_z:
            cols.append(idx)
        idx += 1
    if g.has_m and keep_m:
        cols.append(idx)
    return arr[:, cols]


def _write(g: Geometry, prec: int, trim: bool, outdim: int, old_3d: bool) -> str:
    name = _NAME_BY_TYPE.get(GeometryType(g.type_id) if g.type_id in GEOM_IDS else GeometryType.Point, "POINT")
    # which coordinate columns survive output_dimension, per node
    keep_z = g.has_z and outdim >= 3
    keep_m = g.has_m and (outdim >= 4 or (not g.has_z and outdim >= 3))
    tag = _dim_tag(keep_z, keep_m, old_3d)

    def fmt_seq(arr: np.ndarray) -> str:
        sel = _select_cols(g, arr, keep_z, keep_m)
        return ", ".join(
            " ".join(_fmt_num(v, prec, trim) for v in row) for row in sel
        )

    t = g.type_id
    if t == GeometryType.Point:
        if g.coords is None or (len(g.coords) and np.isnan(g.coords[0])):
            return f"{name}{tag} EMPTY"
        return f"{name}{tag} ({fmt_seq(g.coords.reshape(1, -1))})"
    if t in _LINEAL_IDS:
        if g.coords is None or len(g.coords) == 0:
            return f"{name}{tag} EMPTY"
        return f"{name}{tag} ({fmt_seq(g.coords)})"
    if t in _POLYGONAL_IDS:
        if not g.rings:
            return f"{name}{tag} EMPTY"
        rings = ", ".join(f"({fmt_seq(r)})" for r in g.rings)
        return f"{name}{tag} ({rings})"
    # collections
    if not g.geoms:
        return f"{name}{tag} EMPTY"
    if t == GeometryType.GeometryCollection:
        inner = ", ".join(_write(s, prec, trim, outdim, old_3d) for s in g.geoms)
        return f"{name}{tag} ({inner})"
    # Multi*: write children without their type names — EXCEPT curved
    # components inside curve containers, which keep their tag (PostGIS
    # convention: `CURVEPOLYGON (COMPOUNDCURVE (CIRCULARSTRING (...), ...))`
    # — an untagged nested list would be ambiguous with a plain ring)
    _curved_kids = (GeometryType.CircularString, GeometryType.CompoundCurve,
                    GeometryType.CurvePolygon)
    parts = []
    for s in g.geoms:
        body = _write(s, prec, trim, outdim, old_3d)
        if t in (GeometryType.CompoundCurve, GeometryType.CurvePolygon,
                 GeometryType.MultiCurve, GeometryType.MultiSurface) \
                and s.type_id in _curved_kids:
            parts.append(body)
            continue
        # strip "TYPE [TAG] " prefix, keep parens/EMPTY
        stripped = body.split(" ", 1)[1] if " " in body else body
        if stripped.startswith(("Z ", "M ", "ZM ")):
            stripped = stripped.split(" ", 1)[1]
        parts.append(stripped)
    return f"{name}{tag} ({', '.join(parts)})"


GEOM_IDS = set(int(t) for t in GeometryType)
