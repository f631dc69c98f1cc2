"""GeoJSON geometry codec (RFC 7946).

Mirrors the reference's from_geojson/to_geojson (reference:
src/functions.rs:286, src/functions.rs:748-754). GeoJSON has no SRID; parsed
geometries get srid=0 and the writer drops SRID, like GEOS.
"""

from __future__ import annotations

import json

import numpy as np

from polars_st_spark.geo.types import Geometry, GeometryType

__all__ = ["from_geojson", "to_geojson"]

_GJ_NAME = {
    GeometryType.Point: "Point",
    GeometryType.LineString: "LineString",
    GeometryType.Polygon: "Polygon",
    GeometryType.MultiPoint: "MultiPoint",
    GeometryType.MultiLineString: "MultiLineString",
    GeometryType.MultiPolygon: "MultiPolygon",
    GeometryType.GeometryCollection: "GeometryCollection",
}
_GJ_TYPE = {v: k for k, v in _GJ_NAME.items()}


def from_geojson(text: str) -> Geometry:
    return _from_obj(json.loads(text))


def _coords_arr(c) -> np.ndarray:
    a = np.asarray(c, dtype=np.float64)
    if a.ndim == 1:
        a = a.reshape(0, 2) if a.size == 0 else a.reshape(1, -1)
    return a


def _from_obj(obj: dict) -> Geometry:
    t = obj.get("type")
    if t == "Feature":
        return _from_obj(obj["geometry"])
    if t == "FeatureCollection":
        geoms = [_from_obj(f) for f in obj.get("features", [])]
        return Geometry(GeometryType.GeometryCollection, geoms=geoms)
    if t not in _GJ_TYPE:
        raise ValueError(f"Unsupported GeoJSON type: {t!r}")
    tid = _GJ_TYPE[t]
    if tid == GeometryType.GeometryCollection:
        geoms = [_from_obj(g) for g in obj.get("geometries", [])]
        has_z = any(g.has_z for g in geoms)
        return Geometry(tid, has_z=has_z, geoms=geoms)
    c = obj.get("coordinates", [])
    if tid == GeometryType.Point:
        arr = np.asarray(c, dtype=np.float64)
        if arr.size == 0:
            return Geometry(tid, coords=None)
        return Geometry(tid, has_z=arr.size >= 3, coords=arr)
    if tid == GeometryType.LineString:
        arr = _coords_arr(c)
        return Geometry(tid, has_z=arr.shape[1] >= 3 if len(arr) else False, coords=arr)
    if tid == GeometryType.Polygon:
        rings = [_coords_arr(r) for r in c]
        has_z = bool(rings and len(rings[0]) and rings[0].shape[1] >= 3)
        return Geometry(tid, has_z=has_z, rings=rings)
    if tid == GeometryType.MultiPoint:
        pts = [Geometry(GeometryType.Point, has_z=len(p) >= 3, coords=np.asarray(p, dtype=np.float64)) for p in c]
        return Geometry(tid, has_z=any(p.has_z for p in pts), geoms=pts)
    if tid == GeometryType.MultiLineString:
        lines = [_from_obj({"type": "LineString", "coordinates": l}) for l in c]
        return Geometry(tid, has_z=any(l.has_z for l in lines), geoms=lines)
    # MultiPolygon
    polys = [_from_obj({"type": "Polygon", "coordinates": p}) for p in c]
    return Geometry(tid, has_z=any(p.has_z for p in polys), geoms=polys)


def _round(v: float) -> float:
    return float(v)


def _seq(arr: np.ndarray, ndim: int) -> list:
    return [[_round(x) for x in row[:ndim]] for row in arr]


def to_geojson(g: Geometry, indent: int | None = None) -> str:
    return json.dumps(_to_obj(g), indent=indent, separators=(",", ":") if indent is None else None)


def _to_obj(g: Geometry) -> dict:
    t = g.type_id
    name = _GJ_NAME.get(GeometryType(t))
    if name is None:
        raise ValueError(f"Geometry type {g.type_name} not representable in GeoJSON")
    ndim = 3 if g.has_z else 2
    if t == GeometryType.GeometryCollection:
        return {"type": name, "geometries": [_to_obj(s) for s in (g.geoms or [])]}
    if t == GeometryType.Point:
        if g.coords is None:
            return {"type": name, "coordinates": []}
        return {"type": name, "coordinates": [_round(x) for x in g.coords[:ndim]]}
    if t == GeometryType.LineString:
        return {"type": name, "coordinates": _seq(g.coords if g.coords is not None else np.empty((0, 2)), ndim)}
    if t == GeometryType.Polygon:
        return {"type": name, "coordinates": [_seq(r, ndim) for r in (g.rings or [])]}
    if t == GeometryType.MultiPoint:
        return {
            "type": name,
            "coordinates": [
                [] if s.coords is None else [_round(x) for x in s.coords[:ndim]]
                for s in (g.geoms or [])
            ],
        }
    if t == GeometryType.MultiLineString:
        return {"type": name, "coordinates": [_seq(s.coords, ndim) for s in (g.geoms or [])]}
    # MultiPolygon
    return {"type": name, "coordinates": [[_seq(r, ndim) for r in (s.rings or [])] for s in (g.geoms or [])]}
