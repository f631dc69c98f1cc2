"""Typed geometry casts — transcription of the reference's cast table
(reference: src/functions.rs:61-177). Invalid casts raise ValueError; SRID is
preserved (functions.rs:62,175).
"""

from __future__ import annotations

import numpy as np

from polars_st_spark.geo.algos import _closed
from polars_st_spark.geo.types import Geometry, GeometryType

__all__ = ["cast_geometry"]

_T = GeometryType


def cast_geometry(g: Geometry, into: int | str) -> Geometry:
    if isinstance(into, str):
        into = GeometryType[into]
    into = GeometryType(into)
    t = GeometryType(g.type_id)
    if t == into:
        return g.copy()
    srid = g.srid

    def out(x: Geometry) -> Geometry:
        return x.with_srid(srid) if srid else x

    # any → GeometryCollection (functions.rs:170-173)
    if into == _T.GeometryCollection:
        return out(Geometry(_T.GeometryCollection, has_z=g.has_z, has_m=g.has_m, geoms=[g.copy()]))

    if t == _T.Point and into == _T.MultiPoint:
        return out(Geometry(_T.MultiPoint, has_z=g.has_z, has_m=g.has_m, geoms=[g.copy()]))

    if t == _T.LineString:
        if into == _T.MultiPoint:  # vertices (functions.rs:84-89)
            pts = [] if g.coords is None else [
                Geometry(_T.Point, has_z=g.has_z, has_m=g.has_m, coords=c.copy()) for c in g.coords
            ]
            return out(Geometry(_T.MultiPoint, has_z=g.has_z, has_m=g.has_m, geoms=pts))
        if into == _T.MultiLineString:
            return out(Geometry(_T.MultiLineString, has_z=g.has_z, has_m=g.has_m, geoms=[g.copy()]))
        if into == _T.CircularString:
            return out(Geometry(_T.CircularString, has_z=g.has_z, has_m=g.has_m,
                                coords=None if g.coords is None else g.coords.copy()))

    if t == _T.CircularString and into in (_T.LineString, _T.MultiCurve):
        if into == _T.LineString:
            return out(Geometry(_T.LineString, has_z=g.has_z, has_m=g.has_m,
                                coords=None if g.coords is None else g.coords.copy()))
        return out(Geometry(_T.MultiCurve, has_z=g.has_z, has_m=g.has_m, geoms=[g.copy()]))

    if t == _T.MultiLineString and into == _T.Polygon:  # rings (functions.rs:118-124)
        rings = []
        for s in g.geoms or []:
            if s.coords is None or len(s.coords) < 4:
                raise ValueError("Cannot cast open/short LineString to Polygon ring")
            rings.append(_closed(s.coords).copy())
        return out(Geometry(_T.Polygon, has_z=g.has_z, has_m=g.has_m, rings=rings))

    if t == _T.Polygon:
        if into == _T.MultiLineString:  # rings to lines
            lines = [
                Geometry(_T.LineString, has_z=g.has_z, has_m=g.has_m, coords=_closed(r).copy())
                for r in (g.rings or [])
            ]
            return out(Geometry(_T.MultiLineString, has_z=g.has_z, has_m=g.has_m, geoms=lines))
        if into in (_T.MultiPolygon, _T.MultiSurface):
            return out(Geometry(into, has_z=g.has_z, has_m=g.has_m, geoms=[g.copy()]))

    if t in (_T.MultiPoint, _T.MultiLineString, _T.MultiPolygon) and len(g.geoms or []) == 1:
        inner = g.geoms[0]
        single = {_T.MultiPoint: _T.Point, _T.MultiLineString: _T.LineString,
                  _T.MultiPolygon: _T.Polygon}[t]
        if into == single:
            return out(inner.copy())

    if t == _T.GeometryCollection and len(g.geoms or []) == 1 and g.geoms[0].type_id == into:
        return out(g.geoms[0].copy())

    raise ValueError(f"Cannot cast {t.name} to {into.name}")
