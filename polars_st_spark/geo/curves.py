"""Curved-geometry linearization.

The reference supports curved types because GEOS 3.14 does (SURVEY §7 hard
part 1); GEOS itself linearizes curves for most computations. This module
does the same: 3-point circular arcs are sampled at a configurable angular
step, converting CircularString→LineString, CompoundCurve→LineString,
CurvePolygon→Polygon, MultiCurve→MultiLineString, MultiSurface→MultiPolygon.

Serialization keeps the original curved EWKB/WKT; linearization happens at
compute time (measures, predicates, overlay).
"""

from __future__ import annotations

import math

import numpy as np

from polars_st_spark.geo.types import Geometry, GeometryType

__all__ = ["linearize", "arc_points"]

_DEFAULT_SEGS = 32  # samples per full circle


def arc_points(p0, p1, p2, segs_per_circle: int = _DEFAULT_SEGS) -> np.ndarray:
    """Points along the circular arc p0→p1→p2 (inclusive ends).

    Collinear inputs degrade to the straight polyline [p0, p1, p2].
    """
    p0 = np.asarray(p0, dtype=np.float64)[:2]
    p1 = np.asarray(p1, dtype=np.float64)[:2]
    p2 = np.asarray(p2, dtype=np.float64)[:2]
    ax, ay = p0
    bx, by = p1
    cx, cy = p2
    scale = max(abs(ax), abs(ay), abs(bx), abs(by), abs(cx), abs(cy), 1.0)
    # PostGIS-style full circle: start == end with a distinct midpoint. The
    # collinearity determinant is 0 here, so this must precede that check.
    if math.hypot(ax - cx, ay - cy) <= 1e-12 * scale and math.hypot(ax - bx, ay - by) > 1e-12 * scale:
        ux, uy = (ax + bx) / 2.0, (ay + by) / 2.0
        r = math.hypot(bx - ax, by - ay) / 2.0
        a0 = math.atan2(ay - uy, ax - ux)
        n = max(4, segs_per_circle)
        angles = a0 + 2.0 * math.pi * np.linspace(0.0, 1.0, n + 1)
        pts = np.column_stack([ux + r * np.cos(angles), uy + r * np.sin(angles)])
        pts[0] = p0
        pts[-1] = p2
        return pts
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if abs(d) < 1e-12 * scale * scale:
        return np.array([p0, p1, p2])
    ux = ((ax * ax + ay * ay) * (by - cy) + (bx * bx + by * by) * (cy - ay) + (cx * cx + cy * cy) * (ay - by)) / d
    uy = ((ax * ax + ay * ay) * (cx - bx) + (bx * bx + by * by) * (ax - cx) + (cx * cx + cy * cy) * (bx - ax)) / d
    r = math.hypot(ax - ux, ay - uy)
    a0 = math.atan2(ay - uy, ax - ux)
    a1 = math.atan2(by - uy, bx - ux)
    a2 = math.atan2(cy - uy, cx - ux)

    # choose sweep direction that passes through p1
    def sweep(frm, to, ccw):
        s = to - frm
        if ccw:
            while s < 0:
                s += 2 * math.pi
        else:
            while s > 0:
                s -= 2 * math.pi
        return s

    for ccw in (True, False):
        s01 = sweep(a0, a1, ccw)
        s02 = sweep(a0, a2, ccw)
        if abs(s01) <= abs(s02) + 1e-12:
            total = s02
            break
    n = max(2, int(math.ceil(abs(total) / (2 * math.pi) * segs_per_circle)))
    angles = a0 + total * np.linspace(0.0, 1.0, n + 1)
    pts = np.column_stack([ux + r * np.cos(angles), uy + r * np.sin(angles)])
    pts[0] = p0
    pts[-1] = p2
    return pts


def _linearize_chain(coords: np.ndarray, segs: int) -> np.ndarray:
    """CircularString coords (odd count: arcs over consecutive triples)."""
    c = np.asarray(coords)[:, :2]
    if len(c) < 3:
        return c.copy()
    out = [c[:1]]
    for i in range(0, len(c) - 2, 2):
        pts = arc_points(c[i], c[i + 1], c[i + 2], segs)
        out.append(pts[1:])
    return np.vstack(out)


def linearize(g: Geometry, segs_per_circle: int = _DEFAULT_SEGS) -> Geometry:
    """Straight-line approximation of any curved geometry; non-curved
    geometries are returned unchanged (same object)."""
    t = g.type_id
    if t == GeometryType.CircularString:
        coords = g.coords if g.coords is not None else np.empty((0, 2))
        return Geometry(GeometryType.LineString, srid=g.srid,
                        coords=_linearize_chain(coords, segs_per_circle))
    if t == GeometryType.CompoundCurve:
        parts = [linearize(s, segs_per_circle) for s in (g.geoms or [])]
        # Straight segments pass through linearize unchanged and may carry
        # Z/M columns; arc chains are always 2-D — normalize before stitching.
        chains = [
            np.asarray(p.coords, dtype=np.float64)[:, :2]
            for p in parts
            if p.coords is not None and len(p.coords)
        ]
        if not chains:
            return Geometry(GeometryType.LineString, srid=g.srid, coords=np.empty((0, 2)))
        merged = [chains[0]]
        for c in chains[1:]:
            merged.append(c[1:] if np.allclose(merged[-1][-1], c[0]) else c)
        return Geometry(GeometryType.LineString, srid=g.srid, coords=np.vstack(merged))
    if t == GeometryType.CurvePolygon:
        rings = []
        for s in g.geoms or []:
            ring = linearize(s, segs_per_circle)
            if ring.coords is not None and len(ring.coords) >= 3:
                rings.append(ring.coords)
        return Geometry(GeometryType.Polygon, srid=g.srid, rings=rings)
    if t in (GeometryType.MultiCurve,):
        return Geometry(
            GeometryType.MultiLineString, srid=g.srid,
            geoms=[linearize(s, segs_per_circle) for s in (g.geoms or [])],
        )
    if t in (GeometryType.MultiSurface,):
        return Geometry(
            GeometryType.MultiPolygon, srid=g.srid,
            geoms=[linearize(s, segs_per_circle) for s in (g.geoms or [])],
        )
    if g.geoms is not None and any(_is_curved(s) for s in g.geoms):
        return Geometry(t, srid=g.srid, has_z=g.has_z, has_m=g.has_m,
                        geoms=[linearize(s, segs_per_circle) for s in g.geoms])
    return g


def _is_curved(g: Geometry) -> bool:
    if g.type_id in (
        GeometryType.CircularString,
        GeometryType.CompoundCurve,
        GeometryType.CurvePolygon,
        GeometryType.MultiCurve,
        GeometryType.MultiSurface,
    ):
        return True
    if g.geoms is not None:
        return any(_is_curved(s) for s in g.geoms)
    return False
