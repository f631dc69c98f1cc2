"""Curved-geometry linearization and exact arc math.

The reference supports curved types because GEOS 3.14 does (SURVEY §7 hard
part 1). Predicates and overlay linearize (GEOS does the same for most
computations): 3-point circular arcs are sampled at a configurable angular
step, converting CircularString→LineString, CompoundCurve→LineString,
CurvePolygon→Polygon, MultiCurve→MultiLineString, MultiSurface→MultiPolygon.

Measures are EXACT (matching GEOS 3.14's native curve math,
reference src/wkb.rs:58-62): :func:`exact_length` uses ``r·|sweep|`` per
arc, :func:`exact_area` is the endpoint-polygon shoelace plus circular-
segment corrections ``(r²/2)(θ − sin θ)``, and :func:`extreme_points`
yields the true axis extrema of each arc so bounds cover the bulge exactly.

Serialization keeps the original curved EWKB/WKT; linearization happens at
compute time where exact math is not available.
"""

from __future__ import annotations

import math

import numpy as np

from polars_st_spark.geo.types import Geometry, GeometryType

__all__ = [
    "arc_params",
    "arc_points",
    "exact_area",
    "exact_length",
    "extreme_points",
    "linearize",
    "point_arc_distance",
    "point_curve_distance",
]

_DEFAULT_SEGS = 32  # samples per full circle


def arc_params(p0, p1, p2):
    """(cx, cy, r, a0, sweep) of the circular arc p0→p1→p2, or None if the
    control points are collinear/degenerate (straight-polyline fallback).

    ``a0`` is the angle of p0 from the center; ``sweep`` is the signed total
    angle traversed (CCW positive). A PostGIS-style full circle
    (start == end, distinct midpoint) yields ``sweep = 2π``.
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
        return (ux, uy, r, a0, 2.0 * math.pi)
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if abs(d) < 1e-12 * scale * scale:
        return None
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

    total = 0.0
    for ccw in (True, False):
        s01 = sweep(a0, a1, ccw)
        s02 = sweep(a0, a2, ccw)
        if abs(s01) <= abs(s02) + 1e-12:
            total = s02
            break
    return (ux, uy, r, a0, total)


def arc_points(p0, p1, p2, segs_per_circle: int = _DEFAULT_SEGS) -> np.ndarray:
    """Points along the circular arc p0→p1→p2 (inclusive ends).

    Collinear inputs degrade to the straight polyline [p0, p1, p2].
    """
    p0 = np.asarray(p0, dtype=np.float64)[:2]
    p1 = np.asarray(p1, dtype=np.float64)[:2]
    p2 = np.asarray(p2, dtype=np.float64)[:2]
    params = arc_params(p0, p1, p2)
    if params is None:
        return np.array([p0, p1, p2])
    ux, uy, r, a0, total = params
    n = max(2, int(math.ceil(abs(total) / (2 * math.pi) * segs_per_circle)))
    if total >= 2.0 * math.pi - 1e-12:
        n = max(4, segs_per_circle)
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


def _arc_triples(coords: np.ndarray):
    """Consecutive (p0, p1, p2) control triples of a CircularString."""
    c = np.asarray(coords, dtype=np.float64)[:, :2]
    for i in range(0, len(c) - 2, 2):
        yield c[i], c[i + 1], c[i + 2]


def _chain_exact_length(g: Geometry) -> float:
    """Exact length of one lineal component (CircularString, CompoundCurve,
    or plain LineString)."""
    t = g.type_id
    if t == GeometryType.CircularString:
        if g.coords is None or len(g.coords) < 3:
            return 0.0
        total = 0.0
        for p0, p1, p2 in _arc_triples(g.coords):
            params = arc_params(p0, p1, p2)
            if params is None:
                total += math.hypot(*(p1 - p0)) + math.hypot(*(p2 - p1))
            else:
                _, _, r, _, sweep = params
                total += r * abs(sweep)
        return total
    if t == GeometryType.CompoundCurve:
        return sum(_chain_exact_length(s) for s in (g.geoms or []))
    c = g.coords
    if c is None or len(c) < 2:
        return 0.0
    d = np.diff(np.asarray(c, dtype=np.float64)[:, :2], axis=0)
    return float(np.sqrt((d * d).sum(axis=1)).sum())


def exact_length(g: Geometry) -> float:
    """Exact arc-aware length/perimeter of any (possibly curved) geometry."""
    t = g.type_id
    if t in (GeometryType.CircularString, GeometryType.CompoundCurve):
        return _chain_exact_length(g)
    if t == GeometryType.CurvePolygon:
        return sum(_chain_exact_length(s) for s in (g.geoms or []))
    if g.geoms is not None:
        return sum(exact_length(s) for s in g.geoms)
    from polars_st_spark.geo import algos

    return algos.length(g)


def _ring_exact_signed_area(g: Geometry) -> float:
    """Signed area of one closed ring component (CCW positive): shoelace of
    the arc-endpoint polygon plus per-arc circular-segment corrections
    ``(r²/2)(θ − sin θ)``."""
    nodes: list[np.ndarray] = []
    correction = 0.0

    def consume(chain: Geometry):
        nonlocal correction
        if chain.type_id == GeometryType.CircularString:
            if chain.coords is None or len(chain.coords) < 3:
                return
            first = True
            for p0, p1, p2 in _arc_triples(chain.coords):
                if first:
                    nodes.append(p0)
                    first = False
                nodes.append(p2)
                params = arc_params(p0, p1, p2)
                if params is None:
                    nodes.insert(len(nodes) - 1, p1)
                else:
                    _, _, r, _, sweep = params
                    correction += 0.5 * r * r * (sweep - math.sin(sweep))
        elif chain.type_id == GeometryType.CompoundCurve:
            for s in chain.geoms or []:
                consume(s)
        else:  # straight LineString chain
            if chain.coords is not None:
                nodes.extend(np.asarray(chain.coords, dtype=np.float64)[:, :2])

    consume(g)
    if len(nodes) < 2:
        return correction
    pts = np.asarray(nodes, dtype=np.float64)
    x, y = pts[:, 0], pts[:, 1]
    shoelace = 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
    return shoelace + correction


def exact_area(g: Geometry) -> float:
    """Exact arc-aware area of any (possibly curved) geometry."""
    t = g.type_id
    if t == GeometryType.CurvePolygon:
        rings = g.geoms or []
        if not rings:
            return 0.0
        a = abs(_ring_exact_signed_area(rings[0]))
        for hole in rings[1:]:
            a -= abs(_ring_exact_signed_area(hole))
        return a
    if t in (GeometryType.CircularString, GeometryType.CompoundCurve):
        return 0.0
    if g.geoms is not None:
        return sum(exact_area(s) for s in g.geoms)
    from polars_st_spark.geo import algos

    return algos.area(g)


def _arc_extremes(p0, p1, p2) -> np.ndarray:
    """Endpoints plus the true axis extrema (N/E/S/W points of the circle
    that lie within the swept sector)."""
    params = arc_params(p0, p1, p2)
    if params is None:
        return np.asarray([p0, p1, p2], dtype=np.float64)
    ux, uy, r, a0, sweep = params
    pts = [np.asarray(p0, dtype=np.float64)[:2], np.asarray(p2, dtype=np.float64)[:2]]
    two_pi = 2.0 * math.pi
    for axis in (0.0, 0.5 * math.pi, math.pi, 1.5 * math.pi):
        rel = (axis - a0) * (1.0 if sweep >= 0 else -1.0)
        rel %= two_pi
        if rel <= abs(sweep) + 1e-12:
            pts.append(np.array([ux + r * math.cos(axis), uy + r * math.sin(axis)]))
    return np.asarray(pts, dtype=np.float64)


def extreme_points(g: Geometry) -> np.ndarray:
    """All points needed for exact bounds of a curved geometry: stored
    vertices of straight parts plus per-arc endpoints and axis extrema."""
    t = g.type_id
    if t == GeometryType.CircularString:
        if g.coords is None or len(g.coords) < 3:
            return np.asarray(g.coords if g.coords is not None else np.empty((0, 2)))[:, :2]
        parts = [_arc_extremes(p0, p1, p2) for p0, p1, p2 in _arc_triples(g.coords)]
        return np.vstack(parts)
    if t in (
        GeometryType.CompoundCurve,
        GeometryType.CurvePolygon,
        GeometryType.MultiCurve,
        GeometryType.MultiSurface,
    ) or (g.geoms is not None and any(_is_curved(s) for s in g.geoms)):
        parts = [extreme_points(s) for s in (g.geoms or [])]
        parts = [p for p in parts if len(p)]
        if not parts:
            return np.empty((0, 2))
        return np.vstack(parts)
    c = g.all_coords()
    return np.asarray(c, dtype=np.float64)[:, :2] if len(c) else np.empty((0, 2))


def _pt_seg_dist(p, a, b) -> float:
    a = np.asarray(a, dtype=np.float64)[:2]
    b = np.asarray(b, dtype=np.float64)[:2]
    d = b - a
    ln2 = float(d @ d)
    if ln2 == 0.0:
        return math.hypot(p[0] - a[0], p[1] - a[1])
    t = max(0.0, min(1.0, float((p - a) @ d) / ln2))
    q = a + t * d
    return math.hypot(p[0] - q[0], p[1] - q[1])


def point_arc_distance(p, p0, p1, p2) -> float:
    """EXACT distance from a point to the circular arc p0→p1→p2 (closed
    form — no linearization): ``|dist(p, center) − r|`` when the point's
    angle falls inside the swept sector, else the nearer endpoint distance.
    A point at the center is at distance r from every arc point. Collinear
    control points degrade to the straight polyline."""
    p = np.asarray(p, dtype=np.float64)[:2]
    params = arc_params(p0, p1, p2)
    if params is None:
        return min(_pt_seg_dist(p, p0, p1), _pt_seg_dist(p, p1, p2))
    ux, uy, r, a0, sweep = params
    dx, dy = p[0] - ux, p[1] - uy
    d = math.hypot(dx, dy)
    scale = max(abs(ux), abs(uy), r, 1.0)
    if d <= 1e-15 * scale:
        return r
    rel = (math.atan2(dy, dx) - a0) * (1.0 if sweep >= 0 else -1.0)
    rel %= 2.0 * math.pi
    if rel <= abs(sweep) + 1e-12:
        return abs(d - r)
    e0 = np.asarray(p0, dtype=np.float64)[:2]
    e2 = np.asarray(p2, dtype=np.float64)[:2]
    return min(
        math.hypot(p[0] - e0[0], p[1] - e0[1]),
        math.hypot(p[0] - e2[0], p[1] - e2[1]),
    )


def point_curve_distance(p, g: Geometry) -> float | None:
    """EXACT point-to-curve distance for boundary-only curved geometries
    (CircularString / CompoundCurve / MultiCurve, mixed with straight
    parts). Returns None for areal curved types (CurvePolygon/MultiSurface),
    where boundary distance is not the geometry distance — callers fall back
    to linearization there."""
    t = g.type_id
    p = np.asarray(p, dtype=np.float64)[:2]
    if t == GeometryType.CircularString:
        if g.coords is None or len(g.coords) < 2:
            return None
        if len(g.coords) == 2:
            return _pt_seg_dist(p, g.coords[0][:2], g.coords[1][:2])
        return min(point_arc_distance(p, p0, p1, p2) for p0, p1, p2 in _arc_triples(g.coords))
    if t == GeometryType.LineString:
        if g.coords is None or len(g.coords) < 2:
            return None
        c = g.coords
        return min(_pt_seg_dist(p, c[i][:2], c[i + 1][:2]) for i in range(len(c) - 1))
    if t in (GeometryType.CompoundCurve, GeometryType.MultiCurve, GeometryType.MultiLineString):
        ds = [point_curve_distance(p, s) for s in (g.geoms or [])]
        ds = [d for d in ds if d is not None]
        return min(ds) if ds else None
    return None


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
