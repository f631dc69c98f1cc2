"""Delaunay triangulation (Bowyer–Watson) and Voronoi diagram.

Backs ``st_delaunay_triangles`` / ``st_voronoi_polygons`` (reference:
src/functions.rs:1364-1373, 1791-1802). Pure numpy; O(n²) incremental — fine
for per-row/per-group vertex sets, which is how the reference exposes them.
"""

from __future__ import annotations

import math

import numpy as np

from polars_st_spark.geo.types import Geometry, GeometryType

__all__ = ["delaunay_triangles", "voronoi_polygons"]


def _unique_points(g: Geometry, tolerance: float = 0.0) -> np.ndarray:
    pts = g.all_coords()[:, :2]
    if len(pts) == 0:
        return pts
    if tolerance > 0:
        pts = np.round(pts / tolerance) * tolerance
    return np.unique(pts, axis=0)


def _bowyer_watson(pts: np.ndarray) -> list[tuple[int, int, int]]:
    n = len(pts)
    if n < 3:
        return []
    # super-triangle
    cx, cy = pts[:, 0].mean(), pts[:, 1].mean()
    span = max(pts[:, 0].ptp(), pts[:, 1].ptp(), 1.0) * 10
    sup = np.array([[cx - 2 * span, cy - span], [cx + 2 * span, cy - span], [cx, cy + 2 * span]])
    P = np.vstack([pts, sup])
    si = [n, n + 1, n + 2]
    tris: list[tuple[int, int, int]] = [(si[0], si[1], si[2])]

    def circum_contains(tri, p):
        ax, ay = P[tri[0]]
        bx, by = P[tri[1]]
        cx_, cy_ = P[tri[2]]
        d = 2 * (ax * (by - cy_) + bx * (cy_ - ay) + cx_ * (ay - by))
        if d == 0:
            return False
        ux = ((ax * ax + ay * ay) * (by - cy_) + (bx * bx + by * by) * (cy_ - ay) + (cx_ * cx_ + cy_ * cy_) * (ay - by)) / d
        uy = ((ax * ax + ay * ay) * (cx_ - bx) + (bx * bx + by * by) * (ax - cx_) + (cx_ * cx_ + cy_ * cy_) * (bx - ax)) / d
        r2 = (ax - ux) ** 2 + (ay - uy) ** 2
        return (p[0] - ux) ** 2 + (p[1] - uy) ** 2 < r2 - 1e-12

    for i in range(n):
        p = P[i]
        bad = [t for t in tris if circum_contains(t, p)]
        # polygon hole boundary = edges not shared by two bad triangles
        edge_count: dict[tuple[int, int], int] = {}
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                key = (min(e), max(e))
                edge_count[key] = edge_count.get(key, 0) + 1
        boundary = [e for e, c in edge_count.items() if c == 1]
        tris = [t for t in tris if t not in bad]
        for a, b in boundary:
            tris.append((a, b, i))
    # drop triangles touching the super-triangle
    return [t for t in tris if all(v < n for v in t)]


def _ccw_tri(pts, t):
    a, b, c = pts[t[0]], pts[t[1]], pts[t[2]]
    if (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0]) < 0:
        return (t[0], t[2], t[1])
    return t


def delaunay_triangles(g: Geometry, tolerance: float = 0.0, only_edges: bool = False) -> Geometry:
    """GeometryCollection of triangles (or MultiLineString of unique edges)."""
    pts = _unique_points(g, tolerance)
    tris = _bowyer_watson(pts)
    srid = g.srid
    if only_edges:
        edges = set()
        for t in tris:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                edges.add((min(e), max(e)))
        lines = [
            Geometry(GeometryType.LineString, srid=srid, coords=np.array([pts[a], pts[b]]))
            for a, b in sorted(edges)
        ]
        return Geometry(GeometryType.MultiLineString, srid=srid, geoms=lines)
    polys = []
    for t in tris:
        t = _ccw_tri(pts, t)
        ring = np.array([pts[t[0]], pts[t[1]], pts[t[2]], pts[t[0]]])
        polys.append(Geometry(GeometryType.Polygon, srid=srid, rings=[ring]))
    return Geometry(GeometryType.GeometryCollection, srid=srid, geoms=polys)


def _circumcenter(a, b, c):
    d = 2 * (a[0] * (b[1] - c[1]) + b[0] * (c[1] - a[1]) + c[0] * (a[1] - b[1]))
    if d == 0:
        return None
    ux = ((a[0] ** 2 + a[1] ** 2) * (b[1] - c[1]) + (b[0] ** 2 + b[1] ** 2) * (c[1] - a[1]) + (c[0] ** 2 + c[1] ** 2) * (a[1] - b[1])) / d
    uy = ((a[0] ** 2 + a[1] ** 2) * (c[0] - b[0]) + (b[0] ** 2 + b[1] ** 2) * (a[0] - c[0]) + (c[0] ** 2 + c[1] ** 2) * (b[0] - a[0])) / d
    return np.array([ux, uy])


def voronoi_polygons(
    g: Geometry,
    tolerance: float = 0.0,
    extend_to: Geometry | None = None,
    only_edges: bool = False,
) -> Geometry:
    """Voronoi diagram of the input vertices, clipped to an envelope.

    Cells are built by half-plane clipping of the bounding envelope against
    each point's neighbors (exact for the clipped diagram; the envelope
    default matches GEOS's expanded input envelope)."""
    from polars_st_spark.geo.setops import _sh_clip_ring_halfplane

    pts = _unique_points(g, tolerance)
    srid = g.srid
    if len(pts) == 0:
        return Geometry(GeometryType.GeometryCollection, srid=srid, geoms=[])
    # envelope: input bounds expanded by ~diameter (GEOS uses a similar margin)
    x0, y0 = pts[:, 0].min(), pts[:, 1].min()
    x1, y1 = pts[:, 0].max(), pts[:, 1].max()
    span = max(x1 - x0, y1 - y0, 1.0)
    if extend_to is not None:
        ex0, ey0, ex1, ey1 = extend_to.bounds()
        x0, y0, x1, y1 = min(x0, ex0), min(y0, ey0), max(x1, ex1), max(y1, ey1)
    else:
        x0, y0, x1, y1 = x0 - span, y0 - span, x1 + span, y1 + span
    cells = []
    edges = set()
    for i, p in enumerate(pts):
        ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=np.float64)
        for j, q in enumerate(pts):
            if i == j:
                continue
            # half-plane closer to p than q: clip by the perpendicular
            # bisector, oriented so p stays on the kept (left) side
            mid = (p + q) / 2.0
            d = q - p
            a, b = mid, mid + np.array([-d[1], d[0]])
            cross = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
            if cross < 0:
                b = mid + np.array([d[1], -d[0]])
            ring = _sh_clip_ring_halfplane(ring, a, b)
            if len(ring) == 0:
                break
        if len(ring) >= 3:
            closed = np.vstack([ring, ring[:1]])
            cells.append(Geometry(GeometryType.Polygon, srid=srid, rings=[closed]))
            if only_edges:
                for k in range(len(closed) - 1):
                    e = (tuple(np.round(closed[k], 9)), tuple(np.round(closed[k + 1], 9)))
                    edges.add(tuple(sorted(e)))
    if only_edges:
        lines = [
            Geometry(GeometryType.LineString, srid=srid, coords=np.array([e[0], e[1]]))
            for e in sorted(edges)
        ]
        return Geometry(GeometryType.MultiLineString, srid=srid, geoms=lines)
    return Geometry(GeometryType.GeometryCollection, srid=srid, geoms=cells)
