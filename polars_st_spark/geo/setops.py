"""Overlay / set operations.

Implements the reference's binary and n-ary set ops
(reference: src/functions.rs:1096-1276, src/expressions.rs:873-999) for the
geometry classes the engine supports exactly today:

Fast paths, tried in order:
- point / multipoint vs anything (membership)
- line vs rectilinear region (clipping)
- polygon vs CONVEX polygon (Sutherland–Hodgman)
- arbitrary rectilinear polygons incl. holes (exact slab algebra,
  geo/rectregion.py)
- disjoint inputs (collection assembly)

General concave areal×areal combinations fall through to the
classify-and-stitch overlay (geo/overlay.py) — supported for all four ops.
Remaining NotImplementedError cases are mixed-dimension exotics (e.g. line
minus concave polygon), documented per call site.
"""

from __future__ import annotations

import math

import numpy as np

from polars_st_spark.geo.algos import _closed, _ring_signed_area, area as _area
from polars_st_spark.geo.predicates import (
    _decompose,
    contains,
    covers,
    equals,
    intersects,
    point_in_polygon,
    touches,
)
from polars_st_spark.geo.rectregion import (
    RectRegion,
    geometry_to_region,
    region_to_geometry,
)
from polars_st_spark.geo.types import (
    _LINEAL_IDS,
    _POLYGONAL_IDS,
    Geometry,
    GeometryType,
    empty_collection,
)

__all__ = [
    "clip_by_rect",
    "intersection",
    "union",
    "difference",
    "symmetric_difference",
    "union_all",
    "intersection_all",
    "difference_all",
    "symmetric_difference_all",
    "collect",
    "unary_union",
    "rectangles_union",
]


def _is_convex_polygon(g: Geometry) -> bool:
    if g.type_id != GeometryType.Polygon or not g.rings or len(g.rings) != 1:
        return False
    r = _closed(g.rings[0])[:-1]
    n = len(r)
    if n < 3:
        return False
    sign = 0
    for i in range(n):
        o, a, b = r[i], r[(i + 1) % n], r[(i + 2) % n]
        cr = (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])
        if abs(cr) < 1e-15:
            continue
        s = 1 if cr > 0 else -1
        if sign == 0:
            sign = s
        elif s != sign:
            return False
    return True


def _axis_rect(g: Geometry) -> tuple[float, float, float, float] | None:
    from polars_st_spark.geo.algos import _is_axis_rect

    if _is_axis_rect(g):
        return g.bounds()
    return None


def _mk_rect(x0: float, y0: float, x1: float, y1: float, srid: int = 0) -> Geometry:
    ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])
    return Geometry(GeometryType.Polygon, srid=srid, rings=[ring])


def _mk_empty_poly(srid: int) -> Geometry:
    return Geometry(GeometryType.Polygon, srid=srid, rings=[])


# ----------------------------------------------------------------------
# clip_by_rect (reference: functions.rs:1337-1348)
# ----------------------------------------------------------------------

def clip_by_rect(g: Geometry, x0: float, y0: float, x1: float, y1: float) -> Geometry:
    t = g.type_id
    srid = g.srid
    if g.is_empty():
        return Geometry(GeometryType.GeometryCollection, srid=srid, geoms=[])
    if t == GeometryType.Point:
        x, y = g.coords[0], g.coords[1]
        if x0 <= x <= x1 and y0 <= y <= y1:
            return g
        return Geometry(GeometryType.Point, srid=srid, coords=None)
    if t in _LINEAL_IDS:
        parts = _clip_chain(g.coords[:, :2], x0, y0, x1, y1)
        return _lines_result(parts, srid)
    if t in _POLYGONAL_IDS:
        rings = _sh_clip_rings(g.rings, [(x0, y0, x1, y1)])
        if not rings:
            return _mk_empty_poly(srid)
        return Geometry(GeometryType.Polygon, srid=srid, rings=rings)
    if g.geoms is not None:
        clipped = [clip_by_rect(s, x0, y0, x1, y1) for s in g.geoms]
        clipped = [c for c in clipped if not c.is_empty()]
        if not clipped:
            return Geometry(GeometryType.GeometryCollection, srid=srid, geoms=[])
        if len(clipped) == 1:
            return clipped[0]
        return collect(clipped, srid=srid)
    raise NotImplementedError(f"clip_by_rect for {g.type_name}")


def _clip_chain(c: np.ndarray, x0, y0, x1, y1) -> list[np.ndarray]:
    """Liang–Barsky per segment; consecutive kept pieces merged into chains."""
    parts: list[list[np.ndarray]] = []
    cur: list[np.ndarray] = []
    for i in range(len(c) - 1):
        p, q = c[i], c[i + 1]
        seg = _clip_segment(p, q, x0, y0, x1, y1)
        if seg is None:
            if len(cur) >= 2:
                parts.append(cur)
            cur = []
            continue
        a, b = seg
        if cur and np.allclose(cur[-1], a):
            cur.append(b)
        else:
            if len(cur) >= 2:
                parts.append(cur)
            cur = [a, b]
    if len(cur) >= 2:
        parts.append(cur)
    return [np.asarray(p) for p in parts]


def _clip_segment(p, q, x0, y0, x1, y1):
    t0, t1 = 0.0, 1.0
    dx, dy = q[0] - p[0], q[1] - p[1]
    for pi, qi in ((-dx, p[0] - x0), (dx, x1 - p[0]), (-dy, p[1] - y0), (dy, y1 - p[1])):
        if pi == 0:
            if qi < 0:
                return None
            continue
        r = qi / pi
        if pi < 0:
            if r > t1:
                return None
            t0 = max(t0, r)
        else:
            if r < t0:
                return None
            t1 = min(t1, r)
    if t0 > t1:
        return None
    a = np.array([p[0] + t0 * dx, p[1] + t0 * dy])
    b = np.array([p[0] + t1 * dx, p[1] + t1 * dy])
    if np.allclose(a, b):
        return None
    return a, b


def _lines_result(parts: list[np.ndarray], srid: int) -> Geometry:
    if not parts:
        return Geometry(GeometryType.LineString, srid=srid, coords=np.empty((0, 2)))
    if len(parts) == 1:
        return Geometry(GeometryType.LineString, srid=srid, coords=parts[0])
    return Geometry(
        GeometryType.MultiLineString,
        srid=srid,
        geoms=[Geometry(GeometryType.LineString, srid=srid, coords=p) for p in parts],
    )


def _sh_clip_ring_halfplane(ring: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman step: keep points left of directed edge a→b."""
    out: list[np.ndarray] = []
    n = len(ring)
    for i in range(n):
        cur = ring[i]
        prev = ring[i - 1]
        cur_in = (b[0] - a[0]) * (cur[1] - a[1]) - (b[1] - a[1]) * (cur[0] - a[0]) >= -1e-12
        prev_in = (b[0] - a[0]) * (prev[1] - a[1]) - (b[1] - a[1]) * (prev[0] - a[0]) >= -1e-12
        if cur_in:
            if not prev_in:
                out.append(_edge_intersect(prev, cur, a, b))
            out.append(cur)
        elif prev_in:
            out.append(_edge_intersect(prev, cur, a, b))
    return np.asarray(out) if out else np.empty((0, 2))


def _edge_intersect(p, q, a, b) -> np.ndarray:
    x1, y1, x2, y2 = p[0], p[1], q[0], q[1]
    x3, y3, x4, y4 = a[0], a[1], b[0], b[1]
    den = (x1 - x2) * (y3 - y4) - (y1 - y2) * (x3 - x4)
    if den == 0:
        return np.array([x2, y2])
    t = ((x1 - x3) * (y3 - y4) - (y1 - y3) * (x3 - x4)) / den
    return np.array([x1 + t * (x2 - x1), y1 + t * (y2 - y1)])


def _convex_clip_edges(clip: Geometry):
    """CCW-oriented edges of a convex polygon."""
    r = _closed(clip.rings[0])
    if _ring_signed_area(r) < 0:
        r = r[::-1]
    for i in range(len(r) - 1):
        yield r[i][:2], r[i + 1][:2]


def _sh_clip_rings(rings: list[np.ndarray], rects) -> list[np.ndarray]:
    """Clip polygon rings by rectangle(s). Holes are clipped too; degenerate
    results dropped."""
    out = []
    for k, r in enumerate(rings):
        ring = _closed(np.asarray(r)[:, :2])[:-1]
        for (x0, y0, x1, y1) in rects:
            for a, b in (
                ((x0, y0), (x1, y0)),
                ((x1, y0), (x1, y1)),
                ((x1, y1), (x0, y1)),
                ((x0, y1), (x0, y0)),
            ):
                ring = _sh_clip_ring_halfplane(ring, np.asarray(a, dtype=float), np.asarray(b, dtype=float))
                if len(ring) == 0:
                    break
        if len(ring) >= 3:
            closed = np.vstack([ring, ring[:1]])
            if abs(_ring_signed_area(closed)) > 1e-24:
                out.append(closed)
        elif k == 0:
            return []  # exterior vanished → empty polygon
    return out


def _sh_clip_polygon_convex(subj: Geometry, clip: Geometry) -> Geometry:
    rings = []
    for k, r in enumerate(subj.rings):
        ring = _closed(np.asarray(r)[:, :2])[:-1]
        for a, b in _convex_clip_edges(clip):
            ring = _sh_clip_ring_halfplane(ring, a, b)
            if len(ring) == 0:
                break
        if len(ring) >= 3:
            closed = np.vstack([ring, ring[:1]])
            if abs(_ring_signed_area(closed)) > 1e-24:
                rings.append(closed)
        elif k == 0:
            return _mk_empty_poly(subj.srid)
    if not rings:
        return _mk_empty_poly(subj.srid)
    return Geometry(GeometryType.Polygon, srid=subj.srid, rings=rings)


# ----------------------------------------------------------------------
# Binary ops (reference: functions.rs:1096-1192)
# ----------------------------------------------------------------------

def intersection(a: Geometry, b: Geometry, grid_size: float | None = None) -> Geometry:
    srid = a.srid
    if a.is_empty() or b.is_empty() or not intersects(a, b):
        return _empty_like_overlay(a, b)
    res = _intersection_impl(a, b)
    if grid_size:
        res = _snap_to_grid(res, grid_size)
    return res.with_srid(srid)


def _empty_like_overlay(a: Geometry, b: Geometry) -> Geometry:
    # GEOS returns an empty geometry of the lower input dimension
    dim = min(a.dimensions(), b.dimensions())
    t = {0: GeometryType.Point, 1: GeometryType.LineString, 2: GeometryType.Polygon}.get(
        dim, GeometryType.GeometryCollection
    )
    if t == GeometryType.Point:
        return Geometry(t, srid=a.srid, coords=None)
    if t == GeometryType.LineString:
        return Geometry(t, srid=a.srid, coords=np.empty((0, 2)))
    if t == GeometryType.Polygon:
        return Geometry(t, srid=a.srid, rings=[])
    return empty_collection(a.srid)


def _flatten_parts(g: Geometry) -> list[Geometry]:
    """Primitive (Point/LineString/Polygon) parts of any geometry."""
    if g.geoms is not None:
        out: list[Geometry] = []
        for s in g.geoms:
            out.extend(_flatten_parts(s if s.srid else s.with_srid(g.srid)))
        return out
    return [g] if not g.is_empty() else []


def _intersection_impl(a: Geometry, b: Geometry) -> Geometry:
    # rectilinear ∩ rectilinear → exact region algebra
    if a.dimensions() == 2 and b.dimensions() == 2:
        reg_a, reg_b = geometry_to_region(a), geometry_to_region(b)
        if reg_a is not None and reg_b is not None:
            res = reg_a.intersect(reg_b)
            if not res.is_empty():
                return region_to_geometry(res, a.srid)
            # fall through for degenerate (touching) cases
    # collections: intersect each part, collect results
    if a.geoms is not None or b.geoms is not None:
        parts = []
        for pa in _flatten_parts(a):
            for pb in _flatten_parts(b):
                if intersects(pa, pb):
                    r = _intersection_impl(pa, pb)
                    if not r.is_empty():
                        parts.append(r)
        if not parts:
            return _empty_like_overlay(a, b)
        if len(parts) == 1:
            return parts[0]
        return collect(parts, srid=a.srid, dissolve=True)
    # point cases
    for first, second, flip in ((a, b, False), (b, a, True)):
        if first.type_id == GeometryType.Point:
            return first.copy() if intersects(first, second) else Geometry(GeometryType.Point, srid=a.srid, coords=None)
    ra, rb = _axis_rect(a), _axis_rect(b)
    if ra and rb:
        x0, y0 = max(ra[0], rb[0]), max(ra[1], rb[1])
        x1, y1 = min(ra[2], rb[2]), min(ra[3], rb[3])
        if x0 > x1 or y0 > y1:
            return _mk_empty_poly(a.srid)
        if x0 == x1 and y0 == y1:
            return Geometry(GeometryType.Point, srid=a.srid, coords=np.array([x0, y0]))
        if x0 == x1 or y0 == y1:
            return Geometry(GeometryType.LineString, srid=a.srid, coords=np.array([[x0, y0], [x1, y1]]))
        return _mk_rect(x0, y0, x1, y1, a.srid)
    # lineal vs areal
    for line, poly, flip in ((a, b, False), (b, a, True)):
        if line.dimensions() == 1 and poly.dimensions() == 2:
            rp = _axis_rect(poly)
            if rp:
                parts = []
                for chain in _decompose(line).lines:
                    parts.extend(_clip_chain(chain, *rp))
                return _lines_result(parts, a.srid)
            # general (concave, holed) polygon: split-and-classify clip (r5)
            return _line_polygon_intersection(line, poly)
    # polygon vs polygon with a convex side
    if a.dimensions() == 2 and b.dimensions() == 2:
        if a.type_id == GeometryType.Polygon and b.type_id == GeometryType.Polygon:
            if _is_convex_polygon(b):
                return _sh_clip_polygon_convex(a, b)
            if _is_convex_polygon(a):
                return _sh_clip_polygon_convex(b, a)
        # general concave case: classify-and-stitch overlay
        from polars_st_spark.geo.overlay import overlay as _overlay

        return _overlay(a, b, "intersection")
    if a.dimensions() == 1 and b.dimensions() == 1:
        return _line_line_intersection(a, b)
    raise NotImplementedError(f"intersection({a.type_name}, {b.type_name})")


def _line_line_intersection(a: Geometry, b: Geometry) -> Geometry:
    from polars_st_spark.geo.predicates import _seg_intersect_kind

    pts = []
    segs = []
    for ca in _decompose(a).lines:
        for cb in _decompose(b).lines:
            for i in range(len(ca) - 1):
                for j in range(len(cb) - 1):
                    p, q, c, e = ca[i, :2], ca[i + 1, :2], cb[j, :2], cb[j + 1, :2]
                    kind = _seg_intersect_kind(p, q, c, e)
                    if kind == 2 or kind == 1:
                        pt = _cross_point(p, q, c, e)
                        if pt is not None:
                            pts.append(pt)
                    elif kind == 3:
                        axis = 0 if abs(q[0] - p[0]) >= abs(q[1] - p[1]) else 1
                        lo = max(min(p[axis], q[axis]), min(c[axis], e[axis]))
                        hi = min(max(p[axis], q[axis]), max(c[axis], e[axis]))
                        tdir = (q - p) / (q[axis] - p[axis])
                        s0 = p + (lo - p[axis]) * tdir
                        s1 = p + (hi - p[axis]) * tdir
                        segs.append(np.array([s0, s1]))
    if segs:
        return _lines_result(segs, a.srid)
    uniq = []
    for p in pts:
        if not any(np.allclose(p, q) for q in uniq):
            uniq.append(p)
    if not uniq:
        return Geometry(GeometryType.Point, srid=a.srid, coords=None)
    if len(uniq) == 1:
        return Geometry(GeometryType.Point, srid=a.srid, coords=uniq[0])
    return Geometry(
        GeometryType.MultiPoint,
        srid=a.srid,
        geoms=[Geometry(GeometryType.Point, srid=a.srid, coords=p) for p in uniq],
    )


def _cross_point(p, q, c, e):
    den = (p[0] - q[0]) * (c[1] - e[1]) - (p[1] - q[1]) * (c[0] - e[0])
    if den == 0:
        for cand in (p, q):
            from polars_st_spark.geo.predicates import _on_segment

            if _on_segment(cand, c, e):
                return np.asarray(cand, dtype=float)
        for cand in (c, e):
            from polars_st_spark.geo.predicates import _on_segment

            if _on_segment(cand, p, q):
                return np.asarray(cand, dtype=float)
        return None
    t = ((p[0] - c[0]) * (c[1] - e[1]) - (p[1] - c[1]) * (c[0] - e[0])) / den
    return np.array([p[0] + t * (q[0] - p[0]), p[1] + t * (q[1] - p[1])])


# ----------------------------------------------------------------------
# General lineal × areal / lineal × lineal clipping (r5 — closes the
# "line ∩/− concave polygon" gap; the reference gets every combination
# from GEOS overlay, src/functions.rs:1096-1192)
#
# Split-and-classify: each chain segment splits at every contact with the
# other side's edges (proper crossings, endpoint touches, collinear-run
# ends), then each sub-piece classifies by its MIDPOINT location —
# interior/boundary of a closed polygon for ∩, strict exterior for −.
# Exactly the scalar relate machinery's split discipline, so tolerance
# behavior matches the predicates.
# ----------------------------------------------------------------------

def _areal_edges(g: Geometry) -> list[tuple[np.ndarray, np.ndarray]]:
    segs = []
    for rings in _decompose(g).polys:
        for ring in rings:
            r = _closed(np.asarray(ring, dtype=float))
            for i in range(len(r) - 1):
                segs.append((r[i, :2], r[i + 1, :2]))
    return segs


def _lineal_edges(g: Geometry) -> list[tuple[np.ndarray, np.ndarray]]:
    segs = []
    for chain in _decompose(g).lines:
        c = np.asarray(chain, dtype=float)
        for i in range(len(c) - 1):
            segs.append((c[i, :2], c[i + 1, :2]))
    return segs


def _seg_split_params(p: np.ndarray, q: np.ndarray, segs) -> list[float]:
    """Sorted params t in [0,1] splitting segment pq at every contact with
    ``segs`` (crossing points, touch points, collinear-overlap ends)."""
    from polars_st_spark.geo.predicates import _on_segment, _seg_intersect_kind

    ts = {0.0, 1.0}
    d = q - p
    axis = 0 if abs(d[0]) >= abs(d[1]) else 1
    for c, e in segs:
        kind = _seg_intersect_kind(p, q, c, e)
        if kind == 0:
            continue
        if kind == 2:
            den = (p[0] - q[0]) * (c[1] - e[1]) - (p[1] - q[1]) * (c[0] - e[0])
            if den != 0:
                t = ((p[0] - c[0]) * (c[1] - e[1])
                     - (p[1] - c[1]) * (c[0] - e[0])) / den
                ts.add(min(max(t, 0.0), 1.0))
            continue
        # touch (1) or collinear overlap (3): any edge endpoint lying on pq
        # is a split point (p/q on the edge are params 0/1, already present)
        for cand in (c, e):
            if _on_segment(cand, p, q) and d[axis] != 0:
                ts.add(min(max((cand[axis] - p[axis]) / d[axis], 0.0), 1.0))
    return sorted(ts)


def _clip_chain_general(chain: np.ndarray, segs, locfn, keep: str):
    """Maximal sub-chains of ``chain`` kept by the midpoint rule, plus (for
    ``keep='in'``) isolated touch points not covered by any kept piece.

    keep='in'  : midpoint location >= 1 (closed other side — GEOS ∩)
    keep='out' : midpoint location == 0 (strict exterior — GEOS −)
    """
    c = np.asarray(chain, dtype=float)[:, :2]
    pieces: list[np.ndarray] = []
    cur: list[np.ndarray] | None = None
    split_pts: list[np.ndarray] = []
    for si in range(len(c) - 1):
        p, q = c[si], c[si + 1]
        if p[0] == q[0] and p[1] == q[1]:
            continue
        ts = _seg_split_params(p, q, segs)
        if keep == "in":
            split_pts.extend(p + t * (q - p) for t in ts)
        for t0, t1 in zip(ts[:-1], ts[1:]):
            if t1 - t0 <= 1e-12:
                continue
            mid = p + ((t0 + t1) / 2.0) * (q - p)
            loc = locfn(mid)
            if (loc >= 1) if keep == "in" else (loc == 0):
                a_ = p + t0 * (q - p)
                b_ = p + t1 * (q - p)
                if cur is not None and np.allclose(cur[-1], a_):
                    cur.append(b_)
                else:
                    if cur is not None and len(cur) >= 2:
                        pieces.append(np.asarray(cur))
                    cur = [a_, b_]
            else:
                if cur is not None and len(cur) >= 2:
                    pieces.append(np.asarray(cur))
                cur = None
    if cur is not None and len(cur) >= 2:
        pieces.append(np.asarray(cur))
    touch_pts: list[np.ndarray] = []
    if keep == "in":
        from polars_st_spark.geo.predicates import _on_segment

        for pt in split_pts:
            if locfn(pt) < 1:
                continue
            covered = any(
                _on_segment(pt, piece[i], piece[i + 1])
                for piece in pieces
                for i in range(len(piece) - 1)
            )
            if not covered and not any(np.allclose(pt, u) for u in touch_pts):
                touch_pts.append(pt)
    return pieces, touch_pts


def _poly_locfn(poly: Geometry):
    rings_list = _decompose(poly).polys

    def loc(pt):
        best = 0
        for rings in rings_list:
            l = point_in_polygon(pt, rings)
            if l == 2:
                return 2
            best = max(best, l)
        return best

    return loc


def _line_locfn(line: Geometry):
    from polars_st_spark.geo.predicates import _on_segment

    segs = _lineal_edges(line)

    def loc(pt):
        return 1 if any(_on_segment(pt, c, e) for c, e in segs) else 0

    return loc


def _mixed_clip_result(pieces, touch_pts, srid: int, empty_like) -> Geometry:
    if pieces and touch_pts:
        parts = [Geometry(GeometryType.LineString, srid=srid, coords=p)
                 for p in pieces]
        parts += [Geometry(GeometryType.Point, srid=srid, coords=p)
                  for p in touch_pts]
        return Geometry(GeometryType.GeometryCollection, srid=srid, geoms=parts)
    if pieces:
        return _lines_result(pieces, srid)
    if touch_pts:
        if len(touch_pts) == 1:
            return Geometry(GeometryType.Point, srid=srid, coords=touch_pts[0])
        return Geometry(
            GeometryType.MultiPoint, srid=srid,
            geoms=[Geometry(GeometryType.Point, srid=srid, coords=p)
                   for p in touch_pts],
        )
    return empty_like


def _line_polygon_intersection(line: Geometry, poly: Geometry) -> Geometry:
    segs = _areal_edges(poly)
    locfn = _poly_locfn(poly)
    pieces: list[np.ndarray] = []
    pts: list[np.ndarray] = []
    for chain in _decompose(line).lines:
        ps, tp = _clip_chain_general(chain, segs, locfn, "in")
        pieces.extend(ps)
        pts.extend(tp)
    # a touch point already covered by a piece from ANOTHER chain is dup
    pts = [p for p in pts if not any(
        np.allclose(p, piece[i]) or np.allclose(p, piece[i + 1])
        for piece in pieces for i in range(len(piece) - 1))]
    return _mixed_clip_result(
        pieces, pts, line.srid,
        Geometry(GeometryType.LineString, srid=line.srid, coords=np.empty((0, 2))),
    )


def _line_minus_polygon(line: Geometry, poly: Geometry) -> Geometry:
    segs = _areal_edges(poly)
    locfn = _poly_locfn(poly)
    pieces: list[np.ndarray] = []
    for chain in _decompose(line).lines:
        ps, _ = _clip_chain_general(chain, segs, locfn, "out")
        pieces.extend(ps)
    return _lines_result(pieces, line.srid)


def _node_chain_at_contacts(chain: np.ndarray, segs) -> list[np.ndarray]:
    """Split a chain at every interior contact param against ``segs`` (the
    lineal-union noding step): crossing points AND interior-vertex touches
    become piece endpoints, so output pieces pairwise touch only at
    endpoints — the invariant `collect` needs."""
    from polars_st_spark.geo.predicates import _on_segment

    c = np.asarray(chain, dtype=float)[:, :2]
    pieces: list[np.ndarray] = []
    cur: list[np.ndarray] = [c[0]]
    for i in range(len(c) - 1):
        p, q = c[i], c[i + 1]
        if p[0] == q[0] and p[1] == q[1]:
            continue
        for t in _seg_split_params(p, q, segs):
            if t <= 1e-12 or t >= 1 - 1e-12:
                continue
            pt = p + t * (q - p)
            cur.append(pt)
            pieces.append(np.asarray(cur))
            cur = [pt]
        cur.append(q)
        # an interior CHAIN VERTEX in contact also nodes (t=1/t=0 params
        # are excluded above, so handle the shared-vertex case here)
        if i < len(c) - 2 and any(_on_segment(q, s, e) for s, e in segs):
            pieces.append(np.asarray(cur))
            cur = [q]
    if len(cur) >= 2:
        pieces.append(np.asarray(cur))
    return pieces


def _line_minus_line(a: Geometry, b: Geometry) -> Geometry:
    """GEOS semantics: removes the collinear-overlap runs (the 1-dim common
    part); isolated crossing points don't split the result's point set but
    DO node the output (GEOS returns the survivor pieces merged)."""
    segs = _lineal_edges(b)
    locfn = _line_locfn(b)
    pieces: list[np.ndarray] = []
    for chain in _decompose(a).lines:
        ps, _ = _clip_chain_general(chain, segs, locfn, "out")
        pieces.extend(ps)
    return _lines_result(pieces, a.srid)


def union(a: Geometry, b: Geometry, grid_size: float | None = None) -> Geometry:
    if a.is_empty():
        return b.copy()
    if b.is_empty():
        return a.copy()
    return union_all([a, b], grid_size)


def difference(a: Geometry, b: Geometry, grid_size: float | None = None) -> Geometry:
    if a.is_empty():
        return a.copy()
    if b.is_empty() or not intersects(a, b):
        return a.copy()
    if covers(b, a):
        return _empty_like_overlay(a, a)
    # subtracting a lower-dimension geometry leaves a unchanged (GEOS semantics)
    if b.dimensions() < a.dimensions():
        return a.copy()
    # b a collection → fold difference over its parts
    if b.geoms is not None:
        acc = a.copy()
        for pb in _flatten_parts(b):
            acc = difference(acc, pb, grid_size)
            if acc.is_empty():
                return acc
        return acc
    # rectilinear \ rectilinear → exact region algebra
    if a.dimensions() == 2 and b.dimensions() == 2:
        reg_a, reg_b = geometry_to_region(a), geometry_to_region(b)
        if reg_a is not None and reg_b is not None:
            return region_to_geometry(reg_a.subtract(reg_b), a.srid)
    # lineal \ rectilinear → complement clipping
    if a.dimensions() == 1 and b.dimensions() == 2:
        reg_b = geometry_to_region(b)
        if reg_b is not None:
            parts = []
            for chain in _decompose(a).lines:
                parts.extend(_chain_outside_region(chain, reg_b))
            return _lines_result(parts, a.srid)
    # collections: difference each part of a, collect survivors
    if a.geoms is not None:
        parts = []
        for pa in _flatten_parts(a):
            r = difference(pa, b, grid_size)
            if not r.is_empty():
                parts.append(r)
        if not parts:
            return _empty_like_overlay(a, a)
        if len(parts) == 1:
            return parts[0]
        return collect(parts, srid=a.srid, dissolve=True)
    # point case
    if a.type_id == GeometryType.Point:
        return a.copy() if not intersects(a, b) else Geometry(GeometryType.Point, srid=a.srid, coords=None)
    ra, rb = _axis_rect(a), _axis_rect(b)
    if ra and rb:
        pieces = _rect_minus_rect(ra, rb)
        return _rects_to_geometry(pieces, a.srid)
    if a.dimensions() == 1 and b.dimensions() == 2:
        rb2 = _axis_rect(b)
        if rb2:
            parts = []
            for chain in _decompose(a).lines:
                parts.extend(_chain_outside_rect(chain, *rb2))
            return _lines_result(parts, a.srid)
        # general (concave, holed) polygon: split-and-classify clip (r5)
        return _line_minus_polygon(a, b)
    if a.dimensions() == 1 and b.dimensions() == 1:
        return _line_minus_line(a, b)
    if a.dimensions() == 2 and b.dimensions() == 2:
        from polars_st_spark.geo.overlay import overlay as _overlay

        return _overlay(a, b, "difference")
    raise NotImplementedError(f"difference({a.type_name}, {b.type_name})")


def _chain_outside_region(c: np.ndarray, region: RectRegion) -> list[np.ndarray]:
    """Chain pieces outside a rectilinear region."""
    pieces = [np.asarray(c)[:, :2]]
    for x0, y0, x1, y1 in region.rects:
        nxt: list[np.ndarray] = []
        for p in pieces:
            nxt.extend(_chain_outside_rect(p, x0, y0, x1, y1))
        pieces = nxt
        if not pieces:
            break
    return pieces


def _chain_outside_rect(c: np.ndarray, x0, y0, x1, y1) -> list[np.ndarray]:
    """Segments of chain outside the rectangle (complement of Liang–Barsky)."""
    parts = []
    cur: list[np.ndarray] = []

    def push(p, q):
        nonlocal cur
        if cur and np.allclose(cur[-1], p):
            cur.append(q)
        else:
            if len(cur) >= 2:
                parts.append(np.asarray(cur))
            cur = [p, q]

    for i in range(len(c) - 1):
        p, q = c[i, :2], c[i + 1, :2]
        seg = _clip_segment(p, q, x0, y0, x1, y1)
        if seg is None:
            push(p, q)
            continue
        a_, b_ = seg
        if not np.allclose(p, a_):
            push(p, a_)
        if not np.allclose(b_, q):
            push(b_, q)
    if len(cur) >= 2:
        parts.append(np.asarray(cur))
    return parts


def symmetric_difference(a: Geometry, b: Geometry, grid_size: float | None = None) -> Geometry:
    if a.is_empty():
        return b.copy()
    if b.is_empty():
        return a.copy()
    if not intersects(a, b):
        return collect([a, b], srid=a.srid, dissolve=True)
    if a.dimensions() == 2 and b.dimensions() == 2:
        reg_a, reg_b = geometry_to_region(a), geometry_to_region(b)
        if reg_a is not None and reg_b is not None:
            return region_to_geometry(reg_a.symmetric_difference(reg_b), a.srid)
    d1 = difference(a, b)
    d2 = difference(b, a)
    if d1.is_empty():
        return d2
    if d2.is_empty():
        return d1
    if a.dimensions() == 1 and b.dimensions() == 1:
        # lineal⊕lineal: GEOS returns fully NODED linework — the two
        # exclusive sides can still cross each other (r5)
        segs1 = _lineal_edges(d1)
        segs2 = _lineal_edges(d2)
        pieces = [p for ch in _decompose(d1).lines
                  for p in _node_chain_at_contacts(ch, segs2)]
        pieces += [p for ch in _decompose(d2).lines
                   for p in _node_chain_at_contacts(ch, segs1)]
        return _lines_result(pieces, a.srid)
    return collect([d1, d2], srid=a.srid, dissolve=True)


def _rect_minus_rect(ra, rb) -> list[tuple[float, float, float, float]]:
    ax0, ay0, ax1, ay1 = ra
    bx0, by0, bx1, by1 = rb
    ix0, iy0 = max(ax0, bx0), max(ay0, by0)
    ix1, iy1 = min(ax1, bx1), min(ay1, by1)
    if ix0 >= ix1 or iy0 >= iy1:
        return [ra]
    out = []
    if ay0 < iy0:
        out.append((ax0, ay0, ax1, iy0))
    if iy1 < ay1:
        out.append((ax0, iy1, ax1, ay1))
    if ax0 < ix0:
        out.append((ax0, iy0, ix0, iy1))
    if ix1 < ax1:
        out.append((ix1, iy0, ax1, iy1))
    return out


def _rects_to_geometry(rects, srid: int) -> Geometry:
    rects = [r for r in rects if r[2] > r[0] and r[3] > r[1]]
    if not rects:
        return _mk_empty_poly(srid)
    if len(rects) == 1:
        return _mk_rect(*rects[0], srid)
    return Geometry(
        GeometryType.MultiPolygon, srid=srid, geoms=[_mk_rect(*r, srid) for r in rects]
    )


def rectangles_union(rects, srid: int = 0) -> Geometry:
    """Exact union of axis-aligned rectangles via vertical slab decomposition.
    Output is a MultiPolygon of disjoint slabs (area-exact; shape is a valid
    decomposition of the union, not a dissolved outline)."""
    xs = sorted({r[0] for r in rects} | {r[2] for r in rects})
    pieces = []
    for i in range(len(xs) - 1):
        x0, x1 = xs[i], xs[i + 1]
        if x1 <= x0:
            continue
        ivals = []
        for rx0, ry0, rx1, ry1 in rects:
            if rx0 <= x0 and x1 <= rx1:
                ivals.append((ry0, ry1))
        if not ivals:
            continue
        ivals.sort()
        cy0, cy1 = ivals[0]
        for y0, y1 in ivals[1:]:
            if y0 <= cy1:
                cy1 = max(cy1, y1)
            else:
                pieces.append((x0, cy0, x1, cy1))
                cy0, cy1 = y0, y1
        pieces.append((x0, cy0, x1, cy1))
    # merge horizontally-adjacent slabs with identical y-extent
    merged: list[list[float]] = []
    for p in sorted(pieces, key=lambda t: (t[1], t[3], t[0])):
        if merged and merged[-1][1] == p[1] and merged[-1][3] == p[3] and merged[-1][2] == p[0]:
            merged[-1][2] = p[2]
        else:
            merged.append(list(p))
    return _rects_to_geometry([tuple(m) for m in merged], srid)


# ----------------------------------------------------------------------
# N-ary folds (reference: expressions.rs:873-999)
# ----------------------------------------------------------------------

def _nonnull(geoms) -> list[Geometry]:
    return [g for g in geoms if g is not None]


def union_all(geoms, grid_size: float | None = None) -> Geometry:
    """N-ary union; empty input → GEOMETRYCOLLECTION EMPTY
    (reference: expressions.rs:985-999).

    Strategy: flatten to primitive parts; exact slab-decomposition when all
    parts are axis-aligned rectangles; otherwise absorb covered parts and
    collect parts whose interiors don't overlap. Overlapping concave inputs
    need a general clipper — NotImplementedError (SURVEY §7)."""
    gs = _nonnull(geoms)
    parts: list[Geometry] = []
    for g in gs:
        parts.extend(_flatten_parts(g))
    if not parts:
        return empty_collection()
    srid = parts[0].srid
    if len(parts) == 1:
        return parts[0].copy()
    # rectilinear areal parts → exact region algebra, mixed dims handled
    areal = [p for p in parts if p.dimensions() == 2]
    lineal = [p for p in parts if p.dimensions() == 1]
    punctual = [p for p in parts if p.dimensions() == 0]
    regions = [geometry_to_region(p) for p in areal]
    if areal and all(r is not None for r in regions):
        region = RectRegion()
        for r in regions:
            region = region.union(r)
        out: list[Geometry] = _flatten_parts(region_to_geometry(region, srid))
        for l in lineal:
            for chain in _decompose(l).lines:
                for piece in _chain_outside_region(chain, region):
                    out.append(Geometry(GeometryType.LineString, srid=srid, coords=piece))
        higher = [p for p in out]
        for p in punctual:
            if not any(intersects(p, q) for q in higher):
                out.append(p.copy())
        if len(out) == 1:
            return out[0]
        return collect(out, srid=srid, dissolve=True)
    # absorption: drop any part covered by another surviving part.
    # bbox prefilter (r5 — the pairwise covers/intersects scans were
    # O(n²) geometry predicates; VERDICT r4): covers(h, g) requires
    # bbox(h) ⊇ bbox(g) and intersects requires bbox overlap (±ε for the
    # predicates' boundary tolerance), so candidate pairs come from a
    # vectorized bounds compare — large mostly-disjoint groups (the 100×
    # grain) do O(n) predicate calls instead of O(n²)
    _eps = 1e-9
    bnds = np.array([p.bounds() for p in parts], dtype=float)
    kept: list[Geometry] = []
    kept_idx: list[int] = []
    for i, g in enumerate(parts):
        gx0, gy0, gx1, gy1 = bnds[i]
        with np.errstate(invalid="ignore"):
            cand = (
                (bnds[:, 0] <= gx0 + _eps) & (bnds[:, 1] <= gy0 + _eps)
                & (bnds[:, 2] >= gx1 - _eps) & (bnds[:, 3] >= gy1 - _eps)
            )
        cand[i] = False
        absorbed = False
        for j in np.nonzero(cand)[0]:
            h = parts[j]
            if covers(h, g) and not (j > i and covers(g, h)):
                absorbed = True
                break
        if not absorbed:
            kept.append(g)
            kept_idx.append(i)
    # remaining parts must have non-overlapping interiors to collect exactly
    kb = bnds[kept_idx] if kept_idx else np.empty((0, 4))
    for i in range(len(kept)):
        with np.errstate(invalid="ignore"):
            ov = (
                (kb[:, 0] <= kb[i, 2] + _eps) & (kb[i, 0] <= kb[:, 2] + _eps)
                & (kb[:, 1] <= kb[i, 3] + _eps) & (kb[i, 1] <= kb[:, 3] + _eps)
            )
        for j in range(i + 1, len(kept)):
            if not ov[j]:
                continue
            a, b = kept[i], kept[j]
            if intersects(a, b) and not touches(a, b):
                ra, rb = _axis_rect(a), _axis_rect(b)
                if ra and rb:
                    continue  # rect pair resolved below
                if a.dimensions() == 2 and b.dimensions() == 2:
                    from polars_st_spark.geo.overlay import union_many

                    # grow the full overlapping-areal cluster and union it
                    # in ONE multi-piece pass — the old pair-merge restarted
                    # the whole fold once per overlap (r5)
                    comp = {i, j}
                    frontier = [i, j]
                    while frontier:
                        u = frontier.pop()
                        for k2 in range(len(kept)):
                            if k2 in comp or kept[k2].dimensions() != 2:
                                continue
                            with np.errstate(invalid="ignore"):
                                boxok = (
                                    kb[k2, 0] <= kb[u, 2] + _eps
                                    and kb[u, 0] <= kb[k2, 2] + _eps
                                    and kb[k2, 1] <= kb[u, 3] + _eps
                                    and kb[u, 1] <= kb[k2, 3] + _eps
                                )
                            if not boxok:
                                continue
                            if intersects(kept[u], kept[k2]) and not touches(
                                    kept[u], kept[k2]):
                                comp.add(k2)
                                frontier.append(k2)
                    merged_pair = union_many([kept[k] for k in sorted(comp)], srid)
                    rest = [g for k2, g in enumerate(kept) if k2 not in comp]
                    return union_all(rest + [merged_pair], grid_size)
                # mixed line/polygon overlap: the union is the polygon plus
                # the line's strictly-exterior pieces (GEOS collection
                # semantics); line/line overlap dissolves the collinear
                # common runs (r5 — both previously raised)
                dims = (a.dimensions(), b.dimensions())
                if dims in ((1, 2), (2, 1)):
                    line, poly = (a, b) if dims == (1, 2) else (b, a)
                    outside = _line_minus_polygon(line, poly)
                    rest = [g for g in kept if g is not a and g is not b]
                    rest.append(poly)
                    if not outside.is_empty():
                        rest.append(outside)
                    return union_all(rest, grid_size) if len(rest) > 1 else rest[0]
                if dims == (1, 1):
                    # GEOS lineal union = node + dissolve: b's linework plus
                    # a's collinear-exclusive remainder, both NODED at every
                    # mutual contact so the surviving pieces pairwise only
                    # touch at endpoints (the collect invariant; also what
                    # stops this recursion)
                    amb = _line_minus_line(a, b)
                    a_segs = _lineal_edges(amb)
                    b_segs = _lineal_edges(b)
                    pieces: list[np.ndarray] = []
                    for ch in _decompose(b).lines:
                        pieces.extend(_node_chain_at_contacts(ch, a_segs))
                    for ch in _decompose(amb).lines:
                        pieces.extend(_node_chain_at_contacts(ch, b_segs))
                    merged_line = _lines_result(pieces, srid)
                    rest = [g for g in kept if g is not a and g is not b]
                    rest.append(merged_line)
                    return union_all(rest, grid_size) if len(rest) > 1 else rest[0]
                raise NotImplementedError(
                    f"union of overlapping {a.type_name}/{b.type_name} (non-areal)"
                )
    # merge any overlapping rectangle clusters via slab union
    rect_idx = [i for i, g in enumerate(kept) if _axis_rect(g)]
    overlapping_rects = set()
    for ii in range(len(rect_idx)):
        for jj in range(ii + 1, len(rect_idx)):
            a, b = kept[rect_idx[ii]], kept[rect_idx[jj]]
            if intersects(a, b) and not touches(a, b):
                overlapping_rects.add(rect_idx[ii])
                overlapping_rects.add(rect_idx[jj])
    if overlapping_rects:
        merged = rectangles_union([_axis_rect(kept[i]) for i in sorted(overlapping_rects)], srid)
        rest = [g for i, g in enumerate(kept) if i not in overlapping_rects]
        if not rest:
            return merged
        kept = rest + _flatten_parts(merged)
    if len(kept) == 1:
        return kept[0].copy()
    return collect(kept, srid=srid, dissolve=True)


def intersection_all(geoms, grid_size: float | None = None) -> Geometry:
    """Left fold of intersection (reference: expressions.rs:901-914)."""
    gs = _nonnull(geoms)
    if not gs:
        return empty_collection()
    acc = gs[0].copy()
    for g in gs[1:]:
        acc = intersection(acc, g, grid_size)
    return acc


def difference_all(geoms, grid_size: float | None = None) -> Geometry:
    """Order-dependent left fold (reference: expressions.rs:873-886).
    Caller must supply rows in deterministic order."""
    gs = _nonnull(geoms)
    if not gs:
        return empty_collection()
    acc = gs[0].copy()
    for g in gs[1:]:
        acc = difference(acc, g, grid_size)
    return acc


def symmetric_difference_all(geoms, grid_size: float | None = None) -> Geometry:
    gs = _nonnull(geoms)
    if not gs:
        return empty_collection()
    acc = gs[0].copy()
    for g in gs[1:]:
        acc = symmetric_difference(acc, g, grid_size)
    return acc


_SUPERTYPE = {
    GeometryType.Point: GeometryType.MultiPoint,
    GeometryType.LineString: GeometryType.MultiLineString,
    GeometryType.Polygon: GeometryType.MultiPolygon,
}


def collect(geoms, into: int | None = None, srid: int | None = None, dissolve: bool = False) -> Geometry:
    """Gather into Multi*/GeometryCollection with supertype inference
    (reference: functions.rs:1238-1276)."""
    gs = _nonnull(list(geoms))
    if srid is None:
        srid = gs[0].srid if gs else 0
    if into is None:
        kinds = {g.type_id for g in gs}
        if kinds == {GeometryType.Point}:
            into = GeometryType.MultiPoint
        elif kinds == {GeometryType.LineString}:
            into = GeometryType.MultiLineString
        elif kinds == {GeometryType.Polygon}:
            into = GeometryType.MultiPolygon
        else:
            into = GeometryType.GeometryCollection
    members: list[Geometry] = []
    for g in gs:
        if dissolve and g.type_id in (
            GeometryType.MultiPoint,
            GeometryType.MultiLineString,
            GeometryType.MultiPolygon,
        ) and into != GeometryType.GeometryCollection:
            members.extend(s.copy() for s in (g.geoms or []))
        else:
            members.append(g.copy())
    has_z = any(m.has_z for m in members)
    return Geometry(into, srid=srid, has_z=has_z, geoms=members)


def unary_union(g: Geometry, grid_size: float | None = None) -> Geometry:
    """Per-row union of a collection's parts (reference: functions.rs:1156-1168)."""
    if g.geoms is not None:
        return union_all(list(g.geoms), grid_size)
    return g.copy()


def _snap_to_grid(g: Geometry, grid_size: float) -> Geometry:
    def f(arr: np.ndarray) -> np.ndarray:
        out = arr.copy()
        out[:, :2] = np.round(arr[:, :2] / grid_size) * grid_size
        return out

    return g.map_coords(f)
