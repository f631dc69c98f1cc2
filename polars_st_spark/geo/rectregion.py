"""Exact boolean algebra over rectilinear regions (axis-aligned rectangles,
including holes), via vertical-slab decomposition with 1-D interval sets.

This gives the engine a *closed, exact* overlay algebra for the geometry
class used by the correctness harness (rectangles derived from numeric
columns), without a general polygon clipper. Polygons whose rings are all
axis-aligned rectangles convert losslessly to a RectRegion and back.
"""

from __future__ import annotations

import numpy as np

from polars_st_spark.geo.types import Geometry, GeometryType

__all__ = ["RectRegion", "geometry_to_region", "region_to_geometry"]

Interval = tuple[float, float]


def _iv_union(a: list[Interval], b: list[Interval]) -> list[Interval]:
    ivs = sorted(a + b)
    out: list[Interval] = []
    for lo, hi in ivs:
        if out and lo <= out[-1][1]:
            out[-1] = (out[-1][0], max(out[-1][1], hi))
        else:
            out.append((lo, hi))
    return out


def _iv_intersect(a: list[Interval], b: list[Interval]) -> list[Interval]:
    out = []
    i = j = 0
    while i < len(a) and j < len(b):
        lo = max(a[i][0], b[j][0])
        hi = min(a[i][1], b[j][1])
        if lo < hi:
            out.append((lo, hi))
        if a[i][1] < b[j][1]:
            i += 1
        else:
            j += 1
    return out


def _iv_subtract(a: list[Interval], b: list[Interval]) -> list[Interval]:
    out = []
    for lo, hi in a:
        cur = lo
        for blo, bhi in b:
            if bhi <= cur or blo >= hi:
                continue
            if blo > cur:
                out.append((cur, min(blo, hi)))
            cur = max(cur, bhi)
            if cur >= hi:
                break
        if cur < hi:
            out.append((cur, hi))
    return out


class RectRegion:
    """A rectilinear region stored as disjoint rectangles (x0, y0, x1, y1)."""

    __slots__ = ("rects",)

    def __init__(self, rects: list[tuple[float, float, float, float]] | None = None):
        self.rects = [r for r in (rects or []) if r[2] > r[0] and r[3] > r[1]]

    def is_empty(self) -> bool:
        return not self.rects

    def area(self) -> float:
        return sum((x1 - x0) * (y1 - y0) for x0, y0, x1, y1 in self.rects)

    def _slabs(self, other: "RectRegion"):
        xs = sorted({r[0] for r in self.rects} | {r[2] for r in self.rects}
                    | {r[0] for r in other.rects} | {r[2] for r in other.rects})
        for x0, x1 in zip(xs[:-1], xs[1:]):
            if x1 <= x0:
                continue
            mine = sorted(
                (r[1], r[3]) for r in self.rects if r[0] <= x0 and x1 <= r[2]
            )
            theirs = sorted(
                (r[1], r[3]) for r in other.rects if r[0] <= x0 and x1 <= r[2]
            )
            yield x0, x1, _iv_union(mine, []), _iv_union(theirs, [])

    def _combine(self, other: "RectRegion", op) -> "RectRegion":
        pieces = []
        for x0, x1, mine, theirs in self._slabs(other):
            for lo, hi in op(mine, theirs):
                pieces.append((x0, lo, x1, hi))
        return RectRegion(_merge_adjacent(pieces))

    def union(self, other: "RectRegion") -> "RectRegion":
        return self._combine(other, _iv_union)

    def intersect(self, other: "RectRegion") -> "RectRegion":
        return self._combine(other, _iv_intersect)

    def subtract(self, other: "RectRegion") -> "RectRegion":
        return self._combine(other, _iv_subtract)

    def symmetric_difference(self, other: "RectRegion") -> "RectRegion":
        return self.subtract(other).union(other.subtract(self))


def _merge_adjacent(pieces):
    """Merge horizontally-adjacent slabs with identical y-extent."""
    merged: list[list[float]] = []
    for p in sorted(pieces, key=lambda t: (t[1], t[3], t[0])):
        if merged and merged[-1][1] == p[1] and merged[-1][3] == p[3] and merged[-1][2] == p[0]:
            merged[-1][2] = p[2]
        else:
            merged.append(list(p))
    return [tuple(m) for m in merged]


def _ring_as_rect(r: np.ndarray) -> tuple[float, float, float, float] | None:
    rr = np.asarray(r)[:, :2]
    if len(rr) >= 2 and (rr[0] == rr[-1]).all():
        rr = rr[:-1]
    if len(rr) != 4:
        return None
    xs = sorted(set(round(float(v), 12) for v in rr[:, 0]))
    ys = sorted(set(round(float(v), 12) for v in rr[:, 1]))
    if len(xs) != 2 or len(ys) != 2:
        return None
    expect = {(xs[0], ys[0]), (xs[1], ys[0]), (xs[1], ys[1]), (xs[0], ys[1])}
    got = {(round(float(p[0]), 12), round(float(p[1]), 12)) for p in rr}
    if got != expect:
        return None
    return (xs[0], ys[0], xs[1], ys[1])


def rect_parts(g: Geometry) -> list[tuple[float, float, float, float]] | None:
    """The geometry's parts as raw rect tuples WITHOUT any region
    arithmetic — when it is a hole-free axis-rect Polygon, or a Multi/
    Collection of such polygons (exactly the shape ``region_to_geometry``
    emits); None otherwise. Empty polygon → [] (union identity). Used by
    the union kernel's rectilinear fast path: a batch of such parts
    unions through ONE RectRegion normalize instead of the general
    overlay engine."""
    if g.type_id in (GeometryType.Polygon, GeometryType.Triangle):
        if not g.rings:
            return []
        if len(g.rings) != 1:
            return None
        r = _ring_as_rect(g.rings[0])
        return None if r is None else [r]
    if g.type_id in (GeometryType.MultiPolygon, GeometryType.GeometryCollection):
        out: list[tuple[float, float, float, float]] = []
        for s in g.geoms or []:
            sub = rect_parts(s)
            if sub is None:
                return None
            out += sub
        return out
    return None


def geometry_to_region(g: Geometry) -> RectRegion | None:
    """Convert when every ring is an axis-aligned rectangle; else None."""
    if g.type_id in (GeometryType.Polygon, GeometryType.Triangle):
        if not g.rings:
            return RectRegion()
        ext = _ring_as_rect(g.rings[0])
        if ext is None:
            return None
        region = RectRegion([ext])
        for hole in g.rings[1:]:
            hr = _ring_as_rect(hole)
            if hr is None:
                return None
            region = region.subtract(RectRegion([hr]))
        return region
    if g.type_id in (GeometryType.MultiPolygon, GeometryType.GeometryCollection):
        region = RectRegion()
        for s in g.geoms or []:
            sub = geometry_to_region(s)
            if sub is None:
                return None
            region = region.union(sub)
        return region
    return None


def region_to_geometry(region: RectRegion, srid: int = 0) -> Geometry:
    """Disjoint-rectangle MultiPolygon (or single Polygon / empty Polygon)."""
    rects = region.rects
    if not rects:
        return Geometry(GeometryType.Polygon, srid=srid, rings=[])

    def mk(r):
        x0, y0, x1, y1 = r
        ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])
        return Geometry(GeometryType.Polygon, srid=srid, rings=[ring])

    if len(rects) == 1:
        return mk(rects[0])
    return Geometry(GeometryType.MultiPolygon, srid=srid, geoms=[mk(r) for r in rects])
