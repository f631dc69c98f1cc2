"""Property tests for the one-shot multi-union engine (geo/overlay.union_many)
and the vectorized buffer path built on it (late r5).

The exact rectilinear slab algebra (geo/rectregion.py) is the oracle for
rectangle sets; inclusion–exclusion and monotonicity pin the general case.
"""

import math

import numpy as np
import pytest

from polars_st_spark.geo.algos import area, buffer
from polars_st_spark.geo.overlay import overlay, union_many
from polars_st_spark.geo.rectregion import RectRegion
from polars_st_spark.geo.setops import union_all
from polars_st_spark.geo.types import Geometry, GeometryType


def _rect(x0, y0, x1, y1):
    ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)
    return Geometry(GeometryType.Polygon, srid=0, rings=[ring])


def _poly(pts):
    return Geometry(GeometryType.Polygon, srid=0, rings=[np.asarray(pts, float)])


def test_union_many_rects_vs_slab_algebra():
    rng = np.random.default_rng(11)
    for trial in range(20):
        rects = []
        for _ in range(rng.integers(2, 12)):
            x0, y0 = rng.uniform(0, 20, 2)
            rects.append((x0, y0, x0 + rng.uniform(1, 8), y0 + rng.uniform(1, 8)))
        region = RectRegion()
        for r in rects:
            region = region.union(RectRegion([r]))
        got = area(union_many([_rect(*r) for r in rects], 0))
        assert got == pytest.approx(region.area(), abs=1e-9), trial


def test_union_many_pairwise_inclusion_exclusion():
    rng = np.random.default_rng(12)
    for trial in range(15):
        # two random convex-ish quads
        def quad():
            c = rng.uniform(0, 10, 2)
            angs = np.sort(rng.uniform(0, 2 * math.pi, 5))
            pts = np.stack([c[0] + 3 * np.cos(angs), c[1] + 3 * np.sin(angs)], 1)
            return _poly(np.vstack([pts, pts[:1]]))

        a, b = quad(), quad()
        u = union_many([a, b], 0)
        i = overlay(a, b, "intersection")
        assert area(u) == pytest.approx(area(a) + area(b) - area(i), abs=1e-7)


def test_union_many_disjoint_is_multipolygon():
    u = union_many([_rect(0, 0, 1, 1), _rect(5, 5, 6, 6)], 0)
    assert u.type_id == GeometryType.MultiPolygon
    assert area(u) == pytest.approx(2.0, abs=1e-12)


def test_union_many_contained_piece_absorbed():
    u = union_many([_rect(0, 0, 10, 10), _rect(2, 2, 4, 4)], 0)
    assert u.type_id == GeometryType.Polygon
    assert area(u) == pytest.approx(100.0, abs=1e-9)


def test_union_all_overlapping_cluster_area():
    # chain of overlapping squares: union area is the exact staircase sum
    n = 12
    rects = [(i * 0.5, 0.0, i * 0.5 + 1.0, 1.0) for i in range(n)]
    # non-rect member forces the general cluster path (tilted square
    # covering the middle, fully inside the chain's span)
    tilt = _poly([[3.0, 0.5], [3.4, 0.1], [3.8, 0.5], [3.4, 0.9], [3.0, 0.5]])
    u = union_all([_rect(*r) for r in rects] + [tilt])
    want = (n - 1) * 0.5 + 1.0  # tilt is inside the strip
    assert area(u) == pytest.approx(want, abs=1e-7)


def test_buffer_line_area_monotone_and_bounded():
    rng = np.random.default_rng(13)
    for _ in range(5):
        coords = np.cumsum(rng.normal(0, 1, (8, 2)), axis=0) * 2
        g = Geometry(GeometryType.LineString, srid=0, coords=coords)
        L = float(np.hypot(*np.diff(coords, axis=0).T).sum())
        prev = 0.0
        for d in (0.2, 0.4, 0.8):
            a = area(buffer(g, d))
            # monotone in d; bounded by the no-overlap stadium bound
            assert a > prev
            assert a <= 2 * d * L + math.pi * d * d + 1e-6
            prev = a


def test_buffer_polygon_dilation_contains_original():
    from polars_st_spark.geo.predicates import relate

    p = _poly([[0, 0], [10, 0], [10, 8], [6, 8], [6, 4], [4, 4], [4, 8],
               [0, 8], [0, 0]])
    b = buffer(p, 0.7)
    assert area(b) > area(p)
    # dilation strictly contains the original (interior-to-interior)
    m = relate(p, b)
    assert m[0] == "2"


def test_union_many_shared_edge_dissolves():
    # two rects sharing a full edge: one polygon, exact area, no seam ring
    u = union_many([_rect(0, 0, 2, 3), _rect(2, 0, 5, 3)], 0)
    assert u.type_id == GeometryType.Polygon
    assert area(u) == pytest.approx(15.0, abs=1e-12)
