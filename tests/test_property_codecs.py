"""Property-based codec tests: random geometries must round-trip losslessly
through EWKB and WKT (full precision), and measures must be rotation/
translation invariant."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st_

from polars_st_spark.geo import algos
from polars_st_spark.geo.types import Geometry, GeometryType
from polars_st_spark.geo.wkb import from_ewkb, to_ewkb
from polars_st_spark.geo.wkt import from_wkt, to_wkt

finite = st_.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False)


@st_.composite
def points(draw):
    has_z = draw(st_.booleans())
    dims = 3 if has_z else 2
    coords = np.array([draw(finite) for _ in range(dims)])
    srid = draw(st_.sampled_from([0, 4326, 3857]))
    return Geometry(GeometryType.Point, srid=srid, has_z=has_z, coords=coords)


@st_.composite
def linestrings(draw):
    n = draw(st_.integers(min_value=2, max_value=8))
    coords = np.array([[draw(finite), draw(finite)] for _ in range(n)])
    return Geometry(GeometryType.LineString, srid=draw(st_.sampled_from([0, 4326])), coords=coords)


@st_.composite
def polygons(draw):
    # convex hull of random points → always a valid simple polygon
    n = draw(st_.integers(min_value=3, max_value=10))
    pts = np.array([[draw(finite), draw(finite)] for _ in range(n)])
    g = Geometry(GeometryType.MultiPoint, geoms=[
        Geometry(GeometryType.Point, coords=p) for p in pts
    ])
    hull = algos.convex_hull(g)
    if hull.type_id != GeometryType.Polygon:
        # degenerate (collinear) — fall back to a triangle
        hull = from_wkt("POLYGON ((0 0, 1 0, 0 1, 0 0))")
    hull.srid = draw(st_.sampled_from([0, 4326]))
    return hull


geoms = st_.one_of(points(), linestrings(), polygons())


@given(geoms)
@settings(max_examples=150, deadline=None)
def test_ewkb_roundtrip_random(g):
    back = from_ewkb(to_ewkb(g))
    assert back.type_id == g.type_id
    assert back.srid == g.srid
    assert back.has_z == g.has_z
    a, b = g.all_coords(), back.all_coords()
    assert a.shape == b.shape
    assert np.array_equal(a, b)  # bit-exact


@given(geoms)
@settings(max_examples=100, deadline=None)
def test_wkt_roundtrip_random(g):
    # full precision WKT (-1 → repr) must round-trip bit-exactly
    w = to_wkt(g, rounding_precision=-1)
    back = from_wkt(w)
    assert np.array_equal(g.all_coords(), back.all_coords())


@given(polygons(), st_.floats(min_value=-180, max_value=180))
@settings(max_examples=50, deadline=None)
def test_area_rotation_invariant(poly, angle):
    a0 = algos.area(poly)
    a1 = algos.area(algos.rotate(poly, angle, origin="centroid"))
    # double-precision shoelace error grows with the squared extent: thin
    # polygons spanning ±1e6 legitimately differ at ~extent²·1e-15
    x0, y0, x1, y1 = poly.bounds()
    extent2 = max((x1 - x0), (y1 - y0), 1.0) ** 2
    assert math.isclose(a0, a1, rel_tol=1e-9, abs_tol=max(1e-6, extent2 * 1e-14))


@given(linestrings(), finite, finite)
@settings(max_examples=50, deadline=None)
def test_length_translation_invariant(line, dx, dy):
    l0 = algos.length(line)
    l1 = algos.length(algos.translate(line, dx, dy))
    assert math.isclose(l0, l1, rel_tol=1e-9, abs_tol=1e-9)


@given(polygons())
@settings(max_examples=50, deadline=None)
def test_hull_contains_input(poly):
    hull = algos.convex_hull(poly)
    assert algos.area(hull) >= algos.area(poly) - 1e-6
    c = algos.centroid(poly)
    if c.coords is not None and algos.area(poly) > 1e-9:
        from polars_st_spark.geo import predicates as P

        assert P.covers(hull, c)
