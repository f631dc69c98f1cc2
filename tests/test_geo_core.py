"""Geometry kernel unit tests: codecs, measures, predicates, set ops.

Fixture WKTs mirror the reference's 22-geometry test matrix
(reference: tests/test_expressions.py:19-71; FIXTURES.md T1).
"""

import math

import numpy as np
import pytest

from polars_st_spark.geo import algos, predicates as P, setops
from polars_st_spark.geo.geojson import from_geojson, to_geojson
from polars_st_spark.geo.types import Geometry, GeometryType
from polars_st_spark.geo.wkb import from_ewkb, header_info, to_ewkb
from polars_st_spark.geo.wkt import from_ewkt, from_wkt, to_ewkt, to_wkt

FIXTURES = [
    "POINT EMPTY",
    "POINT (1 2)",
    "POINT Z (1 2 3)",
    "LINESTRING EMPTY",
    "LINESTRING (0 0, 1 1)",
    "LINESTRING Z (0 0 0, 1 1 1, 2 2 2)",
    "POLYGON EMPTY",
    "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
    "POLYGON Z ((0 0 1, 1 0 0, 1 1 1, 0 1 0, 0 0 1))",
    "MULTIPOINT EMPTY",
    "MULTIPOINT ((0 0), (1 1))",
    "MULTIPOINT Z ((0 0 0), (1 1 1))",
    "MULTILINESTRING EMPTY",
    "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
    "MULTILINESTRING Z ((0 0 0, 1 1 1), (2 2 2, 3 3 3))",
    "MULTIPOLYGON EMPTY",
    "MULTIPOLYGON (((0 0, 1 0, 0 1, 0 0)), ((2 2, 3 2, 2 3, 2 2)))",
    "GEOMETRYCOLLECTION EMPTY",
    "GEOMETRYCOLLECTION (POINT (0 0), LINESTRING (0 0, 1 1))",
    "POLYGON ((0 0, 2 2, 0 2, 2 0, 0 0))",
]


@pytest.mark.parametrize("wkt", FIXTURES)
def test_wkt_roundtrip(wkt):
    assert to_wkt(from_wkt(wkt)) == wkt


@pytest.mark.parametrize("wkt", FIXTURES)
def test_ewkb_roundtrip(wkt):
    g = from_wkt(wkt)
    assert to_wkt(from_ewkb(to_ewkb(g))) == wkt


def test_srid_roundtrip():
    g = from_ewkt("SRID=4326;POINT (1 2)")
    assert g.srid == 4326
    b = to_ewkb(g)
    assert header_info(b) == (1, False, False, 4326)
    assert to_ewkt(from_ewkb(b)) == "SRID=4326;POINT (1 2)"


def test_geojson_roundtrip():
    for wkt in ["POINT (1 2)", "LINESTRING (0 0, 1 1)", "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
                "MULTIPOINT ((0 0), (1 1))", "MULTIPOLYGON (((0 0, 1 0, 0 1, 0 0)))"]:
        g = from_wkt(wkt)
        assert to_wkt(from_geojson(to_geojson(g))) == wkt


# ---------------------------------------------------------------- measures

def test_area():
    assert algos.area(from_wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")) == 1.0
    # polygon with hole
    g = from_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))")
    assert algos.area(g) == 15.0
    assert algos.area(from_wkt("MULTIPOLYGON (((0 0, 1 0, 0 1, 0 0)), ((2 2, 3 2, 2 3, 2 2)))")) == 1.0
    assert algos.area(from_wkt("LINESTRING (0 0, 1 1)")) == 0.0
    assert algos.area(from_wkt("POLYGON EMPTY")) == 0.0


def test_length():
    assert algos.length(from_wkt("LINESTRING (0 0, 3 4)")) == 5.0
    assert algos.length(from_wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")) == 4.0
    assert algos.length(from_wkt("MULTILINESTRING ((0 0, 1 0), (0 0, 0 2))")) == 3.0


def test_distance():
    a = from_wkt("POINT (0 0)")
    b = from_wkt("POINT (3 4)")
    assert algos.distance(a, b) == 5.0
    assert math.isnan(algos.distance(a, from_wkt("POINT EMPTY")))
    # point to segment
    assert algos.distance(from_wkt("POINT (0 1)"), from_wkt("LINESTRING (-1 0, 1 0)")) == 1.0
    # overlapping → 0
    assert algos.distance(from_wkt("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"), from_wkt("POINT (1 1)")) == 0.0
    # polygon to polygon
    d = algos.distance(
        from_wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
        from_wkt("POLYGON ((3 0, 4 0, 4 1, 3 1, 3 0))"),
    )
    assert d == 2.0


def test_centroid():
    c = algos.centroid(from_wkt("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"))
    assert np.allclose(c.coords, [1, 1])
    c = algos.centroid(from_wkt("LINESTRING (0 0, 2 0)"))
    assert np.allclose(c.coords, [1, 0])
    c = algos.centroid(from_wkt("MULTIPOINT ((0 0), (2 2))"))
    assert np.allclose(c.coords, [1, 1])
    assert algos.centroid(from_wkt("POINT EMPTY")).coords is None


def test_bounds():
    g = from_wkt("LINESTRING (0 1, 2 3)")
    assert g.bounds() == (0, 1, 2, 3)
    assert all(math.isnan(v) for v in from_wkt("POINT EMPTY").bounds())


def test_hausdorff_frechet():
    a = from_wkt("LINESTRING (0 0, 2 0)")
    b = from_wkt("LINESTRING (0 1, 2 1)")
    assert algos.hausdorff_distance(a, b) == 1.0
    assert algos.frechet_distance(a, b) == 1.0
    assert math.isnan(algos.hausdorff_distance(a, from_wkt("LINESTRING EMPTY")))


def test_convex_hull():
    g = from_wkt("MULTIPOINT ((0 0), (1 0), (1 1), (0 1), (0.5 0.5))")
    h = algos.convex_hull(g)
    assert h.type_id == GeometryType.Polygon
    assert algos.area(h) == 1.0


def test_envelope_center():
    g = from_wkt("LINESTRING (0 0, 2 3)")
    e = algos.envelope(g)
    assert algos.area(e) == 6.0
    c = algos.center(g)
    assert np.allclose(c.coords, [1, 1.5])


def test_simplify():
    g = from_wkt("LINESTRING (0 0, 1 0.01, 2 0)")
    s = algos.simplify(g, 0.1)
    assert len(s.coords) == 2


def test_affine():
    g = from_wkt("POINT (1 2)")
    assert to_wkt(algos.translate(g, 1, 1)) == "POINT (2 3)"
    r = algos.rotate(from_wkt("POINT (1 0)"), 90, origin=(0, 0))
    assert np.allclose(r.coords, [0, 1], atol=1e-12)
    s = algos.scale(from_wkt("LINESTRING (0 0, 1 1)"), 2, 2, origin=(0, 0))
    assert to_wkt(s) == "LINESTRING (0 0, 2 2)"


def test_line_ops():
    line = from_wkt("LINESTRING (0 0, 10 0)")
    p = algos.line_interpolate_point(line, 4)
    assert np.allclose(p.coords, [4, 0])
    p = algos.line_interpolate_point(line, 0.5, normalized=True)
    assert np.allclose(p.coords, [5, 0])
    assert algos.line_locate_point(line, from_wkt("POINT (3 5)")) == 3.0
    m = algos.line_merge(from_wkt("MULTILINESTRING ((0 0, 1 1), (1 1, 2 2))"))
    assert m.type_id == GeometryType.LineString and len(m.coords) == 3


def test_boundary():
    b = algos.boundary(from_wkt("LINESTRING (0 0, 1 1)"))
    assert b.type_id == GeometryType.MultiPoint and len(b.geoms) == 2
    b = algos.boundary(from_wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"))
    assert b.type_id == GeometryType.LineString
    b = algos.boundary(from_wkt("POINT (1 1)"))
    assert b.type_id == GeometryType.GeometryCollection and b.is_empty()


def test_is_checks():
    assert algos.is_closed(from_wkt("LINESTRING (0 0, 1 0, 1 1, 0 0)"))
    assert not algos.is_closed(from_wkt("LINESTRING (0 0, 1 1)"))
    assert algos.is_simple(from_wkt("LINESTRING (0 0, 1 1)"))
    assert not algos.is_simple(from_wkt("LINESTRING (0 0, 2 2, 0 2, 2 0)"))
    assert algos.is_valid(from_wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"))
    assert not algos.is_valid(from_wkt("POLYGON ((0 0, 2 2, 0 2, 2 0, 0 0))"))
    assert algos.is_ccw(from_wkt("LINESTRING (0 0, 1 0, 1 1, 0 0)"))


# ------------------------------------------------------------- predicates

def test_point_in_polygon_predicates():
    poly = from_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    inside = from_wkt("POINT (2 2)")
    on_edge = from_wkt("POINT (0 2)")
    outside = from_wkt("POINT (9 9)")
    assert P.intersects(poly, inside)
    assert P.contains(poly, inside)
    assert P.contains_properly(poly, inside)
    assert P.intersects(poly, on_edge)
    assert not P.contains(poly, on_edge)  # boundary: contains is false
    assert P.covers(poly, on_edge)
    assert not P.contains_properly(poly, on_edge)
    assert P.disjoint(poly, outside)
    assert P.within(inside, poly)
    assert P.touches(poly, on_edge)


def test_polygon_polygon_predicates():
    a = from_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    b = from_wkt("POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))")  # inside a
    c = from_wkt("POLYGON ((3 3, 6 3, 6 6, 3 6, 3 3))")  # overlaps a
    d = from_wkt("POLYGON ((4 0, 8 0, 8 4, 4 4, 4 0))")  # touches a along edge
    e = from_wkt("POLYGON ((10 10, 11 10, 11 11, 10 11, 10 10))")  # disjoint
    assert P.contains(a, b) and P.within(b, a) and P.covers(a, b)
    assert P.intersects(a, c) and P.overlaps(a, c)
    assert not P.contains(a, c)
    assert P.touches(a, d) and not P.overlaps(a, d)
    assert P.disjoint(a, e)


def test_line_predicates():
    l1 = from_wkt("LINESTRING (0 0, 2 2)")
    l2 = from_wkt("LINESTRING (0 2, 2 0)")  # crosses l1
    l3 = from_wkt("LINESTRING (2 2, 3 3)")  # touches at endpoint
    poly = from_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert P.crosses(l1, l2)
    assert P.intersects(l1, l3)
    assert P.touches(l1, l3)
    assert not P.crosses(l1, l3)
    assert P.contains(poly, from_wkt("LINESTRING (1 1, 2 2)"))
    line_crossing = from_wkt("LINESTRING (2 2, 9 2)")
    assert P.crosses(line_crossing, poly)
    assert not P.contains(poly, line_crossing)


def test_equals():
    a = from_wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
    b = from_wkt("POLYGON ((1 0, 1 1, 0 1, 0 0, 1 0))")  # same ring, rotated start
    assert P.equals(a, b)
    assert P.equals_exact(a, a)
    assert not P.equals_exact(a, b)
    assert P.equals_identical(a, a)


def test_dwithin():
    a = from_wkt("POINT (0 0)")
    b = from_wkt("POINT (3 4)")
    assert P.dwithin(a, b, 5.1)
    assert not P.dwithin(a, b, 5.0)  # strict < (reference: functions.rs:988)


def test_relate():
    poly = from_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    inside = from_wkt("POINT (2 2)")
    m = P.relate(inside, poly)
    # GEOS: point-in-polygon relates as 0FFFFF212 (EI = 2: the polygon's
    # interior minus one point is still 2-D). Round-1 asserted the buggy F.
    assert m == "0FFFFF212"


def test_relate_multipolygon_union_location():
    """Exterior-side relate signals must classify against the UNION of the
    other side's components, not one component at a time (r4g fix: a rect
    inside one component used to pick up IE/BE from being outside the far
    component)."""
    a = from_wkt("POLYGON ((9 0, 10 0, 10 1, 9 1, 9 0))")
    b = from_wkt(
        "MULTIPOLYGON (((-10 -10, 10 -10, 10 10, -10 10, -10 -10)),"
        " ((20 20, 30 20, 30 30, 20 30, 20 20)))"
    )
    # a sits inside the first component, sharing a boundary run on x=10
    assert P.relate(a, b) == "2FF11F212"
    assert P.relate(b, a) == "212F11FF2"
    # line strictly inside the first component: pieces must not read as
    # exterior against the far component
    line = from_wkt("LINESTRING (0 0, 1 1)")
    assert P.relate(line, b) == "1FF0FF212"
    assert P.relate(b, line) == "102FF1FF2"


# ---------------------------------------------------------------- set ops

def test_clip_by_rect():
    poly = from_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    c = setops.clip_by_rect(poly, 2, 2, 6, 6)
    assert algos.area(c) == 4.0
    line = from_wkt("LINESTRING (-1 1, 5 1)")
    c = setops.clip_by_rect(line, 0, 0, 4, 4)
    assert algos.length(c) == 4.0


def test_intersection_rects():
    a = from_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    b = from_wkt("POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))")
    i = setops.intersection(a, b)
    assert algos.area(i) == 4.0
    assert to_wkt(i) == "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))"


def test_intersection_convex():
    a = from_wkt("POLYGON ((0 0, 4 0, 0 4, 0 0))")  # triangle
    b = from_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    i = setops.intersection(a, b)
    assert abs(algos.area(i) - 8.0) < 1e-9


def test_union_disjoint_and_rects():
    a = from_wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
    b = from_wkt("POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))")
    u = setops.union(a, b)
    assert u.type_id == GeometryType.MultiPolygon
    assert algos.area(u) == 2.0
    # overlapping rectangles
    a = from_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    b = from_wkt("POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))")
    u = setops.union(a, b)
    assert algos.area(u) == 16 + 16 - 4


def test_difference_rects():
    a = from_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    b = from_wkt("POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))")
    d = setops.difference(a, b)
    assert algos.area(d) == 12.0
    s = setops.symmetric_difference(a, b)
    assert algos.area(s) == 24.0


def test_union_all_identity():
    assert to_wkt(setops.union_all([])) == "GEOMETRYCOLLECTION EMPTY"
    assert to_wkt(setops.union_all([None, None])) == "GEOMETRYCOLLECTION EMPTY"


def test_union_all_rects():
    rects = [from_wkt(f"POLYGON (({i} 0, {i+2} 0, {i+2} 2, {i} 2, {i} 0))") for i in (0, 1, 4)]
    u = setops.union_all(rects)
    assert algos.area(u) == 10.0  # [0,3]x[0,2] ∪ [4,6]x[0,2]


def test_intersection_all():
    rects = [
        from_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),
        from_wkt("POLYGON ((1 1, 5 1, 5 5, 1 5, 1 1))"),
        from_wkt("POLYGON ((2 0, 6 0, 6 6, 2 6, 2 0))"),
    ]
    i = setops.intersection_all(rects)
    assert algos.area(i) == 2 * 3.0


def test_collect():
    pts = [from_wkt("POINT (0 0)"), from_wkt("POINT (1 1)")]
    c = setops.collect(pts)
    assert c.type_id == GeometryType.MultiPoint
    mixed = [from_wkt("POINT (0 0)"), from_wkt("LINESTRING (0 0, 1 1)")]
    c = setops.collect(mixed)
    assert c.type_id == GeometryType.GeometryCollection


def test_buffer_point():
    b = algos.buffer(from_wkt("POINT (0 0)"), 1.0, quad_segs=64)
    assert abs(algos.area(b) - math.pi) < 1e-2
    r = algos.buffer(from_wkt("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"), 1.0, quad_segs=64)
    assert abs(algos.area(r) - (4 + 4 * 2 + math.pi)) < 1e-2


def test_srid_preserved_through_ops():
    g = from_ewkt("SRID=4326;POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert algos.centroid(g).srid == 4326
    assert algos.convex_hull(g).srid == 4326
    assert algos.translate(g, 1, 1).srid == 4326
    i = setops.intersection(g, from_ewkt("SRID=4326;POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))"))
    assert i.srid == 4326


def test_offset_curve_joins_and_multichain():
    """r4b: offset_curve offsets EVERY chain of a MultiLineString, and the
    outside-turn join honors round (arc), mitre (limited miter), and bevel
    (straight corner) exactly on a right angle."""
    import numpy as np

    from polars_st_spark.geo import algos
    from polars_st_spark.geo.types import GeometryType
    from polars_st_spark.geo.wkt import from_wkt

    m = from_wkt("MULTILINESTRING ((0 0, 10 0), (0 5, 10 5))")
    o = algos.offset_curve(m, 1.0)
    assert o.type_id == GeometryType.MultiLineString and len(o.geoms) == 2
    assert np.allclose(o.geoms[0].coords, [[0, 1], [10, 1]])
    assert np.allclose(o.geoms[1].coords, [[0, 6], [10, 6]])

    L = from_wkt("LINESTRING (0 0, 10 0, 10 10)")
    bev = algos.offset_curve(L, -1.0, join_style="bevel")
    assert np.allclose(bev.coords, [[0, -1], [10, -1], [11, 0], [11, 10]])
    # bevel length is exact: 10 + sqrt(2) + 10
    d = np.diff(bev.coords, axis=0)
    assert np.hypot(d[:, 0], d[:, 1]).sum() == pytest.approx(20 + np.sqrt(2))
    mit = algos.offset_curve(L, -1.0, join_style="mitre")
    assert np.allclose(mit.coords, [[0, -1], [11, -1], [11, 10]])
    rnd = algos.offset_curve(L, -1.0, join_style="round", quad_segs=8)
    assert len(rnd.coords) > 5  # quarter arc inserted
    # arc points stay on the offset circle around the corner
    arc = rnd.coords[2:-2]
    assert np.allclose(np.hypot(arc[:, 0] - 10, arc[:, 1]), 1.0)
    # inside turn trims to the line intersection regardless of style
    ins = algos.offset_curve(L, 1.0, join_style="round")
    assert np.allclose(ins.coords, [[0, 1], [9, 1], [9, 10]])


def test_offset_curve_collapse_loop_excised():
    """r4c: the raw offset curve is noded against itself and collapse loops
    (retrograde portions diving closer to the source than |dist|) are
    excised — GEOS OffsetCurve post-pass. Valid curves pass unchanged."""
    import numpy as np

    from polars_st_spark.geo import algos
    from polars_st_spark.geo.predicates import _seg_intersect_kind
    from polars_st_spark.geo.wkt import from_wkt

    def n_crossings(c):
        n = len(c) - 1
        k = 0
        for i in range(n - 2):
            for j in range(i + 2, n):
                if _seg_intersect_kind(c[i], c[i + 1], c[j], c[j + 1]) == 2:
                    k += 1
        return k

    zig = from_wkt("LINESTRING (0 0, 1 1, 2 0, 3 1, 4 0)")
    src = zig.coords[:, :2]
    # offset below by more than the tooth height: the raw curve loops at the
    # valley and crosses itself twice
    raw = algos._offset_chain(src, -1.5, 8, "round", 5.0)
    assert n_crossings(raw) == 2
    out = algos.offset_curve(zig, -1.5, join_style="round")
    assert n_crossings(out.coords) == 0
    # endpoints survive the excision; the curve got strictly shorter
    assert np.allclose(out.coords[0], raw[0]) and np.allclose(out.coords[-1], raw[-1])
    assert len(out.coords) < len(raw)
    # a non-crossing offset is bit-identical to the raw chain
    ok = algos.offset_curve(zig, -0.4, join_style="round")
    raw_ok = algos._offset_chain(src, -0.4, 8, "round", 5.0)
    assert np.array_equal(ok.coords, raw_ok)
