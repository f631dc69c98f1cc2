"""General lineal×areal / lineal×lineal clipping (geo/setops.py r5 —
closes the VERDICT r4 line ∩/− concave polygon gap).

Cross-checks: the length identity len(A∩P) + len(A−P) == len(A) holds for
ANY polygon since ∩ keeps the closed region and − its strict complement;
for rectilinear concave polygons the difference path runs the EXACT
region-complement clipper while ∩ runs the new split-and-classify kernel,
so the identity cross-validates the two independent implementations.
"""

import numpy as np
import pytest

from polars_st_spark.geo import setops as S
from polars_st_spark.geo.algos import area as garea, length as glen
from polars_st_spark.geo.types import Geometry, GeometryType
from polars_st_spark.geo.wkt import to_wkt


def poly(pts, holes=()):
    rings = [np.array(pts + [pts[0]], float)]
    for h in holes:
        rings.append(np.array(list(h) + [h[0]], float))
    return Geometry(GeometryType.Polygon, rings=rings)


def line(pts):
    return Geometry(GeometryType.LineString, coords=np.array(pts, float))


L_SHAPE = poly([(0, 0), (4, 0), (4, 2), (2, 2), (2, 4), (0, 4)])


def test_concave_clip_closed_forms():
    a = line([(-1, 1), (5, 1)])      # bottom arm: full width
    b = line([(-1, 3), (5, 3)])      # top arm: left half only
    assert abs(glen(S.intersection(a, L_SHAPE)) - 4.0) < 1e-12
    assert abs(glen(S.difference(a, L_SHAPE)) - 2.0) < 1e-12
    assert abs(glen(S.intersection(b, L_SHAPE)) - 2.0) < 1e-12
    assert abs(glen(S.difference(b, L_SHAPE)) - 4.0) < 1e-12


def test_boundary_collinear_run():
    # along the bottom edge: in the CLOSED polygon, not in the complement
    g = line([(-1, 0), (5, 0)])
    assert abs(glen(S.intersection(g, L_SHAPE)) - 4.0) < 1e-12
    assert abs(glen(S.difference(g, L_SHAPE)) - 2.0) < 1e-12


def test_vertex_touch_gives_point():
    t = line([(5, 1), (3, 3)])  # grazes the corner vertex (4, 2)
    r = S.intersection(t, L_SHAPE)
    assert to_wkt(r) == "POINT (4 2)"
    d = S.difference(t, L_SHAPE)
    assert abs(glen(d) - glen(t)) < 1e-12


def test_holed_polygon_clip():
    holed = poly([(0, 0), (6, 0), (6, 6), (0, 6)],
                 holes=[[(2, 2), (4, 2), (4, 4), (2, 4)]])
    g = line([(-1, 3), (7, 3)])
    assert abs(glen(S.intersection(g, holed)) - 4.0) < 1e-12
    # the hole span counts as outside
    assert abs(glen(S.difference(g, holed)) - 4.0) < 1e-12


def test_multilinestring_and_multipolygon_clip():
    ml = Geometry(GeometryType.MultiLineString, geoms=[
        line([(-1, 1), (5, 1)]), line([(-1, 3), (5, 3)])])
    i = S.intersection(ml, L_SHAPE)
    assert abs(glen(i) - 6.0) < 1e-12
    mp = Geometry(GeometryType.MultiPolygon, geoms=[
        L_SHAPE, poly([(10, 0), (12, 0), (12, 4), (10, 4)])])
    g = line([(-1, 1), (13, 1)])
    assert abs(glen(S.intersection(g, mp)) - 6.0) < 1e-12
    assert abs(glen(S.difference(g, mp)) - 8.0) < 1e-12


def test_line_minus_line_and_union():
    l1 = line([(0, 0), (4, 0)])
    l2 = line([(1, 0), (2, 0)])
    d = S.difference(l1, l2)
    assert to_wkt(d) == "MULTILINESTRING ((0 0, 1 0), (2 0, 4 0))"
    # crossing lines: difference keeps everything, union nodes
    l3 = line([(1, -1), (1, 1)])
    assert abs(glen(S.difference(l1, l3)) - 4.0) < 1e-12
    u = S.union(l1, l3)
    assert abs(glen(u) - 6.0) < 1e-12
    # overlapping collinear union dissolves the common run
    u2 = S.union(l1, line([(2, 0), (6, 0)]))
    assert abs(glen(u2) - 6.0) < 1e-12


def test_union_line_with_concave_polygon():
    a = line([(-1, 3), (5, 3)])
    u = S.union(a, L_SHAPE)
    assert abs(garea(u) - 12.0) < 1e-12
    # linework outside the polygon: [-1,0] and [2,5] at y=3 -> 1 + 3
    lines = [g for g in (u.geoms or []) if g.dimensions() == 1]
    assert abs(sum(glen(g) for g in lines) - 4.0) < 1e-12


def _random_star(rng, cx, cy, n, rmin, rmax):
    th = np.sort(rng.uniform(0, 2 * np.pi, n))
    r = rng.uniform(rmin, rmax, n)
    pts = [(cx + ri * np.cos(t), cy + ri * np.sin(t)) for t, ri in zip(th, r)]
    return poly(pts)


def test_random_concave_length_identity():
    """len(A∩P) + len(A−P) == len(A) for random star-shaped (often concave)
    polygons and random probe lines — the two kernels partition the line."""
    rng = np.random.RandomState(23)
    for trial in range(40):
        P = _random_star(rng, 0, 0, rng.randint(5, 12), 0.5, 3.0)
        pts = rng.uniform(-4, 4, size=(rng.randint(2, 5), 2))
        A = line([tuple(p) for p in pts])
        i = S.intersection(A, P)
        d = S.difference(A, P)
        li = sum(glen(g) for g in ([i] if i.geoms is None else i.geoms)
                 if g.dimensions() >= 1) if not i.is_empty() else 0.0
        ld = glen(d) if not d.is_empty() else 0.0
        assert abs((li + ld) - glen(A)) < 1e-9, (trial, to_wkt(P), to_wkt(A))


def test_rectilinear_concave_cross_validation():
    """For rectilinear concave polygons the − path uses the exact region
    algebra while ∩ uses the new kernel — their lengths must partition."""
    rng = np.random.RandomState(7)
    staircase = poly([(0, 0), (6, 0), (6, 2), (4, 2), (4, 4), (2, 4),
                      (2, 6), (0, 6)])
    for trial in range(25):
        pts = rng.uniform(-2, 8, size=(3, 2))
        A = line([tuple(p) for p in pts])
        i = S.intersection(A, staircase)
        d = S.difference(A, staircase)
        li = sum(glen(g) for g in ([i] if i.geoms is None else i.geoms)
                 if g.dimensions() >= 1) if not i.is_empty() else 0.0
        ld = glen(d) if not d.is_empty() else 0.0
        assert abs((li + ld) - glen(A)) < 1e-9, trial


def test_symmetric_difference_line_polygon():
    a = line([(-1, 3), (5, 3)])
    sd = S.symmetric_difference(a, L_SHAPE)
    assert abs(garea(sd) - 12.0) < 1e-12
    lines = [g for g in (sd.geoms or []) if g.dimensions() == 1]
    assert abs(sum(glen(g) for g in lines) - 4.0) < 1e-12


def test_spark_column_surface(spark):
    """st_intersection/st_difference columns over a concave polygon —
    the operator path a real query takes."""
    from pyspark.sql import functions as F

    import polars_st_spark as st

    df = spark.createDataFrame([(i, float(i)) for i in range(8)], ["id", "dx"])
    lshape = st.st_polygon(F.array(F.array(
        F.array(F.col("dx") + 0.0, F.lit(0.0)),
        F.array(F.col("dx") + 4.0, F.lit(0.0)),
        F.array(F.col("dx") + 4.0, F.lit(2.0)),
        F.array(F.col("dx") + 2.0, F.lit(2.0)),
        F.array(F.col("dx") + 2.0, F.lit(4.0)),
        F.array(F.col("dx") + 0.0, F.lit(4.0)),
        F.array(F.col("dx") + 0.0, F.lit(0.0)))))
    probe = st.st_linestring(F.array(
        F.array(F.col("dx") - 1.0, F.lit(3.0)),
        F.array(F.col("dx") + 5.0, F.lit(3.0))))
    rows = df.select(
        "id",
        st.st_length(st.st_intersection(probe, lshape)).alias("li"),
        st.st_length(st.st_difference(probe, lshape)).alias("ld"),
    ).collect()
    for r in rows:
        assert abs(r["li"] - 2.0) < 1e-12 and abs(r["ld"] - 4.0) < 1e-12
