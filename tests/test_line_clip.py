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


def test_clip_batch_bit_parity_fuzz():
    """r5 CSR batch path (ragged.clip_line_poly_batch) == scalar setops
    bytes on adversarial shapes: stars, holes, multilines, disjoint,
    covered, boundary-collinear, axis-rects (flagged), multipolygons
    (flagged), vertex touches (flagged), nulls."""
    import numpy as np

    from polars_st_spark.geo import ragged, setops as S
    from polars_st_spark.geo.types import Geometry, GeometryType
    from polars_st_spark.geo.wkb import from_ewkb, to_ewkb

    rng = np.random.RandomState(77)

    def star(cx, cy, n, rmin, rmax):
        th = np.sort(rng.uniform(0, 2 * np.pi, n))
        r = rng.uniform(rmin, rmax, n)
        ring = np.column_stack([cx + r * np.cos(th), cy + r * np.sin(th)])
        return np.vstack([ring, ring[:1]])

    lines, polys = [], []
    for i in range(400):
        m = i % 10
        cx, cy = rng.uniform(-3, 3, 2)
        if m in (0, 1, 2, 3):
            rings = [star(cx, cy, rng.randint(5, 11), 0.7, 3.0)]
            if m == 1:
                rings.append(np.ascontiguousarray(star(cx, cy, 6, 0.1, 0.3)[::-1]))
            P = Geometry(GeometryType.Polygon, rings=rings)
            L = Geometry(GeometryType.LineString,
                         coords=rng.uniform(-5, 5, (rng.randint(2, 6), 2)))
        elif m == 4:
            P = Geometry(GeometryType.Polygon, rings=[star(cx, cy, 7, 0.7, 2.5)])
            L = Geometry(GeometryType.MultiLineString, geoms=[
                Geometry(GeometryType.LineString, coords=rng.uniform(-5, 5, (3, 2))),
                Geometry(GeometryType.LineString, coords=rng.uniform(-5, 5, (2, 2)))])
        elif m == 5:
            P = Geometry(GeometryType.Polygon, rings=[star(cx + 100, cy, 6, 0.5, 1.5)])
            L = Geometry(GeometryType.MultiLineString, geoms=[
                Geometry(GeometryType.LineString, coords=rng.uniform(-2, 2, (3, 2)))])
        elif m == 6:
            P = Geometry(GeometryType.Polygon, rings=[np.array(
                [[cx-5, cy-5], [cx+5, cy-5], [cx+5.1, cy+5],
                 [cx-5, cy+5.2], [cx-5, cy-5]])])
            L = Geometry(GeometryType.LineString, coords=cx + rng.uniform(-1, 1, (4, 2)))
        elif m == 7:
            P = Geometry(GeometryType.Polygon, rings=[np.array(
                [[0, 0], [4, 0], [4, 2], [2, 2], [2, 4], [0, 4], [0, 0]],
                float) + [cx, cy]])
            L = Geometry(GeometryType.LineString,
                         coords=np.array([[-1, 0], [5, 0]], float) + [cx, cy])
        elif m == 8:
            P = Geometry(GeometryType.Polygon, rings=[np.array(
                [[0, 0], [3, 0], [3, 2], [0, 2], [0, 0]], float) + [cx, cy]])
            L = Geometry(GeometryType.LineString,
                         coords=np.array([[-1, 1], [4, 1]], float) + [cx, cy])
        else:
            P = Geometry(GeometryType.MultiPolygon, geoms=[
                Geometry(GeometryType.Polygon, rings=[star(cx, cy, 6, 0.5, 1.5)]),
                Geometry(GeometryType.Polygon, rings=[star(cx + 4, cy, 5, 0.5, 1.0)])])
            L = Geometry(GeometryType.LineString, coords=rng.uniform(-5, 8, (3, 2)))
        lines.append(to_ewkb(L))
        polys.append(to_ewkb(P))
    lines.append(None)
    polys.append(to_ewkb(Geometry(GeometryType.Polygon, rings=[star(0, 0, 5, 1, 2)])))
    vl = np.array(lines, dtype=object)
    vp = np.array(polys, dtype=object)
    for mode, fn in (("in", S.intersection), ("out", S.difference)):
        out, need = ragged.clip_line_poly_batch(vl, vp, mode)
        n_batched = 0
        for i in range(len(vl)):
            if need[i]:
                continue
            if vl[i] is None or polys[i] is None:
                assert out[i] is None
                continue
            assert out[i] == to_ewkb(fn(from_ewkb(vl[i]), from_ewkb(polys[i]))), (mode, i)
            n_batched += 1
        assert n_batched > 200  # the bulk takes the batch path


def test_clip_batch_spark_surface(spark):
    """st_intersection / st_difference column pairs hit the batch path and
    produce the closed-form concave-L clip values."""
    from pyspark.sql import functions as F

    import polars_st_spark as st

    df = spark.createDataFrame([(i, float(5 * (i % 9))) for i in range(300)],
                               ["id", "dx"])
    lshape = st.st_polygon(F.array(F.array(
        F.array(F.col("dx"), F.lit(0.0)),
        F.array(F.col("dx") + 4.0, F.lit(0.0)),
        F.array(F.col("dx") + 4.0, F.lit(2.0)),
        F.array(F.col("dx") + 2.0, F.lit(2.0)),
        F.array(F.col("dx") + 2.0, F.lit(4.0)),
        F.array(F.col("dx"), F.lit(4.0)),
        F.array(F.col("dx"), F.lit(0.0)))))
    probe = st.st_linestring(F.array(
        F.array(F.col("dx") - 1.0, F.lit(3.0)),
        F.array(F.col("dx") + 5.0, F.lit(3.0))))
    rows = df.withColumn("g", lshape).withColumn("p", probe).select(
        "id",
        st.st_length(st.st_intersection("p", "g")).alias("li"),
        st.st_length(st.st_difference("p", "g")).alias("ld"),
        st.st_geometry_type(st.st_intersection("p", "g")).alias("ti"),
    ).collect()
    for r in rows:
        assert abs(r["li"] - 2.0) < 1e-12 and abs(r["ld"] - 4.0) < 1e-12
        assert r["ti"] == "LineString"


def test_symmetric_difference_lines_noded():
    """r5: lineal symmetric difference nodes the two exclusive sides at
    mutual crossings (GEOS parity) — piece interiors never cross."""
    l1 = line([(0, 0), (4, 0)])
    l2 = line([(1, -1), (1, 1), (2, -1), (2, 1)])
    sd = S.symmetric_difference(l1, l2)
    assert abs(glen(sd) - (4.0 + glen(l2))) < 1e-9
    # every piece pair only touches at endpoints
    parts = [g for g in (sd.geoms or [sd])]
    from polars_st_spark.geo.predicates import crosses
    for i in range(len(parts)):
        for j in range(i + 1, len(parts)):
            assert not crosses(parts[i], parts[j]), (i, j)
    # collinear overlap removed from both sides
    l3 = line([(2, 0), (6, 0)])
    sd2 = S.symmetric_difference(l1, l3)
    assert abs(glen(sd2) - 4.0) < 1e-12


def test_clip_batch_swapped_order(spark):
    """r5: polygon-column ∩ line-column (swapped args) takes the batch
    path too and carries the polygon side's SRID like the scalar."""
    from pyspark.sql import functions as F

    import polars_st_spark as st

    df = spark.createDataFrame([(i, float(5 * (i % 9))) for i in range(200)],
                               ["id", "dx"])
    lshape = st.st_set_srid(st.st_polygon(F.array(F.array(
        F.array(F.col("dx"), F.lit(0.0)),
        F.array(F.col("dx") + 4.0, F.lit(0.0)),
        F.array(F.col("dx") + 4.0, F.lit(2.0)),
        F.array(F.col("dx") + 2.0, F.lit(2.0)),
        F.array(F.col("dx") + 2.0, F.lit(4.0)),
        F.array(F.col("dx"), F.lit(4.0)),
        F.array(F.col("dx"), F.lit(0.0))))), 3857)
    probe = st.st_linestring(F.array(
        F.array(F.col("dx") - 1.0, F.lit(3.0)),
        F.array(F.col("dx") + 5.0, F.lit(3.0))))
    rows = df.withColumn("g", lshape).withColumn("p", probe).select(
        "id",
        st.st_length(st.st_intersection("g", "p")).alias("li"),
        st.st_srid(st.st_intersection("g", "p")).alias("srid"),
    ).collect()
    for r in rows:
        assert abs(r["li"] - 2.0) < 1e-12
        assert r["srid"] == 3857   # scalar propagates the FIRST arg's srid
