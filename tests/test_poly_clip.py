"""Polygon × polygon batch clip (geo/shclip.py): bit parity with the
scalar setops dispatch, and the Spark column surface.

Reference operator surface: polars-st src/functions.rs:1096-1192
(intersection / difference Expr ops)."""
import numpy as np
import pytest

from polars_st_spark.geo import setops as S
from polars_st_spark.geo import shclip
from polars_st_spark.geo.types import Geometry, GeometryType
from polars_st_spark.geo.wkb import from_ewkb, to_ewkb


def _poly(rings, srid=0):
    return Geometry(GeometryType.Polygon, srid=srid,
                    rings=[np.asarray(r, dtype=float) for r in rings])


def _hexagon(cx, cy, r, cw=False, rot=0.0):
    ang = rot + np.arange(7) * (np.pi / 3)
    pts = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], 1)
    return pts[::-1] if cw else pts


def _rect(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]],
                    dtype=float)


def _star(rng, cx, cy, n, rmin, rmax):
    th = np.sort(rng.uniform(0, 2 * np.pi, n))
    r = rng.uniform(rmin, rmax, n)
    ring = np.column_stack([cx + r * np.cos(th), cy + r * np.sin(th)])
    return np.vstack([ring, ring[:1]])


def _pairs(seed):
    rng = np.random.RandomState(seed)
    pairs = []
    for i in range(260):
        m = i % 13
        cx, cy = rng.uniform(-50, 50, 2)
        r = rng.uniform(0.5, 3.0)
        if m in (0, 1):       # convex × convex overlapping, mixed winding
            a = _hexagon(cx, cy, r, cw=bool(m))
            b = _hexagon(cx + rng.uniform(0, r), cy, r, cw=bool(rng.randint(2)))
        elif m == 2:          # shared edge (adjacent hex-grid cells)
            a = _hexagon(cx, cy, r)
            b = _hexagon(cx + r * np.sqrt(3), cy, r, rot=np.pi / 6)
        elif m == 3:          # identical polygons
            a = _hexagon(cx, cy, r)
            b = a.copy()
        elif m == 4:          # concave star subject × convex clip
            a = _star(rng, cx, cy, rng.randint(6, 12), 0.4 * r, 2 * r)
            b = _hexagon(cx + 0.3 * r, cy, r)
        elif m == 5:          # convex a, concave b (swapped SH roles)
            a = _hexagon(cx, cy, r)
            b = _star(rng, cx + 0.3 * r, cy, 9, 0.4 * r, 2 * r)
        elif m == 6:          # holed subject × convex clip
            a_rings = [_hexagon(cx, cy, 2 * r),
                       np.ascontiguousarray(_hexagon(cx, cy, 0.5 * r)[::-1])]
            pairs.append((_poly(a_rings), _poly([_hexagon(cx + r, cy, r)])))
            continue
        elif m == 7:          # disjoint
            a = _hexagon(cx, cy, r)
            b = _hexagon(cx + 10 * r, cy, r)
        elif m == 8:          # contained
            a = _hexagon(cx, cy, 3 * r)
            b = _hexagon(cx, cy, 0.5 * r)
        elif m == 9:          # rect × rect (region algebra -> flagged)
            a = _rect(cx, cy, cx + 2, cy + 2)
            b = _rect(cx + 1, cy + 1, cx + 3, cy + 3)
        elif m == 10:         # concave × concave (overlay -> flagged)
            a = _star(rng, cx, cy, 8, 0.5 * r, 2 * r)
            b = _star(rng, cx + 0.2 * r, cy, 8, 0.5 * r, 2 * r)
        elif m == 11:         # MultiPolygon side (flagged)
            pairs.append((Geometry(GeometryType.MultiPolygon, geoms=[
                _poly([_hexagon(cx, cy, r)]),
                _poly([_hexagon(cx + 5 * r, cy, r)])]),
                _poly([_hexagon(cx + 0.4 * r, cy, r)])))
            continue
        else:                 # large coords (cancellation zone)
            cx = rng.uniform(1e6, 2e6)
            a = _hexagon(cx, cy, 50.0, cw=bool(rng.randint(2)))
            b = _hexagon(cx + rng.uniform(0, 40), cy, 60.0)
        pairs.append((_poly([a]), _poly([b])))
    pairs.append((_poly([]), _poly([_rect(0, 0, 1, 1)])))   # empty a
    pairs.append((_poly([_rect(0, 0, 1, 1)]), _poly([])))   # empty b
    return pairs


@pytest.mark.parametrize("seed", [7, 19])
def test_poly_clip_batch_bit_parity_fuzz(seed):
    pairs = _pairs(seed)
    va = np.array([to_ewkb(a) for a, _ in pairs] + [None], dtype=object)
    vb = np.array([to_ewkb(b) for _, b in pairs]
                  + [to_ewkb(_poly([_rect(0, 0, 1, 1)]))], dtype=object)
    for mode, fn in (("in", S.intersection), ("out", S.difference)):
        out, need = shclip.clip_poly_poly_batch(va, vb, mode)
        n_batched = 0
        for i in range(len(va)):
            if need[i]:
                continue
            if va[i] is None or vb[i] is None:
                assert out[i] is None
                continue
            assert out[i] == to_ewkb(fn(from_ewkb(va[i]), from_ewkb(vb[i]))), \
                (mode, i)
            n_batched += 1
        assert n_batched > (150 if mode == "in" else 20)


def test_poly_clip_flags_match_scalar_dispatch():
    """Flagged rows are exactly the scalar's non-SH destinations; SH rows
    include holed, concave-one-side, CW, shared-edge, contained shapes."""
    pairs = _pairs(3)
    va = np.array([to_ewkb(a) for a, _ in pairs], dtype=object)
    vb = np.array([to_ewkb(b) for _, b in pairs], dtype=object)
    out, need = shclip.clip_poly_poly_batch(va, vb, "in")
    # multipolygon / rect×rect / concave×concave rows must be flagged
    for i in range(len(pairs)):
        a, b = pairs[i]
        if a.type_id == GeometryType.MultiPolygon:
            assert need[i]


def test_poly_clip_spark_surface(spark):
    """st_intersection / st_difference on polygon pair columns: batch path
    end-to-end with closed-form areas (square ∩ half-offset diamond = the
    triangle of area 4; disjoint difference passes the square through)."""
    from pyspark.sql import functions as F

    import polars_st_spark as st

    df = spark.createDataFrame([(i, float(10 * (i % 11))) for i in range(300)],
                               ["id", "dx"])
    square = st.st_polygon(F.array(F.array(
        F.array(F.col("dx") + 0.0, F.lit(0.0)),
        F.array(F.col("dx") + 4.0, F.lit(0.0)),
        F.array(F.col("dx") + 4.0, F.lit(4.0)),
        F.array(F.col("dx") + 0.0, F.lit(4.0)),
        F.array(F.col("dx") + 0.0, F.lit(0.0)))))
    diamond = st.st_polygon(F.array(F.array(
        F.array(F.col("dx") + 2.0, F.lit(2.0)),
        F.array(F.col("dx") + 4.0, F.lit(0.0)),
        F.array(F.col("dx") + 6.0, F.lit(2.0)),
        F.array(F.col("dx") + 4.0, F.lit(4.0)),
        F.array(F.col("dx") + 2.0, F.lit(2.0)))))
    far = st.st_polygon(F.array(F.array(
        F.array(F.col("dx") + 100.0, F.lit(0.0)),
        F.array(F.col("dx") + 101.0, F.lit(0.0)),
        F.array(F.col("dx") + 100.5, F.lit(1.0)),
        F.array(F.col("dx") + 100.0, F.lit(0.0)))))
    rows = df.select(
        st.st_area(st.st_intersection(square, diamond)).alias("ai"),
        st.st_area(st.st_difference(square, far)).alias("ad"),
        st.st_is_empty(st.st_intersection(square, far)).alias("disj"),
    ).collect()
    for r in rows:
        assert abs(r["ai"] - 4.0) < 1e-9
        assert abs(r["ad"] - 16.0) < 1e-12
        assert r["disj"] is True


def test_difference_lower_dim_passthrough():
    """st_difference with a uniformly lower-dimensional right side passes
    the left bytes through verbatim; degenerate (zero-measure) left rows
    are flagged back to the scalar (a sliver ON the line IS covered)."""
    rng = np.random.default_rng(3)
    A, B = [], []
    for i in range(60):
        cx, cy = rng.uniform(-100, 100, 2)
        A.append(_poly([_hexagon(cx, cy, 3)]))
        B.append(Geometry(GeometryType.LineString,
                          coords=np.array([[cx - 5, cy], [cx + 5, cy]],
                                          dtype=float)))
    va = np.array([to_ewkb(a) for a in A] + [None], dtype=object)
    vb = np.array([to_ewkb(b) for b in B]
                  + [to_ewkb(B[0])], dtype=object)
    out, need = shclip.difference_lower_dim_batch(va, vb)
    assert not need.any()
    assert out[-1] is None
    for i in range(60):
        assert out[i] == va[i]
        assert out[i] == to_ewkb(S.difference(A[i], B[i]))
    # zero-area sliver lying exactly on the line: covered -> scalar flag
    sl = _poly([np.array([[0, 0], [5, 0], [5, 0], [0, 0]], dtype=float)])
    ln = Geometry(GeometryType.LineString,
                  coords=np.array([[-1, 0], [6, 0]], dtype=float))
    out, need = shclip.difference_lower_dim_batch(
        np.array([to_ewkb(sl)], dtype=object),
        np.array([to_ewkb(ln)], dtype=object))
    assert need[0]


def test_union_symdiff_disjoint_lane():
    """st_union / st_symmetric_difference disjoint Polygon pairs collect
    to MultiPolygon(a, b) whole-batch, bit-identical to the scalar;
    intersecting / touching / Multi / (union) rect-rect rows are flagged
    back to the scalar."""
    rng = np.random.default_rng(11)
    A, B = [], []
    for i in range(140):
        cx, cy = rng.uniform(-1e4, 1e4, 2)
        r = rng.uniform(1, 50)
        k = i % 7
        if k == 0:
            A.append(_poly([_hexagon(cx, cy, r, cw=bool(rng.integers(2)))]))
            B.append(_poly([_hexagon(cx + 5 * r, cy, r)]))
        elif k == 1:
            A.append(_poly([_hexagon(cx, cy, r),
                            _hexagon(cx, cy, 0.3 * r)[::-1]]))
            B.append(_poly([_hexagon(cx + 5 * r, cy, r)]))
        elif k == 2:
            A.append(_poly([_hexagon(cx, cy, r)]))
            B.append(_poly([_hexagon(cx + 0.5 * r, cy, r)]))
        elif k == 3:
            A.append(_poly([_rect(cx, cy, cx + 2, cy + 2)]))
            B.append(_poly([_rect(cx + 2, cy, cx + 4, cy + 2)]))
        elif k == 4:
            A.append(_poly([_rect(cx, cy, cx + 2, cy + 2)]))
            B.append(_poly([_rect(cx + 5, cy, cx + 7, cy + 2)]))
        elif k == 5:
            A.append(Geometry(GeometryType.MultiPolygon, geoms=[
                _poly([_hexagon(cx, cy, r)]),
                _poly([_hexagon(cx + 4 * r, cy, r)])]))
            B.append(_poly([_hexagon(cx + 10 * r, cy, r)]))
        else:
            A.append(_poly([]))
            B.append(_poly([_hexagon(cx, cy, r)]))
    va = np.array([to_ewkb(g) for g in A], dtype=object)
    vb = np.array([to_ewkb(g) for g in B], dtype=object)
    for op, fn in (("union", S.union), ("symdiff", S.symmetric_difference)):
        out, need = shclip.union_symdiff_disjoint_batch(va, vb, op)
        nfast = 0
        for i in range(len(va)):
            if need[i]:
                continue
            assert out[i] == to_ewkb(fn(from_ewkb(va[i]), from_ewkb(vb[i]))), \
                (op, i)
            nfast += 1
        assert nfast > 50
