"""Rings stored open (first != last in the final ulp — e.g. trig-generated
hexagons where cos(2π) != cos(0) bitwise) must locate/intersect/clip
exactly like the scalar path, which closes them via ``_closed`` /
``np.roll``. Regression for the r5 wrap-edge fix: the CSR kernels used to
enumerate only consecutive stored segments and silently missed the closing
edge, flipping ray-cast parity on knife-edge probes (found via a contained
hexagon pair at ~1.3e6 coordinates that pairs_intersect called disjoint).
"""
import numpy as np

from polars_st_spark.geo import predicates as P
from polars_st_spark.geo import ragged as RG
from polars_st_spark.geo import setops as S
from polars_st_spark.geo.types import Geometry, GeometryType
from polars_st_spark.geo.wkb import from_ewkb, to_ewkb


def _hexagon(cx, cy, r, cw=False, rot=0.0):
    ang = rot + np.arange(7) * (np.pi / 3)
    pts = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], 1)
    return pts[::-1] if cw else pts


def _poly(rings):
    return Geometry(GeometryType.Polygon,
                    rings=[np.asarray(r, dtype=float) for r in rings])


def _batch(seed=123, n=200):
    rng = np.random.default_rng(seed)
    As, Bs = [], []
    for i in range(n):
        cx, cy = rng.uniform(-1e6, 2e6, 2)
        r = rng.uniform(1, 100)
        a = _hexagon(cx, cy, r, cw=bool(rng.integers(2)),
                     rot=float(rng.uniform(0, np.pi)))
        k = i % 5
        if k == 0:
            b = _hexagon(cx + rng.uniform(0, r), cy, r)
        elif k == 1:
            b = _hexagon(cx, cy, r * 0.4)
        elif k == 2:
            b = _hexagon(cx + r * np.sqrt(3), cy, r, rot=np.pi / 6)
        elif k == 3:
            b = _hexagon(cx + 5 * r, cy, r)
        else:
            b = _hexagon(cx + 2 * r, cy, r)
        if rng.integers(3) == 0:
            As.append(to_ewkb(_poly([a, _hexagon(cx, cy, r * 0.3)[::-1]])))
        else:
            As.append(to_ewkb(_poly([a])))
        Bs.append(to_ewkb(_poly([b])))
    va = np.array(As, dtype=object)
    vb = np.array(Bs, dtype=object)
    return va, vb


def test_unclosed_ring_regression_case():
    """The original failing pair: contained hexagons at 1.3e6 whose probe
    y sits within an ulp of the ring-start y — the wrap edge decides."""
    a = _poly([_hexagon(1310735.7557269228, -31.516249662912465, 50.0)])
    b = _poly([_hexagon(1310736.3548948292, -31.516249662912465, 60.0)])
    assert P.intersects(a, b)
    ra = RG.parse_polygonal(np.array([to_ewkb(a)], dtype=object))
    rb = RG.parse_polygonal(np.array([to_ewkb(b)], dtype=object))
    assert RG.pairs_intersect(ra, rb)[0]


def test_unclosed_ring_pair_predicates_parity():
    va, vb = _batch()
    ra = RG.parse_polygonal(va)
    rb = RG.parse_polygonal(vb)
    ga = [from_ewkb(bytes(x)) for x in va]
    gb = [from_ewkb(bytes(x)) for x in vb]
    inter = RG.pairs_intersect(ra, rb)
    assert (inter == np.array([P.intersects(a, b)
                               for a, b in zip(ga, gb)])).all()
    for vecfn, scafn in ((RG.pairs_within, P.within),
                         (RG.pairs_touches, P.touches),
                         (RG.pairs_crosses, P.crosses),
                         (RG.pairs_overlaps, P.overlaps)):
        vec, dec = vecfn(ra, rb)
        sca = np.array([scafn(a, b) for a, b in zip(ga, gb)])
        assert not (dec & (vec != sca)).any()
        assert dec.sum() > len(ga) * 0.8  # the kernel still decides
    mats, dec = RG.pairs_relate(ra, rb)
    for i in np.nonzero(dec)[0]:
        if mats[i] is not None:
            assert str(mats[i]) == P.relate(ga[i], gb[i])


def test_unclosed_ring_locate_parity():
    va, vb = _batch(seed=9)
    ra = RG.parse_polygonal(va)
    gb = [from_ewkb(bytes(x)) for x in vb]
    ga = [from_ewkb(bytes(x)) for x in va]
    pxs = np.array([g.rings[0][0][0] for g in gb])
    pys = np.array([g.rings[0][0][1] for g in gb])
    loc_v = RG.locate_points(ra, pxs, pys)
    loc_s = np.array([P.point_in_polygon(np.array([x, y]), g.rings)
                      for x, y, g in zip(pxs, pys, ga)])
    assert (loc_v == loc_s).all()
    loc_m = RG.locate_points_multi(ra, pxs, pys, np.arange(len(pxs)))
    assert (loc_m == loc_s).all()


def test_unclosed_ring_clip_parity():
    rng = np.random.default_rng(55)
    L, Pv = [], []
    for i in range(150):
        cx, cy = rng.uniform(-1e5, 1e5, 2)
        r = rng.uniform(1, 50)
        rings = [_hexagon(cx, cy, r, rot=float(rng.uniform(0, np.pi)))]
        if i % 4 == 0:
            rings.append(_hexagon(cx, cy, 0.3 * r)[::-1])
        Pv.append(to_ewkb(_poly(rings)))
        npts = rng.integers(2, 6)
        line = np.stack([cx + rng.uniform(-2 * r, 2 * r, npts),
                         cy + rng.uniform(-2 * r, 2 * r, npts)], 1)
        if i % 5 == 0:
            line = np.vstack([rings[0][0], rings[0][3], line[:1]])
        L.append(to_ewkb(Geometry(GeometryType.LineString, coords=line)))
    vl = np.array(L, dtype=object)
    vp = np.array(Pv, dtype=object)
    for mode, fn in (("in", S.intersection), ("out", S.difference)):
        out, need = RG.clip_line_poly_batch(vl, vp, mode)
        for i in range(len(vl)):
            if need[i]:
                continue
            assert out[i] == to_ewkb(
                fn(from_ewkb(bytes(vl[i])), from_ewkb(bytes(vp[i])))), (mode, i)
