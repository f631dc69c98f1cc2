"""General overlay engine tests: concave cases, hole creation, make_valid,
and a property test against the exact rectilinear-region algebra."""

import math
import random

import numpy as np
import pytest

from polars_st_spark.geo import algos, setops
from polars_st_spark.geo.overlay import overlay, self_union
from polars_st_spark.geo.rectregion import RectRegion, region_to_geometry
from polars_st_spark.geo.types import GeometryType
from polars_st_spark.geo.wkt import from_wkt, to_wkt


def A(g):
    return round(algos.area(g), 9)


def test_overlapping_squares():
    a = from_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    b = from_wkt("POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))")
    assert A(overlay(a, b, "intersection")) == 4.0
    assert A(overlay(a, b, "union")) == 28.0
    assert A(overlay(a, b, "difference")) == 12.0
    assert A(overlay(a, b, "symmetric_difference")) == 24.0


def test_concave_c_shape():
    c = from_wkt("POLYGON ((0 0, 4 0, 4 1, 1 1, 1 3, 4 3, 4 4, 0 4, 0 0))")
    d = from_wkt("POLYGON ((2 0, 6 0, 6 4, 2 4, 2 0))")
    assert A(overlay(c, d, "intersection")) == 4.0
    assert A(overlay(c, d, "union")) == 22.0
    assert A(overlay(c, d, "difference")) == 6.0


def test_hole_creation():
    a = from_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    inner = from_wkt("POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))")
    d = overlay(a, inner, "difference")
    assert A(d) == 15.0
    assert d.type_id == GeometryType.Polygon and len(d.rings) == 2


def test_hole_interaction():
    h = from_wkt("POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")
    s = from_wkt("POLYGON ((3 3, 8 3, 8 8, 3 8, 3 3))")
    assert A(overlay(h, s, "intersection")) == 8.0
    assert A(overlay(h, s, "union")) == 49.0
    assert A(overlay(h, s, "difference")) == 24.0


def test_triangles():
    t1 = from_wkt("POLYGON ((0 0, 4 0, 2 4, 0 0))")
    t2 = from_wkt("POLYGON ((0 4, 4 4, 2 0, 0 4))")
    i = A(overlay(t1, t2, "intersection"))
    u = A(overlay(t1, t2, "union"))
    assert abs(u - (A(t1) + A(t2) - i)) < 1e-9


def test_setops_dispatch_concave():
    """setops.intersection/union/difference must route concave pairs to the
    overlay engine instead of raising."""
    c = from_wkt("POLYGON ((0 0, 4 0, 4 1, 1 1, 1 3, 4 3, 4 4, 0 4, 0 0))")
    d = from_wkt("POLYGON ((2 0, 6 0, 6 2, 5 2, 5 1, 2 1, 2 0))")  # concave too
    i = setops.intersection(c, d)
    u = setops.union(c, d)
    df = setops.difference(c, d)
    assert abs(A(u) - (A(c) + A(d) - A(i))) < 1e-9
    assert abs(A(df) - (A(c) - A(i))) < 1e-9


def test_make_valid_bowtie():
    bt = from_wkt("POLYGON ((0 0, 2 2, 0 2, 2 0, 0 0))")
    v = algos.make_valid(bt)
    assert algos.is_valid(v)
    assert A(v) == 2.0  # two triangles of area 1 (top/bottom)


def test_property_vs_rectregion():
    """Random rectilinear multirects: overlay must equal the exact slab
    algebra for all four ops."""
    rng = random.Random(7)
    for trial in range(12):
        def rand_region(n):
            rects = []
            for _ in range(n):
                x0 = rng.randint(0, 12)
                y0 = rng.randint(0, 12)
                rects.append((float(x0), float(y0), float(x0 + rng.randint(2, 6)), float(y0 + rng.randint(2, 6))))
            r = RectRegion(rects).union(RectRegion())
            return r

        ra = rand_region(rng.randint(1, 3))
        rb = rand_region(rng.randint(1, 3))
        ga = region_to_geometry(ra)
        gb = region_to_geometry(rb)
        if ga.is_empty() or gb.is_empty():
            continue
        for op, expect in (
            ("intersection", ra.intersect(rb).area()),
            ("union", ra.union(rb).area()),
            ("difference", ra.subtract(rb).area()),
            ("symmetric_difference", ra.symmetric_difference(rb).area()),
        ):
            got = algos.area(overlay(ga, gb, op))
            assert abs(got - expect) < 1e-6, (trial, op, got, expect)
