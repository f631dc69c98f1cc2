"""r12: clip_rect_const_batch byte parity with the scalar clip_by_rect.

The batch lane must produce bit-identical EWKB to the per-row scalar for
every row it claims (and flag exactly the rows the scalar handles
differently), over a grid of subject shapes x clip positions including
edge/corner touches, containment, disjoint, holes, concave subjects and
degenerate clip rects."""

import numpy as np
import pytest

from polars_st_spark.geo import setops, shclip
from polars_st_spark.geo.types import Geometry, GeometryType
from polars_st_spark.geo.wkb import from_ewkb, to_ewkb


def _poly(*rings, srid=0):
    return Geometry(
        GeometryType.Polygon, srid=srid,
        rings=[np.asarray(r, dtype=np.float64) for r in rings])


def _rect_ring(x0, y0, x1, y1):
    return [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]


SUBJECTS = [
    _poly(_rect_ring(0, 0, 10, 10)),                       # plain rect
    _poly(_rect_ring(2, 2, 4, 4)),                         # small rect
    _poly([(0, 0), (10, 0), (5, 9), (0, 0)]),              # triangle
    _poly([(0, 0), (10, 0), (10, 10), (5, 5), (0, 10), (0, 0)]),  # concave
    _poly(_rect_ring(0, 0, 10, 10), _rect_ring(3, 3, 6, 6)),      # holed
    _poly(_rect_ring(0, 0, 10, 10), srid=4326),            # srid carrier
]

CLIPS = [
    (-1, -1, 11, 11),   # contains subject
    (2, 2, 8, 8),       # strict inside
    (5, -1, 15, 11),    # half overlap
    (-5, -5, 0, 0),     # corner touch at (0,0)
    (10, 0, 20, 10),    # edge touch at x=10
    (20, 20, 30, 30),   # disjoint
    (3, 3, 6, 6),       # exactly the hole
    (4, 4, 5, 5),       # inside the hole
    (5, 5, 5, 9),       # degenerate clip (zero width)
    (0, 0, 10, 5),      # bottom half
]


def test_batch_vs_scalar_full_grid():
    for cx0, cy0, cx1, cy1 in CLIPS:
        # one batch per clip config: all subjects share one SRID lane run
        for srid_group in (0, 4326):
            subs = [g for g in SUBJECTS if g.srid == srid_group]
            if not subs:
                continue
            vals = np.array([to_ewkb(g) for g in subs], dtype=object)
            got = shclip.clip_rect_const_batch(vals, cx0, cy0, cx1, cy1)
            assert got is not None
            out, need = got
            assert not need.any()  # plain polygons all take the lane
            for i, g in enumerate(subs):
                exp = to_ewkb(setops.clip_by_rect(g, cx0, cy0, cx1, cy1))
                assert bytes(out[i]) == bytes(exp), (
                    f"clip=({cx0},{cy0},{cx1},{cy1}) subject#{i}")


def test_batch_flags_and_nulls():
    multi = Geometry(
        GeometryType.MultiPolygon, srid=0,
        geoms=[_poly(_rect_ring(0, 0, 2, 2)), _poly(_rect_ring(5, 5, 7, 7))])
    empty = Geometry(GeometryType.Polygon, srid=0, rings=[])
    vals = np.array(
        [to_ewkb(SUBJECTS[0]), None, to_ewkb(multi), to_ewkb(empty)],
        dtype=object)
    got = shclip.clip_rect_const_batch(vals, 1, 1, 6, 6)
    assert got is not None
    out, need = got
    assert out[1] is None and not need[1]          # null passes through
    assert need[2] and need[3]                     # Multi + empty -> scalar
    exp0 = to_ewkb(setops.clip_by_rect(SUBJECTS[0], 1, 1, 6, 6))
    assert bytes(out[0]) == bytes(exp0)


def test_spark_clip_by_rect_end_to_end(spark):
    import polars_st_spark as st
    from pyspark.sql import functions as F

    df = spark.range(0, 300).select(
        F.col("id"),
        (F.col("id") % 20).cast("double").alias("x0"),
        (F.col("id") % 11).cast("double").alias("y0"),
    )
    df = df.select(
        "id", st.st_rectangle(
            "x0", "y0", F.col("x0") + 3.0, F.col("y0") + 3.0).alias("g"))
    rows = df.select(
        "id", st.st_clip_by_rect("g", 5.0, 2.0, 15.0, 9.0).alias("c"),
        "g").collect()
    for r in rows:
        exp = to_ewkb(setops.clip_by_rect(
            from_ewkb(bytes(r.g)), 5.0, 2.0, 15.0, 9.0))
        assert bytes(r.c) == bytes(exp)
