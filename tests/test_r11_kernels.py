"""r11 optimization kernels: parity tests.

1. ``geo.arrowwkb.uniform_batch_pa`` must return byte-identical results to
   ``geo.wkb.batch_uniform`` (the pandas-era parser) on every batch shape —
   the arrow_udf fast lanes dispatch on its output.
2. ``functions.predicate._rect_relate_mats`` (closed-form rect×rect DE-9IM)
   must equal the scalar ``geo.predicates.relate`` for every axis-interval
   configuration (13×13 Allen-relation grid plus containment/equality and
   degenerate shapes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from polars_st_spark.functions.predicate import _rect_relate_mats
from polars_st_spark.geo import predicates as P
from polars_st_spark.geo.arrowwkb import uniform_batch_pa
from polars_st_spark.geo.types import Geometry, GeometryType
from polars_st_spark.geo.wkb import batch_uniform, to_ewkb


def _pt(x, y, srid=0):
    return to_ewkb(Geometry(GeometryType.Point, srid=srid,
                            coords=np.array([x, y], dtype=np.float64)))


def _rect(x0, y0, x1, y1, srid=0):
    ring = np.array(
        [[x0, y0], [x0, y1], [x1, y1], [x1, y0], [x0, y0]], dtype=np.float64)
    return to_ewkb(Geometry(GeometryType.Polygon, srid=srid, rings=[ring]))


def _ring(coords, srid=0):
    return to_ewkb(Geometry(GeometryType.Polygon, srid=srid,
                            rings=[np.array(coords, dtype=np.float64)]))


def _line(coords, srid=0):
    return to_ewkb(Geometry(GeometryType.LineString, srid=srid,
                            coords=np.array(coords, dtype=np.float64)))


def _assert_same(bufs):
    """uniform_batch_pa(arrow array of bufs) vs batch_uniform(Series).

    uniform_batch_pa may accept a SUPERSET of batch_uniform's envelope
    (e.g. 4-point no-SRID rings, which batch_uniform's length guard
    assumes a 9-byte header for) — when it accepts a batch the pandas
    parser declined, the parsed coordinates must equal the per-row
    decode; when both accept, results must be identical."""
    from polars_st_spark.geo.wkb import from_ewkb

    ref = batch_uniform(pd.Series(bufs, dtype=object)) if None not in bufs \
        else None
    got = uniform_batch_pa(pa.array(bufs, type=pa.binary()))
    if ref is None:
        if got is None:
            return
        # superset acceptance: verify against the scalar decoder
        if got[0] == "point2d":
            for i, b in enumerate(bufs):
                g = from_ewkb(b)
                assert (g.coords[0], g.coords[1]) == (got[1][i], got[2][i])
        else:
            for i, b in enumerate(bufs):
                g = from_ewkb(b)
                np.testing.assert_array_equal(np.asarray(got[1][i]), g.rings[0])
        return
    assert got is not None and got[0] == ref[0]
    if ref[0] == "point2d":
        np.testing.assert_array_equal(np.asarray(got[1]), ref[1])
        np.testing.assert_array_equal(np.asarray(got[2]), ref[2])
    else:
        np.testing.assert_array_equal(np.asarray(got[1]), ref[1])
        assert got[2] == ref[2]


class TestUniformBatchPa:
    def test_points(self):
        _assert_same([_pt(1.5, -2.0), _pt(0.0, 3.25), _pt(7.0, 7.0)])

    def test_points_srid(self):
        _assert_same([_pt(1.0, 2.0, srid=4326), _pt(3.0, 4.0, srid=4326)])

    def test_points_mixed_srid_falls_back(self):
        # differing structural prefix → both parsers decline
        got = uniform_batch_pa(pa.array(
            [_pt(1.0, 2.0, srid=4326), _pt(3.0, 4.0, srid=3857)],
            type=pa.binary()))
        assert got is None

    def test_rects(self):
        _assert_same([_rect(0, 0, 2, 3), _rect(1, 1, 5, 9), _rect(-4, -4, -1, -2)])

    def test_rects_srid(self):
        _assert_same([_rect(0, 0, 2, 3, srid=32610), _rect(1, 1, 5, 9, srid=32610)])

    def test_nonrect_rings(self):
        tri = _ring([[0, 0], [4, 0], [2, 3], [0, 0]])
        tri2 = _ring([[1, 1], [5, 1], [3, 4], [1, 1]])
        _assert_same([tri, tri2])

    def test_ring_vertex_count_mismatch(self):
        _assert_same([_rect(0, 0, 2, 3), _ring([[0, 0], [4, 0], [2, 3], [0, 0]])])

    def test_mixed_types(self):
        _assert_same([_pt(0, 0), _rect(0, 0, 1, 1)])

    def test_lines_decline(self):
        _assert_same([_line([[0, 0], [1, 1]]), _line([[2, 2], [3, 3]])])

    def test_nulls_decline(self):
        got = uniform_batch_pa(pa.array([_pt(0, 0), None], type=pa.binary()))
        assert got is None

    def test_empty_batch(self):
        assert uniform_batch_pa(pa.array([], type=pa.binary())) is None

    def test_sliced_array(self):
        arr = pa.array([_pt(9, 9), _pt(1, 2), _pt(3, 4)], type=pa.binary())
        got = uniform_batch_pa(arr.slice(1, 2))
        assert got is not None and got[0] == "point2d"
        np.testing.assert_array_equal(np.asarray(got[1]), [1.0, 3.0])
        np.testing.assert_array_equal(np.asarray(got[2]), [2.0, 4.0])

    def test_large_binary(self):
        arr = pa.array([_pt(1, 2), _pt(3, 4)], type=pa.large_binary())
        got = uniform_batch_pa(arr)
        assert got is not None and got[0] == "point2d"
        np.testing.assert_array_equal(np.asarray(got[1]), [1.0, 3.0])


def _boxes_of(rects):
    a = np.array(rects, dtype=np.float64)
    return (a[:, 0], a[:, 1], a[:, 2], a[:, 3], False)


def _mpoly(parts, srid=0):
    from polars_st_spark.geo.types import Geometry, GeometryType

    geoms = [Geometry(GeometryType.Polygon, srid=srid,
                      rings=[np.array(r, dtype=np.float64) for r in rings])
             for rings in parts]
    return to_ewkb(Geometry(GeometryType.MultiPolygon, srid=srid, geoms=geoms))


class TestRaggedPaParity:
    """parse_*_pa (Arrow-buffer entries) must produce CSR structures
    identical to the pandas-Series parsers."""

    def _cmp(self, parse_pd, parse_pa, bufs):
        ref = parse_pd(pd.Series(bufs, dtype=object))
        got = parse_pa(pa.array(bufs, type=pa.binary()))
        if ref is None:
            assert got is None
            return
        assert got is not None
        np.testing.assert_array_equal(ref.coords, got.coords)
        np.testing.assert_array_equal(ref.row_start, got.row_start)
        np.testing.assert_array_equal(ref.null_mask, got.null_mask)
        assert ref.srid == got.srid and ref.srid_uniform == got.srid_uniform

    def test_polygons_with_holes_and_nulls(self):
        from polars_st_spark.geo import ragged as RG

        sq = _ring([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]])
        holed = _mpoly([[
            [[0, 0], [8, 0], [8, 8], [0, 8], [0, 0]],
            [[2, 2], [3, 2], [3, 3], [2, 3], [2, 2]],
        ], [
            [[10, 10], [12, 10], [12, 12], [10, 12], [10, 10]],
        ]], srid=4326)
        self._cmp(RG.parse_polygonal, RG.parse_polygonal_pa, [sq, holed, None, sq])

    def test_lines(self):
        from polars_st_spark.geo import ragged as RG

        l1 = _line([[0, 0], [1, 1], [2, 0]])
        l2 = _line([[5, 5], [6, 6]])
        self._cmp(RG.parse_lineal, RG.parse_lineal_pa, [l1, None, l2])

    def test_decline_mixed(self):
        from polars_st_spark.geo import ragged as RG

        assert RG.parse_polygonal_pa(
            pa.array([_line([[0, 0], [1, 1]])], type=pa.binary())) is None

    def test_area_matches_scalar(self):
        from polars_st_spark.geo import algos, ragged as RG
        from polars_st_spark.geo.wkb import from_ewkb

        holed = _mpoly([[
            [[0, 0], [8, 0], [8, 8], [0, 8], [0, 0]],
            [[2, 2], [3, 2], [3, 3], [2, 3], [2, 2]],
        ]])
        rp = RG.parse_polygonal_pa(pa.array([holed], type=pa.binary()))
        np.testing.assert_allclose(RG.area(rp)[0], algos.area(from_ewkb(holed)))


class TestRectRelate:
    def test_allen_grid_parity(self):
        """Every pairwise interval relation on both axes vs scalar relate."""
        # interval endpoints producing all 13 Allen relations vs A=[2, 5]
        b_intervals = [
            (0.0, 1.0), (0.0, 2.0), (0.0, 3.0), (0.0, 5.0), (0.0, 7.0),
            (2.0, 3.0), (2.0, 5.0), (2.0, 7.0), (3.0, 4.0), (3.0, 5.0),
            (3.0, 7.0), (5.0, 7.0), (6.0, 8.0),
        ]
        A = (2.0, 2.0, 5.0, 5.0)
        pairs = []
        for bx in b_intervals:
            for by in b_intervals:
                pairs.append((A, (bx[0], by[0], bx[1], by[1])))
        ra = [p[0] for p in pairs]
        rb = [p[1] for p in pairs]
        mats, dec = _rect_relate_mats(_boxes_of(ra), _boxes_of(rb))
        assert dec.all()
        from polars_st_spark.geo.wkb import from_ewkb

        for i, (ba, bb) in enumerate(zip(ra, rb)):
            ga = from_ewkb(_rect(*ba))
            gb = from_ewkb(_rect(*bb))
            assert mats[i] == P.relate(ga, gb), (ba, bb, mats[i])

    def test_degenerate_rows_undecided(self):
        mats, dec = _rect_relate_mats(
            _boxes_of([(0, 0, 0, 1), (0, 0, 1, 1)]),
            _boxes_of([(0, 0, 1, 1), (0, 0, 1, 1)]))
        assert not dec[0] and mats[0] is None
        assert dec[1] and mats[1] == "2FFF1FFF2"

    def test_equal_rects(self):
        mats, dec = _rect_relate_mats(
            _boxes_of([(1, 1, 4, 4)]), _boxes_of([(1, 1, 4, 4)]))
        assert dec[0] and mats[0] == "2FFF1FFF2"

    def test_shared_edge(self):
        mats, _ = _rect_relate_mats(
            _boxes_of([(0, 0, 1, 1)]), _boxes_of([(1, 0, 2, 1)]))
        assert mats[0] == "FF2F11212"

    def test_corner_touch(self):
        mats, _ = _rect_relate_mats(
            _boxes_of([(0, 0, 1, 1)]), _boxes_of([(1, 1, 2, 2)]))
        assert mats[0] == "FF2F01212"


class TestFactoryArrowParity:
    """The arrow_udf factory builders (evalType 250) must coerce outputs
    exactly like the pandas_udf boundary did: None rows → null, NaN
    doubles → null, NaN inside list<double> elements preserved the same
    way, nested lists and binaries unchanged. Probe-verified against a
    live pandas_udf for every factory return type."""

    CASES = {
        "double": [None, 1.5, float("nan"), -0.0, 3.0],
        "boolean": [None, True, False, True, None],
        "int": [None, 1, -2, 3, 0],
        "string": [None, "a", "", "txt", "z"],
        "binary": [None, b"\x00\x01", b"", b"abc", b"\xff"],
        "array<double>": [None, [1.0, float("nan")], [], [2.5], [float("nan")]],
        "array<binary>": [None, [b"a", None], [], [b"\x00"], [b"x", b"y"]],
        "array<array<double>>": [None, [[1.0, float("nan")], [2.0]], [], [[3.0]], [[]]],
    }

    def test_boundary_parity_vs_pandas_udf(self, spark):
        from pyspark.sql.functions import arrow_udf, pandas_udf

        from polars_st_spark.functions.factory import _pa_out

        df = spark.createDataFrame([(i,) for i in range(5)], "i int").coalesce(1)
        for t, vals in self.CASES.items():
            def make_pu(t=t, vals=vals):
                @pandas_udf(t)
                def pu(s: pd.Series) -> pd.Series:
                    return pd.Series([vals[int(v)] for v in s], dtype=object)
                return pu

            def make_au(t=t, vals=vals):
                @arrow_udf(t)
                def au(a):
                    return _pa_out([vals[int(v)] for v in a.to_pandas()], t)
                return au

            r_pd = [r[0] for r in df.select(make_pu()("i")).collect()]
            r_pa = [r[0] for r in df.select(make_au()("i")).collect()]
            assert repr(r_pd) == repr(r_pa), (t, r_pd, r_pa)

    def test_pa_dt_rejects_unknown(self):
        from polars_st_spark.functions.factory import pa_dt

        with pytest.raises(TypeError):
            pa_dt("map<string,int>")


class TestHeaderInfoPa:
    """header_info_pa must equal the scalar header_info decoder over every
    type code × flag combination × endianness, with null and sliced
    batches."""

    def _check(self, bufs):
        from polars_st_spark.geo.arrowwkb import header_info_pa
        from polars_st_spark.geo.wkb import header_info

        arr = pa.array(bufs, type=pa.binary())
        base, z, m, srid, nulls = header_info_pa(arr)
        for i, b in enumerate(bufs):
            if b is None:
                assert nulls[i]
                continue
            rb, rz, rm, rs = header_info(b)
            assert (int(base[i]), bool(z[i]), bool(m[i]), int(srid[i])) == \
                (rb, rz, rm, rs), (i, b.hex())

    def test_flags_iso_endian_grid(self):
        import struct

        bufs = []
        for code in (1, 2, 3, 4, 5, 6, 7, 8, 17):
            for zf, mf in ((0, 0), (1, 0), (0, 1), (1, 1)):
                for srid in (0, 4326):
                    word = code | (0x80000000 if zf else 0) | \
                        (0x40000000 if mf else 0) | (0x20000000 if srid else 0)
                    for fmt, bo in (("<", b"\x01"), (">", b"\x00")):
                        hdr = bo + struct.pack(fmt + "I", word)
                        if srid:
                            hdr += struct.pack(fmt + "I", srid)
                        bufs.append(hdr + b"\x00" * 16)
            # ISO code form (1000/2000/3000 offsets), little-endian
            for iso in (1000, 2000, 3000):
                bufs.append(b"\x01" + struct.pack("<I", code + iso) + b"\x00" * 16)
        self._check(bufs)

    def test_nulls_and_slice(self):
        bufs = [_pt(1, 2, srid=31370), None, _rect(0, 0, 1, 1), None,
                _pt(5, 6)]
        self._check(bufs)
        from polars_st_spark.geo.arrowwkb import header_info_pa

        arr = pa.array(bufs, type=pa.binary()).slice(1, 3)
        base, z, m, srid, nulls = header_info_pa(arr)
        assert nulls.tolist() == [True, False, True]
        assert int(base[1]) == 3  # polygon

    def test_too_short_raises(self):
        from polars_st_spark.geo.arrowwkb import header_info_pa

        with pytest.raises(ValueError):
            header_info_pa(pa.array([b"\x01\x02"], type=pa.binary()))

    def test_meta_udfs_against_pandas(self, spark):
        import polars_st_spark as st

        rows = [(_pt(1, 2, srid=4326),), (None,), (_rect(0, 0, 2, 2),),
                (_pt(3, 4),)]
        df = spark.createDataFrame(rows, "g binary")
        got = df.select(
            st.st_geometry_type("g").alias("t"), st.st_srid("g").alias("s"),
            st.st_has_z("g").alias("z"), st.st_has_m("g").alias("m"),
            st.st_coordinate_dimension("g").alias("d")).collect()
        assert [r.t for r in got] == ["Point", None, "Polygon", "Point"]
        assert [r.s for r in got] == [4326, None, 0, 0]
        assert [r.z for r in got] == [False, None, False, False]
        assert [r.m for r in got] == [False, None, False, False]
        assert [r.d for r in got] == [2, None, 2, 2]
