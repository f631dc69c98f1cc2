"""NTv2 grid-shift datum tests: binary round-trip, bilinear exactness,
subgrid precedence, forward/inverse convergence, proj4 + st_to_srid
integration. Grids are synthetic (built with make_ntv2_bytes) — the
format and conventions are the public NTv2 spec; reference reads these
files via proj4rs (functions.rs:1868-1939)."""

from __future__ import annotations

import numpy as np
import pytest

from polars_st_spark.functions import ntv2 as N
from polars_st_spark.functions import proj4 as P


def _affine_grid(name="AFFINE", parent="NONE", s_lat=0.0, n_lat=7200.0,
                 e_long=-18000.0, w_long=-3600.0, inc=3600.0,
                 ca=10.0, cb=0.5, cc=-0.25, da=-20.0, db=0.125, dc=0.75):
    """Subgrid whose node shifts are AFFINE in (lon_west_sec, lat_sec):
    bilinear interpolation reproduces an affine function exactly, so
    every interior query has a closed-form expected value."""
    ncols = int(round((w_long - e_long) / inc)) + 1
    nrows = int(round((n_lat - s_lat) / inc)) + 1
    lon_w = e_long + inc * np.arange(ncols)
    lat_s = s_lat + inc * np.arange(nrows)
    LO, LA = np.meshgrid(lon_w, lat_s)
    return N.NTv2SubGrid(
        name=name, parent=parent, s_lat=s_lat, n_lat=n_lat,
        e_long=e_long, w_long=w_long, lat_inc=inc, long_inc=inc,
        lat_shift=ca + cb * (LO / 3600.0) + cc * (LA / 3600.0),
        lon_shift=da + db * (LO / 3600.0) + dc * (LA / 3600.0),
    )


def _expected(lon_deg, lat_deg, ca=10.0, cb=0.5, cc=-0.25,
              da=-20.0, db=0.125, dc=0.75):
    lon_w = -np.asarray(lon_deg)
    lat = np.asarray(lat_deg)
    dphi = ca + cb * lon_w + cc * lat
    dlam = da + db * lon_w + dc * lat
    return lon_deg - dlam / 3600.0, lat + dphi / 3600.0


def test_binary_roundtrip():
    g = _affine_grid()
    data = N.make_ntv2_bytes([g])
    back = N.parse_ntv2(data)
    assert len(back) == 1
    b = back[0]
    assert b.name == "AFFINE" and b.parent == "NONE"
    assert (b.s_lat, b.n_lat, b.e_long, b.w_long) == (0.0, 7200.0, -18000.0, -3600.0)
    assert b.nrows == 3 and b.ncols == 5
    # float32 storage: shifts round-trip to f32 precision
    np.testing.assert_allclose(b.lat_shift, g.lat_shift, atol=1e-4)
    np.testing.assert_allclose(b.lon_shift, g.lon_shift, atol=1e-4)


def test_parse_nul_padded_record_names():
    # some writers NUL-pad the 8-char record names instead of space-padding;
    # PROJ reads those files, so must we
    good = N.make_ntv2_bytes([_affine_grid()])
    padded = good.replace(b"SUB_NAME", b"SUB_NAME")  # names are 8 chars already
    padded = bytearray(good)
    for name in (b"S_LAT   ", b"N_LAT   ", b"E_LONG  ", b"W_LONG  "):
        i = padded.index(name)
        padded[i : i + 8] = name.rstrip() + b"\x00" * (8 - len(name.rstrip()))
    back = N.parse_ntv2(bytes(padded))
    assert back[0].s_lat == 0.0 and back[0].w_long == -3600.0


def test_parse_rejects_garbage():
    with pytest.raises(ValueError, match="NUM_OREC"):
        N.parse_ntv2(b"\x00" * 200)
    with pytest.raises(ValueError, match="shorter"):
        N.parse_ntv2(b"NUM_OREC")
    good = N.make_ntv2_bytes([_affine_grid()])
    bad = bytearray(good)
    # corrupt GS_COUNT
    idx = good.index(b"GS_COUNT") + 8
    bad[idx:idx + 4] = (99).to_bytes(4, "little")
    with pytest.raises(ValueError, match="GS_COUNT"):
        N.parse_ntv2(bytes(bad))


def test_bilinear_exact_on_affine_grid():
    g = _affine_grid()
    # interior query points in positive-east degrees: lon in (1, 5), lat in (0, 2)
    rng = np.random.default_rng(42)
    lon = rng.uniform(1.01, 4.99, 200)
    lat = rng.uniform(0.01, 1.99, 200)
    out_lon, out_lat = N._forward_shift([g], lon, lat)
    exp_lon, exp_lat = _expected(lon, lat)
    np.testing.assert_allclose(out_lon, exp_lon, atol=1e-12)
    np.testing.assert_allclose(out_lat, exp_lat, atol=1e-12)
    # outside points pass through unchanged
    o_lon, o_lat = N._forward_shift([g], np.array([30.0]), np.array([50.0]))
    assert o_lon[0] == 30.0 and o_lat[0] == 50.0
    N.register_nadgrid("cov.gsb", [g])
    try:
        m = N.grid_coverage_mask("cov.gsb", np.array([2.0, 30.0]), np.array([1.0, 50.0]))
        assert m.tolist() == [True, False]
    finally:
        N.unregister_nadgrid("cov.gsb")


def test_inverse_converges():
    g = _affine_grid()
    rng = np.random.default_rng(7)
    lon = rng.uniform(1.2, 4.8, 100)
    lat = rng.uniform(0.1, 1.9, 100)
    f_lon, f_lat = N._forward_shift([g], lon, lat)
    b_lon, b_lat = N._inverse_shift([g], f_lon, f_lat)
    np.testing.assert_allclose(b_lon, lon, atol=1e-10)
    np.testing.assert_allclose(b_lat, lat, atol=1e-10)


def test_subgrid_precedence_finest_wins():
    parent = _affine_grid(name="PARENT")
    # child covers lon_west [7200, 10800] lat [0, 3600] with DIFFERENT
    # constant shifts and finer spacing
    inc = 1800.0
    ncols = int(round((10800.0 - 7200.0) / inc)) + 1
    nrows = int(round((3600.0 - 0.0) / inc)) + 1
    child = N.NTv2SubGrid(
        name="CHILD", parent="PARENT", s_lat=0.0, n_lat=3600.0,
        e_long=7200.0, w_long=10800.0, lat_inc=inc, long_inc=inc,
        lat_shift=np.full((nrows, ncols), 100.0),
        lon_shift=np.full((nrows, ncols), -50.0),
    )
    data = N.make_ntv2_bytes([parent, child])
    N.register_nadgrid("two.gsb", data)
    try:
        fw, to = N.grid_pair("two.gsb")
        # point inside the child: gets the child's constant shift
        lon, lat = to(np.array([-2.5]), np.array([0.5]))
        assert abs(lat[0] - (0.5 + 100.0 / 3600.0)) < 1e-9
        assert abs(lon[0] - (-2.5 + 50.0 / 3600.0)) < 1e-9
        # point outside child but inside parent: affine expectation
        lon2, lat2 = to(np.array([1.5]), np.array([1.0]))
        e_lon, e_lat = _expected(1.5, 1.0)
        assert abs(lon2[0] - e_lon) < 1e-4 and abs(lat2[0] - e_lat) < 1e-4
    finally:
        N.unregister_nadgrid("two.gsb")


def test_nadgrids_resolution_rules():
    with pytest.raises(ValueError, match="not registered"):
        N.grid_pair("nope.gsb")
    # optional @ prefix and null are skipped silently
    fw, to = N.grid_pair("@nope.gsb,null")
    lon, lat = to(np.array([1.0]), np.array([2.0]))
    assert lon[0] == 1.0 and lat[0] == 2.0


def test_ntv2_reprojection_plan_shape(spark):
    """Grid-shift reprojection is map-only: the registered grid ships
    inside the UDF closure, so the plan has NO Exchange and a single
    ArrowEvalPython — the 100 TB contract for st_to_srid."""
    import polars_st_spark as st
    from polars_st_spark.plans import explain_str
    from pyspark.sql import functions as F

    N.register_nadgrid("plan_affine.gsb", N.make_ntv2_bytes([_affine_grid()]))
    P.register_proj4(900928, "+proj=longlat +ellps=clrk66 +nadgrids=plan_affine.gsb")
    try:
        df = spark.range(100).select(
            st.st_set_srid(
                st.st_point(F.lit(2.0) + F.col("id") * 0.01, F.lit(1.0)), 900928
            ).alias("pt")
        )
        plan = explain_str(df.select(st.st_to_srid("pt", 4326).alias("g")))
        assert "Exchange" not in plan
        n_arrow = sum(
            1 for line in plan.splitlines()
            if line.strip().startswith("(") and "ArrowEvalPython" in line
            and ")" in line.split("ArrowEvalPython")[0]
        )
        assert n_arrow <= 2  # point/srid construction + the reprojection
    finally:
        P.unregister_proj4(900928)
        N.unregister_nadgrid("plan_affine.gsb")


def test_proj4_nadgrids_integration(spark):
    import polars_st_spark as st
    from pyspark.sql import functions as F

    N.register_nadgrid("test_affine.gsb", N.make_ntv2_bytes([_affine_grid()]))
    code = 900027
    P.register_proj4(code, "+proj=longlat +ellps=clrk66 +nadgrids=test_affine.gsb")
    try:
        df = spark.range(40).select(
            st.st_point(
                F.lit(1.5) + F.col("id") * 0.05, F.lit(0.2) + F.col("id") * 0.04
            ).alias("pt"),
            F.col("id"),
        ).select(st.st_set_srid("pt", code).alias("pt"), "id")
        out = df.select(
            "id",
            st.st_x(st.st_to_srid("pt", 4326)).alias("x"),
            st.st_y(st.st_to_srid("pt", 4326)).alias("y"),
        ).orderBy("id").collect()
        ids = np.arange(40)
        lon = 1.5 + ids * 0.05
        lat = 0.2 + ids * 0.04
        e_lon, e_lat = _expected(lon, lat)
        got = np.array([[r["x"], r["y"]] for r in out])
        # grid stored float32 → ~1e-4 arcsec ≈ 3e-8 deg
        np.testing.assert_allclose(got[:, 0], e_lon, atol=1e-7)
        np.testing.assert_allclose(got[:, 1], e_lat, atol=1e-7)
        # and the inverse direction composes: 4326 -> custom -> 4326
        back = df.select(
            st.st_x(
                st.st_to_srid(
                    st.st_set_srid(st.st_to_srid("pt", 4326), 4326), code
                )
            ).alias("x"),
            "id",
        ).orderBy("id").collect()
        np.testing.assert_allclose([r["x"] for r in back], lon, atol=1e-7)
    finally:
        P.unregister_proj4(code)
        N.unregister_nadgrid("test_affine.gsb")


def test_parse_rejects_non_seconds_gs_type():
    # GS_TYPE governs node units; only SECONDS is supported (PROJ-compatible).
    # A MINUTES file silently read as seconds would be 60x wrong.
    g = _affine_grid()
    data = bytearray(N.make_ntv2_bytes([g]))
    i = data.find(b"GS_TYPE ")
    assert i >= 0
    data[i + 8 : i + 16] = b"MINUTES "
    with pytest.raises(ValueError, match="GS_TYPE"):
        N.parse_ntv2(bytes(data))


def test_parse_rejects_degenerate_single_row_grid():
    # nrows == 1: bilinear needs >= 2x2 nodes (index clip would wrap)
    g = _affine_grid(s_lat=0.0, n_lat=0.0)  # one row
    data = N.make_ntv2_bytes([g])
    with pytest.raises(ValueError, match="degenerate"):
        N.parse_ntv2(data)


def test_parse_rejects_zero_increment():
    g = _affine_grid()
    data = bytearray(N.make_ntv2_bytes([g]))
    i = data.find(b"LAT_INC ")
    assert i >= 0
    import struct as _s
    data[i + 8 : i + 16] = _s.pack("<d", 0.0)
    with pytest.raises(ValueError, match="LAT_INC|non-positive"):
        N.parse_ntv2(bytes(data))


def test_equal_increment_tie_breaks_by_parent_depth():
    # Two subgrids with IDENTICAL increments where the child overlaps the
    # parent: the child's shifts must win inside the child's bounds (PROJ's
    # densest-containing-subgrid walk), regardless of registration order.
    parent = _affine_grid(name="PAR", parent="NONE",
                          s_lat=0.0, n_lat=7200.0,
                          e_long=-18000.0, w_long=-3600.0, inc=3600.0)
    child = _affine_grid(name="CHI", parent="PAR",
                         s_lat=0.0, n_lat=3600.0,
                         e_long=-10800.0, w_long=-3600.0, inc=3600.0,
                         ca=100.0, cb=0.0, cc=0.0, da=-200.0, db=0.0, dc=0.0)
    for order in ([parent, child], [child, parent]):
        N.register_nadgrid("tie.gsb", order)
        try:
            # (2 deg E, 0.5 deg N) is inside the child (west-sec in [-10800,-3600])
            lon, lat = np.array([2.0]), np.array([0.5])
            out_lon, out_lat = N._forward_shift(N._resolve("tie.gsb"), lon, lat)
            np.testing.assert_allclose(out_lat[0], 0.5 + 100.0 / 3600.0, atol=1e-7)
            np.testing.assert_allclose(out_lon[0], 2.0 + 200.0 / 3600.0, atol=1e-7)
        finally:
            N.unregister_nadgrid("tie.gsb")
