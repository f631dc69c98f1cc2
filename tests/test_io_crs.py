"""Tests: file dispatch, CRS helpers, curve constructors."""

import pytest
from pyspark.sql import functions as F

import polars_st_spark as st
from polars_st_spark.functions.crs import get_crs_authority, get_crs_from_code
from polars_st_spark.sources.files import read_file, write_file


def test_file_dispatch_roundtrip(spark, tmp_path):
    df = st.geodataframe(spark.createDataFrame([(1, "POINT (1 2)")], ["id", "geometry"]))
    p = str(tmp_path / "out.ndjson")
    write_file(df, p)
    back = read_file(spark, p)
    assert back.select(st.st_to_wkt("geometry")).first()[0] == "POINT (1 2)"


def test_file_dispatch_gdal_error(spark, tmp_path):
    # .shp/.gpkg/.fgb are native since r4 (shapefile_io/geopackage_io/
    # flatgeobuf_io); only the remaining GDAL-bound formats raise
    df = st.geodataframe(spark.createDataFrame([(1, "POINT (1 2)")], ["id", "geometry"]))
    with pytest.raises(ImportError, match="pyogrio"):
        write_file(df, str(tmp_path / "out.kml"))
    with pytest.raises(ImportError, match="pyogrio"):
        read_file(spark, str(tmp_path / "missing.gdb"))


def test_crs_helpers():
    assert get_crs_from_code(4326).startswith("GEOGCRS")
    assert get_crs_authority("EPSG:4326") == ("EPSG", "4326")
    assert get_crs_authority(get_crs_from_code(3857)) == ("EPSG", "3857")
    with pytest.raises(ValueError, match="Unknown EPSG"):
        get_crs_from_code(999999)


def test_circularstring_header_ops(spark):
    df = spark.createDataFrame([(1, [[0.0, 0.0], [1.0, 1.0], [2.0, 0.0]])], ["id", "c"])
    out = df.select(st.st_circularstring("c", srid=4326).alias("g"))
    row = out.select(
        st.st_geometry_type("g").alias("t"),
        st.st_srid("g").alias("s"),
        st.st_count_coordinates("g").alias("n"),
        st.st_to_wkt("g").alias("w"),
    ).first()
    assert row["t"] == "CircularString" and row["s"] == 4326 and row["n"] == 3
    assert row["w"] == "CIRCULARSTRING (0 0, 1 1, 2 0)"
    # computational ops on curves now work via arc linearization
    hit = out.select(st.st_intersects("g", "POINT (0 0)")).first()[0]
    assert hit is True


def test_multilinestring_constructor(spark):
    df = spark.createDataFrame([(1, [[[0.0, 0.0], [1.0, 1.0]], [[2.0, 2.0], [3.0, 3.0]]])], ["id", "c"])
    out = df.select(st.st_multilinestring("c").alias("g"))
    assert out.select(st.st_to_wkt("g")).first()[0] == "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))"


def test_utm_kruger_series():
    import numpy as np
    from polars_st_spark.functions.transform import _utm_to_wgs84, _wgs84_to_utm

    fwd = _wgs84_to_utm(31, True)
    # canonical vector: (0 E, 0 N) in zone 31 -> 166021.443 E, 0 N
    f = fwd(np.array([[0.0, 0.0], [3.0, 0.0]]))
    assert abs(f[0, 0] - 166021.4430805) < 1e-3
    assert abs(f[0, 1]) < 1e-6
    assert abs(f[1, 0] - 500000.0) < 1e-6  # central meridian
    inv = _utm_to_wgs84(31, True)
    pts = np.array([[2.2945, 48.8584], [5.9, 0.5], [0.1, 83.0]])
    assert np.abs(inv(fwd(pts.copy()).copy()) - pts).max() < 1e-9


def test_conic_projections():
    """LCC 2SP + Albers closed forms (Snyder PP 1395): projection origin maps
    exactly to (FE, FN), round-trips are sub-micrometre, scale is 1 on the
    standard parallel, and Lambert-93 reproduces the published Paris anchor."""
    import math

    import numpy as np
    from polars_st_spark.functions.transform import (
        _CODE_UNIT, _CONIC_CODES, _from_wgs84_fn, _to_wgs84_fn)

    for code, (kind, a, f, lat0, lon0, lat1, lat2, FE, FN) in _CONIC_CODES.items():
        if kind == "laea":  # azimuthal: no standard parallels; test_laea_europe
            continue
        unit = _CODE_UNIT.get(code, 1.0)  # ftUS state planes output feet
        fwd, inv = _from_wgs84_fn(code), _to_wgs84_fn(code)
        o = fwd(np.array([[lon0, lat0]], dtype=float))
        assert abs(o[0, 0] * unit - FE) < 1e-6 and abs(o[0, 1] * unit - FN) < 1e-6, code
        grid = np.array([[lo, la] for lo in (lon0 - 5, lon0, lon0 + 5)
                         for la in (min(lat1, lat2) - 3, lat0, max(lat1, lat2) + 3)])
        assert np.abs(inv(fwd(grid.copy()).copy()) - grid).max() < 1e-9, code
        # unit scale on the standard parallel pins lat1 + the ellipsoid
        e2 = f * (2 - f)
        phi = math.radians(lat1)
        npr = a / math.sqrt(1 - e2 * math.sin(phi) ** 2)
        dlam = 1e-6
        p = fwd(np.array([[lon0, lat1], [lon0 + math.degrees(dlam), lat1]], dtype=float))
        k = float(np.hypot(*(p[1, :2] - p[0, :2]))) * unit / (npr * math.cos(phi) * dlam)
        assert abs(k - 1.0) < 1e-6, code
    # published anchor: Paris (2.3522E, 48.8566N) -> Lambert-93
    paris = _from_wgs84_fn(2154)(np.array([[2.3522, 48.8566]]))
    assert abs(paris[0, 0] - 652469.02) < 0.5 and abs(paris[0, 1] - 6862035.26) < 0.5


def test_laea_europe():
    """EPSG:3035 LAEA: exact false origin, 1e-9 round-trips across Europe,
    and the equal-area property — |det J| equals the ellipsoidal area
    element M·N·cosφ (the defining invariant of the projection)."""
    import math

    import numpy as np
    from polars_st_spark.functions.transform import (
        _GRS80_A, _GRS80_F, _from_wgs84_fn, _to_wgs84_fn)

    fwd, inv = _from_wgs84_fn(3035), _to_wgs84_fn(3035)
    o = fwd(np.array([[10.0, 52.0]]))
    assert abs(o[0, 0] - 4321000.0) < 1e-6 and abs(o[0, 1] - 3210000.0) < 1e-6
    grid = np.array([[lo, la] for lo in (-10.0, 0.0, 10.0, 25.0, 40.0)
                     for la in (35.0, 45.0, 52.0, 60.0, 70.0)])
    assert np.abs(inv(fwd(grid.copy()).copy()) - grid).max() < 1e-9
    e2 = _GRS80_F * (2 - _GRS80_F)
    for lon, lat in ((10.0, 52.0), (25.0, 40.0), (-8.0, 65.0)):
        d = 1e-7
        p = fwd(np.array([[lon, lat], [lon + d, lat], [lon, lat + d]]))
        J = np.array([(p[1, :2] - p[0, :2]) / math.radians(d),
                      (p[2, :2] - p[0, :2]) / math.radians(d)]).T
        phi = math.radians(lat)
        M = _GRS80_A * (1 - e2) / (1 - e2 * math.sin(phi) ** 2) ** 1.5
        N = _GRS80_A / math.sqrt(1 - e2 * math.sin(phi) ** 2)
        assert abs(abs(np.linalg.det(J)) / (M * N * math.cos(phi)) - 1.0) < 1e-5


def test_conic_to_srid_column(spark):
    """st_to_srid through EPSG:2154 / 5070 round-trips at the column level,
    including composition through a projected intermediate."""
    df = spark.createDataFrame([(1, 2.3522, 48.8566)], ["id", "lon", "lat"])
    pt = st.st_set_srid(st.st_point("lon", "lat"), 4326)
    lcc = st.st_to_srid(pt, 2154)
    row = df.select(
        F.round(st.st_x(lcc), 2).alias("e"),
        F.round(st.st_y(lcc), 2).alias("n"),
        st.st_srid(lcc).alias("s"),
        F.round(st.st_x(st.st_to_srid(st.st_to_srid(pt, 5070), 4326)), 9).alias("rt_lon"),
        F.round(st.st_x(st.st_to_srid(st.st_to_srid(pt, 3857), 2154)), 2).alias("via_merc_e"),
    ).first()
    assert row["s"] == 2154
    assert abs(row["e"] - 652469.02) < 0.5 and abs(row["n"] - 6862035.26) < 0.5
    assert abs(row["rt_lon"] - 2.3522) < 1e-8
    assert abs(row["via_merc_e"] - row["e"]) < 0.01


def test_utm_south_and_compose(spark):
    import polars_st_spark as st
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, 174.76, -36.85)], ["id", "lon", "lat"])  # Auckland, 60S
    pt = st.st_set_srid(st.st_point("lon", "lat"), 4326)
    utm = st.st_to_srid(pt, 32760)
    row = df.select(
        st.st_x(utm).alias("e"), st.st_y(utm).alias("n"),
        st.st_srid(utm).alias("s"),
        F.round(st.st_x(st.st_to_srid(st.st_to_srid(pt, 3857), 32760)), 3).alias("via_merc_e"),
    ).first()
    assert row["s"] == 32760
    assert 0 < row["e"] < 1000000 and 0 < row["n"] < 10000000  # southern false northing
    assert abs(row["via_merc_e"] - round(row["e"], 3)) < 0.001


def test_parameterized_tm_codes(spark):
    """Generic Transverse Mercator family: ETRS89/NAD83 UTM and OSGB36
    British National Grid (Airy 1830 + Helmert datum shift)."""
    import math

    import numpy as np

    from polars_st_spark.functions import transform as T

    # OS worked example (public): OSGB36 geodetic lat 52°39'27.2531"N,
    # lon 1°43'4.5177"E -> E 651409.903 N 313177.270 (TM math on Airy 1830,
    # no datum shift involved) — must match to ~1 mm.
    a_, f_ = T._ELLIPSOIDS["AIRY1830"]
    fwd = T._tm_forward_fn(a_, f_, 0.9996012717, 49.0, -2.0, 400000.0, -100000.0, None)
    lat = 52 + 39 / 60 + 27.2531 / 3600
    lon = 1 + 43 / 60 + 4.5177 / 3600
    e, n = fwd(np.array([[lon, lat]]))[0]
    assert abs(e - 651409.903) < 2e-3 and abs(n - 313177.270) < 2e-3
    # natural origin maps to the false origin bit-exactly
    oe, on = fwd(np.array([[-2.0, 49.0]]))[0]
    assert oe == 400000.0 and on == -100000.0

    # column-level round-trips through every new family member
    df = spark.createDataFrame(
        [(1, 9.7, 52.37, 25832), (2, -123.1, 49.26, 26910), (3, -0.12, 51.51, 27700),
         (4, 13.4, 52.52, 25833), (5, 174.78, -41.29, 2193), (6, 9.18, 48.78, 31467)],
        ["id", "lon", "lat", "code"],
    )
    for code in (25832, 25833, 26910, 27700, 2193, 31467):
        sub = df.where(F.col("code") == code)
        pt = st.st_set_srid(st.st_point("lon", "lat"), 4326)
        back = st.st_to_srid(st.st_to_srid(pt, code), 4326)
        row = sub.select(
            st.st_x(back).alias("lon2"), st.st_y(back).alias("lat2"),
            st.st_srid(st.st_to_srid(pt, code)).alias("s"),
        ).first()
        lon0, lat0 = sub.select("lon", "lat").first()
        tol = 5e-8 if code in (27700, 31467) else 1e-9  # datum height-drop ~2 mm
        assert row["s"] == code
        assert abs(row["lon2"] - lon0) < tol and abs(row["lat2"] - lat0) < tol

    # OSGB36 datum shift is really applied: WGS84 Greenwich lon/lat lands
    # ~100 m east of where a null-datum Airy TM would put it
    null_fwd = T._tm_forward_fn(a_, f_, 0.9996012717, 49.0, -2.0, 400000.0, -100000.0, None)
    real_fwd = T._tm_code_fns(27700)[0]
    p = np.array([[-0.0014, 51.4779]])
    shift_m = np.abs(real_fwd(p.copy()) - null_fwd(p.copy())).max()
    assert 50.0 < shift_m < 200.0


def test_datum_utm_families_consistency():
    """r4c zone families cross-checked against the independently-validated
    WGS84 UTM Krüger path: same-ellipsoid datums must agree to sub-mm
    (GRS80 vs WGS84 flattening differs at 1e-10), shifted datums must land
    within the documented transformation magnitude and direction."""
    import numpy as np

    from polars_st_spark.functions import transform as T

    # GDA94 MGA55 / GDA2020 MGA55 / SIRGAS UTM 23S == WGS84 UTM south zone
    # (GRS80 ≈ WGS84 ellipsoid: sub-mm)
    for code, wgs_code, pt in (
        (28355, 32755, (147.3, -42.9)),     # Hobart, MGA zone 55
        (7855, 32755, (144.96, -37.81)),    # Melbourne, MGA2020 zone 55
        (31983, 32723, (-46.63, -23.55)),   # São Paulo, SIRGAS UTM 23S
        (31972, 32618, (-74.07, 4.71)),     # Bogotá, SIRGAS UTM 18N
        (3006, None, (15.0, 59.0)),         # SWEREF99 TM == UTM 33N params
        (3067, None, (27.0, 61.0)),         # TM35FIN == UTM 35N params
    ):
        fwd = T._tm_code_fns(code)[0]
        if wgs_code is not None:
            wfwd = T._code_fns(wgs_code)[0]
        elif code == 3006:
            wfwd = T._code_fns(32633)[0]
        else:
            wfwd = T._code_fns(32635)[0]
        a = fwd(np.array([list(pt)], dtype=float))
        b = wfwd(np.array([list(pt)], dtype=float))
        if code in (3006, 3067):  # northern: same FN too
            assert np.abs(a - b).max() < 1e-3, (code, a, b)
        else:
            assert np.abs(a - b).max() < 1e-3, (code, a, b)

    # ED50 UTM 31N vs WGS84 UTM 31N: the Paris-area offset is the classic
    # ~100 m NE displacement of ED50 grids (ED50 coords are LARGER)
    ed = T._tm_code_fns(23031)[0](np.array([[2.35, 48.85]]))
    wgs = T._code_fns(32631)[0](np.array([[2.35, 48.85]]))
    de, dn = (ed - wgs)[0, 0], (ed - wgs)[0, 1]
    assert 30.0 < de < 160.0 and 100.0 < dn < 300.0, (de, dn)

    # NAD27 UTM 14N vs NAD83 UTM 14N (Texas): NAD27 northings are ~200 m
    # smaller in the south-central US
    n27 = T._tm_code_fns(26714)[0](np.array([[-98.49, 29.42]]))
    n83 = T._code_fns(26914)[0](np.array([[-98.49, 29.42]]))
    d = (n27 - n83)[0]
    assert abs(d[0]) < 80.0 and 100.0 < -d[1] < 300.0, d

    # Pulkovo 1942 GK zone 7 (Moscow): easting carries the zone prefix
    # 7 500 000 and the point sits west of the central meridian 39E
    gk = T._tm_code_fns(28407)[0](np.array([[37.6176, 55.7558]]))
    assert 7_300_000.0 < gk[0, 0] < 7_500_000.0
    assert 6_100_000.0 < gk[0, 1] < 6_250_000.0


def test_mercator_polar_oblique_worked_examples():
    """r4b projection families vs the published EPSG GN7-2 worked examples:
    Mercator variant A (Makassar / NEIEZ params), Polar Stereographic
    variant B (Australian Antarctic params) and Oblique Stereographic
    (Amersfoort / RD New params) — all to ~1 mm, plus exact origin anchors
    and 1e-9-degree round-trips."""
    import numpy as np

    from polars_st_spark.functions import transform as T

    # Mercator variant A (EPSG method 9804) — GN7-2 example: Bessel 1841,
    # k0=0.997, lon0=110E, FE=3900000, FN=900000; (120E, 3S) ->
    # E 5009726.58, N 569150.82
    a_, f_ = T._ELLIPSOIDS["BESSEL1841"]
    fwd = T._merc_forward(a_, f_, 0.997, 110.0, 3900000.0, 900000.0)
    inv = T._merc_inverse(a_, f_, 0.997, 110.0, 3900000.0, 900000.0)
    out = fwd(np.array([[120.0, -3.0]]))
    assert abs(out[0, 0] - 5009726.58) < 5e-3 and abs(out[0, 1] - 569150.82) < 5e-3
    assert np.abs(inv(out) - [120.0, -3.0]).max() < 1e-9

    # Polar Stereographic variant B (EPSG method 9829) — GN7-2 example:
    # WGS84, lat_ts=71S, lon0=70E, FE=FN=6000000; (120E, 75S) ->
    # E 7255380.79, N 7053389.56
    a_, f_ = T._ELLIPSOIDS["WGS84"]
    fwd = T._pstereo_forward(a_, f_, -71.0, 70.0, 6000000.0, 6000000.0)
    inv = T._pstereo_inverse(a_, f_, -71.0, 70.0, 6000000.0, 6000000.0)
    out = fwd(np.array([[120.0, -75.0]]))
    assert abs(out[0, 0] - 7255380.79) < 5e-3 and abs(out[0, 1] - 7053389.56) < 5e-3
    assert np.abs(inv(out) - [120.0, -75.0]).max() < 1e-9
    # north aspect: the pole itself maps to the false origin
    nf, ni = T._code_fns(3413)
    assert np.abs(nf(np.array([[0.0, 90.0]]))).max() < 1e-6
    rt = ni(nf(np.array([[-30.0, 70.0]])))
    assert np.abs(rt - [-30.0, 70.0]).max() < 1e-9

    # Oblique Stereographic (EPSG method 9809) — GN7-2 example
    # (Amersfoort / RD New, projection only): (6E, 53N) ->
    # E 196105.283, N 557057.739; natural origin -> exact false origin
    a_, f_ = T._ELLIPSOIDS["BESSEL1841"]
    lat0 = 52 + 9 / 60 + 22.178 / 3600
    lon0 = 5 + 23 / 60 + 15.5 / 3600
    fwd = T._osterea_forward(a_, f_, 0.9999079, lat0, lon0, 155000.0, 463000.0)
    inv = T._osterea_inverse(a_, f_, 0.9999079, lat0, lon0, 155000.0, 463000.0)
    out = fwd(np.array([[6.0, 53.0]]))
    assert abs(out[0, 0] - 196105.283) < 2e-3 and abs(out[0, 1] - 557057.739) < 2e-3
    assert np.abs(inv(out) - [6.0, 53.0]).max() < 1e-9
    origin = fwd(np.array([[lon0, lat0]]))
    assert abs(origin[0, 0] - 155000.0) < 1e-6 and abs(origin[0, 1] - 463000.0) < 1e-6

    # 28992 with the Amersfoort datum shift: the OLV tower (the physical RD
    # origin) at its WGS84 coordinates lands on (155000, 463000) within 5 cm
    rf, ri = T._code_fns(28992)
    tower = rf(np.array([[5.3872035, 52.1551722]]))
    assert abs(tower[0, 0] - 155000.0) < 0.05 and abs(tower[0, 1] - 463000.0) < 0.05
    rt = ri(tower)
    assert np.abs(rt - [5.3872035, 52.1551722]).max() < 5e-8  # datum height-drop

    # ftUS state planes: exact false-origin anchors in ftUS units
    cf, ci = T._code_fns(2263)
    o = cf(np.array([[-74.0, 40.0 + 10.0 / 60.0]]))
    assert abs(o[0, 0] - 984250.0) < 1e-6 and abs(o[0, 1]) < 1e-6
    rt = ci(cf(np.array([[-73.9857, 40.7484]])))
    assert np.abs(rt - [-73.9857, 40.7484]).max() < 1e-9
    cf5, ci5 = T._code_fns(2229)
    o5 = cf5(np.array([[-118.0, 33.5]]))
    assert abs(o5[0, 0] - 6561666.667) < 1e-5 and abs(o5[0, 1] - 1640416.667) < 1e-5
    rt5 = ci5(cf5(np.array([[-118.25, 34.05]])))
    assert np.abs(rt5 - [-118.25, 34.05]).max() < 1e-9

    # World Mercator 3395: equator y=0, unit scale on the equator
    mf, mi = T._code_fns(3395)
    eq = mf(np.array([[10.0, 0.0]]))
    assert abs(eq[0, 1]) < 1e-9
    rt = mi(mf(np.array([[10.0, 51.5]])))
    assert np.abs(rt - [10.0, 51.5]).max() < 1e-9


def test_new_codes_column_level(spark):
    """st_to_srid round-trips through the r4b codes at column level, and
    get_crs_from_code knows the family names."""
    rows = [(1, 5.9, 52.1, 28992), (2, -73.9, 40.75, 2263), (3, -118.3, 34.1, 2229),
            (4, 10.0, 51.5, 3395), (5, -45.0, 82.0, 3413), (6, 100.0, -80.0, 3031)]
    df = spark.createDataFrame(rows, ["id", "lon", "lat", "code"])
    for _, lon, lat, code in rows:
        sub = df.where(F.col("code") == code)
        pt = st.st_set_srid(st.st_point("lon", "lat"), 4326)
        proj = st.st_to_srid(pt, code)
        back = st.st_to_srid(proj, 4326)
        row = sub.select(
            st.st_x(back).alias("lon2"), st.st_y(back).alias("lat2"),
            st.st_srid(proj).alias("s"),
        ).first()
        tol = 5e-8 if code == 28992 else 1e-9  # datum height-drop
        assert row["s"] == code
        assert abs(row["lon2"] - lon) < tol and abs(row["lat2"] - lat) < tol
        assert "EPSG" in get_crs_from_code(code)


def test_every_registered_code_roundtrips():
    """Sweep EVERY supported projected EPSG code: take projected points in a
    neighborhood of the false origin (guaranteed on-domain), invert to
    lon/lat, re-project, and require the projected coordinates to return
    within 1e-5 units — catches any parameter-table typo (wrong lon0, FE,
    ellipsoid, unit) across the whole registry in one test."""
    import numpy as np

    from polars_st_spark.functions import transform as T

    codes = (
        [3857, 2229, 2263]
        + list(T._MISC_CODES)
        + list(T._TM_CODES)
        + list(T._CONIC_CODES)
        + list(range(32601, 32661)) + list(range(32701, 32761))
    )
    offsets = np.array([
        [0.0, 0.0], [12_000.0, 7_000.0], [-15_000.0, 4_000.0],
        [8_000.0, -9_000.0], [-5_000.0, -11_000.0],
    ])
    for code in codes:
        pair = T._code_fns(code)
        assert pair is not None, code
        fwd, inv = pair
        # find the projected false-origin neighborhood: project the point
        # the inverse maps (0,0)-ish to — instead, build from the table's
        # FE/FN by probing: inverse of a grid around (0,0) may be off-domain
        # for large false origins, so recover (FE, FN) via the origin map
        unit = T._CODE_UNIT.get(code, 1.0)
        # locate an anchor: inverse of offsets scaled into native units
        # around the natural origin's projected image. For every family the
        # natural origin maps to (FE, FN); probe it via inv/fwd fix point:
        # start from (0, 0) in native units and walk — simpler: use the
        # registry values directly where known, else (0, 0).
        anchors = {
            27700: (400000.0, -100000.0), 2193: (1600000.0, 10000000.0),
            28992: (155000.0, 463000.0),
            2229: (6561666.667, 1640416.667), 2263: (984250.0, 0.0),
            2056: (2600000.0, 1200000.0), 21781: (600000.0, 200000.0),
            29873: (590476.87, 442857.65), 26931: (800000.0, 600000.0),
            5514: (-650000.0, -1050000.0),
            2154: (700000.0, 6600000.0), 3347: (6200000.0, 3000000.0),
            32140: (600000.0, 4000000.0), 3035: (4321000.0, 3210000.0),
        }
        datum_shifted = False
        if code in T._TM_CODES:
            # anchor at the registry false origin: the natural origin always
            # projects there, so the neighborhood is on-domain by construction
            _ell, _k0, _lat0, _lon0, fe, fn, _datum = T._TM_CODES[code]
            datum_shifted = _datum is not None
        elif code in T._MISC_CODES:
            t = T._MISC_CODES[code]
            datum_shifted = isinstance(t[-1], str) and t[-1] in T._DATUM_TO_WGS84
            fe, fn = {
                28992: (155000.0, 463000.0), 2056: (2600000.0, 1200000.0),
                21781: (600000.0, 200000.0), 29873: (590476.87, 442857.65),
                26931: (800000.0, 600000.0), 5514: (-650000.0, -1050000.0),
            }.get(code, (0.0, 0.0))
        else:
            fe, fn = anchors.get(
                code, (500000.0, 0.0) if 25000 < code < 33000 else (0.0, 0.0))
        pts = offsets / unit + [fe, fn]
        ll = inv(pts.copy())
        back = fwd(ll.copy())
        err = np.abs(back - pts).max() * unit
        # datum-shift codes lose ~2 mm to the 2-D height drop; others 1e-6
        tol = 0.02 if datum_shifted else 1e-5
        assert err < tol, (code, err)


def test_swiss_oblique_cylindrical():
    """CH1903(+) LV95/LV03 (EPSG 2056/21781): the official Swisstopo worked
    example (WGS84 46°02'38.87"N 8°43'49.79"E -> LV03 700000/100000) must
    reproduce within 5 cm, the Bern origin within 0.5 m, LV95 = LV03 +
    (2000000, 1000000) exactly, and round-trips hold to 1e-7 degrees."""
    import numpy as np

    from polars_st_spark.functions import transform as T

    f03, i03 = T._code_fns(21781)
    f95, i95 = T._code_fns(2056)
    lat = 46 + 2 / 60 + 38.87 / 3600
    lon = 8 + 43 / 60 + 49.79 / 3600
    out = f03(np.array([[lon, lat]]))
    assert abs(out[0, 0] - 700000.0) < 0.05 and abs(out[0, 1] - 100000.0) < 0.05
    # Bern observatory (the CH1903 origin) at its published WGS84 position
    bern = f95(np.array([[7 + 26 / 60 + 19.09 / 3600, 46 + 57 / 60 + 3.90 / 3600]]))
    assert abs(bern[0, 0] - 2600000.0) < 0.5 and abs(bern[0, 1] - 1200000.0) < 0.5
    # LV95 and LV03 differ exactly by the false-origin offset
    p95 = f95(np.array([[lon, lat]]))
    assert abs((p95[0, 0] - out[0, 0]) - 2000000.0) < 1e-6
    assert abs((p95[0, 1] - out[0, 1]) - 1000000.0) < 1e-6
    grid = np.array([[lo, la] for lo in (6.2, 7.5, 9.5) for la in (45.9, 46.8, 47.6)])
    assert np.abs(i95(f95(grid.copy()).copy()) - grid).max() < 1e-7
    from polars_st_spark.functions.crs import get_crs_from_code
    assert "LV95" in get_crs_from_code(2056)


def test_hotine_oblique_mercator():
    """Hotine OM: the EPSG GN7-2 worked example (Timbalai 1948 / RSO Borneo,
    variant B: 5°23'14.1129"N 115°48'19.8196"E -> 679245.73 / 596562.78)
    must reproduce within 5 mm projection-only; Alaska zone 1 (variant A)
    round-trips to 1e-9 degrees with scale k_c at the projection centre."""
    import math

    import numpy as np

    from polars_st_spark.functions import transform as T

    a_, f_ = T._ELLIPSOIDS["EVEREST1967"]
    fwd = T._hotine_forward(a_, f_, 0.99984, 4.0, 115.0,
                            53 + 18 / 60 + 56.9537 / 3600,
                            53 + 7 / 60 + 48.3685 / 3600,
                            590476.87, 442857.65, "B", None)
    inv = T._hotine_inverse(a_, f_, 0.99984, 4.0, 115.0,
                            53 + 18 / 60 + 56.9537 / 3600,
                            53 + 7 / 60 + 48.3685 / 3600,
                            590476.87, 442857.65, "B", None)
    lat = 5 + 23 / 60 + 14.1129 / 3600
    lon = 115 + 48 / 60 + 19.8196 / 3600
    out = fwd(np.array([[lon, lat]]))
    assert abs(out[0, 0] - 679245.73) < 5e-3 and abs(out[0, 1] - 596562.78) < 5e-3
    assert np.abs(inv(out) - [lon, lat]).max() < 1e-9

    af, ai = T._code_fns(26931)
    grid = np.array([[lo, la] for lo in (-140.0, -133.67, -131.0)
                     for la in (55.0, 57.0, 59.5)])
    assert np.abs(ai(af(grid.copy()).copy()) - grid).max() < 1e-9
    d = 1e-7
    p0 = af(np.array([[-133.0 - 40 / 60, 57.0], [-133.0 - 40 / 60 + d, 57.0]]))
    e2 = T._GRS80_F * (2 - T._GRS80_F)
    npr = T._GRS80_A / math.sqrt(1 - e2 * math.sin(math.radians(57)) ** 2)
    k = float(np.hypot(*(p0[1, :2] - p0[0, :2]))) / (
        npr * math.cos(math.radians(57)) * math.radians(d))
    assert abs(k - 0.9999) < 1e-6


def test_krovak():
    """S-JTSK / Krovak East North (EPSG 5514): the EPSG GN7-2 worked example
    (50°12'32.4416"N 16°50'59.1790"E -> Southing 1050538.63 / Westing
    568991.00, i.e. EN (-568991.00, -1050538.63)) must reproduce within
    2 cm projection-only, and full-code round-trips hold across Czechia and
    Slovakia."""
    import numpy as np

    from polars_st_spark.functions import transform as T

    a_, f_ = T._ELLIPSOIDS["BESSEL1841"]
    args = (a_, f_, 0.9999, 49.5, 24 + 50 / 60,
            30 + 17 / 60 + 17.3031 / 3600, 78.5, 0.0, 0.0, None)
    fwd = T._krovak_forward(*args)
    inv = T._krovak_inverse(*args)
    lat = 50 + 12 / 60 + 32.4416 / 3600
    lon = 16 + 50 / 60 + 59.1790 / 3600
    out = fwd(np.array([[lon, lat]]))
    assert abs(out[0, 0] - (-568991.00)) < 0.02
    assert abs(out[0, 1] - (-1050538.63)) < 0.02
    assert np.abs(inv(out) - [lon, lat]).max() < 1e-9

    kf, ki = T._code_fns(5514)
    grid = np.array([[lo, la] for lo in (13.0, 15.5, 18.5, 21.0)
                     for la in (48.3, 49.5, 50.8)])
    assert np.abs(ki(kf(grid.copy()).copy()) - grid).max() < 5e-8


def test_csv_wkt_roundtrip(spark, tmp_path):
    """read_file/write_file .csv/.tsv: geometry as a WKT column (the GDAL
    CSV-driver equivalent, no GDAL), distributed both ways."""
    from pyspark.sql import functions as F

    from polars_st_spark.sources.files import read_file, write_file

    df = spark.range(20).select(
        F.col("id"),
        st.st_point(F.col("id") * 1.0, F.col("id") * -2.0).alias("geometry"))
    p = str(tmp_path / "pts.csv")
    write_file(df, p)
    back = read_file(spark, p)
    got = sorted((r["id"], r["x"], r["y"]) for r in back.select(
        F.col("id").cast("long").alias("id"),
        st.st_x("geometry").alias("x"), st.st_y("geometry").alias("y")).collect())
    assert got == [(i, float(i), float(-2 * i)) for i in range(20)]
    # hand-written csv with a WKT column name
    manual = tmp_path / "manual.csv"
    manual.write_text("name,WKT\na,\"LINESTRING (0 0, 1 1)\"\nb,POINT (5 6)\n")
    m = read_file(spark, str(manual))
    assert m.count() == 2 and "geometry" in m.columns
    assert {r["t"] for r in m.select(st.st_geometry_type("geometry").alias("t")).collect()} == {
        "LineString", "Point"}
    # no WKT-ish column -> clear error
    bad = tmp_path / "bad.csv"
    bad.write_text("a,b\n1,2\n")
    with pytest.raises(ValueError, match="geometry column"):
        read_file(spark, str(bad))


def test_jgd2011_and_korea2000_tm_codes(spark):
    """r4e zone families: JGD2011 Japan Plane Rectangular CS I-XIX
    (EPSG 6669-6687, k0=0.9999, zero false origin) and Korea 2000 belts
    (5185-5188, k0=1, FE/FN 200000/600000). Origin exactness, round-trip
    identity, and a coarse geography anchor for Tokyo in zone IX."""
    import numpy as np

    from polars_st_spark.functions import transform as T

    # natural origin -> false origin, bit-exact, for every new code
    for code in list(range(6669, 6688)) + list(range(5185, 5189)):
        _, _, lat0, lon0, fe, fn, _ = T._TM_CODES[code]
        fwd, inv = T._tm_code_fns(code)
        x, y = fwd(np.array([[lon0, lat0]]))[0]
        assert (x, y) == (fe, fn), code
        # round-trip a grid around the origin to 1e-9 deg
        lons = np.linspace(lon0 - 0.8, lon0 + 0.8, 5)
        lats = np.linspace(lat0 - 0.8, lat0 + 0.8, 5)
        pts = np.array([[lo, la] for lo in lons for la in lats])
        back = inv(fwd(pts.copy()))
        assert np.abs(back - pts).max() < 1e-9, code

    # Tokyo (139.74E, 35.65N) in zone IX (EPSG 6677): ~8.4 km west and
    # ~38.8 km south of the (139°50'E, 36N) origin
    fwd9 = T._tm_code_fns(6677)[0]
    x, y = fwd9(np.array([[139.74, 35.65]]))[0]
    assert -9000 < x < -8000 and -39400 < y < -38400

    # column path: st_to_srid dispatches the new codes and round-trips
    df = spark.createDataFrame(
        [(1, 139.74, 35.65, 6677), (2, 126.98, 37.57, 5186)],
        ["id", "lon", "lat", "code"],
    )
    for code in (6677, 5186):
        sub = df.where(F.col("code") == code)
        pt = st.st_set_srid(st.st_point("lon", "lat"), 4326)
        back = sub.select(
            st.st_x(st.st_to_srid(st.st_to_srid(pt, code), 4326)).alias("lon2")).first()
        assert abs(back["lon2"] - sub.first()["lon"]) < 1e-9


def test_orc_roundtrip(spark, tmp_path):
    """r4f: .orc joins the format envelope — Spark-native columnar, the
    EWKB binary column round-trips byte-identical (incl. SRID header)."""
    df = st.geodataframe(spark.createDataFrame(
        [(1, "SRID=4326;POINT (1 2)"),
         (2, "SRID=4326;POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")],
        ["id", "geometry"]))
    p = str(tmp_path / "out.orc")
    write_file(df, p)
    back = read_file(spark, p)
    got = {r["id"]: (r["wkt"], r["srid"]) for r in back.select(
        "id", st.st_to_wkt("geometry").alias("wkt"),
        st.st_srid("geometry").alias("srid")).collect()}
    assert got[1] == ("POINT (1 2)", 4326)
    assert got[2][1] == 4326
    raw = {r["id"]: bytes(r["geometry"]) for r in df.collect()}
    rawb = {r["id"]: bytes(r["geometry"]) for r in back.collect()}
    assert raw == rawb


def test_crs_column_wrappers(spark):
    """r5: st_crs_from_code / st_crs_authority — distributed forms of the
    crs helpers; unknown codes/definitions yield NULL, not errors."""
    from pyspark.sql import functions as F

    import polars_st_spark as st

    df = spark.createDataFrame(
        [(32601,), (32733,), (4326,), (27700,), (999999,), (None,)],
        ["code"])
    rows = df.select(
        "code",
        st.st_crs_from_code("code").alias("wkt"),
        st.st_crs_authority(st.st_crs_from_code("code")).alias("auth"),
    ).collect()
    got = {r["code"]: (r["wkt"], r["auth"]) for r in rows}
    assert got[32601] == ('PROJCRS["WGS 84 / UTM zone 1N",ID["EPSG",32601]]',
                          "EPSG:32601")
    assert got[32733][1] == "EPSG:32733"
    assert got[4326] == ('GEOGCRS["WGS 84",ID["EPSG",4326]]', "EPSG:4326")
    assert got[27700][1] == "EPSG:27700"
    assert got[999999] == (None, None)
    assert got[None] == (None, None)
    # 'AUTH:code' passthrough form
    one = spark.range(1).select(
        st.st_crs_authority(F.lit("epsg:3857")).alias("a")).first()
    assert one["a"] == "EPSG:3857"
