"""PROJ.4-string CRS registry (functions/proj4.py): parity against the
built-in EPSG table, round-trips, and st_to_srid integration."""

import numpy as np
import pytest

from polars_st_spark.functions import proj4 as P
from polars_st_spark.functions import transform as T

PTS = np.array([
    [-0.1276, 51.5072],   # London
    [2.3522, 48.8566],    # Paris
    [14.42, 50.09],       # Prague
    [-118.24, 34.05],     # LA
    [5.38, 52.15],        # NL
])


def _builtin(code):
    return T._code_fns_builtin(code)


def _close(a, b, tol):
    assert np.max(np.abs(a[:, :2] - b[:, :2])) < tol, (a, b)


def test_parse_and_errors():
    p = P.parse_proj4("+proj=tmerc +lat_0=49 +south +k=0.9996")
    assert p == {"proj": "tmerc", "lat_0": "49", "south": True, "k": "0.9996"}
    with pytest.raises(ValueError, match="proj"):
        P.parse_proj4("+lat_0=49")
    with pytest.raises(ValueError, match="malformed"):
        P.parse_proj4("proj=tmerc")
    with pytest.raises(ValueError, match="unsupported projection"):
        P.build_proj4("+proj=igh")
    with pytest.raises(ValueError, match="ellipsoid"):
        P.build_proj4("+proj=tmerc +ellps=banana")
    with pytest.raises(ValueError, match="towgs84"):
        P.build_proj4("+proj=longlat +towgs84=1,2")


# region-local round-trip points for projections that are not globally
# invertible (oblique Mercator / Krovak wrap on the far side of the world)
_LOCAL_PTS = {
    29873: np.array([[115.0, 4.0], [114.2, 4.8], [117.5, 5.5]]),
    5514: np.array([[14.42, 50.09], [17.1, 48.15], [12.9, 49.5]]),
    2056: np.array([[7.44, 46.95], [8.54, 47.38], [6.14, 46.2]]),
    28992: np.array([[5.38, 52.15], [4.9, 52.37], [6.57, 53.22]]),
}


@pytest.mark.parametrize("code,defn,tol", [
    # UTM 33N via +proj=utm and via explicit tmerc — same Krüger core
    (32633, "+proj=utm +zone=33 +ellps=WGS84", 1e-8),
    (32733, "+proj=utm +zone=33 +south +ellps=WGS84", 1e-8),
    (32633, "+proj=tmerc +lat_0=0 +lon_0=15 +k=0.9996 +x_0=500000 +y_0=0 "
            "+ellps=WGS84", 1e-8),
    # OSGB36 British National Grid with the EPSG:1314 Helmert
    (27700, "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000 "
            "+y_0=-100000 +ellps=airy "
            "+towgs84=446.448,-125.157,542.06,0.1502,0.247,0.8421,-20.4894", 1e-6),
    # Lambert-93 (LCC 2SP, GRS80, no shift)
    (2154, "+proj=lcc +lat_0=46.5 +lon_0=3 +lat_1=49 +lat_2=44 +x_0=700000 "
           "+y_0=6600000 +ellps=GRS80", 1e-8),
    # California zone 5 in US survey feet (r11: builtin now carries the
    # EPSG ftUS-defined false origin 6561666.667 exactly, matching the
    # proj string's metric equivalent to ~1e-10 m)
    (2229, "+proj=lcc +lat_0=33.5 +lon_0=-118 "
           "+lat_1=34.0333333333333333 +lat_2=35.4666666666666667 "
           "+x_0=2000000.0001016 +y_0=500000.0001016002 +ellps=GRS80 "
           "+units=us-ft", 1e-5),
    # Conus Albers
    (5070, "+proj=aea +lat_0=23 +lon_0=-96 +lat_1=29.5 +lat_2=45.5 "
           "+ellps=GRS80", 1e-8),
    # LAEA Europe
    (3035, "+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 "
           "+ellps=GRS80", 1e-8),
    # World Mercator
    (3395, "+proj=merc +lon_0=0 +k=1 +ellps=WGS84", 1e-8),
    # Antarctic Polar Stereographic (variant B)
    (3031, "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +ellps=WGS84", 1e-8),
    # Amersfoort / RD New (oblique stereographic + Helmert)
    (28992, "+proj=sterea +lat_0=52.1561605555556 +lon_0=5.38763888888889 "
            "+k_0=0.9999079 +x_0=155000 +y_0=463000 +ellps=bessel "
            "+towgs84=565.2369,50.0087,465.658,"
            "-0.406857,0.350733,-1.87035,4.0812", 1e-5),
    # Swiss LV95
    (2056, "+proj=somerc +lat_0=46.9524055555556 +lon_0=7.43958333333333 "
           "+k_0=1 +x_0=2600000 +y_0=1200000 +ellps=bessel "
           "+towgs84=674.374,15.056,405.346", 1e-5),
    # Timbalai / RSO Borneo (Hotine variant B)
    (29873, "+proj=omerc +lat_0=4 +lonc=115 +alpha=53.3158204722 "
            "+gamma=53.1301023611 +k=0.99984 +x_0=590476.87 +y_0=442857.65 "
            "+ellps=evrst30 +towgs84=-679,669,-48", 2e-4),
    # S-JTSK / Krovak East North (alpha as the exact EPSG DMS 30°17'17.3031";
    # the classic proj-string 30.28813972... differs in the 8th decimal and
    # moves the grid ~3 mm)
    (5514, "+proj=krovak +lat_0=49.5 +lon_0=24.8333333333333333 "
           "+alpha=30.28813975 +k=0.9999 +x_0=0 +y_0=0 +ellps=bessel "
           "+towgs84=570.8,85.7,462.8,4.998,1.587,5.261,3.56", 1e-5),
])
def test_parity_with_builtin(code, defn, tol):
    fwd, inv = P.build_proj4(defn)
    bfwd, binv = _builtin(code)
    pts = _LOCAL_PTS.get(code, PTS)
    got = fwd(pts.copy())
    want = bfwd(pts.copy())
    _close(got, want, tol)
    back = inv(got.copy())
    _close(back, pts, 1e-6)


def test_lcc_1sp_roundtrip_and_scale():
    # 1SP with k0: unit scale at the standard parallel, 1e-9 round-trip
    fwd, inv = P.build_proj4(
        "+proj=lcc +lat_1=18 +lat_0=18 +lon_0=-77 +k_0=1 +x_0=250000 "
        "+y_0=150000 +ellps=clrk66")  # JAD69 / Jamaica National Grid shape
    pts = np.array([[-77.0, 18.0], [-76.5, 18.3], [-78.2, 17.8]])
    out = fwd(pts.copy())
    # natural origin -> false origin exactly
    assert out[0, 0] == pytest.approx(250000.0, abs=1e-6)
    assert out[0, 1] == pytest.approx(150000.0, abs=1e-6)
    _close(inv(out.copy()), pts, 1e-9)
    # local scale ~1 at the standard parallel: 0.01° east ≈ cos(18°)·dlon·a
    a = 6378206.4
    d = fwd(np.array([[-77.005, 18.0], [-76.995, 18.0]]))
    dist = np.hypot(d[1, 0] - d[0, 0], d[1, 1] - d[0, 1])
    arc = np.radians(0.01) * np.cos(np.radians(18.0)) * a
    assert dist == pytest.approx(arc, rel=2e-3)


def test_longlat_with_datum_shift():
    # geographic CRS on OSGB36 datum: pure Helmert, degrees in/out
    fwd, inv = P.build_proj4(
        "+proj=longlat +ellps=airy "
        "+towgs84=446.448,-125.157,542.06,0.1502,0.247,0.8421,-20.4894")
    out = fwd(PTS.copy())
    # shift is ~100 m ~ 1e-3 deg, never zero, never huge
    d = np.abs(out[:, :2] - PTS[:, :2])
    assert 1e-5 < np.max(d) < 5e-2
    _close(inv(out.copy()), PTS, 1e-6)


def test_webmerc_and_to_meter():
    fwd, _ = P.build_proj4("+proj=webmerc +a=6378137")
    b = _builtin(3857)[0](PTS.copy())
    _close(fwd(PTS.copy()), b, 1e-6)
    # +to_meter: kilometre axis
    fkm, ikm = P.build_proj4("+proj=webmerc +a=6378137 +to_meter=1000")
    outkm = fkm(PTS.copy())
    _close(outkm * np.array([1000.0, 1000.0, 1][:outkm.shape[1]]), b, 1e-3)
    _close(ikm(outkm.copy()), PTS, 1e-9)


def test_register_and_spark_integration(spark):
    import polars_st_spark as st
    from pyspark.sql import functions as F

    code = 900913
    P.register_proj4(code, "+proj=utm +zone=31 +ellps=WGS84")
    try:
        df = spark.range(50).select(
            st.st_point(
                F.lit(3.0) + F.col("id") * 0.01, F.lit(48.0) + F.col("id") * 0.01
            ).alias("pt"))
        df = df.select(st.st_set_srid("pt", 4326).alias("pt"))
        out = df.select(
            st.st_srid(st.st_to_srid("pt", code)).alias("srid"),
            st.st_x(st.st_to_srid("pt", code)).alias("x"),
            st.st_y(st.st_to_srid("pt", code)).alias("y"),
        ).collect()
        bf = _builtin(32631)[0]
        want = bf(np.array([[3.0 + i * 0.01, 48.0 + i * 0.01] for i in range(50)]))
        got = np.array([[r["x"], r["y"]] for r in out])
        assert all(r["srid"] == code for r in out)
        _close(got, want, 1e-6)
        # composition custom -> builtin through 4326
        back = df.select(
            st.st_x(st.st_to_srid(st.st_to_srid("pt", code), 3857)).alias("x")
        ).collect()
        wm = _builtin(3857)[0](np.array([[3.0 + i * 0.01, 48.0 + i * 0.01]
                                         for i in range(50)]))
        assert np.allclose([r["x"] for r in back], wm[:, 0], atol=1e-6)
    finally:
        P.unregister_proj4(code)


def test_register_guards():
    with pytest.raises(ValueError, match="built-in"):
        P.register_proj4(32633, "+proj=utm +zone=33 +ellps=WGS84")
    with pytest.raises(ValueError, match="nonzero"):
        P.register_proj4(0, "+proj=utm +zone=33 +ellps=WGS84")


def test_randomized_param_roundtrips():
    """Seeded random projection parameters: every family round-trips its
    region and maps the natural origin to the false origin (the invariants
    any parameter combination must satisfy)."""
    import random

    rng = random.Random(23)
    ellps = ["WGS84", "GRS80", "airy", "bessel", "intl", "clrk66", "krass"]
    for _ in range(12):
        e = rng.choice(ellps)
        fe, fn = rng.uniform(0, 1e6), rng.uniform(-1e5, 1e6)
        lat0 = rng.uniform(-60, 60)
        lon0 = rng.uniform(-170, 170)
        kind = rng.choice(["tmerc", "lcc2", "lcc1", "aea", "laea", "merc"])
        if kind == "tmerc":
            defn = (f"+proj=tmerc +lat_0={lat0} +lon_0={lon0} "
                    f"+k={rng.uniform(0.9995, 1.0)} +x_0={fe} +y_0={fn} +ellps={e}")
        elif kind == "lcc2":
            l1, l2 = sorted((abs(lat0) + 2, abs(lat0) + rng.uniform(4, 12)))
            lat0 = (l1 + l2) / 2
            defn = (f"+proj=lcc +lat_0={lat0} +lon_0={lon0} +lat_1={l1} "
                    f"+lat_2={l2} +x_0={fe} +y_0={fn} +ellps={e}")
        elif kind == "lcc1":
            lat0 = abs(lat0) + 5
            defn = (f"+proj=lcc +lat_0={lat0} +lat_1={lat0} +lon_0={lon0} "
                    f"+k_0={rng.uniform(0.999, 1.0)} +x_0={fe} +y_0={fn} +ellps={e}")
        elif kind == "aea":
            l1, l2 = sorted((abs(lat0) + 2, abs(lat0) + rng.uniform(4, 12)))
            defn = (f"+proj=aea +lat_0={lat0} +lon_0={lon0} +lat_1={l1} "
                    f"+lat_2={l2} +x_0={fe} +y_0={fn} +ellps={e}")
        elif kind == "laea":
            defn = f"+proj=laea +lat_0={lat0} +lon_0={lon0} +x_0={fe} +y_0={fn} +ellps={e}"
        else:
            lat0 = 0.0
            defn = (f"+proj=merc +lon_0={lon0} +lat_ts={rng.uniform(0, 40)} "
                    f"+x_0={fe} +y_0={fn} +ellps={e}")
        fwd, inv = P.build_proj4(defn)
        # natural origin -> false origin (exact to float noise)
        org = fwd(np.array([[lon0, lat0]]))
        assert abs(org[0, 0] - fe) < 1e-5 and abs(org[0, 1] - fn) < 1e-5, defn
        # regional round-trip
        pts = np.array([
            [lon0 + dx, lat0 + dy]
            for dx in (-2.0, 0.7, 3.1) for dy in (-1.5, 0.4, 2.2)
        ])
        back = inv(fwd(pts.copy()).copy())
        assert np.max(np.abs(back - pts)) < 1e-7, defn
