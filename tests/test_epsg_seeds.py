"""Long-tail EPSG seed registry (functions/epsg_seeds.py): every seed must
build through build_proj4, map its natural origin to its false origin
exactly (parameter-plumbing check), and round-trip fwd->inv including the
datum wrap. Spot values for the new LAEA aspects are pinned against the
Snyder PP 1395 worked example in test_functions-style numeric form."""

from __future__ import annotations

import math

import numpy as np
import pytest

from polars_st_spark.functions import proj4 as P
from polars_st_spark.functions import transform as T
from polars_st_spark.functions.epsg_seeds import (
    _EPSG_PROJ4,
    proj4_for_epsg,
    seeded_epsg_codes,
)

ALL_CODES = seeded_epsg_codes()


def _params(code):
    return P.parse_proj4(_EPSG_PROJ4[code])


def _origin(params):
    """(lon, lat, expected_x, expected_y) natural->false origin, or None
    for geographic CRSs."""
    proj = params["proj"]
    if proj == "longlat":
        return None
    if proj == "omerc":
        # Hotine's natural origin does NOT map (lonc, lat_0) -> (x_0, y_0)
        # (the center offset u_c / grid rotation apply); the r11 omerc
        # seeds are pinned against the EPSG GN7-2 Timbalai worked example
        # in test_omerc_seeds_pinned instead.
        return None
    if proj == "utm":
        z = int(float(params["zone"]))
        return (z * 6 - 183.0, 0.0, 500000.0,
                10000000.0 if params.get("south") else 0.0)
    lon0 = float(params.get("lon_0", 0.0))
    lat0 = float(params.get("lat_0", 0.0))
    return (lon0, lat0, float(params.get("x_0", 0.0)),
            float(params.get("y_0", 0.0)))


def test_every_seed_builds():
    assert len(ALL_CODES) > 300
    for code in ALL_CODES:
        fwd, inv = P.build_proj4(_EPSG_PROJ4[code])
        assert callable(fwd) and callable(inv)


@pytest.mark.parametrize("code", ALL_CODES)
def test_natural_origin_maps_to_false_origin(code):
    params = _params(code)
    o = _origin(params)
    if o is None:
        return
    lon0, lat0, x0, y0 = o
    a, f = P._ellipsoid(params)
    fwd, _ = P._base_projection(params, a, f)  # no datum: CRS's own coords
    out = fwd(np.array([[lon0, lat0]]))
    assert abs(out[0, 0] - x0) < 1e-5, (code, out[0], x0, y0)
    assert abs(out[0, 1] - y0) < 1e-5, (code, out[0], x0, y0)


@pytest.mark.parametrize("code", ALL_CODES)
def test_roundtrip_near_origin(code):
    params = _params(code)
    o = _origin(params)
    if o is None:
        lon0, lat0 = 10.0, 50.0
    else:
        lon0, lat0 = o[0], o[1]
    # stay inside the projection's domain: pull polar origins equatorward
    lat0 = max(min(lat0, 84.0), -84.0)
    pts = np.array([
        [lon0, lat0],
        [lon0 + 1.5, lat0 + 1.0],
        [lon0 - 1.0, lat0 - 0.8],
    ])
    pts[:, 1] = np.clip(pts[:, 1], -85.0, 85.0)
    fwd, inv = P.build_proj4(_EPSG_PROJ4[code])  # full pair incl. datum
    rt = inv(fwd(pts.copy()))
    d = np.abs(rt - pts)
    d[:, 0] = np.minimum(d[:, 0], 360.0 - d[:, 0])  # longitude wrap
    # the 2-D height-drop round-trip loss scales with the Helmert
    # translation magnitude (PROJ drops height identically): ~1.2e-6 deg
    # for the ~850 m Kertau/Batavia shifts, <1e-6 for everything smaller
    tw = params.get("towgs84")
    shift = (max(abs(float(v)) for v in str(tw).split(",")[:3])
             if tw and tw is not True else 0.0)
    tol = 1e-6 if shift <= 600 else 2.5e-6
    assert d.max() < tol, (code, rt, pts)


def test_code_fns_builtin_resolves_seeds():
    for code in (32233, 20255, 21458, 4497, 3946, 5110, 2180, 6931, 2163,
                 32661, 4269, 4277):
        assert T._code_fns_builtin(code) is not None, code
    # unknown code still unresolved
    assert T._code_fns_builtin(999999) is None


def test_lookup_transform_composes_through_wgs84():
    # NAD83 geographic (seed, null shift) -> NAD83 / UTM 17N (built-in):
    # the composition must behave exactly like 4326 -> 26917
    f_seed = T._lookup_transform(4269, 26917)
    f_ref = T._lookup_transform(4326, 26917)
    pts = np.array([[-81.0, 43.0], [-79.4, 44.2]])
    assert np.allclose(f_seed(pts.copy()), f_ref(pts.copy()), atol=1e-9)


def test_seeded_code_cannot_be_shadowed():
    with pytest.raises(ValueError, match="built-in"):
        P.register_proj4(2180, "+proj=tmerc +lon_0=19 +ellps=GRS80")


def test_ups_variant_a_scale_equivalence():
    # UPS expresses k0=0.994 (variant A) through the exact equivalent
    # standard parallel; verify scale at the pole via the EPSG GN7-2
    # closed form for polar stereographic variant B
    a, rf = 6378137.0, 298.257223563
    f = 1 / rf
    e = math.sqrt(f * (2 - f))
    p = math.radians(81.11451786859362)
    s = math.sin(p)
    m = math.cos(p) / math.sqrt(1 - e * e * s * s)
    t = math.tan(math.pi / 4 - p / 2) * ((1 + e * s) / (1 - e * s)) ** (e / 2)
    k0 = (m / 2) * math.sqrt((1 + e) ** (1 + e) * (1 - e) ** (1 - e)) / t
    assert abs(k0 - 0.994) < 1e-12


def test_laea_polar_snyder_example():
    # Snyder PP 1395 p. 358: International 1909 ellipsoid (a=6378388,
    # e2=0.00672267), polar aspect lat_0=90 lon_0=-100; phi=80N lam=5E
    # -> x=1077459.7, y=288704.5
    a = 6378388.0
    f = 1 - math.sqrt(1 - 0.00672267)
    fwd = T._laea_polar_fwd(a, f, 90.0, -100.0, 0.0, 0.0)
    out = fwd(np.array([[5.0, 80.0]]))
    assert abs(out[0, 0] - 1077459.7) < 0.1
    assert abs(out[0, 1] - 288704.5) < 0.1
    inv = T._laea_polar_inv(a, f, 90.0, -100.0, 0.0, 0.0)
    rt = inv(out.copy())
    assert abs(rt[0, 0] - 5.0) < 1e-9 and abs(rt[0, 1] - 80.0) < 1e-9


def test_laea_sphere_matches_ellipsoid_limit():
    fwd_s = T._laea_sphere_fwd(6370997.0, 45.0, -100.0, 0.0, 0.0)
    fwd_e = T._laea_forward(6370997.0, 1e-9, 45.0, -100.0, None, None, 0.0, 0.0)
    pts = np.array([[-100.0, 45.0], [-95.0, 40.0], [-110.0, 55.0]])
    assert np.abs(fwd_s(pts.copy()) - fwd_e(pts.copy())).max() < 0.1


def test_proj4_for_epsg_lookup():
    assert proj4_for_epsg(2180).startswith("+proj=tmerc")
    assert proj4_for_epsg(424242) is None


# --- r11 wave: cea / eqc methods, +axis flips, omerc seeds ---------------

def test_cea_snyder_example():
    # Snyder PP 1395 pp. 281-282: Clarke 1866, lat_ts=5, lon_0=-75;
    # (lat 10N, lon 78W) -> x=-332699.8, y=1104391.2
    fwd, inv = P.build_proj4(
        "+proj=cea +lat_ts=5 +lon_0=-75 +a=6378206.4 +rf=294.978698213898")
    out = fwd(np.array([[-78.0, 10.0]]))
    assert abs(out[0, 0] - (-332699.8)) < 0.1
    assert abs(out[0, 1] - 1104391.2) < 0.1
    rt = inv(out.copy())
    assert abs(rt[0, 0] + 78.0) < 1e-8 and abs(rt[0, 1] - 10.0) < 1e-8


def test_ease2_global_seed():
    # EASE-Grid 2.0 global (EPSG 6933): cea lat_ts=30 on WGS84. The
    # published x half-extent is 17367530.45 (the NSIDC grid constant);
    # the y half-extent is checked by the EQUAL-AREA invariant: the full
    # cylinder 2xmax * 2ymax must equal the WGS84 authalic sphere's
    # surface 4*pi*Ra^2 (Ra = 6371007.1809).
    fwd, inv = T._code_fns(6933)
    out = fwd(np.array([[180.0, 90.0], [0.0, 0.0]]))
    assert abs(out[0, 0] - 17367530.45) < 0.5
    area = 4.0 * out[0, 0] * out[0, 1]
    ra = 6371007.1809
    assert abs(area / (4 * math.pi * ra * ra) - 1.0) < 1e-7
    assert abs(out[1, 0]) < 1e-6 and abs(out[1, 1]) < 1e-6
    rt = inv(out.copy())
    assert abs(rt[0, 0] - 180.0) < 1e-6 and abs(rt[0, 1] - 90.0) < 1e-6


def test_eqc_world_equidistant_seed():
    # EPSG 4087 (World Equidistant Cylindrical, ellipsoidal method 1028):
    # y(lat) is the meridian arc — M(90) on WGS84 = 10001965.729
    fwd, inv = T._code_fns(4087)
    out = fwd(np.array([[0.0, 90.0], [10.0, 50.0]]))
    assert abs(out[0, 1] - 10001965.729) < 0.01
    assert abs(out[1, 0] - 1113194.908) < 0.01
    rt = inv(out.copy())
    # series-truncation round-trip: ~2.6e-9 deg (sub-mm) at mid latitudes
    assert np.abs(rt[:, :2] - [[0.0, 90.0], [10.0, 50.0]]).max() < 1e-7


def test_sa_lo_axis_wsu():
    # Hartebeesthoek94 / Lo19 (EPSG 2048): westing/southing axes — Cape
    # Town (18.42E, 33.93S) must land POSITIVE on both axes, and the
    # east-of-CM point must have NEGATIVE westing.
    fwd, inv = T._code_fns(2048)
    out = fwd(np.array([[18.42, -33.93], [19.5, -30.0]]))
    assert out[0, 0] > 0 and out[0, 1] > 0
    assert out[1, 0] < 0  # east of the 19E CM -> negative westing
    rt = inv(out.copy())
    assert np.abs(rt[:, :2] - [[18.42, -33.93], [19.5, -30.0]]).max() < 1e-7


def test_axis_swap_raises():
    with pytest.raises(ValueError, match="axis"):
        P.build_proj4("+proj=tmerc +lon_0=0 +ellps=WGS84 +axis=neu")


def test_omerc_seeds_pinned():
    # Variant B kernel is pinned to the EPSG GN7-2 Timbalai worked example
    # in test_io_crs/test_proj4. Here: (a) the variant-A seeds (no_uoff)
    # differ from their variant-B twin by a CONSTANT grid vector (the u_c
    # offset rotated into grid) — the defining A<->B relationship; (b) the
    # Michigan GeoRef center regression-pins to its grid-positive design
    # values (computed with the GN7-2-validated kernel).
    defn_a = _EPSG_PROJ4[3375]
    defn_b = defn_a.replace(" +no_uoff", "")
    fwd_a, _ = P.build_proj4(defn_a)
    fwd_b, _ = P.build_proj4(defn_b)
    pts = np.array([[101.7, 3.15], [103.0, 5.0], [100.5, 6.2]])
    d = fwd_a(pts.copy())[:, :2] - fwd_b(pts.copy())[:, :2]
    assert np.abs(d - d[0]).max() < 1e-6
    assert np.abs(d[0]).max() > 1000.0  # the offset is real, not a no-op
    fwd_mi, inv_mi = T._code_fns(3078)
    c = fwd_mi(np.array([[-86.0, 45.30916666666666]]))
    assert abs(c[0, 0] - 499840.252) < 0.01
    assert abs(c[0, 1] - 528600.303) < 0.01
    rt = inv_mi(c.copy())
    assert abs(rt[0, 0] + 86.0) < 1e-8


def test_r11_wave_count_and_resolution():
    # every r11 family resolves through _code_fns (seed -> build_proj4)
    for code in (2225, 2230, 2240, 2248, 2249, 2250, 2272, 2285, 3071,
                 3078, 3979, 3578, 3003, 3004, 3021, 28600, 2932, 3997,
                 5234, 3375, 3168, 3376, 6933, 3410, 4087, 32662, 4088,
                 3408, 3411, 3412, 2945, 2952, 2955, 2958, 2046, 2055,
                 3114, 3118, 22171, 22177, 2391, 2394, 2206, 2212, 22991,
                 22994, 3148, 3149, 24047, 24048, 3405, 3406, 3121, 3125,
                 24378, 24382, 5185, 5188, 30161, 30170):
        assert T._code_fns(code) is not None, code


def test_stateplane_ftus_units():
    # EPSG 2229 (California zone 5 ftUS): the false origin in FEET is
    # x_0 / 0.3048006096... = 6561666.667 ftUS
    fwd, inv = T._code_fns(2229)
    out = fwd(np.array([[-118.0, 33.5]]))
    assert abs(out[0, 0] - 2000000.0001016 / 0.30480060960121924) < 0.01
    rt = inv(out.copy())
    assert abs(rt[0, 0] + 118.0) < 1e-7 and abs(rt[0, 1] - 33.5) < 1e-7


def test_cass_snyder_example():
    # Snyder PP 1395 pp. 287-288: Cassini, Clarke 1866, lat_0=40,
    # lon_0=-75; (43N, 73W) -> x=163071.1, y=335127.6; Newton-polished
    # inverse round-trips to float precision
    fwd, inv = P.build_proj4(
        "+proj=cass +lat_0=40 +lon_0=-75 +a=6378206.4 +rf=294.978698213898")
    o = fwd(np.array([[-73.0, 43.0]]))
    assert abs(o[0, 0] - 163071.1) < 0.1 and abs(o[0, 1] - 335127.6) < 0.1
    rt = inv(o.copy())
    assert abs(rt[0, 0] + 73.0) < 1e-10 and abs(rt[0, 1] - 43.0) < 1e-10


def test_poly_snyder_example():
    # Snyder PP 1395 pp. 303-304: Polyconic, Clarke 1866, lat_0=30,
    # lon_0=-96; (40N, 75W) -> x=1776774.5, y=1319657.8; equator row takes
    # the closed-form x = a*lam branch
    fwd, inv = P.build_proj4(
        "+proj=poly +lat_0=30 +lon_0=-96 +a=6378206.4 +rf=294.978698213898")
    o = fwd(np.array([[-75.0, 40.0], [-90.0, 0.0]]))
    assert abs(o[0, 0] - 1776774.5) < 0.1 and abs(o[0, 1] - 1319657.8) < 0.1
    rt = inv(o.copy())
    assert np.abs(rt[:, :2] - [[-75.0, 40.0], [-90.0, 0.0]]).max() < 1e-9


def test_cass_poly_seeds_resolve():
    for code in (28191, 30200, 24500, 29101, 5880):
        assert T._code_fns(code) is not None, code
    # Trinidad 1903 carries Clarke-link units: the natural origin in the
    # CRS's OWN coordinates (base projection / unit, no datum shift) must
    # be the EPSG-registry 430000 / 325000 links
    params = P.parse_proj4(_EPSG_PROJ4[30200])
    a, f = P._ellipsoid(params)
    base_f, _ = P._base_projection(params, a, f)
    o = base_f(np.array([[-61.33333333333334, 10.44166666666667]]))
    to_m = float(params["to_meter"])
    assert abs(o[0, 0] / to_m - 430000.0) < 1e-3
    assert abs(o[0, 1] / to_m - 325000.0) < 1e-3
