"""PROJ.4-string CRS support: parse a proj string, build a (forward,
inverse) WGS84↔CRS transform from the engine's closed-form projection
cores, and register it under a user-chosen SRID so ``st_to_srid``
composes it with every built-in code.

This closes the reference's "reproject between arbitrary CRS pairs"
capability (reference: functions.rs:1868-1939 via proj4rs) without a
proj dependency: any CRS expressible over the implemented projection
methods — Transverse Mercator (+utm), Lambert Conformal Conic 1SP/2SP,
Albers, Lambert Azimuthal Equal Area, ellipsoidal + spherical Mercator,
Polar Stereographic (variant B), Oblique Stereographic, Swiss oblique
cylindrical, Hotine Oblique Mercator A/B, Krovak, Lambert Cylindrical
Equal Area (+cea — EASE-Grid 2.0), Equidistant Cylindrical / Plate
Carree (+eqc, ellipsoidal EPSG method 1028), and geographic (longlat) —
with any ellipsoid (+ellps/+a/+b/+rf/+f), any Helmert ``+towgs84`` 3- or
7-parameter datum shift (position-vector convention, EPSG 9606 — the
proj convention), NTv2 grid-shift datums via ``+nadgrids=`` (register
the ``.gsb`` bytes first with ``functions.ntv2.register_nadgrid``; grids
resolve at ``build_proj4`` time, so register them BEFORE
``register_proj4``), axis units (+units/+to_meter), and axis-direction
sign flips (+axis=wsu — the South Africa Lo grids; order swaps raise).

The proj parameter language is public (PROJ documentation); all
projection math references Snyder PP 1395 / EPSG Guidance Note 7-2 and
lives in functions/transform.py.

Example::

    from polars_st_spark.functions.proj4 import register_proj4
    register_proj4(900914, "+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 "
                   "+lon_0=3 +x_0=700000 +y_0=6600000 +ellps=GRS80")
    df.select(st.st_to_srid("geom", 900914))   # now a normal SRID
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["build_proj4", "parse_proj4", "register_proj4", "unregister_proj4"]

# proj ellipsoid names -> engine ellipsoid table keys
_ELLPS_ALIASES = {
    "WGS84": "WGS84",
    "GRS80": "GRS80",
    "airy": "AIRY1830",
    "bessel": "BESSEL1841",
    "intl": "INTL1924",
    "clrk66": "CLARKE1866",
    "krass": "KRASSOWSKY1940",
    "evrst30": "EVEREST1967",
}

_FT = 0.3048
_FTUS = 1200.0 / 3937.0
_UNITS = {"m": 1.0, "ft": _FT, "us-ft": _FTUS}


def parse_proj4(defn: str) -> dict:
    """``"+proj=tmerc +lat_0=49 +south"`` → ``{"proj": "tmerc",
    "lat_0": "49", "south": True}``. Unknown keys are kept (and ignored
    by :func:`build_proj4` unless they change the math)."""
    out: dict = {}
    for tok in defn.split():
        if not tok.startswith("+"):
            raise ValueError(f"malformed proj4 token {tok!r}")
        body = tok[1:]
        if "=" in body:
            k, v = body.split("=", 1)
            out[k] = v
        else:
            out[body] = True
    if "proj" not in out:
        raise ValueError("proj4 string must contain +proj=")
    return out


def _f(params: dict, key: str, default: float | None = None) -> float:
    v = params.get(key)
    if v is None:
        if default is None:
            raise ValueError(f"proj4: required parameter +{key}= missing")
        return default
    return float(v)


def _ellipsoid(params: dict) -> tuple[float, float]:
    from polars_st_spark.functions.transform import _ELLIPSOIDS

    if "ellps" in params:
        name = params["ellps"]
        key = _ELLPS_ALIASES.get(name)
        if key is None:
            raise ValueError(f"proj4: unknown ellipsoid {name!r} "
                             f"(supported: {sorted(_ELLPS_ALIASES)})")
        return _ELLIPSOIDS[key]
    if "a" in params:
        a = _f(params, "a")
        if "b" in params:
            b = _f(params, "b")
            return a, (a - b) / a
        if "rf" in params:
            return a, 1.0 / _f(params, "rf")
        if "f" in params:
            return a, _f(params, "f")
        return a, 0.0  # sphere
    if "R" in params:
        return _f(params, "R"), 0.0
    return _ELLIPSOIDS["WGS84"]  # proj's default datum


def _datum_pair(params: dict, a_l: float, f_l: float):
    """(from_wgs84, to_wgs84) lon/lat shifts for +towgs84, or (None, None).
    Generic Helmert position-vector (EPSG 9606 — proj's +towgs84
    convention) through geocentric coordinates on the CRS's own ellipsoid,
    mirroring transform._datum_fns."""
    tw = params.get("towgs84")
    if not tw or tw is True:
        return None, None
    vals = [float(x) for x in str(tw).split(",")]
    if len(vals) == 3:
        vals += [0.0, 0.0, 0.0, 0.0]
    if len(vals) != 7:
        raise ValueError("+towgs84 needs 3 or 7 comma-separated values")
    tx, ty, tz, rx, ry, rz, s_ppm = vals
    if (tx, ty, tz, rx, ry, rz, s_ppm) == (0.0,) * 7:
        return None, None
    from polars_st_spark.functions.transform import (
        _ELLIPSOIDS,
        _ecef_to_geodetic,
        _geodetic_to_ecef,
    )

    a_w, f_w = _ELLIPSOIDS["WGS84"]
    as2r = math.pi / (180.0 * 3600.0)
    rxr, ryr, rzr = rx * as2r, ry * as2r, rz * as2r
    M = (1.0 + s_ppm * 1e-6) * np.array(
        [[1.0, -rzr, ryr], [rzr, 1.0, -rxr], [-ryr, rxr, 1.0]]
    )
    T = np.array([tx, ty, tz])
    Minv = np.linalg.inv(M)

    def from_wgs84(lon, lat):
        Xl = (_geodetic_to_ecef(a_w, f_w, lon, lat) - T) @ Minv.T
        return _ecef_to_geodetic(a_l, f_l, Xl)

    def to_wgs84(lon, lat):
        X = _geodetic_to_ecef(a_l, f_l, lon, lat) @ M.T + T
        return _ecef_to_geodetic(a_w, f_w, X)

    return from_wgs84, to_wgs84


def _lcc1sp(a, f, k0, lat0, lat1, lon0, FE, FN):
    """Lambert Conformal Conic 1SP (EPSG 9801; Snyder 15-1..15-11 with
    n = sin φ1 and the k0 scale) — the 2SP core degenerates (0/0 in n)
    when the parallels coincide, so 1SP gets its own closed form.
    PROJ semantics: the cone constant n and F come from the standard
    parallel ``lat1``; the false-northing origin ``rho0`` is evaluated at
    ``lat0`` (they coincide in the plain EPSG 9801 case but differ when a
    proj4 string gives +lat_1 != +lat_0)."""
    from polars_st_spark.functions.transform import _phi_from_t

    e = math.sqrt(f * (2.0 - f))
    p1 = math.radians(lat1)
    p0 = math.radians(lat0)

    def t_of(p):
        return math.tan(math.pi / 4 - p / 2) / (
            (1 - e * math.sin(p)) / (1 + e * math.sin(p))
        ) ** (e / 2)

    def m_of(p):
        return math.cos(p) / math.sqrt(1 - (e * math.sin(p)) ** 2)

    n = math.sin(p1)
    F_ = m_of(p1) / (n * t_of(p1) ** n)
    rho0 = a * F_ * k0 * t_of(p0) ** n
    lam0 = math.radians(lon0)

    def fwd(arr: np.ndarray) -> np.ndarray:
        phi = np.radians(arr[:, 1])
        lam = np.radians(arr[:, 0])
        s = np.sin(phi)
        t = np.tan(np.pi / 4 - phi / 2) / ((1 - e * s) / (1 + e * s)) ** (e / 2)
        rho = a * F_ * k0 * t**n
        th = n * (lam - lam0)
        out = arr.copy()
        out[:, 0] = FE + rho * np.sin(th)
        out[:, 1] = FN + rho0 - rho * np.cos(th)
        return out

    def inv(arr: np.ndarray) -> np.ndarray:
        x = arr[:, 0] - FE
        y = rho0 - (arr[:, 1] - FN)
        rho = np.sign(n) * np.hypot(x, y)
        th = np.arctan2(np.sign(n) * x, np.sign(n) * y)
        t = (rho / (a * F_ * k0)) ** (1.0 / n)
        out = arr.copy()
        out[:, 0] = np.degrees(th / n + lam0)
        out[:, 1] = np.degrees(_phi_from_t(t, e))
        return out

    return fwd, inv


def _spherical_merc(a, FE, FN):
    def fwd(arr: np.ndarray) -> np.ndarray:
        out = arr.copy()
        out[:, 0] = FE + a * np.radians(arr[:, 0])
        out[:, 1] = FN + a * np.log(np.tan(np.pi / 4 + np.radians(arr[:, 1]) / 2))
        return out

    def inv(arr: np.ndarray) -> np.ndarray:
        out = arr.copy()
        out[:, 0] = np.degrees((arr[:, 0] - FE) / a)
        out[:, 1] = np.degrees(2 * np.arctan(np.exp((arr[:, 1] - FN) / a)) - np.pi / 2)
        return out

    return fwd, inv


def _base_projection(params: dict, a: float, f: float):
    """(fwd, inv) on the CRS's OWN geographic coordinates (datum shift and
    axis units are wrapped outside)."""
    from polars_st_spark.functions import transform as T

    proj = params["proj"]
    FE = _f(params, "x_0", 0.0)
    FN = _f(params, "y_0", 0.0)
    k0 = _f(params, "k", _f(params, "k_0", 1.0))
    lat0 = _f(params, "lat_0", 0.0)
    lon0 = _f(params, "lon_0", 0.0)

    if proj in ("longlat", "latlong", "lonlat"):
        ident = lambda arr: arr.copy()  # noqa: E731
        return ident, ident
    if proj == "utm":
        zone = int(_f(params, "zone"))
        if not 1 <= zone <= 60:
            raise ValueError(f"proj4: utm zone {zone} out of range")
        FN_utm = 10000000.0 if params.get("south") else 0.0
        return (
            T._tm_forward_fn(a, f, 0.9996, 0.0, zone * 6 - 183, 500000.0, FN_utm),
            T._tm_inverse_fn(a, f, 0.9996, 0.0, zone * 6 - 183, 500000.0, FN_utm),
        )
    if proj == "tmerc":
        return (
            T._tm_forward_fn(a, f, k0, lat0, lon0, FE, FN),
            T._tm_inverse_fn(a, f, k0, lat0, lon0, FE, FN),
        )
    if proj == "lcc":
        lat1 = _f(params, "lat_1", lat0)
        lat2 = params.get("lat_2")
        if lat2 is None or float(lat2) == lat1:
            # PROJ: cone constant from lat_1 (falling back to lat_0 when
            # absent); rho0 evaluated at lat_0 (default 0)
            return _lcc1sp(a, f, k0, lat0, lat1 if "lat_1" in params else lat0,
                           lon0, FE, FN)
        return (
            T._lcc_forward(a, f, lat0, lon0, lat1, float(lat2), FE, FN),
            T._lcc_inverse(a, f, lat0, lon0, lat1, float(lat2), FE, FN),
        )
    if proj == "aea":
        lat1, lat2 = _f(params, "lat_1"), _f(params, "lat_2")
        return (
            T._albers_forward(a, f, lat0, lon0, lat1, lat2, FE, FN),
            T._albers_inverse(a, f, lat0, lon0, lat1, lat2, FE, FN),
        )
    if proj == "laea":
        return (
            T._laea_forward(a, f, lat0, lon0, None, None, FE, FN),
            T._laea_inverse(a, f, lat0, lon0, None, None, FE, FN),
        )
    if proj == "merc":
        if "lat_ts" in params:
            pts = math.radians(_f(params, "lat_ts"))
            e2 = f * (2.0 - f)
            k0 = math.cos(pts) / math.sqrt(1 - e2 * math.sin(pts) ** 2)
        return (
            T._merc_forward(a, f, k0, lon0, FE, FN),
            T._merc_inverse(a, f, k0, lon0, FE, FN),
        )
    if proj == "webmerc":
        return _spherical_merc(a, FE, FN)
    if proj == "stere":
        if abs(lat0) != 90.0:
            raise ValueError("proj4: only polar +proj=stere (lat_0=±90) is supported; "
                             "use +proj=sterea for the oblique case")
        if "lat_ts" not in params:
            raise ValueError("proj4: polar stere needs +lat_ts (variant B); "
                             "variant A (+k only) is not supported")
        lat_ts = math.copysign(abs(_f(params, "lat_ts")), lat0)
        return (
            T._pstereo_forward(a, f, lat_ts, lon0, FE, FN),
            T._pstereo_inverse(a, f, lat_ts, lon0, FE, FN),
        )
    if proj == "sterea":
        return (
            T._osterea_forward(a, f, k0, lat0, lon0, FE, FN),
            T._osterea_inverse(a, f, k0, lat0, lon0, FE, FN),
        )
    if proj == "somerc":
        # k_0 scales the conformal-sphere radius (kR) in the kernel — the
        # Swiss LV03/LV95 case is k_0=1, Hungarian EOV (EPSG 23700) 0.99993
        return (
            T._swiss_forward(a, f, k0, lat0, lon0, FE, FN),
            T._swiss_inverse(a, f, k0, lat0, lon0, FE, FN),
        )
    if proj == "omerc":
        lonc = _f(params, "lonc", lon0)
        alpha = _f(params, "alpha")
        gamma = _f(params, "gamma", alpha)
        variant = "A" if (params.get("no_uoff") or params.get("no_off")) else "B"
        return (
            T._hotine_forward(a, f, k0, lat0, lonc, alpha, gamma, FE, FN, variant),
            T._hotine_inverse(a, f, k0, lat0, lonc, alpha, gamma, FE, FN, variant),
        )
    if proj == "cass":
        return (
            T._cass_forward(a, f, lat0, lon0, FE, FN),
            T._cass_inverse(a, f, lat0, lon0, FE, FN),
        )
    if proj == "poly":
        return (
            T._poly_forward(a, f, lat0, lon0, FE, FN),
            T._poly_inverse(a, f, lat0, lon0, FE, FN),
        )
    if proj == "cea":
        lat_ts = _f(params, "lat_ts", 0.0)
        return (
            T._cea_forward(a, f, lat_ts, lon0, FE, FN),
            T._cea_inverse(a, f, lat_ts, lon0, FE, FN),
        )
    if proj == "eqc":
        lat_ts = _f(params, "lat_ts", 0.0)
        return (
            T._eqc_forward(a, f, lat_ts, lat0, lon0, FE, FN),
            T._eqc_inverse(a, f, lat_ts, lat0, lon0, FE, FN),
        )
    if proj == "krovak":
        lat1 = _f(params, "lat_1", 78.5)  # Krovak pseudo-standard parallel
        alpha = _f(params, "alpha", 30.28813972222222)
        fwd0, inv0 = (
            T._krovak_forward(a, f, k0, lat0, lon0, alpha, lat1, FE, FN),
            T._krovak_inverse(a, f, k0, lat0, lon0, alpha, lat1, FE, FN),
        )
        if params.get("czech"):  # southwest axes: negate both
            def fwd(arr, _fn=fwd0):
                out = _fn(arr)
                out[:, :2] *= -1.0
                return out

            def inv(arr, _fn=inv0):
                a2 = arr.copy()
                a2[:, :2] *= -1.0
                return _fn(a2)

            return fwd, inv
        return fwd0, inv0
    raise ValueError(f"proj4: unsupported projection {params['proj']!r}")


def build_proj4(defn: str | dict):
    """(forward_from_wgs84, inverse_to_wgs84) numpy array transforms for a
    proj4 definition — the same callable contract as the built-in EPSG
    table, so the result composes through 4326 with every other CRS."""
    params = parse_proj4(defn) if isinstance(defn, str) else dict(defn)
    a, f = _ellipsoid(params)
    base_fwd, base_inv = _base_projection(params, a, f)
    if params.get("nadgrids") and params["nadgrids"] is not True:
        # grid-shift datum (NTv2); takes precedence over +towgs84 like PROJ
        from polars_st_spark.functions.ntv2 import grid_pair

        shift_from, shift_to = grid_pair(str(params["nadgrids"]))
    else:
        shift_from, shift_to = _datum_pair(params, a, f)
    unit = _UNITS.get(params.get("units", "m"))
    if unit is None:
        raise ValueError(f"proj4: unsupported +units={params['units']!r}")
    if "to_meter" in params:
        unit = _f(params, "to_meter")
    # +axis sign flips (PROJ semantics: char 0 = CRS x direction, char 1 =
    # CRS y). 'w'/'s' negate the en-positive projected values — the South
    # Africa Lo grids (+axis=wsu) are the common user. Axis-ORDER swaps
    # ('neu' etc.) are not supported (raise, matching the engine's clear-
    # error contract).
    ax = params.get("axis", "enu")
    if ax is True or len(ax) < 2 or ax[0] not in "ew" or ax[1] not in "ns":
        raise ValueError(f"proj4: unsupported +axis={ax!r} (sign flips only: "
                         "first char e/w, second n/s)")
    sx = -1.0 if ax[0] == "w" else 1.0
    sy = -1.0 if ax[1] == "s" else 1.0

    def fwd(arr: np.ndarray) -> np.ndarray:
        a2 = arr
        if shift_from is not None:
            a2 = arr.copy()
            a2[:, 0], a2[:, 1] = shift_from(arr[:, 0], arr[:, 1])
        out = base_fwd(a2)
        if unit != 1.0:
            out[:, :2] /= unit
        if sx != 1.0:
            out[:, 0] *= sx
        if sy != 1.0:
            out[:, 1] *= sy
        return out

    def inv(arr: np.ndarray) -> np.ndarray:
        a2 = arr
        if unit != 1.0 or sx != 1.0 or sy != 1.0:
            a2 = arr.copy()
            a2[:, 0] *= unit * sx
            a2[:, 1] *= unit * sy
        out = base_inv(a2)
        if shift_to is not None:
            out[:, 0], out[:, 1] = shift_to(out[:, 0], out[:, 1])
        return out

    return fwd, inv


def register_proj4(code: int, defn: str | dict) -> None:
    """Install a proj4-defined CRS under ``code`` so ``st_to_srid(col,
    code)`` (and any composition through 4326) resolves it like a built-in
    EPSG code. Re-registering a code replaces it; built-in codes cannot be
    shadowed. The registry lives in the driver and ships to executors
    inside the reprojection UDF closures (the transform is captured at
    plan-build time, so register BEFORE building the query)."""
    from polars_st_spark.functions import transform as T

    if not isinstance(code, int) or code == 0:
        raise ValueError("code must be a nonzero int")
    if T._code_fns_builtin(code) is not None or code == 4326:
        raise ValueError(f"code {code} is a built-in EPSG code; pick a private one "
                         "(e.g. 900000+)")
    T._CUSTOM_CRS[code] = build_proj4(defn)
    # drop any cached compositions involving this code
    for key in [k for k in T._TRANSFORMS if code in k]:
        del T._TRANSFORMS[key]


def unregister_proj4(code: int) -> None:
    from polars_st_spark.functions import transform as T

    T._CUSTOM_CRS.pop(code, None)
    for key in [k for k in T._TRANSFORMS if code in k]:
        del T._TRANSFORMS[key]
