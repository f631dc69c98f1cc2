"""CRS metadata helpers (reference: crs.rs:11-26, utils/srid.py:10-23).

The reference resolves SRID↔CRS via proj4rs; this runtime has no pyproj, so
a built-in table covers the common EPSG codes (WKT2 name + authority) and
the functions raise clearly for unknown codes. When pyproj is available it
is used transparently.
"""

from __future__ import annotations

__all__ = ["get_crs_from_code", "get_crs_authority"]

_BUILTIN = {
    4326: ('GEOGCRS["WGS 84"', "EPSG", "WGS 84 geographic 2D (lat/lon degrees)"),
    3857: ('PROJCRS["WGS 84 / Pseudo-Mercator"', "EPSG", "Web Mercator (metres)"),
    4269: ('GEOGCRS["NAD83"', "EPSG", "NAD83 geographic 2D"),
    32633: ('PROJCRS["WGS 84 / UTM zone 33N"', "EPSG", "UTM 33N (metres)"),
    2154: ('PROJCRS["RGF93 v1 / Lambert-93"', "EPSG", "France Lambert-93 (LCC)"),
    3347: ('PROJCRS["NAD83 / Statistics Canada Lambert"', "EPSG", "Canada LCC"),
    3978: ('PROJCRS["NAD83 / Canada Atlas Lambert"', "EPSG", "Canada Atlas LCC"),
    32140: ('PROJCRS["NAD83 / Texas South Central"', "EPSG", "Texas South Central LCC (metres)"),
    5070: ('PROJCRS["NAD83 / Conus Albers"', "EPSG", "Conus Albers equal-area"),
    3577: ('PROJCRS["GDA94 / Australian Albers"', "EPSG", "Australian Albers equal-area"),
    3035: ('PROJCRS["ETRS89-extended / LAEA Europe"', "EPSG", "Europe Lambert azimuthal equal-area"),
}


def get_crs_from_code(code: int) -> str:
    """SRID → CRS WKT definition (reference: crs.rs:11-18)."""
    try:
        import pyproj

        return pyproj.CRS.from_epsg(code).to_wkt()
    except ImportError:
        pass
    if code in _BUILTIN:
        return _BUILTIN[code][0]
    raise ValueError(
        f"Unknown EPSG code {code} (no pyproj in runtime; built-in table covers "
        f"{sorted(_BUILTIN)})"
    )


def get_crs_authority(definition: str) -> tuple[str, str] | None:
    """CRS definition or 'AUTH:code' string → (authority, code)
    (reference: crs.rs:20-26)."""
    s = definition.strip()
    if ":" in s and "[" not in s:
        auth, _, code = s.partition(":")
        return (auth.upper(), code)
    try:
        import pyproj

        return pyproj.CRS.from_wkt(s).to_authority()
    except ImportError:
        pass
    for code, (wkt_prefix, auth, _) in _BUILTIN.items():
        if s.startswith(wkt_prefix):
            return (auth, str(code))
    return None
