"""Long-tail EPSG seed registry: EPSG code -> proj4 definition string.

The reference reprojects between arbitrary SRIDs via proj4rs
(/root/reference/src/functions.rs:1868-1939). This repo's closed-form CRS
engine (functions/transform.py + functions/proj4.py) covers the projection
METHODS; this module is pure registry DATA — public EPSG parameter sets
expressed as proj4 strings and resolved through :func:`proj4.build_proj4`,
so every seed exercises the same tested math paths (tmerc/utm/lcc/aea/laea/
merc/stere/sterea/somerc/omerc/krovak + Helmert datum wrap + axis units).

Parameters are from the public EPSG registry (the same values PROJ ships in
its init files). Datums with no published grid-free Helmert set are seeded
WITHOUT +towgs84 — a null shift, matching PROJ's own behavior for those
CRSs (e.g. Xian 1980).

Seeds never shadow the hand-built tables in transform.py (the lookup in
``_code_fns_builtin`` tries those first), so curated entries with NTv2 /
higher-accuracy datum handling always win.
"""

from __future__ import annotations

_EPSG_PROJ4: dict[int, str] = {}


def _seed(code: int, defn: str) -> None:
    _EPSG_PROJ4[code] = defn


# --- geographic CRSs -------------------------------------------------------
# Modern ITRF-aligned datums are WGS84-compatible at the grid-free level
# (null Helmert): reprojection to/from them is an SRID relabel plus nothing.
for _code in (
    4269,   # NAD83
    4258,   # ETRS89
    4283,   # GDA94
    7844,   # GDA2020
    4167,   # NZGD2000
    4674,   # SIRGAS 2000
    4490,   # CGCS2000
    4612,   # JGD2000
    6668,   # JGD2011
    4737,   # Korea 2000
    4755,   # DGN95
    3824,   # TWD97
    4759,   # NAD83(NSRS2007)
    6318,   # NAD83(2011)
    4617,   # NAD83(CSRS)
):
    _seed(_code, "+proj=longlat +ellps=GRS80")
_seed(4148, "+proj=longlat +ellps=WGS84")  # Hartebeesthoek94
# classic datums with published grid-free Helmert sets
_seed(4277, "+proj=longlat +ellps=airy "
            "+towgs84=446.448,-125.157,542.06,0.15,0.247,0.842,-20.489")  # OSGB36
_seed(4267, "+proj=longlat +ellps=clrk66 +towgs84=-8,160,176")            # NAD27
_seed(4230, "+proj=longlat +ellps=intl +towgs84=-87,-98,-121")            # ED50
_seed(4322, "+proj=longlat +a=6378135 +rf=298.26 "
            "+towgs84=0,0,4.5,0,0,0.554,0.2263")                          # WGS72
_seed(4284, "+proj=longlat +ellps=krass "
            "+towgs84=23.92,-141.27,-80.9,0,0.35,0.82,-0.12")             # Pulkovo 1942
_seed(4301, "+proj=longlat +ellps=bessel "
            "+towgs84=-146.414,507.337,680.507")                          # Tokyo

# --- UTM families ----------------------------------------------------------
# WGS 72 / UTM 1N-60N (32201-32260) and 1S-60S (32301-32360)
_W72 = "+a=6378135 +rf=298.26 +towgs84=0,0,4.5,0,0,0.554,0.2263"
for _z in range(1, 61):
    _seed(32200 + _z, f"+proj=utm +zone={_z} {_W72}")
    _seed(32300 + _z, f"+proj=utm +zone={_z} +south {_W72}")
# AGD66 / AMG zones 49-56 (20249-20256) and AGD84 / AMG zones 49-56
# (20349-20356); Australian National Spheroid a=6378160 rf=298.25
_ANS = "+a=6378160 +rf=298.25"
for _z in range(49, 57):
    _seed(20200 + _z, f"+proj=utm +zone={_z} +south {_ANS} "
          "+towgs84=-117.808,-51.536,137.784,0.303,0.446,0.234,-0.29")
    _seed(20300 + _z, f"+proj=utm +zone={_z} +south {_ANS} "
          "+towgs84=-134,-48,149")
# SAD69 / UTM 18N-22N (29168-29172) and 17S-25S (29187-29195);
# GRS 1967 Modified a=6378160 rf=298.25, Brazilian national shift
_SAD = "+a=6378160 +rf=298.25 +towgs84=-57,1,-41"
for _z in range(18, 23):
    _seed(29150 + _z, f"+proj=utm +zone={_z} {_SAD}")
for _z in range(17, 26):
    _seed(29170 + _z, f"+proj=utm +zone={_z} +south {_SAD}")
# Arc 1960 / UTM 35N-37N (21095-21097) and 35S-37S (21035-21037);
# Clarke 1880 (RGS) a=6378249.145 rf=293.465
_ARC60 = "+a=6378249.145 +rf=293.465 +towgs84=-160,-6,-302"
for _z in range(35, 38):
    _seed(21060 + _z, f"+proj=utm +zone={_z} {_ARC60}")
    _seed(21000 + _z, f"+proj=utm +zone={_z} +south {_ARC60}")

# --- Gauss-Krüger families --------------------------------------------------
# Beijing 1954 / Gauss-Kruger zones 13-23 (21413-21423, zone-prefixed FE)
# and CM variants 75E-135E (21453-21463, FE 500000)
_BJ54 = "+ellps=krass +towgs84=15.8,-154.4,-82.3"
for _z in range(13, 24):
    _lon = _z * 6 - 3
    _seed(21400 + _z, f"+proj=tmerc +lat_0=0 +lon_0={_lon} +k=1 "
          f"+x_0={_z}500000 +y_0=0 {_BJ54}")
    _seed(21440 + _z, f"+proj=tmerc +lat_0=0 +lon_0={_lon} +k=1 "
          f"+x_0=500000 +y_0=0 {_BJ54}")
# CGCS2000 / Gauss-Kruger zones 13-23 (4491-4501, zone-prefixed FE) and
# CM 75E-135E (4502-4512, FE 500000); CGCS2000 ellipsoid == GRS80 to sub-mm
for _i, _z in enumerate(range(13, 24)):
    _lon = _z * 6 - 3
    _seed(4491 + _i, f"+proj=tmerc +lat_0=0 +lon_0={_lon} +k=1 "
          f"+x_0={_z}500000 +y_0=0 +ellps=GRS80")
    _seed(4502 + _i, f"+proj=tmerc +lat_0=0 +lon_0={_lon} +k=1 "
          f"+x_0=500000 +y_0=0 +ellps=GRS80")
# Xian 1980 / Gauss-Kruger zones 13-23 (2327-2337) and CM 75E-135E
# (2338-2348); IAG 1975 ellipsoid, no published grid-free Helmert (null
# shift, as in PROJ)
_XA80 = "+a=6378140 +rf=298.257"
for _i, _z in enumerate(range(13, 24)):
    _lon = _z * 6 - 3
    _seed(2327 + _i, f"+proj=tmerc +lat_0=0 +lon_0={_lon} +k=1 "
          f"+x_0={_z}500000 +y_0=0 {_XA80}")
    _seed(2338 + _i, f"+proj=tmerc +lat_0=0 +lon_0={_lon} +k=1 "
          f"+x_0=500000 +y_0=0 {_XA80}")

# --- National TM / LCC grids ------------------------------------------------
# RGF93 / CC42-CC50 conic conforme zones (3942-3950)
for _n in range(42, 51):
    _seed(3900 + _n, f"+proj=lcc +lat_0={_n} +lon_0=3 "
          f"+lat_1={_n - 0.75} +lat_2={_n + 0.75} "
          f"+x_0=1700000 +y_0={(_n - 41) * 1000000 + 200000} +ellps=GRS80")
# NAD83 / MTM zones 1-10 (32181-32190), k0=0.9999, FE 304800 m (1e6 ft)
for _z, _lon in enumerate([-53.0, -56.0, -58.5, -61.5, -64.5, -67.5,
                           -70.5, -73.5, -76.5, -79.5], start=1):
    _seed(32180 + _z, f"+proj=tmerc +lat_0=0 +lon_0={_lon} +k=0.9999 "
          "+x_0=304800 +y_0=0 +ellps=GRS80")
# ETRS89 / NTM zones 5-30 (5105-5130), Norway
for _z in range(5, 31):
    _seed(5100 + _z, f"+proj=tmerc +lat_0=58 +lon_0={_z}.5 +k=1 "
          "+x_0=100000 +y_0=1000000 +ellps=GRS80")
# ETRS89 / Poland CS2000 zones 5-8 (2176-2179) and CS92 (2180)
for _i, _lon in enumerate([15, 18, 21, 24]):
    _seed(2176 + _i, f"+proj=tmerc +lat_0=0 +lon_0={_lon} +k=0.999923 "
          f"+x_0={_lon // 3}500000 +y_0=0 +ellps=GRS80")
_seed(2180, "+proj=tmerc +lat_0=0 +lon_0=19 +k=0.9993 "
            "+x_0=500000 +y_0=-5300000 +ellps=GRS80")
# TUREF / TM zones (5253-5259), Turkey, 3-degree belts 27E-45E
for _i, _lon in enumerate(range(27, 46, 3)):
    _seed(5253 + _i, f"+proj=tmerc +lat_0=0 +lon_0={_lon} +k=1 "
          "+x_0=500000 +y_0=0 +ellps=GRS80")
# DGN95 / Indonesia TM-3 zones 46.2-54.1 (23830-23845)
for _i in range(16):
    _seed(23830 + _i, f"+proj=tmerc +lat_0=0 +lon_0={94.5 + 1.5 * _i} "
          "+k=0.9999 +x_0=200000 +y_0=1500000 +ellps=GRS80")
# POSGAR 2007 / Argentina fajas 1-7 (5343-5349)
for _i in range(7):
    _seed(5343 + _i, f"+proj=tmerc +lat_0=-90 +lon_0={-72 + 3 * _i} +k=1 "
          f"+x_0={_i + 1}500000 +y_0=0 +ellps=GRS80")
# MGI / Austria GK M28/M31/M34 (31254-31256) and GK West/Central/East
# (31257-31259)
_MGI = ("+ellps=bessel "
        "+towgs84=577.326,90.129,463.919,5.137,1.474,5.297,2.4232")
for _i, _lon in enumerate(["10.33333333333333", "13.33333333333333",
                           "16.33333333333333"]):
    _seed(31254 + _i, f"+proj=tmerc +lat_0=0 +lon_0={_lon} +k=1 "
          f"+x_0=0 +y_0=-5000000 {_MGI}")
    _seed(31257 + _i, f"+proj=tmerc +lat_0=0 +lon_0={_lon} +k=1 "
          f"+x_0={150000 + 300000 * _i} +y_0=-5000000 {_MGI}")

# --- single-code national grids ---------------------------------------------
_SINGLES: dict[int, str] = {
    # Israeli TM Grid
    2039: "+proj=tmerc +lat_0=31.73439361111111 +lon_0=35.20451694444445 "
          "+k=1.0000067 +x_0=219529.584 +y_0=626907.39 +ellps=GRS80 "
          "+towgs84=-48,55,52",
    # IRENET95 / Irish Transverse Mercator
    2157: "+proj=tmerc +lat_0=53.5 +lon_0=-8 +k=0.99982 "
          "+x_0=600000 +y_0=750000 +ellps=GRS80",
    # TM65 / Irish Grid (Airy Modified 1849)
    29902: "+proj=tmerc +lat_0=53.5 +lon_0=-8 +k=1.000035 "
           "+x_0=200000 +y_0=250000 +a=6377340.189 +rf=299.3249646 "
           "+towgs84=482.5,-130.6,564.6,-1.042,-0.214,-0.631,8.15",
    # Luxembourg 1930 / Gauss (LUREF)
    2169: "+proj=tmerc +lat_0=49.83333333333334 +lon_0=6.166666666666667 "
          "+k=1 +x_0=80000 +y_0=100000 +ellps=intl "
          "+towgs84=-193,13.7,-39.3,-0.41,-2.933,2.688,0.43",
    # Belge 1972 / Belgian Lambert 72
    31370: "+proj=lcc +lat_0=90 +lon_0=4.367486666666666 "
           "+lat_1=51.16666723333333 +lat_2=49.8333339 "
           "+x_0=150000.013 +y_0=5400088.438 +ellps=intl "
           "+towgs84=-106.869,52.2978,-103.724,0.3366,-0.457,1.8422,-1.2747",
    # ETRS89 / Belgian Lambert 2008
    3812: "+proj=lcc +lat_0=50.797815 +lon_0=4.359215833333333 "
          "+lat_1=49.83333333333334 +lat_2=51.16666666666667 "
          "+x_0=649328 +y_0=665262 +ellps=GRS80",
    # ETRS89 / Estonia Lambert (L-EST97)
    3301: "+proj=lcc +lat_0=57.51755393055556 +lon_0=24 "
          "+lat_1=59.33333333333334 +lat_2=58 "
          "+x_0=500000 +y_0=6375000 +ellps=GRS80",
    # LKS92 / Latvia TM
    3059: "+proj=tmerc +lat_0=0 +lon_0=24 +k=0.9996 "
          "+x_0=500000 +y_0=-6000000 +ellps=GRS80",
    # LKS94 / Lithuania TM
    3346: "+proj=tmerc +lat_0=0 +lon_0=24 +k=0.9998 "
          "+x_0=500000 +y_0=0 +ellps=GRS80",
    # ISN93 / Lambert 1993 (Iceland)
    3057: "+proj=lcc +lat_0=65 +lon_0=-19 +lat_1=64.25 +lat_2=65.75 "
          "+x_0=500000 +y_0=500000 +ellps=GRS80",
    # Hong Kong 1980 Grid System
    2326: "+proj=tmerc +lat_0=22.31213333333334 +lon_0=114.1785555555556 "
          "+k=1 +x_0=836694.05 +y_0=819069.8 +ellps=intl "
          "+towgs84=-162.619,-276.959,-161.764,0.067753,-2.24365,"
          "-1.15883,-1.09425",
    # SVY21 / Singapore TM
    3414: "+proj=tmerc +lat_0=1.366666666666667 +lon_0=103.8333333333333 "
          "+k=1 +x_0=28001.642 +y_0=38744.572 +ellps=WGS84",
    # TWD97 / TM2 zone 121 (Taiwan)
    3826: "+proj=tmerc +lat_0=0 +lon_0=121 +k=0.9999 "
          "+x_0=250000 +y_0=0 +ellps=GRS80",
    # NTF (Paris) / Lambert zone II étendu — Clarke 1880 IGN
    27572: "+proj=lcc +lat_1=46.8 +lat_0=46.8 +lon_0=2.337229166666667 "
           "+k_0=0.99987742 +x_0=600000 +y_0=2200000 "
           "+a=6378249.2 +b=6356515 +towgs84=-168,-60,320",
    # GDA94 / Geoscience Australia Lambert
    3112: "+proj=lcc +lat_0=0 +lon_0=134 +lat_1=-18 +lat_2=-36 "
          "+x_0=0 +y_0=0 +ellps=GRS80",
    # US National Atlas Equal Area (Clarke 1866 Authalic Sphere)
    2163: "+proj=laea +lat_0=45 +lon_0=-100 +x_0=0 +y_0=0 "
          "+a=6370997 +b=6370997",
    9311: "+proj=laea +lat_0=45 +lon_0=-100 +x_0=0 +y_0=0 "
          "+a=6370997 +b=6370997",
    # NSIDC EASE-Grid North / South (International 1924 Authalic Sphere)
    3408: "+proj=laea +lat_0=90 +lon_0=0 +x_0=0 +y_0=0 "
          "+a=6371228 +b=6371228",
    3409: "+proj=laea +lat_0=-90 +lon_0=0 +x_0=0 +y_0=0 "
          "+a=6371228 +b=6371228",
    # NSIDC EASE-Grid 2.0 North / South
    6931: "+proj=laea +lat_0=90 +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84",
    6932: "+proj=laea +lat_0=-90 +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84",
    # ETRS89 / LCC Germany (N-E ordering handled as x=E, y=N like all seeds)
    5243: "+proj=lcc +lat_0=51 +lon_0=10.5 +lat_1=48.66666666666666 "
          "+lat_2=53.66666666666666 +x_0=0 +y_0=0 +ellps=GRS80",
    # NAD83 / Texas Centric Mapping System Albers
    3083: "+proj=aea +lat_0=18 +lon_0=-100 +lat_1=27.5 +lat_2=35 "
          "+x_0=1500000 +y_0=6000000 +ellps=GRS80",
    # NAD83 / California Albers
    3310: "+proj=aea +lat_0=0 +lon_0=-120 +lat_1=34 +lat_2=40.5 "
          "+x_0=0 +y_0=-4000000 +ellps=GRS80",
    # NAD83(2011) / Conus Albers
    6350: "+proj=aea +lat_0=23 +lon_0=-96 +lat_1=29.5 +lat_2=45.5 "
          "+x_0=0 +y_0=0 +ellps=GRS80",
    # GGRS87 / Greek Grid
    2100: "+proj=tmerc +lat_0=0 +lon_0=24 +k=0.9996 +x_0=500000 +y_0=0 "
          "+ellps=GRS80 +towgs84=-199.87,74.79,246.62",
    # HTRS96 / Croatia TM
    3765: "+proj=tmerc +lat_0=0 +lon_0=16.5 +k=0.9999 +x_0=500000 +y_0=0 "
          "+ellps=GRS80",
    # Slovenia 1996 / Slovene National Grid (D96/TM)
    3794: "+proj=tmerc +lat_0=0 +lon_0=15 +k=0.9999 +x_0=500000 "
          "+y_0=-5000000 +ellps=GRS80",
    # WGS 84 / Dubai Local TM
    3997: "+proj=tmerc +lat_0=0 +lon_0=55.33333333333334 +k=1 "
          "+x_0=500000 +y_0=0 +ellps=WGS84",
    # Merchich / Nord Maroc (Clarke 1880 IGN, LCC 1SP)
    26191: "+proj=lcc +lat_1=33.3 +lat_0=33.3 +lon_0=-5.4 "
           "+k_0=0.999625769 +x_0=500000 +y_0=300000 "
           "+a=6378249.2 +b=6356515 +towgs84=31,146,47",
    # WGS 84 / UPS North and South (variant A k0=0.994 expressed through
    # its exact equivalent standard parallel)
    32661: "+proj=stere +lat_0=90 +lat_ts=81.11451786859362 +lon_0=0 "
           "+x_0=2000000 +y_0=2000000 +ellps=WGS84",
    32761: "+proj=stere +lat_0=-90 +lat_ts=-81.11451786859362 +lon_0=0 "
           "+x_0=2000000 +y_0=2000000 +ellps=WGS84",
}
_EPSG_PROJ4.update(_SINGLES)

# WGS 84 / North Pole LAEA regional family (3571-3576)
for _code, _lon in ((3571, 180.0), (3572, -150.0), (3573, -100.0),
                    (3574, -40.0), (3575, 10.0), (3576, 90.0)):
    _seed(_code, f"+proj=laea +lat_0=90 +lon_0={_lon} +x_0=0 +y_0=0 "
          "+ellps=WGS84")

# --- r10 long-tail wave ------------------------------------------------------
# Pulkovo 1942 / Gauss-Kruger CM 9E-189E (28462-28492): the FE-500000
# variants of the zone-prefixed 284xx family (same krass + Helmert as the
# seeded 4284)
_P42 = "+ellps=krass +towgs84=23.92,-141.27,-80.9,0,0.35,0.82,-0.12"
for _i, _z in enumerate(range(2, 33)):
    _seed(28462 + _i, f"+proj=tmerc +lat_0=0 +lon_0={_z * 6 - 3} +k=1 "
          f"+x_0=500000 +y_0=0 {_P42}")
# Pulkovo 1995 / Gauss-Kruger zones 2-32 (20002-20032, zone-prefixed FE)
# and CM 9E-189E (20062-20092, FE 500000)
_P95 = "+ellps=krass +towgs84=24.47,-130.89,-81.56,0,0,0.13,-0.22"
for _i, _z in enumerate(range(2, 33)):
    _seed(20002 + _i, f"+proj=tmerc +lat_0=0 +lon_0={_z * 6 - 3} +k=1 "
          f"+x_0={_z}500000 +y_0=0 {_P95}")
    _seed(20062 + _i, f"+proj=tmerc +lat_0=0 +lon_0={_z * 6 - 3} +k=1 "
          f"+x_0=500000 +y_0=0 {_P95}")
# Japan Plane Rectangular CS zones I-XIX: JGD2000 (2443-2461) and JGD2011
# (6669-6687) share the zone origin table (k=0.9999, FE=FN=0, GRS80)
_JPRCS = [
    (33.0, 129.5), (33.0, 131.0), (36.0, "132.1666666666667"),
    (33.0, 133.5), (36.0, "134.3333333333333"), (36.0, 136.0),
    (36.0, "137.1666666666667"), (36.0, 138.5),
    (36.0, "139.8333333333333"), (40.0, "140.8333333333333"),
    (44.0, 140.25), (44.0, 142.25), (44.0, 144.25), (26.0, 142.0),
    (26.0, 127.5), (26.0, 124.0), (26.0, 131.0), (20.0, 136.0),
    (26.0, 154.0),
]
for _i, (_lat, _lon) in enumerate(_JPRCS):
    _jp = (f"+proj=tmerc +lat_0={_lat} +lon_0={_lon} +k=0.9999 "
           "+x_0=0 +y_0=0 +ellps=GRS80")
    _seed(2443 + _i, _jp)   # JGD2000
    _seed(6669 + _i, _jp)   # JGD2011
# SWEREF99 projected belts (3007-3018), k=1 FE 150000
for _code, _lon in ((3007, 12.0), (3008, 13.5), (3009, 15.0), (3010, 16.5),
                    (3011, 18.0), (3012, 14.25), (3013, 15.75),
                    (3014, 17.25), (3015, 18.75), (3016, 20.25),
                    (3017, 21.75), (3018, 23.25)):
    _seed(_code, f"+proj=tmerc +lat_0=0 +lon_0={_lon} +k=1 "
          "+x_0=150000 +y_0=0 +ellps=GRS80")
# NTF (Paris) / Lambert carto zones I-IV (27561-27564), Clarke 1880 IGN,
# LCC 1SP — same datum wrap as the seeded 27572 (zone II étendu)
_NTF = "+a=6378249.2 +b=6356515 +towgs84=-168,-60,320"
_PARIS = "+lon_0=2.337229166666667"
for _code, _lat, _k, _x0, _y0 in (
    (27561, 49.5, "0.999877341", 600000, 200000),
    (27562, 46.8, "0.99987742", 600000, 200000),
    (27563, 44.1, "0.999877499", 600000, 200000),
    (27564, 42.165, "0.99994471", 234.358, 185861.369),
):
    _seed(_code, f"+proj=lcc +lat_1={_lat} +lat_0={_lat} {_PARIS} "
          f"+k_0={_k} +x_0={_x0} +y_0={_y0} {_NTF}")
# DHDN / Gauss-Kruger zones 2-5 (31466-31469), Bessel + EPSG:1777 Helmert
_DHDN = ("+ellps=bessel "
         "+towgs84=598.1,73.7,418.2,0.202,0.045,-2.455,6.7")
for _i, _z in enumerate(range(2, 6)):
    _seed(31466 + _i, f"+proj=tmerc +lat_0=0 +lon_0={_z * 3} +k=1 "
          f"+x_0={_z}500000 +y_0=0 {_DHDN}")
# Minna / Nigeria West/Mid/East belts (26391-26393), Clarke 1880 RGS
_MINNA = "+a=6378249.145 +rf=293.465 +towgs84=-92,-93,122"
for _code, _lon, _x0 in ((26391, 4.5, 230738.26), (26392, 8.5, 670553.98),
                         (26393, 12.5, 1110579.12)):
    _seed(_code, f"+proj=tmerc +lat_0=4 +lon_0={_lon} +k=0.99975 "
          f"+x_0={_x0} +y_0=0 {_MINNA}")
# PNG94 / PNGMG94 zones 54-56 (5550-5552): ITRF-aligned UTM south
for _i, _z in enumerate((54, 55, 56)):
    _seed(5550 + _i, f"+proj=utm +zone={_z} +south +ellps=GRS80")
# r10 singles
_SINGLES_R10: dict[int, str] = {
    # HD72 / EOV (Hungary) — Hotine oblique Mercator (somerc), GRS67
    23700: "+proj=somerc +lat_0=47.14439372222222 +lon_0=19.04857177777778 "
           "+k_0=0.99993 +x_0=650000 +y_0=200000 "
           "+a=6378160 +rf=298.247167427 +towgs84=52.17,-71.82,-14.9",
    # Dealul Piscului 1970 / Stereo 70 and Pulkovo 1942(58) / Stereo70
    # (Romania) — oblique stereographic on Krassowsky
    31700: "+proj=sterea +lat_0=46 +lon_0=25 +k=0.99975 "
           "+x_0=500000 +y_0=500000 +ellps=krass "
           "+towgs84=28,-121,-77",
    3844: "+proj=sterea +lat_0=46 +lon_0=25 +k=0.99975 "
          "+x_0=500000 +y_0=500000 +ellps=krass "
          "+towgs84=2.329,-147.042,-92.08,0.309,-0.325,-0.497,5.69",
    # Mexico ITRF2008 / LCC
    6372: "+proj=lcc +lat_0=12 +lon_0=-102 +lat_1=17.5 +lat_2=29.5 "
          "+x_0=2500000 +y_0=0 +ellps=GRS80",
    # RGNC91-93 / Lambert New Caledonia
    3163: "+proj=lcc +lat_0=-21.5 +lon_0=166 +lat_1=-20.66666666666667 "
          "+lat_2=-22.33333333333333 +x_0=400000 +y_0=300000 +ellps=GRS80",
    # Korea 2000 / Unified CS ("UTM-K")
    5179: "+proj=tmerc +lat_0=38 +lon_0=127.5 +k=0.9996 "
          "+x_0=1000000 +y_0=2000000 +ellps=GRS80",
    # ISN2004 / Lambert 2004 (same cone as the seeded 3057, shifted FE/FN)
    5325: "+proj=lcc +lat_0=65 +lon_0=-19 +lat_1=64.25 +lat_2=65.75 "
          "+x_0=1700000 +y_0=300000 +ellps=GRS80",
    # ETRS89 / Portugal TM06
    3763: "+proj=tmerc +lat_0=39.66825833333333 +lon_0=-8.133108333333334 "
          "+k=1 +x_0=0 +y_0=0 +ellps=GRS80",
    # Gulshan 303 / Bangladesh Transverse Mercator (Everest 1830-1937)
    3106: "+proj=tmerc +lat_0=0 +lon_0=90 +k=0.9996 +x_0=500000 +y_0=0 "
          "+a=6377276.345 +rf=300.8017 +towgs84=283.7,735.9,261.1",
    # Fiji 1986 / Fiji Map Grid (WGS72 realization)
    3460: "+proj=tmerc +lat_0=-17 +lon_0=178.75 +k=0.99985 "
          "+x_0=2000000 +y_0=4000000 +a=6378135 +rf=298.26 "
          "+towgs84=0,0,4.5,0,0,0.554,0.2263",
}
_EPSG_PROJ4.update(_SINGLES_R10)

# --- r11 long-tail wave ------------------------------------------------------
# US State Plane NAD83 ftUS variants (lcc-2SP / tmerc over GRS80 with
# +units=us-ft; false origins in meters per the EPSG registry)
_SINGLES_R11: dict[int, str] = {
    # California zones 1-6 (ftUS)
    2225: "+proj=lcc +lat_1=41.66666666666666 +lat_2=40 +lat_0=39.33333333333334 "
          "+lon_0=-122 +x_0=2000000.0001016 +y_0=500000.0001016001 "
          "+ellps=GRS80 +units=us-ft",
    2226: "+proj=lcc +lat_1=39.83333333333334 +lat_2=38.33333333333334 +lat_0=37.66666666666666 "
          "+lon_0=-122 +x_0=2000000.0001016 +y_0=500000.0001016001 "
          "+ellps=GRS80 +units=us-ft",
    2227: "+proj=lcc +lat_1=38.43333333333333 +lat_2=37.06666666666667 +lat_0=36.5 "
          "+lon_0=-120.5 +x_0=2000000.0001016 +y_0=500000.0001016001 "
          "+ellps=GRS80 +units=us-ft",
    2228: "+proj=lcc +lat_1=37.25 +lat_2=36 +lat_0=35.33333333333334 "
          "+lon_0=-119 +x_0=2000000.0001016 +y_0=500000.0001016001 "
          "+ellps=GRS80 +units=us-ft",
    2229: "+proj=lcc +lat_1=35.46666666666667 +lat_2=34.03333333333333 +lat_0=33.5 "
          "+lon_0=-118 +x_0=2000000.0001016 +y_0=500000.0001016001 "
          "+ellps=GRS80 +units=us-ft",
    2230: "+proj=lcc +lat_1=33.88333333333333 +lat_2=32.78333333333333 +lat_0=32.16666666666666 "
          "+lon_0=-116.25 +x_0=2000000.0001016 +y_0=500000.0001016001 "
          "+ellps=GRS80 +units=us-ft",
    # Georgia West (tmerc ftUS)
    2240: "+proj=tmerc +lat_0=30 +lon_0=-84.16666666666667 +k=0.9999 "
          "+x_0=699999.9998983998 +y_0=0 +ellps=GRS80 +units=us-ft",
    # Maryland (lcc ftUS)
    2248: "+proj=lcc +lat_1=39.45 +lat_2=38.3 +lat_0=37.66666666666666 "
          "+lon_0=-77 +x_0=399999.9998983998 +y_0=0 +ellps=GRS80 +units=us-ft",
    # Massachusetts Mainland / Island (lcc ftUS)
    2249: "+proj=lcc +lat_1=42.68333333333333 +lat_2=41.71666666666667 +lat_0=41 "
          "+lon_0=-71.5 +x_0=200000.0001016002 +y_0=750000 "
          "+ellps=GRS80 +units=us-ft",
    2250: "+proj=lcc +lat_1=41.48333333333333 +lat_2=41.28333333333333 +lat_0=41 "
          "+lon_0=-70.5 +x_0=500000.0001016001 +y_0=0 +ellps=GRS80 +units=us-ft",
    # Pennsylvania South / Washington North (lcc ftUS)
    2272: "+proj=lcc +lat_1=40.96666666666667 +lat_2=39.93333333333333 "
          "+lat_0=39.33333333333334 +lon_0=-77.75 +x_0=600000.0000000001 +y_0=0 "
          "+ellps=GRS80 +units=us-ft",
    2285: "+proj=lcc +lat_1=48.73333333333333 +lat_2=47.5 +lat_0=47 "
          "+lon_0=-120.8333333333333 +x_0=500000.0001016001 +y_0=0 "
          "+ellps=GRS80 +units=us-ft",
    # Wisconsin Transverse Mercator (NAD83)
    3071: "+proj=tmerc +lat_0=0 +lon_0=-90 +k=0.9996 +x_0=520000 "
          "+y_0=-4480000 +ellps=GRS80",
    # NAD83 / Michigan Oblique Mercator (variant A, no_uoff)
    3078: "+proj=omerc +lat_0=45.30916666666666 +lonc=-86 +alpha=337.25556 "
          "+gamma=337.25556 +k=0.9996 +x_0=2546731.496 +y_0=-4354009.816 "
          "+no_uoff +ellps=GRS80",
    # NAD83(CSRS) / Canada Atlas Lambert
    3979: "+proj=lcc +lat_1=49 +lat_2=77 +lat_0=49 +lon_0=-95 +x_0=0 +y_0=0 "
          "+ellps=GRS80",
    # Yukon Albers
    3578: "+proj=aea +lat_1=61.66666666666666 +lat_2=68 +lat_0=59 "
          "+lon_0=-132.5 +x_0=500000 +y_0=500000 +ellps=GRS80",
    # Monte Mario / Italy zones 1-2 (Rome 1940 datum)
    3003: "+proj=tmerc +lat_0=0 +lon_0=9 +k=0.9996 +x_0=1500000 +y_0=0 "
          "+ellps=intl +towgs84=-104.1,-49.1,-9.9,0.971,-2.917,0.714,-11.68",
    3004: "+proj=tmerc +lat_0=0 +lon_0=15 +k=0.9996 +x_0=2520000 +y_0=0 "
          "+ellps=intl +towgs84=-104.1,-49.1,-9.9,0.971,-2.917,0.714,-11.68",
    # RT90 2.5 gon V (Sweden legacy)
    3021: "+proj=tmerc +lat_0=0 +lon_0=15.80827777777778 +k=1 +x_0=1500000 "
          "+y_0=0 +ellps=bessel "
          "+towgs84=414.1,41.3,603.1,-0.855,2.141,-7.023,0",
    # Qatar: 1974 National Grid and QND95
    28600: "+proj=tmerc +lat_0=24.45 +lon_0=51.21666666666667 +k=0.99999 "
           "+x_0=200000 +y_0=300000 +ellps=intl "
           "+towgs84=-128.16,-282.42,21.93",
    2932: "+proj=tmerc +lat_0=24.45 +lon_0=51.21666666666667 +k=0.99999 "
          "+x_0=200000 +y_0=300000 +ellps=intl "
          "+towgs84=-119.4248,-303.65872,-11.00061,1.164298,0.174458,"
          "1.096259,3.657065",
    # Dubai Local TM
    3997: "+proj=tmerc +lat_0=0 +lon_0=55.33333333333334 +k=1 +x_0=500000 "
          "+y_0=0 +ellps=WGS84",
    # Sri Lanka Grid (Kandawala, Everest 1830 adj 1937)
    5234: "+proj=tmerc +lat_0=7.000480277777778 +lon_0=80.77171111111112 "
          "+k=0.9999238418818223 +x_0=200000 +y_0=200000 "
          "+a=6377276.345 +rf=300.8017 +towgs84=-97,787,86",
    # GDM2000 / Peninsula RSO (Malaysia, Hotine variant B)
    3375: "+proj=omerc +lat_0=4 +lonc=102.25 +alpha=323.0257964666666 "
          "+gamma=323.1301023611111 +k=0.99984 +x_0=804671 +y_0=0 "
          "+no_uoff +ellps=GRS80",
    # Kertau (RSO) / RSO Malaya (m) — Everest 1830 (RSO 1969)
    3168: "+proj=omerc +lat_0=4 +lonc=102.25 +alpha=323.0257905 "
          "+gamma=323.1301023611111 +k=0.99984 +x_0=804670.24 +y_0=0 "
          "+no_uoff +a=6377295.664 +rf=300.8017",
    # GDM2000 / East Malaysia BRSO
    3376: "+proj=omerc +lat_0=4 +lonc=115 +alpha=53.31580995 "
          "+gamma=53.13010236111111 +k=0.99984 +x_0=0 +y_0=0 "
          "+no_uoff +ellps=GRS80",
    # EASE-Grid 2.0 Global (cea lat_ts=30) and NSIDC EASE-Grid Global
    6933: "+proj=cea +lat_ts=30 +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84",
    3410: "+proj=cea +lat_ts=30 +lon_0=0 +x_0=0 +y_0=0 "
          "+a=6371228 +b=6371228",
    # World Equidistant Cylindrical: WGS84 (4087, ellipsoidal; 32662 Plate
    # Carree legacy code) and sphere (4088)
    4087: "+proj=eqc +lat_ts=0 +lat_0=0 +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84",
    32662: "+proj=eqc +lat_ts=0 +lat_0=0 +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84",
    4088: "+proj=eqc +lat_ts=0 +lat_0=0 +lon_0=0 +x_0=0 +y_0=0 "
          "+a=6371007 +b=6371007",
    # NSIDC polar pathfinder north/south (spherical laea)
    3408: "+proj=laea +lat_0=90 +lon_0=0 +x_0=0 +y_0=0 +a=6371228 +b=6371228",
    3411: "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +x_0=0 +y_0=0 "
          "+a=6378273 +b=6356889.449",
    3412: "+proj=stere +lat_0=-90 +lat_ts=-70 +lon_0=0 +x_0=0 +y_0=0 "
          "+a=6378273 +b=6356889.449",
}
_EPSG_PROJ4.update(_SINGLES_R11)

# NAD83(CSRS) MTM zones 3-10 (2945-2952) and UTM 11N-14N (2955-2958);
# ITRF-aligned GRS80 null datum
for _i, _lon in enumerate((-58.5, -61.5, -64.5, -67.5, -70.5, -73.5,
                           -76.5, -79.5)):
    _seed(2945 + _i, f"+proj=tmerc +lat_0=0 +lon_0={_lon} +k=0.9999 "
          "+x_0=304800 +y_0=0 +ellps=GRS80")
for _i, _z in enumerate((11, 12, 13, 14)):
    _seed(2955 + _i, f"+proj=utm +zone={_z} +ellps=GRS80")

# Hartebeesthoek94 / Lo15-Lo33 (2046-2055): south-oriented TM (+axis=wsu),
# WGS84-compatible datum
for _i in range(10):
    _seed(2046 + _i, f"+proj=tmerc +lat_0=0 +lon_0={15 + 2 * _i} +k=1 "
          "+x_0=0 +y_0=0 +ellps=WGS84 +axis=wsu")

# MAGNA-SIRGAS / Colombia zones (3114-3118): GK on GRS80, shared origin
# lat / false origin, CM -80.077.. to -68.077.. in 3-degree steps
for _i in range(5):
    _seed(3114 + _i, "+proj=tmerc +lat_0=4.596200416666666 "
          f"+lon_0={-80.07750791666666 + 3 * _i} +k=1 "
          "+x_0=1000000 +y_0=1000000 +ellps=GRS80")

# POSGAR 98 fajas 1-7 (22171-22177): Argentina GK, origin at the pole
for _i in range(7):
    _seed(22171 + _i, f"+proj=tmerc +lat_0=-90 +lon_0={-72 + 3 * _i} +k=1 "
          f"+x_0={(_i + 1) * 1000000 + 500000} +y_0=0 +ellps=GRS80")

# KKJ / Finland zones 1-4 (2391-2394), Bessel with the published 7-param
_KKJ = ("+ellps=intl "
        "+towgs84=-96.062,-82.428,-121.753,4.801,0.345,-1.376,1.496")
for _i in range(4):
    _seed(2391 + _i, f"+proj=tmerc +lat_0=0 +lon_0={21 + 3 * _i} +k=1 "
          f"+x_0={(_i + 1) * 1000000 + 500000} +y_0=0 {_KKJ}")

# ED50 / 3-degree Gauss-Kruger zones 9-15 (2206-2212, Turkey)
for _i in range(7):
    _z = 9 + _i
    _seed(2206 + _i, f"+proj=tmerc +lat_0=0 +lon_0={_z * 3} +k=1 "
          f"+x_0={_z * 1000000 + 500000} +y_0=0 +ellps=intl "
          "+towgs84=-87,-98,-121")

# Egypt 1907 belts (22991-22994): Helmert 1906 ellipsoid
_EGY = "+a=6378200 +rf=298.3 +towgs84=-130,110,-13"
_seed(22991, f"+proj=tmerc +lat_0=30 +lon_0=35 +k=1 +x_0=300000 +y_0=1100000 {_EGY}")
_seed(22992, f"+proj=tmerc +lat_0=30 +lon_0=31 +k=1 +x_0=615000 +y_0=810000 {_EGY}")
_seed(22993, f"+proj=tmerc +lat_0=30 +lon_0=27 +k=1 +x_0=700000 +y_0=200000 {_EGY}")
_seed(22994, f"+proj=tmerc +lat_0=30 +lon_0=27 +k=1 +x_0=700000 +y_0=1200000 {_EGY}")

# Indian 1960 / UTM 48-49N (3148-3149), Indian 1975 / UTM 47-48N
# (24047-24048): Everest 1830 (1937 adjustment)
_EV37 = "+a=6377276.345 +rf=300.8017"
_seed(3148, f"+proj=utm +zone=48 {_EV37} +towgs84=198,881,317")
_seed(3149, f"+proj=utm +zone=49 {_EV37} +towgs84=198,881,317")
_seed(24047, f"+proj=utm +zone=47 {_EV37} +towgs84=210,814,289")
_seed(24048, f"+proj=utm +zone=48 {_EV37} +towgs84=210,814,289")

# VN-2000 / UTM 48-49N (3405-3406): published grid-free 3-param shift
for _z, _c in ((48, 3405), (49, 3406)):
    _seed(_c, f"+proj=utm +zone={_z} +ellps=WGS84 "
          "+towgs84=-192.873,-39.382,-111.202")

# PRS92 / Philippines zones 1-5 (3121-3125): Clarke 1866, published 7-param
_PRS = ("+ellps=clrk66 "
        "+towgs84=-127.62,-67.24,-47.04,-3.068,4.903,1.578,-1.06")
for _i in range(5):
    _seed(3121 + _i, f"+proj=tmerc +lat_0=0 +lon_0={117 + 2 * _i} "
          f"+k=0.99995 +x_0=500000 +y_0=0 {_PRS}")

# Kalianpur 1975 / India zones I, IIa, IIb, III, IV (24378-24382):
# LCC 1SP on Everest 1830 (1975 definition), published Indian shift
_K75 = "+a=6377299.151 +rf=300.8017255 +towgs84=295,736,257"
for _c, _lat, _lon in ((24378, 32.5, 68.0), (24379, 26.0, 74.0),
                       (24380, 26.0, 90.0), (24381, 19.0, 80.0),
                       (24382, 12.0, 80.0)):
    _seed(_c, f"+proj=lcc +lat_1={_lat} +lat_0={_lat} +lon_0={_lon} "
          f"+k_0=0.99878641 +x_0=2743195.5 +y_0=914398.5 {_K75}")

# Korea 2000 belts (5185-5188): GK k=1 on GRS80, 2010 false origins
for _i, _lon in enumerate((125, 127, 129, 131)):
    _seed(5185 + _i, f"+proj=tmerc +lat_0=38 +lon_0={_lon} +k=1 "
          "+x_0=200000 +y_0=600000 +ellps=GRS80")

# Geographic (longlat) classic national datums (r11): published grid-free
# Helmert sets (EPSG/PROJ values); ITRF-aligned frames are null-shift
for _code in (4152,   # NAD83(HARN)
              4686,   # MAGNA-SIRGAS
              4619,   # SWEREF99
              4659,   # ISN93
              4173):  # IRENET95
    _seed(_code, "+proj=longlat +ellps=GRS80")
_GEO_R11: dict[int, str] = {
    4618: "+proj=longlat +a=6378160 +rf=298.25 +towgs84=-57,1,-41",  # SAD69
    4202: "+proj=longlat +a=6378160 +rf=298.25 "                     # AGD66
          "+towgs84=-117.808,-51.536,137.784,0.303,0.446,0.234,-0.29",
    4203: "+proj=longlat +a=6378160 +rf=298.25 +towgs84=-134,-48,149",  # AGD84
    4214: "+proj=longlat +ellps=krass",                              # Beijing 1954
    4610: "+proj=longlat +a=6378140 +rf=298.257",                    # Xian 1980
    4201: "+proj=longlat +a=6378249.145 +rf=293.465 "
          "+towgs84=-166,-15,204",                                   # Adindan
    4210: "+proj=longlat +a=6378249.145 +rf=293.465 "
          "+towgs84=-160,-6,-302",                                   # Arc 1960
    4222: "+proj=longlat +a=6378249.145 +rf=293.465 "
          "+towgs84=-136,-108,-292",                                 # Cape
    4275: "+proj=longlat +a=6378249.2 +rf=293.4660212936269 "
          "+towgs84=-168,-60,320",                                   # NTF
    4272: "+proj=longlat +ellps=intl "
          "+towgs84=59.47,-5.04,187.44,0.47,-0.1,1.024,-4.5993",     # NZGD49
    4265: "+proj=longlat +ellps=intl "
          "+towgs84=-104.1,-49.1,-9.9,0.971,-2.917,0.714,-11.68",    # Monte Mario
    4313: "+proj=longlat +ellps=intl +towgs84=-106.8686,52.2978,"
          "-103.7239,0.3366,-0.457,1.8422,-1.2747",                  # BD72
    4289: "+proj=longlat +ellps=bessel +towgs84=565.417,50.3319,"
          "465.552,-0.398957,0.343988,-1.8774,4.0725",               # Amersfoort
    4237: "+proj=longlat +a=6378160 +rf=298.247167427 "
          "+towgs84=52.17,-71.82,-14.9",                             # HD72
    4312: "+proj=longlat +ellps=bessel "
          "+towgs84=577.326,90.129,463.919,5.137,1.474,5.297,2.4232",  # MGI
    4156: "+proj=longlat +ellps=bessel +towgs84=589,76,480",         # S-JTSK
    4240: "+proj=longlat +a=6377276.345 +rf=300.8017 "
          "+towgs84=210,814,289",                                    # Indian 1975
    4211: "+proj=longlat +ellps=bessel +towgs84=-377,681,-50",       # Batavia
    4236: "+proj=longlat +ellps=intl +towgs84=-637,-549,-203",       # Hu Tzu Shan
    4245: "+proj=longlat +a=6377304.063 +rf=300.8017 "
          "+towgs84=-11,851,5",                                      # Kertau 1968
    4248: "+proj=longlat +ellps=intl +towgs84=-288,175,-376",        # PSAD56
    4300: "+proj=longlat +a=6377340.189 +rf=299.3249646 "
          "+towgs84=482.5,-130.6,564.6,-1.042,-0.214,-0.631,8.15",   # TM65
    4299: "+proj=longlat +a=6377340.189 +rf=299.3249646 "
          "+towgs84=482.5,-130.6,564.6,-1.042,-0.214,-0.631,8.15",   # TM65 (alt)
    4124: "+proj=longlat +ellps=bessel "
          "+towgs84=414.1,41.3,603.1,-0.855,2.141,-7.023,0",         # RT90
    4123: "+proj=longlat +ellps=intl "
          "+towgs84=-96.062,-82.428,-121.753,4.801,0.345,-1.376,1.496",  # KKJ
    4178: "+proj=longlat +ellps=krass +towgs84=24,-123,-94",         # Pulkovo 42(83)
    4179: "+proj=longlat +ellps=krass "
          "+towgs84=33.4,-146.6,-76.3,-0.359,-0.053,0.844,-0.84",    # Pulkovo 42(58)
}
_EPSG_PROJ4.update(_GEO_R11)

# Cassini-Soldner grids (r11 +proj=cass): Palestine 1923, Trinidad 1903
# (Clarke 1858 with Clarke-link units via +to_meter), Kertau 1968 /
# Singapore Grid
_seed(28191, "+proj=cass +lat_0=31.73409694444445 +lon_0=35.21208055555556 "
      "+x_0=170251.555 +y_0=126867.909 +a=6378300.789 +b=6356566.435 "
      "+towgs84=-275.722,94.7824,340.894,-8.001,-4.42,-11.821,1")
_seed(30200, "+proj=cass +lat_0=10.44166666666667 +lon_0=-61.33333333333334 "
      "+x_0=86501.46392052001 +y_0=65379.0134283 "
      "+a=6378293.645208759 +b=6356617.987679838 "
      "+to_meter=0.201166195164 +towgs84=-61.702,284.488,472.052")
_seed(24500, "+proj=cass +lat_0=1.287646666666667 +lon_0=103.8530022222222 "
      "+x_0=30000 +y_0=30000 +a=6377304.063 +b=6356103.038993155 "
      "+towgs84=-11,851,5")
# American Polyconic (r11 +proj=poly): Brazil Polyconic on SAD69 (GRS67
# a=6378160 rf=298.25, Brazilian national shift) and SIRGAS 2000
_seed(29101, "+proj=poly +lat_0=0 +lon_0=-54 +x_0=5000000 +y_0=10000000 "
      "+a=6378160 +rf=298.25 +towgs84=-57,1,-41")
_seed(5880, "+proj=poly +lat_0=0 +lon_0=-54 +x_0=5000000 +y_0=10000000 "
      "+ellps=GRS80")

# Tokyo datum / Japan Plane CS I-X (30161-30170): Bessel, zone origins
_TKY = "+ellps=bessel +towgs84=-146.414,507.337,680.507"
for _i, (_lat, _lon) in enumerate((
        (33.0, 129.5), (33.0, 131.0), (36.0, 132.1666666666667),
        (33.0, 133.5), (36.0, 134.3333333333333), (36.0, 136.0),
        (36.0, 137.1666666666667), (36.0, 138.5),
        (36.0, 139.8333333333333), (40.0, 140.8333333333333))):
    _seed(30161 + _i, f"+proj=tmerc +lat_0={_lat} +lon_0={_lon} +k=0.9999 "
          f"+x_0=0 +y_0=0 {_TKY}")


def proj4_for_epsg(code: int) -> str | None:
    """The seed proj4 definition for ``code``, or None."""
    return _EPSG_PROJ4.get(code)


def seeded_epsg_codes() -> list[int]:
    return sorted(_EPSG_PROJ4)
