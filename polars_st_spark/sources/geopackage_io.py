"""Native GeoPackage reader/writer via the stdlib ``sqlite3`` — no GDAL.

The reference reads/writes GeoPackages through pyogrio/GDAL (reference:
input.py:30-153, geodataframe.py:385-491); a GeoPackage is just an SQLite
database following the public OGC GeoPackage Encoding Standard (OGC
12-128r19), so this runtime implements the format directly:

- geometry BLOBs use the GeoPackageBinary layout: 'GP' magic, version,
  flags (envelope indicator + byte order), srs_id, optional envelope, then
  standard ISO WKB. Read side accepts any envelope variant and both byte
  orders; write side emits little-endian with a 4-double XY envelope.
- metadata tables: gpkg_spatial_ref_sys (with the mandatory -1/0/4326
  rows), gpkg_contents, gpkg_geometry_columns; the written application_id
  is 'GPKG'.

Single-file SQLite means both directions run driver-side by design (same
contract as the reference's single-file read; the writer is bounded by
``max_rows`` like write_geojson/write_shapefile).
"""

from __future__ import annotations

import math
import os
import sqlite3
import struct

from pyspark.sql import DataFrame, SparkSession

from polars_st_spark.geo.wkb import from_ewkb, header_info, to_ewkb

__all__ = ["read_geopackage", "write_geopackage", "list_geopackage_layers"]

_ENV_SIZES = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}


def _gpb_to_ewkb(blob: bytes) -> bytes | None:
    """GeoPackageBinary -> EWKB (SRID from the GP header)."""
    if blob is None:
        return None
    b = bytes(blob)
    if len(b) < 8 or b[0] != 0x47 or b[1] != 0x50:  # 'GP'
        raise ValueError("not a GeoPackageBinary blob")
    flags = b[3]
    if flags & 0x20:
        raise ValueError("extended GeoPackageBinary is not supported")
    little = bool(flags & 0x01)
    env = (flags >> 1) & 0x07
    if env not in _ENV_SIZES:
        raise ValueError(f"invalid GeoPackageBinary envelope indicator {env}")
    (srs_id,) = struct.unpack_from("<i" if little else ">i", b, 4)
    wkb = b[8 + _ENV_SIZES[env]:]
    if flags & 0x10:  # empty flag
        g = from_ewkb(wkb)
        return to_ewkb(g.with_srid(max(srs_id, 0)))
    g = from_ewkb(wkb)
    if srs_id > 0:
        g = g.with_srid(srs_id)
    return to_ewkb(g)


def _ewkb_to_gpb(buf: bytes) -> bytes | None:
    """EWKB -> GeoPackageBinary (flags: little-endian, XY envelope)."""
    if buf is None:
        return None
    g = from_ewkb(bytes(buf))
    srid = g.srid
    x0, y0, x1, y1 = g.bounds()
    if math.isnan(x0):
        # empty: no envelope, empty flag set
        head = struct.pack("<2sBBi", b"GP", 0, 0x01 | 0x10, srid)
        return head + to_ewkb(g, include_srid=False)
    head = struct.pack("<2sBBi", b"GP", 0, 0x01 | (1 << 1), srid)
    env = struct.pack("<4d", x0, x1, y0, y1)  # spec order: minx maxx miny maxy
    return head + env + to_ewkb(g, include_srid=False)


def list_geopackage_layers(path: str) -> list[str]:
    with sqlite3.connect(path) as con:
        rows = con.execute(
            "SELECT table_name FROM gpkg_contents WHERE data_type = 'features'"
        ).fetchall()
    return [r[0] for r in rows]


def read_geopackage(
    spark: SparkSession,
    path: str,
    layer: str | None = None,
    geometry_name: str = "geometry",
) -> DataFrame:
    """Read a feature layer (default: the first one in gpkg_contents) into a
    DataFrame with an EWKB geometry column named ``geometry_name``."""
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    with sqlite3.connect(path) as con:
        layers = [r[0] for r in con.execute(
            "SELECT table_name FROM gpkg_contents WHERE data_type = 'features'")]
        if not layers:
            raise ValueError(f"{path} has no feature layers in gpkg_contents")
        if layer is None:
            layer = layers[0]
        elif layer not in layers:
            raise ValueError(f"layer {layer!r} not in {layers}")
        (geom_col,) = con.execute(
            "SELECT column_name FROM gpkg_geometry_columns WHERE table_name = ?",
            (layer,),
        ).fetchone()
        cur = con.execute(f'SELECT * FROM "{layer}"')
        names = [d[0] for d in cur.description]
        raw = cur.fetchall()
    gi = names.index(geom_col)
    rows = []
    for r in raw:
        vals = list(r)
        vals[gi] = _gpb_to_ewkb(vals[gi])
        rows.append(tuple(vals))
    # schema from sqlite declared types via a probe row set
    from pyspark.sql.types import (BinaryType, BooleanType, DoubleType, LongType,
                                   StringType, StructField, StructType)

    with sqlite3.connect(path) as con:
        decl = {r[1]: (r[2] or "").upper() for r in con.execute(f'PRAGMA table_info("{layer}")')}

    def spark_type(name):
        if name == geom_col:
            return BinaryType()
        d = decl.get(name, "")
        if "INT" in d:
            return LongType()
        if any(t in d for t in ("REAL", "FLOA", "DOUB")):
            return DoubleType()
        if "BOOL" in d:
            return BooleanType()
        if "BLOB" in d:
            return BinaryType()
        return StringType()

    schema = StructType([StructField(n, spark_type(n)) for n in names])
    # sqlite BOOLEAN columns surface as 0/1 ints — coerce to match the schema
    bi = [i for i, n in enumerate(names) if isinstance(spark_type(n), BooleanType)]
    if bi:
        rows = [
            tuple(bool(v) if i in bi and v is not None else v for i, v in enumerate(r))
            for r in rows
        ]
    out = spark.createDataFrame(rows, schema)
    if geom_col != geometry_name:
        out = out.withColumnRenamed(geom_col, geometry_name)
    return out


_SRS_ROWS = [
    ("Undefined cartesian SRS", -1, "NONE", -1, "undefined", None),
    ("Undefined geographic SRS", 0, "NONE", 0, "undefined", None),
    (
        "WGS 84 geodetic", 4326, "EPSG", 4326,
        'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
        '298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]',
        None,
    ),
]


def write_geopackage(
    df: DataFrame,
    path: str,
    layer: str = "features",
    geometry_name: str = "geometry",
    max_rows: int = 1_000_000,
) -> None:
    """Write a single feature layer. Overwrites ``path``. Driver-side and
    row-bounded; the geometry column's (uniform) SRID becomes the layer's
    srs_id, with a gpkg_spatial_ref_sys row added for non-4326 codes."""
    from pyspark.sql.types import (BinaryType, BooleanType, DoubleType, FloatType,
                                   IntegerType, LongType, StringType)

    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(f"write_geopackage exceeds max_rows={max_rows}")
    if os.path.exists(path):
        os.remove(path)

    srids = set()
    gpbs = []
    bounds = [math.inf, math.inf, -math.inf, -math.inf]
    for r in rows:
        buf = r[geometry_name]
        if buf is None:
            gpbs.append(None)
            continue
        _, _, _, srid = header_info(bytes(buf))
        srids.add(srid)
        g = from_ewkb(bytes(buf))
        b = g.bounds()
        if not math.isnan(b[0]):
            bounds[0] = min(bounds[0], b[0]); bounds[1] = min(bounds[1], b[1])
            bounds[2] = max(bounds[2], b[2]); bounds[3] = max(bounds[3], b[3])
        gpbs.append(_ewkb_to_gpb(bytes(buf)))
    if len(srids - {0}) > 1:
        raise ValueError(f"Cannot write mixed SRIDs to GeoPackage: {sorted(srids)}")
    srs_id = next(iter(srids - {0}), 0)

    def sql_type(f):
        t = f.dataType
        if isinstance(t, (IntegerType, LongType)):
            return "INTEGER"
        if isinstance(t, (DoubleType, FloatType)):
            return "REAL"
        if isinstance(t, BooleanType):
            return "BOOLEAN"
        if isinstance(t, BinaryType):
            return "BLOB"
        if isinstance(t, StringType):
            return "TEXT"
        return "TEXT"

    attr_fields = [f for f in df.schema.fields if f.name != geometry_name]
    with sqlite3.connect(path) as con:
        con.execute("PRAGMA application_id = 0x47504B47")  # 'GPKG'
        con.execute("PRAGMA user_version = 10300")  # GeoPackage 1.3
        con.execute(
            "CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT NOT NULL, "
            "srs_id INTEGER PRIMARY KEY, organization TEXT NOT NULL, "
            "organization_coordsys_id INTEGER NOT NULL, definition TEXT NOT NULL, "
            "description TEXT)"
        )
        for name, sid, org, org_id, definition, desc in _SRS_ROWS:
            con.execute("INSERT INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
                        (name, sid, org, org_id, definition or "undefined", desc))
        if srs_id not in (0, 4326):
            definition = "undefined"
            try:
                from polars_st_spark.functions.crs import get_crs_from_code

                definition = get_crs_from_code(srs_id)
            except ValueError:
                pass
            con.execute("INSERT INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
                        (f"EPSG:{srs_id}", srs_id, "EPSG", srs_id, definition, None))
        con.execute(
            "CREATE TABLE gpkg_contents (table_name TEXT PRIMARY KEY, "
            "data_type TEXT NOT NULL, identifier TEXT UNIQUE, description TEXT "
            "DEFAULT '', last_change DATETIME NOT NULL DEFAULT "
            "(strftime('%Y-%m-%dT%H:%M:%fZ','now')), min_x DOUBLE, min_y DOUBLE, "
            "max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)"
        )
        has_b = bounds[0] != math.inf
        con.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, identifier, "
            "min_x, min_y, max_x, max_y, srs_id) VALUES (?,?,?,?,?,?,?,?)",
            (layer, "features", layer,
             bounds[0] if has_b else None, bounds[1] if has_b else None,
             bounds[2] if has_b else None, bounds[3] if has_b else None, srs_id),
        )
        con.execute(
            "CREATE TABLE gpkg_geometry_columns (table_name TEXT NOT NULL, "
            "column_name TEXT NOT NULL, geometry_type_name TEXT NOT NULL, "
            "srs_id INTEGER NOT NULL, z TINYINT NOT NULL, m TINYINT NOT NULL, "
            "CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))"
        )
        con.execute(
            "INSERT INTO gpkg_geometry_columns VALUES (?,?,?,?,?,?)",
            (layer, geometry_name, "GEOMETRY", srs_id, 0, 0),
        )
        cols = ", ".join(f'"{f.name}" {sql_type(f)}' for f in attr_fields)
        sep = ", " if cols else ""
        con.execute(
            f'CREATE TABLE "{layer}" (fid INTEGER PRIMARY KEY AUTOINCREMENT'
            f'{sep}{cols}, "{geometry_name}" BLOB)'
        )
        names = [f.name for f in attr_fields]
        ph = ",".join("?" * (len(names) + 1))
        colnames = ", ".join([f'"{n}"' for n in names] + [f'"{geometry_name}"'])
        con.executemany(
            f'INSERT INTO "{layer}" ({colnames}) VALUES ({ph})',
            [tuple(r[n] for n in names) + (gpb,) for r, gpb in zip(rows, gpbs)],
        )
        con.commit()
