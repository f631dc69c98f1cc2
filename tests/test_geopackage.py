"""Native GeoPackage reader/writer (sources/geopackage_io.py) — sqlite3
round-trips per OGC 12-128r19, no GDAL."""

import sqlite3

import pytest

import polars_st_spark as st
from polars_st_spark.sources.geopackage_io import (
    list_geopackage_layers, read_geopackage, write_geopackage)


def test_roundtrip_with_attrs_and_srid(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "first", 1.5, True, "POINT (10 20)"),
         (2, "second", -2.25, False, "LINESTRING (0 0, 3 4)"),
         (3, None, None, None, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")],
        ["id", "label", "val", "ok", "wkt"],
    ).select("id", "label", "val", "ok",
             st.st_set_srid(st.st_from_wkt("wkt"), 4326).alias("geometry"))
    p = str(tmp_path / "data.gpkg")
    write_geopackage(df, p, layer="lyr")
    assert list_geopackage_layers(p) == ["lyr"]

    back = read_geopackage(spark, p)
    rows = {r["id"]: r for r in back.select(
        "id", "label", "val", "ok",
        st.st_to_wkt("geometry").alias("w"),
        st.st_srid("geometry").alias("s")).collect()}
    assert rows[1]["w"] == "POINT (10 20)" and rows[1]["s"] == 4326
    assert rows[2]["w"] == "LINESTRING (0 0, 3 4)" and rows[2]["val"] == pytest.approx(-2.25)
    assert rows[1]["ok"] is True and rows[2]["ok"] is False and rows[3]["ok"] is None
    assert rows[3]["label"] is None

    # the file is a spec-conforming sqlite db other tools can open
    with sqlite3.connect(p) as con:
        (app_id,) = con.execute("PRAGMA application_id").fetchone()
        assert app_id == 0x47504B47  # 'GPKG'
        (n_srs,) = con.execute("SELECT count(*) FROM gpkg_spatial_ref_sys").fetchone()
        assert n_srs >= 3
        (gt,) = con.execute(
            "SELECT geometry_type_name FROM gpkg_geometry_columns").fetchone()
        assert gt == "GEOMETRY"
        bx = con.execute(
            "SELECT min_x, min_y, max_x, max_y FROM gpkg_contents").fetchone()
        assert bx == (0.0, 0.0, 10.0, 20.0)


def test_gpb_header_variants(spark, tmp_path):
    """Read side accepts the envelope variants a foreign writer may emit."""
    import struct

    from polars_st_spark.geo.types import Geometry, GeometryType
    from polars_st_spark.geo.wkb import to_ewkb
    from polars_st_spark.sources.geopackage_io import _gpb_to_ewkb

    import numpy as np

    g = Geometry(GeometryType.Point, coords=np.array([7.0, 8.0]))
    wkb = to_ewkb(g, include_srid=False)
    for env, pad in ((0, b""), (1, struct.pack("<4d", 7, 7, 8, 8)),
                     (2, struct.pack("<6d", 7, 7, 8, 8, 0, 0))):
        blob = struct.pack("<2sBBi", b"GP", 0, 0x01 | (env << 1), 3857) + pad + wkb
        out = _gpb_to_ewkb(blob)
        from polars_st_spark.geo.wkb import header_info
        assert header_info(out)[3] == 3857


def test_file_dispatch_gpkg(spark, tmp_path):
    from polars_st_spark.sources.files import read_file, write_file

    df = spark.createDataFrame([(9, "POINT (5 6)")], ["id", "wkt"]).select(
        "id", st.st_from_wkt("wkt").alias("geometry"))
    p = str(tmp_path / "disp.gpkg")
    write_file(df, p)
    back = read_file(spark, p)
    assert back.select(st.st_to_wkt("geometry")).first()[0] == "POINT (5 6)"


def test_gpkg_edge_values(spark, tmp_path):
    """Unicode, extreme longs, and ±inf survive the sqlite round-trip
    (NaN surfaces as NULL — the engine's NaN→NULL convention)."""
    import polars_st_spark as st
    from polars_st_spark.sources.geopackage_io import (read_geopackage,
                                                       write_geopackage)

    rows = [
        (1, "héllo ✓ 中文", float("nan"), -2**62, "POINT (1 2)"),
        (2, "", float("inf"), 2**62, "POINT (3 4)"),
    ]
    df = spark.createDataFrame(rows, ["id", "tag", "val", "big", "wkt"]) \
        .select("id", "tag", "val", "big", st.st_from_wkt("wkt").alias("geometry"))
    p = str(tmp_path / "edge.gpkg")
    write_geopackage(df, p)
    out = read_geopackage(spark, p).orderBy("id").collect()
    assert out[0]["tag"] == "héllo ✓ 中文"
    assert out[0]["val"] is None or out[0]["val"] != out[0]["val"]
    assert out[0]["big"] == -2**62
    assert out[1]["tag"] == ""
    assert out[1]["val"] == float("inf")
    assert out[1]["big"] == 2**62
