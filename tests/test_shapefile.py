"""Native Shapefile reader/writer (sources/shapefile_io.py) — round-trips
through our own .shp/.shx/.dbf/.prj implementation, no GDAL."""

import numpy as np
import pytest
from pyspark.sql import functions as F

import polars_st_spark as st
from polars_st_spark.sources.shapefile_io import read_shapefile, write_shapefile


def test_point_roundtrip_with_attrs(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "alpha", 2.5, True, "POINT (10 20)"),
         (2, "beta", -1.25, False, "POINT (-30 45.5)"),
         (3, None, None, None, "POINT (0 0)")],
        ["id", "name", "score", "flag", "wkt"],
    ).select("id", "name", "score", "flag",
             st.st_set_srid(st.st_from_wkt("wkt"), 4326).alias("geometry"))
    p = str(tmp_path / "pts.shp")
    write_shapefile(df, p)
    back = read_shapefile(spark, p)
    rows = {r["id"]: r for r in back.select(
        "id", "name", "score", "flag",
        st.st_to_wkt("geometry").alias("w"),
        st.st_srid("geometry").alias("s")).collect()}
    assert rows[1]["w"] == "POINT (10 20)" and rows[1]["s"] == 4326
    assert rows[2]["name"] == "beta" and rows[2]["score"] == pytest.approx(-1.25)
    assert rows[1]["flag"] is True and rows[2]["flag"] is False
    assert rows[3]["name"] is None and rows[3]["flag"] is None


def test_polygon_with_hole_and_multipolygon(spark, tmp_path):
    w1 = ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
          "(4 4, 4 6, 6 6, 6 4, 4 4))")
    w2 = "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))"
    df = spark.createDataFrame([(1, w1), (2, w2)], ["id", "wkt"]).select(
        "id", st.st_from_wkt("wkt").alias("geometry"))
    p = str(tmp_path / "polys.shp")
    write_shapefile(df, p)
    back = read_shapefile(spark, p)
    got = {r["id"]: r for r in back.select(
        "id",
        st.st_area("geometry").alias("a"),
        st.st_geometry_type("geometry").alias("t"),
        st.st_count_interior_rings(
            st.st_get_geometry("geometry", 0)).alias("nh")).collect()}
    assert got[1]["a"] == 96.0 and got[1]["t"] == "Polygon"
    assert got[2]["a"] == 8.0 and got[2]["t"] == "MultiPolygon"


def test_lines_multipoint_z(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "LINESTRING Z (0 0 1, 3 4 2)"), (2, "MULTILINESTRING Z ((0 0 0, 1 0 5), (2 2 1, 3 3 2))")],
        ["id", "wkt"],
    ).select("id", st.st_from_wkt("wkt").alias("geometry"))
    p = str(tmp_path / "lines.shp")
    write_shapefile(df, p)
    back = read_shapefile(spark, p)
    got = {r["id"]: r for r in back.select(
        "id", st.st_length("geometry").alias("l"),
        st.st_has_z("geometry").alias("z")).collect()}
    assert got[1]["l"] == 5.0 and got[1]["z"] is True
    assert got[2]["l"] == pytest.approx(1.0 + np.sqrt(2))  # 2D chain lengths

    mp = spark.createDataFrame([(1, "MULTIPOINT ((1 2), (3 4))")], ["id", "wkt"]).select(
        "id", st.st_from_wkt("wkt").alias("geometry"))
    p2 = str(tmp_path / "mp.shp")
    write_shapefile(mp, p2)
    got2 = read_shapefile(spark, p2).select(
        st.st_count_geometries("geometry").alias("n")).first()
    assert got2["n"] == 2


def test_read_file_dispatch_now_native(spark, tmp_path):
    """read_file/write_file route .shp to the native implementation."""
    from polars_st_spark.sources.files import read_file, write_file

    df = spark.createDataFrame([(7, "POINT (1 2)")], ["id", "wkt"]).select(
        "id", st.st_from_wkt("wkt").alias("geometry"))
    p = str(tmp_path / "native.shp")
    write_file(df, p)
    back = read_file(spark, p)
    assert back.select(st.st_to_wkt("geometry")).first()[0] == "POINT (1 2)"
    assert back.select("id").first()[0] == 7
