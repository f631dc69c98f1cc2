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
    df = st.geodataframe(spark.createDataFrame([(1, "POINT (1 2)")], ["id", "geometry"]))
    with pytest.raises(ImportError, match="pyogrio"):
        write_file(df, str(tmp_path / "out.shp"))
    with pytest.raises(ImportError, match="pyogrio"):
        read_file(spark, str(tmp_path / "missing.gpkg"))


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
