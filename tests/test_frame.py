"""Frame-level API tests: geodataframe sniffing, geom selector, sjoin sugar."""

import pytest
from pyspark.sql import functions as F

import polars_st_spark as st


def test_geodataframe_sniff_wkt(spark):
    df = spark.createDataFrame([(1, "POINT (1 2)")], ["id", "geometry"])
    out = st.geodataframe(df)
    assert dict(out.dtypes)["geometry"] == "binary"
    assert out.select(st.st_to_wkt("geometry")).first()[0] == "POINT (1 2)"


def test_geodataframe_sniff_ewkt(spark):
    df = spark.createDataFrame([(1, "SRID=4326;POINT (1 2)")], ["id", "geometry"])
    out = st.geodataframe(df)
    assert out.select(st.st_srid("geometry")).first()[0] == 4326


def test_geodataframe_sniff_geojson(spark):
    df = spark.createDataFrame([(1, '{"type":"Point","coordinates":[3,4]}')], ["id", "geometry"])
    out = st.geodataframe(df)
    assert out.select(st.st_to_wkt("geometry")).first()[0] == "POINT (3 4)"


def test_geodataframe_coords(spark):
    df = spark.createDataFrame([(1, [[0.0, 0.0], [1.0, 1.0]])], ["id", "geometry"])
    out = st.geodataframe(df, geometry_format="coords")
    assert out.select(st.st_geometry_type("geometry")).first()[0] == "LineString"


def test_sjoin_sugar(spark):
    zones = st.geodataframe(
        spark.createDataFrame([(1, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")], ["zid", "geometry"])
    )
    pts = st.geodataframe(spark.createDataFrame([(1, "POINT (5 5)"), (2, "POINT (50 50)")], ["pid", "geometry"]))
    out = st.sjoin(pts, zones, predicate="within", strategy="broadcast")
    assert [r["pid"] for r in out.collect()] == [1]


def test_to_feature_dicts(spark):
    df = st.geodataframe(spark.createDataFrame([(7, "POINT (1 2)")], ["id", "geometry"]))
    feats = st.to_feature_dicts(df)
    assert feats[0]["properties"]["id"] == 7
    assert feats[0]["geometry"]["type"] == "Point"


def test_driver_bounded_sinks_raise(spark, tmp_path):
    """Driver-collecting exports are bounded: past max_rows they raise
    instead of OOMing the driver (VERDICT r2 item 8)."""
    import pytest
    from polars_st_spark.sources.geojson_io import write_geojson

    rows = [(i, f"POINT ({i} {i})") for i in range(5)]
    df = st.geodataframe(spark.createDataFrame(rows, ["id", "geometry"]))
    with pytest.raises(ValueError, match="max_rows"):
        st.to_feature_dicts(df, max_rows=3)
    with pytest.raises(ValueError, match="max_rows"):
        write_geojson(df, str(tmp_path / "too_big.geojson"), max_rows=3)
    # within the bound both still work
    assert len(st.to_feature_dicts(df, max_rows=5)) == 5
    write_geojson(df, str(tmp_path / "ok.geojson"), max_rows=5)
