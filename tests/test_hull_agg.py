"""Tests: concave hull, shared paths, new aggregation variants."""

import pytest
from pyspark.sql import functions as F

import polars_st_spark as st


def test_concave_hull(spark):
    df = spark.createDataFrame(
        [(1, "MULTIPOINT ((0 0), (4 0), (4 1), (1 1), (1 3), (4 3), (4 4), (0 4))")],
        ["id", "w"],
    ).select("id", st.st_from_wkt("w").alias("g"))
    row = df.select(
        st.st_area(st.st_concave_hull("g", ratio=1.0)).alias("loose"),
        st.st_area(st.st_concave_hull("g", ratio=0.0)).alias("tight"),
        st.st_area(st.st_convex_hull("g")).alias("convex"),
    ).first()
    assert row["loose"] == row["convex"] == 16.0
    assert row["tight"] <= row["loose"]


def test_shared_paths(spark):
    df = spark.createDataFrame([(1, "LINESTRING (0 0, 10 0)")], ["id", "w"]).select(
        "id", st.st_from_wkt("w").alias("g")
    )
    out = df.select(st.st_length(st.st_shared_paths("g", "LINESTRING (2 0, 5 0)")).alias("l"))
    assert out.first()["l"] == 3.0


def test_difference_all_agg(spark):
    rows = [("A", "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"),
            ("A", "POLYGON ((0 0, 5 0, 5 10, 0 10, 0 0))")]
    df = spark.createDataFrame(rows, ["grp", "w"]).select("grp", st.st_from_wkt("w").alias("g"))
    # single partition → deterministic order for this 2-row case
    out = df.coalesce(1).groupBy("grp").agg(st.st_difference_all("g").alias("d"))
    assert out.select(st.st_area("d")).first()[0] == 50.0


def test_delaunay_voronoi_agg(spark):
    rows = [("A", "POINT (0 0)"), ("A", "POINT (2 0)"), ("A", "POINT (0 2)"), ("A", "POINT (2 2)")]
    df = spark.createDataFrame(rows, ["grp", "w"]).select("grp", st.st_from_wkt("w").alias("g"))
    out = df.groupBy("grp").agg(
        st.st_delaunay_triangles_agg("g").alias("tri"),
        st.st_voronoi_polygons_agg("g").alias("vor"),
    )
    row = out.select(
        st.st_area("tri").alias("ta"),
        st.st_count_geometries("vor").alias("nv"),
    ).first()
    assert row["ta"] == 4.0  # triangulated square area
    assert row["nv"] == 4


def test_polygonize_agg(spark):
    rows = [("A", "LINESTRING (0 0, 1 0, 1 1)"), ("A", "LINESTRING (1 1, 0 1, 0 0)")]
    df = spark.createDataFrame(rows, ["grp", "w"]).select("grp", st.st_from_wkt("w").alias("g"))
    out = df.groupBy("grp").agg(st.st_polygonize_agg("g").alias("p"))
    assert out.select(st.st_area("p")).first()[0] == 1.0


def test_disjoint_subset_union(spark):
    df = spark.createDataFrame(
        [(1, "GEOMETRYCOLLECTION (POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0)), POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5)))")],
        ["id", "w"],
    ).select("id", st.st_from_wkt("w").alias("g"))
    assert df.select(st.st_area(st.st_disjoint_subset_union("g"))).first()[0] == 2.0
