"""register_sql_functions: the ST_* SQL surface must produce exactly what
the Column API produces (same UDF objects, fast paths included)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

import polars_st_spark as st
from polars_st_spark.functions.sqlreg import SQL_FUNCTIONS


@pytest.fixture(scope="module")
def sql_ready(spark):
    names = st.register_sql_functions(spark)
    assert set(SQL_FUNCTIONS) <= set(names)
    df = spark.range(20).select(
        F.col("id").alias("k"),
        st.st_point(F.col("id") % 7 + 0.5, (F.col("id") * 3) % 5 + 0.5).alias("pt"),
        st.st_rectangle(F.lit(2.0), F.lit(1.0), F.lit(5.0), F.lit(4.0)).alias("rect"),
    )
    df.createOrReplaceTempView("sqlreg_t")
    return spark


def test_sql_scalar_functions_match_column_api(sql_ready):
    spark = sql_ready
    got = spark.sql("""
        SELECT k, st_area(rect) AS a, st_length(rect) AS l,
               st_x(pt) AS x, st_y(pt) AS y, st_srid(pt) AS srid,
               st_geometry_type(pt) AS t, st_is_valid(rect) AS v,
               st_is_empty(pt) AS e
        FROM sqlreg_t ORDER BY k
    """).collect()
    ref = (spark.table("sqlreg_t").select(
        "k",
        st.st_area("rect").alias("a"), st.st_length("rect").alias("l"),
        st.st_x("pt").alias("x"), st.st_y("pt").alias("y"),
        st.st_srid("pt").alias("srid"),
        st.st_geometry_type("pt").alias("t"),
        st.st_is_valid("rect").alias("v"), st.st_is_empty("pt").alias("e"),
    ).orderBy("k").collect())
    assert [r.asDict() for r in got] == [r.asDict() for r in ref]


def test_sql_predicates_match_column_api(sql_ready):
    spark = sql_ready
    got = spark.sql("""
        SELECT k, st_intersects(pt, rect) AS i, st_within(pt, rect) AS w,
               st_contains(rect, pt) AS c, st_disjoint(pt, rect) AS d,
               st_touches(pt, rect) AS t
        FROM sqlreg_t ORDER BY k
    """).collect()
    ref = (spark.table("sqlreg_t").select(
        "k",
        st.st_intersects("pt", F.col("rect")).alias("i"),
        st.st_within("pt", F.col("rect")).alias("w"),
        st.st_contains("rect", F.col("pt")).alias("c"),
        st.st_disjoint("pt", F.col("rect")).alias("d"),
        st.st_touches("pt", F.col("rect")).alias("t"),
    ).orderBy("k").collect())
    assert [r.asDict() for r in got] == [r.asDict() for r in ref]
    # sanity: the data actually exercises both outcomes
    assert {r["i"] for r in got} == {True, False}


def test_sql_distance_matches_column_api(sql_ready):
    spark = sql_ready
    got = spark.sql(
        "SELECT k, st_distance(pt, rect) AS d FROM sqlreg_t ORDER BY k"
    ).collect()
    ref = (spark.table("sqlreg_t").select(
        "k", st.st_distance("pt", F.col("rect")).alias("d"))
        .orderBy("k").collect())
    assert [r.asDict() for r in got] == [r.asDict() for r in ref]
    assert any(r["d"] > 0 for r in got) and any(r["d"] == 0 for r in got)


def test_sql_wkt_roundtrip(sql_ready):
    spark = sql_ready
    rows = spark.sql("""
        SELECT st_to_wkt(pt) AS w,
               st_x(st_from_wkt(st_to_wkt(pt))) AS x2, st_x(pt) AS x1
        FROM sqlreg_t
    """).collect()
    for r in rows:
        assert r["w"].startswith("POINT")
        assert r["x2"] == r["x1"]


def test_register_is_idempotent(sql_ready):
    names = st.register_sql_functions(sql_ready)
    assert "st_area" in names
    assert sql_ready.sql(
        "SELECT st_area(rect) AS a FROM sqlreg_t LIMIT 1").collect()[0]["a"] == 9.0
