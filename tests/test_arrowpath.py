"""operators/arrowpath.measure_arrow: zero-copy Arrow-native measures must
match st_area/st_length row-for-row on every lane (uniform rects, points,
SRID-tagged rows, mixed batches, nulls, ragged polygons via fallback)."""

from __future__ import annotations

import pyspark.sql.functions as F

import polars_st_spark as st
from polars_st_spark.operators.arrowpath import measure_arrow


def _parity(df, col, keys=("id",)):
    got = sorted(
        tuple(r) for r in measure_arrow(df, col, keep=keys).collect())
    ref = sorted(tuple(r) for r in df.select(
        *keys, st.st_area(col).alias("area"), st.st_length(col).alias("length")
    ).collect())
    assert got == ref
    return got


def test_uniform_rects_fast_lane(spark):
    df = spark.range(500).select(
        "id",
        st.st_rectangle(F.lit(0.0), F.lit(0.0),
                        (F.col("id") % 4 + 1.0), (F.col("id") % 3 + 2.0)).alias("g"))
    rows = _parity(df, "g")
    assert {r[1] for r in rows} == {w * h for w in (1.0, 2.0, 3.0, 4.0)
                                    for h in (2.0, 3.0, 4.0)}


def test_point_lane(spark):
    df = spark.range(100).select(
        "id", st.st_point(F.col("id") * 1.0, F.lit(2.0)).alias("g"))
    rows = _parity(df, "g")
    assert all(r[1] == 0.0 and r[2] == 0.0 for r in rows)


def test_srid_header_uniformity(spark):
    df = spark.range(50).select(
        "id",
        st.st_set_srid(
            st.st_rectangle(F.lit(1.0), F.lit(1.0), F.lit(3.0), F.lit(2.0)),
            4326).alias("g"))
    rows = _parity(df, "g")
    assert all(r[1] == 2.0 and r[2] == 6.0 for r in rows)


def test_mixed_and_null_fallback(spark):
    df = spark.range(9).select(
        "id",
        F.when(F.col("id") % 3 == 0,
               st.st_from_wkt(F.lit("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")))
        .when(F.col("id") % 3 == 1,
              st.st_from_wkt(F.lit("LINESTRING (0 0, 3 4)")))
        .otherwise(F.lit(None).cast("binary")).alias("g"))
    rows = _parity(df, "g")
    by_id = {r[0]: (r[1], r[2]) for r in rows}
    assert by_id[0] == (16.0, 16.0)
    assert by_id[1] == (0.0, 5.0)
    assert by_id[2] == (None, None)


def test_holed_polygon_fallback(spark):
    df = spark.range(4).select("id", st.st_from_wkt(F.lit(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0),"
        " (2 2, 2 4, 4 4, 4 2, 2 2))")).alias("g"))
    rows = _parity(df, "g")
    assert all(r[1] == 96.0 for r in rows)


def test_keep_columns_pass_through(spark):
    df = spark.range(20).select(
        "id", (F.col("id") * 2).alias("k2"),
        st.st_rectangle(F.lit(0.0), F.lit(0.0), F.lit(2.0), F.lit(2.0)).alias("g"))
    out = measure_arrow(df, "g", keep=("id", "k2"))
    assert out.columns == ["id", "k2", "area", "length"]
    rows = out.collect()
    assert all(r["k2"] == r["id"] * 2 and r["area"] == 4.0 for r in rows)


def test_bounds_arrow_parity(spark):
    from polars_st_spark.operators.arrowpath import bounds_arrow

    df = spark.range(200).select(
        "id",
        F.when(F.col("id") % 4 == 3, F.lit(None).cast("binary"))
        .otherwise(st.st_rectangle(
            (F.col("id") % 5) * 1.0, F.lit(0.0),
            (F.col("id") % 5) + 2.0, (F.col("id") % 3) + 1.0)).alias("g"))
    got = sorted(tuple(r) for r in bounds_arrow(df, "g", keep=("id",)).collect())
    b = st.st_bounds("g")
    ref = sorted(tuple(r) for r in df.select(
        "id", b[0].alias("xmin"), b[1].alias("ymin"),
        b[2].alias("xmax"), b[3].alias("ymax")).collect())
    assert got == ref


def test_bounds_arrow_points_and_mixed(spark):
    from polars_st_spark.operators.arrowpath import bounds_arrow

    pts = spark.range(50).select(
        "id", st.st_point(F.col("id") * 1.0, F.col("id") * 2.0).alias("g"))
    rows = {r["id"]: (r["xmin"], r["ymax"]) for r in
            bounds_arrow(pts, "g", keep=("id",)).collect()}
    assert all(v == (float(k), 2.0 * k) for k, v in rows.items())
    mixed = spark.range(6).select("id", F.when(
        F.col("id") % 2 == 0,
        st.st_from_wkt(F.lit("LINESTRING (1 2, 5 -3)"))).otherwise(
        st.st_from_wkt(F.lit("POINT (7 8)"))).alias("g"))
    rows = {r["id"]: (r["xmin"], r["ymin"], r["xmax"], r["ymax"]) for r in
            bounds_arrow(mixed, "g", keep=("id",)).collect()}
    assert rows[0] == (1.0, -3.0, 5.0, 2.0) and rows[1] == (7.0, 8.0, 7.0, 8.0)
