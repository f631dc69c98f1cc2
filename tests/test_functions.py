"""Spark function-layer tests: st_* columns over DataFrames."""

import math

import pytest
from pyspark.sql import functions as F

import polars_st_spark as st


@pytest.fixture(scope="module")
def geoms(spark):
    rows = [
        (1, "POINT (1 2)"),
        (2, "LINESTRING (0 0, 3 4)"),
        (3, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),
        (4, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"),
        (5, None),
        (6, "POINT EMPTY"),
        (7, "MULTIPOLYGON (((0 0, 1 0, 0 1, 0 0)), ((2 2, 3 2, 2 3, 2 2)))"),
    ]
    df = spark.createDataFrame(rows, ["id", "wkt"])
    return df.withColumn("geom", st.st_from_wkt("wkt")).cache()


def _vals(df, col):
    return {r["id"]: r[col] for r in df.select("id", col).collect()}


def test_from_wkt_null_passthrough(geoms):
    v = _vals(geoms.withColumn("out", F.col("geom")), "out")
    assert v[5] is None and v[1] is not None


def test_area(geoms):
    v = _vals(geoms.withColumn("out", st.st_area("geom")), "out")
    assert v[3] == 16.0 and v[4] == 15.0 and v[2] == 0.0 and v[5] is None
    assert v[7] == 1.0


def test_length(geoms):
    v = _vals(geoms.withColumn("out", st.st_length("geom")), "out")
    assert v[2] == 5.0 and v[3] == 16.0


def test_geometry_type_and_header_ops(geoms):
    v = _vals(geoms.withColumn("out", st.st_geometry_type("geom")), "out")
    assert v[1] == "Point" and v[3] == "Polygon" and v[7] == "MultiPolygon" and v[5] is None
    v = _vals(geoms.withColumn("out", st.st_srid("geom")), "out")
    assert v[1] == 0
    v = _vals(geoms.withColumn("out", st.st_dimensions("geom")), "out")
    assert v[1] == 0 and v[2] == 1 and v[3] == 2


def test_xy(geoms):
    vx = _vals(geoms.withColumn("out", st.st_x("geom")), "out")
    vy = _vals(geoms.withColumn("out", st.st_y("geom")), "out")
    assert vx[1] == 1.0 and vy[1] == 2.0
    # reference returns NaN for non-point (functions.rs:448-452); at the Arrow
    # boundary NaN surfaces as NULL — documented engine convention
    assert vx[3] is None
    assert vx[5] is None


def test_point_constructor_vectorized(spark):
    df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 100).cast("double").alias("x"),
        (F.col("id") % 50).cast("double").alias("y"),
    )
    out = df.select("id", st.st_point("x", "y", srid=4326).alias("g"))
    row = out.where(F.col("id") == 123).select(
        st.st_to_ewkt("g").alias("wkt"), st.st_srid("g").alias("srid")
    ).first()
    assert row["wkt"] == "SRID=4326;POINT (23 23)"
    assert row["srid"] == 4326


def test_rectangle_constructor(spark):
    df = spark.createDataFrame([(0.0, 0.0, 2.0, 3.0)], ["x0", "y0", "x1", "y1"])
    out = df.select(st.st_rectangle("x0", "y0", "x1", "y1").alias("r"))
    row = out.select(st.st_area("r").alias("a"), st.st_to_wkt("r").alias("w")).first()
    assert row["a"] == 6.0
    assert row["w"] == "POLYGON ((0 0, 2 0, 2 3, 0 3, 0 0))"


def test_predicates_with_scalar_other(geoms):
    v = _vals(geoms.withColumn("out", st.st_intersects("geom", "POINT (1 2)")), "out")
    assert v[1] is True and v[3] is True and v[7] is False and v[5] is None
    v = _vals(geoms.withColumn("out", st.st_contains("geom", "POINT (2 3)")), "out")
    assert v[3] is True and v[1] is False
    v = _vals(geoms.withColumn("out", st.st_dwithin("geom", "POINT (5 2)", 1.5)), "out")
    assert v[3] is True  # distance 1 < 1.5


def test_predicates_column_vs_column(spark):
    df = spark.createDataFrame(
        [(1, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", "POINT (1 1)"),
         (2, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", "POINT (9 9)")],
        ["id", "wa", "wb"],
    )
    df = df.select("id", st.st_from_wkt("wa").alias("a"), st.st_from_wkt("wb").alias("b"))
    v = {r["id"]: r["out"] for r in df.withColumn("out", st.st_contains("a", "b")).collect()}
    assert v[1] is True and v[2] is False


def test_transforms(geoms):
    v = _vals(
        geoms.withColumn("out", st.st_to_wkt(st.st_centroid("geom"))), "out"
    )
    assert v[3] == "POINT (2 2)"
    v = _vals(geoms.withColumn("out", st.st_to_wkt(st.st_translate("geom", 1, 1))), "out")
    assert v[1] == "POINT (2 3)"
    v = _vals(geoms.withColumn("out", st.st_area(st.st_convex_hull("geom"))), "out")
    assert v[3] == 16.0
    v = _vals(geoms.withColumn("out", st.st_area(st.st_envelope("geom"))), "out")
    assert v[2] == 12.0


def test_set_ops(geoms):
    other = "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))"
    v = _vals(geoms.withColumn("out", st.st_area(st.st_intersection("geom", other))), "out")
    assert v[3] == 4.0
    v = _vals(geoms.withColumn("out", st.st_area(st.st_difference("geom", other))), "out")
    assert v[3] == 12.0
    v = _vals(geoms.withColumn("out", st.st_area(st.st_union("geom", other))), "out")
    assert v[3] == 28.0


def test_bounds_and_serialization(geoms):
    v = _vals(geoms.withColumn("out", st.st_bounds("geom")), "out")
    assert v[3] == [0.0, 0.0, 4.0, 4.0]
    v = _vals(geoms.withColumn("out", st.st_to_geojson("geom")), "out")
    assert '"type":"Point"' in v[1]


def test_srid_flow(spark):
    df = spark.createDataFrame([("SRID=4326;POINT (1 2)",)], ["e"])
    g = df.select(st.st_from_ewkt("e").alias("g"))
    row = g.select(
        st.st_srid("g").alias("srid"),
        st.st_srid(st.st_set_srid("g", 3857)).alias("srid2"),
        st.st_srid(st.st_centroid("g")).alias("srid3"),
    ).first()
    assert row["srid"] == 4326 and row["srid2"] == 3857 and row["srid3"] == 4326


def test_to_srid_webmercator(spark):
    df = spark.createDataFrame([("SRID=4326;POINT (0 0)",), ("SRID=4326;POINT (90 45)",)], ["e"])
    g = df.select(st.st_from_ewkt("e").alias("g"))
    out = g.select(st.st_x(st.st_to_srid("g", 3857)).alias("x"),
                   st.st_y(st.st_to_srid("g", 3857)).alias("y")).collect()
    assert abs(out[0]["x"]) < 1e-9 and abs(out[0]["y"]) < 1e-9
    assert abs(out[1]["x"] - 10018754.171394622) < 1.0
    assert abs(out[1]["y"] - 5621521.486192066) < 1.0


def test_aggregations(spark):
    rows = []
    for grp, xs in [("A", [0, 1, 4]), ("B", [10])]:
        for x in xs:
            rows.append((grp, f"POLYGON (({x} 0, {x+2} 0, {x+2} 2, {x} 2, {x} 0))"))
    rows.append(("C", None))
    df = spark.createDataFrame(rows, ["grp", "wkt"])
    df = df.withColumn("geom", st.st_from_wkt("wkt"))
    out = df.groupBy("grp").agg(st.st_union_all("geom").alias("u"))
    v = {r["grp"]: r["a"] for r in out.select("grp", st.st_area("u").alias("a")).collect()}
    assert v["A"] == 10.0 and v["B"] == 4.0 and v["C"] == 0.0
    # agg identity: all-null group → GEOMETRYCOLLECTION EMPTY
    w = {r["grp"]: r["w"] for r in out.select("grp", st.st_to_wkt("u").alias("w")).collect()}
    assert w["C"] == "GEOMETRYCOLLECTION EMPTY"


def test_intersection_all_agg(spark):
    rows = [("A", "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),
            ("A", "POLYGON ((1 1, 5 1, 5 5, 1 5, 1 1))")]
    df = spark.createDataFrame(rows, ["grp", "wkt"]).withColumn("geom", st.st_from_wkt("wkt"))
    out = df.groupBy("grp").agg(st.st_intersection_all("geom").alias("i"))
    assert out.select(st.st_area("i")).first()[0] == 9.0


def test_collect_agg(spark):
    rows = [("A", "POINT (0 0)"), ("A", "POINT (1 1)")]
    df = spark.createDataFrame(rows, ["grp", "wkt"]).withColumn("geom", st.st_from_wkt("wkt"))
    out = df.groupBy("grp").agg(st.st_collect("geom").alias("c"))
    assert out.select(st.st_geometry_type("c")).first()[0] == "MultiPoint"


def test_total_bounds(spark):
    rows = [("POINT (0 5)",), ("POINT (10 -3)",), ("POINT EMPTY",)]
    df = spark.createDataFrame(rows, ["wkt"]).withColumn("geom", st.st_from_wkt("wkt"))
    row = df.select(st.st_bounds("geom").alias("b")).agg(*st.st_total_bounds("b")).first()
    assert [row["xmin"], row["ymin"], row["xmax"], row["ymax"]] == [0.0, -3.0, 10.0, 5.0]


def test_filter_pushdown_composition(geoms):
    # spatial predicate composes with ordinary Spark filter/select
    n = geoms.where(st.st_intersects("geom", "POINT (1 2)")).count()
    # point itself, the 4x4 polygon, and the holed polygon ((1,2) lies on the
    # hole boundary, which is in the polygon's closure)
    assert n == 3


def test_clip_by_rect(geoms):
    v = _vals(geoms.withColumn("out", st.st_area(st.st_clip_by_rect("geom", 2, 2, 6, 6))), "out")
    assert v[3] == 4.0


def test_build_area_hole_nesting(spark):
    """r4b: GEOS BuildArea nesting semantics — even containment depth =
    shell, odd depth = hole of its parent, deeper islands stand alone."""
    from pyspark.sql import functions as F

    cases = [
        (1, "MULTILINESTRING ((0 0, 10 0, 10 10, 0 10, 0 0),"
            " (2 2, 8 2, 8 8, 2 8, 2 2))", 64.0, "Polygon"),
        (2, "MULTILINESTRING ((0 0, 10 0, 10 10, 0 10, 0 0),"
            " (2 2, 8 2, 8 8, 2 8, 2 2), (4 4, 6 4, 6 6, 4 6, 4 4))",
         68.0, "MultiPolygon"),
        (3, "MULTILINESTRING ((0 0, 1 0, 1 1, 0 1, 0 0),"
            " (5 5, 6 5, 6 6, 5 6, 5 5))", 2.0, "MultiPolygon"),
    ]
    df = spark.createDataFrame([(i, w) for i, w, _, _ in cases], ["id", "wkt"])
    rows = df.select(
        "id",
        st.st_area(st.st_build_area(st.st_from_wkt("wkt"))).alias("area"),
        st.st_geometry_type(st.st_build_area(st.st_from_wkt("wkt"))).alias("t"),
    ).orderBy("id").collect()
    for (i, _, area, typ), r in zip(cases, rows):
        assert r["area"] == pytest.approx(area), i
        assert r["t"] == typ, i


def test_broadcastable_expr_parameters(spark):
    """r4c: scalar parameters that are broadcastable Exprs in the reference
    (buffer distance functions.rs:1289-1300, get_* index functions.rs:631-671,
    interpolate distance functions.rs:1700-1717, snap tolerance
    arity.rs:119-172) accept a per-row Column here too; Python scalars keep
    the closure path bit-identically."""
    import math

    from pyspark.sql import functions as F

    df = st.geodataframe(spark.createDataFrame(
        [(1, "POINT (0 0)", 1.0, 0), (2, "POINT (0 0)", 2.0, 1),
         (3, "LINESTRING (0 0, 10 0)", 0.5, 2), (4, None, 1.0, 0)],
        ["id", "geometry", "d", "i"]))
    rows = {r["id"]: r for r in df.select(
        "id",
        st.st_area(st.st_buffer("geometry", "d", quad_segs=64)).alias("barea"),
        st.st_to_wkt(st.st_interpolate("geometry", F.col("d"))).alias("interp"),
    ).collect()}
    assert abs(rows[1]["barea"] - math.pi) < 2e-3
    assert abs(rows[2]["barea"] - 4 * math.pi) < 8e-3
    assert rows[3]["interp"] == "POINT (0.5 0)"
    assert rows[4]["barea"] is None and rows[4]["interp"] is None
    # scalar path unchanged: same value as the per-row path at equal distance
    s1 = df.where(F.col("id") == 1).select(
        st.st_area(st.st_buffer("geometry", 1.0, quad_segs=64)).alias("a")).first()["a"]
    assert s1 == rows[1]["barea"]

    # per-row index on get_point; out-of-range -> null
    dfl = st.geodataframe(spark.createDataFrame(
        [(1, "LINESTRING (0 0, 1 1, 2 2)", 0), (2, "LINESTRING (5 5, 6 6)", 1),
         (3, "LINESTRING (9 9, 8 8)", 5)],
        ["id", "geometry", "i"]))
    pts = {r["id"]: r["p"] for r in dfl.select(
        "id", st.st_to_wkt(st.st_get_point("geometry", "i")).alias("p")).collect()}
    assert pts == {1: "POINT (0 0)", 2: "POINT (6 6)", 3: None}

    # per-row snap tolerance, constant and column other
    df3 = st.geodataframe(spark.createDataFrame(
        [(1, "POINT (0.4 0)", 0.5), (2, "POINT (0.4 0)", 0.1)],
        ["id", "geometry", "tol"]))
    out = {r["id"]: r["s"] for r in df3.select(
        "id", st.st_to_wkt(st.st_snap("geometry", "POINT (0 0)", "tol")).alias("s"),
    ).collect()}
    assert out == {1: "POINT (0 0)", 2: "POINT (0.4 0)"}
    df4 = st.geodataframe(st.geodataframe(spark.createDataFrame(
        [(1, "POINT (0.4 0)", "POINT (0 0)", 0.5),
         (2, "POINT (0.4 0)", "POINT (0 0)", 0.1)],
        ["id", "geometry", "g2", "tol"]), "g2"), "geometry")
    out = {r["id"]: r["s"] for r in df4.select(
        "id", st.st_to_wkt(st.st_snap("geometry", "g2", "tol")).alias("s")).collect()}
    assert out == {1: "POINT (0 0)", 2: "POINT (0.4 0)"}


def test_to_wkb_reference_params(spark):
    """r4c: st_to_wkb carries the reference's full signature
    (geoexpr.py:394-415): output_dimension (2 strips Z), byte_order
    (0 = XDR big endian, parseable back), include_srid default False."""
    import pytest
    from polars_st_spark.geo.wkb import from_ewkb

    df = st.geodataframe(
        spark.createDataFrame([(1, "SRID=4326;POINT Z (1 2 3)")], ["id", "geometry"]),
        geometry_format="ewkt")
    r = df.select(
        st.st_to_wkb("geometry").alias("ndr"),
        st.st_to_wkb("geometry", byte_order=0).alias("xdr"),
        st.st_to_wkb("geometry", output_dimension=2).alias("d2"),
        st.st_to_wkb("geometry", include_srid=True).alias("with_srid"),
    ).first()
    assert r["ndr"][0] == 1 and r["xdr"][0] == 0  # NDR vs XDR flag byte
    a, b = from_ewkb(bytes(r["ndr"])), from_ewkb(bytes(r["xdr"]))
    assert a.coords.tolist() == b.coords.tolist() == [1.0, 2.0, 3.0]
    assert a.srid == 0  # include_srid defaults False like the reference
    c = from_ewkb(bytes(r["d2"]))
    assert c.coords.tolist() == [1.0, 2.0] and not c.has_z
    assert from_ewkb(bytes(r["with_srid"])).srid == 4326
    with pytest.raises(ValueError, match="byte_order"):
        st.st_to_wkb("geometry", byte_order=2)
    with pytest.raises(ValueError, match="output_dimension"):
        st.st_to_wkb("geometry", output_dimension=5)
    # output_dimension=3 on XYZM drops M keeping XYZ (GEOS WKBWriter caps
    # at 3 dims); an XYM-only geometry already fits and keeps its M
    df2 = st.geodataframe(
        spark.createDataFrame(
            [(1, "POINT ZM (1 2 3 4)"), (2, "POINT M (1 2 9)")],
            ["id", "geometry"]),
        geometry_format="wkt")
    zm = {r["id"]: from_ewkb(bytes(r["w"])) for r in df2.select(
        "id", st.st_to_wkb("geometry", output_dimension=3).alias("w")).collect()}
    assert zm[1].coords.tolist() == [1.0, 2.0, 3.0]
    assert zm[1].has_z and not zm[1].has_m
    assert zm[2].coords.tolist() == [1.0, 2.0, 9.0]
    assert zm[2].has_m and not zm[2].has_z


def test_geom_arg_wkt_vs_column_sniffing(spark):
    """VERDICT r3 cosmetic: the string form of a geometry argument is WKT
    only when it parses like WKT (type keyword + structure); bare or even
    geometry-ish column names resolve as columns."""
    from pyspark.sql import functions as F

    df = spark.range(3).select(
        st.st_point(F.col("id") * 1.0, F.lit(0.0)).alias("points"))
    assert df.select(st.st_distance("points", "points")).first()[0] == 0.0
    assert df.orderBy(F.col("id").desc()).select(
        st.st_distance("points", "POINT (0 0)")).collect()[0][0] == 2.0
    assert df.select(
        st.st_distance("points", "SRID=4326;POINT (1 0)")).first()[0] == 1.0
    assert df.select(st.st_is_empty(
        st.st_intersection("points", "POLYGON EMPTY"))).first()[0] is True


def test_point_buffer_batch_parity(spark):
    """r5: uniform point-batch buffers (round n-gon / square, scalar and
    per-row distance, srid) are byte-identical to the per-row kernel."""
    from polars_st_spark.geo import algos
    from polars_st_spark.geo.wkb import from_ewkb, to_ewkb

    df = spark.createDataFrame(
        [(i, float(i % 13), float((i * 7) % 11), 0.5 + (i % 5) * 0.25)
         for i in range(120)], ["id", "x", "y", "d"])
    pts = df.select(
        "id", "d", st.st_point("x", "y").alias("pt"),
        st.st_set_srid(st.st_point("x", "y"), 4326).alias("pt4326"))
    rows = pts.select(
        "id", "d", "pt", "pt4326",
        st.st_buffer("pt", 1.5).alias("b1"),
        st.st_buffer("pt", 1.5, cap_style="square").alias("b2"),
        st.st_buffer("pt", "d").alias("b3"),
        st.st_buffer("pt4326", 2.0, quad_segs=4).alias("b4"),
    ).collect()
    for r in rows:
        g = from_ewkb(bytes(r["pt"]))
        g4 = from_ewkb(bytes(r["pt4326"]))
        assert bytes(r["b1"]) == to_ewkb(algos.buffer(g, 1.5))
        assert bytes(r["b2"]) == to_ewkb(algos.buffer(g, 1.5, cap_style="square"))
        assert bytes(r["b3"]) == to_ewkb(algos.buffer(g, float(r["d"])))
        assert bytes(r["b4"]) == to_ewkb(algos.buffer(g4, 2.0, quad_segs=4))
    # negative / zero / flat distances stay on the per-row path
    one = pts.limit(3).select(
        st.st_area(st.st_buffer("pt", -1.0)).alias("neg"),
        st.st_area(st.st_buffer("pt", 1.0, cap_style="flat")).alias("flat"),
    ).collect()
    for r in one:
        assert r["neg"] == 0.0 and r["flat"] == 0.0
