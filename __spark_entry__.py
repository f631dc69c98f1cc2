"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exercises the engine's operator surface (SURVEY.md §2 plus the
training-data pipeline extensions) over the driver's TPC-H-ish parquet
tables. Geometry columns are derived deterministically from numeric columns
(FIXTURES.md pattern); each ``oracle_sql()`` entry computes the same result
in closed-form ANSI SQL (DuckDB has no spatial extension available offline,
so oracles are pure arithmetic — which independently validates the geometry
kernels rather than comparing GEOS to GEOS).

Float discipline for oracle parity: only exactly-rounded IEEE ops (+,-,*,/,
sqrt) appear in compared float columns, with identical operation order on
both sides; transcendental-dependent queries (buffer area, Mercator) are
rows-only checks. Cosines are rounded to 6 dp with id tiebreaks on rank.
"""

from __future__ import annotations

import os
import sys
import zipfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import polars_st_spark as st


def _ensure_workers(spark: SparkSession) -> None:
    """Ship the package to Spark Python workers (they don't inherit the
    driver's sys.path when the session runs from another cwd)."""
    if getattr(_ensure_workers, "_done", None) is spark:
        return
    zpath = os.path.join("/tmp", "polars_st_spark_pkg.zip")
    pkg = os.path.join(_REPO, "polars_st_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, _REPO))
    spark.sparkContext.addPyFile(zpath)
    _ensure_workers._done = spark
from polars_st_spark.operators import dedup as _dedup
from polars_st_spark.operators import knn as _knn
from polars_st_spark.operators import textops as _t
from polars_st_spark.operators.multimodal import image_features
from polars_st_spark.operators.sjoin import st_sjoin

SF_DEFAULT = "/root/testdata/sf0.001"


# ----------------------------------------------------------------------
# Deterministic geometry derivations (shared by queries and oracles)
# ----------------------------------------------------------------------
# customer points: x = (c_custkey % 97) + 0.5, y = ((c_custkey*7) % 89) + 0.5
# nation rects:    x0 = (n_nationkey % 5)*20, y0 = (n_nationkey // 5)*20,
#                  x1 = x0+18, y1 = y0+18   (disjoint 5x5 grid cells)
# supplier rects:  x0 = s_suppkey*1.5, y0 = (s_suppkey % 3)*0.5,
#                  x1 = x0+4, y1 = y0+4    (overlapping chain)
# lineitem rects:  x0 = (l_linenumber-1)*5, y0 = (l_suppkey % 3),
#                  x1 = x0+4, y1 = y0+4    (disjoint within a suppkey group)


def _cust_pts(spark: SparkSession, sf: str) -> DataFrame:
    c = spark.read.parquet(f"{sf}/customer.parquet")
    return c.select(
        "c_custkey",
        ((F.col("c_custkey") % 97) + 0.5).alias("x"),
        (((F.col("c_custkey") * 7) % 89) + 0.5).alias("y"),
    ).withColumn("pt", st.st_point("x", "y"))


def _nation_rects(spark: SparkSession, sf: str) -> DataFrame:
    n = spark.read.parquet(f"{sf}/nation.parquet")
    return n.select(
        "n_nationkey",
        ((F.col("n_nationkey") % 5) * 20.0).alias("x0"),
        ((F.floor(F.col("n_nationkey") / 5)) * 20.0).alias("y0"),
    ).select(
        "n_nationkey", "x0", "y0",
        (F.col("x0") + 18.0).alias("x1"),
        (F.col("y0") + 18.0).alias("y1"),
    ).withColumn("rect", st.st_rectangle("x0", "y0", "x1", "y1"))


def _supp_rects(spark: SparkSession, sf: str) -> DataFrame:
    s = spark.read.parquet(f"{sf}/supplier.parquet")
    return s.select(
        "s_suppkey", "s_nationkey",
        (F.col("s_suppkey") * 1.5).alias("x0"),
        ((F.col("s_suppkey") % 3) * 0.5).alias("y0"),
    ).select(
        "s_suppkey", "s_nationkey", "x0", "y0",
        (F.col("x0") + 4.0).alias("x1"),
        (F.col("y0") + 4.0).alias("y1"),
    ).withColumn("rect", st.st_rectangle("x0", "y0", "x1", "y1"))


def _li_rects(spark: SparkSession, sf: str) -> DataFrame:
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    return li.select(
        "l_orderkey", "l_suppkey", "l_linenumber", "l_quantity",
        (((F.col("l_linenumber") - 1) % 7) * 5.0).alias("x0"),
        ((F.col("l_suppkey") % 3) * 1.0).alias("y0"),
    ).select(
        "l_orderkey", "l_suppkey", "l_linenumber", "l_quantity", "x0", "y0",
        (F.col("x0") + 4.0).alias("x1"),
        (F.col("y0") + 4.0).alias("y1"),
    ).withColumn("rect", st.st_rectangle("x0", "y0", "x1", "y1"))


_ORACLE_CUST = """
  SELECT c_custkey,
         CAST((c_custkey % 97) + 0.5 AS DOUBLE) AS x,
         CAST(((c_custkey * 7) % 89) + 0.5 AS DOUBLE) AS y
  FROM customer
"""
_ORACLE_NATION = """
  SELECT n_nationkey,
         (n_nationkey % 5) * 20.0 AS x0,
         CAST(n_nationkey // 5 AS DOUBLE) * 20.0 AS y0,
         (n_nationkey % 5) * 20.0 + 18.0 AS x1,
         CAST(n_nationkey // 5 AS DOUBLE) * 20.0 + 18.0 AS y1
  FROM nation
"""
_ORACLE_SUPP = """
  SELECT s_suppkey, s_nationkey,
         s_suppkey * 1.5 AS x0,
         (s_suppkey % 3) * 0.5 AS y0,
         s_suppkey * 1.5 + 4.0 AS x1,
         (s_suppkey % 3) * 0.5 + 4.0 AS y1
  FROM supplier
"""
_ORACLE_LI = """
  SELECT l_orderkey, l_suppkey, l_linenumber, l_quantity,
         CAST(((l_linenumber - 1) % 7) * 5.0 AS DOUBLE) AS x0,
         CAST((l_suppkey % 3) * 1.0 AS DOUBLE) AS y0,
         CAST(((l_linenumber - 1) % 7) * 5.0 + 4.0 AS DOUBLE) AS x1,
         CAST((l_suppkey % 3) * 1.0 + 4.0 AS DOUBLE) AS y1
  FROM lineitem
"""

# tokenization shared by text oracles
_ORACLE_TOKENS = r"regexp_split_to_array(trim(lower(text)), '\s+')"
_ORACLE_H = "('0x' || substr(md5({expr}), 1, 8))::BIGINT"


# ----------------------------------------------------------------------
# Queries
# ----------------------------------------------------------------------

def q_point_xy(spark, sf):
    """st_point → EWKB → st_x/st_y round trip (vectorized batch codec)."""
    return _cust_pts(spark, sf).select(
        "c_custkey",
        st.st_x("pt").alias("px"),
        st.st_y("pt").alias("py"),
    )


def q_rect_area_perimeter(spark, sf):
    return _nation_rects(spark, sf).select(
        "n_nationkey",
        st.st_area("rect").alias("area"),
        st.st_length("rect").alias("perimeter"),
    )


def q_rect_bounds(spark, sf):
    r = _nation_rects(spark, sf).withColumn("b", st.st_bounds("rect"))
    return r.select(
        "n_nationkey",
        F.col("b")[0].alias("bxmin"),
        F.col("b")[1].alias("bymin"),
        F.col("b")[2].alias("bxmax"),
        F.col("b")[3].alias("bymax"),
    )


def q_rect_centroid(spark, sf):
    r = _nation_rects(spark, sf).withColumn("c", st.st_centroid("rect"))
    return r.select(
        "n_nationkey",
        st.st_x("c").alias("cx"),
        st.st_y("c").alias("cy"),
    )


def q_point_distance(spark, sf):
    return _cust_pts(spark, sf).select(
        "c_custkey",
        st.st_distance("pt", "POINT (50 45)").alias("dist"),
    )


def q_points_in_rects_broadcast(spark, sf):
    pts = _cust_pts(spark, sf)
    rects = _nation_rects(spark, sf).withColumnRenamed("rect", "geometry")
    joined = st_sjoin(
        pts.withColumnRenamed("pt", "geometry"), rects,
        predicate="within", strategy="broadcast",
    )
    return joined.select("c_custkey", "n_nationkey")


def q_points_in_rects_grid(spark, sf):
    pts = _cust_pts(spark, sf)
    rects = _nation_rects(spark, sf).withColumnRenamed("rect", "geometry")
    joined = st_sjoin(
        pts.withColumnRenamed("pt", "geometry"), rects,
        predicate="within", strategy="grid", cell_size=20.0,
    )
    return joined.select("c_custkey", "n_nationkey")


_WINDOW = (15.0, 15.0, 55.0, 47.0)  # fixed clip window


def q_rect_intersection_area(spark, sf):
    w = "POLYGON ((15 15, 55 15, 55 47, 15 47, 15 15))"
    return _nation_rects(spark, sf).select(
        "n_nationkey",
        st.st_area(st.st_intersection("rect", w)).alias("iarea"),
    )


def q_rect_difference_area(spark, sf):
    w = "POLYGON ((15 15, 55 15, 55 47, 15 47, 15 15))"
    return _nation_rects(spark, sf).select(
        "n_nationkey",
        st.st_area(st.st_difference("rect", w)).alias("darea"),
    )


def q_rect_symdiff_area(spark, sf):
    w = "POLYGON ((15 15, 55 15, 55 47, 15 47, 15 15))"
    return _nation_rects(spark, sf).select(
        "n_nationkey",
        st.st_area(st.st_symmetric_difference("rect", w)).alias("sarea"),
    )


def q_clip_by_rect_area(spark, sf):
    return _nation_rects(spark, sf).select(
        "n_nationkey",
        st.st_area(st.st_clip_by_rect("rect", *_WINDOW)).alias("carea"),
    )


def q_union_flagship(spark, sf):
    """Flagship: groupBy → union_all → area (README.md:13-31 pattern)."""
    return (
        _li_rects(spark, sf)
        .groupBy("l_suppkey")
        .agg(st.st_union_all("rect").alias("u"))
        .select("l_suppkey", st.st_area("u").alias("union_area"))
    )


def q_intersection_all(spark, sf):
    return (
        _supp_rects(spark, sf)
        .groupBy("s_nationkey")
        .agg(st.st_intersection_all("rect").alias("i"))
        .select("s_nationkey", st.st_area("i").alias("iarea"))
    )


def q_triangulate(spark, sf):
    """Delaunay over rect-corner multipoints: triangulated area == rect area,
    and the 4-corner Voronoi diagram always has 4 cells."""
    r = _nation_rects(spark, sf)
    corners = F.array(
        F.array("x0", "y0"), F.array("x1", "y0"),
        F.array("x1", "y1"), F.array("x0", "y1"),
    )
    mp = st.st_multipoint(corners)
    return r.select(
        "n_nationkey",
        st.st_area(st.st_delaunay_triangles(mp)).alias("tri_area"),
        st.st_count_geometries(st.st_voronoi_polygons(mp)).alias("n_cells"),
    )


def q_convex_hull(spark, sf):
    """Hull of a rect's corner multipoint == the rect itself."""
    r = _nation_rects(spark, sf)
    corners = F.array(
        F.array("x0", "y0"), F.array("x1", "y0"),
        F.array("x1", "y1"), F.array("x0", "y1"),
    )
    mp = st.st_multipoint(corners)
    return r.select(
        "n_nationkey",
        st.st_area(st.st_convex_hull(mp)).alias("hull_area"),
    )


def q_affine(spark, sf):
    p = _cust_pts(spark, sf)
    t = st.st_translate("pt", 10.0, -5.0)
    s = st.st_scale("pt", 2.0, 3.0, origin=(0.0, 0.0))
    return p.select(
        "c_custkey",
        st.st_x(t).alias("tx"),
        st.st_y(t).alias("ty"),
        st.st_x(s).alias("sx"),
        st.st_y(s).alias("sy"),
    )


def q_wkt_roundtrip(spark, sf):
    return _nation_rects(spark, sf).select(
        "n_nationkey",
        st.st_to_wkt("rect").alias("wkt"),
    )


def q_total_bounds(spark, sf):
    return (
        _cust_pts(spark, sf)
        .select(st.st_bounds("pt").alias("b"))
        .agg(*st.st_total_bounds("b"))
    )


def q_dwithin(spark, sf):
    return _cust_pts(spark, sf).select(
        "c_custkey",
        st.st_dwithin("pt", "POINT (50 45)", 20.0).alias("near"),
    )


def q_geometry_meta(spark, sf):
    p = _cust_pts(spark, sf).withColumn("pt4326", st.st_set_srid("pt", 4326))
    return p.select(
        "c_custkey",
        st.st_geometry_type("pt").alias("gtype"),
        st.st_srid("pt4326").alias("srid"),
        st.st_is_empty("pt").alias("empty"),
        st.st_dimensions("pt").alias("dims"),
        st.st_count_coordinates("pt").alias("ncoords"),
    )


def q_envelope_center(spark, sf):
    r = _li_rects(spark, sf).withColumn("c", st.st_center("rect"))
    return r.select(
        "l_orderkey", "l_linenumber",
        st.st_area(st.st_envelope("rect")).alias("env_area"),
        st.st_x("c").alias("ctr_x"),
        st.st_y("c").alias("ctr_y"),
    )


def q_constructive_suite(spark, sf):
    """Boundary length, minimum clearance, point-on-surface, minimum rotated
    rectangle, simplify — each with a closed-form value on rectangles."""
    r = _nation_rects(spark, sf)
    pos = st.st_point_on_surface("rect")
    return r.select(
        "n_nationkey",
        st.st_length(st.st_boundary("rect")).alias("boundary_len"),
        st.st_minimum_clearance("rect").alias("clearance"),
        st.st_x(pos).alias("pos_x"),
        st.st_y(pos).alias("pos_y"),
        st.st_area(st.st_minimum_rotated_rectangle("rect")).alias("mrr_area"),
        st.st_count_coordinates(st.st_simplify("rect", 0.1)).alias("simplified_n"),
    )


def q_ring_orientation(spark, sf):
    """Exterior-ring orientation + reversal + closure checks (booleans)."""
    r = _nation_rects(spark, sf)
    ring = st.st_exterior_ring("rect")
    return r.select(
        "n_nationkey",
        st.st_is_ccw(ring).alias("ccw"),
        st.st_is_ccw(st.st_reverse(ring)).alias("ccw_rev"),
        st.st_is_closed(ring).alias("closed"),
        st.st_is_ring(ring).alias("ring"),
        st.st_is_simple(ring).alias("simple"),
    )


def q_line_interpolate(spark, sf):
    """Diagonal line per rect: midpoint interpolation and projection."""
    r = _nation_rects(spark, sf)
    line = st.st_linestring(F.array(F.array("x0", "y0"), F.array("x1", "y1")))
    mid = st.st_interpolate(line, 0.5, normalized=True)
    ctr = st.st_centroid("rect")
    return r.select(
        "n_nationkey",
        st.st_x(mid).alias("mid_x"),
        st.st_y(mid).alias("mid_y"),
        st.st_project(line, ctr).alias("proj_to_center"),
        st.st_length(line).alias("diag_len"),
    )


def q_rotate180(spark, sf):
    """Rotating a rect 180° about its center preserves its bounds exactly."""
    r = _nation_rects(spark, sf).withColumn("rot", st.st_rotate("rect", 180.0))
    b = st.st_bounds("rot")
    return r.select(
        "n_nationkey",
        F.round(b[0], 9).alias("rx0"),
        F.round(b[1], 9).alias("ry0"),
        F.round(b[2], 9).alias("rx1"),
        F.round(b[3], 9).alias("ry1"),
    )


def q_hausdorff_translate(spark, sf):
    """Hausdorff/Fréchet between a rect ring and its (3,4)-translation = 5."""
    r = _nation_rects(spark, sf)
    ring = st.st_exterior_ring("rect")
    moved = st.st_translate(ring, 3.0, 4.0)
    return r.select(
        "n_nationkey",
        st.st_hausdorff_distance(ring, moved).alias("hausdorff"),
        st.st_frechet_distance(ring, moved).alias("frechet"),
    )


def q_equals_suite(spark, sf):
    """equals / equals_exact / equals_identical against a reversed copy."""
    r = _nation_rects(spark, sf)
    rev = st.st_reverse("rect")
    return r.select(
        "n_nationkey",
        st.st_equals("rect", rev).alias("topo_eq"),
        st.st_equals_exact("rect", rev).alias("exact_eq"),
        st.st_equals_identical("rect", "rect").alias("ident_eq"),
    )


def q_collect_count(spark, sf):
    """Customer points collected per nation: MultiPoint part count == group size."""
    c = spark.read.parquet(f"{sf}/customer.parquet")
    pts = c.select(
        "c_custkey", "c_nationkey",
        ((F.col("c_custkey") % 97) + 0.5).alias("x"),
        (((F.col("c_custkey") * 7) % 89) + 0.5).alias("y"),
    ).withColumn("pt", st.st_point("x", "y"))
    out = pts.groupBy("c_nationkey").agg(st.st_collect("pt").alias("mp"))
    return out.select(
        "c_nationkey",
        st.st_count_geometries("mp").alias("n_pts"),
        st.st_geometry_type("mp").alias("mp_type"),
    )


def q_contains_pairs(spark, sf):
    """Column-vs-column predicate between joined tables (no sjoin operator)."""
    pts = _cust_pts(spark, sf)
    rects = _nation_rects(spark, sf)
    pairs = pts.crossJoin(F.broadcast(rects.where(F.col("n_nationkey") < 3)))
    return pairs.select(
        "c_custkey", "n_nationkey",
        st.st_contains("rect", "pt").alias("contains"),
        st.st_intersects("rect", "pt").alias("intersects"),
        st.st_disjoint("rect", "pt").alias("disjoint"),
    )


# ---------------- text / pipeline ----------------

def q_token_count(spark, sf):
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return docs.select("doc_id", _t.token_count("text").alias("n_tokens"))


def q_lang_quality(spark, sf):
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    scores = _t.lang_scores("text")
    return docs.select(
        "doc_id",
        _t.lang_predict("text").alias("pred_lang"),
        scores["en"].alias("hits_en"),
        scores["es"].alias("hits_es"),
        _t.stopword_ratio("text", "en").alias("stop_ratio"),
        _t.quality_score("text").alias("quality"),
    )


def q_minhash(spark, sf):
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    sig = _t.minhash_signature("text", k=4, n=3)
    return docs.select(
        "doc_id",
        sig[0].alias("mh0"),
        sig[1].alias("mh1"),
        sig[2].alias("mh2"),
        sig[3].alias("mh3"),
    )


def q_fingerprint(spark, sf):
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return docs.select("doc_id", _t.doc_fingerprint("text").alias("fp"))


def q_simhash(spark, sf):
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return docs.select("doc_id", _t.simhash32("text").alias("simhash"))


def q_near_dup_pairs(spark, sf):
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    pairs = _dedup.near_dup_pairs(docs, k=16, bands=4, shingle_n=3, threshold=0.05)
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard_r"))


def q_exact_dup_groups(spark, sf):
    """Prefix-key duplicate groups (full texts are unique in the corpus)."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    key = F.substring(F.col("text"), 1, 20)
    return (
        docs.groupBy(key.alias("prefix"))
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("keep_id"))
        .where(F.col("n_dups") > 1)
    )


def q_knn_top3(spark, sf):
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 5)
    from pyspark.sql.window import Window

    q = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("_qv"))
    c = emb.select(F.col("vec_id").alias("corpus_id"), F.col("embedding").alias("_cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("corpus_id"))
        .withColumn("cos_r", F.round(_knn.cosine_similarity("_qv", "_cv"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_r").desc(), F.col("corpus_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("query_id", "corpus_id", "cos_r", "rank")
    )


def _read_events(spark: SparkSession, sf: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized reader
    rejects; read nanos as long and convert to a proper timestamp."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{sf}/events.parquet")
    if dict(ev.dtypes).get("ts") == "bigint":
        # integer DIV: double division loses µs precision at ~1.7e18 ns
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return ev


def q_events_hourly(spark, sf):
    ev = _read_events(spark, sf)
    return ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.count("*").alias("n_events"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def q_sessionize(spark, sf):
    """Gap-based sessionization (60-min gap) with exact integer-microsecond
    boundaries: per-session event count and duration."""
    from polars_st_spark.operators.sessions import session_stats

    ev = _read_events(spark, sf)
    out = session_stats(ev, gap_minutes=60.0)
    return out.select("user_id", "session_id", "n_events", "duration_us")


def q_events_type_stats(spark, sf):
    ev = _read_events(spark, sf)
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.count_distinct("user_id").alias("n_users"),
        F.max("value").alias("max_value"),
    )


def q_tpch_q1_lite(spark, sf):
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("count_order"),
        F.sum("l_quantity").alias("sum_qty"),
        F.max("l_extendedprice").alias("max_price"),
    )


# ---------------- rows-only checks (not SQL-expressible / transcendental) ----------------

def q_buffer_area(spark, sf):
    """Point buffers (n-gon area involves sin → rows-only check)."""
    return _cust_pts(spark, sf).select(
        "c_custkey",
        st.st_area(st.st_buffer("pt", 2.0, quad_segs=16)).alias("buf_area"),
    )


def q_to_srid_mercator(spark, sf):
    """4326→3857 reprojection (ln/tan → rows-only check)."""
    p = _cust_pts(spark, sf).withColumn("pt4326", st.st_set_srid("pt", 4326))
    merc = st.st_to_srid("pt4326", 3857)
    return p.select(
        "c_custkey",
        st.st_x(merc).alias("mx"),
        st.st_y(merc).alias("my"),
        st.st_srid(merc).alias("msrid"),
    )


def q_knn_lsh(spark, sf):
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 5)
    return _knn.cosine_topk_lsh(queries, emb, k=3, dim=64, n_planes=4)


def q_multimodal_features(spark, sf):
    """Binary payload plumbing: deterministic pseudo-decode features.

    Gate output is scalar-only (f0/f1/f2 floats) — the driver's pandas
    canonicalizer cannot hash array<float> cells; the array API stays in the
    library (`operators/multimodal.py image_features`).
    """
    docs = spark.read.parquet(f"{sf}/documents.parquet").limit(50)
    payloads = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    feats = image_features(payloads, "payload", "doc_id", decode="fake", resize=(4, 4))
    return feats.select(
        "doc_id",
        "height",
        "width",
        "channels",
        F.round(F.col("features")[0], 5).alias("f0"),
        F.round(F.col("features")[1], 5).alias("f1"),
        F.round(F.col("features")[2], 5).alias("f2"),
    )


# ----------------------------------------------------------------------
# Contract functions
# ----------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001: supplier rects per nation → intersection_all →
    area + WKT (the reference README's flagship composition)."""
    _ensure_workers(spark)
    out = (
        _supp_rects(spark, SF_DEFAULT)
        .groupBy("s_nationkey")
        .agg(st.st_intersection_all("rect").alias("geom"))
        .select(
            "s_nationkey",
            st.st_area("geom").alias("area"),
            st.st_to_wkt("geom").alias("wkt"),
        )
    )
    return out


def _wrap(fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_workers(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: _wrap(v) for k, v in _QUERIES.items()}


_QUERIES = {
        "point_xy": q_point_xy,
        "rect_area_perimeter": q_rect_area_perimeter,
        "rect_bounds": q_rect_bounds,
        "rect_centroid": q_rect_centroid,
        "point_distance": q_point_distance,
        "points_in_rects_broadcast": q_points_in_rects_broadcast,
        "points_in_rects_grid": q_points_in_rects_grid,
        "rect_intersection_area": q_rect_intersection_area,
        "rect_difference_area": q_rect_difference_area,
        "rect_symdiff_area": q_rect_symdiff_area,
        "clip_by_rect_area": q_clip_by_rect_area,
        "union_flagship": q_union_flagship,
        "intersection_all": q_intersection_all,
        "triangulate": q_triangulate,
        "convex_hull": q_convex_hull,
        "affine": q_affine,
        "wkt_roundtrip": q_wkt_roundtrip,
        "total_bounds": q_total_bounds,
        "dwithin": q_dwithin,
        "geometry_meta": q_geometry_meta,
        "envelope_center": q_envelope_center,
        "constructive_suite": q_constructive_suite,
        "ring_orientation": q_ring_orientation,
        "line_interpolate": q_line_interpolate,
        "rotate180": q_rotate180,
        "hausdorff_translate": q_hausdorff_translate,
        "equals_suite": q_equals_suite,
        "collect_count": q_collect_count,
        "contains_pairs": q_contains_pairs,
        "token_count": q_token_count,
        "lang_quality": q_lang_quality,
        "minhash": q_minhash,
        "fingerprint": q_fingerprint,
        "simhash": q_simhash,
        "near_dup_pairs": q_near_dup_pairs,
        "exact_dup_groups": q_exact_dup_groups,
        "knn_top3": q_knn_top3,
        "events_hourly": q_events_hourly,
        "events_type_stats": q_events_type_stats,
        "sessionize": q_sessionize,
        "tpch_q1_lite": q_tpch_q1_lite,
        # rows-only (no oracle entry): transcendental or non-SQL-expressible
        "buffer_area": q_buffer_area,
        "to_srid_mercator": q_to_srid_mercator,
        "knn_lsh": q_knn_lsh,
        "multimodal_features": q_multimodal_features,
    }


def oracle_sql() -> dict[str, str]:
    win_x0, win_y0, win_x1, win_y1 = _WINDOW
    inter = (
        "GREATEST(0.0, LEAST(x1, {wx1}) - GREATEST(x0, {wx0})) * "
        "GREATEST(0.0, LEAST(y1, {wy1}) - GREATEST(y0, {wy0}))"
    ).format(wx0=win_x0, wy0=win_y0, wx1=win_x1, wy1=win_y1)
    return {
        "point_xy": f"SELECT c_custkey, x AS px, y AS py FROM ({_ORACLE_CUST})",
        "rect_area_perimeter": f"""
            SELECT n_nationkey,
                   (x1-x0)*(y1-y0) AS area,
                   2*((x1-x0)+(y1-y0)) AS perimeter
            FROM ({_ORACLE_NATION})""",
        "rect_bounds": f"""
            SELECT n_nationkey, x0 AS bxmin, y0 AS bymin, x1 AS bxmax, y1 AS bymax
            FROM ({_ORACLE_NATION})""",
        "rect_centroid": f"""
            SELECT n_nationkey, (x0+x1)/2 AS cx, (y0+y1)/2 AS cy
            FROM ({_ORACLE_NATION})""",
        "point_distance": f"""
            SELECT c_custkey, sqrt((x-50.0)*(x-50.0) + (y-45.0)*(y-45.0)) AS dist
            FROM ({_ORACLE_CUST})""",
        "points_in_rects_broadcast": f"""
            SELECT c.c_custkey, n.n_nationkey
            FROM ({_ORACLE_CUST}) c JOIN ({_ORACLE_NATION}) n
              ON c.x > n.x0 AND c.x < n.x1 AND c.y > n.y0 AND c.y < n.y1""",
        "points_in_rects_grid": f"""
            SELECT c.c_custkey, n.n_nationkey
            FROM ({_ORACLE_CUST}) c JOIN ({_ORACLE_NATION}) n
              ON c.x > n.x0 AND c.x < n.x1 AND c.y > n.y0 AND c.y < n.y1""",
        "rect_intersection_area": f"""
            SELECT n_nationkey, {inter} AS iarea FROM ({_ORACLE_NATION})""",
        "rect_difference_area": f"""
            SELECT n_nationkey, (x1-x0)*(y1-y0) - {inter} AS darea
            FROM ({_ORACLE_NATION})""",
        "rect_symdiff_area": f"""
            SELECT n_nationkey,
                   (x1-x0)*(y1-y0) + ({win_x1}-{win_x0})*({win_y1}-{win_y0}) - 2*{inter} AS sarea
            FROM ({_ORACLE_NATION})""",
        "clip_by_rect_area": f"""
            SELECT n_nationkey, {inter} AS carea FROM ({_ORACLE_NATION})""",
        "union_flagship": f"""
            SELECT l_suppkey, COUNT(*) * 16.0 AS union_area
            FROM (SELECT DISTINCT l_suppkey, ((l_linenumber - 1) % 7) AS slot
                  FROM lineitem)
            GROUP BY l_suppkey""",
        "intersection_all": f"""
            SELECT s_nationkey,
                   GREATEST(0.0, MIN(x1) - MAX(x0)) * GREATEST(0.0, MIN(y1) - MAX(y0)) AS iarea
            FROM ({_ORACLE_SUPP})
            GROUP BY s_nationkey""",
        "triangulate": f"""
            SELECT n_nationkey, (x1-x0)*(y1-y0) AS tri_area, 4 AS n_cells
            FROM ({_ORACLE_NATION})""",
        "convex_hull": f"""
            SELECT n_nationkey, (x1-x0)*(y1-y0) AS hull_area FROM ({_ORACLE_NATION})""",
        "affine": f"""
            SELECT c_custkey,
                   x + 10.0 AS tx, y - 5.0 AS ty,
                   x * 2.0 AS sx, y * 3.0 AS sy
            FROM ({_ORACLE_CUST})""",
        "wkt_roundtrip": f"""
            SELECT n_nationkey,
                   'POLYGON ((' ||
                   CAST(x0 AS INT) || ' ' || CAST(y0 AS INT) || ', ' ||
                   CAST(x1 AS INT) || ' ' || CAST(y0 AS INT) || ', ' ||
                   CAST(x1 AS INT) || ' ' || CAST(y1 AS INT) || ', ' ||
                   CAST(x0 AS INT) || ' ' || CAST(y1 AS INT) || ', ' ||
                   CAST(x0 AS INT) || ' ' || CAST(y0 AS INT) || '))' AS wkt
            FROM ({_ORACLE_NATION})""",
        "total_bounds": f"""
            SELECT MIN(x) AS xmin, MIN(y) AS ymin, MAX(x) AS xmax, MAX(y) AS ymax
            FROM ({_ORACLE_CUST})""",
        "dwithin": f"""
            SELECT c_custkey,
                   sqrt((x-50.0)*(x-50.0) + (y-45.0)*(y-45.0)) < 20.0 AS near
            FROM ({_ORACLE_CUST})""",
        "geometry_meta": """
            SELECT c_custkey, 'Point' AS gtype, 4326 AS srid,
                   FALSE AS empty, 0 AS dims, 1 AS ncoords
            FROM customer""",
        "envelope_center": f"""
            SELECT l_orderkey, l_linenumber,
                   (x1-x0)*(y1-y0) AS env_area,
                   (x0+x1)/2 AS ctr_x, (y0+y1)/2 AS ctr_y
            FROM ({_ORACLE_LI})""",
        "constructive_suite": f"""
            SELECT n_nationkey,
                   2*((x1-x0)+(y1-y0)) AS boundary_len,
                   LEAST(x1-x0, y1-y0) AS clearance,
                   (x0+x1)/2 AS pos_x, (y0+y1)/2 AS pos_y,
                   (x1-x0)*(y1-y0) AS mrr_area,
                   5 AS simplified_n
            FROM ({_ORACLE_NATION})""",
        "ring_orientation": """
            SELECT n_nationkey, TRUE AS ccw, FALSE AS ccw_rev,
                   TRUE AS closed, TRUE AS ring, TRUE AS simple
            FROM nation""",
        "line_interpolate": f"""
            SELECT n_nationkey,
                   (x0+x1)/2 AS mid_x, (y0+y1)/2 AS mid_y,
                   sqrt((x1-x0)*(x1-x0) + (y1-y0)*(y1-y0))/2 AS proj_to_center,
                   sqrt((x1-x0)*(x1-x0) + (y1-y0)*(y1-y0)) AS diag_len
            FROM ({_ORACLE_NATION})""",
        "rotate180": f"""
            SELECT n_nationkey,
                   ROUND(x0, 9) AS rx0, ROUND(y0, 9) AS ry0,
                   ROUND(x1, 9) AS rx1, ROUND(y1, 9) AS ry1
            FROM ({_ORACLE_NATION})""",
        "hausdorff_translate": """
            SELECT n_nationkey, 5.0 AS hausdorff, 5.0 AS frechet FROM nation""",
        "equals_suite": """
            SELECT n_nationkey, TRUE AS topo_eq, FALSE AS exact_eq, TRUE AS ident_eq
            FROM nation""",
        "collect_count": """
            SELECT c_nationkey, COUNT(*) AS n_pts,
                   CASE WHEN COUNT(*) >= 1 THEN 'MultiPoint' END AS mp_type
            FROM customer GROUP BY 1""",
        "contains_pairs": f"""
            SELECT c.c_custkey, n.n_nationkey,
                   (c.x > n.x0 AND c.x < n.x1 AND c.y > n.y0 AND c.y < n.y1) AS contains,
                   (c.x >= n.x0 AND c.x <= n.x1 AND c.y >= n.y0 AND c.y <= n.y1) AS intersects,
                   NOT (c.x >= n.x0 AND c.x <= n.x1 AND c.y >= n.y0 AND c.y <= n.y1) AS disjoint
            FROM ({_ORACLE_CUST}) c CROSS JOIN ({_ORACLE_NATION}) n
            WHERE n.n_nationkey < 3""",
        "token_count": f"""
            SELECT doc_id, len({_ORACLE_TOKENS}) AS n_tokens FROM documents""",
        "lang_quality": _oracle_lang_quality(),
        "minhash": _oracle_minhash(),
        "fingerprint": f"""
            SELECT doc_id,
                   list_min(list_transform(
                     {_oracle_shingles()},
                     s -> ('0x' || substr(md5('0:' || s), 1, 8))::BIGINT)) AS fp
            FROM documents""",
        "simhash": _oracle_simhash(),
        "near_dup_pairs": _oracle_near_dup(),
        "exact_dup_groups": """
            SELECT substr(text, 1, 20) AS prefix, COUNT(*) AS n_dups, MIN(doc_id) AS keep_id
            FROM documents GROUP BY 1 HAVING COUNT(*) > 1""",
        "knn_top3": _oracle_knn(),
        "events_hourly": """
            SELECT user_id, date_trunc('hour', ts) AS hour,
                   COUNT(*) AS n_events, MIN(value) AS min_value, MAX(value) AS max_value
            FROM events GROUP BY 1, 2""",
        "sessionize": """
            WITH us AS (
              SELECT user_id, epoch_ns(ts) // 1000 AS t FROM events
            ), lagged AS (
              SELECT user_id, t,
                     CASE WHEN LAG(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
                               OR t - LAG(t) OVER (PARTITION BY user_id ORDER BY t) > 3600000000
                          THEN 1 ELSE 0 END AS new_s
              FROM us
            ), sess AS (
              SELECT user_id, t,
                     -- CAST: DuckDB windowed SUM yields HUGEINT, which turns into
                     -- float64 through pandas and poisons the driver's value hash.
                     CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY t
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT) - 1 AS session_id
              FROM lagged
            )
            SELECT user_id, session_id, COUNT(*) AS n_events,
                   MAX(t) - MIN(t) AS duration_us
            FROM sess GROUP BY 1, 2""",
        "events_type_stats": """
            SELECT event_type, COUNT(*) AS n,
                   COUNT(DISTINCT user_id) AS n_users, MAX(value) AS max_value
            FROM events GROUP BY 1""",
        "tpch_q1_lite": """
            SELECT l_returnflag, l_linestatus, COUNT(*) AS count_order,
                   SUM(l_quantity) AS sum_qty, MAX(l_extendedprice) AS max_price
            FROM lineitem GROUP BY 1, 2""",
    }


def _oracle_shingles(n: int = 3) -> str:
    t = _ORACLE_TOKENS
    return (
        f"CASE WHEN len({t}) >= {n} THEN "
        f"list_transform(range(1, len({t}) - {n - 2}), i -> array_to_string(({t})[i:i+{n - 1}], ' ')) "
        f"ELSE [array_to_string({t}, ' ')] END"
    )


def _oracle_minhash() -> str:
    sh = _oracle_shingles()
    cols = ", ".join(
        f"list_min(list_transform({sh}, s -> ('0x' || substr(md5('{i}:' || s), 1, 8))::BIGINT)) AS mh{i}"
        for i in range(4)
    )
    return f"SELECT doc_id, {cols} FROM documents"


def _oracle_lang_quality() -> str:
    t = _ORACLE_TOKENS
    hits = {
        lang: f"len(list_filter({t}, x -> list_contains({words!r}, x)))"
        for lang, words in _t.STOPWORDS.items()
    }
    # argmax with alphabetical tie-break == Spark struct-max on (score, -rank)
    langs = sorted(_t.STOPWORDS)
    score_struct = ", ".join(f"({hits[l]}, {-i}, '{l}')" for i, l in enumerate(langs))
    stop_ratio = f"CASE WHEN len({t}) > 0 THEN {hits['en']} / CAST(len({t}) AS DOUBLE) ELSE 0.0 END"
    punct = (
        "CASE WHEN length(text) > 0 THEN "
        "length(regexp_replace(text, '[^.,;:!?''\"()-]', '', 'g')) / CAST(length(text) AS DOUBLE) "
        "ELSE 0.0 END"
    )
    len_score = (
        "CASE WHEN length(text) >= 50 AND length(text) <= 10000 THEN 1.0 "
        "WHEN length(text) < 50 THEN length(text) / 50.0 ELSE 0.5 END"
    )
    quality = (
        f"GREATEST(LEAST(({len_score}) * 0.5 + LEAST(({stop_ratio}) * 5.0, 1.0) * 0.5 "
        f"- LEAST(({punct}) * 2.0, 0.5), 1.0), 0.0)"
    )
    best = f"list_max([{score_struct}])"
    return f"""
        SELECT doc_id,
               CASE WHEN ({best})[1] > 0 THEN ({best})[3] ELSE 'und' END AS pred_lang,
               {hits['en']} AS hits_en,
               {hits['es']} AS hits_es,
               {stop_ratio} AS stop_ratio,
               {quality} AS quality
        FROM documents"""


def _oracle_simhash() -> str:
    t = _ORACLE_TOKENS
    th = f"list_transform({t}, s -> ('0x' || substr(md5('0:' || s), 1, 8))::BIGINT)"
    votes = " + ".join(
        f"(CASE WHEN list_sum(list_transform({th}, h -> CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END)) > 0 "
        f"THEN {2 ** i}::BIGINT ELSE 0::BIGINT END)"
        for i in range(32)
    )
    return f"SELECT doc_id, {votes} AS simhash FROM documents"


def _oracle_near_dup() -> str:
    sh = _oracle_shingles()
    sig = ", ".join(
        f"list_min(list_transform(sh, s -> ('0x' || substr(md5('{i}:' || s), 1, 8))::BIGINT)) AS mh{i}"
        for i in range(16)
    )
    bands = ", ".join(
        "md5(" + " || ',' || ".join(f"CAST(mh{b * 4 + r} AS VARCHAR)" for r in range(4)) + f") AS band{b}"
        for b in range(4)
    )
    return f"""
        WITH sigs AS (
          SELECT doc_id, sh, {sig}
          FROM (SELECT doc_id, {sh} AS sh FROM documents)
        ),
        banded AS (SELECT doc_id, sh, {bands} FROM sigs),
        cands AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                 a.sh AS sha, b.sh AS shb
          FROM banded a JOIN banded b ON a.doc_id < b.doc_id
           AND (a.band0 = b.band0 OR a.band1 = b.band1 OR a.band2 = b.band2 OR a.band3 = b.band3)
        ),
        jac AS (
          SELECT id_a, id_b,
                 CASE WHEN len(list_distinct(list_concat(sha, shb))) > 0
                      THEN len(list_intersect(list_distinct(sha), list_distinct(shb)))
                           / CAST(len(list_distinct(list_concat(sha, shb))) AS DOUBLE)
                      ELSE 0.0 END AS jaccard
          FROM cands
        )
        SELECT id_a, id_b, ROUND(jaccard, 6) AS jaccard_r
        FROM jac WHERE jaccard >= 0.05"""


def _oracle_knn() -> str:
    return """
        WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
        c AS (SELECT vec_id AS corpus_id, embedding::DOUBLE[] AS cv FROM embeddings),
        scored AS (
          SELECT q.query_id, c.corpus_id,
                 ROUND(
                   CASE WHEN sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)) > 0
                        THEN list_dot_product(qv, cv) /
                             (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
                        ELSE 0.0 END, 6) AS cos_r
          FROM c CROSS JOIN q WHERE q.query_id != c.corpus_id
        )
        SELECT query_id, corpus_id, cos_r, rank FROM (
          SELECT query_id, corpus_id, cos_r,
                 ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_r DESC, corpus_id ASC) AS rank
          FROM scored
        ) WHERE rank <= 3"""
