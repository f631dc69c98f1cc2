"""Robustness matrix: every elementwise op × the 22-fixture geometry matrix
× null rows (reference test strategy: tests/test_expressions.py:19-71,
227-243 — empty/null passthrough and declared-dtype checks).

Ops may raise only documented error classes (NotImplementedError for the
overlay/buffer/curve gaps, ValueError for invalid casts); anything else is a
regression.
"""

import pytest
from pyspark.sql import functions as F

import polars_st_spark as st
from tests.test_geo_core import FIXTURES

UNARY_GEOM_OPS = {
    "centroid": lambda c: st.st_centroid(c),
    "center": lambda c: st.st_center(c),
    "point_on_surface": lambda c: st.st_point_on_surface(c),
    "convex_hull": lambda c: st.st_convex_hull(c),
    "envelope": lambda c: st.st_envelope(c),
    "boundary": lambda c: st.st_boundary(c),
    "reverse": lambda c: st.st_reverse(c),
    "flip": lambda c: st.st_flip_coordinates(c),
    "force_2d": lambda c: st.st_force_2d(c),
    "force_3d": lambda c: st.st_force_3d(c, 1.0),
    "normalize": lambda c: st.st_normalize(c),
    "multi": lambda c: st.st_multi(c),
    "simplify": lambda c: st.st_simplify(c, 0.1),
    "segmentize": lambda c: st.st_segmentize(c, 0.5),
    "remove_repeated": lambda c: st.st_remove_repeated_points(c, 0.0),
    "translate": lambda c: st.st_translate(c, 1, 1),
    "rotate": lambda c: st.st_rotate(c, 45),
    "scale": lambda c: st.st_scale(c, 2, 2),
    "skew": lambda c: st.st_skew(c, 10, 0),
    "unique_points": lambda c: st.st_extract_unique_points(c),
    "mrr": lambda c: st.st_minimum_rotated_rectangle(c),
    "unary_union": lambda c: st.st_unary_union(c),
    "clip": lambda c: st.st_clip_by_rect(c, 0, 0, 1, 1),
    "set_srid": lambda c: st.st_set_srid(c, 4326),
    "set_precision": lambda c: st.st_set_precision(c, 0.5),
}

UNARY_SCALAR_OPS = {
    "area": lambda c: st.st_area(c),
    "length": lambda c: st.st_length(c),
    "bounds": lambda c: st.st_bounds(c),
    "is_empty": lambda c: st.st_is_empty(c),
    "is_valid": lambda c: st.st_is_valid(c),
    "is_simple": lambda c: st.st_is_simple(c),
    "is_closed": lambda c: st.st_is_closed(c),
    "is_ring": lambda c: st.st_is_ring(c),
    "is_ccw": lambda c: st.st_is_ccw(c),
    "geometry_type": lambda c: st.st_geometry_type(c),
    "srid": lambda c: st.st_srid(c),
    "dims": lambda c: st.st_dimensions(c),
    "coord_dim": lambda c: st.st_coordinate_dimension(c),
    "x": lambda c: st.st_x(c),
    "y": lambda c: st.st_y(c),
    "z": lambda c: st.st_z(c),
    "m": lambda c: st.st_m(c),
    "n_coords": lambda c: st.st_count_coordinates(c),
    "n_geoms": lambda c: st.st_count_geometries(c),
    "n_points": lambda c: st.st_count_points(c),
    "n_rings": lambda c: st.st_count_interior_rings(c),
    "wkt": lambda c: st.st_to_wkt(c),
    "ewkt": lambda c: st.st_to_ewkt(c),
    "wkb": lambda c: st.st_to_wkb(c),
    "geojson": lambda c: st.st_to_geojson(c),
    "valid_reason": lambda c: st.st_is_valid_reason(c),
    "min_clearance": lambda c: st.st_minimum_clearance(c),
    "coordinates": lambda c: st.st_coordinates(c),
    "parts": lambda c: st.st_parts(c),
    "exterior_ring": lambda c: st.st_exterior_ring(c),
    "interior_rings": lambda c: st.st_interior_rings(c),
    "precision": lambda c: st.st_precision(c),
}

BINARY_OPS = {
    "intersects": lambda c: st.st_intersects(c, "POINT (1 2)"),
    "contains": lambda c: st.st_contains(c, "POINT (1 2)"),
    "within": lambda c: st.st_within(c, "POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0))"),
    "touches": lambda c: st.st_touches(c, "LINESTRING (0 0, 1 1)"),
    "distance": lambda c: st.st_distance(c, "POINT (1 2)"),
    "dwithin": lambda c: st.st_dwithin(c, "POINT (1 2)", 5.0),
    "relate": lambda c: st.st_relate(c, "POINT (1 2)"),
    "equals": lambda c: st.st_equals(c, "POINT (1 2)"),
    "hausdorff": lambda c: st.st_hausdorff_distance(c, "LINESTRING (0 0, 1 1)"),
    "snap": lambda c: st.st_snap(c, "POINT (1 2)", 0.5),
    "shortest_line": lambda c: st.st_shortest_line(c, "POINT (9 9)"),
}

ALLOWED_ERRORS = ("NotImplementedError", "ValueError")


@pytest.fixture(scope="module")
def matrix_df(spark):
    rows = [(i, w) for i, w in enumerate(FIXTURES)] + [(len(FIXTURES), None)]
    return (
        spark.createDataFrame(rows, ["id", "wkt"])
        .withColumn("geom", st.st_from_wkt("wkt"))
        .cache()
    )


def _run_matrix(df, ops):
    failures = []
    for name, make in ops.items():
        try:
            out = df.select("id", make("geom").alias("out")).collect()
            nulls = {r["id"] for r in out if r["out"] is None}
            assert len(FIXTURES) in nulls, f"{name}: null input did not produce null output"
        except Exception as e:
            msg = str(e)
            if not any(a in msg for a in ALLOWED_ERRORS):
                failures.append((name, msg.splitlines()[0][:160]))
    assert not failures, failures


def test_unary_geom_matrix(matrix_df):
    _run_matrix(matrix_df, UNARY_GEOM_OPS)


def test_unary_scalar_matrix(matrix_df):
    _run_matrix(matrix_df, UNARY_SCALAR_OPS)


def test_binary_matrix(matrix_df):
    _run_matrix(matrix_df, BINARY_OPS)


def test_agg_identities_in_groupby(spark, matrix_df):
    """Aggregations inside groupBy over the fixture matrix must not crash and
    must produce the GEOMETRYCOLLECTION EMPTY identity for the null group
    (reference: test_expressions.py:293-307)."""
    df = matrix_df.withColumn("grp", (F.col("id") % 3).cast("int"))
    out = df.groupBy("grp").agg(st.st_collect("geom").alias("c"), st.st_total_bounds(st.st_bounds("geom"))[0])
    assert out.count() == 3
    null_only = matrix_df.where(F.col("wkt").isNull()).groupBy().agg(
        st.st_union_all("geom").alias("u")
    )
    assert null_only.select(st.st_to_wkt("u")).first()[0] == "GEOMETRYCOLLECTION EMPTY"