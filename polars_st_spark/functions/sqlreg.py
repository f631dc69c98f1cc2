"""Spark SQL function registration: ``register_sql_functions(spark)``
installs the engine's ST_* kernels as SQL functions so plain
``spark.sql("SELECT st_area(geom) FROM t")`` works — the Spark-idiomatic
SQL surface over the same Arrow-batched vectorized UDFs the Column API
uses (NOT row-at-a-time re-implementations: the registered objects are the
exact module-level UDF instances, fast paths included).

Coverage: measures (area/length), accessors (x/y/srid/geometry_type), the
twelve binary predicates (two-geometry-column form), validity/emptiness,
and WKT in/out with the API defaults. Functions whose parameters shape the
expression tree (buffer styles, simplify tolerance modes, to_srid target)
stay Column-API-only — their parameters are Python-side plan inputs, not
per-row columns.
"""

from __future__ import annotations

__all__ = ["register_sql_functions", "SQL_FUNCTIONS"]


def _convenience_udfs():
    """Factory-built single-column UDFs mirroring the public defaults."""
    from polars_st_spark.functions.construct import _parser_udf
    from polars_st_spark.functions.factory import unary_scalar
    from polars_st_spark.geo import algos
    from polars_st_spark.geo import wkt as _wkt

    return {
        "st_is_valid": unary_scalar(algos.is_valid, "boolean"),
        "st_is_empty": unary_scalar(lambda g: g.is_empty(), "boolean"),
        "st_to_wkt": unary_scalar(
            lambda g: _wkt.to_wkt(g, 6, True, 3, False), "string"),
        "st_from_wkt": _parser_udf(_wkt.from_wkt, 0),
    }


def _registry():
    from polars_st_spark.functions import predicate as P
    from polars_st_spark.functions import scalar as S

    reg = {
        "st_area": S._area_udf,
        "st_length": S._length_udf,
        "st_x": S._x_udf,
        "st_y": S._y_udf,
        "st_srid": S._srid_udf,
        "st_geometry_type": S._geometry_type_udf,
        "st_distance": S._distance_pair_udf,
    }
    for name in (
        "intersects", "disjoint", "within", "contains", "contains_properly",
        "covers", "covered_by", "crosses", "touches", "overlaps",
        "equals", "equals_identical",
    ):
        reg[f"st_{name}"] = getattr(P, f"st_{name}")._sql_udf
    reg.update(_convenience_udfs())
    return reg


SQL_FUNCTIONS = tuple(sorted((
    "st_area", "st_length", "st_x", "st_y", "st_srid", "st_geometry_type",
    "st_distance",
    "st_intersects", "st_disjoint", "st_within", "st_contains",
    "st_contains_properly", "st_covers", "st_covered_by", "st_crosses",
    "st_touches", "st_overlaps", "st_equals", "st_equals_identical",
    "st_is_valid", "st_is_empty", "st_to_wkt", "st_from_wkt",
)))


def register_sql_functions(spark) -> list[str]:
    """Register the ST_* SQL functions on ``spark``; returns the installed
    names. Idempotent (re-registering replaces)."""
    reg = _registry()
    for name, udf in reg.items():
        spark.udf.register(name, udf)
    return sorted(reg)
