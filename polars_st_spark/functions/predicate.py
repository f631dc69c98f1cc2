"""Binary spatial predicates (reference: §2.3, functions.rs:935-1094).

Each returns a BooleanType Column. The ``other`` side may be a Column or a
constant geometry (bytes/WKT/Geometry) — constants are decoded once and
broadcast via closure, mirroring the reference's scalar broadcasting
(reference: src/arity.rs:63-85).
"""

from __future__ import annotations

from pyspark.sql import Column

from polars_st_spark.functions.factory import binary_scalar, col_or_lit, geom_arg
from polars_st_spark.geo import predicates as P

__all__ = [
    "st_intersects", "st_disjoint", "st_within", "st_contains",
    "st_contains_properly", "st_covers", "st_covered_by", "st_crosses",
    "st_touches", "st_overlaps", "st_equals", "st_equals_exact",
    "st_equals_identical", "st_relate", "st_relate_pattern", "st_dwithin",
    "st_intersects_xy", "st_contains_xy",
]


def _mk(fn, ret="boolean"):
    def outer(col, other) -> Column:
        udf, oc = binary_scalar(fn, ret, geom_arg(other))
        return udf(col_or_lit(col)) if oc is None else udf(col_or_lit(col), oc)

    return outer


st_intersects = _mk(P.intersects)
st_disjoint = _mk(P.disjoint)
st_within = _mk(P.within)
st_contains = _mk(P.contains)
st_contains_properly = _mk(P.contains_properly)
st_covers = _mk(P.covers)
st_covered_by = _mk(P.covered_by)
st_crosses = _mk(P.crosses)
st_touches = _mk(P.touches)
st_overlaps = _mk(P.overlaps)
st_equals = _mk(P.equals)
st_equals_identical = _mk(P.equals_identical)
st_relate = _mk(P.relate, ret="string")


def st_equals_exact(col, other, tolerance: float = 0.0) -> Column:
    udf, oc = binary_scalar(
        lambda a, b: P.equals_exact(a, b, tolerance), "boolean", geom_arg(other)
    )
    return udf(col_or_lit(col)) if oc is None else udf(col_or_lit(col), oc)


def st_relate_pattern(col, other, pattern: str) -> Column:
    udf, oc = binary_scalar(
        lambda a, b: P.relate_pattern(a, b, pattern), "boolean", geom_arg(other)
    )
    return udf(col_or_lit(col)) if oc is None else udf(col_or_lit(col), oc)


def st_dwithin(col, other, distance: float) -> Column:
    """distance(a,b) < d, strict (reference: functions.rs:984-990)."""
    udf, oc = binary_scalar(
        lambda a, b: P.dwithin(a, b, distance), "boolean", geom_arg(other)
    )
    return udf(col_or_lit(col)) if oc is None else udf(col_or_lit(col), oc)


def st_intersects_xy(col, x: float, y: float) -> Column:
    """(reference: functions.rs:1072-1082)"""
    from polars_st_spark.functions.factory import unary_scalar

    return unary_scalar(lambda g: P.intersects_xy(g, x, y), "boolean")(col_or_lit(col))


def st_contains_xy(col, x: float, y: float) -> Column:
    """(reference: functions.rs:1084-1094)"""
    from polars_st_spark.functions.factory import unary_scalar

    return unary_scalar(lambda g: P.contains_xy(g, x, y), "boolean")(col_or_lit(col))
