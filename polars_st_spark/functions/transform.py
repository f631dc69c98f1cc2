"""Constructive / editing operations and elementwise set ops.

Reference sections: §2.5 constructive (functions.rs:1278-1698), §2.6 CRS,
binary set ops (functions.rs:1096-1192), cast/multi (functions.rs:61-177,
771-792).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

from polars_st_spark.functions.factory import (
    binary_geom,
    col_or_lit,
    geom_arg,
    unary_geom,
)
from polars_st_spark.geo import algos, setops
from polars_st_spark.geo.types import Geometry, GeometryType
from polars_st_spark.geo.wkb import from_ewkb, to_ewkb

__all__ = [
    "st_centroid", "st_center", "st_point_on_surface", "st_convex_hull",
    "st_envelope", "st_boundary", "st_simplify", "st_segmentize",
    "st_remove_repeated_points", "st_reverse", "st_flip_coordinates",
    "st_force_2d", "st_force_3d", "st_affine_transform", "st_translate",
    "st_rotate", "st_scale", "st_skew", "st_buffer", "st_offset_curve",
    "st_clip_by_rect", "st_snap", "st_shortest_line", "st_line_merge",
    "st_interpolate", "st_extract_unique_points",
    "st_minimum_rotated_rectangle", "st_make_valid", "st_normalize",
    "st_multi", "st_union", "st_intersection", "st_difference",
    "st_symmetric_difference", "st_unary_union", "st_set_srid", "st_to_srid",
]


def _u(fn):
    def outer(col) -> Column:
        return unary_geom(fn)(col_or_lit(col))

    return outer


st_centroid = _u(algos.centroid)
st_center = _u(algos.center)
st_point_on_surface = _u(algos.point_on_surface)
st_convex_hull = _u(algos.convex_hull)
st_envelope = _u(algos.envelope)
st_boundary = _u(algos.boundary)
st_flip_coordinates = _u(algos.flip_coordinates)
st_force_2d = _u(algos.force_2d)
st_reverse = _u(algos.reverse_geom)
st_extract_unique_points = _u(algos.extract_unique_points)
st_minimum_rotated_rectangle = _u(algos.minimum_rotated_rectangle)
st_make_valid = _u(algos.make_valid)
st_normalize = _u(algos.normalize_geom)
st_multi = _u(algos.multi)


def st_simplify(col, tolerance: float, preserve_topology: bool = True) -> Column:
    return unary_geom(lambda g: algos.simplify(g, tolerance, preserve_topology))(col_or_lit(col))


def st_segmentize(col, max_segment_length: float) -> Column:
    return unary_geom(lambda g: algos.segmentize(g, max_segment_length))(col_or_lit(col))


def st_remove_repeated_points(col, tolerance: float = 0.0) -> Column:
    return unary_geom(lambda g: algos.remove_repeated_points(g, tolerance))(col_or_lit(col))


def st_force_3d(col, z: float = 0.0) -> Column:
    return unary_geom(lambda g: algos.force_3d(g, z))(col_or_lit(col))


def st_affine_transform(col, matrix) -> Column:
    return unary_geom(lambda g: algos.affine_transform(g, matrix))(col_or_lit(col))


def st_translate(col, x: float = 0.0, y: float = 0.0, z: float = 0.0) -> Column:
    return unary_geom(lambda g: algos.translate(g, x, y, z))(col_or_lit(col))


def st_rotate(col, angle: float, origin="center") -> Column:
    """Angle in degrees (reference: functions.rs:1508-1548)."""
    return unary_geom(lambda g: algos.rotate(g, angle, origin))(col_or_lit(col))


def st_scale(col, x: float = 1.0, y: float = 1.0, z: float = 1.0, origin="center") -> Column:
    return unary_geom(lambda g: algos.scale(g, x, y, z, origin))(col_or_lit(col))


def st_skew(col, x: float = 0.0, y: float = 0.0, origin="center") -> Column:
    return unary_geom(lambda g: algos.skew(g, x, y, origin))(col_or_lit(col))


def st_buffer(col, distance: float, quad_segs: int = 8, cap_style: str = "round",
              join_style: str = "round", mitre_limit: float = 5.0,
              single_sided: bool = False) -> Column:
    return unary_geom(
        lambda g: algos.buffer(g, distance, quad_segs, cap_style, join_style, mitre_limit, single_sided)
    )(col_or_lit(col))


def st_offset_curve(col, distance: float, quad_segs: int = 8,
                    join_style: str = "round", mitre_limit: float = 5.0) -> Column:
    return unary_geom(lambda g: algos.offset_curve(g, distance, quad_segs, join_style, mitre_limit))(col_or_lit(col))


def st_clip_by_rect(col, xmin: float, ymin: float, xmax: float, ymax: float) -> Column:
    return unary_geom(lambda g: setops.clip_by_rect(g, xmin, ymin, xmax, ymax))(col_or_lit(col))


def st_snap(col, other, tolerance: float) -> Column:
    udf, oc = binary_geom(lambda a, b: algos.snap(a, b, tolerance), geom_arg(other))
    return udf(col_or_lit(col)) if oc is None else udf(col_or_lit(col), oc)


def st_shortest_line(col, other) -> Column:
    udf, oc = binary_geom(algos.shortest_line, geom_arg(other))
    return udf(col_or_lit(col)) if oc is None else udf(col_or_lit(col), oc)


def st_line_merge(col, directed: bool = False) -> Column:
    return unary_geom(lambda g: algos.line_merge(g, directed))(col_or_lit(col))


def st_interpolate(col, distance: float, normalized: bool = False) -> Column:
    return unary_geom(lambda g: algos.line_interpolate_point(g, distance, normalized))(col_or_lit(col))


# ----------------------------------------------------------------------
# Elementwise binary set ops (reference: functions.rs:1096-1192)
# ----------------------------------------------------------------------

def _b(fn):
    def outer(col, other, grid_size: float | None = None) -> Column:
        udf, oc = binary_geom(lambda a, b: fn(a, b, grid_size), geom_arg(other))
        return udf(col_or_lit(col)) if oc is None else udf(col_or_lit(col), oc)

    return outer


st_union = _b(setops.union)
st_intersection = _b(setops.intersection)
st_difference = _b(setops.difference)
st_symmetric_difference = _b(setops.symmetric_difference)


def st_unary_union(col, grid_size: float | None = None) -> Column:
    return unary_geom(lambda g: setops.unary_union(g, grid_size))(col_or_lit(col))


# ----------------------------------------------------------------------
# CRS ops (reference: §2.6)
# ----------------------------------------------------------------------

def st_set_srid(col, srid: int) -> Column:
    """Header patch only — vectorized per batch (reference: functions.rs:437-443)."""

    @pandas_udf("binary")
    def udf(s: pd.Series) -> pd.Series:
        return s.map(lambda b: None if b is None else to_ewkb(from_ewkb(bytes(b)).with_srid(srid)))

    return udf(col_or_lit(col))


# Web-Mercator <-> WGS84 closed forms (public formulas, EPSG 3857/4326).
_R = 6378137.0


def _wgs84_to_webmerc(arr: np.ndarray) -> np.ndarray:
    out = arr.copy()
    out[:, 0] = np.radians(arr[:, 0]) * _R
    out[:, 1] = np.log(np.tan(np.pi / 4 + np.radians(arr[:, 1]) / 2)) * _R
    return out


def _webmerc_to_wgs84(arr: np.ndarray) -> np.ndarray:
    out = arr.copy()
    out[:, 0] = np.degrees(arr[:, 0] / _R)
    out[:, 1] = np.degrees(2 * np.arctan(np.exp(arr[:, 1] / _R)) - np.pi / 2)
    return out


_TRANSFORMS = {
    (4326, 3857): _wgs84_to_webmerc,
    (3857, 4326): _webmerc_to_wgs84,
}


def st_to_srid(col, srid: int) -> Column:
    """Reproject coordinates (reference: functions.rs:1868-1939).

    Without pyproj in the runtime, supports the closed-form EPSG pairs
    (4326↔3857); identity when source==target; raises otherwise. The
    transformer lookup is cached per (src, dst) exactly like the reference's
    per-call ProjCache (functions.rs:1900-1914).
    """

    def fn(g: Geometry) -> Geometry:
        src = g.srid
        if src == srid or g.is_empty() and src == 0:
            return g.with_srid(srid)
        f = _TRANSFORMS.get((src, srid))
        if f is None:
            raise ValueError(f"Unsupported SRID transform {src} -> {srid} (no pyproj in runtime)")
        return g.map_coords(f).with_srid(srid)

    return unary_geom(fn)(col_or_lit(col))
