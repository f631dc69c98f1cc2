"""Pure-Python/numpy geometry kernel (no GEOS dependency).

The compute layer the Spark UDFs call into. Geometry model, WKT/EWKB/GeoJSON
codecs, measures, predicates, transforms, spatial index.
"""

from polars_st_spark.geo.types import Geometry, GeometryType

__all__ = ["Geometry", "GeometryType"]
