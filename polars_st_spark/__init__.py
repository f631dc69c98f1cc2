"""polars-st-spark: a PySpark-native spatial analytics engine.

A from-scratch PySpark library providing the query and data-processing
capabilities of the polars-st reference (PostGIS-style ``ST_*`` operations
over DataFrame columns), re-expressed Spark-first:

- geometry = EWKB bytes in ordinary ``BinaryType`` columns (per-value SRID,
  reference semantics: ``/root/reference/README.md:36``, ``src/wkb.rs:23-27``)
- scalar ops = Arrow-batched pandas UDFs over a numpy-vectorized geometry
  kernel (this repo's own; no GEOS/shapely dependency)
- aggregations = GROUPED_AGG pandas UDFs / plain Spark SQL where possible
- spatial join = broadcast STRtree or grid-cell equi-join
- everything composes with normal Spark SQL (Catalyst optimizes around it)
"""

from polars_st_spark.frame import (
    geodataframe,
    geom,
    plot,
    sjoin,
    to_ewkt,
    to_feature_dicts,
    to_geojson,
    to_wkb,
    to_wkt,
)
from polars_st_spark.operators.predjoin import filter_pairs
from polars_st_spark.functions import *  # noqa: F401,F403
from polars_st_spark.functions import __all__ as _fn_all

__version__ = "0.1.0"
__all__ = list(_fn_all) + [
    "geodataframe", "geom", "plot", "sjoin", "to_feature_dicts", "filter_pairs",
]
