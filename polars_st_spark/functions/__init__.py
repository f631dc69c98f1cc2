"""Spark-facing ``st_*`` function surface.

The module-of-functions shape mirrors the reference's own sugar API
(reference: polars_st/sugar.py:112-625): ``st_area(col)`` etc., each
returning an ordinary ``pyspark.sql.Column`` that composes with all of
Spark SQL (filters, windows, joins, groupBy).
"""

from polars_st_spark.functions.agg import *  # noqa: F401,F403
from polars_st_spark.functions.agg import __all__ as _agg_all
from polars_st_spark.functions.construct import *  # noqa: F401,F403
from polars_st_spark.functions.construct import __all__ as _construct_all
from polars_st_spark.functions.crs import *  # noqa: F401,F403
from polars_st_spark.functions.crs import __all__ as _crs_all
from polars_st_spark.functions.predicate import *  # noqa: F401,F403
from polars_st_spark.functions.predicate import __all__ as _predicate_all
from polars_st_spark.functions.scalar import *  # noqa: F401,F403
from polars_st_spark.functions.scalar import __all__ as _scalar_all
from polars_st_spark.functions.transform import *  # noqa: F401,F403
from polars_st_spark.functions.transform import __all__ as _transform_all
from polars_st_spark.functions.sqlreg import register_sql_functions  # noqa: F401
from polars_st_spark.functions.zorder import *  # noqa: F401,F403
from polars_st_spark.functions.zorder import __all__ as _zorder_all

__all__ = (
    list(_construct_all) + list(_scalar_all) + list(_predicate_all)
    + list(_transform_all) + list(_agg_all) + list(_zorder_all)
    + list(_crs_all) + ["register_sql_functions"]
)
