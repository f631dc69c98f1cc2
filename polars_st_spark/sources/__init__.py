"""Sources and sinks for geometry data."""

from polars_st_spark.sources.geojson_io import (
    read_geojson,
    read_ndgeojson,
    write_geojson,
    write_ndgeojson,
)
from polars_st_spark.sources.parquet_io import read_geoparquet, write_geoparquet

__all__ = [
    "read_geojson",
    "read_ndgeojson",
    "write_geojson",
    "write_ndgeojson",
    "read_geoparquet",
    "write_geoparquet",
]
