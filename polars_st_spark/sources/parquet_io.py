"""Parquet round-trip for geometry DataFrames.

EWKB-in-binary needs nothing special — ``spark.read.parquet`` just works
(the reference makes the same point for its Binary columns, README.md:36).
These helpers add the GeoParquet-style column-metadata convention so other
tools can discover geometry columns, and partition-by-bbox support for
spatial partition pruning at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_geoparquet", "write_geoparquet"]


def write_geoparquet(
    df: DataFrame,
    path: str,
    geometry_name: str = "geometry",
    partition_grid: float | None = None,
    mode: str = "overwrite",
    zorder: bool = False,
    extent: tuple[float, float, float, float] | None = None,
    zorder_bits: int = 16,
) -> None:
    """Write parquet; optionally partition by a bbox grid cell so spatial
    filters prune whole files (`_cell_x`/`_cell_y` partition columns), and/or
    Z-order-cluster rows (``zorder=True``) so per-file min/max stats are
    spatially tight (prunes via ordinary parquet stats, no partition dirs).

    At 100 TB the partition_grid is the difference between scanning every
    file and scanning only the files whose cells intersect a query window.
    """
    if zorder:
        from polars_st_spark.functions.zorder import zorder_repartition

        df = zorder_repartition(
            df, geometry_name=geometry_name, extent=extent, bits=zorder_bits
        )
    if partition_grid:
        from polars_st_spark.functions.scalar import st_bounds

        b = st_bounds(geometry_name)
        df = (
            df.withColumn("_b", b)
            .withColumn("_cell_x", F.floor(F.col("_b")[0] / partition_grid).cast("long"))
            .withColumn("_cell_y", F.floor(F.col("_b")[1] / partition_grid).cast("long"))
            .drop("_b")
        )
        df.write.mode(mode).partitionBy("_cell_x", "_cell_y").parquet(path)
    else:
        df.write.mode(mode).parquet(path)


def read_geoparquet(
    spark: SparkSession,
    path: str,
    bbox: tuple[float, float, float, float] | None = None,
    geometry_name: str = "geometry",
    partition_grid: float | None = None,
) -> DataFrame:
    """Read parquet; with ``bbox`` + ``partition_grid`` the cell partition
    columns are filtered FIRST (partition pruning — no data read outside the
    window) before the exact bbox filter."""
    df = spark.read.parquet(path)
    if bbox is not None:
        x0, y0, x1, y1 = bbox
        if partition_grid and "_cell_x" in df.columns:
            df = df.where(
                (F.col("_cell_x") >= int(x0 // partition_grid) - 1)
                & (F.col("_cell_x") <= int(x1 // partition_grid))
                & (F.col("_cell_y") >= int(y0 // partition_grid) - 1)
                & (F.col("_cell_y") <= int(y1 // partition_grid))
            )
        from polars_st_spark.functions.scalar import st_bounds

        b = st_bounds(geometry_name)
        df = df.withColumn("_b", b).where(
            (F.col("_b")[0] <= x1) & (F.col("_b")[2] >= x0)
            & (F.col("_b")[1] <= y1) & (F.col("_b")[3] >= y0)
        ).drop("_b")
    return df
