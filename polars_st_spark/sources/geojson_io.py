"""GeoJSON sources and sinks.

Mirrors the reference's write_geojson / write_ndgeojson
(reference: geodataframe.py:499-553) and the read side of read_file for the
GeoJSON case (reference: input.py:30-153) — Spark-first:

- newline-delimited GeoJSON (one Feature per line) is the scalable format:
  reads parallelize over line splits, writes stream per partition.
- whole-file FeatureCollection is driver-side (small files only), like the
  reference's pyogrio path.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polars_st_spark.functions.construct import st_from_geojson
from polars_st_spark.functions.scalar import st_to_geojson

__all__ = ["read_ndgeojson", "read_geojson", "write_ndgeojson", "write_geojson"]


def read_ndgeojson(
    spark: SparkSession,
    path: str,
    geometry_name: str = "geometry",
) -> DataFrame:
    """Read newline-delimited GeoJSON Features into (properties..., geometry EWKB).

    Distributed: ``spark.read.json`` infers the property schema and
    parallelizes; the geometry member is re-serialized to EWKB binary.
    """
    # geometry must stay a raw JSON string: schema inference would merge the
    # different coordinate nesting depths (Point vs Polygon) into array<string>
    lines = spark.read.text(path)
    inferred = spark.read.json(path)
    prop_cols = []
    if "properties" in inferred.columns:
        props_schema = inferred.schema["properties"].dataType
        props = F.from_json(F.get_json_object(F.col("value"), "$.properties"), props_schema)
        prop_cols = [props[f.name].alias(f.name) for f in props_schema.fields]
    return lines.select(
        *prop_cols,
        st_from_geojson(F.get_json_object(F.col("value"), "$.geometry")).alias(geometry_name),
    )


def read_geojson(
    spark: SparkSession,
    path: str,
    geometry_name: str = "geometry",
) -> DataFrame:
    """Read a whole-file FeatureCollection (driver-side parse — small files;
    use read_ndgeojson for scale)."""
    with open(path) as f:
        fc = json.load(f)
    feats = fc.get("features", [])
    rows = []
    for feat in feats:
        props = feat.get("properties") or {}
        rows.append({**props, "__geojson": json.dumps(feat.get("geometry"))})
    if not rows:
        raise ValueError(f"No features in {path}")
    df = spark.createDataFrame(rows)
    return df.select(
        *[c for c in df.columns if c != "__geojson"],
        st_from_geojson(F.col("__geojson")).alias(geometry_name),
    )


def _feature_line(df: DataFrame, geometry_name: str) -> DataFrame:
    props = [c for c in df.columns if c != geometry_name]
    return df.select(
        F.concat(
            F.lit('{"type":"Feature","properties":'),
            F.to_json(F.struct(*[F.col(c) for c in props])),
            F.lit(',"geometry":'),
            F.coalesce(st_to_geojson(geometry_name), F.lit("null")),
            F.lit("}"),
        ).alias("value")
    )


def write_ndgeojson(df: DataFrame, path: str, geometry_name: str = "geometry") -> None:
    """One Feature per line, written in parallel per partition
    (reference: geodataframe.py:534-553)."""
    _feature_line(df, geometry_name).write.mode("overwrite").text(path)


def write_geojson(
    df: DataFrame,
    path: str,
    geometry_name: str = "geometry",
    max_rows: int = 1_000_000,
) -> None:
    """Whole-file FeatureCollection (the single-file contract matches the
    reference, geodataframe.py:499-526), STREAMED through the driver: rows
    arrive partition-at-a-time via ``toLocalIterator`` and are appended to
    the file as they come, so driver memory is O(one partition), never
    O(file) — no feature list, no joined string. Still row-bounded: raises
    past ``max_rows`` (removing the partial temp file) instead of writing
    unboundedly; use :func:`write_ndgeojson` (distributed, one Feature per
    line) for outputs that shouldn't pass through the driver at all."""
    import os

    tmp = path + ".inprogress"
    n = 0
    try:
        with open(tmp, "w") as f:
            f.write('{"type":"FeatureCollection","features":[\n')
            for r in _feature_line(df, geometry_name).toLocalIterator():
                if n >= max_rows:
                    raise ValueError(
                        f"write_geojson streams through the driver and the result "
                        f"exceeds max_rows={max_rows}; use write_ndgeojson for large "
                        f"outputs or raise max_rows explicitly"
                    )
                if n:
                    f.write(",\n")
                f.write(r["value"])
                n += 1
            f.write("\n]}\n")
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
