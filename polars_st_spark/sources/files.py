"""File-format dispatch: the reference's ``read_file``/``write_file``
(reference: input.py:30-153, geodataframe.py:385-491) use GDAL via pyogrio,
which is not present in this runtime. This module covers the formats that
don't need GDAL natively — GeoJSON/ndjson/parquet, plus Shapefile
(sources/shapefile_io.py, from the public ESRI spec), GeoPackage
(sources/geopackage_io.py, via the stdlib sqlite3) and FlatGeobuf
(sources/flatgeobuf_io.py, from the public FlatBuffers wire format) — and
raises a clear error with the dependency name for the rest (FileGDB, ...).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_file", "write_file", "from_geopandas", "to_geopandas",
           "from_shapely", "to_shapely"]

_GDAL_EXTS = {".gdb", ".tab", ".kml", ".gml"}


def read_file(spark: SparkSession, path: str, geometry_name: str = "geometry") -> DataFrame:
    """Read a geometry file by extension.

    - ``.geojson``/``.json`` → FeatureCollection (driver-side)
    - ``.ndjson``/``.geojsonl`` → newline-delimited features (distributed)
    - ``.parquet`` → parquet with EWKB binary column
    - GDAL formats → ImportError naming pyogrio (reference parity needs GDAL)
    """
    ext = os.path.splitext(path)[1].lower()
    if ext in (".geojson", ".json"):
        from polars_st_spark.sources.geojson_io import read_geojson

        return read_geojson(spark, path, geometry_name)
    if ext in (".ndjson", ".geojsonl", ".ndgeojson"):
        from polars_st_spark.sources.geojson_io import read_ndgeojson

        return read_ndgeojson(spark, path, geometry_name)
    if ext == ".parquet":
        return spark.read.parquet(path)
    if ext == ".orc":
        # Spark-native columnar alternative; EWKB binary round-trips as-is
        return spark.read.orc(path)
    if ext == ".shp":
        from polars_st_spark.sources.shapefile_io import read_shapefile

        return read_shapefile(spark, path, geometry_name)
    if ext == ".gpkg":
        from polars_st_spark.sources.geopackage_io import read_geopackage

        return read_geopackage(spark, path, geometry_name=geometry_name)
    if ext == ".fgb":
        from polars_st_spark.sources.flatgeobuf_io import read_flatgeobuf

        return read_flatgeobuf(spark, path, geometry_name)
    if ext in (".csv", ".tsv"):
        # GDAL's CSV driver equivalent: header CSV with a WKT geometry
        # column (sniffed: the declared geometry_name, else the first of
        # WKT/wkt/geom/the first column whose values parse as WKT) —
        # distributed spark.read.csv + st_from_wkt, no GDAL
        from pyspark.sql import functions as F

        from polars_st_spark.functions.construct import st_from_wkt

        sep = "\t" if ext == ".tsv" else ","
        df = spark.read.option("header", "true").option("sep", sep).csv(path)
        cand = [geometry_name, "WKT", "wkt", "geometry", "geom"]
        col = next((c for c in cand if c in df.columns), None)
        if col is None:
            raise ValueError(
                f"CSV {path} has no geometry column (looked for {cand}); "
                f"pass geometry_name= matching a WKT column"
            )
        return df.withColumn(geometry_name, st_from_wkt(F.col(col))).drop(
            *([col] if col != geometry_name else [])
        )
    if ext == "" and os.path.isdir(path):
        # extensionless directory: parquet dataset (a Spark csv/json sink
        # directory keeps its .csv/.json extension and is handled above)
        return spark.read.parquet(path)
    if ext in _GDAL_EXTS:
        try:
            import pyogrio  # noqa: F401
        except ImportError as e:
            raise ImportError(
                f"Reading {ext} requires pyogrio/GDAL, which is not installed "
                "in this runtime. Convert to GeoJSON/ndjson/parquet, or install "
                "pyogrio (reference: input.py:30-153)."
            ) from e
        raise NotImplementedError("pyogrio path not wired yet")
    raise ValueError(f"Unsupported file extension {ext!r}")


def write_file(df: DataFrame, path: str, geometry_name: str = "geometry") -> None:
    ext = os.path.splitext(path)[1].lower()
    if ext in (".geojson", ".json"):
        from polars_st_spark.sources.geojson_io import write_geojson

        return write_geojson(df, path, geometry_name)
    if ext in (".ndjson", ".geojsonl", ".ndgeojson"):
        from polars_st_spark.sources.geojson_io import write_ndgeojson

        return write_ndgeojson(df, path, geometry_name)
    if ext == ".parquet" or ext == "":
        df.write.mode("overwrite").parquet(path)
        return
    if ext == ".orc":
        df.write.mode("overwrite").orc(path)
        return
    if ext == ".shp":
        from polars_st_spark.sources.shapefile_io import write_shapefile

        return write_shapefile(df, path, geometry_name)
    if ext == ".gpkg":
        from polars_st_spark.sources.geopackage_io import write_geopackage

        return write_geopackage(df, path, geometry_name=geometry_name)
    if ext == ".fgb":
        from polars_st_spark.sources.flatgeobuf_io import write_flatgeobuf

        return write_flatgeobuf(df, path, geometry_name)
    if ext in (".csv", ".tsv"):
        # CSV writer: geometry serialized as a WKT column (round-trips with
        # the reader above), written distributed by Spark's csv sink
        from pyspark.sql import functions as F

        from polars_st_spark.functions.scalar import st_to_wkt

        sep = "\t" if ext == ".tsv" else ","
        out = df.withColumn(geometry_name, st_to_wkt(F.col(geometry_name)))
        out.write.mode("overwrite").option("header", "true").option(
            "sep", sep
        ).csv(path)
        return
    if ext in _GDAL_EXTS:
        raise ImportError(
            f"Writing {ext} requires pyogrio/GDAL, not installed in this runtime "
            "(reference: geodataframe.py:385-491)."
        )
    raise ValueError(f"Unsupported file extension {ext!r}")


def from_geopandas(spark: SparkSession, gdf) -> DataFrame:
    """GeoPandas GeoDataFrame → Spark DataFrame with EWKB geometry
    (reference: input.py:178-222). Requires geopandas at the call site."""
    try:
        import geopandas  # noqa: F401
    except ImportError as e:
        raise ImportError("from_geopandas requires geopandas (not in this runtime)") from e
    import pandas as pd

    pdf = pd.DataFrame(gdf.drop(columns=gdf.geometry.name))
    srid = 0
    if gdf.crs is not None:
        auth = gdf.crs.to_authority()
        if auth:
            srid = int(auth[1])
    pdf["geometry"] = gdf.geometry.to_wkb()
    out = spark.createDataFrame(pdf)
    if srid:
        from polars_st_spark.functions.transform import st_set_srid

        out = out.withColumn("geometry", st_set_srid("geometry", srid))
    return out


def to_geopandas(df: DataFrame, geometry_name: str = "geometry"):
    """Collect to a GeoPandas frame; errors on mixed SRIDs exactly like the
    reference (geodataframe.py:348-350)."""
    try:
        import geopandas as gpd
        import shapely
    except ImportError as e:
        raise ImportError("to_geopandas requires geopandas+shapely (not in this runtime)") from e
    from polars_st_spark.functions.scalar import st_srid

    pdf = df.toPandas()
    srids = (
        df.select(st_srid(geometry_name).alias("s")).where("s is not null").distinct().collect()
    )
    vals = sorted({r["s"] for r in srids})
    if len(vals) > 1:
        raise ValueError(f"Cannot export mixed SRIDs to GeoPandas: {vals}")
    crs = vals[0] if vals and vals[0] else None
    pdf[geometry_name] = pdf[geometry_name].map(
        lambda b: None if b is None else shapely.from_wkb(bytes(b))
    )
    return gpd.GeoDataFrame(pdf, geometry=geometry_name, crs=crs)


def from_shapely(spark: SparkSession, geoms, column_name: str = "geometry") -> DataFrame:
    """Shapely geometry sequence → one-column Spark DataFrame of EWKB
    (reference: geoexpr.py:429-444 ``from_shapely``). Spark has no Object
    dtype (SURVEY §1.4), so the interchange crosses the boundary as WKB —
    lossless for geometry + SRID. Requires shapely at the call site; a
    driver-side constructor by nature (the inputs are driver objects)."""
    try:
        import shapely
    except ImportError as e:
        raise ImportError("from_shapely requires shapely (not in this runtime)") from e
    rows = [
        (None if g is None else bytes(shapely.to_wkb(g, include_srid=True)),)
        for g in geoms
    ]
    return spark.createDataFrame(rows, f"{column_name} binary")


def to_shapely(
    df: DataFrame, geometry_name: str = "geometry", max_rows: int = 1_000_000
) -> list:
    """Collect a geometry column as a list of shapely objects (reference:
    geoexpr.py ``to_shapely``). Bounded driver collect — raises past
    ``max_rows`` instead of silently OOMing the driver (the
    to_feature_dicts contract)."""
    try:
        import shapely
    except ImportError as e:
        raise ImportError("to_shapely requires shapely (not in this runtime)") from e
    rows = df.select(geometry_name).limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"to_shapely collects to the driver and the result exceeds "
            f"max_rows={max_rows}; raise max_rows explicitly for larger results"
        )
    return [
        None if r[0] is None else shapely.from_wkb(bytes(r[0])) for r in rows
    ]
