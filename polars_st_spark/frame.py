"""GeoDataFrame-style helpers.

The reference's GeoDataFrame/GeoSeries are type aliases over plain frames
(reference: geodataframe.py:50-98, geoseries.py:61-141); the Spark equivalent
is a plain DataFrame with an EWKB Binary column plus these helpers:

- :func:`geodataframe` — parse a named column into EWKB with the reference's
  format-sniffing rules (reference: geoseries.py:96-112)
- :func:`geom` — default-name column selector (reference: selectors.py:19-62)
- :func:`sjoin` — frame-level spatial join (reference: geodataframe.py:185-230)
- :func:`to_wkt_frame` / feature-dict export helpers
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BinaryType, StringType

from polars_st_spark.functions.construct import (
    st_from_coords,
    st_from_ewkt,
    st_from_geojson,
    st_from_wkb,
    st_from_wkt,
)
from polars_st_spark.functions.scalar import st_to_geojson, st_to_wkt

__all__ = ["geodataframe", "geom", "plot", "sjoin", "to_feature_dicts",
           "to_ewkt", "to_geojson", "to_wkb", "to_wkt", "write_ndgeojson"]


def geom(name: str = "geometry", *more_names: str):
    """Geometry column selector with the reference's default name
    (reference: selectors.py:19-62). Multiple names return a list of
    Columns (the reference's multi-name `pl.col` shape); regex selection is
    frame-scoped in Spark — use ``df.colRegex`` directly."""
    if more_names:
        return [F.col(name), *(F.col(n) for n in more_names)]
    return F.col(name)


def _sniff_format(df: DataFrame, col: str) -> str:
    """Reference sniffing rules (geoseries.py:96-112): Binary→wkb; String
    starting '{'→geojson, 'SRID='→ewkt, else wkt; nested array→coords."""
    dtype = df.schema[col].dataType
    if isinstance(dtype, BinaryType):
        return "wkb"
    if isinstance(dtype, ArrayType):
        return "coords"
    if isinstance(dtype, StringType):
        row = df.select(col).where(F.col(col).isNotNull()).first()
        if row is None:
            return "wkt"
        v = row[0].lstrip()
        if v.startswith("{"):
            return "geojson"
        if v.upper().startswith("SRID="):
            return "ewkt"
        return "wkt"
    raise TypeError(f"Cannot infer geometry format from dtype {dtype.simpleString()}")


_PARSERS = {
    "wkb": st_from_wkb,
    "wkt": st_from_wkt,
    "ewkt": st_from_ewkt,
    "geojson": st_from_geojson,
    "coords": st_from_coords,
}


def geodataframe(
    df: DataFrame,
    geometry_name: str = "geometry",
    geometry_format: str | None = None,
) -> DataFrame:
    """Parse ``geometry_name`` into an EWKB Binary column, sniffing the input
    format from dtype + first value when not given
    (reference: geodataframe.py:50-98)."""
    if geometry_name not in df.columns:
        raise ValueError(f"Column {geometry_name!r} not found in {df.columns}")
    fmt = geometry_format or _sniff_format(df, geometry_name)
    if fmt not in _PARSERS:
        raise ValueError(f"Unknown geometry_format {fmt!r}; valid: {sorted(_PARSERS)}")
    return df.withColumn(geometry_name, _PARSERS[fmt](geometry_name))


def sjoin(
    left: DataFrame,
    right: DataFrame,
    on: str = "geometry",
    how: str = "inner",
    predicate: str = "intersects",
    **kwargs,
) -> DataFrame:
    """Frame-level spatial join with the reference's signature
    (reference: geodataframe.py:185-230). ``predicate(left, right)``
    evaluation order preserved (functions.rs:1855-1859)."""
    from polars_st_spark.operators.sjoin import st_sjoin

    return st_sjoin(left, right, predicate=predicate, how=how,
                    left_on=on, right_on=on, **kwargs)


def to_feature_dicts(
    df: DataFrame, geometry_name: str = "geometry", max_rows: int = 1_000_000
) -> list[dict]:
    """Rows as GeoJSON Feature dicts (reference: geodataframe.py:314-330).
    Driver-side collect, bounded: raises past ``max_rows`` instead of
    silently OOMing the driver."""
    props = [c for c in df.columns if c != geometry_name]
    rows = df.select(
        F.to_json(F.struct(*[F.col(c) for c in props])).alias("_props"),
        st_to_geojson(geometry_name).alias("_geom"),
    ).limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"to_feature_dicts collects to the driver and the result exceeds "
            f"max_rows={max_rows}; raise max_rows explicitly for larger results"
        )
    return [
        {
            "type": "Feature",
            "properties": json.loads(r["_props"]),
            "geometry": None if r["_geom"] is None else json.loads(r["_geom"]),
        }
        for r in rows
    ]


def plot(
    df: DataFrame,
    geometry_name: str = "geometry",
    max_rows: int = 100_000,
    **mark_kwargs,
):
    """Draw a map plot via Altair (reference: geodataframe.py:555-598 —
    ``alt.Chart({"values": to_dicts()}).mark_geoshape(**kwargs).interactive()``).

    Driver-side by design, like the reference: the frame is collected into a
    GeoJSON FeatureCollection (bounded by ``max_rows`` — plotting is a
    small-result operation; aggregate/simplify first at scale), so columns
    are reached in Altair encodings as ``properties.<name>``.

    When altair is importable, returns the same ``alt.Chart`` the
    reference returns. Without altair, returns the equivalent VEGA-LITE
    SPEC DICT (what ``chart.to_dict()`` would serialize — a chart IS its
    JSON spec; paste it into any Vega-Lite renderer), so plotting works
    in altair-less runtimes too."""
    values = to_feature_dicts(df, geometry_name, max_rows=max_rows)
    try:
        import altair as alt
    except ImportError:
        return {
            "$schema": "https://vega.github.io/schema/vega-lite/v5.json",
            "data": {"values": values},
            "mark": {"type": "geoshape", **mark_kwargs},
            # .interactive(): pan/zoom via an interval param bound to scales
            "params": [
                {"name": "grid", "select": "interval", "bind": "scales"}
            ],
        }
    return alt.Chart({"values": values}).mark_geoshape(**mark_kwargs).interactive()


def write_ndgeojson(df: DataFrame, path: str, geometry_name: str = "geometry") -> None:
    from polars_st_spark.sources.geojson_io import write_ndgeojson as _w

    _w(df, path, geometry_name)


def _convert_geo_columns(df: DataFrame, fn, only: str | None) -> DataFrame:
    from pyspark.sql import types as T

    cols = [only] if only else [
        f.name for f in df.schema.fields if isinstance(f.dataType, T.BinaryType)
    ]
    out = df
    for c in cols:
        out = out.withColumn(c, fn(c))
    return out


def to_wkt(df: DataFrame, geometry_name: str | None = None, **kwargs) -> DataFrame:
    """Serialize every geometry (binary) column — or just ``geometry_name``
    — to WKT strings (reference: geodataframe.py to_wkt, which converts all
    geo columns of the frame)."""
    from polars_st_spark.functions.scalar import st_to_wkt

    return _convert_geo_columns(df, lambda c: st_to_wkt(c, **kwargs), geometry_name)


def to_ewkt(df: DataFrame, geometry_name: str | None = None, **kwargs) -> DataFrame:
    """Frame-level EWKT serialization (reference: geodataframe.py to_ewkt)."""
    from polars_st_spark.functions.scalar import st_to_ewkt

    return _convert_geo_columns(df, lambda c: st_to_ewkt(c, **kwargs), geometry_name)


def to_wkb(df: DataFrame, geometry_name: str | None = None, **kwargs) -> DataFrame:
    """Frame-level WKB re-serialization (reference: geodataframe.py to_wkb —
    useful for include_srid / byte-order normalization before export)."""
    from polars_st_spark.functions.scalar import st_to_wkb

    return _convert_geo_columns(df, lambda c: st_to_wkb(c, **kwargs), geometry_name)


def to_geojson(df: DataFrame, geometry_name: str | None = None, **kwargs) -> DataFrame:
    """Frame-level GeoJSON-geometry serialization (reference:
    geodataframe.py to_geojson)."""
    from polars_st_spark.functions.scalar import st_to_geojson

    return _convert_geo_columns(df, lambda c: st_to_geojson(c, **kwargs), geometry_name)
