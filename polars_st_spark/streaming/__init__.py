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

__all__ = [
    "streaming_points_in_zones",
    "windowed_spatial_agg",
    "streaming_exact_dedup",
    "streaming_minhash_tag",
    "streaming_session_stats",
    "streaming_interval_join",
]


def streaming_session_stats(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based session aggregates via Spark's native ``session_window`` —
    the scale path for streaming sessionization: session state lives in the
    JVM state store (RocksDB-capable, watermark-bounded), no Python worker
    in the loop, unlike the ``applyInPandasWithState`` variant
    (operators/sessions.py:sessionize_stream) which this supersedes for
    plain gap sessions. In append mode a session row is emitted once the
    watermark passes its close — exactly-once per session.

    Also callable on a batch DataFrame (session_window works in both modes;
    the watermark is a no-op in batch), where it matches
    ``operators.sessions.session_stats`` session boundaries for the same gap.
    """
    from pyspark.sql import types as T

    w = stream.withWatermark(ts_col, watermark) if stream.isStreaming else stream
    if isinstance(stream.schema[ts_col].dataType, T.TimestampNTZType):
        # unix_micros rejects TIMESTAMP_NTZ; NTZ -> TIMESTAMP is a pure type
        # change only under a fixed-offset session zone — asserted (ADVICE r3)
        from polars_st_spark.operators.sessions import _require_fixed_offset_tz

        _require_fixed_offset_tz(stream.sparkSession)
        us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    else:
        us = F.unix_micros
    return (
        w.groupBy(F.col(user_col), F.session_window(F.col(ts_col), gap).alias("_sw"))
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            (us(F.max(ts_col)) - us(F.min(ts_col))).alias("duration_us"),
        )
        .select(
            user_col,
            F.col("_sw.start").alias("window_start"),
            F.col("_sw.end").alias("window_end"),
            "session_start",
            "session_end",
            "n_events",
            "duration_us",
        )
    )


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Continuous exact deduplication of a document stream.

    Keyed on the md5 of the text (uniform key — no skew). With a timestamp
    column the state is bounded by ``dropDuplicatesWithinWatermark`` (a late
    duplicate beyond the watermark may re-emit — the documented at-least-once
    envelope); without one it falls back to unbounded-state dropDuplicates,
    which is only safe for bounded key cardinality."""
    keyed = stream.withColumn("_text_hash", F.md5(F.col(text_col)))
    if ts_col is not None:
        out = keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(["_text_hash"])
    else:
        out = keyed.dropDuplicates(["_text_hash"])
    return out.drop("_text_hash")


def streaming_minhash_tag(
    stream: DataFrame,
    text_col: str = "text",
    k: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Stateless near-dup tagging for a stream: attach the MinHash band
    hashes so a downstream join/groupBy (batch or stream-stream with
    watermarks) can bucket candidates. The signature UDF is stateless, so it
    composes with readStream unchanged."""
    from polars_st_spark.operators.textops import shingle_sig_bands_udf

    s = shingle_sig_bands_udf(text_col, k, bands, shingle_n)
    return stream.withColumn("_sig", s).withColumn(
        "band_hashes", F.col("_sig.bands")
    ).drop("_sig")


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


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str = "ts",
    right_ts: str = "ts",
    on: str = "user_id",
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream event-time interval join: pair rows sharing ``on``
    with ``right_ts ∈ [left_ts + lower, left_ts + upper]``. Both sides are
    watermarked, and the time-range predicate bounds the JVM join state
    (Spark drops buffered rows once the watermark clears their interval) —
    the canonical bounded-state stream-stream join shape; without the
    range condition the state would grow forever.

    Works identically on batch DataFrames (watermarks are no-ops), which is
    how the parity test pins batch ≡ streaming output. Right columns are
    suffixed ``_r`` on name conflicts. ``how`` supports inner and
    leftOuter (outer emits the unmatched row once the watermark passes)."""
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"how must be 'inner' or 'leftOuter', got {how!r}")
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rsel = [
        F.col(c).alias(c + "_r") if c in left.columns else F.col(c)
        for c in right.columns
    ]
    r_on = on + "_r" if on in left.columns else on
    r_ts = right_ts + "_r" if right_ts in left.columns else right_ts
    rview = right.select(*rsel)
    rw = rview.withWatermark(r_ts, watermark) if right.isStreaming else rview
    cond = (
        (F.col(on) == F.col(r_on))
        & (F.col(r_ts) >= F.col(left_ts) + F.expr(f"INTERVAL {lower}"))
        & (F.col(r_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return lw.join(rw, cond, how)
