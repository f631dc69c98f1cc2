"""As-of (point-in-time) join — the temporal join a training-data pipeline
uses to attach "the most recent reference row at event time" (feature
snapshots, rates, labels) without an all-pairs range blowup.

Spark has no native ASOF JOIN (DuckDB/pandas ``merge_asof`` do). The
implementation is the classic union-merge: tag both sides, union on aligned
columns, and take a windowed ``last(right_payload, ignoreNulls)`` ordered by
(time, side). That is ONE shuffle on the ``by`` key (the window partition) —
no join, no range-explode, no driver collect — so it scales to arbitrarily
large sides as long as a single ``by`` group fits a partition (the same
contract as any windowed op; salt the key upstream if one entity dominates).

Semantics match ``pandas.merge_asof``: every left row is kept (left join);
``direction`` backward/forward/nearest; ``allow_exact_matches`` includes or
excludes right rows at exactly the left timestamp; ``tolerance`` (in the time
column's comparison unit — MICROSECONDS for timestamps, days for dates, the
native value otherwise) null-outs matches farther than the bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

__all__ = ["as_of_join"]


def _ordinal(expr, dtype):
    """Exact ordering key for a time-like column. CAST(ts AS LONG) yields
    SECONDS in Spark — it silently drops sub-second precision and would make
    distinct event times tie — so timestamps go through unix_micros instead."""
    if isinstance(dtype, T.TimestampType):
        return F.unix_micros(expr)
    if isinstance(dtype, T.TimestampNTZType):
        return F.unix_micros(expr.cast("timestamp"))
    if isinstance(dtype, T.DateType):
        return F.datediff(expr, F.lit("1970-01-01")).cast("long")
    if isinstance(dtype, (T.DoubleType, T.FloatType, T.DecimalType)):
        return expr.cast("double")
    return expr.cast("long")


def _unioned(left: DataFrame, right: DataFrame, on: str, by: list[str], rcols: list[str]):
    """Align both sides on (by, _t, _side, _lrow, _rrow) and union."""
    lt = left.select(
        *by,
        _ordinal(F.col(on), left.schema[on].dataType).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_lrow"),
        F.lit(None).cast(
            right.select(F.struct(*rcols).alias("s")).schema["s"].dataType
        ).alias("_rrow"),
    )
    rt = right.select(
        *by,
        _ordinal(F.col(on), right.schema[on].dataType).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("_lrow"),
        F.struct(*rcols).alias("_rrow"),
    )
    return lt.unionByName(rt)


def _one_direction(
    both: DataFrame,
    by: list[str],
    allow_exact: bool,
    forward: bool,
) -> DataFrame:
    """Attach ``_match`` (the as-of right struct) to every row; left rows are
    then filtered out by the caller. ``forward`` mirrors time."""
    t = (-F.col("_t")) if forward else F.col("_t")
    # At equal timestamps: right rows sort BEFORE left when exact matches are
    # allowed (visible to the window), AFTER when they must be excluded.
    side_key = F.when(F.col("_is_left") == 1, F.lit(1)).otherwise(
        F.lit(0) if allow_exact else F.lit(2)
    )
    w = (
        Window.partitionBy(*[F.col(c) for c in by])
        .orderBy(t.asc(), side_key.asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return both.withColumn("_match", F.last("_rrow", ignorenulls=True).over(w))


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] | None = None,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tolerance: int | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: for each left row, the single right row closest in
    time (per ``direction``) within the same ``by`` group.

    Output: all left columns, plus every non-``by`` right column (suffixed on
    name clash), NULL where no right row qualifies. Ties among right rows at
    the same timestamp are broken by storage order — give the right side a
    unique (by, on) key for fully deterministic output.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
    by = [by] if isinstance(by, str) else list(by or [])
    if not by:
        # A global as-of is one window partition — a deliberate error rather
        # than a silent single-partition bottleneck at scale.
        raise ValueError("as_of_join requires `by` (a global as-of does not partition)")

    rcols = [c for c in right.columns if c not in by]
    out_names = {c: (c + suffix if c in left.columns else c) for c in rcols}
    both = _unioned(left, right, on, by, rcols)

    if direction in ("backward", "nearest"):
        both = _one_direction(both, by, allow_exact_matches, forward=False)
        both = both.withColumnRenamed("_match", "_m_back")
    if direction in ("forward", "nearest"):
        both = _one_direction(both, by, allow_exact_matches, forward=True)
        both = both.withColumnRenamed("_match", "_m_fwd")

    rows = both.where(F.col("_is_left") == 1)
    lt = F.col("_t")
    r_dtype = right.schema[on].dataType

    def _dist(m):
        return F.abs(_ordinal(m[on], r_dtype) - lt)

    if direction == "backward":
        match = F.col("_m_back")
    elif direction == "forward":
        match = F.col("_m_fwd")
    else:  # nearest: pick the closer side; backward wins ties (pandas parity)
        b, f = F.col("_m_back"), F.col("_m_fwd")
        match = (
            F.when(b.isNull(), f)
            .when(f.isNull(), b)
            .when(_dist(f) < _dist(b), f)
            .otherwise(b)
        )

    if tolerance is not None:
        match = F.when(_dist(match) <= F.lit(int(tolerance)), match)

    out = rows.select(
        F.col("_lrow").alias("_l"), match.alias("_m")
    ).select(
        *[F.col("_l")[c].alias(c) for c in left.columns],
        *[F.col("_m")[c].alias(out_names[c]) for c in rcols],
    )
    return out
