"""Event sessionization — gap-based sessions over an event stream.

Batch path: pure Spark SQL window functions (lag + conditional cumsum) —
one shuffle on the user key, whole-stage codegen, SQL-oracle-checkable.

Streaming path: ``applyInPandasWithState`` keeps per-user open-session state
with a processing-timeout flush — the Structured Streaming custom stateful
operator pattern (SURVEY §2.10 extension; the reference has no streaming).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)
from pyspark.sql.window import Window

__all__ = ["sessionize", "session_stats", "sessionize_stream"]


def _require_fixed_offset_tz(spark) -> None:
    """NTZ -> TIMESTAMP casting is a pure type change ONLY under a
    fixed-offset session zone; under a DST-observing zone the epoch shift is
    non-uniform, so session gaps spanning a DST transition would be off by
    the DST delta (ADVICE r3). Raise loudly instead of silently mis-gapping."""
    tz = spark.conf.get("spark.sql.session.timeZone", "UTC") or "UTC"
    fixed = (
        tz in ("UTC", "GMT", "Z", "Etc/UTC", "Etc/GMT", "Etc/Greenwich")
        or tz.startswith(("+", "-", "UTC+", "UTC-", "GMT+", "GMT-", "Etc/GMT+", "Etc/GMT-"))
    )
    if not fixed:
        raise ValueError(
            f"TIMESTAMP_NTZ columns require a fixed-offset "
            f"spark.sql.session.timeZone (e.g. 'UTC'); current zone {tz!r} "
            f"observes DST, which would shift gaps across transitions. "
            f"Set spark.conf.set('spark.sql.session.timeZone', 'UTC')."
        )


def _micros(df: DataFrame, ts_col: str):
    """Exact integer-microsecond ordinal for a timestamp column.

    ``unix_micros`` rejects TIMESTAMP_NTZ (how newer parquet readers surface
    TIMESTAMP(isAdjustedToUTC=false)); casting NTZ -> TIMESTAMP first is a
    pure type change under a fixed-offset session zone — asserted by
    ``_require_fixed_offset_tz``. Same pattern as operators/asof.py:_ordinal."""
    from pyspark.sql import types as T

    if isinstance(df.schema[ts_col].dataType, T.TimestampNTZType):
        _require_fixed_offset_tz(df.sparkSession)
        return F.unix_micros(F.col(ts_col).cast("timestamp"))
    return F.unix_micros(F.col(ts_col))


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Assign a session_id per user: a new session starts when the gap from
    the previous event exceeds ``gap_minutes``. Adds ``session_id`` (0-based
    per user, event-time ordered)."""
    # integer-microsecond arithmetic: session boundaries are exact (no float
    # gap comparisons), and the math matches any SQL engine bit-for-bit
    us = _micros(df, ts_col)
    prev_us = F.lag(us).over(Window.partitionBy(user_col).orderBy(us.asc()))
    gap_us = int(gap_minutes * 60.0 * 1_000_000)
    new_session = F.when(prev_us.isNull() | ((us - prev_us) > gap_us), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(
            Window.partitionBy(user_col).orderBy(us.asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        ) - 1,
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Per-session aggregates: event count, start/end, duration seconds."""
    s = sessionize(df, user_col, ts_col, gap_minutes)
    us = _micros(df, ts_col)
    return s.groupBy(user_col, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(us) - F.min(us)).alias("duration_us"),
        ((F.max(us) - F.min(us)) / 1_000_000.0).alias("duration_s"),
    )


def sessionize_stream(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
):
    """Streaming sessionization via ``applyInPandasWithState``: per-user open
    session kept in state, emitted when the gap closes it (or on timeout).

    Output rows: (user_id, session_start, session_end, n_events).
    """
    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("session_start", TimestampType()),
            StructField("session_end", TimestampType()),
            StructField("n_events", IntegerType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("start_s", DoubleType()),
            StructField("end_s", DoubleType()),
            StructField("n", IntegerType()),
        ]
    )
    gap_s = gap_minutes * 60.0

    def fn(key: Tuple[Any], pdfs: Iterator[pd.DataFrame], state: GroupState):
        import datetime

        (user,) = key
        closed = []
        if state.hasTimedOut:
            if state.exists:
                s0, s1, n = state.get
                closed.append((user, s0, s1, n))
                state.remove()
        else:
            cur = list(state.get) if state.exists else None
            for pdf in pdfs:
                ts = sorted(t.timestamp() for t in pd.to_datetime(pdf[ts_col]))
                for t in ts:
                    if cur is None:
                        cur = [t, t, 1]
                    elif t - cur[1] > gap_s:
                        closed.append((user, cur[0], cur[1], cur[2]))
                        cur = [t, t, 1]
                    else:
                        cur[1] = max(cur[1], t)
                        cur[2] += 1
            if cur is not None:
                state.update(tuple(cur))
                state.setTimeoutDuration(int(gap_s * 1000))
        if closed:
            # utcfromtimestamp pairs with pandas treating naive inputs as UTC
            # in .timestamp(); fromtimestamp would shift by the machine TZ
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": [datetime.datetime.utcfromtimestamp(c[1]) for c in closed],
                    "session_end": [datetime.datetime.utcfromtimestamp(c[2]) for c in closed],
                    "n_events": [c[3] for c in closed],
                }
            )

    return (
        stream.groupBy(F.col(user_col))
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
