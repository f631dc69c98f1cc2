"""Range (interval) joins without the non-equi-join cliff.

Spark executes a raw ``l.t BETWEEN r.s AND r.e`` join as
BroadcastNestedLoopJoin (or a cartesian product) — all-pairs work that dies at
scale. These operators bin time onto a bucket grid and turn the range
condition into an EQUI-join on (by-keys, bucket), which shuffles O(n + m *
explode_factor) rows instead of touching n*m pairs; the exact range predicate
then filters the bucket-collisions. All JVM-side (sequence/explode + integer
math, no Python).

- ``range_join``: point-in-interval (event time inside a validity window).
  The point side has exactly ONE bucket, so bucket collisions are unique —
  no dedup needed.
- ``interval_overlap_join``: interval-vs-interval overlap. Both sides explode,
  so a pair can collide in every shared bucket; the pair is counted only in
  its FIRST shared bucket (``bucket == floor(max(ls, rs)/w)``) — the same
  reference-point dedup the grid spatial join uses (operators/sjoin.py), no
  global distinct shuffle.

Bucket width defaults to the p75 interval length (one approxQuantile job on
the right side) — wide enough that most intervals explode to <= 2 buckets,
narrow enough that a bucket's collision set stays small. Pass ``bucket=``
explicitly in production pipelines to keep the plan job-free and stable.

Reference: polars-st has no temporal joins; this is part of the
training-data-pipeline extension surface (join_asof's sibling, see asof.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from polars_st_spark.operators.asof import _ordinal

__all__ = ["range_join", "interval_overlap_join"]

_CLOSED = {"left", "right", "both", "neither"}


def _bounds_pred(t: Column, s: Column, e: Column, closed: str) -> Column:
    lo = (t >= s) if closed in ("left", "both") else (t > s)
    hi = (t <= e) if closed in ("right", "both") else (t < e)
    return lo & hi


def _auto_bucket(right: DataFrame, s: str, e: str) -> int:
    """p75 interval length (>=1): most intervals then span <= 2 buckets."""
    width = right.select(
        (_ordinal(F.col(e), right.schema[e].dataType)
         - _ordinal(F.col(s), right.schema[s].dataType)).cast("double").alias("w")
    )
    q = width.approxQuantile("w", [0.75], 0.01)[0] or 1.0
    return max(int(q), 1)


def _suffix_clashes(l: DataFrame, r: DataFrame, keep: list[str]) -> DataFrame:
    for c in r.columns:
        if c in l.columns and c not in keep:
            r = r.withColumnRenamed(c, c + "_right")
    return r


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    right_start: str,
    right_end: str,
    by: str | list[str] | None = None,
    how: str = "inner",
    closed: str = "left",
    bucket: int | None = None,
) -> DataFrame:
    """Join each left row (point time ``on``) to every right interval
    [``right_start``, ``right_end``) containing it, same ``by`` group.

    ``closed`` picks which bounds are inclusive ("left" = [s, e), the
    validity-window convention). ``how`` inner or left. Right columns that
    clash with left names get a ``_right`` suffix. Timestamps compare at
    microsecond precision; ``bucket`` is in those comparison units.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner/left, got {how!r}")
    if closed not in _CLOSED:
        raise ValueError(f"closed must be one of {sorted(_CLOSED)}, got {closed!r}")
    by = [by] if isinstance(by, str) else list(by or [])
    if bucket is None:
        bucket = _auto_bucket(right, right_start, right_end)

    right = _suffix_clashes(left, right, keep=by)
    rs = right_start if right_start in right.columns else right_start + "_right"
    re_ = right_end if right_end in right.columns else right_end + "_right"

    lt = _ordinal(F.col(on), left.schema[on].dataType)
    st_ = _ordinal(F.col(rs), right.schema[rs].dataType)
    en_ = _ordinal(F.col(re_), right.schema[re_].dataType)

    l2 = left.withColumn("_t", lt).withColumn("_bk", F.floor(F.col("_t") / bucket))
    r2 = (
        right.withColumn("_s", st_)
        .withColumn("_e", en_)
        .where(F.col("_e") >= F.col("_s"))
        .withColumn(
            "_bk",
            F.explode(F.sequence(F.floor(F.col("_s") / bucket), F.floor(F.col("_e") / bucket))),
        )
    )
    matched = l2.join(r2, on=by + ["_bk"], how="inner").where(
        _bounds_pred(F.col("_t"), F.col("_s"), F.col("_e"), closed)
    )
    out = matched.drop("_t", "_bk", "_s", "_e")
    if how == "left":
        # Null row for every left row with no qualifying interval. A bucket
        # left-anti is NOT enough (a row can collide in its bucket yet fail
        # the exact bounds), so anti-join against the matched left rows —
        # null-SAFE equality, or left rows containing nulls would always
        # reappear as spurious unmatched duplicates.
        import functools
        import operator

        rcols = [c for c in out.columns if c not in left.columns]
        matched_left = matched.select(*left.columns).dropDuplicates()
        cond = functools.reduce(
            operator.and_,
            [left[c].eqNullSafe(matched_left[c]) for c in left.columns],
        )
        missing = left.join(matched_left, on=cond, how="left_anti")
        for c in rcols:
            missing = missing.withColumn(c, F.lit(None).cast(out.schema[c].dataType))
        out = out.unionByName(missing.select(out.columns))
    return out


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    by: str | list[str] | None = None,
    closed: str = "both",
    bucket: int | None = None,
) -> DataFrame:
    """Inner join of overlapping intervals (same ``by`` group). ``closed``
    "both" counts boundary touches as overlap, "neither" requires interior
    overlap. Pairs dedup via the first-shared-bucket rule — no distinct."""
    if closed not in ("both", "neither"):
        raise ValueError(f"closed must be both/neither, got {closed!r}")
    by = [by] if isinstance(by, str) else list(by or [])
    if bucket is None:
        bucket = _auto_bucket(right, right_start, right_end)

    right = _suffix_clashes(left, right, keep=by)
    rs = right_start if right_start in right.columns else right_start + "_right"
    re_ = right_end if right_end in right.columns else right_end + "_right"

    ls_ = _ordinal(F.col(left_start), left.schema[left_start].dataType)
    le_ = _ordinal(F.col(left_end), left.schema[left_end].dataType)
    rs_ = _ordinal(F.col(rs), right.schema[rs].dataType)
    re2_ = _ordinal(F.col(re_), right.schema[re_].dataType)

    l2 = (
        left.withColumn("_ls", ls_)
        .withColumn("_le", le_)
        .where(F.col("_le") >= F.col("_ls"))
        .withColumn(
            "_bk",
            F.explode(F.sequence(F.floor(F.col("_ls") / bucket), F.floor(F.col("_le") / bucket))),
        )
    )
    r2 = (
        right.withColumn("_rs", rs_)
        .withColumn("_re", re2_)
        .where(F.col("_re") >= F.col("_rs"))
        .withColumn(
            "_bk",
            F.explode(F.sequence(F.floor(F.col("_rs") / bucket), F.floor(F.col("_re") / bucket))),
        )
    )
    if closed == "both":
        overlap = (F.col("_ls") <= F.col("_re")) & (F.col("_rs") <= F.col("_le"))
    else:
        overlap = (F.col("_ls") < F.col("_re")) & (F.col("_rs") < F.col("_le"))
    first_shared = F.floor(F.greatest(F.col("_ls"), F.col("_rs")) / bucket)
    out = (
        l2.join(r2, on=by + ["_bk"], how="inner")
        .where(overlap & (F.col("_bk") == first_shared))
    )
    return out.drop("_ls", "_le", "_rs", "_re", "_bk")
