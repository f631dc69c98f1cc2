"""Skew mitigation: salted joins and salted two-phase aggregation.

A shuffle hash-partitions on the key, so one dominant key lands its entire
group on one task — the straggler that decides wall-clock at 100 TB. AQE's
skew-join split handles sort-merge joins after the fact; these helpers handle
the cases AQE cannot: hash joins keyed by a pathological key, aggregations
whose functions have no map-side partial (collect_list/collect_set), and
pipelines that want the salt to be explicit and testable.

- ``salted_join``: left rows get a uniform random salt in [0, salt); right
  rows are replicated once per salt value; the equi-join runs on
  (keys..., _salt) so the dominant key spreads over ``salt`` tasks. Join
  results are EXACTLY the plain join's (the salt always matches one replica).
  ``skewed_keys`` restricts salting to the listed heavy hitters — everything
  else joins unsalted and the two results union (replication cost only where
  it pays).
- ``salted_agg``: groupBy(keys + salt) partial -> groupBy(keys) merge, for
  aggregates Spark cannot partially aggregate map-side.
- ``top_keys``: heavy-hitter detection (optionally on a sample) to feed
  ``skewed_keys``.

The random salt is nondeterministic per task retry — harmless here by
construction (every salt value joins the same replicated right rows), which
is why the salt never leaks into the output.

Reference repo has no distributed-skew surface (single-node engine); this is
part of the Spark-first scale layer, same family as operators/sjoin.py's
grid strategy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "salted_agg", "top_keys"]

_HOWS = ("inner", "left", "left_semi", "left_anti", "semi", "anti")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt: int = 16,
    skewed_keys: list | None = None,
) -> DataFrame:
    """Equi-join with the left side's skew spread over ``salt`` partitions.

    ``how`` is left-preserving only (inner/left/semi/anti): right-preserving
    joins would emit one null row per unmatched REPLICA. ``skewed_keys``
    (values of a single-column key) salts only those keys. Output columns =
    the plain join's; the salt column never escapes.
    """
    if how not in _HOWS:
        raise ValueError(f"how must be one of {_HOWS}, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if salt < 2:
        raise ValueError("salt must be >= 2")

    if skewed_keys is not None:
        if len(keys) != 1:
            raise ValueError("skewed_keys needs a single-column key")
        k = keys[0]
        hot = F.col(k).isin(list(skewed_keys))
        hot_part = _salted(left.where(hot), right.where(hot), keys, how, salt)
        cold_part = left.where(~hot | F.col(k).isNull()).join(
            right.where(~hot | F.col(k).isNull()), on=keys, how=how
        )
        return hot_part.unionByName(cold_part)
    return _salted(left, right, keys, how, salt)


def _salted(left: DataFrame, right: DataFrame, keys: list[str], how: str, salt: int) -> DataFrame:
    l2 = left.withColumn("_salt", (F.rand() * salt).cast("int"))
    r2 = right.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = l2.join(r2, on=keys + ["_salt"], how=how)
    return out.drop("_salt")


_PARTIAL = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
    "collect_list": (F.collect_list, lambda c: F.flatten(F.collect_list(c))),
    "collect_set": (
        F.collect_set,
        lambda c: F.array_distinct(F.flatten(F.collect_list(c))),
    ),
}


def salted_agg(
    df: DataFrame,
    keys: str | list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase groupBy for skewed keys: ``aggs`` maps output name ->
    (fn, col) with fn in sum/count/min/max/avg/collect_list/collect_set.
    Phase 1 aggregates (keys + salt), phase 2 merges per key — the dominant
    key's heavy lifting runs on ``salt`` tasks instead of one. ``avg``
    decomposes into (sum, count); collect_* results have partition-dependent
    ORDER (set semantics / flattened chunks), same caveat as plain Spark."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    for name, (fn, _col) in aggs.items():
        if fn not in _PARTIAL and fn != "avg":
            raise ValueError(f"unsupported agg {fn!r} for {name!r}")

    salted = df.withColumn("_salt", (F.rand() * salt).cast("int"))
    p1, p2 = [], []
    for name, (fn, col) in aggs.items():
        if fn == "avg":
            p1 += [F.sum(col).alias(f"_{name}_s"), F.count(col).alias(f"_{name}_c")]
            p2.append((F.sum(f"_{name}_s") / F.sum(f"_{name}_c")).alias(name))
        else:
            part, merge = _PARTIAL[fn]
            p1.append(part(col).alias(f"_{name}_p"))
            p2.append(merge(f"_{name}_p").alias(name))
    return salted.groupBy(*keys, "_salt").agg(*p1).groupBy(*keys).agg(*p2)


def top_keys(
    df: DataFrame,
    on: str | list[str],
    n: int = 20,
    sample: float | None = None,
    min_count: int = 2,
) -> list:
    """The ``n`` heaviest key values (driver-side list, for ``skewed_keys``).
    ``sample`` counts on a fraction (cheaper at scale; heavy hitters survive
    sampling by definition). Single key -> values; multi -> Rows."""
    keys = [on] if isinstance(on, str) else list(on)
    d = df.sample(sample) if sample else df
    rows = (
        d.groupBy(*keys).count().where(F.col("count") >= min_count)
        .orderBy(F.desc("count")).limit(n).collect()
    )
    if len(keys) == 1:
        return [r[keys[0]] for r in rows]
    return [tuple(r[k] for k in keys) for r in rows]
