"""Frame-level grouped spatial aggregations.

Covers the cases plain GROUPED_AGG can't do correctly or efficiently:

- **two-phase union** (treeAggregate pattern): union is associative and
  commutative (reference: expressions.rs:985-999), so a map-side partial
  union per shuffle partition shrinks the shuffle payload from all rows to
  one geometry per (group, partition) before the final merge. This is the
  scale path for huge groups at 100 TB.
- **order-sensitive folds**: ``difference_all`` / ``symmetric_difference_all``
  are left folds in row order (reference: expressions.rs:873-886,932-948);
  Spark shuffles are unordered, so these sort each group by an explicit key
  inside applyInPandas.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_st_spark.geo import setops
from polars_st_spark.geo.wkb import from_ewkb, to_ewkb

__all__ = [
    "union_all_two_phase",
    "difference_all_ordered",
    "symmetric_difference_all_ordered",
]


def union_all_two_phase(df: DataFrame, group_cols: list[str], geom_col: str,
                        result_col: str = "union_geom") -> DataFrame:
    """groupBy(group_cols).agg(union_all) with a TRUE map-side partial:
    phase 1 is a NARROW ``mapInPandas`` pass (no shuffle — GROUPED_AGG
    pandas UDFs have no partial-merge support in Spark, and a
    ``groupBy(group, spark_partition_id())`` first stage would still hash-
    shuffle every row because ``_pid`` carries no co-partitioning
    guarantee to Catalyst; r10 fixed exactly that) that unions each
    group's rows WITHIN each input partition through the identical
    ``union_series`` kernel as ``st_union_all`` (slab fast lane included),
    emitting one partial geometry per (group, partition). Phase 2 shuffles
    only those partials — at 100 TB the shuffle payload drops from all
    rows to ≤ groups × partitions geometries, and a hot group's rows
    never meet in a single reducer."""
    from polars_st_spark.functions.agg import st_union_all, union_series

    gtypes = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in group_cols)
    schema = f"{gtypes}, _partial binary"
    gcols = list(group_cols)

    def partials(batches):
        # one task sees ONE input partition as an iterator of Arrow-sized
        # batches: accumulate each group's values across batches, emit one
        # partial per group at the end (memory: one Series ref per group)
        acc: dict[tuple, list] = {}
        for pdf in batches:
            for key, sub in pdf.groupby(gcols, dropna=False, sort=False):
                k = key if isinstance(key, tuple) else (key,)
                acc.setdefault(k, []).append(sub[geom_col])
        for k, chunks in acc.items():
            s = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            row = {c: [v] for c, v in zip(gcols, k)}
            row["_partial"] = [union_series(s)]
            yield pd.DataFrame(row)

    partial = df.select(*gcols, geom_col).mapInPandas(partials, schema=schema)
    return partial.groupBy(*gcols).agg(st_union_all("_partial").alias(result_col))


def _ordered_fold(fold_fn):
    def run(df: DataFrame, group_cols: list[str], geom_col: str, order_col: str,
            result_col: str) -> DataFrame:
        out_fields = ", ".join(
            f"{c} {df.schema[c].dataType.simpleString()}" for c in group_cols
        )
        schema = f"{out_fields}, {result_col} binary"

        def fold(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(order_col, kind="stable")
            geoms = [None if b is None else from_ewkb(bytes(b)) for b in pdf[geom_col]]
            res = to_ewkb(fold_fn(geoms))
            head = {c: [pdf[c].iloc[0]] for c in group_cols}
            head[result_col] = [res]
            return pd.DataFrame(head)

        return df.groupBy(*group_cols).applyInPandas(fold, schema=schema)

    return run


_diff_fold = _ordered_fold(setops.difference_all)
_symdiff_fold = _ordered_fold(setops.symmetric_difference_all)


def difference_all_ordered(df: DataFrame, group_cols: list[str], geom_col: str,
                           order_col: str, result_col: str = "difference_geom") -> DataFrame:
    """Left-fold difference within each group, rows sorted by ``order_col``."""
    return _diff_fold(df, group_cols, geom_col, order_col, result_col)


def symmetric_difference_all_ordered(df: DataFrame, group_cols: list[str], geom_col: str,
                                     order_col: str, result_col: str = "symdiff_geom") -> DataFrame:
    return _symdiff_fold(df, group_cols, geom_col, order_col, result_col)
