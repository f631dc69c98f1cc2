"""Physical-plan audits: the regressions that silently destroy scale
(duplicated pandas-UDF evaluation, lost broadcast, lost pushdown) assert on
the formatted plan, not on timings (VERDICT r1 plan-audit discipline)."""

from pyspark.sql import functions as F

import polars_st_spark as st
from polars_st_spark.plans import explain_str


def _count(plan: str, token: str) -> int:
    # formatted explain prints each node in the tree AND in the detail list;
    # count detail headers like "(9) ArrowEvalPython" for the true node count
    return sum(
        1 for line in plan.splitlines()
        if line.strip().startswith("(") and token in line and ")" in line.split(token)[0]
    )


def test_predicate_join_single_udf_eval(spark):
    """b2 shape: broadcast pairs + one predicate UDF — exactly one
    ArrowEvalPython, and the join stays a BroadcastNestedLoop/Broadcast
    without a shuffle of the big side."""
    li = spark.range(1000).select(
        F.col("id").alias("l_orderkey"),
        st.st_rectangle(F.col("id") % 7 * 5.0, F.lit(0.0),
                        F.col("id") % 7 * 5.0 + 4.0, F.lit(4.0)).alias("rect"))
    nat = spark.range(5).select(
        F.col("id").alias("n_nationkey"),
        st.st_rectangle(F.col("id") * 20.0, F.lit(0.0),
                        F.col("id") * 20.0 + 18.0, F.lit(18.0)).alias("nrect"))
    pairs = li.join(F.broadcast(nat))
    out = pairs.select(F.sum(st.st_intersects("rect", "nrect").cast("int")))
    plan = explain_str(out)
    assert _count(plan, "ArrowEvalPython") <= 3  # rect + nrect + predicate
    assert "Exchange hashpartitioning" not in plan.split("BroadcastExchange")[0]


def test_grid_sjoin_no_udf_duplication(spark):
    """Grid sjoin: the bounds UDF stack must evaluate once per side, not be
    duplicated through the Generate (explode) — round-1 pitfall #2."""
    from polars_st_spark.operators.sjoin import st_sjoin

    pts = spark.range(100).select(
        F.col("id").alias("pid"),
        st.st_point((F.col("id") % 10).cast("double"),
                    (F.col("id") % 7).cast("double")).alias("geometry"))
    rects = spark.range(4).select(
        F.col("id").alias("rid"),
        st.st_rectangle(F.col("id") * 5.0, F.lit(0.0),
                        F.col("id") * 5.0 + 4.0, F.lit(4.0)).alias("geometry"))
    out = st_sjoin(pts, rects, predicate="within", strategy="grid", cell_size=5.0)
    plan = explain_str(out)
    # two sides x (geometry ctor + bounds) = 4; duplication through Generate
    # showed up as 10 in round 1
    assert _count(plan, "ArrowEvalPython") <= 6


def test_geoparquet_pushdown(spark, tmp_path):
    """bbox-materialized parquet: the window filter must reach the scan."""
    from polars_st_spark.plans import materialize_bbox, push_window_filter

    df = spark.range(100).select(
        F.col("id"),
        st.st_point((F.col("id") % 10).cast("double"),
                    (F.col("id") % 7).cast("double")).alias("geometry"))
    path = str(tmp_path / "bbox_parquet")
    materialize_bbox(df).write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    filtered = push_window_filter(back, (2.0, 2.0, 6.0, 6.0))
    plan = explain_str(filtered)
    assert "PushedFilters" in plan and "bbox_xmin" in plan


def test_dedup_sig_single_pass_with_cache(spark):
    """near_dup_pairs with materialize='cache': the signature UDF appears in
    the plan via InMemoryRelation (one pass), not as two live UDF branches."""
    from polars_st_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [(i, f"doc number {i} with some shared tokens") for i in range(20)],
        ["doc_id", "text"])
    out = D.near_dup_pairs(docs, threshold=0.05, hash_family="md5")
    plan = explain_str(out)
    assert "InMemoryTableScan" in plan
