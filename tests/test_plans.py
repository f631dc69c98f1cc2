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


def test_hygiene_signals_no_shuffle(spark):
    """Per-doc hygiene signals (incl. the top-n-gram mode) are one codegen
    projection: NO Exchange, NO Python workers anywhere in the plan."""
    from polars_st_spark.operators import filters as H

    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w"), (F.col("id") % 9).cast("string"), F.lit(" x y z")).alias("text"),
    )
    plan = explain_str(H.repetition_signals(docs))
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_decontaminate_broadcast_semi_join(spark):
    """Decontamination must be a map-side broadcast semi-join: the corpus
    n-gram side sees no hash-partition Exchange before the join."""
    from polars_st_spark.operators import filters as H

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.lit("a b c d e f g h i j k l").alias("text"))
    bench = spark.range(3).select(
        F.col("id").alias("doc_id"), F.lit("a b c d e f g h").alias("text"))
    plan = explain_str(H.decontaminate(docs, bench, n=8, mode="tag"))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    # the big side reaches the semi-join without a hash repartition
    semi_seg = plan.split("LeftSemi")[0]
    assert "Exchange hashpartitioning" not in semi_seg.split("BroadcastExchange")[0]


def test_line_dedup_single_line_shuffle(spark):
    """line_dedup shuffles once on the line hash and once to reassemble
    docs — no joins against corpus text, no extra exchanges."""
    from polars_st_spark.operators import filters as H

    docs = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("l"), (F.col("id") % 5).cast("string"), F.lit("\nu"),
                 F.col("id").cast("string")).alias("text"))
    plan = explain_str(H.line_dedup(docs))
    # window on line-hash + groupBy doc + rejoin to carry non-text cols:
    # <= 4 hash exchanges total (2 would be the no-extra-columns floor)
    assert _count(plan, "Exchange") <= 4


def test_pq_encode_single_arrow_pass(spark):
    """pq_encode is one ArrowEvalPython over the corpus — the codebook is
    closure-shipped, never joined."""
    import numpy as np

    from polars_st_spark.operators import quant as Q

    emb = spark.range(64).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") % (i + 2)).cast("double") for i in range(16)]).alias("embedding"))
    books = np.arange(2 * 4 * 8, dtype=np.float64).reshape(2, 4, 8) / 64.0
    plan = explain_str(Q.pq_encode(emb, books))
    assert _count(plan, "ArrowEvalPython") == 1
    assert "Exchange" not in plan


def test_bucketed_join_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key (same bucket count) join with
    ZERO Exchange — the pay-once co-location contract of write_bucketed."""
    from polars_st_spark.plans import write_bucketed

    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(5000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
        b = spark.range(5000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
        write_bucketed(a, "bk_a", ["k"], n_buckets=8)
        write_bucketed(b, "bk_b", ["k"], n_buckets=8)
        joined = spark.table("bk_a").join(spark.table("bk_b"), on="k")
        plan = explain_str(joined)
        assert "SortMergeJoin" in plan
        assert _count(plan, "Exchange") == 0, plan
        assert joined.count() == 5000
        # and a groupBy on the bucket key needs no exchange either
        agg_plan = explain_str(spark.table("bk_a").groupBy("k").agg(F.sum("va")))
        assert _count(agg_plan, "Exchange") == 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")


def test_url_and_script_ops_pure_codegen(spark):
    """URL curation + script detection are single codegen projections:
    no Exchange, no Python workers."""
    from polars_st_spark.operators import textops as T
    from polars_st_spark.operators import weburl as W

    df = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("https://a"), F.col("id").cast("string"),
                 F.lit(".example.co.uk/p?utm_a=1&id=2")).alias("url"),
        F.lit("some text").alias("text"),
    )
    out = df.select(
        W.registered_domain(W.url_host("url")).alias("dom"),
        W.url_strip_tracking("url").alias("clean"),
        T.dominant_script("text").alias("script"),
        *[v.alias(k) for k, v in T.script_fracs("text").items()],
    )
    plan = explain_str(out)
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_ngram_coverage_partial_aggregation(spark):
    """The shingle-ownership min-agg combines map-side: the plan shows a
    partial HashAggregate before its Exchange (hot boilerplate shingles
    cost O(partitions) at the reducer, not O(occurrences))."""
    from polars_st_spark.operators.dedup import ngram_coverage

    docs = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.lit("one two three four five six seven").alias("text"),
    )
    plan = explain_str(ngram_coverage(docs))
    assert "partial_min" in plan or "partial" in plan.lower()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_group_cap_single_shuffle(spark):
    """group_cap is one hash Exchange (the window partition) and zero
    Python workers."""
    from polars_st_spark.operators.sampling import group_cap

    df = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 5).cast("string").alias("dom"))
    plan = explain_str(group_cap(df, "dom", "doc_id", 3))
    assert plan.count("Exchange") <= 2  # hashpartitioning (+AQE coalesce read)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
