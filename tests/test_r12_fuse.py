"""r12 mixed-argument chain collapse (functions/fuse.py): parity between
the fused one-node plan and the planner's two-node plan, and the plan-shape
assertion that fusion actually removes an ArrowEvalPython node.

The reference lane materializes the constructed geometry through a
``withColumn`` first — that rebuilds the Column and drops the fuse tag, so
the reference runs the exact pre-r12 two-boundary plan."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

import polars_st_spark as st
from polars_st_spark.functions import fuse


def _fmt_plan(d) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        d.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def rects(spark):
    df = spark.range(0, 800).select(
        F.col("id"),
        (F.col("id") % 40).cast("double").alias("x0"),
        (F.col("id") % 7).cast("double").alias("y0"),
    )
    df = df.withColumn("x1", F.col("x0") + 2.0).withColumn("y1", F.col("y0") + 2.0)
    df = df.withColumn("rect", st.st_rectangle("x0", "y0", "x1", "y1"))
    # re-reading the column drops the tag: "rect" is plain data below
    df = df.withColumn("rect", F.col("rect")).cache()
    df.count()
    return df


def _assert_parity(fused_df, ref_df, cols):
    a = {r["id"]: tuple(r[c] for c in cols) for r in fused_df.collect()}
    b = {r["id"]: tuple(r[c] for c in cols) for r in ref_df.collect()}
    assert a == b


def test_tag_present_and_survives_only_directly(rects):
    c = st.st_rectangle("x0", "y0", "x1", "y1")
    assert fuse.fuse_info(c) is not None
    assert fuse.fuse_info(c.alias("z")) is None
    assert fuse.fuse_info(F.col("rect")) is None


def test_relate_rectangle_chain(rects):
    other = st.st_rectangle(
        "x1", "y0", F.col("x1") + (F.col("x1") - F.col("x0")), "y1")
    fused = rects.select("id", st.st_relate("rect", other).alias("m"))
    ref = rects.withColumn("_o", other).select(
        "id", st.st_relate("rect", F.col("_o")).alias("m"))
    # formatted explain mentions each node twice (tree + details); the
    # fused plan must carry exactly one ArrowEvalPython fewer than the ref
    assert (_fmt_plan(fused).count("ArrowEvalPython")
            == _fmt_plan(ref).count("ArrowEvalPython") - 2)
    _assert_parity(fused, ref, ["m"])


@pytest.mark.parametrize("fn", [
    st.st_intersects, st.st_touches, st.st_contains, st.st_overlaps,
    st.st_within, st.st_covers, st.st_crosses, st.st_equals,
])
def test_predicates_with_constructed_other_and_nulls(rects, fn):
    x0n = F.when(F.col("id") % 13 == 0, F.lit(None)).otherwise(F.col("x0"))
    other = st.st_rectangle(x0n, "y0", F.col("x0") + 1.0, F.col("y0") + 1.0)
    fused = rects.select("id", fn("rect", other).alias("v"))
    ref = rects.withColumn("_o", other).select(
        "id", fn("rect", F.col("_o")).alias("v"))
    _assert_parity(fused, ref, ["v"])


def test_point_chain_distance_dwithin(rects):
    pt = st.st_point(F.col("x0") + 1.0, F.col("y0") + 1.0)
    fused = rects.select(
        "id",
        st.st_distance("rect", pt).alias("d"),
        st.st_dwithin("rect", pt, 1.5).alias("w"),
    )
    ref = rects.withColumn("_p", pt).select(
        "id",
        st.st_distance("rect", F.col("_p")).alias("d"),
        st.st_dwithin("rect", F.col("_p"), 1.5).alias("w"),
    )
    _assert_parity(fused, ref, ["d", "w"])


def test_translate_and_centroid_chains(rects):
    fused = rects.select(
        "id",
        st.st_relate("rect", st.st_translate("rect", 2.0, 0.0)).alias("m"),
        st.st_contains_properly("rect", st.st_centroid("rect")).alias("c"),
    )
    ref = (
        rects.withColumn("_t", st.st_translate("rect", 2.0, 0.0))
        .withColumn("_c", st.st_centroid("rect"))
        .select(
            "id",
            st.st_relate("rect", F.col("_t")).alias("m"),
            st.st_contains_properly("rect", F.col("_c")).alias("c"),
        )
    )
    _assert_parity(fused, ref, ["m", "c"])


def test_relate_pattern_chain(rects):
    other = st.st_rectangle("x1", "y0", F.col("x1") + 2.0, "y1")
    fused = rects.select(
        "id", st.st_relate_pattern("rect", other, "T*T***T**").alias("p"))
    ref = rects.withColumn("_o", other).select(
        "id", st.st_relate_pattern("rect", F.col("_o"), "T*T***T**").alias("p"))
    _assert_parity(fused, ref, ["p"])


def test_fuse_cap_falls_back(rects):
    # two 4-column constructors on both sides exceed MAX_FUSE_COLS=8 only
    # when nested; a rect(4)+rect(4) pair sits exactly at the cap and
    # fuses, while rect(4) nested in translate-of-rect chains stays tagged
    # and both shapes stay correct end to end
    ra = st.st_rectangle("x0", "y0", "x1", "y1")
    rb = st.st_rectangle("x0", "y0", F.col("x1") + 1.0, "y1")
    from polars_st_spark.functions.predicate import _relate_pair_udf

    at_cap = fuse.apply_pair(_relate_pair_udf(), "string", ra, rb)
    assert at_cap is not None  # 4 + 4 == MAX_FUSE_COLS fuses
    over = fuse.apply_pair(
        _relate_pair_udf(), "string", st.st_translate(ra, 1.0, 0.0), rb)
    # translate(rect) flattens to the rect's 4 inputs, still at the cap
    assert over is not None
    # deep nesting keeps the tag and the public API stays correct
    deep = st.st_rectangle("x0", "y0", "x1", "y1")
    for _ in range(3):
        deep = st.st_translate(deep, 0.0, 0.0)
    assert fuse.fuse_info(deep) is not None
    out = rects.select("id", st.st_relate(deep, "rect").alias("m"))
    assert out.count() == 800
