"""salted_join / salted_agg / top_keys equivalence with plain Spark."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from polars_st_spark.operators.skew import salted_agg, salted_join, top_keys


@pytest.fixture(scope="module")
def skewed(spark):
    rng = np.random.default_rng(3)
    # key 0 dominates (70%), keys 1..9 share the rest; some null keys
    k = np.where(rng.uniform(size=600) < 0.7, 0, rng.integers(1, 10, 600))
    lpd = pd.DataFrame({"k": k.astype("float"), "lv": np.arange(600)})
    lpd.loc[::97, "k"] = None
    rpd = pd.DataFrame({"k": np.arange(12).astype("float"), "rv": np.arange(12) * 10})
    left = spark.createDataFrame(lpd)
    right = spark.createDataFrame(rpd)
    return left.cache(), right.cache()


def _rows(df, cols=("k", "lv", "rv")):
    have = [c for c in cols if c in df.columns]
    return sorted(
        map(tuple, df.select(*have).fillna(-999).collect())
    )


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_salted_join_matches_plain(spark, skewed, how):
    left, right = skewed
    plain = left.join(right, on="k", how=how)
    salted = salted_join(left, right, on="k", how=how, salt=8)
    assert _rows(salted) == _rows(plain)


def test_salted_join_hybrid_skewed_keys(spark, skewed):
    left, right = skewed
    plain = left.join(right, on="k", how="left")
    hot = top_keys(left, "k", n=1)
    assert hot == [0.0]
    salted = salted_join(left, right, on="k", how="left", salt=8, skewed_keys=hot)
    assert _rows(salted) == _rows(plain)


def test_salted_join_multi_key(spark):
    left = spark.createDataFrame(
        pd.DataFrame({"a": [1, 1, 2, 2, 3], "b": ["x", "y", "x", "x", "z"], "lv": range(5)})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"a": [1, 2, 9], "b": ["x", "x", "q"], "rv": [10, 20, 90]})
    )
    plain = left.join(right, on=["a", "b"], how="inner")
    salted = salted_join(left, right, on=["a", "b"], how="inner", salt=4)
    assert _rows(salted, ("a", "b", "lv", "rv")) == _rows(plain, ("a", "b", "lv", "rv"))


def test_salted_agg_matches_plain(spark, skewed):
    left, _ = skewed
    plain = (
        left.groupBy("k")
        .agg(
            F.sum("lv").alias("s"),
            F.count("lv").alias("c"),
            F.min("lv").alias("mn"),
            F.max("lv").alias("mx"),
            F.avg("lv").alias("av"),
        )
        .fillna(-999)
    )
    got = salted_agg(
        left,
        "k",
        {
            "s": ("sum", "lv"),
            "c": ("count", "lv"),
            "mn": ("min", "lv"),
            "mx": ("max", "lv"),
            "av": ("avg", "lv"),
        },
        salt=8,
    ).fillna(-999)
    p = {r["k"]: r for r in plain.collect()}
    g = {r["k"]: r for r in got.collect()}
    assert set(p) == set(g)
    for k in p:
        for c in ("s", "c", "mn", "mx"):
            assert p[k][c] == g[k][c], (k, c)
        assert abs(p[k]["av"] - g[k]["av"]) < 1e-9


def test_salted_agg_collect(spark, skewed):
    left, _ = skewed
    got = salted_agg(
        left, "k",
        {"vals": ("collect_list", "lv"), "uniq": ("collect_set", "lv")},
        salt=4,
    )
    plain = left.groupBy("k").agg(
        F.collect_list("lv").alias("vals"), F.collect_set("lv").alias("uniq")
    )
    p = {r["k"]: r for r in plain.fillna(-999).collect()}
    g = {r["k"]: r for r in got.fillna(-999).collect()}
    assert set(p) == set(g)
    for k in p:
        assert sorted(p[k]["vals"]) == sorted(g[k]["vals"])
        assert sorted(p[k]["uniq"]) == sorted(g[k]["uniq"])


def test_validation(spark, skewed):
    left, right = skewed
    with pytest.raises(ValueError, match="how"):
        salted_join(left, right, on="k", how="full")
    with pytest.raises(ValueError, match="salt"):
        salted_join(left, right, on="k", salt=1)
    with pytest.raises(ValueError, match="single-column"):
        salted_join(left, right, on=["k", "lv"], skewed_keys=[1])
    with pytest.raises(ValueError, match="unsupported agg"):
        salted_agg(left, "k", {"x": ("median", "lv")})
