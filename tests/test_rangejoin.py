"""range_join / interval_overlap_join vs the naive non-equi join."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from polars_st_spark.operators.rangejoin import interval_overlap_join, range_join


@pytest.fixture(scope="module")
def pts_ivals(spark):
    rng = np.random.default_rng(11)
    n, m, keys = 300, 120, 6
    pts = pd.DataFrame(
        {
            "k": rng.integers(0, keys, n),
            "t": rng.integers(-50, 400, n),
            "pid": np.arange(n),
        }
    )
    s = rng.integers(-60, 380, m)
    ivals = pd.DataFrame(
        {
            "k": rng.integers(0, keys, m),
            "s": s,
            "e": s + rng.integers(0, 60, m),
            "iid": np.arange(m),
        }
    )
    return spark.createDataFrame(pts).cache(), spark.createDataFrame(ivals).cache()


def _naive_pairs(left, right, closed):
    lo = F.col("t") >= F.col("s") if closed in ("left", "both") else F.col("t") > F.col("s")
    hi = F.col("t") <= F.col("e") if closed in ("right", "both") else F.col("t") < F.col("e")
    got = left.join(right.withColumnRenamed("k", "k2"), (F.col("k") == F.col("k2")) & lo & hi)
    return set(map(tuple, got.select("pid", "iid").collect()))


@pytest.mark.parametrize("closed", ["left", "right", "both", "neither"])
@pytest.mark.parametrize("bucket", [7, 64, None])
def test_range_join_matches_naive(spark, pts_ivals, closed, bucket):
    pts, ivals = pts_ivals
    expected = _naive_pairs(pts, ivals, closed)
    got = range_join(
        pts, ivals, on="t", right_start="s", right_end="e",
        by="k", closed=closed, bucket=bucket,
    )
    assert set(map(tuple, got.select("pid", "iid").collect())) == expected


def test_range_join_left(spark, pts_ivals):
    pts, ivals = pts_ivals
    out = range_join(
        pts, ivals, on="t", right_start="s", right_end="e",
        by="k", how="left", bucket=16,
    ).toPandas()
    inner = _naive_pairs(pts, ivals, "left")
    matched_pids = {p for p, _ in inner}
    # every left row present; unmatched exactly once with null right side
    assert set(out["pid"]) == set(range(300))
    unmatched = out[out["iid"].isna()]
    assert set(unmatched["pid"]) == set(range(300)) - matched_pids
    assert len(out) == len(inner) + len(unmatched)


def test_range_join_timestamps_microseconds(spark):
    base = dt.datetime(2024, 1, 1)
    us = dt.timedelta(microseconds=1)
    left = spark.createDataFrame([(1, base + 500 * us, 0)], "k int, t timestamp, pid int")
    right = spark.createDataFrame(
        [
            (1, base + 400 * us, base + 600 * us, 0),   # contains
            (1, base + 501 * us, base + 900 * us, 1),   # starts after
        ],
        "k int, s timestamp, e timestamp, iid int",
    )
    got = range_join(left, right, on="t", right_start="s", right_end="e", by="k", bucket=100)
    assert [r["iid"] for r in got.collect()] == [0]


def test_overlap_join_matches_naive(spark, pts_ivals):
    _, ivals = pts_ivals
    rng = np.random.default_rng(13)
    m = 80
    s = rng.integers(-40, 380, m)
    other = pd.DataFrame(
        {
            "k": rng.integers(0, 6, m),
            "s2": s,
            "e2": s + rng.integers(0, 45, m),
            "jid": np.arange(m),
        }
    )
    right = spark.createDataFrame(other).cache()
    for closed, op in (("both", "<="), ("neither", "<")):
        naive = ivals.join(
            right.withColumnRenamed("k", "k2"),
            (F.col("k") == F.col("k2"))
            & F.expr(f"s {op} e2")
            & F.expr(f"s2 {op} e"),
        )
        expected = set(map(tuple, naive.select("iid", "jid").collect()))
        for bucket in (9, None):
            got = interval_overlap_join(
                ivals, right, "s", "e", "s2", "e2", by="k", closed=closed, bucket=bucket
            )
            pairs = [tuple(r) for r in got.select("iid", "jid").collect()]
            assert len(pairs) == len(set(pairs))  # first-bucket dedup exact
            assert set(pairs) == expected


def test_validation(spark, pts_ivals):
    pts, ivals = pts_ivals
    with pytest.raises(ValueError, match="closed"):
        range_join(pts, ivals, on="t", right_start="s", right_end="e", by="k", closed="open")
    with pytest.raises(ValueError, match="how"):
        range_join(pts, ivals, on="t", right_start="s", right_end="e", by="k", how="full")
