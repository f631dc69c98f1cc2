"""as_of_join vs pandas.merge_asof (the de-facto reference semantics).

Randomized cases over every (direction, allow_exact_matches, tolerance)
combination, plus a microsecond-precision timestamp case locking the
unix_micros ordering (CAST(ts AS LONG) is seconds in Spark — the original
bug this suite guards against).
"""

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from polars_st_spark.operators.asof import as_of_join


def _random_case(seed, n_left=200, n_right=150, n_keys=7):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_left),
            "t": rng.integers(0, 500, n_left),
            "lv": np.round(rng.normal(size=n_left), 6),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_right),
            "t": rng.integers(0, 500, n_right),
            "rv": np.round(rng.normal(size=n_right), 6),
        }
    )
    # Dedupe right on (k, t): merge_asof keeps the last duplicate, Spark keeps
    # an arbitrary one — dedupe makes the expectation well-defined.
    right = right.sort_values(["k", "t"]).drop_duplicates(["k", "t"], keep="last")
    left["lid"] = np.arange(len(left))
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("allow_exact", [True, False])
@pytest.mark.parametrize("tolerance", [None, 40])
def test_matches_pandas(spark, direction, allow_exact, tolerance):
    left, right = _random_case(seed=hash((direction, allow_exact, tolerance)) % 2**31)
    expected = pd.merge_asof(
        left.sort_values("t", kind="stable"),
        right.sort_values("t", kind="stable"),
        on="t",
        by="k",
        direction=direction,
        allow_exact_matches=allow_exact,
        tolerance=tolerance,
    ).sort_values("lid")

    out = as_of_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="t",
        by="k",
        direction=direction,
        allow_exact_matches=allow_exact,
        tolerance=tolerance,
    )
    got = out.toPandas().sort_values("lid")

    assert list(got["lid"]) == list(expected["lid"])
    np.testing.assert_allclose(
        got["rv"].to_numpy(dtype=float),
        expected["rv"].to_numpy(dtype=float),
        rtol=0,
        atol=0,
        equal_nan=True,
    )


def test_microsecond_timestamps(spark):
    """Two right rows inside the same second: second-granularity ordering
    (the CAST AS LONG bug) would tie them; microsecond ordering must not."""
    base = dt.datetime(2024, 1, 1, 0, 0, 1)
    us = dt.timedelta(microseconds=1)
    left = spark.createDataFrame(
        [(1, base + 123456 * us)], "k int, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, base + 123455 * us, 10.0),  # 1 us before the left row
            (1, base + 123457 * us, 20.0),  # 1 us after
        ],
        "k int, ts timestamp, v double",
    )
    back = as_of_join(left, right, on="ts", by="k", direction="backward").collect()
    assert back[0]["v"] == 10.0
    fwd = as_of_join(left, right, on="ts", by="k", direction="forward").collect()
    assert fwd[0]["v"] == 20.0
    # tolerance is in microseconds for timestamps
    far = as_of_join(
        left, right, on="ts", by="k", direction="backward", tolerance=0
    ).collect()
    assert far[0]["v"] is None


def test_column_suffix_and_left_preserved(spark):
    left = spark.createDataFrame([(1, 10, "a"), (1, 5, "b"), (2, 7, "c")], "k int, t long, v string")
    right = spark.createDataFrame([(1, 8, "x")], "k int, t long, v string")
    out = as_of_join(left, right, on="t", by="k").toPandas().sort_values("t")
    assert set(out.columns) == {"k", "t", "v", "t_r", "v_r"}
    assert len(out) == 3  # every left row kept
    by_t = out.set_index("t")
    assert by_t.loc[10, "v_r"] == "x"
    assert pd.isna(by_t.loc[5, "v_r"])  # no right row at or before t=5
    assert pd.isna(by_t.loc[7, "v_r"])  # key 2 has no right rows


def test_requires_by(spark):
    left = spark.createDataFrame([(1, 1)], "k int, t long")
    with pytest.raises(ValueError, match="requires"):
        as_of_join(left, left, on="t", by=None)
