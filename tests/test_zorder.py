"""Z-order clustering: Morton key math vs a numpy bit-interleave reference,
clamping, repartition locality, and writer integration."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

import polars_st_spark as st
from polars_st_spark.functions.zorder import (
    st_zorder_key,
    zorder_key_xy,
    zorder_repartition,
)


def _morton_ref(qx: int, qy: int) -> int:
    out = 0
    for i in range(16):
        out |= ((qx >> i) & 1) << (2 * i)
        out |= ((qy >> i) & 1) << (2 * i + 1)
    return out


def test_key_matches_bitwise_reference(spark):
    rng = np.random.default_rng(7)
    xs = rng.uniform(0, 100, 200)
    ys = rng.uniform(0, 100, 200)
    df = spark.createDataFrame(pd.DataFrame({"i": range(200), "x": xs, "y": ys}))
    got = {
        r["i"]: r["k"]
        for r in df.select(
            "i", zorder_key_xy("x", "y", (0.0, 0.0, 100.0, 100.0), bits=16).alias("k")
        ).collect()
    }
    n = 1 << 16
    for i in range(200):
        qx = min(n - 1, max(0, int(np.floor(xs[i] / 100.0 * n))))
        qy = min(n - 1, max(0, int(np.floor(ys[i] / 100.0 * n))))
        assert got[i] == _morton_ref(qx, qy), i


def test_clamping_and_bits(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"i": [0, 1, 2, 3], "x": [-5.0, 0.0, 100.0, 105.0], "y": [50.0] * 4})
    )
    rows = df.select(
        "i", zorder_key_xy("x", "y", (0.0, 0.0, 100.0, 100.0), bits=4).alias("k")
    ).collect()
    got = {r["i"]: r["k"] for r in rows}
    qy = min(15, int(np.floor(50.0 / 100.0 * 16)))
    assert got[0] == got[1] == _morton_ref(0, qy)       # clamp low
    assert got[2] == got[3] == _morton_ref(15, qy)      # clamp high
    with pytest.raises(ValueError):
        zorder_key_xy("x", "y", (0, 0, 1, 1), bits=17)


def test_geometry_key_is_bbox_center(spark):
    df = spark.createDataFrame(pd.DataFrame({"i": [0], "x": [10.0], "y": [20.0]}))
    g = df.select("i", st.st_point("x", "y").alias("geometry"))
    k_geom = g.select(st_zorder_key("geometry", (0.0, 0.0, 100.0, 100.0)).alias("k")).first()["k"]
    k_xy = df.select(zorder_key_xy("x", "y", (0.0, 0.0, 100.0, 100.0)).alias("k")).first()["k"]
    assert k_geom == k_xy


def test_repartition_preserves_rows_and_clusters(spark):
    rng = np.random.default_rng(11)
    pdf = pd.DataFrame(
        {"i": range(400), "x": rng.uniform(0, 100, 400), "y": rng.uniform(0, 100, 400)}
    )
    df = spark.createDataFrame(pdf)
    g = df.select("i", "x", "y", st.st_point("x", "y").alias("geometry"))
    out = zorder_repartition(g, num_partitions=8, extent=(0.0, 0.0, 100.0, 100.0))
    assert sorted(r["i"] for r in out.select("i").collect()) == list(range(400))
    # locality: every partition's bbox should cover far less than the full
    # extent (random assignment would give ~full-extent bboxes everywhere)
    parts = (
        out.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(
            (F.max("x") - F.min("x")).alias("w"),
            (F.max("y") - F.min("y")).alias("h"),
            F.count("*").alias("n"),
        )
        .where(F.col("n") > 10)
        .collect()
    )
    assert parts
    areas = [r["w"] * r["h"] for r in parts]
    assert np.median(areas) < 0.5 * 100 * 100


def test_auto_extent_and_degenerate(spark):
    pdf = pd.DataFrame({"i": range(50), "x": np.linspace(0, 9, 50), "y": np.linspace(0, 9, 50)})
    g = spark.createDataFrame(pdf).select("i", st.st_point("x", "y").alias("geometry"))
    out = zorder_repartition(g, num_partitions=4)  # extent computed
    assert out.count() == 50
    same = spark.createDataFrame(pd.DataFrame({"i": [0, 1]})).select(
        "i", st.st_point(F.lit(1.0), F.lit(1.0)).alias("geometry")
    )
    assert zorder_repartition(same).count() == 2  # degenerate extent: no-op


def test_writer_zorder_roundtrip(spark, tmp_path):
    from polars_st_spark.sources.parquet_io import read_geoparquet, write_geoparquet

    rng = np.random.default_rng(3)
    pdf = pd.DataFrame(
        {"i": range(300), "x": rng.uniform(0, 100, 300), "y": rng.uniform(0, 100, 300)}
    )
    g = spark.createDataFrame(pdf).select("i", "x", "y", st.st_point("x", "y").alias("geometry"))
    path = str(tmp_path / "zp")
    write_geoparquet(g, path, zorder=True, extent=(0.0, 0.0, 100.0, 100.0))
    back = read_geoparquet(spark, path, bbox=(0, 0, 10, 10))
    expect = {int(r["i"]) for _, r in pdf.iterrows() if r["x"] <= 10 and r["y"] <= 10}
    assert {r["i"] for r in back.select("i").collect()} == expect


def test_zorder_key_nd(spark):
    from pyspark.sql import functions as F

    from polars_st_spark.functions.zorder import zorder_key_nd, zorder_key_xy

    df = spark.range(200).select(
        (F.col("id") % 17 * 1.0).alias("x"),
        (F.col("id") % 13 * 1.0).alias("y"),
        (F.col("id") * 11.0 % 97).alias("t"),
    )
    # d=2 must agree with the 2-D key (same quantization, same interleave)
    both = df.select(
        zorder_key_nd(["x", "y"], [(0.0, 17.0), (0.0, 13.0)], bits=16).alias("nd"),
        zorder_key_xy("x", "y", (0.0, 0.0, 17.0, 13.0), bits=16).alias("xy"),
    ).collect()
    assert all(r["nd"] == r["xy"] for r in both)
    # d=3: locality sanity — sorting by the key keeps dimension-near rows near
    rows = df.select(
        "x", "y", "t",
        zorder_key_nd(["x", "y", "t"], [(0.0, 17.0), (0.0, 13.0), (0.0, 97.0)]).alias("z"),
    ).collect()
    assert len({r["z"] for r in rows}) > 150  # keys discriminate
    srt = sorted(rows, key=lambda r: r["z"])
    jumps = [abs(a["x"] - b["x"]) + abs(a["y"] - b["y"]) + abs(a["t"] - b["t"]) / 8
             for a, b in zip(srt, srt[1:])]
    import random
    rnd = rows[:]
    random.Random(1).shuffle(rnd)
    rjumps = [abs(a["x"] - b["x"]) + abs(a["y"] - b["y"]) + abs(a["t"] - b["t"]) / 8
              for a, b in zip(rnd, rnd[1:])]
    assert sum(jumps) < 0.6 * sum(rjumps)  # curve order beats random order
    # plan stays codegen-only
    from polars_st_spark.plans import explain_str
    plan = explain_str(df.select(zorder_key_nd(["x", "y", "t"],
                                               [(0.0, 17.0), (0.0, 13.0), (0.0, 97.0)])))
    assert "ArrowEvalPython" not in plan and "Exchange" not in plan
    import pytest as _pt
    with _pt.raises(ValueError, match="bits"):
        zorder_key_nd(["x", "y", "t"], [(0, 1), (0, 1), (0, 1)], bits=22)
    with _pt.raises(ValueError, match="extent"):
        zorder_key_nd(["x"], [(1.0, 1.0)])
