"""Geohash encode/decode (functions/geohash.py)."""

import pytest
from pyspark.sql import functions as F

from polars_st_spark.functions import geohash as G


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_known_vectors(spark):
    # classic published vectors (Wikipedia / Niemeyer)
    assert _one(spark, G.geohash_xy(F.lit(10.40744), F.lit(57.64911), 11)) == "u4pruydqqvj"
    assert _one(spark, G.geohash_xy(F.lit(-5.603027), F.lit(42.605), 5)) == "ezs42"
    assert _one(spark, G.geohash_xy(F.lit(0.0), F.lit(0.0), 1)) == "s"
    assert _one(spark, G.geohash_xy(F.lit(-179.9999), F.lit(-89.9999), 4)) == "0000"
    # precision prefixes nest
    full = _one(spark, G.geohash_xy(F.lit(2.3522), F.lit(48.8566), 12))
    for p in (1, 4, 8):
        assert _one(spark, G.geohash_xy(F.lit(2.3522), F.lit(48.8566), p)) == full[:p]
    with pytest.raises(ValueError, match="precision"):
        G.geohash_xy(F.lit(0.0), F.lit(0.0), 13)


def test_decode_center_within_cell(spark):
    import random

    rng = random.Random(11)
    pts = [(rng.uniform(-180, 180), rng.uniform(-90, 90)) for _ in range(60)]
    df = spark.createDataFrame(pts, ["lon", "lat"])
    for p, err_lon, err_lat in [(5, 360 / 2**13, 180 / 2**12), (9, 360 / 2**23, 180 / 2**22)]:
        enc = df.select("lon", "lat", G.geohash_xy("lon", "lat", p).alias("gh"))
        lon_c, lat_c = G.geohash_decode_xy("gh", p)
        rows = enc.select("lon", "lat", lon_c.alias("dlon"), lat_c.alias("dlat")).collect()
        for r in rows:
            # center is within half a cell of the original point
            assert abs(r["dlon"] - r["lon"]) <= err_lon / 2 + 1e-12
            assert abs(r["dlat"] - r["lat"]) <= err_lat / 2 + 1e-12


def test_encode_decode_roundtrip_exact(spark):
    """Decoding then re-encoding the center reproduces the hash exactly."""
    import random

    rng = random.Random(3)
    pts = [(rng.uniform(-180, 180), rng.uniform(-90, 90)) for _ in range(40)]
    df = spark.createDataFrame(pts, ["lon", "lat"])
    enc = df.select(G.geohash_xy("lon", "lat", 7).alias("gh"))
    lon_c, lat_c = G.geohash_decode_xy("gh", 7)
    # materialize the decoded centers before re-encoding: nesting decode
    # into encode builds a deep single expression (documented pattern —
    # stage intermediates, as with any wide Column composition)
    centers = enc.select("gh", lon_c.alias("dlon"), lat_c.alias("dlat")).collect()
    df2 = spark.createDataFrame([(r["gh"], r["dlon"], r["dlat"]) for r in centers],
                                ["gh", "dlon", "dlat"])
    re = df2.select("gh", G.geohash_xy("dlon", "dlat", 7).alias("gh2")).collect()
    assert all(r["gh"] == r["gh2"] for r in re)


def test_st_geohash_and_point_from_geohash(spark):
    import polars_st_spark as st

    df = spark.range(1).select(
        st.st_point(F.lit(10.40744), F.lit(57.64911)).alias("pt"))
    assert df.select(G.st_geohash("pt", 11).alias("g")).collect()[0]["g"] == "u4pruydqqvj"
    out = df.select(
        st.st_x(G.st_point_from_geohash(F.lit("u4pruydqqvj"), 11)).alias("x"),
        st.st_y(G.st_point_from_geohash(F.lit("u4pruydqqvj"), 11)).alias("y"),
        st.st_srid(G.st_point_from_geohash(F.lit("u4pruydqqvj"), 11)).alias("srid"),
    ).collect()[0]
    assert out["x"] == pytest.approx(10.40744, abs=1e-4)
    assert out["y"] == pytest.approx(57.64911, abs=1e-4)
    assert out["srid"] == 4326


def test_geohash_xy_plan_no_python(spark):
    from polars_st_spark.plans import explain_str

    df = spark.range(100).select(
        (F.col("id") * 0.1).alias("lon"), (F.col("id") * 0.05).alias("lat"))
    plan = explain_str(df.select(G.geohash_xy("lon", "lat", 9)))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Exchange" not in plan
