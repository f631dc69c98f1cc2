"""k-nearest spatial join (operators/nearest.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

import polars_st_spark as st
from polars_st_spark.operators.nearest import st_sjoin_nearest


@pytest.fixture(scope="module")
def frames(spark):
    rng = np.random.RandomState(5)
    lpts = rng.uniform(0, 100, size=(200, 2))
    rpts = rng.uniform(0, 100, size=(40, 2))
    left = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(lpts)],
        ["lid_val", "x", "y"],
    ).select("lid_val", st.st_point("x", "y").alias("geometry"))
    right = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(rpts)],
        ["rid_val", "x", "y"],
    ).select("rid_val", st.st_point("x", "y").alias("geometry"))
    return left, right, lpts, rpts


def _brute(lpts, rpts, k, max_d=None):
    want = {}
    for i, p in enumerate(lpts):
        d = np.hypot(*(rpts - p).T)
        order = np.argsort(d, kind="stable")
        hits = [(j, d[j]) for j in order if max_d is None or d[j] <= max_d][:k]
        want[i] = hits
    return want


def test_broadcast_matches_brute(frames):
    left, right, lpts, rpts = frames
    out = st_sjoin_nearest(left, right, k=1)
    got = {r["lid_val"]: (r["rid_val"], r["distance"]) for r in out.collect()}
    want = _brute(lpts, rpts, 1)
    assert len(got) == len(lpts)
    for i, hits in want.items():
        j, d = hits[0]
        assert got[i][0] == j
        assert got[i][1] == pytest.approx(d, abs=1e-9)


def test_k3_matches_brute(frames):
    left, right, lpts, rpts = frames
    out = st_sjoin_nearest(left, right, k=3)
    got = {}
    for r in out.collect():
        got.setdefault(r["lid_val"], []).append((r["rid_val"], r["distance"]))
    want = _brute(lpts, rpts, 3)
    for i, hits in want.items():
        gs = sorted(got[i], key=lambda t: t[1])
        assert [g[0] for g in gs] == [h[0] for h in hits]


def test_grid_equals_broadcast(frames):
    left, right, lpts, rpts = frames
    bcast = st_sjoin_nearest(left, right, k=2, max_distance=None)
    grid = st_sjoin_nearest(left, right, k=2, max_distance=200.0)  # covers all
    b = {(r["lid_val"], r["rid_val"]) for r in bcast.collect()}
    g = {(r["lid_val"], r["rid_val"]) for r in grid.collect()}
    assert b == g


def test_max_distance_filters_and_left_join(frames):
    left, right, lpts, rpts = frames
    out = st_sjoin_nearest(left, right, k=1, max_distance=3.0)
    got = {r["lid_val"]: r["distance"] for r in out.collect()}
    want = _brute(lpts, rpts, 1, max_d=3.0)
    assert set(got) == {i for i, h in want.items() if h}
    for i in got:
        assert got[i] == pytest.approx(want[i][0][1], abs=1e-9)
    # how='left': unmatched rows kept with null distance
    lj = st_sjoin_nearest(left, right, k=1, max_distance=3.0, how="left")
    rows = lj.collect()
    assert len({r["lid_val"] for r in rows}) == len(lpts)
    nulls = [r for r in rows if r["distance"] is None]
    assert len(nulls) == len(lpts) - len(got)
    assert all(r["rid_val"] is None for r in nulls)


def test_grid_with_rect_geometries(spark):
    """Non-point left geometries spanning several cells still find every
    neighbor (bbox-cell assignment + pair dedup)."""
    left = spark.createDataFrame([(0, 0.0), (1, 50.0)], ["lid_val", "x0"]).select(
        "lid_val",
        st.st_rectangle(F.col("x0"), F.lit(0.0), F.col("x0") + 25.0, F.lit(8.0))
        .alias("geometry"))
    right = spark.createDataFrame(
        [(i, float(i * 10), 9.0) for i in range(9)], ["rid_val", "x", "y"]
    ).select("rid_val", st.st_point("x", "y").alias("geometry"))
    out = st_sjoin_nearest(left, right, k=2, max_distance=5.0)
    got = {}
    for r in out.collect():
        got.setdefault(r["lid_val"], set()).add(r["rid_val"])
    # rect 0: [0,25]x[0,8]; points at y=9 (distance 1) above x=0,10,20 -> any 2
    assert got[0] <= {0, 1, 2} and len(got[0]) == 2
    assert got[1] <= {5, 6, 7} and len(got[1]) == 2
    dists = {(r["lid_val"], r["rid_val"]): r["distance"] for r in out.collect()}
    for key, dv in dists.items():
        assert dv == pytest.approx(1.0, abs=1e-9)


def test_validation_and_suffix(frames, spark):
    left, right, _, _ = frames
    with pytest.raises(ValueError, match="k must"):
        st_sjoin_nearest(left, right, k=0)
    with pytest.raises(ValueError, match="how"):
        st_sjoin_nearest(left, right, how="full")
    with pytest.raises(ValueError, match="max_distance must"):
        st_sjoin_nearest(left, right, max_distance=-1.0)
    with pytest.raises(ValueError, match="broadcast_limit"):
        st_sjoin_nearest(left, right, broadcast_limit=5)
    out = st_sjoin_nearest(left, right, k=1)
    assert "geometry" in out.columns and "geometry_right" in out.columns
    assert "distance" in out.columns


def test_randomized_grid_matches_brute(spark):
    """Seeded random configs: grid strategy == driver brute force for
    varying densities, caps, and k (the property the cell math must hold)."""
    rng = np.random.RandomState(17)
    for trial in range(4):
        nl, nr = rng.randint(30, 120), rng.randint(5, 40)
        span = rng.choice([10.0, 100.0, 1000.0])
        k = int(rng.randint(1, 4))
        max_d = float(span * rng.uniform(0.02, 0.3))
        lp = rng.uniform(0, span, size=(nl, 2))
        rp = rng.uniform(0, span, size=(nr, 2))
        left = spark.createDataFrame(
            [(i, float(x), float(y)) for i, (x, y) in enumerate(lp)],
            ["lid_val", "x", "y"],
        ).select("lid_val", st.st_point("x", "y").alias("geometry"))
        right = spark.createDataFrame(
            [(i, float(x), float(y)) for i, (x, y) in enumerate(rp)],
            ["rid_val", "x", "y"],
        ).select("rid_val", st.st_point("x", "y").alias("geometry"))
        got = {}
        for r in st_sjoin_nearest(left, right, k=k, max_distance=max_d).collect():
            got.setdefault(r["lid_val"], []).append((r["rid_val"], r["distance"]))
        want = _brute(lp, rp, k, max_d=max_d)
        for i, hits in want.items():
            gs = sorted(got.get(i, []), key=lambda t: t[1])
            # compare by distance multiset (rank ties may pick either id)
            assert [round(g[1], 9) for g in gs] == [round(h[1], 9) for h in hits], (
                trial, i)


def test_null_geometry_left_rows(frames, spark):
    """A NULL left geometry must never receive matches (broadcast path) and
    must land in the unmatched set under how='left' — strategy parity with
    the grid path, which never cells such rows (ADVICE r4)."""
    left, right, _, _ = frames
    nul = spark.createDataFrame([(9999,)], ["lid_val"]).select(
        "lid_val", F.lit(None).cast("binary").alias("geometry"))
    lmix = left.limit(5).unionByName(nul)
    inner = st_sjoin_nearest(lmix, right, k=2)
    assert inner.where(F.col("lid_val") == 9999).count() == 0
    lj = st_sjoin_nearest(lmix, right, k=2, how="left",
                          max_distance=None)
    rows = lj.where(F.col("lid_val") == 9999).collect()
    assert len(rows) == 1
    assert rows[0]["rid_val"] is None and rows[0]["distance"] is None


def test_distance_col_collision_raises(frames):
    left, right, _, _ = frames
    with pytest.raises(ValueError, match="distance_col"):
        st_sjoin_nearest(left.withColumn("distance", F.lit(1.0)), right)


def test_left_join_null_types_match(frames):
    """how='left' null fill must carry the matched-side types (unionByName
    would otherwise coerce or fail on binary/double columns)."""
    left, right, _, _ = frames
    out = st_sjoin_nearest(left, right, k=1, max_distance=0.5, how="left")
    sch = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert sch["geometry_right"] == "binary"
    assert sch["distance"] == "double"
    out.collect()


def test_cell_stats_and_candidate_cap(frames, spark):
    """nearest_cell_stats reports the hot-cell histogram; the
    max_cell_candidates guard raises on a degenerate cell and passes
    under a sufficient cap (VERDICT r4 #5)."""
    from polars_st_spark.operators.nearest import nearest_cell_stats

    left, right, lpts, rpts = frames
    stats = nearest_cell_stats(left, right, max_distance=10.0).collect()
    assert stats and stats[0]["product"] == max(r["product"] for r in stats)
    total = sum(r["n_left"] for r in stats)
    assert all(r["n_left"] >= 1 and r["n_right"] >= 1 for r in stats)
    # coincident pile-up: 50 identical left points x 40 right in one cell
    pile = spark.createDataFrame(
        [(i, 50.0, 50.0) for i in range(50)], ["lid_val", "x", "y"]
    ).select("lid_val", st.st_point("x", "y").alias("geometry"))
    with pytest.raises(ValueError, match="max_cell_candidates"):
        st_sjoin_nearest(pile, right, k=1, max_distance=200.0,
                         max_cell_candidates=100).count()
    out = st_sjoin_nearest(pile, right, k=1, max_distance=200.0,
                           max_cell_candidates=10_000)
    assert out.count() == 50


def test_strtree_equals_cross_strategy(frames, spark):
    """r5 expanding-ring STRtree path == cross-join scoring on distances
    (ties may differ in id, never in distance), k>1, rect right side."""
    left, right, lpts, rpts = frames
    for k in (1, 3):
        a = st_sjoin_nearest(left, right, k=k, strategy="strtree")
        b = st_sjoin_nearest(left, right, k=k, strategy="cross")
        da, db = {}, {}
        for r in a.collect():
            da.setdefault(r["lid_val"], []).append(round(r["distance"], 9))
        for r in b.collect():
            db.setdefault(r["lid_val"], []).append(round(r["distance"], 9))
        assert {k_: sorted(v) for k_, v in da.items()} == \
               {k_: sorted(v) for k_, v in db.items()}
    # rect right geometries (non-point bounds) through the expanding ring
    rects = spark.createDataFrame(
        [(i, float(10 * i), 0.0) for i in range(12)], ["rid_val", "x", "y"]
    ).select("rid_val", st.st_rectangle(
        "x", "y", F.col("x") + 4.0, F.col("y") + 4.0).alias("geometry"))
    got = {r["lid_val"]: r["rid_val"] for r in
           st_sjoin_nearest(left.limit(20), rects, k=1).collect()}
    brute = st_sjoin_nearest(left.limit(20), rects, k=1, strategy="cross")
    want = {r["lid_val"]: r["rid_val"] for r in brute.collect()}
    assert got == want
