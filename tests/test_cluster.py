"""Distributed k-means + SemDeDup (operators/cluster.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from polars_st_spark.operators import cluster as C


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def xmat(emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], x[order]


def _numpy_lloyd(x, cents, iters):
    cents = cents.copy()
    for _ in range(iters):
        acc = np.zeros((len(x), len(cents)))
        for i in range(x.shape[1]):
            d = x[:, i, None] - cents[None, :, i]
            acc += d * d
        a = np.argmin(acc, axis=1)
        for t in range(len(cents)):
            if (a == t).any():
                cents[t] = x[a == t].mean(axis=0)
    return cents


def test_assign_matches_numpy(emb, xmat):
    ids, x = xmat
    cents = x[:5]
    got = {
        r["vec_id"]: (r["cluster"], r["dist"])
        for r in C.kmeans_assign(emb, cents, out_col="cluster", dist_col="dist").collect()
    }
    acc = np.zeros((len(x), 5))
    for i in range(x.shape[1]):
        d = x[:, i, None] - cents[None, :, i]
        acc += d * d
    want = np.argmin(acc, axis=1)
    for j, vid in enumerate(ids):
        assert got[vid][0] == want[j]
        assert got[vid][1] == pytest.approx(acc[j, want[j]], rel=1e-12)


def test_fit_matches_numpy_lloyd(emb, xmat):
    """Distributed Lloyd's (partial-sum groupBy update) == driver numpy
    Lloyd's from the same init, up to float-association noise."""
    ids, x = xmat
    init = x[[3, 77, 201, 404]]
    got = C.kmeans_fit(emb, vec_col="embedding", iters=4, init_centroids=init)
    want = _numpy_lloyd(x, init, 4)
    assert np.allclose(got, want, rtol=1e-9, atol=1e-12)


def test_fit_seeded_init_deterministic(emb):
    a = C.kmeans_fit(emb, k=4, iters=2, seed=11)
    b = C.kmeans_fit(emb, k=4, iters=2, seed=11)
    assert np.array_equal(a, b)


def test_fit_empty_cluster_keeps_centroid(spark):
    df = spark.createDataFrame(
        [(i, [float(i % 2), 0.0]) for i in range(10)], "id long, v array<double>"
    )
    far = np.array([[0.0, 0.0], [1.0, 0.0], [100.0, 100.0]])
    out = C.kmeans_fit(df, vec_col="v", iters=1, init_centroids=far)
    assert np.array_equal(out[2], far[2])  # nobody assigned to the far centroid


def test_semantic_dedup_matches_brute_force(emb, xmat, spark):
    """Within-cluster greedy lowest-id dedup == numpy brute force over the
    same clustering (SemDeDup misses cross-cluster pairs BY DESIGN, so the
    reference uses the identical cluster routing). Three exact duplicates
    are planted (the synthetic corpus has no cosine>=0.6 pairs of its own)."""
    ids0, x0 = xmat
    planted = spark.createDataFrame(
        [(int(vid) + 10_000, [float(v) for v in x0[j]], 0)
         for j, vid in enumerate(ids0[:3])],
        "vec_id long, embedding array<float>, label int",
    )
    corpus = emb.select("vec_id", "embedding", "label").unionByName(planted)
    ids = np.concatenate([ids0, ids0[:3] + 10_000])
    x = np.vstack([x0, np.array(
        np.array(x0[:3], dtype=np.float32), dtype=np.float64)])
    cents = C.kmeans_fit(emb, k=4, iters=3, seed=5)
    out = C.semantic_dedup(
        corpus, id_col="vec_id", centroids=cents, threshold=0.6
    ).collect()
    got = {r["id"]: (r["cluster"], r["is_dup"], r["dup_of"]) for r in out}
    assert len(got) == len(ids)

    acc = np.zeros((len(x), len(cents)))
    for i in range(x.shape[1]):
        d = x[:, i, None] - cents[None, :, i]
        acc += d * d
    a = np.argmin(acc, axis=1)
    norms = np.sqrt((x * x).sum(axis=1))
    norms[norms == 0] = 1.0
    n_dups = 0
    for j, vid in enumerate(ids):
        assert got[vid][0] == a[j]
        lower = np.nonzero((a == a[j]) & (ids < vid))[0]
        sims = (x[lower] @ x[j]) / (norms[lower] * norms[j])
        hit = lower[sims >= 0.6]
        if len(hit):
            n_dups += 1
            assert got[vid][1] is True
            assert got[vid][2] == ids[hit[0]]
        else:
            assert got[vid][1] is False
            assert got[vid][2] is None
    assert n_dups > 0  # the synthetic corpus plants near-dups


def test_semantic_dedup_string_ids(spark):
    df = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [1.0, 1e-9]), ("c", [0.0, 1.0])],
        "doc string, v array<double>",
    )
    out = {
        r["id"]: (r["is_dup"], r["dup_of"])
        for r in C.semantic_dedup(
            df, id_col="doc", vec_col="v", centroids=np.array([[0.5, 0.5]]), threshold=0.999
        ).collect()
    }
    assert out["a"] == (False, None)
    assert out["b"] == (True, "a")
    assert out["c"] == (False, None)


def test_semantic_dedup_cluster_cap(emb):
    with pytest.raises(Exception, match="max_cluster_rows"):
        C.semantic_dedup(
            emb, centroids=np.zeros((1, 64)), threshold=0.99, max_cluster_rows=10
        ).collect()


def test_fit_sample_routes_like_full_on_small_input(emb, xmat):
    """On an input smaller than the sample bound the sample fit sees the
    whole corpus, so it equals a driver numpy Lloyd's from the same
    k-means++ init; and the fit is seed-deterministic."""
    ids, x = xmat
    a = C.kmeans_fit_sample(emb, k=4, iters=3, seed=9)
    b = C.kmeans_fit_sample(emb, k=4, iters=3, seed=9)
    assert np.array_equal(a, b)
    assert a.shape == (4, 64)
    # dedup with fit="sample" end-to-end (no explicit centroids)
    out = C.semantic_dedup(emb, id_col="vec_id", k=4, threshold=0.6,
                           iters=3, seed=9).collect()
    assert len(out) == len(ids)
    with pytest.raises(ValueError, match="fit must be"):
        C.semantic_dedup(emb, id_col="vec_id", fit="bogus").collect()
