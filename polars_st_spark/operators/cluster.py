"""Distributed k-means and semantic deduplication (SemDeDup) over
embedding columns.

K-means is the workhorse behind corpus curation at scale: SemDeDup
(Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication", 2023 — public) clusters document embeddings and
removes near-identical *meanings* (paraphrases, templated boilerplate)
that survive lexical MinHash dedup — cosine-similar pairs are only ever
searched WITHIN a cluster, which is what makes the quadratic step
tractable at 100 TB.

Scale design (mirrors operators/knn.py and quant.py):

- :func:`kmeans_fit` keeps exactly ``k x d`` doubles of driver state.
  Each Lloyd iteration is ONE map-side-combined aggregation: the
  assignment is an Arrow-batched numpy argmin (pandas UDF; the centroid
  matrix ships in the closure), and the centroid update is a plain
  ``groupBy(cluster).agg(sum(element), count)`` — partial sums combine
  map-side, so the shuffle per iteration is ``O(partitions x k x d)``
  regardless of corpus size. No iteration ever collects vectors.
- :func:`kmeans_assign` is the stateless assignment kernel (usable on
  its own for IVF-style routing); distances accumulate SEQUENTIALLY over
  dims so an oracle can replay the identical IEEE double sequence with a
  left-to-right SQL sum (same contract as quant._seq_sq_dists).
- :func:`semantic_dedup` routes vectors to clusters, then runs the
  pairwise cosine scan per cluster via ``applyInPandas`` — one BLAS
  gram matrix per cluster, never a global all-pairs join. Cluster sizes
  are bounded by choosing ``k ~ n / target_cluster_size`` (the SemDeDup
  paper uses 50k clusters for 100M+ docs); a ``max_cluster_rows`` guard
  raises instead of silently densifying a degenerate cluster.

Determinism contract (what the driver-gate oracle relies on): with
fixed-point integer-valued inputs (the gate pre-quantizes embeddings to
``round(x * 2^20)``), every dot product and per-dim sum is an exact
integer below 2^53, so results are bit-identical regardless of
accumulation order; centroid means and cosines are then single IEEE
divisions both engines round identically. With general float inputs the
results are deterministic for a fixed partitioning but carry the usual
last-bit float-association noise (tested against numpy with tolerances).

Reference parity note: the polars-st reference has no clustering
operator — this module is part of the training-data-pipeline mandate
(driver brief), not §2 parity.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    StructField,
    StructType,
)

__all__ = [
    "kmeans_assign",
    "kmeans_fit",
    "kmeans_fit_sample",
    "semantic_dedup",
]


def _assign_batch(x: np.ndarray, cents: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(assignments, distances) for a batch: squared Euclidean accumulated
    sequentially over dims (bit-reproducible vs a left-to-right SQL sum),
    argmin ties to the lowest centroid id (np.argmin first occurrence)."""
    acc = np.zeros((x.shape[0], cents.shape[0]), dtype=np.float64)
    for i in range(x.shape[1]):
        d = x[:, i, None] - cents[None, :, i]
        acc += d * d
    a = np.argmin(acc, axis=1)
    return a, acc[np.arange(len(a)), a]


def kmeans_assign(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "cluster",
    dist_col: str | None = None,
) -> DataFrame:
    """Assign each row to its nearest centroid (squared Euclidean).

    ``centroids`` is a small ``(k, d)`` ndarray shipped in the UDF
    closure (driver state stays ``k x d`` — for SemDeDup-scale k=50k,
    d=768 that is ~300 MB, still broadcast-friendly). Returns ``df`` with
    an int ``out_col`` (and optionally the squared distance in
    ``dist_col``). Arrow-batched pandas UDF; one pass, no shuffle.
    """
    cents = np.asarray(centroids, dtype=np.float64)
    if cents.ndim != 2:
        raise ValueError(f"centroids must be (k, d), got shape {cents.shape}")

    from pyspark.sql.functions import arrow_udf

    from polars_st_spark.functions.factory import spark_dt

    # r11 (guide §4.2): arrow_udf — a rectangular embedding batch becomes
    # the (n, d) matrix via ONE flat-buffer reshape (vecarrow) instead of
    # one ndarray object per row; ragged/null batches take the identical
    # per-row construction. Same _assign_batch kernel, same results.
    # NOTE: no type hints on the inner fn — string annotations resolve in
    # module globals and break with locally-imported pandas (memory:
    # spark-expression-tree-pitfalls item 4).
    @arrow_udf(spark_dt("struct<c: int, d: double>"))
    def _assign(v):
        import pyarrow as pa

        from polars_st_spark.operators.vecarrow import matrix_from_list_array

        if len(v) == 0:
            return pa.StructArray.from_arrays(
                [pa.array([], type=pa.int32()), pa.array([], type=pa.float64())],
                names=["c", "d"])
        x = matrix_from_list_array(v)
        if x is None:
            x = np.array([np.asarray(r, dtype=np.float64) for r in v.to_pylist()],
                         dtype=np.float64)
        a, dist = _assign_batch(x, cents)
        return pa.StructArray.from_arrays(
            [pa.array(a.astype(np.int32), type=pa.int32()),
             pa.array(dist, type=pa.float64())],
            names=["c", "d"])

    tmp = df.withColumn("_ka", _assign(F.col(vec_col)))
    out = tmp.withColumn(out_col, F.col("_ka.c"))
    if dist_col is not None:
        out = out.withColumn(dist_col, F.col("_ka.d"))
    return out.drop("_ka")


def _init_centroids(
    df: DataFrame, k: int, vec_col: str, seed: int, sample_size: int | None
) -> np.ndarray:
    """k-means++ on a bounded seeded driver sample (the quant.pq_codebooks
    contract: constant index-build cost at any corpus size)."""
    x = _sample_matrix(df, k, vec_col, seed, sample_size)
    return _pp_init(x, k, np.random.RandomState(seed))


def kmeans_fit_sample(
    df: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    iters: int = 25,
    seed: int = 42,
    sample_size: int | None = None,
) -> np.ndarray:
    """Constant-cost centroid fit: k-means++ init AND Lloyd iterations on
    ONE bounded seeded driver sample (the quant.pq_codebooks contract).

    This is the 100 TB default: :func:`kmeans_fit` pays one full-corpus
    Arrow pass PER iteration, which is exactly right when the centroids
    must reflect the whole corpus, but SemDeDup-style curation only needs
    cluster routing — centroids from a ~50k-vector sample are
    statistically equivalent (the SemDeDup paper fits on a sample), and
    the fit cost stays constant as the corpus grows. Dead centroids steal
    the worst-served point (same rule as pq_codebooks)."""
    x = _sample_matrix(df, k, vec_col, seed, sample_size)
    rng = np.random.RandomState(seed)
    cents = _pp_init(x, k, rng)
    for _ in range(iters):
        acc = _seq_acc(x, cents)
        assign = np.argmin(acc, axis=1)
        for t in range(k):
            members = x[assign == t]
            if len(members):
                cents[t] = members.mean(axis=0)
            else:
                worst = np.argmax(np.min(_seq_acc(x, cents), axis=1))
                cents[t] = x[worst]
    return cents


def _seq_acc(x: np.ndarray, cents: np.ndarray) -> np.ndarray:
    acc = np.zeros((x.shape[0], cents.shape[0]), dtype=np.float64)
    for i in range(x.shape[1]):
        d = x[:, i, None] - cents[None, :, i]
        acc += d * d
    return acc


def _pp_init(x: np.ndarray, k: int, rng: np.random.RandomState) -> np.ndarray:
    cents = [x[rng.randint(len(x))]]
    for _ in range(1, k):
        dist = np.min(_seq_acc(x, np.stack(cents)), axis=1)
        tot = dist.sum()
        if tot <= 0:
            cents.append(x[rng.randint(len(x))])
        else:
            cents.append(x[rng.choice(len(x), p=dist / tot)])
    return np.stack(cents)


def _sample_matrix(
    df: DataFrame, k: int, vec_col: str, seed: int, sample_size: int | None
) -> np.ndarray:
    sample_size = sample_size or max(50 * k, 1000)
    v = df.select(F.col(vec_col).alias("v"))
    n_total = v.count()
    if n_total > sample_size:
        frac = min(1.0, 1.2 * sample_size / n_total)
        rows = v.sample(fraction=frac, seed=seed).collect()
        if len(rows) < min(sample_size, n_total) // 2:
            rows = v.limit(sample_size).collect()
        elif len(rows) > sample_size:
            idx = np.random.RandomState(seed).choice(len(rows), sample_size, replace=False)
            rows = [rows[i] for i in sorted(idx)]
    else:
        rows = v.collect()
    x = np.array([r["v"] for r in rows], dtype=np.float64)
    if len(x) < k:
        raise ValueError(f"sample has {len(x)} vectors < k={k}")
    return x


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    iters: int = 10,
    seed: int = 42,
    init_centroids: np.ndarray | None = None,
    sample_size: int | None = None,
) -> np.ndarray:
    """Distributed Lloyd's: returns the final ``(k, d)`` centroids.

    Per iteration: Arrow-batched assignment (no shuffle), then ONE
    aggregation ``groupBy(cluster).agg(count, sum(e[0]), ...,
    sum(e[d-1]))`` whose partials combine map-side — shuffle volume is
    ``O(partitions x k x d)`` doubles, independent of corpus size. The
    k-row result is collected (bounded driver state) and divided into
    means in numpy. An empty cluster keeps its previous centroid (the
    standard distributed convention — re-seeding would need an extra
    corpus pass; callers who care re-run with a different seed).

    Determinism: for a fixed partitioning the float partial-sum order is
    fixed; with integer-valued (fixed-point) inputs the sums are exact
    and the result is bit-identical in ANY order — the driver-gate oracle
    uses that mode. ``init_centroids`` overrides the seeded k-means++
    sample init (and makes the whole fit reproducible cross-engine).
    """
    if init_centroids is not None:
        cents = np.asarray(init_centroids, dtype=np.float64).copy()
        if cents.shape[0] != k:
            k = cents.shape[0]
    else:
        cents = _init_centroids(df, k, vec_col, seed, sample_size)
    d = cents.shape[1]

    vec = df.select(F.col(vec_col).alias("_v"))
    for _ in range(iters):
        assigned = kmeans_assign(vec, cents, vec_col="_v", out_col="_c")
        sums = (
            assigned.groupBy("_c")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                *[
                    F.sum(F.element_at(F.col("_v"), i + 1).cast("double")).alias(f"_s{i}")
                    for i in range(d)
                ],
            )
            .collect()
        )
        new = cents.copy()
        for r in sums:
            c = r["_n"]
            new[r["_c"]] = np.array([r[f"_s{i}"] for i in range(d)], dtype=np.float64) / c
        cents = new
    return cents


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    k: int = 8,
    threshold: float = 0.99,
    iters: int = 5,
    seed: int = 42,
    max_cluster_rows: int = 2_000_000,
    keep_vec: bool = False,
    fit: str = "sample",
) -> DataFrame:
    """SemDeDup: flag vectors whose cosine similarity to a LOWER-id
    vector in the same cluster reaches ``threshold``.

    Returns one row per input row: ``(id, cluster, is_dup, dup_of)``
    where ``dup_of`` is the smallest qualifying lower id (NULL for
    keepers) — ``filter(~is_dup)`` is the deduplicated corpus, and the
    greedy keep-lowest-id rule makes the kept set deterministic and
    independent of evaluation order (a row is a dup iff ANY lower-id
    near-neighbor exists, regardless of whether that neighbor is itself
    a dup — the SemDeDup epsilon-ball pruning rule).

    The pairwise scan runs per cluster via ``applyInPandas``: one BLAS
    gram matrix per cluster, so total work is ``sum(|cluster|^2)`` —
    bounded by choosing ``k ~ n / target_cluster_size``, never a global
    all-pairs join. A cluster larger than ``max_cluster_rows`` raises
    (degenerate clustering — re-fit with larger k) instead of silently
    attempting an unboundedly dense gram matrix.

    Pass ``centroids`` to skip the fit (e.g. the gate's fixed-seed
    centroids, or centroids reused across daily corpus snapshots so
    cluster ids stay stable). ``fit="sample"`` (default — the 100 TB
    path) fits centroids on a bounded driver sample; ``fit="full"`` runs
    distributed Lloyd's over the whole corpus.
    """
    if centroids is None:
        if fit == "sample":
            centroids = kmeans_fit_sample(
                df, k=k, vec_col=vec_col, iters=iters, seed=seed
            )
        elif fit == "full":
            centroids = kmeans_fit(
                df, k=k, vec_col=vec_col, iters=iters, seed=seed
            )
        else:
            raise ValueError(f"fit must be 'sample' or 'full', got {fit!r}")
    id_type = df.schema[id_col].dataType

    fields = [
        StructField("id", id_type),
        StructField("cluster", IntegerType()),
        StructField("is_dup", BooleanType()),
        StructField("dup_of", id_type),
    ]
    if keep_vec:
        fields.append(StructField("vec", df.schema[vec_col].dataType))
    out_schema = StructType(fields)

    thr = float(threshold)
    cap = int(max_cluster_rows)

    # r12 (guide §4.2, VERDICT r11 item 5): the gram scan is applyInArrow —
    # the per-cluster (n, d) matrix is ONE flat-buffer reshape of the Arrow
    # list column (operators/vecarrow.py) instead of n per-row ndarray
    # objects through the pandas boundary, and ids/outputs stay in Arrow.
    # The BLAS math is byte-identical to the r11 pandas body (same argsort,
    # same gram/norm/division sequence).
    def scan(key, tbl):
        import pyarrow as pa

        from polars_st_spark.operators.vecarrow import matrix_from_list_array

        n = tbl.num_rows
        kval = key[0].as_py()
        if n > cap:
            raise ValueError(
                f"cluster {kval} has {n} rows > max_cluster_rows={cap}; "
                "re-fit with a larger k (target_cluster_size ~ n/k)"
            )
        id_arr = tbl.column("_id").combine_chunks()
        ids = id_arr.to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        v_arr = tbl.column("_v").combine_chunks()
        x = matrix_from_list_array(v_arr)
        if x is not None:
            x = x[order]
        else:  # ragged/null rows: the r11 per-row path
            rows = v_arr.to_pylist()
            x = np.array([rows[i] for i in order], dtype=np.float64)
        # gram matrix on the RAW vectors, then one product + one division
        # per pair: with fixed-point integer inputs every dot and squared
        # norm is an exact integer < 2^53, so cos is two IEEE ops an SQL
        # oracle reproduces bit-identically (dot / (sqrt(ss_i)*sqrt(ss_j)))
        g = x @ x.T
        norms = np.sqrt(np.einsum("ij,ij->i", x, x))
        norms[norms == 0] = 1.0
        sims = g / np.outer(norms, norms)
        # strictly-lower-triangular mask: candidate j must have a smaller id
        dup_mask = np.tril(sims >= thr, k=-1)
        any_dup = dup_mask.any(axis=1)
        dup_of = np.full(n, None, dtype=object)
        for i in np.nonzero(any_dup)[0]:
            dup_of[i] = ids[np.nonzero(dup_mask[i])[0][0]]
        order_idx = pa.array(order, type=pa.int64())
        cols = [
            id_arr.take(order_idx),
            pa.array(np.full(n, kval, dtype=np.int32), type=pa.int32()),
            pa.array(any_dup, type=pa.bool_()),
            pa.array(dup_of, type=id_arr.type),
        ]
        names = ["id", "cluster", "is_dup", "dup_of"]
        if keep_vec:
            cols.append(v_arr.take(order_idx))
            names.append("vec")
        return pa.table(cols, names=names)

    assigned = kmeans_assign(
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")),
        centroids,
        vec_col="_v",
        out_col="_c",
    )
    return assigned.groupBy("_c").applyInArrow(scan, out_schema)
