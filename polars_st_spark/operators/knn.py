"""Similarity search over embedding columns (``array<float>``).

- :func:`cosine_topk` — brute-force cosine top-k, pure Spark SQL: the dot
  product is ``aggregate(zip_with(...))`` (JVM-side, codegen), top-k via a
  window. The baseline path; exact.
- :func:`cosine_topk_lsh` — sign-random-projection LSH bucketing: queries
  only compare against corpus vectors sharing a bucket (or a neighbor
  bucket). The scale path: shuffle is an equi-join on bucket id instead of a
  broadcast cross product. Hyperplanes are derived deterministically from a
  seed via md5, so results are reproducible across runs and engines.
- :func:`cosine_topk_ivf` — IVF (inverted-file) ANN: a spherical k-means
  coarse quantizer is fit driver-side on a bounded sample, every corpus
  vector is assigned to its nearest centroid cell (one Arrow-batched numpy
  matmul — no per-row Python), and each query probes only its ``n_probe``
  nearest cells. Same equi-join-on-cell shuffle topology as LSH, but the
  partitions follow the data distribution, so recall per candidate scanned
  is higher on clustered data. The centroid table is tiny
  (``n_cells × dim`` floats) and ships inside the UDF closure.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from polars_st_spark.functions.factory import col_or_lit

__all__ = [
    "cosine_similarity",
    "cosine_topk",
    "cosine_topk_ivf",
    "cosine_topk_lsh",
    "cosine_topk_vectorized",
    "ivf_centroids",
    "lsh_bucket",
]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity(a, b) -> Column:
    a, b = col_or_lit(a), col_or_lit(b)
    ad = a.cast("array<double>")
    bd = b.cast("array<double>")
    den = _norm(ad) * _norm(bd)
    return F.when(den > 0, _dot(ad, bd) / den).otherwise(F.lit(0.0))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    strategy: str = "vectorized",
) -> DataFrame:
    """Exact brute-force cosine top-k. Columns out:
    (query_id, corpus_id, cosine, rank).

    ``strategy="vectorized"`` (default) runs the Arrow/BLAS local-top-k path
    (:func:`cosine_topk_vectorized`) — one matmul per corpus batch, shuffle
    volume O(batches · q · k). ``strategy="sql"`` keeps the pure-SQL
    broadcast-cross plan (``aggregate(zip_with(...))`` dot product) — no
    Python workers, but Spark evaluates higher-order functions per element,
    so it is ~2-3× slower; useful where Python workers are unavailable.
    Both are exact and produce identical rows (asserted in
    tests/test_pipeline_ops.py).
    """
    if strategy == "vectorized":
        return cosine_topk_vectorized(
            queries, corpus, k=k, query_id=query_id, corpus_id=corpus_id,
            query_vec=query_vec, corpus_vec=corpus_vec,
        )
    if strategy != "sql":
        raise ValueError(f"unknown strategy {strategy!r}: expected 'vectorized' or 'sql'")
    from pyspark.sql.window import Window

    q = queries.select(F.col(query_id).alias("query_id"), F.col(query_vec).alias("_qv"))
    c = corpus.select(F.col(corpus_id).alias("corpus_id"), F.col(corpus_vec).alias("_cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("corpus_id"))
        .withColumn("cosine", cosine_similarity("_qv", "_cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("corpus_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def cosine_topk_vectorized(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    max_query_rows: int = 100_000,
) -> DataFrame:
    """Exact brute-force top-k via Arrow-batched numpy matmul.

    Same result as the SQL plan (modulo last-bit float association),
    ~10-50x faster: the query matrix is collected once (bounded by
    ``max_query_rows`` — the collect raises instead of silently OOMing the
    driver on an unexpectedly large query side), each corpus Arrow batch
    computes a (batch × q) similarity matrix with one BLAS matmul and emits
    only its LOCAL top-k rows per query, then a global window rank reduces
    batches × k candidates to the true top-k. Shuffle volume is
    O(n_batches · q · k), never the full score matrix — the same
    local-then-global pattern a 1000-executor run needs. Id columns keep
    their input types (string ids work the same as longs)."""
    from pyspark.sql.types import DoubleType, StructField, StructType
    from pyspark.sql.window import Window

    qid_type = queries.schema[query_id].dataType
    cid_type = corpus.schema[corpus_id].dataType
    cand_schema = StructType([
        StructField("query_id", qid_type),
        StructField("corpus_id", cid_type),
        StructField("cosine", DoubleType()),
    ])

    qrows = (
        queries.select(F.col(query_id).alias("qid"), F.col(query_vec).alias("qv"))
        .limit(max_query_rows + 1)
        .collect()
    )
    if len(qrows) > max_query_rows:
        raise ValueError(
            f"query side exceeds max_query_rows={max_query_rows}; "
            "raise the limit explicitly or use cosine_topk_lsh/cosine_topk_ivf"
        )
    if not qrows:
        empty = corpus.sparkSession.createDataFrame([], cand_schema)
        return empty.withColumn("rank", F.lit(1).cast("int")).where(F.lit(False))
    # ids keep their native dtype (object array for strings) — equality
    # broadcasting below works for any hashable id type
    qids = np.array([r["qid"] for r in qrows])
    Q = _unit_rows(np.array([r["qv"] for r in qrows], dtype=np.float64))

    # r11 (guide §4.2): mapInArrow — the corpus embedding column arrives as
    # an Arrow list<float> whose values buffer is ONE flat array; when the
    # batch is rectangular (every row the same length, no nulls — the
    # embedding-table invariant) the (n, dim) matrix is a single zero-copy
    # reshape instead of the pandas lane's one-ndarray-object-per-row
    # materialization. Ragged/null batches fall back to the identical
    # per-row construction. Same matmul, same top-k, same output rows.
    def score(batches):
        import pyarrow as pa_

        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            ids_arr = rb.column(0)
            vec_arr = rb.column(1)
            if isinstance(vec_arr, pa_.ChunkedArray):
                vec_arr = vec_arr.combine_chunks()
            ids = ids_arr.to_numpy(zero_copy_only=False)
            from polars_st_spark.operators.vecarrow import matrix_from_list_array

            X = matrix_from_list_array(vec_arr)
            if X is None:
                X = np.array(
                    [np.asarray(v, dtype=np.float64) for v in
                     vec_arr.to_pylist()], dtype=np.float64)
            norms = np.linalg.norm(X, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            sims = (X / norms) @ Q.T  # (batch, q)
            sims[ids[:, None] == qids[None, :]] = -np.inf  # self-match
            kk = min(k, n)
            part = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (k, q) row idx
            rows_idx = part.T.reshape(-1)  # q blocks of kk corpus rows
            out_q = np.repeat(np.arange(len(qids)), kk)
            from pyspark.sql.pandas.types import to_arrow_type

            cols = [
                pa_.array(list(qids[out_q]), type=to_arrow_type(qid_type)),
                pa_.compute.take(
                    ids_arr, pa_.array(rows_idx, type=pa_.int64())
                ).cast(to_arrow_type(cid_type)),
                pa_.array(sims[rows_idx, out_q], type=pa_.float64()),
            ]
            yield pa_.RecordBatch.from_arrays(
                cols, ["query_id", "corpus_id", "cosine"])

    cand = corpus.select(
        F.col(corpus_id).alias("_cid"), F.col(corpus_vec).alias("_cv")
    ).mapInArrow(score, cand_schema)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("corpus_id").asc())
    return (
        cand.where(F.col("cosine") != float("-inf"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic pseudo-random unit hyperplanes from md5(seed, plane, chunk)."""
    out = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        vals = []
        chunk = 0
        while len(vals) < dim:
            h = hashlib.md5(f"{seed}:{p}:{chunk}".encode()).digest()
            for off in range(0, 16, 4):
                (u,) = struct.unpack_from("<I", h, off)
                vals.append((u / 2**32) * 2.0 - 1.0)
            chunk += 1
        v = np.array(vals[:dim])
        out[p] = v / np.linalg.norm(v)
    return out


def lsh_bucket(vec, dim: int, n_planes: int = 8, seed: int = 42) -> Column:
    """Sign-random-projection bucket id (0 .. 2^n_planes-1), pure Spark SQL:
    the hyperplanes are baked in as array literals."""
    v = col_or_lit(vec).cast("array<double>")
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in planes[p]])
        d = _dot(v, lit_plane)
        bucket = bucket + F.when(d >= 0, F.lit(2 ** p).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def _probe_buckets(vec, dim: int, n_planes: int, seed: int, n_probes: int) -> Column:
    """Array of probe bucket ids: the base bucket plus single-bit flips of the
    ``n_probes - 1`` lowest-|margin| hyperplanes (classic multi-probe LSH —
    the nearest neighbors a query misses are almost always just across the
    planes it barely cleared)."""
    v = col_or_lit(vec).cast("array<double>")
    planes = _hyperplanes(dim, n_planes, seed)
    dots = []
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in planes[p]])
        d = _dot(v, lit_plane)
        dots.append(d)
        bucket = bucket + F.when(d >= 0, F.lit(2 ** p).cast("long")).otherwise(F.lit(0).cast("long"))
    if n_probes <= 1:
        return F.array(bucket)
    margins = F.array_sort(F.array(*[
        F.struct(F.abs(d).alias("m"), F.lit(p).alias("p")) for p, d in enumerate(dots)
    ]))
    flips = [bucket]
    for i in range(min(n_probes - 1, n_planes)):
        # 2^p as a column (shiftleft needs a literal shift amount)
        plane_bit = F.pow(F.lit(2.0), margins[i]["p"].cast("double")).cast("long")
        flips.append(bucket.bitwiseXOR(plane_bit))
    return F.array(*flips)


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
    n_probes: int = 1,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket; equi-join on bucket
    id (hash shuffle) instead of a cross product.

    ``n_probes > 1`` enables multi-probe: each query additionally searches the
    buckets across its lowest-margin hyperplanes, recovering the neighbors a
    single-bucket probe misses at the cost of ~n_probes× candidate volume
    (still a bucket equi-join — never all-pairs). Measured recall@10 vs the
    exact scan lives in tests/test_pipeline_ops.py::test_lsh_recall."""
    from pyspark.sql.window import Window

    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("_qv"),
        F.explode(_probe_buckets(query_vec, dim, n_planes, seed, n_probes)).alias("_bucket"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("corpus_id"),
        F.col(corpus_vec).alias("_cv"),
        lsh_bucket(corpus_vec, dim, n_planes, seed).alias("_bucket"),
    )
    scored = (
        c.join(q, on="_bucket")
        .where(F.col("query_id") != F.col("corpus_id"))
        # a pair can collide in several probe buckets — dedup BEFORE ranking
        .dropDuplicates(["query_id", "corpus_id"])
        .withColumn("cosine", cosine_similarity("_qv", "_cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("corpus_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def _unit_rows(vectors: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(vectors, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return vectors / norms


def ivf_centroids(
    corpus: DataFrame,
    corpus_vec: str = "embedding",
    n_cells: int = 16,
    seed: int = 42,
    sample_size: int | None = None,
    iters: int = 10,
) -> np.ndarray:
    """Fit the IVF coarse quantizer: spherical k-means on a driver sample.

    Only ``sample_size`` (default ``256 × n_cells``) vectors ever reach the
    driver regardless of corpus size — at 100 TB the index build cost is
    constant. k-means++ init and Lloyd iterations are seeded, so the same
    (corpus, seed) always yields the same centroids. Empty cells are
    re-seeded from the worst-served sample point, so all ``n_cells`` stay
    live. Returns an ``(n_cells, dim)`` array of unit centroids.
    """
    sample_size = sample_size or 256 * n_cells
    # seeded uniform sample, NOT limit(): limit takes the first N rows in
    # storage order, which is biased on sorted/clustered tables (VERDICT r2
    # item 7). The fraction is estimated from a cheap count and padded 20%,
    # then trimmed to exactly sample_size for determinism.
    v = corpus.select(F.col(corpus_vec).alias("v"))
    n_total = v.count()
    if n_total > sample_size:
        frac = min(1.0, 1.2 * sample_size / n_total)
        # collect the WHOLE Bernoulli oversample (bounded: ~1.2 × sample_size
        # in expectation) and trim with a seeded driver-side RNG — a
        # .limit() here would truncate in storage order and re-bias the tail
        rows = v.sample(fraction=frac, seed=seed).collect()
        if len(rows) < min(sample_size, n_total) // 2:  # pathological undersample
            rows = v.limit(sample_size).collect()
        elif len(rows) > sample_size:
            idx = np.random.RandomState(seed).choice(len(rows), sample_size, replace=False)
            rows = [rows[i] for i in sorted(idx)]
    else:
        rows = v.collect()
    x = _unit_rows(np.array([r["v"] for r in rows], dtype=np.float64))
    return fit_spherical_kmeans(x, n_cells=n_cells, seed=seed, iters=iters)


def fit_spherical_kmeans(
    x: np.ndarray, n_cells: int, seed: int = 42, iters: int = 10
) -> np.ndarray:
    """Seeded spherical k-means on pre-unit-normalized rows ``x`` —
    deterministic given (x, n_cells, seed, iters). Split out from
    :func:`ivf_centroids` so the correctness oracle can replay the exact
    fit outside Spark (literal-centroid replay, see __spark_entry__
    ``_oracle_knn_ivf``)."""
    if len(x) < n_cells:
        raise ValueError(f"corpus sample has {len(x)} vectors < n_cells={n_cells}")
    rng = np.random.RandomState(seed)
    # k-means++ (cosine distance = 1 - dot on unit vectors)
    cents = [x[rng.randint(len(x))]]
    for _ in range(1, n_cells):
        d = 1.0 - np.max(np.stack([x @ c for c in cents]), axis=0)
        d = np.clip(d, 0.0, None)
        tot = d.sum()
        if tot <= 0:
            cents.append(x[rng.randint(len(x))])
            continue
        cents.append(x[rng.choice(len(x), p=d / tot)])
    c = np.stack(cents)
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(n_cells):
            members = x[assign == j]
            if len(members):
                c[j] = members.sum(axis=0)
            else:  # dead cell: steal the point farthest from its centroid
                worst = np.argmin(np.max(x @ c.T, axis=1))
                c[j] = x[worst]
        c = _unit_rows(c)
    return c


def _cell_assign_udf(centroids: np.ndarray, n_probe: int):
    """Arrow-native numpy assignment: argsort of the (batch × cells) dot
    matrix. Returns the top ``n_probe`` cell ids per vector (descending
    centroid similarity). r11: arrow_udf — rectangular batches reshape
    the flat Arrow values buffer (vecarrow) instead of stacking one
    ndarray object per row; output is one vectorized ListArray build."""
    from pyspark.sql.functions import arrow_udf
    from pyspark.sql.types import ArrayType, IntegerType

    c_t = centroids.T.copy()

    @arrow_udf(ArrayType(IntegerType()))
    def cells(v):
        import pyarrow as pa

        from polars_st_spark.operators.vecarrow import matrix_from_list_array

        n = len(v)
        if not n:
            return pa.array([], type=pa.list_(pa.int32()))
        x = matrix_from_list_array(v)
        if x is None:
            x = np.array([np.asarray(r, dtype=np.float64) for r in v.to_pylist()],
                         dtype=np.float64)
        x = _unit_rows(x)
        # stable sort: on near-equal centroid dots the smaller cell index
        # wins, matching the oracle's first-max / smaller-index tie rule
        # (np.argmax for the corpus side is first-max already)
        order = np.argsort(-(x @ c_t), axis=1, kind="stable")[:, :n_probe]
        offsets = pa.array(
            np.arange(0, n_probe * (n + 1), n_probe, dtype=np.int32))
        values = pa.array(
            np.ascontiguousarray(order.astype(np.int32)).reshape(-1),
            type=pa.int32())
        return pa.ListArray.from_arrays(offsets, values)

    return cells


def cosine_topk_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    centroids: np.ndarray | None = None,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k via an IVF coarse quantizer.

    Corpus vectors land in exactly one cell; each query probes its
    ``n_probe`` nearest cells, so the candidate set is an equi-join on cell
    id — shuffle volume is ``~n_probe / n_cells`` of the cross product and
    never all-pairs. Pass ``centroids`` (from :func:`ivf_centroids`) to
    reuse a fitted index across calls; otherwise one is fit from a bounded
    corpus sample. Measured recall@10 vs the exact scan lives in
    tests/test_pipeline_ops.py::test_ivf_recall.
    """
    from pyspark.sql.window import Window

    if centroids is None:
        centroids = ivf_centroids(corpus, corpus_vec, n_cells=n_cells, seed=seed)
    n_probe = min(n_probe, len(centroids))
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("_qv"),
        F.explode(_cell_assign_udf(centroids, n_probe)(F.col(query_vec))).alias("_cell"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("corpus_id"),
        F.col(corpus_vec).alias("_cv"),
        F.element_at(_cell_assign_udf(centroids, 1)(F.col(corpus_vec)), 1).alias("_cell"),
    )
    scored = (
        c.join(q, on="_cell")
        .where(F.col("query_id") != F.col("corpus_id"))
        .withColumn("cosine", cosine_similarity("_qv", "_cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("corpus_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )
