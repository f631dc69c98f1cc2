"""Vector quantization for embedding columns: product quantization (PQ)
and int8 scalar quantization.

PQ (Jégou, Douze & Schmid, "Product Quantization for Nearest Neighbor
Search", TPAMI 2011 — public) splits a d-dim vector into ``m`` subspaces
and stores, per subspace, the id of the nearest of ``k`` learned
centroids: a 64-dim float32 vector (256 B) compresses to ``m`` small ints
(8 B at m=8, k≤256) — the standard way a 100 TB embedding corpus fits in
executor memory for scanning. Search uses asymmetric distance computation
(ADC): each query precomputes an ``(m, k)`` lookup table of subspace
distances, and a corpus vector's approximate distance is ``m`` table
lookups — no float vector ever touched at scan time.

Scale design mirrors operators/knn.py:

- :func:`pq_codebooks` fits on a bounded seeded driver sample (constant
  cost at any corpus size; same contract as ``ivf_centroids``).
- :func:`pq_encode` assigns codes with one Arrow-batched numpy pass —
  the codebook (m·k·dsub floats) ships in the UDF closure.
- :func:`pq_topk` scans codes batch-at-a-time, emits only local top-k
  per query, then a global window rank — shuffle volume
  O(batches · q · k), never the score matrix (the
  ``cosine_topk_vectorized`` pattern).

Determinism contract: distance accumulation is sequential over subspace
dims (``acc += (x_i - c_i)²`` in dim order), so the oracle can replay
the identical IEEE double sequence with a left-to-right SQL list sum;
argmin ties break to the lowest centroid id on both sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "int8_dequantize",
    "int8_quantize",
    "pq_codebooks",
    "pq_encode",
    "pq_topk",
    "pq_topk_ivf",
]


def _seq_sq_dists(x: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """(batch, k) squared distances accumulated sequentially over dims —
    bit-reproducible against a left-to-right SQL sum (np.sum's pairwise
    reduction would round differently on near-ties)."""
    acc = np.zeros((x.shape[0], cents.shape[0]), dtype=np.float64)
    for i in range(x.shape[1]):
        d = x[:, i, None] - cents[None, :, i]
        acc += d * d
    return acc


def pq_codebooks(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    seed: int = 42,
    sample_size: int | None = None,
    iters: int = 10,
) -> np.ndarray:
    """Fit PQ codebooks: independent k-means per subspace on ONE bounded
    seeded driver sample (shared across subspaces — one corpus pass).
    Returns ``(m, k, d // m)`` float64 centroids. ``d`` must divide by
    ``m``. Same bounded-sample contract as ``knn.ivf_centroids`` (the
    seeded oversample-then-trim below mirrors it): the index build cost
    is constant in corpus size."""
    sample_size = sample_size or 256 * k
    v = corpus.select(F.col(vec_col).alias("v"))
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
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    if len(x) < k:
        raise ValueError(f"sample has {len(x)} vectors < k={k}")
    rng = np.random.RandomState(seed)
    books = np.empty((m, k, dsub), dtype=np.float64)
    for j in range(m):
        xs = x[:, j * dsub : (j + 1) * dsub]
        # k-means++ init, Lloyd iterations (squared Euclidean)
        cents = [xs[rng.randint(len(xs))]]
        for _ in range(1, k):
            dist = np.min(_seq_sq_dists(xs, np.stack(cents)), axis=1)
            tot = dist.sum()
            if tot <= 0:
                cents.append(xs[rng.randint(len(xs))])
                continue
            cents.append(xs[rng.choice(len(xs), p=dist / tot)])
        c = np.stack(cents)
        for _ in range(iters):
            assign = np.argmin(_seq_sq_dists(xs, c), axis=1)
            for t in range(k):
                members = xs[assign == t]
                if len(members):
                    c[t] = members.mean(axis=0)
                else:  # dead centroid: steal the worst-served point
                    worst = np.argmax(np.min(_seq_sq_dists(xs, c), axis=1))
                    c[t] = xs[worst]
        books[j] = c
    return books


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """Append ``out_col: array<int>`` of length ``m`` — per-subspace
    nearest-centroid ids. One Arrow-batched numpy pass (vectorized over
    the batch and the codebook; sequential over dims for oracle-exact
    IEEE rounding); ties take the lowest centroid id (np.argmin)."""
    mm, kk, dsub = codebooks.shape
    books = codebooks.copy()

    from pyspark.sql.functions import arrow_udf

    @arrow_udf("array<int>")
    def enc(a):
        # r11: zero-copy in (one reshape of the Arrow list buffer instead
        # of np.stack over per-row ndarray objects) and zero-object out
        # (arange offsets over the flat code matrix); same argmin kernel,
        # parity oracle-gated by pq_suite
        import pyarrow as pa

        from polars_st_spark.operators.vecarrow import matrix_from_list_array

        x = matrix_from_list_array(a)
        if x is None:  # ragged/null/empty batch: the old per-row path
            s = a.to_pandas()
            if not len(s):
                return pa.array([], type=pa.list_(pa.int32()))
            x = np.stack(s.to_numpy()).astype(np.float64)
        n = len(x)
        codes = np.empty((n, mm), dtype=np.int32)
        for j in range(mm):
            xs = x[:, j * dsub : (j + 1) * dsub]
            codes[:, j] = np.argmin(_seq_sq_dists(xs, books[j]), axis=1)
        offs = pa.array(
            np.arange(0, (n + 1) * mm, mm, dtype=np.int32).tolist(),
            type=pa.int32())
        return pa.ListArray.from_arrays(
            offs, pa.array(codes.ravel(), type=pa.int32()))

    return df.withColumn(out_col, enc(F.col(vec_col)))


def pq_topk(
    queries: DataFrame,
    corpus_codes: DataFrame,
    codebooks: np.ndarray,
    k: int = 10,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    code_col: str = "pq_code",
    max_query_rows: int = 100_000,
) -> DataFrame:
    """Approximate top-k nearest neighbors by PQ asymmetric distance:
    (query_id, corpus_id, adc_dist, rank), rank 1 = closest, ties on the
    rounded distance break by corpus id.

    Each corpus Arrow batch builds the (q, m, k_cent) query lookup tables
    once (closure-shipped codebook), gathers per-subspace distances for
    its codes, and emits only its LOCAL top-k per query; a global window
    rank reduces batches × k to the final top-k — identical shuffle shape
    to ``cosine_topk_vectorized``. Measured recall@10 vs the exact scan
    lives in tests/test_quant.py."""
    from pyspark.sql.types import DoubleType, StructField, StructType
    from pyspark.sql.window import Window

    mm, kcent, dsub = codebooks.shape
    qid_type = queries.schema[query_id].dataType
    cid_type = corpus_codes.schema[corpus_id].dataType
    cand_schema = StructType([
        StructField("query_id", qid_type),
        StructField("corpus_id", cid_type),
        StructField("adc_dist", DoubleType()),
    ])
    qrows = (
        queries.select(F.col(query_id).alias("qid"), F.col(query_vec).alias("qv"))
        .limit(max_query_rows + 1)
        .collect()
    )
    if len(qrows) > max_query_rows:
        raise ValueError(
            f"query side exceeds max_query_rows={max_query_rows}; raise the "
            "limit explicitly or pre-filter the query side"
        )
    if not qrows:
        empty = corpus_codes.sparkSession.createDataFrame([], cand_schema)
        return empty.withColumn("rank", F.lit(1).cast("int")).where(F.lit(False))
    qids = np.array([r["qid"] for r in qrows])
    Q = np.array([r["qv"] for r in qrows], dtype=np.float64)
    books = codebooks.copy()
    # (q, m, k_cent) ADC lookup tables — built once, shipped to every task
    luts = np.empty((len(Q), mm, kcent), dtype=np.float64)
    for j in range(mm):
        luts[:, j, :] = _seq_sq_dists(Q[:, j * dsub : (j + 1) * dsub], books[j])

    topk = k

    # r12 (guide §4.2, VERDICT r11 item 6): mapInArrow — the (b, m) code
    # matrix is one flat-buffer reshape (vecarrow) instead of np.stack over
    # b per-row ndarray objects, ids/outputs stay Arrow. Math unchanged;
    # batch boundaries are the same Arrow batches mapInPandas saw, so the
    # local-top-k grouping (and therefore every emitted candidate) is
    # identical.
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_type

    qid_pa = to_arrow_type(qid_type)
    cid_pa = to_arrow_type(cid_type)

    def score(batches):
        from polars_st_spark.operators.vecarrow import matrix_from_list_array

        for batch in batches:
            if not batch.num_rows:
                continue
            cid_arr = batch.column(0)
            ids = cid_arr.to_numpy(zero_copy_only=False)
            codes = matrix_from_list_array(batch.column(1), dtype=np.int64)
            if codes is None:  # ragged/null codes: per-row fallback
                codes = np.stack(
                    [np.asarray(r, dtype=np.int64)
                     for r in batch.column(1).to_pylist()])
            # dists[b, q] = sum_j luts[q, j, codes[b, j]]
            dists = np.zeros((len(ids), len(qids)), dtype=np.float64)
            for j in range(mm):
                dists += luts[:, j, :][:, codes[:, j]].T  # (b, q)
            mask = ids[:, None] == qids[None, :]
            dists[mask] = np.inf  # self-match
            kk = min(topk, len(ids))
            part = np.argpartition(dists, kk - 1, axis=0)[:kk]
            out_q, out_c, out_d = [], [], []
            for qi in range(len(qids)):
                rows = part[:, qi]
                out_q.extend([qids[qi]] * len(rows))
                out_c.extend(ids[rows])
                out_d.extend(dists[rows, qi])
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_q, type=qid_pa),
                 pa.array(out_c, type=cid_pa),
                 pa.array(np.asarray(out_d, dtype=np.float64),
                          type=pa.float64())],
                names=["query_id", "corpus_id", "adc_dist"])

    cand = corpus_codes.select(
        F.col(corpus_id).alias("_cid"), F.col(code_col).alias("_code")
    ).mapInArrow(score, cand_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("corpus_id").asc()
    )
    return (
        cand.where(F.col("adc_dist") != float("inf"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "corpus_id", "adc_dist", "rank")
    )


def pq_topk_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    codebooks: np.ndarray,
    centroids: np.ndarray | None = None,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """IVF-ADC (the FAISS IVFPQ shape, Jégou et al. 2011 §V): corpus
    vectors land in one IVF cell and carry only their PQ codes; each query
    probes its ``n_probe`` nearest cells, candidates come from a cell
    equi-join (shuffle ~``n_probe/n_cells`` of the cross product, never
    all-pairs), and ADC distances are computed per query group in one
    numpy pass (the LUT is built once per group from the query vector).
    Output: (query_id, corpus_id, adc_dist, rank).

    This is the 100 TB composition: the float corpus is read ONCE to build
    codes + cells; the scan side touches 8-byte codes only. Recall vs the
    exact scan is measured in tests/test_quant.py."""
    from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType
    from pyspark.sql.window import Window

    from polars_st_spark.operators.knn import _cell_assign_udf, ivf_centroids

    if centroids is None:
        centroids = ivf_centroids(corpus, corpus_vec, n_cells=n_cells, seed=seed)
    n_probe = min(n_probe, len(centroids))
    mm, kcent, dsub = codebooks.shape
    books = codebooks.copy()

    c = pq_encode(corpus, codebooks, vec_col=corpus_vec, out_col="_code").select(
        F.col(corpus_id).alias("corpus_id"),
        "_code",
        F.element_at(_cell_assign_udf(centroids, 1)(F.col(corpus_vec)), 1).alias("_cell"),
    )
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("_qv"),
        F.explode(_cell_assign_udf(centroids, n_probe)(F.col(query_vec))).alias("_cell"),
    )
    cand = c.join(q, on="_cell").where(F.col("query_id") != F.col("corpus_id"))

    qid_type = queries.schema[query_id].dataType
    cid_type = corpus.schema[corpus_id].dataType
    cand_schema = StructType([
        StructField("query_id", qid_type),
        StructField("corpus_id", cid_type),
        StructField("adc_dist", DoubleType()),
    ])
    topk = k

    # batch-local top-k, NOT a per-query group: a query's candidate set is
    # ~n_probe/n_cells of the corpus, which must never land in one task.
    # Each Arrow batch builds LUTs for the queries it sees and emits only
    # its local top-k per query; shuffle volume O(batches · q · k).
    # r12 (guide §4.2): mapInArrow — whole-batch code matrix via vecarrow,
    # per-batch groups in the same first-seen order pandas groupby(sort=
    # False) used, so every emitted candidate is identical.
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_type

    qid_pa = to_arrow_type(qid_type)
    cid_pa = to_arrow_type(cid_type)

    def adc_batches(batches):
        from polars_st_spark.operators.vecarrow import matrix_from_list_array

        for batch in batches:
            if not batch.num_rows:
                continue
            qvals = batch.column(0).to_numpy(zero_copy_only=False)
            cid_all = batch.column(1).to_numpy(zero_copy_only=False)
            qv_arr = batch.column(2)
            codes_all = matrix_from_list_array(batch.column(3), dtype=np.int64)
            if codes_all is None:
                codes_all = np.stack(
                    [np.asarray(r, dtype=np.int64)
                     for r in batch.column(3).to_pylist()])
            uniq, first_idx, inv = np.unique(
                qvals, return_index=True, return_inverse=True)
            out_q, out_c, out_d = [], [], []
            for gi in np.argsort(first_idx, kind="stable"):
                sel = np.nonzero(inv == gi)[0]  # ascending = original order
                qv = np.asarray(qv_arr[int(sel[0])].as_py(), dtype=np.float64)
                luts = np.empty((mm, kcent), dtype=np.float64)
                for j in range(mm):
                    luts[j] = _seq_sq_dists(qv[None, j * dsub : (j + 1) * dsub], books[j])[0]
                codes = codes_all[sel]
                dists = luts[np.arange(mm)[None, :], codes].sum(axis=1)
                kk = min(topk, len(dists))
                ssel = np.argpartition(dists, kk - 1)[:kk]
                out_q.extend([uniq[gi]] * kk)
                out_c.extend(cid_all[sel[ssel]])
                out_d.extend(dists[ssel])
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_q, type=qid_pa),
                 pa.array(out_c, type=cid_pa),
                 pa.array(np.asarray(out_d, dtype=np.float64),
                          type=pa.float64())],
                names=["query_id", "corpus_id", "adc_dist"])

    scored = cand.select("query_id", "corpus_id", "_qv", "_code").mapInArrow(
        adc_batches, cand_schema
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "corpus_id", "adc_dist", "rank")
    )


def int8_quantize(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "q8",
    vmin: float = -1.0,
    vmax: float = 1.0,
) -> DataFrame:
    """Symmetric linear int8 quantization to ``array<tinyint>`` (4×
    compression of float32): ``round((clip(x) - vmin) / (vmax - vmin) *
    254) - 127``. Pure Spark SQL — codegen, no Python. Range is a fixed
    [vmin, vmax] contract (embedding models emit bounded activations);
    values outside clip."""
    scale = 254.0 / (vmax - vmin)
    x = F.col(vec_col)
    q = F.transform(
        x,
        lambda v: (
            F.round(
                (F.least(F.greatest(v.cast("double"), F.lit(vmin)), F.lit(vmax)) - vmin)
                * scale
            ).cast("int")
            - 127
        ).cast("tinyint"),
    )
    return df.withColumn(out_col, q)


def int8_dequantize(
    df: DataFrame,
    q_col: str = "q8",
    out_col: str = "embedding_dq",
    vmin: float = -1.0,
    vmax: float = 1.0,
) -> DataFrame:
    """Inverse of :func:`int8_quantize` (midpoint reconstruction)."""
    scale = (vmax - vmin) / 254.0
    return df.withColumn(
        out_col,
        F.transform(F.col(q_col), lambda v: (v.cast("double") + 127.0) * scale + vmin),
    )
