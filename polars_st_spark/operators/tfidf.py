"""Corpus term statistics and relevance scoring: vocabulary, TF-IDF,
BM25 ranked retrieval.

Scale design:

- :func:`vocab` is one explode + map-side-combined groupBy on the token
  (uniform key). It deliberately returns UNRANKED (token, count) rows —
  a global dense rank over a 100 TB vocabulary would be a single-partition
  window (the classic scale killer); :func:`top_vocab` ranks only the
  top-n via sort-limit (TakeOrdered: per-partition heaps, no global sort).
- :func:`tf_idf` shuffles twice on uniform keys — (doc, term) counts,
  then document frequency per term — and joins them back on the term.
  The corpus size enters as a scalar: pass ``n_docs`` when you know it
  (at scale you do); otherwise one count job runs.
- :func:`bm25_search` scores one query against the corpus: the query's
  term set is tiny, so the term-stats join is a broadcast and ranking is
  a TakeOrdered top-n.

Formulas are the published standards (public): smoothed IDF
``ln((N+1)/(df+1)) + 1`` per sklearn's TfidfTransformer docs; BM25 per
Robertson & Zaragoza 2009 with IDF ``ln(1 + (N-df+0.5)/(df+0.5))``.
Reference scope note: the reference engine has no text surface; this
belongs to the driver-mandated training-pipeline extension family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_st_spark.operators.textops import tokens

__all__ = ["bm25_search", "tf_idf", "top_vocab", "vocab"]


def vocab(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Corpus vocabulary: (term, count, doc_freq), one row per distinct
    token with ``count >= min_count``. Unranked by design (see module
    docstring); compose ``.orderBy(...)`` or :func:`top_vocab` yourself."""
    # the row id must be STAGED before the explode — in the same select the
    # generate re-evaluates it per output token (one id per token, not per doc)
    toks = (
        df.select(F.monotonically_increasing_id().alias("_row"), F.col(text_col))
        .select("_row", F.explode(tokens(F.col(text_col))).alias("term"))
        .where(F.col("term") != "")
    )
    out = toks.groupBy("term").agg(
        F.count("*").alias("count"),
        F.count_distinct("_row").alias("doc_freq"),
    )
    if min_count > 1:
        out = out.where(F.col("count") >= min_count)
    return out


def top_vocab(df: DataFrame, n: int, text_col: str = "text") -> DataFrame:
    """Top-``n`` vocabulary by count (ties: lexicographic), with 1-based
    rank. Sort-limit plan (TakeOrdered) — per-partition heaps, never a
    global sort or single-partition window."""
    v = vocab(df, text_col)
    rows = v.orderBy(F.col("count").desc(), F.col("term").asc()).limit(n)
    # rank assignment happens on <= n rows (already reduced) — a window
    # here is bounded by n, not by the vocabulary
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col("count").desc(), F.col("term").asc())
    return rows.withColumn("rank", F.row_number().over(w))


def tf_idf(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_docs: int | None = None,
    min_doc_freq: int = 1,
) -> DataFrame:
    """Per (doc, term) TF-IDF: (id, term, tf, doc_freq, idf, tfidf) with
    raw-count tf and the smoothed IDF ``ln((N+1)/(df+1)) + 1`` (sklearn's
    formula — strictly positive, so rare-term weights stay ordered)."""
    from pyspark.sql.window import Window

    n = n_docs if n_docs is not None else df.count()
    tc = (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .where(F.col("term") != "")
        .groupBy("_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tc.groupBy("term").agg(F.count("*").alias("doc_freq"))
    if min_doc_freq > 1:
        dfreq = dfreq.where(F.col("doc_freq") >= min_doc_freq)
    idf = F.log((F.lit(float(n + 1))) / (F.col("doc_freq") + 1).cast("double")) + 1.0
    return (
        tc.join(dfreq, on="term")
        .withColumn("idf", idf)
        .withColumn("tfidf", F.col("tf").cast("double") * F.col("idf"))
        .select(F.col("_id").alias(id_col), "term", "tf", "doc_freq", "idf", "tfidf")
    )


def bm25_search(
    df: DataFrame,
    query: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    n_docs: int | None = None,
    avg_dl: float | None = None,
) -> DataFrame:
    """Top-``n`` documents for ``query`` by BM25 (Robertson & Zaragoza
    2009): per query term, ``idf · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))``
    with ``idf = ln(1 + (N−df+0.5)/(df+0.5))``, summed over matched terms.
    Output: (id, score, rank), rank 1 best, score ties broken by id.

    The query term set is broadcast (it is tiny); corpus-side work is one
    (doc, term) count shuffle restricted to query terms, and the final
    ranking is a TakeOrdered top-n. ``n_docs``/``avg_dl`` are scalars —
    pass them at scale, or two aggregate jobs compute them."""
    if not query:
        raise ValueError("query must contain at least one term")
    qterms = sorted({t.lower() for t in query})
    n_total = n_docs if n_docs is not None else df.count()
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.size(tokens(F.col(text_col))).alias("dl"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    if avg_dl is None:
        avg_dl = (
            df.select(F.avg(F.size(tokens(F.col(text_col)))).alias("a")).first()["a"]
        )
    hits = toks.where(F.col("term").isin(qterms))
    tc = hits.groupBy("_id", "dl", "term").agg(F.count("*").alias("tf"))
    dfreq = tc.groupBy("term").agg(F.count_distinct("_id").alias("doc_freq"))
    idf = F.log(
        1.0
        + (F.lit(float(n_total)) - F.col("doc_freq") + 0.5)
        / (F.col("doc_freq") + 0.5)
    )
    term_score = (
        idf
        * (F.col("tf").cast("double") * (k1 + 1.0))
        / (
            F.col("tf").cast("double")
            + k1 * (1.0 - b + b * F.col("dl").cast("double") / F.lit(float(avg_dl)))
        )
    )
    scored = (
        tc.join(F.broadcast(dfreq), on="term")
        .withColumn("_s", term_score)
        .groupBy("_id")
        .agg(F.sum("_s").alias("score"))
    )
    from pyspark.sql.window import Window

    top = scored.orderBy(F.col("score").desc(), F.col("_id").asc()).limit(n)
    w = Window.orderBy(F.col("score").desc(), F.col("_id").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        F.col("_id").alias(id_col), "score", "rank"
    )
