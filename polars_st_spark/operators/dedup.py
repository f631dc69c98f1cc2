"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

All pure Spark SQL (no Python UDFs): hash-groupBy for exact dedup; LSH
band-hash equi-joins (hash shuffle on band key, never an O(n²) cross join)
for near-dup candidate generation; array-intersection Jaccard verification.

Scale design: candidate generation is an equi-join on (band_index,
band_hash) — shuffle cost O(n·bands); verification touches only candidate
pairs. Identical semantics to the reference-free SURVEY extension spec
(driver north star: dedup operators over `documents`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_st_spark.operators.textops import (
    lsh_bands,
    minhash_signature_udf,
    shingles,
    simhash32,
)


def _shingle_table(df: DataFrame, text_col: str, id_col: str, shingle_n: int) -> DataFrame:
    """(id, shingle array) with a materialization barrier.

    The barrier matters twice over: (a) lambda bodies re-evaluate non-attribute
    subexpressions per element, so the tokenizer must be staged as a column
    before hashing; (b) without a barrier Catalyst collapses the staging
    projection back into every consumer. At cluster scale replace cache() with
    a checkpoint/intermediate table; semantics are identical."""
    sh = df.select(
        F.col(id_col).alias("_id"),
        shingles(text_col, shingle_n).alias("_sh"),
    )
    return sh.cache()

__all__ = [
    "exact_dedup",
    "exact_dup_groups",
    "minhash_candidates",
    "near_dup_pairs",
    "simhash_dup_pairs",
    "ngram_jaccard_pairs",
]


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row (min id) per exact text hash: single shuffle on the md5
    hash (uniform — no skew), window row_number, no join."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(hash, n_dups, keep_id) for groups with >1 member."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keep_id"))
        .where(F.col("n_dups") > 1)
    )


def minhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) sharing ≥1 LSH band.

    shingle → minhash → band → explode → self-equi-join on band hash.
    """
    from polars_st_spark.operators.textops import lsh_band_rows_udf

    banded = df.select(
        F.col(id_col).alias("_id"),
        lsh_band_rows_udf(text_col, k, bands, shingle_n).alias("_bands"),
    )
    exploded = banded.select("_id", F.posexplode("_bands").alias("_band_idx", "_band_hash"))
    # barrier: keep the band keys materialized so the self-join hashes two
    # small columns instead of re-deriving signatures per side
    exploded = exploded.cache()
    a = exploded.alias("a")
    b = exploded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a._band_idx") == F.col("b._band_idx"))
            & (F.col("a._band_hash") == F.col("b._band_hash"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Verify candidate pairs by word-n-gram Jaccard similarity."""
    from polars_st_spark.operators.textops import shingles_udf

    sh = df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(shingles_udf(text_col, shingle_n)).alias("_sh"),
    ).cache()
    out = (
        pairs.join(sh.withColumnRenamed("_id", "id_a").withColumnRenamed("_sh", "_sha"), on="id_a")
        .join(sh.withColumnRenamed("_id", "id_b").withColumnRenamed("_sh", "_shb"), on="id_b")
        .withColumn("_inter", F.size(F.array_intersect("_sha", "_shb")))
        .withColumn("_union", F.size(F.array_union("_sha", "_shb")))
        .withColumn(
            "jaccard",
            F.when(F.col("_union") > 0, F.col("_inter") / F.col("_union")).otherwise(F.lit(0.0)),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH candidates → n-gram Jaccard verification."""
    cands = minhash_candidates(df, text_col, id_col, k, bands, shingle_n)
    return ngram_jaccard_pairs(df, cands, text_col, id_col, shingle_n, threshold)


def simhash_dup_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Pairs with identical 32-bit SimHash (hamming distance 0 bucket join).
    For distance ≤ d, join on (d+1) fingerprint chunks instead."""
    s = df.select(F.col(id_col).alias("_id"), simhash32(text_col).alias("_sh"))
    a, b = s.alias("a"), s.alias("b")
    return (
        a.join(b, (F.col("a._sh") == F.col("b._sh")) & (F.col("a._id") < F.col("b._id")))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"), F.col("a._sh").alias("simhash"))
    )
