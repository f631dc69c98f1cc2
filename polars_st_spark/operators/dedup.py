"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Exact dedup and SimHash are pure Spark SQL (hash-groupBy / bit-vote
expressions). MinHash-LSH stages one Arrow-batched pass (tokenize → shingle →
signature → band hashes; Python md5 is the price of the cross-engine
bit-identical hash contract) and everything downstream is JVM joins: LSH
band-hash equi-joins (hash shuffle on band key, never an O(n²) cross join)
for candidate generation, array-intersection Jaccard verification on the
staged shingle arrays.

Scale design: candidate generation is an equi-join on (band_index,
band_hash) — shuffle cost O(n·bands); verification touches only candidate
pairs; the signature stage is a single pass over the corpus shared by both.
Materialization of that stage is caller-controlled (``materialize=`` on every
operator): "cache" for interactive reuse, "checkpoint" to cut lineage on long
pipelines, None to leave planning to the caller (the 100 TB default, where
the caller lands the stage in a table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_st_spark.operators.textops import (
    shingle_sig_bands_udf,
    simhash32,
)

__all__ = [
    "exact_dedup",
    "exact_dup_groups",
    "minhash_candidates",
    "near_dup_pairs",
    "simhash_dup_pairs",
    "ngram_coverage",
    "ngram_jaccard_pairs",
]


def _materialize(df: DataFrame, mode: str | None) -> DataFrame:
    if mode == "cache":
        return df.cache()
    if mode == "checkpoint":
        return df.localCheckpoint(eager=False)
    if mode is None:
        return df
    raise ValueError(f"materialize must be 'cache', 'checkpoint', or None, got {mode!r}")


def _scale_partitions(df: DataFrame) -> DataFrame:
    """Give a narrow input enough partitions for the signature pass.

    A small/single-file parquet scan arrives as 1-2 partitions, which would
    serialize the Arrow UDF on one core; at real scale the scan already has
    >= parallelism partitions and this is a no-op (never a shuffle of a big
    input)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


def _sig_table(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    bands: int,
    shingle_n: int,
    materialize: str | None = "cache",
    hash_family: str = "xxhash64",
) -> DataFrame:
    """(_id, _sh distinct-shingle array, _bands band-hash array): the one
    shared corpus pass feeding both candidate generation and verification.

    ``hash_family="xxhash64"`` (the default — the 100 TB production path)
    computes the whole stage JVM-side (shingles → xxhash64 MinHash →
    xxhash64 band keys, whole-stage codegen, zero Python workers).
    ``hash_family="md5"`` runs the fused Arrow UDF whose hashes are
    bit-identical to the SQL oracle (`shingle_sig_bands_udf`) — the oracle
    gate queries pin it explicitly; downstream candidate/verify topology is
    identical either way."""
    if hash_family == "xxhash64":
        from polars_st_spark.operators.textops import (
            lsh_bands_xxhash,
            minhash_signature_xxhash_from_shingles,
            shingles_from_tokens,
            tokens,
        )

        # chained projections so every lambda sees a real attribute — Spark
        # re-evaluates non-attribute subexpressions per array element (the
        # tokenizer would otherwise re-run once per shingle)
        staged = (
            _scale_partitions(df)
            .select(F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_toks"))
            .select(
                "_id",
                F.array_distinct(shingles_from_tokens("_toks", shingle_n)).alias("_sh"),
            )
            .select(
                "_id", "_sh",
                minhash_signature_xxhash_from_shingles("_sh", k).alias("_sig"),
            )
            .select(
                "_id", "_sh",
                lsh_bands_xxhash("_sig", bands, k // bands).alias("_bands"),
            )
        )
    elif hash_family == "md5":
        staged = _scale_partitions(df).select(
            F.col(id_col).alias("_id"),
            shingle_sig_bands_udf(text_col, k, bands, shingle_n).alias("_s"),
        ).select("_id", F.col("_s.sh").alias("_sh"), F.col("_s.bands").alias("_bands"))
    else:
        raise ValueError(f"hash_family must be 'md5' or 'xxhash64', got {hash_family!r}")
    return _materialize(staged, materialize)


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


def _candidates_from_sig(sig: DataFrame) -> DataFrame:
    """Candidate pairs (id_a < id_b) sharing ≥1 LSH band: explode band hashes
    and self-equi-join on (band_index, band_hash)."""
    exploded = sig.select("_id", F.posexplode("_bands").alias("_band_idx", "_band_hash"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a._band_idx") == F.col("b._band_idx"))
            & (F.col("a._band_hash") == F.col("b._band_hash"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )


def _verify_from_sig(sig: DataFrame, pairs: DataFrame, threshold: float) -> DataFrame:
    """Jaccard-verify candidate pairs against the staged distinct-shingle
    arrays (touches candidate pairs only)."""
    sh = sig.select("_id", "_sh")
    return (
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


def minhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    materialize: str | None = "cache",
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) sharing ≥1 LSH band."""
    sig = _sig_table(df, text_col, id_col, k, bands, shingle_n, materialize, hash_family)
    return _candidates_from_sig(sig)


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
    materialize: str | None = "cache",
) -> DataFrame:
    """Verify candidate pairs by word-n-gram Jaccard similarity."""
    sig = _sig_table(df, text_col, id_col, 1, 1, shingle_n, materialize)
    return _verify_from_sig(sig, pairs, threshold)


def near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
    materialize: str | None = "cache",
    hash_family: str = "xxhash64",
) -> DataFrame:
    """MinHash-LSH candidates → n-gram Jaccard verification, sharing ONE
    staged corpus pass (shingles + signatures + band hashes).

    ``hash_family="xxhash64"`` (default) keeps the signature stage entirely
    JVM-side — the 100 TB production path; "md5" is bit-identical to the
    DuckDB oracle (gate queries pin it). The verified output depends on the
    family only through LSH candidate recall — verification is exact either
    way."""
    sig = _sig_table(df, text_col, id_col, k, bands, shingle_n, materialize, hash_family)
    out = _verify_from_sig(sig, _candidates_from_sig(sig), threshold)
    # unpersist handle for benchmarks/diagnostics: repeated identical calls
    # otherwise hit the CacheManager on the staged signature table and
    # understate steady-state cost (bench.py median-of-3 uses this)
    out._staged_sig = sig
    return out


def simhash_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 0,
) -> DataFrame:
    """Near-dup pairs by 32-bit SimHash hamming distance ≤ ``max_hamming``.

    Pigeonhole LSH: split the fingerprint into ``max_hamming + 1`` chunks —
    any pair within the distance budget must agree on at least one chunk, so
    an equi-join on (chunk_index, chunk_value) finds every such pair with a
    shuffle of O(n·chunks) rows (never an O(n²) cross join), then the exact
    ``bit_count(xor)`` filter drops false candidates. ``max_hamming=0``
    degenerates to a single-chunk identical-fingerprint join.

    Reference: dedup family per SURVEY §2 training-pipeline ops; SimHash per
    Charikar (2002) / Manku et al. (2007), both public.
    """
    if not 0 <= max_hamming < 32:
        raise ValueError("max_hamming must be in [0, 32)")
    n_chunks = max_hamming + 1
    width = 32 // n_chunks + (1 if 32 % n_chunks else 0)
    s = df.select(F.col(id_col).alias("_id"), simhash32(text_col).alias("_sh"))
    chunks = F.array(*[
        F.shiftrightunsigned(F.col("_sh"), i * width).bitwiseAND(F.lit((1 << width) - 1))
        for i in range(n_chunks)
    ])
    e = s.select("_id", "_sh", F.posexplode(chunks).alias("_ci", "_cv"))
    a, b = e.alias("a"), e.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a._ci") == F.col("b._ci"))
            & (F.col("a._cv") == F.col("b._cv"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._sh").alias("simhash_a"),
            F.col("b._sh").alias("simhash_b"),
        )
        .distinct()
    )
    return (
        pairs.withColumn(
            "hamming",
            F.bit_count(F.col("simhash_a").bitwiseXOR(F.col("simhash_b"))),
        )
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_coverage(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Cross-document n-gram duplicate coverage via a shingle inverted
    index — the distributed approximation of suffix-array exact substring
    dedup (Lee et al., "Deduplicating Training Data Makes Language Models
    Better", 2022 — public — dedups 50-token spans; here the unit is a
    word n-gram shingle, the granularity a shuffle-based engine can own).

    Every distinct shingle is "owned" by the smallest doc id containing
    it; a document's ``borrowed_frac`` is the fraction of its distinct
    shingles owned by some OTHER document. Near-copies of earlier docs
    score ~1.0, fresh text ~0.0 — ``filter(borrowed_frac < tau)`` is the
    curation step. Returns ``(id, n_shingles, n_borrowed, borrowed_frac)``
    at one row per input document.

    Scale: per-doc `array_distinct` bounds the explode at O(doc tokens);
    ownership is a map-side-combined min-agg on the shingle key (the
    inverted index, one hash shuffle of O(total distinct shingles) rows);
    the join back is the same equi-key. No all-pairs joins, no driver
    state. Skewed boilerplate shingles (one shingle in millions of docs)
    combine map-side in both the min-agg and the count, so a hot key costs
    one reducer O(partitions), not O(occurrences).
    """
    from polars_st_spark.operators.textops import shingles_from_tokens, tokens

    toks = docs.select(F.col(id_col).alias("_id"), tokens(text_col).alias("_t"))
    sh = toks.select(
        "_id",
        F.explode(F.array_distinct(shingles_from_tokens(F.col("_t"), n))).alias("_s"),
    )
    owner = sh.groupBy("_s").agg(F.min("_id").alias("_owner"))
    per_doc = (
        sh.join(owner, "_s")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("_owner") != F.col("_id"), 1).otherwise(0)
            ).alias("n_borrowed"),
        )
    )
    return per_doc.select(
        F.col("_id").alias(id_col),
        "n_shingles",
        "n_borrowed",
        (F.col("n_borrowed") / F.col("n_shingles")).alias("borrowed_frac"),
    )
