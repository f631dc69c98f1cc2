"""End-to-end pretraining-data pipeline: the whole hygiene / dedup /
decontamination / scrub / chunk stack composed into one Spark plan.

This is the product-level capstone of the training-data operator family —
the sequence every large-scale corpus build runs (C4/Gopher/GPT-3
lineage, all public):

    1. quality filter     — Gopher keep-mask (pure codegen, no shuffle)
    2. exact dedup        — keep min-id per text hash (one uniform shuffle)
    3. near-dup dedup     — MinHash-LSH pairs → connected components →
                            keep the cluster minimum (band equi-joins,
                            O(log n) star rounds; never all-pairs)
    4. semantic dedup     — optional SemDeDup stage when an embeddings
                            frame is supplied: cluster-bounded cosine
                            pruning of paraphrase/template dups that
                            survive lexical MinHash (operators/cluster.py)
    5. decontamination    — drop docs sharing a word n-gram with the
                            benchmark set (broadcast semi-join; optional
                            exact-preserving Bloom prescreen)
    6. PII scrub          — chained codegen regex replacement
    7. chunking           — overlapping token windows (pure SQL)

Each stage is the already-oracled operator; the composition itself is
hash-checked end to end by the ``pipeline_e2e`` gate row (one CTE chain
replaying the lexical stages in DuckDB; the optional semantic stage's
operator has its own ``semdedup`` gate row and the composition is
pytest-verified). Stages toggle off via parameters, so a corpus build
picks its subset without re-plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pretraining_pipeline"]


def pretraining_pipeline(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    quality: bool = True,
    quality_kwargs: dict | None = None,
    exact_dedup: bool = True,
    near_dup_threshold: float | None = 0.5,
    near_dup_kwargs: dict | None = None,
    embeddings: DataFrame | None = None,
    embedding_col: str = "embedding",
    semantic_threshold: float = 0.99,
    semantic_kwargs: dict | None = None,
    decontam_n: int = 8,
    decontam_bloom_fpp: float | None = None,
    scrub: bool = True,
    chunk_tokens: int | None = None,
    chunk_overlap: int = 0,
    materialize: str | None = "cache",
) -> DataFrame:
    """Run the standard corpus-build sequence; returns the surviving rows
    (with ``text_col`` scrubbed) or, when ``chunk_tokens`` is set, the
    exploded chunk table (id, chunk_idx, chunk_text, chunk_n_tokens).

    Scale notes: the only corpus-wide shuffles are the ones the component
    operators already make (text-hash window, LSH band joins + star
    rounds); quality filtering and scrubbing ride along inside codegen
    projections, and the benchmark n-gram set is broadcast. Stage order
    puts the cheap row-dropping filters FIRST so the expensive dedup
    stages see the smallest corpus.
    """
    from polars_st_spark.operators import filters as H
    from polars_st_spark.operators import textops as T
    from polars_st_spark.operators.concomp import near_dup_groups
    from polars_st_spark.operators.dedup import _materialize
    from polars_st_spark.operators.dedup import exact_dedup as _exact

    out = docs
    if quality:
        out = out.where(H.gopher_filter(F.col(text_col), **(quality_kwargs or {})))
    if exact_dedup:
        out = _exact(out, text_col=text_col, id_col=id_col)
    if (quality or exact_dedup) and near_dup_threshold is not None:
        # stage boundary: the near-dup stage consumes this frame several
        # times (signature pass, id universe, keep semi-join) — without a
        # cut, each consumer re-runs the quality expression and the dedup
        # window (measured 2.5× the whole pipeline cost at sf0.01)
        out = _materialize(out, materialize)
    if near_dup_threshold is not None:
        groups = near_dup_groups(
            out, text_col=text_col, id_col=id_col,
            threshold=near_dup_threshold, materialize=materialize,
            **(near_dup_kwargs or {}),
        )
        keep = groups.where(F.col("keep")).select(id_col)
        out = out.join(keep, on=id_col, how="left_semi")
        # second stage boundary: decontamination scans its input TWICE
        # (doc-gram explode + the final anti-join), and the semantic stage
        # adds two more consumers — without a cut each scan re-runs the
        # near-dup keep join. Composed stages multiply: at 10x bench grain
        # the uncut composition measured ~2x per uncut consumer (r6 scale
        # ramp), which is also why callers warming with materialize=None
        # should prefer "checkpoint" (materializes outside the CacheManager
        # without handing the timed run warm caches).
        out = _materialize(out, materialize)
    if embeddings is not None:
        # SemDeDup over the SURVIVORS only: join the embedding frame to the
        # current id set first (semi-join pushes the dedup work down to the
        # post-lexical-dedup corpus), then drop flagged rows
        from polars_st_spark.operators.cluster import semantic_dedup

        emb = embeddings.join(out.select(id_col), on=id_col, how="left_semi")
        flags = semantic_dedup(
            emb, id_col=id_col, vec_col=embedding_col,
            threshold=semantic_threshold, **(semantic_kwargs or {}),
        )
        keep_sem = flags.where(~F.col("is_dup")).select(F.col("id").alias(id_col))
        out = out.join(keep_sem, on=id_col, how="left_semi")
    if benchmark is not None:
        out = H.decontaminate(
            out, benchmark, n=decontam_n, text_col=text_col, id_col=id_col,
            mode="filter", bloom_fpp=decontam_bloom_fpp,
        )
    if scrub:
        out = out.withColumn(text_col, H.pii_scrub(F.col(text_col)))
    if chunk_tokens is not None:
        return T.chunk_text(
            out, id_col, text_col,
            chunk_tokens=chunk_tokens, overlap=chunk_overlap,
        ).select(id_col, "chunk_idx", "chunk_text", "chunk_n_tokens")
    return out
