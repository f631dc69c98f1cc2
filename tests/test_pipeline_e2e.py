"""End-to-end pretraining pipeline (operators/pipeline.py)."""

import pytest
from pyspark.sql import functions as F

from polars_st_spark.operators.pipeline import pretraining_pipeline


@pytest.fixture(scope="module")
def corpus(spark):
    prose = ("the data pipeline reads and cleans a corpus of documents for "
             "training and it keeps the good ones in the final set")
    rows = [
        (0, prose),
        (1, prose),                                  # exact dup of 0
        (2, prose + " with one tiny extra suffix"),  # near dup of 0
        (3, "short junk"),                           # fails quality
        (4, "completely different prose about storage engines and file formats "
            "that is long enough for the filter and has the and of to in it"),
        (5, "benchmark overlap document " + " ".join(f"tok{i}" for i in range(20))
            + " the and of to a in is it that for making this long enough now"),
        (6, "contact me at a@b.co " + prose),        # PII + near dup of 0
    ]
    bench = [(100, "benchmark overlap document " + " ".join(f"tok{i}" for i in range(20)))]
    return (spark.createDataFrame(rows, ["doc_id", "text"]).cache(),
            spark.createDataFrame(bench, ["doc_id", "text"]).cache())


def test_full_pipeline(corpus):
    docs, bench = corpus
    out = pretraining_pipeline(
        docs, benchmark=bench,
        quality_kwargs={"min_words": 10, "min_stopword_hits": 1},
        near_dup_threshold=0.5, decontam_n=8,
        # 8 bands of 2: candidate recall ~1.0 at J≈0.8 (4×4 banding misses
        # ~16% of such pairs — the tunable the operator exposes for exactly
        # this)
        near_dup_kwargs={"bands": 8},
    )
    rows = {r["doc_id"]: r["text"] for r in out.collect()}
    # 3 fails quality; 1 exact-dups 0; 2 and 6 near-dup 0; 5 is contaminated
    assert set(rows) == {0, 4}
    assert "@" not in rows[0] and "<EMAIL>" not in rows[0]  # 0 had no PII


def test_pipeline_stage_toggles(corpus):
    docs, bench = corpus
    # no quality, no dedup, no benchmark: only the scrub runs
    out = pretraining_pipeline(docs, quality=False, exact_dedup=False,
                               near_dup_threshold=None)
    rows = {r["doc_id"]: r["text"] for r in out.collect()}
    assert set(rows) == set(range(7))
    assert "<EMAIL>" in rows[6] and "a@b.co" not in rows[6]
    # chunking output shape
    ch = pretraining_pipeline(docs, quality=False, exact_dedup=False,
                              near_dup_threshold=None, scrub=False,
                              chunk_tokens=5, chunk_overlap=1)
    assert ch.columns == ["doc_id", "chunk_idx", "chunk_text", "chunk_n_tokens"]
    assert ch.where(F.col("doc_id") == 3).count() == 1  # 2 tokens -> 1 chunk


def test_pipeline_bloom_variant_equal(corpus):
    docs, bench = corpus
    a = {r["doc_id"] for r in pretraining_pipeline(
        docs, benchmark=bench, near_dup_kwargs={"bands": 8},
        quality_kwargs={"min_words": 10, "min_stopword_hits": 1}).collect()}
    b = {r["doc_id"] for r in pretraining_pipeline(
        docs, benchmark=bench, near_dup_kwargs={"bands": 8},
        quality_kwargs={"min_words": 10, "min_stopword_hits": 1},
        decontam_bloom_fpp=0.01).collect()}
    assert a == b


def test_stateless_pipeline_stages_stream(spark, tmp_path, corpus):
    """The stateless subset (quality filter -> scrub -> chunk) runs under
    Structured Streaming unchanged and matches batch output — continuous
    ingest pipelines reuse the same operators (dedup stages are batch-only:
    they need corpus-wide state)."""
    docs, _ = corpus
    src, chk = str(tmp_path / "src"), str(tmp_path / "chk")
    docs.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    out = pretraining_pipeline(
        stream, quality_kwargs={"min_words": 10, "min_stopword_hits": 1},
        exact_dedup=False, near_dup_threshold=None,
        chunk_tokens=8, chunk_overlap=2)
    q = (out.writeStream.format("memory").queryName("pipe_stream")
         .option("checkpointLocation", chk).trigger(availableNow=True).start())
    q.awaitTermination(60)
    got = {tuple(r) for r in spark.sql("select * from pipe_stream").collect()}
    want = {tuple(r) for r in pretraining_pipeline(
        docs, quality_kwargs={"min_words": 10, "min_stopword_hits": 1},
        exact_dedup=False, near_dup_threshold=None,
        chunk_tokens=8, chunk_overlap=2).collect()}
    assert got == want and len(got) > 0


def test_pipeline_semantic_stage(spark):
    """The optional SemDeDup stage drops exactly the flagged semantic dups
    among the lexical survivors and composes with the other stages."""
    import numpy as np

    from polars_st_spark.operators.pipeline import pretraining_pipeline

    rng = np.random.RandomState(3)
    base = rng.randn(20, 8)
    base[7] = base[3] + 1e-9   # 7 is a semantic dup of 3
    base[15] = base[11]        # 15 duplicates 11 exactly
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog number %d ok fine" % i)
         for i in range(20)],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(i, [float(v) for v in base[i]]) for i in range(20)],
        "doc_id long, embedding array<double>",
    )
    out = pretraining_pipeline(
        docs, quality=False, exact_dedup=False, near_dup_threshold=None,
        embeddings=emb, semantic_threshold=0.999,
        semantic_kwargs={"centroids": np.zeros((1, 8))}, scrub=False,
    )
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert kept == set(range(20)) - {7, 15}
