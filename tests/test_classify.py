"""Hashed-feature linear classifier (operators/classify.py): closed-form
score checks against a driver-side md5 reimplementation, float/milli
equivalence, the corpus-filter helper, and the codegen-only plan (no
Python workers anywhere in the score)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from polars_st_spark.operators import classify as C
from polars_st_spark.plans import explain_str

W = [((i * 2654435761) % 2001) - 1000 for i in range(64)]


def _h(salt, s):
    return int(hashlib.md5(f"{salt}:{s}".encode()).hexdigest()[:8], 16)


def _feats(text, bigrams):
    toks = text.strip().lower().split() or [""]
    if text.strip() == "":
        toks = [""]
    if not bigrams:
        return toks
    if len(toks) >= 2:
        bi = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    else:
        bi = [" ".join(toks)]
    return toks + bi


def _expect(text, weights, intercept, bigrams=False, salt=0):
    n = len(weights)
    return (intercept + sum(
        weights[_h(salt, t) % n] for t in _feats(text, bigrams))) / 1000.0


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "spam spam spam spam"),
        (2, ""),
        (3, "one"),
        (4, "Mixed CASE   whitespace\ttabs"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).cache()


def test_linear_score_milli_closed_form(docs):
    out = {r["doc_id"]: (r["u"], r["b"]) for r in docs.select(
        "doc_id",
        C.linear_score_milli("text", W, milli_intercept=250).alias("u"),
        C.linear_score_milli("text", W, milli_intercept=250, bigrams=True).alias("b"),
    ).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for did, text in texts.items():
        assert out[did][0] == _expect(text, W, 250), (did, "uni")
        assert out[did][1] == _expect(text, W, 250, bigrams=True), (did, "bi")


def test_linear_score_float_matches_milli(docs):
    fw = [w / 1000.0 for w in W]
    rows = docs.select(
        C.linear_score("text", fw, intercept=0.25).alias("f"),
        C.linear_score_milli("text", W, milli_intercept=250).alias("m"),
    ).collect()
    for r in rows:
        assert r["f"] == pytest.approx(r["m"], abs=1e-9)


def test_classify_filter_helper(docs):
    fw = [w / 1000.0 for w in W]
    out = C.classify(docs, "text", fw, threshold=0.0)
    assert set(out.columns) == {"doc_id", "text", "q_score", "q_keep"}
    for r in out.collect():
        assert r["q_keep"] == (r["q_score"] > 0.0)


def test_classifier_plan_is_codegen_only(docs):
    out = docs.select(
        C.linear_score_milli("text", W, bigrams=True).alias("s"))
    plan = explain_str(out)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # the weight array must be staged ONCE as a lambda binding, not
    # inlined per token: each weight literal may appear a bounded number
    # of times (tree + detail sections), never per-token
    assert 0 < plan.count("-587") <= 4  # W[2], a distinctive weight


def test_classifier_streaming_matches_batch(spark, tmp_path):
    """The classifier score is a stateless codegen expression, so the same
    Column runs under Structured Streaming and selects exactly the
    batch-mode keep set — the continuous corpus-filter deployment shape."""
    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc word "), F.repeat(F.lit("tok "), (F.col("id") % 9).cast("int"))).alias("text"),
    )
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    scored = C.classify(stream, "text", [w / 1000.0 for w in W], threshold=0.0)
    q = (scored.writeStream.format("memory").queryName("clf_stream")
         .option("checkpointLocation", chk).trigger(availableNow=True).start())
    q.awaitTermination(60)
    got = {(r["doc_id"], r["q_score"], r["q_keep"]) for r in
           spark.sql("select doc_id, q_score, q_keep from clf_stream").collect()}
    want = {(r["doc_id"], r["q_score"], r["q_keep"]) for r in
            C.classify(df, "text", [w / 1000.0 for w in W], threshold=0.0)
            .select("doc_id", "q_score", "q_keep").collect()}
    assert got == want and len(got) == 100
