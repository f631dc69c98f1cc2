"""Vocabulary / TF-IDF / BM25 (operators/tfidf.py)."""

import math

import pytest
from pyspark.sql import functions as F

from polars_st_spark.operators import tfidf as T


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the log"),
        (2, "cats and dogs and cats"),
        (3, "a cat a dog a mat"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"]).cache()


def test_vocab_counts(docs):
    v = {r["term"]: (r["count"], r["doc_freq"]) for r in T.vocab(docs).collect()}
    assert v["the"] == (4, 2)
    assert v["cat"] == (2, 2)
    assert v["cats"] == (2, 1)
    assert v["a"] == (3, 1)
    assert "zebra" not in v
    v2 = {r["term"] for r in T.vocab(docs, min_count=2).collect()}
    assert "log" not in v2 and "the" in v2


def test_top_vocab_rank_and_plan(docs, spark):
    top = T.top_vocab(docs, 3).collect()
    assert [(r["rank"], r["term"]) for r in sorted(top, key=lambda r: r["rank"])] == [
        (1, "the"), (2, "a"), (3, "and")]  # 4, 3, 2(ties lexicographic: and<cat..)
    from polars_st_spark.plans import explain_str

    plan = explain_str(T.vocab(docs).orderBy(F.col("count").desc()).limit(3))
    assert "TakeOrderedAndProject" in plan


def test_tf_idf_values(docs):
    out = {(r["doc_id"], r["term"]): r for r in T.tf_idf(docs).collect()}
    n = 4
    r = out[(0, "the")]
    assert r["tf"] == 2 and r["doc_freq"] == 2
    assert r["idf"] == pytest.approx(math.log((n + 1) / 3) + 1.0)
    assert r["tfidf"] == pytest.approx(2 * (math.log((n + 1) / 3) + 1.0))
    # a term present in every doc still gets positive weight (smoothed idf)
    sat = out[(1, "sat")]
    assert sat["idf"] > 1.0 - 1e-12 or sat["idf"] == pytest.approx(math.log(5 / 3) + 1)
    # n_docs passed as a scalar skips the count job and matches
    out2 = {(r["doc_id"], r["term"]): r["tfidf"]
            for r in T.tf_idf(docs, n_docs=4).collect()}
    assert out2[(0, "the")] == pytest.approx(r["tfidf"])


def test_bm25_reference_values(docs):
    """Hand-computed BM25 on the toy corpus."""
    rows = T.bm25_search(docs, ["cat", "mat"], n=4).collect()
    got = {r["doc_id"]: r["score"] for r in rows}
    ranks = {r["rank"]: r["doc_id"] for r in rows}
    n, k1, b = 4, 1.2, 0.75
    dls = {0: 6, 1: 6, 2: 5, 3: 6}
    avgdl = (6 + 6 + 5 + 6) / 4

    def idf(df_):
        return math.log(1 + (n - df_ + 0.5) / (df_ + 0.5))

    def ts(tf, dl, df_):
        return idf(df_) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    want0 = ts(1, 6, 2) + ts(1, 6, 2)      # doc0: cat, mat (df=2 each)
    want3 = ts(1, 6, 2) + ts(1, 6, 2)      # doc3: cat, mat
    assert got[0] == pytest.approx(want0)
    assert got[3] == pytest.approx(want3)
    assert 1 not in got and 2 not in got   # no query terms ("dog" not queried)
    # tie between doc0 and doc3 breaks by id
    assert ranks[1] == 0 and ranks[2] == 3
    with pytest.raises(ValueError, match="at least one"):
        T.bm25_search(docs, [])


def test_bm25_scalars_match_computed(docs):
    a = {r["doc_id"]: r["score"] for r in T.bm25_search(docs, ["cat"]).collect()}
    b_ = {r["doc_id"]: r["score"] for r in
          T.bm25_search(docs, ["cat"], n_docs=4, avg_dl=23 / 4).collect()}
    assert a == pytest.approx(b_)
