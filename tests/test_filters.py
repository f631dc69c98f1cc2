"""Corpus-hygiene operators (operators/filters.py): repetition signals,
Gopher quality mask, PII scrubbing, corpus-level line dedup, benchmark
decontamination."""

import pytest
from pyspark.sql import functions as F

from polars_st_spark.operators import filters as H


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # (id, text)
        (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (1, "alpha beta\nalpha beta\ngamma delta\nalpha beta"),          # dup lines
        (2, "spam spam spam spam spam spam"),                            # one 2-gram
        (3, ""),                                                         # empty
        (4, "short"),                                                    # < n words
        (5, "contact me at john.doe@example.com or 555-123-4567 ok"),    # PII
        (6, "server at 10.0.0.1 and 192.168.1.254 responded"),           # IPs
        (7, "- item one\n- item two\n- item three"),                     # bullets
        (8, "it trails off...\nand again...\nbut not here"),             # ellipses
        (9, "the and of to a in is it that for extra words making it longer now"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"]).cache()


def _one(df, col):
    return df.select(col).collect()[0][0]


def test_dup_line_fracs(spark, docs):
    d = docs.where(F.col("doc_id") == 1)
    assert _one(d, H.dup_line_frac("text")) == pytest.approx(2 / 4)
    # chars: 4 lines of len 10,10,11,10 = 41 total; distinct 10+11=21
    assert _one(d, H.dup_line_char_frac("text")) == pytest.approx((41 - 21) / 41)
    empty = docs.where(F.col("doc_id") == 3)
    assert _one(empty, H.dup_line_frac("text")) == 0.0
    assert _one(empty, H.dup_line_char_frac("text")) == 0.0
    single = docs.where(F.col("doc_id") == 0)
    assert _one(single, H.dup_line_frac("text")) == 0.0


def test_top_ngram_char_frac(spark, docs):
    d2 = docs.where(F.col("doc_id") == 2)  # "spam spam ..." x6 -> 5x "spam spam"
    text_len = 29
    assert _one(d2, H.top_ngram_char_frac("text", 2)) == pytest.approx(5 * 9 / text_len)
    d0 = docs.where(F.col("doc_id") == 0)  # all 2-grams distinct except "the ..."?
    v = _one(d0, H.top_ngram_char_frac("text", 2))
    assert 0.0 < v < 0.5
    # < n words degenerates to the whole-text shingle (count 1)
    d4 = docs.where(F.col("doc_id") == 4)
    assert _one(d4, H.top_ngram_char_frac("text", 3)) == pytest.approx(1.0)
    d3 = docs.where(F.col("doc_id") == 3)
    assert _one(d3, H.top_ngram_char_frac("text", 2)) == 0.0


def test_top_ngram_matches_groupby_mode(spark):
    """The shuffle-free run-length scan equals the explode/groupBy mode."""
    import random

    rng = random.Random(7)
    words = ["aa", "bb", "cc", "dd", "ee"]
    rows = [(i, " ".join(rng.choice(words) for _ in range(rng.randint(2, 60))))
            for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["f"] for r in df.select(
        "doc_id", H.top_ngram_char_frac("text", 2).alias("f")).collect()}
    from collections import Counter

    for i, text in rows:
        toks = text.split()
        grams = [" ".join(toks[j:j + 2]) for j in range(len(toks) - 1)] or [text]
        top = max(cnt * len(g) for g, cnt in Counter(grams).items())
        assert got[i] == pytest.approx(top / len(text)), (i, text)


def test_quality_signals(spark, docs):
    d0 = docs.where(F.col("doc_id") == 0)
    # 14 words, 56 alpha chars... mean = (70 - 13 spaces)/14
    assert _one(d0, H.mean_word_length("text")) == pytest.approx(
        sum(len(w) for w in "the quick brown fox jumps over the lazy dog near the river bank today".split()) / 14)
    assert _one(d0, H.alpha_word_frac("text")) == 1.0
    d7 = docs.where(F.col("doc_id") == 7)
    assert _one(d7, H.bullet_line_frac("text")) == 1.0
    d8 = docs.where(F.col("doc_id") == 8)
    assert _one(d8, H.ellipsis_line_frac("text")) == pytest.approx(2 / 3)
    d3 = docs.where(F.col("doc_id") == 3)
    for fn in (H.mean_word_length, H.alpha_word_frac, H.bullet_line_frac,
               H.ellipsis_line_frac):
        assert _one(d3, fn("text")) == 0.0


def test_gopher_filter(spark, docs):
    out = {r["doc_id"]: r["keep"] for r in docs.select(
        "doc_id",
        H.gopher_filter("text", min_words=10, min_stopword_hits=1).alias("keep"),
    ).collect()}
    assert out[0] is True            # normal prose
    assert out[2] is False           # pure repetition (top-2-gram frac)
    assert out[3] is False           # empty
    assert out[4] is False           # too short
    assert out[9] is True            # stopword-rich prose
    # stopword evidence threshold bites: doc 0 has only "the" from the list
    strict = {r["doc_id"]: r["keep"] for r in docs.select(
        "doc_id",
        H.gopher_filter("text", min_words=10, min_stopword_hits=2).alias("keep"),
    ).collect()}
    assert strict[0] is False and strict[9] is True


def test_pii_scrub(spark, docs):
    d5 = docs.where(F.col("doc_id") == 5)
    s = _one(d5, H.pii_scrub("text"))
    assert s == "contact me at <EMAIL> or <PHONE> ok"
    d6 = docs.where(F.col("doc_id") == 6)
    s6 = _one(d6, H.pii_scrub("text"))
    assert s6 == "server at <IP> and <IP> responded"
    ssn = spark.createDataFrame([(0, "ssn 123-45-6789 end")], ["doc_id", "text"])
    assert _one(ssn, H.pii_scrub("text")) == "ssn <SSN> end"
    # idempotent on clean text
    d0 = docs.where(F.col("doc_id") == 0)
    assert _one(d0, H.pii_scrub("text")) == _one(d0, F.col("text"))


def test_repetition_signals_schema(docs):
    out = H.repetition_signals(docs)
    assert out.columns == [
        "doc_id", "n_lines", "dup_line_frac", "dup_line_char_frac",
        "top2gram_char_frac", "top3gram_char_frac", "mean_word_len",
        "alpha_word_frac", "gopher_keep",
    ]
    assert out.count() == docs.count()


def test_line_dedup(spark):
    rows = [
        (0, "unique one\ncommon line\nunique two"),
        (1, "common line\nunique three"),
        (2, "common line\nanother common\nunique four"),
        (3, "another common\nanother common"),
        (4, "common line"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["text"] for r in H.line_dedup(df).collect()}
    # first occurrence (doc 0) keeps "common line"; later docs lose it
    assert out[0] == "unique one\ncommon line\nunique two"
    assert out[1] == "unique three"
    # "another common" first occurs in doc 2 — doc 2 keeps it, doc 3's two
    # later copies both go
    assert out[2] == "another common\nunique four"
    assert out[3] == ""
    assert out[4] == ""                      # every line was a later copy
    assert set(out) == {0, 1, 2, 3, 4}       # no rows vanish
    # min_count=4: only "common line" (4 occurrences) crosses the bar;
    # "another common" (3 occurrences) survives everywhere
    out4 = {r["doc_id"]: r["text"] for r in H.line_dedup(df, min_count=4).collect()}
    assert out4[3] == "another common\nanother common"
    assert out4[2] == "another common\nunique four"
    assert out4[1] == "unique three"


def test_line_dedup_extra_columns_survive(spark):
    df = spark.createDataFrame(
        [(0, "a\nb", "s1"), (1, "a\nc", "s2")], ["doc_id", "text", "source"])
    out = {r["doc_id"]: (r["text"], r["source"])
           for r in H.line_dedup(df).collect()}
    assert out[0] == ("a\nb", "s1")
    assert out[1] == ("c", "s2")


def test_decontaminate(spark):
    train = spark.createDataFrame([
        (0, "the quick brown fox jumps over the lazy dog again and again ok"),
        (1, "completely unrelated text about spark query planning and shuffles"),
        (2, "the quick brown fox jumps over the lazy dog hidden inside padding"),
    ], ["doc_id", "text"])
    bench = spark.createDataFrame([
        (100, "benchmark asks about the quick brown fox jumps over the lazy dog"),
    ], ["doc_id", "text"])
    clean = H.decontaminate(train, bench, n=8)
    assert {r["doc_id"] for r in clean.collect()} == {1}
    tagged = H.decontaminate(train, bench, n=8, mode="tag")
    got = {r["doc_id"]: r["contaminated"] for r in tagged.collect()}
    assert got == {0: True, 1: False, 2: True}
    assert tagged.columns == ["doc_id", "text", "contaminated"]
    # a long-enough n never fires on the unrelated doc
    assert H.decontaminate(train, bench, n=12).count() == 3  # no 12-gram shared
    with pytest.raises(ValueError, match="mode"):
        H.decontaminate(train, bench, mode="nope")


def test_decontaminate_no_broadcast_same_result(spark):
    train = spark.createDataFrame(
        [(i, f"doc {i} phrase alpha beta gamma delta epsilon zeta eta theta iota")
         for i in range(20)], ["doc_id", "text"])
    bench = spark.createDataFrame(
        [(0, "phrase alpha beta gamma delta epsilon zeta eta theta iota")],
        ["doc_id", "text"])
    a = {r["doc_id"] for r in H.decontaminate(train, bench, n=9).collect()}
    b = {r["doc_id"] for r in H.decontaminate(train, bench, n=9, broadcast=False).collect()}
    assert a == b


def test_hygiene_signals_streaming_parity(spark, tmp_path):
    """The per-doc signals are stateless codegen expressions, so they run
    unchanged under Structured Streaming and match batch output exactly."""
    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")
    df = spark.range(80).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta "), F.repeat(F.lit("gamma "), (F.col("id") % 5).cast("int")),
            F.lit("\ndelta"), (F.col("id") % 3).cast("string"),
            F.lit(" mail"), F.col("id").cast("string"), F.lit("@x.io"),
        ).alias("text"),
    )
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = H.repetition_signals(stream).withColumn(
        "scrub", H.pii_scrub(F.lit("reach a@b.co now")))
    q = (out.writeStream.format("memory").queryName("hyg_stream")
         .option("checkpointLocation", chk).trigger(availableNow=True).start())
    q.awaitTermination(60)
    got = {tuple(r) for r in spark.sql("select * from hyg_stream").collect()}
    want = {tuple(r) for r in H.repetition_signals(df).withColumn(
        "scrub", H.pii_scrub(F.lit("reach a@b.co now"))).collect()}
    assert got == want and len(got) == 80


def test_decontaminate_bloom_prescreen_exact(spark):
    """The Bloom prescreen changes the plan, never the result: tagged
    output equals the exact path at any fpp."""
    import random

    rng = random.Random(13)
    words = [f"w{i}" for i in range(60)]
    bench_rows = [(900 + j, " ".join(rng.choice(words) for _ in range(25)))
                  for j in range(5)]
    # plant a benchmark 4-gram inside every third train doc
    leak = " ".join(bench_rows[0][1].split()[3:7])
    train = spark.createDataFrame(
        [(i, " ".join(rng.choice(words) for _ in range(30))
              + (f" {leak} tail" if i % 3 == 0 else ""))
         for i in range(150)],
        ["doc_id", "text"])
    bench = spark.createDataFrame(bench_rows, ["doc_id", "text"])
    exact = {(r["doc_id"], r["contaminated"])
             for r in H.decontaminate(train, bench, n=4, mode="tag").collect()}
    assert any(c for _, c in exact) and any(not c for _, c in exact)
    for fpp in (0.5, 0.01):
        bloom = {(r["doc_id"], r["contaminated"])
                 for r in H.decontaminate(train, bench, n=4, mode="tag",
                                          bloom_fpp=fpp).collect()}
        assert bloom == exact, fpp
    with pytest.raises(ValueError, match="bloom_fpp"):
        H.decontaminate(train, bench, bloom_fpp=1.5).collect()
