"""Word-level BPE encoding (textops.bpe_encode): the chained literal-replace
plan must equal the reference iterative lowest-rank-first algorithm, for
hand-built AND trained (well-formed) merges tables; codegen-only plan."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from polars_st_spark.operators.textops import bpe_encode, bpe_encode_count
from polars_st_spark.plans import explain_str


def ref_bpe_word(word, merges):
    """Reference encoder: repeatedly merge the lowest-rank pair present,
    all non-overlapping occurrences left-to-right (subword-nmt/GPT-2)."""
    ranks = {m: i for i, m in enumerate(merges)}
    toks = list(word)
    while len(toks) > 1:
        best = min(
            (ranks.get((toks[i], toks[i + 1]), len(merges)), i)
            for i in range(len(toks) - 1)
        )
        if best[0] >= len(merges):
            break
        a, b = merges[best[0]]
        out, i = [], 0
        while i < len(toks):
            if i < len(toks) - 1 and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


def ref_bpe(text, merges):
    return [t for w in text.lower().split() for t in ref_bpe_word(w, merges)]


def train_bpe(corpus_words, n_merges, rng):
    """Mini BPE trainer: most-frequent pair wins each round (ties broken
    deterministically) — produces a WELL-FORMED merges table by
    construction (constituents of merge r exist before r)."""
    seqs = [list(w) for w in corpus_words]
    merges = []
    for _ in range(n_merges):
        counts = {}
        for s in seqs:
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + 1
        if not counts:
            break
        best = max(sorted(counts), key=lambda p: counts[p])
        merges.append(best)
        a, b = best
        for si, s in enumerate(seqs):
            out, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[si] = out
    return merges


def test_bpe_encode_matches_reference_trained_table(spark):
    rng = np.random.RandomState(5)
    vocab = ["the", "thing", "and", "another", "banana", "data", "database",
             "tab", "tables", "aardvark", "ingesting", "rereading"]
    corpus = [vocab[i] for i in rng.randint(0, len(vocab), 400)]
    merges = train_bpe(corpus, 24, rng)
    texts = [" ".join(vocab[i] for i in rng.randint(0, len(vocab), 8))
             for _ in range(40)]
    texts += ["", "a", "zzz qqq", "the the the"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["id", "text"]).coalesce(1)
    rows = df.select("id", bpe_encode("text", merges).alias("tok"),
                     bpe_encode_count("text", merges).alias("n")).collect()
    for r in rows:
        want = ref_bpe(texts[r["id"]], merges)
        assert r["tok"] == want, (r["id"], texts[r["id"]])
        assert r["n"] == len(want)


def test_bpe_encode_edge_cases(spark):
    merges = [("a", "a"), ("aa", "aa")]
    df = spark.createDataFrame(
        [(0, "aaaa aaa aaaaa"), (1, "b.c! d"), (2, "  spaced   out  ")],
        ["id", "text"]).coalesce(1)
    rows = {r["id"]: r["tok"] for r in df.select(
        "id", bpe_encode("text", merges).alias("tok")).collect()}
    assert rows[0] == ["aaaa", "aa", "a", "aaaa", "a"]
    assert rows[1] == list("b.c!") + ["d"]          # punctuation = plain chars
    assert rows[2] == list("spaced") + list("out")  # whitespace runs collapse
    with pytest.raises(ValueError):
        bpe_encode(F.lit("x"), [("\x1f", "a")])


def test_bpe_plan_is_codegen_only(spark):
    merges = [("t", "h"), ("th", "e"), ("a", "n")]
    df = spark.createDataFrame([(0, "the plan")], ["id", "text"])
    plan = explain_str(df.select(bpe_encode_count("text", merges).alias("n")))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_train_bpe_deterministic_and_well_formed(spark):
    """train_bpe: deterministic for (corpus, seed), well-formed (merge r's
    constituents exist before r), and encoding with the trained table
    compresses the corpus (fewer tokens than characters)."""
    from polars_st_spark.operators.textops import train_bpe

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    m1 = train_bpe(docs, "text", n_merges=32, sample_size=200)
    m2 = train_bpe(docs, "text", n_merges=32, sample_size=200)
    assert m1 == m2 and len(m1) == 32
    # partition-layout independence: the content-hash sort before the
    # seeded trim makes the fit invariant under repartitioning
    m3 = train_bpe(docs.repartition(7, "doc_id"), "text",
                   n_merges=32, sample_size=200)
    assert m3 == m1
    # well-formedness: every non-char constituent was produced earlier
    produced = set()
    for a, b in m1:
        assert (len(a) == 1 or a in produced) and (len(b) == 1 or b in produced)
        produced.add(a + b)
    # single-pass bpe_encode over the trained table == iterative reference
    rows = docs.limit(20).select(
        "doc_id", F.col("text"), bpe_encode("text", m1).alias("tok")).collect()
    for r in rows:
        assert r["tok"] == ref_bpe(r["text"], m1), r["doc_id"]
        nchars = sum(len(w) for w in r["text"].lower().split())
        assert len(r["tok"]) <= nchars
    assert any(len(t) > 1 for r in rows for t in r["tok"])  # real compression
