"""Pipeline operator tests over the driver's synthetic testdata."""

import pytest
from pyspark.sql import functions as F

from polars_st_spark.operators import dedup, knn, textops
from polars_st_spark.operators.multimodal import attach_media_metadata, frame_sample, image_features

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_token_count(docs):
    out = docs.select("doc_id", textops.token_count("text").alias("n")).collect()
    assert all(r["n"] > 0 for r in out)
    first = docs.orderBy("doc_id").first()
    expected = len(first["text"].split())
    got = docs.where(F.col("doc_id") == first["doc_id"]).select(
        textops.token_count("text")
    ).first()[0]
    assert got == expected


def test_bpe_token_count(spark):
    cases = {
        "I don't know, it's 42.5% done!": 13,   # contractions split, '42' '.' '5' '%' split
        "hello   world": 2,
        "": 0,
        "   ": 0,
        "a1b2": 4,
    }
    df = spark.createDataFrame([(t,) for t in cases], "text string")
    got = dict(
        zip(cases, [r[0] for r in df.select(textops.bpe_token_count("text")).collect()])
    )
    assert got == cases
    # raw matches keep whitespace runs (what a BPE encoder consumes)
    raw = df.where(F.col("text") == "hello   world").select(
        textops.bpe_tokens("text")
    ).first()[0]
    assert raw == ["hello", "   ", "world"]


def test_quality_and_lang(docs):
    out = docs.select(
        textops.quality_score("text").alias("q"),
        textops.lang_predict("text").alias("lang"),
        textops.punct_ratio("text").alias("p"),
    ).collect()
    assert all(0.0 <= r["q"] <= 1.0 for r in out)
    assert all(r["lang"] in ("en", "es", "fr", "de", "und") for r in out)


def test_minhash_deterministic(docs):
    a = docs.select("doc_id", textops.minhash_signature("text").alias("sig")).collect()
    b = docs.select("doc_id", textops.minhash_signature("text").alias("sig")).collect()
    assert {r["doc_id"]: r["sig"] for r in a} == {r["doc_id"]: r["sig"] for r in b}
    assert all(len(r["sig"]) == 16 for r in a)


def test_exact_dedup(spark, docs):
    dup = docs.limit(5).union(docs.limit(3))
    out = dedup.exact_dedup(dup)
    assert out.count() == 5
    groups = dedup.exact_dup_groups(dup)
    assert groups.count() == 3
    assert all(r["n_dups"] == 2 for r in groups.collect())


def test_near_dup_pairs_finds_planted_duplicate(spark, docs):
    base = docs.limit(20)
    # plant a near-duplicate of doc 0 with a 1000-offset id
    copy = base.where(F.col("doc_id") == 0).select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra token")).alias("text"),
        "lang", "source", "n_chars",
    )
    full = base.unionByName(copy)
    pairs = dedup.near_dup_pairs(full, threshold=0.5)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1000) in got


def test_near_dup_pairs_xxhash_family(spark, docs):
    """xxhash64 production family: signature stage is pure JVM (no Python
    eval in the plan), finds the planted near-duplicate, and every emitted
    pair is exactly Jaccard-verified (same verify stage as md5)."""
    base = docs.limit(20)
    copy = base.where(F.col("doc_id") == 0).select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra token")).alias("text"),
        "lang", "source", "n_chars",
    )
    full = base.unionByName(copy)
    pairs = dedup.near_dup_pairs(full, threshold=0.5, hash_family="xxhash64")
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1000) in got
    sig = dedup._sig_table(full, "text", "doc_id", 16, 4, 3, None, "xxhash64")
    plan = sig._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan


def test_sig_table_rejects_unknown_family(spark, docs):
    with pytest.raises(ValueError, match="hash_family"):
        dedup.near_dup_pairs(docs.limit(5), hash_family="sha1").count()


def test_simhash_dup_pairs(spark, docs):
    base = docs.limit(10)
    copy = base.where(F.col("doc_id") == 1).select(
        (F.col("doc_id") + 500).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    pairs = dedup.simhash_dup_pairs(base.unionByName(copy))
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 501) in got


def test_simhash_hamming_pairs(spark, docs):
    """Pigeonhole LSH at max_hamming=k finds exactly the pairs a brute-force
    bit_count(xor) scan finds."""
    from polars_st_spark.operators.textops import simhash32

    base = docs.limit(40)
    for k in (0, 3):
        got = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in dedup.simhash_dup_pairs(base, max_hamming=k).collect()
        }
        s = base.select(F.col("doc_id").alias("_id"), simhash32("text").alias("_sh"))
        brute = (
            s.alias("a")
            .join(s.alias("b"), F.col("a._id") < F.col("b._id"))
            .select(
                F.col("a._id").alias("id_a"),
                F.col("b._id").alias("id_b"),
                F.bit_count(F.col("a._sh").bitwiseXOR(F.col("b._sh"))).alias("hamming"),
            )
            .where(F.col("hamming") <= k)
        )
        expected = {(r["id_a"], r["id_b"], r["hamming"]) for r in brute.collect()}
        assert got == expected


def test_cosine_topk(emb):
    queries = emb.where(F.col("vec_id") < 3)
    out = knn.cosine_topk(queries, emb, k=5)
    rows = out.collect()
    assert len(rows) == 15
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == [1, 2, 3, 4, 5]
        cos = [r["cosine"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert cos == sorted(cos, reverse=True)
        assert all(-1.0001 <= c <= 1.0001 for c in cos)


def test_cosine_topk_vectorized_matches_exact(emb):
    """Arrow numpy-matmul top-k (the default strategy) returns the identical
    (query, corpus, rank) set as the pure-SQL JVM aggregate path."""
    q = emb.where(F.col("vec_id") < 4)
    a = {(r["query_id"], r["corpus_id"], r["rank"])
         for r in knn.cosine_topk(q, emb, k=5, strategy="sql").collect()}
    b = {(r["query_id"], r["corpus_id"], r["rank"])
         for r in knn.cosine_topk_vectorized(q, emb, k=5).collect()}
    assert a == b and len(a) > 0


def test_cosine_topk_vectorized_string_ids(emb):
    """Id columns keep their input type — string ids flow through the Arrow
    path unchanged (ADVICE r3: schema was hardcoded to long)."""
    s = emb.withColumn("sid", F.concat(F.lit("doc-"), F.col("vec_id")))
    q = s.where(F.col("vec_id") < 2)
    out = knn.cosine_topk(q, s, k=3, query_id="sid", corpus_id="sid")
    rows = out.collect()
    assert len(rows) == 6
    assert all(isinstance(r["query_id"], str) and r["query_id"].startswith("doc-")
               for r in rows)
    assert all(r["query_id"] != r["corpus_id"] for r in rows)


def test_cosine_topk_vectorized_query_guard(emb):
    import pytest

    q = emb.where(F.col("vec_id") < 5)
    with pytest.raises(ValueError, match="max_query_rows"):
        knn.cosine_topk_vectorized(q, emb, k=2, max_query_rows=3)


def test_cosine_topk_lsh_properties(emb):
    # synthetic embeddings are near-random (max cosine ~0.35), so top-1 recall
    # vs exact is inherently low; verify LSH *correctness properties* instead:
    # every approx result shares the query's bucket, scores are true cosines
    # (≤ the exact best), and the path is deterministic.
    queries = emb.where(F.col("vec_id") < 5)
    exact = knn.cosine_topk(queries, emb, k=1)
    approx = knn.cosine_topk_lsh(queries, emb, k=1, dim=64, n_planes=4)
    exact_best = {r["query_id"]: r["cosine"] for r in exact.collect()}
    rows = approx.collect()
    assert rows, "LSH search returned nothing"
    for r in rows:
        assert r["cosine"] <= exact_best[r["query_id"]] + 1e-12
    buckets = {
        r["vec_id"]: r["b"]
        for r in emb.select("vec_id", knn.lsh_bucket("embedding", 64, 4).alias("b")).collect()
    }
    for r in rows:
        assert buckets[r["query_id"]] == buckets[r["corpus_id"]]
    rows2 = approx.collect()
    assert {(r["query_id"], r["corpus_id"]) for r in rows} == {
        (r["query_id"], r["corpus_id"]) for r in rows2
    }


def test_multimodal_plumbing(spark):
    rows = [(i, bytes([i]) * 100) for i in range(8)]
    df = spark.createDataFrame(rows, ["media_id", "payload"])
    df = attach_media_metadata(df, "payload", "image", "png")
    meta = df.select("payload_meta.size_bytes").first()
    assert meta[0] == 100
    feats = image_features(df, "payload", "media_id", decode="fake", resize=(4, 4))
    out = feats.collect()
    assert len(out) == 8
    assert all(len(r["features"]) == 3 for r in out)
    # determinism
    feats2 = {r["media_id"]: r["features"] for r in image_features(df, "payload", "media_id").collect()}
    feats1 = {r["media_id"]: r["features"] for r in image_features(df, "payload", "media_id").collect()}
    assert feats1 == feats2
    frames = frame_sample(df.limit(2), "payload", "media_id", every_n=25, n_frames=100)
    assert frames.count() == 8  # 2 media × 4 frames
    # real decode now handles BMP natively (tests/test_multimodal_real.py);
    # non-BMP compressed payloads still fail at execution naming the codec
    with pytest.raises(Exception, match="Pillow|BMP"):
        image_features(df, "payload", "media_id", decode="real").collect()


def test_lsh_recall(spark):
    """Measured recall@10 of the LSH ANN path vs the exact scan.

    The driver embeddings are near-uniform (no cluster structure), the
    hardest case for sign-LSH: recall tracks the fraction of corpus scanned.
    Multi-probe (flipping the lowest-margin planes) should recover ~3x the
    recall of a single-bucket probe at the same plane count (measured r2:
    0.13 -> 0.40 at 4 planes / 4 probes on sf0.01)."""
    from pyspark.sql import functions as F

    from polars_st_spark.operators import knn as K

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()
    q = emb.where(F.col("vec_id") < 30)
    truth: dict = {}
    for r in K.cosine_topk(q, emb, k=10).collect():
        truth.setdefault(r["query_id"], set()).add(r["corpus_id"])

    def recall(n_planes, n_probes):
        got: dict = {}
        rows = K.cosine_topk_lsh(q, emb, k=10, dim=64, n_planes=n_planes,
                                 n_probes=n_probes).collect()
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r["corpus_id"])
        return sum(len(truth[k] & got.get(k, set())) / len(truth[k]) for k in truth) / len(truth)

    single = recall(4, 1)
    multi = recall(4, 4)
    assert multi > 2 * single
    assert multi > 0.3


def test_ivf_recall(spark):
    """IVF's data-fit quantizer should beat random-hyperplane LSH at the
    same ~25% scan fraction (measured r2: IVF 0.57 vs LSH 0.42 at k=10 on
    the near-uniform sf0.01 embeddings)."""
    from pyspark.sql import functions as F

    from polars_st_spark.operators import knn as K

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()
    q = emb.where(F.col("vec_id") < 30)
    truth: dict = {}
    for r in K.cosine_topk(q, emb, k=10).collect():
        truth.setdefault(r["query_id"], set()).add(r["corpus_id"])

    got: dict = {}
    for r in K.cosine_topk_ivf(q, emb, k=10, n_cells=16, n_probe=4).collect():
        got.setdefault(r["query_id"], set()).add(r["corpus_id"])
    ivf = sum(len(truth[k] & got.get(k, set())) / len(truth[k]) for k in truth) / len(truth)
    assert ivf > 0.5

    # determinism: the seeded quantizer yields identical centroids across fits
    import numpy as np
    c1 = K.ivf_centroids(emb, n_cells=16, seed=42)
    c2 = K.ivf_centroids(emb, n_cells=16, seed=42)
    assert np.array_equal(c1, c2)


def test_audio_features_plumbing(spark):
    from pyspark.sql import functions as F

    from polars_st_spark.operators.multimodal import audio_features

    df = spark.createDataFrame([(1, b"abc"), (2, b"def"), (3, None)], ["id", "payload"])
    out = audio_features(df, "payload", "id", n_samples=1024).collect()
    assert len(out) == 2  # null payload dropped
    r = {x["id"]: x for x in out}
    assert abs(r[1]["duration_s"] - 1024 / 16000) < 1e-6
    assert 0.0 < r[1]["rms"] < 1.0
    assert 0.0 < r[1]["zero_crossing_rate"] < 1.0
    assert abs(r[1]["low_band_energy"] + r[1]["high_band_energy"] - 1.0) < 1e-6
    # deterministic: same payload -> same features
    again = {x["id"]: x for x in audio_features(df, "payload", "id", n_samples=1024).collect()}
    assert again[2]["rms"] == r[2]["rms"]


def test_image_resize_composes(spark):
    from polars_st_spark.operators.multimodal import image_features, image_resize

    df = spark.createDataFrame([(1, b"payload-bytes")], ["id", "payload"])
    small = image_resize(df, "payload", "id", size=(4, 4))
    assert small.first()["height"] == 4
    assert len(bytes(small.first()["payload"])) == 4 * 4 * 3
    # resized payload feeds the feature extractor (pipeline composition)
    feats = image_features(small, "payload", "id", resize=(2, 2)).first()
    assert len(feats["features"]) == 3


def test_chunk_text(spark):
    """r4c chunk_text: token-window chunking with overlap, pure Spark SQL."""
    import pytest
    from polars_st_spark.operators.textops import chunk_text

    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x y"), (3, "   "), (4, "solo")],
        ["doc_id", "text"],
    )
    out = chunk_text(df, "doc_id", "text", chunk_tokens=3, overlap=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_text"], r["chunk_n_tokens"]))
    # step=2: starts 0,2,4,6 over 7 tokens
    assert by_doc[1] == [(0, "a b c", 3), (1, "c d e", 3), (2, "e f g", 3), (3, "g", 1)]
    assert by_doc[2] == [(0, "x y", 2)]
    assert 3 not in by_doc  # whitespace-only doc -> zero chunks
    assert by_doc[4] == [(0, "solo", 1)]
    # every original column survives
    assert {"doc_id", "text", "chunk_idx", "chunk_text", "chunk_n_tokens"} <= set(
        chunk_text(df, chunk_tokens=3).columns)
    with pytest.raises(ValueError, match="overlap"):
        chunk_text(df, chunk_tokens=4, overlap=4)


def test_minhash_xxhash_family_independence(spark):
    """Regression for the (element, index) lambda shadowing bug: the k
    xxhash64 MinHash functions must be genuinely independent — with one
    collapsed family every signature position agrees for every doc, and
    prefix-shifted near-dups silently escape LSH."""
    from pyspark.sql import functions as F

    from polars_st_spark.operators.textops import (
        minhash_signature_xxhash_from_shingles,
        shingles_from_tokens,
        tokens,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta eta theta doc{i} iota kappa")
         for i in range(20)], ["doc_id", "text"])
    sigs = docs.select(
        tokens(F.col("text")).alias("t")
    ).select(
        minhash_signature_xxhash_from_shingles(
            F.array_distinct(shingles_from_tokens("t", 3)), 16).alias("sig")
    ).collect()
    distinct_positions = {len(set(r["sig"])) for r in sigs}
    # a healthy 16-function family over ~10 shingles has many distinct mins;
    # the collapsed family had exactly 1 for every doc
    assert all(n >= 8 for n in distinct_positions), distinct_positions
    # and the signature is invariant under a position shift of the shingle
    # set (minhash is a SET function — the positional hash wasn't)
    a = docs.where(F.col("doc_id") == 0).select(
        minhash_signature_xxhash_from_shingles(
            F.array_distinct(shingles_from_tokens(tokens(F.col("text")), 3)), 16
        ).alias("s")).first()["s"]
    shifted = spark.createDataFrame(
        [("prefix words here alpha beta gamma delta epsilon zeta eta theta doc0 iota kappa",)],
        ["text"])
    b = shifted.select(
        minhash_signature_xxhash_from_shingles(
            F.array_distinct(shingles_from_tokens(tokens(F.col("text")), 3)), 16
        ).alias("s")).first()["s"]
    agree = sum(1 for x, y in zip(a, b) if x == y)
    assert agree >= 8, agree  # J ≈ 0.75 -> most positions agree; was 0


def test_ngram_coverage(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),   # full copy of 1
        (3, "alpha beta gamma delta epsilon iota kappa lam mu"),  # partial overlap
        (4, "completely different words with no overlap at all here"),
        (5, "tiny"),                                              # < n tokens
        (6, "tiny"),                                              # copy of the short doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in dedup.ngram_coverage(df, n=5).collect()}
    assert len(got) == 6
    # doc 1 owns all its shingles; doc 2 borrows every one of them
    assert got[1]["n_borrowed"] == 0 and got[1]["borrowed_frac"] == 0.0
    assert got[2]["n_borrowed"] == got[2]["n_shingles"] == got[1]["n_shingles"]
    assert got[2]["borrowed_frac"] == 1.0
    # doc 3 shares exactly its first 5-gram "alpha beta gamma delta epsilon"
    assert got[3]["n_borrowed"] == 1
    assert got[4]["n_borrowed"] == 0
    # sub-n docs fall back to a single whole-doc shingle
    assert got[5]["n_shingles"] == 1 and got[5]["n_borrowed"] == 0
    assert got[6]["n_shingles"] == 1 and got[6]["n_borrowed"] == 1


def test_script_detection(spark):
    rows = [
        (1, "hello world plain ascii"),
        (2, "Привет мир как дела сегодня"),
        (3, "漢字とひらがなとカタカナの文書です"),
        (4, "مرحبا بالعالم هذا نص عربي"),
        (5, "mixed 漢字 and latin text here"),
        (6, "12345 67890"),
        (7, ""),
        (8, "¡güten Tag señor Ångström!"),  # extended-Latin accents count as latin
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fr = textops.script_fracs("text")
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            *[v.alias(k) for k, v in fr.items()],
            textops.dominant_script("text").alias("dom"),
        ).collect()
    }
    assert got[1]["dom"] == "latin" and got[1]["latin"] > 0.9
    assert got[2]["dom"] == "cyrillic" and got[2]["cyrillic"] > 0.9
    assert got[3]["dom"] == "cjk" and got[3]["cjk"] == 1.0
    assert got[4]["dom"] == "arabic"
    assert got[5]["dom"] == "latin" and 0 < got[5]["cjk"] < 0.2
    assert got[6]["dom"] == "digit" and got[6]["digit"] == 1.0
    assert got[7]["dom"] == "und" and got[7]["latin"] == 0.0
    assert got[8]["dom"] == "latin" and got[8]["latin"] > 0.8


def test_corpus_stats(spark):
    df = spark.createDataFrame(
        [(i, "en" if i < 6 else "fr", "w " * (i + 1)) for i in range(10)],
        "doc_id long, lang string, text string",
    )
    from polars_st_spark.operators.textops import corpus_stats

    got = {r["lang"]: r for r in corpus_stats(df, group_col="lang").collect()}
    assert got["en"]["n_docs"] == 6 and got["en"]["total_tokens"] == 21
    assert got["en"]["mean_tokens"] == 3.5
    assert got["en"]["p50_tokens"] == 3.5        # R-7 midpoint of 1..6
    assert got["fr"]["p90_tokens"] == 9.7  # R-7: h=2.7 over 7,8,9,10
    glob = corpus_stats(df).first()
    assert glob["n_docs"] == 10 and glob["total_tokens"] == 55
