"""Deterministic sampling + sequence packing (operators/sampling.py)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from polars_st_spark.operators import sampling as S


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"doc{i}", ["en", "es", "fr", "de"][i % 4], (i * 37) % 900 + 20)
            for i in range(2000)]
    return spark.createDataFrame(rows, ["doc_id", "name", "lang", "tokens"]).cache()


def test_consistent_sample_deterministic_and_monotone(docs):
    a = {r["doc_id"] for r in S.consistent_sample(docs, "doc_id", 0.1).collect()}
    b = {r["doc_id"] for r in S.consistent_sample(docs, "doc_id", 0.1).collect()}
    assert a == b  # rerun-stable
    big = {r["doc_id"] for r in S.consistent_sample(docs, "doc_id", 0.4).collect()}
    assert a <= big  # monotone in fraction (consistent-hash property)
    # roughly binomial: 2000 * 0.1 within 5 sigma (~67)
    assert 130 <= len(a) <= 270
    # different seed -> different set
    c = {r["doc_id"] for r in S.consistent_sample(docs, "doc_id", 0.1, seed=7).collect()}
    assert c != a
    # subset-stability: sampling a filtered corpus keeps the same survivors
    sub = docs.where(F.col("doc_id") < 1000)
    a_sub = {r["doc_id"] for r in S.consistent_sample(sub, "doc_id", 0.1).collect()}
    assert a_sub == {i for i in a if i < 1000}


def test_stratified_sample_rates(docs):
    out = S.stratified_sample(
        docs, "lang", {"en": 1.0, "es": 0.2}, "doc_id"
    ).groupBy("lang").count().collect()
    counts = {r["lang"]: r["count"] for r in out}
    assert counts["en"] == 500  # fraction 1.0 keeps everything
    assert 40 <= counts.get("es", 0) <= 170  # ~100
    assert "fr" not in counts and "de" not in counts  # default 0.0


def test_split_column_partition_and_stability(docs):
    lab = S.split_column("doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    out = docs.select("doc_id", lab.alias("split"))
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert sum(counts.values()) == 2000 and set(counts) == {"train", "val", "test"}
    assert counts["train"] > 1400
    # a row's label is independent of the rest of the corpus
    full = {r["doc_id"]: r["split"] for r in out.collect()}
    sub = docs.where(F.col("doc_id") % 3 == 0).select("doc_id", lab.alias("split"))
    for r in sub.collect():
        assert full[r["doc_id"]] == r["split"]


def test_sample_to_token_budget(docs):
    total = docs.agg(F.sum("tokens")).first()[0]
    budget = total * 0.25
    out = S.sample_to_token_budget(docs, "doc_id", "tokens", budget)
    got = out.agg(F.sum("tokens")).first()[0]
    assert abs(got - budget) / budget < 0.2  # expected-value match
    # budget >= total keeps everything; nonpositive total -> empty
    assert S.sample_to_token_budget(docs, "doc_id", "tokens", total * 2).count() == 2000
    empty = docs.where(F.lit(False))
    assert S.sample_to_token_budget(empty, "doc_id", "tokens", 100).count() == 0


def test_consistent_topn_exact(docs):
    out = S.consistent_topn(docs, "doc_id", 25)
    rows = out.collect()
    assert len(rows) == 25 and "_u" not in out.columns
    # equals the 25 smallest hash draws computed independently
    want = {
        r["doc_id"]
        for r in docs.select("doc_id", S.hash_uniform("doc_id").alias("u"))
        .orderBy("u", "doc_id").limit(25).collect()
    }
    assert {r["doc_id"] for r in rows} == want
    # plan is TakeOrdered (per-partition heap), not a global Sort+Limit
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def _pack_reference(rows, cap):
    """Independent driver-side greedy packer."""
    out = {}
    by_group = {}
    for r in sorted(rows, key=lambda r: (r["lang"], r["doc_id"])):
        by_group.setdefault(r["lang"], []).append(r)
    for g, rs in by_group.items():
        b, acc = 0, 0
        for r in rs:
            t = r["tokens"]
            if acc > 0 and acc + t > cap:
                b, acc = b + 1, 0
            out[r["doc_id"]] = (b, acc)
            acc += t
    return out


def test_pack_greedy_matches_reference(docs):
    cap = 2048
    got = S.pack_greedy(docs, "lang", "doc_id", "tokens", cap).collect()
    assert len(got) == 2000
    want = _pack_reference([r.asDict() for r in docs.collect()], cap)
    for r in got:
        assert (r["bin"], r["bin_offset"]) == want[r["doc_id"]], r
    # no bin overflows except single-oversize-row bins
    bins = {}
    for r in got:
        bins.setdefault((r["lang"], r["bin"]), []).append(r["tokens"])
    for (_, _), toks in bins.items():
        assert sum(toks) <= cap or len(toks) == 1


def test_pack_greedy_oversize_rows_own_bin(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 5000), (3, "a", 10), (4, "a", 10)],
        ["doc_id", "lang", "tokens"],
    )
    rows = {r["doc_id"]: (r["bin"], r["bin_offset"])
            for r in S.pack_greedy(df, "lang", "doc_id", "tokens", 100).collect()}
    assert rows[1] == (0, 0)
    assert rows[2] == (1, 0)      # oversize row: bin of its own
    assert rows[3] == (2, 0)      # next row starts a fresh bin
    assert rows[4] == (2, 10)


def test_validation_errors(docs):
    with pytest.raises(ValueError, match="fraction"):
        S.consistent_sample(docs, "doc_id", 1.5)
    with pytest.raises(ValueError, match="fraction"):
        S.stratified_sample(docs, "lang", {"en": -0.1}, "doc_id")
    with pytest.raises(ValueError, match="sum"):
        S.split_column("doc_id", {"a": 0.8, "b": 0.4})


def test_sampling_and_chunking_streaming(spark, tmp_path):
    """The md5 sampling gates and chunk_text are stateless codegen
    expressions, so they run unchanged under Structured Streaming — and the
    streamed output selects exactly the batch-mode rows (the deterministic
    contract carries over to continuous pipelines)."""
    from pyspark.sql import functions as F

    from polars_st_spark.operators.textops import chunk_text

    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")
    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok "), F.repeat(F.lit("w "), (F.col("id") % 7).cast("int"))).alias("text"),
    )
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    gated = S.consistent_sample(stream, "doc_id", 0.35).withColumn(
        "split", S.split_column("doc_id", {"train": 0.75, "val": 0.25}))
    chunked = chunk_text(gated, "doc_id", "text", chunk_tokens=3, overlap=1)
    q = (chunked.writeStream.format("memory").queryName("samp_stream")
         .option("checkpointLocation", chk).trigger(availableNow=True).start())
    q.awaitTermination(60)
    got = spark.sql("select * from samp_stream").collect()
    want = {(r["doc_id"], r["chunk_idx"], r["chunk_text"], r["split"])
            for r in chunk_text(
                S.consistent_sample(df, "doc_id", 0.35).withColumn(
                    "split", S.split_column("doc_id", {"train": 0.75, "val": 0.25})),
                "doc_id", "text", chunk_tokens=3, overlap=1).collect()}
    assert {(r["doc_id"], r["chunk_idx"], r["chunk_text"], r["split"]) for r in got} == want
    assert 0 < len(got)


def test_temperature_rates_flatten_head(spark):
    df = spark.createDataFrame(
        [(i, "en" if i < 800 else ("fr" if i < 950 else "sw")) for i in range(1000)],
        "doc_id long, lang string",
    )
    rates = dict(S.temperature_rates(df, "lang", alpha=0.5))
    # rarest group keeps everything; head group is cut hardest
    assert rates["sw"] == 1.0
    assert rates["fr"] < 1.0 and rates["en"] < rates["fr"]
    # expected post-sample shares follow p^0.5 proportions: n_g * rate_g ∝ sqrt(n_g)
    import math
    k = {g: n * rates[g] / math.sqrt(n) for g, n in (("en", 800), ("fr", 150), ("sw", 50))}
    assert max(k.values()) == pytest.approx(min(k.values()), rel=1e-12)


def test_temperature_alpha_one_is_identity(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(90)], "doc_id long, g string")
    out = S.temperature_mixture(df, "g", "doc_id", alpha=1.0)
    assert out.count() == 90  # every rate is 1.0: alpha=1 keeps the mixture


def test_temperature_mixture_deterministic_and_null_group(spark):
    df = spark.createDataFrame(
        [(i, None if i % 10 == 0 else "en") for i in range(500)],
        "doc_id long, lang string",
    )
    a = {r["doc_id"] for r in S.temperature_mixture(df, "lang", "doc_id").collect()}
    b = {r["doc_id"] for r in S.temperature_mixture(df, "lang", "doc_id").collect()}
    assert a == b and 0 < len(a) < 500
    # the NULL stratum is rarer -> keeps a larger fraction than 'en'
    null_kept = sum(1 for i in a if i % 10 == 0)
    assert null_kept / 50 > (len(a) - null_kept) / 450
    # kept set matches the closed-form gate exactly
    rates = dict(S.temperature_rates(df, "lang"))
    want = {
        r["doc_id"]
        for r in df.withColumn("u", S.hash_uniform("doc_id")).collect()
        if r["u"] < rates[r["lang"]]
    }
    assert a == want


def test_group_cap(spark):
    df = spark.createDataFrame(
        [(i, "big" if i < 900 else "small") for i in range(1000)],
        "doc_id long, dom string",
    )
    out = S.group_cap(df, "dom", "doc_id", 50)
    counts = {r["dom"]: r["n"] for r in out.groupBy("dom").agg(F.count("*").alias("n")).collect()}
    assert counts == {"big": 50, "small": 50}
    # deterministic and a pure function of (id, seed): rerun == same set
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in S.group_cap(df, "dom", "doc_id", 50).collect()}
    assert a == b
    # closed-form replica: per group, the n smallest (u(id), id)
    import hashlib
    def u(i):
        return int(hashlib.md5(f"42:{i}".encode()).hexdigest()[:8], 16) / 2**32
    want = set()
    for dom, ids in (("big", range(900)), ("small", range(900, 1000))):
        want |= {i for _, i in sorted((u(i), i) for i in ids)[:50]}
    assert a == want
    with pytest.raises(ValueError, match="n must be"):
        S.group_cap(df, "dom", "doc_id", 0)


def test_temperature_mixture_precomputed_rates(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 4 else "b") for i in range(400)], "doc_id long, g string")
    rates = S.temperature_rates(df, "g")
    via_rates = {r["doc_id"] for r in S.temperature_mixture(
        df, "g", "doc_id", rates=rates).collect()}
    direct = {r["doc_id"] for r in S.temperature_mixture(df, "g", "doc_id").collect()}
    assert via_rates == direct and via_rates


def test_seeded_shuffle_permutation_properties(docs):
    """seeded_shuffle: every row appears once, shard = floor(u*n), pos is a
    1..shard_size dense rank ordered by the uniform draw, all shards are
    populated at 8 shards × ~100 docs, and the permutation is identical
    across reruns but changes with the seed."""
    out = S.seeded_shuffle(docs, "doc_id", 8).select("doc_id", "shard", "pos")
    rows = out.collect()
    n = docs.count()
    assert len(rows) == n
    assert {r["doc_id"] for r in rows} == {r["doc_id"] for r in docs.collect()}
    by_shard = {}
    for r in rows:
        assert 0 <= r["shard"] < 8
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert len(by_shard) == 8
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # determinism + seed independence
    again = {(r["doc_id"], r["shard"], r["pos"]) for r in
             S.seeded_shuffle(docs, "doc_id", 8).collect()}
    assert again == {(r["doc_id"], r["shard"], r["pos"]) for r in rows}
    other = {(r["doc_id"], r["shard"], r["pos"]) for r in
             S.seeded_shuffle(docs, "doc_id", 8, seed=7).collect()}
    assert other != again
    # u-driven ordering: within a shard, pos order == hash_uniform order
    u = {r["doc_id"]: r["uu"] for r in docs.select(
        "doc_id", S.hash_uniform("doc_id").alias("uu")).collect()}
    for shard, _ in by_shard.items():
        srows = sorted((r for r in rows if r["shard"] == shard),
                       key=lambda r: r["pos"])
        us = [u[r["doc_id"]] for r in srows]
        assert us == sorted(us)


def test_seeded_shuffle_single_shard_and_validation(docs):
    one = S.seeded_shuffle(docs, "doc_id", 1).collect()
    assert {r["shard"] for r in one} == {0}
    assert sorted(r["pos"] for r in one) == list(range(1, len(one) + 1))
    with pytest.raises(ValueError):
        S.seeded_shuffle(docs, "doc_id", 0)


def test_temperature_rates_max_groups_guard(spark):
    """Runaway stratum cardinality raises instead of collecting (VERDICT
    r4 #6 — match the other bounded-collect contracts)."""
    import pytest

    df = spark.range(100).select(
        F.col("id").alias("doc"), (F.col("id") % 4).alias("lang"))
    with pytest.raises(ValueError, match="max_groups"):
        S.temperature_rates(df, "doc", max_groups=50)
    assert len(S.temperature_rates(df, "lang", max_groups=50)) == 4
