"""Sessionization tests: batch window-function path + streaming stateful path."""

import datetime

import pytest
from pyspark.sql import functions as F

from polars_st_spark.operators.sessions import session_stats, sessionize, sessionize_stream


def _mk_events(spark):
    base = datetime.datetime(2026, 1, 1, 12, 0, 0)
    rows = []
    # user 1: two sessions (gap 45 min between event 2 and 3)
    for mins, u in [(0, 1), (10, 1), (55, 1), (60, 1), (0, 2)]:
        rows.append((u, base + datetime.timedelta(minutes=mins), 1.0))
    return spark.createDataFrame(rows, ["user_id", "ts", "value"])


def test_sessionize_batch(spark):
    df = _mk_events(spark)
    out = sessionize(df, gap_minutes=30.0)
    base = datetime.datetime(2026, 1, 1, 12, 0, 0)

    def at(mins):
        return base + datetime.timedelta(minutes=mins)

    got = {(r["user_id"], r["ts"]): r["session_id"] for r in out.collect()}
    assert got[(1, at(0))] == 0 and got[(1, at(10))] == 0
    assert got[(1, at(55))] == 1 and got[(1, at(60))] == 1
    assert got[(2, at(0))] == 0


def test_session_stats(spark):
    df = _mk_events(spark)
    out = session_stats(df, gap_minutes=30.0)
    rows = {(r["user_id"], r["session_id"]): r for r in out.collect()}
    assert rows[(1, 0)]["n_events"] == 2
    assert rows[(1, 1)]["n_events"] == 2
    assert rows[(1, 1)]["duration_s"] == 300.0  # 55 -> 60 min
    assert rows[(2, 0)]["n_events"] == 1


def test_sessionize_on_real_events(spark):
    import __spark_entry__ as E

    ev = E._read_events(spark, "/root/testdata/sf0.001")
    out = session_stats(ev, gap_minutes=60.0)
    assert out.count() > 0
    # sanity: session bounds ordered, counts positive
    bad = out.where((F.col("session_end") < F.col("session_start")) | (F.col("n_events") <= 0))
    assert bad.count() == 0


def test_sessionize_stream(spark, tmp_path):
    src = str(tmp_path / "sess_src")
    chk = str(tmp_path / "sess_chk")
    df = _mk_events(spark)
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    sessions = sessionize_stream(stream, gap_minutes=30.0)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_stream")
        .option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from sess_stream").collect()
    # only CLOSED sessions are emitted in append mode: user 1's first session
    # closes when the 45-min gap arrives within the same batch
    got = {(r["user_id"], r["n_events"]) for r in out}
    assert (1, 2) in got


def test_streaming_exact_dedup(spark, tmp_path):
    import datetime as dt

    from pyspark.sql import functions as F

    from polars_st_spark.streaming import streaming_exact_dedup

    src = str(tmp_path / "dedup_src")
    chk = str(tmp_path / "dedup_chk")
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (1, "alpha doc", t0),
        (2, "alpha doc", t0 + dt.timedelta(minutes=1)),  # dup
        (3, "beta doc", t0 + dt.timedelta(minutes=2)),
        (4, "alpha doc", t0 + dt.timedelta(minutes=3)),  # dup
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "ts"])
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    deduped = streaming_exact_dedup(stream, "text", ts_col="ts", watermark="30 minutes")
    q = (
        deduped.writeStream.format("memory").queryName("dedup_stream")
        .option("checkpointLocation", chk).outputMode("append")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from dedup_stream").collect()
    texts = sorted(r["text"] for r in out)
    assert texts == ["alpha doc", "beta doc"]


def test_streaming_minhash_tag(spark, tmp_path):
    from polars_st_spark.streaming import streaming_minhash_tag

    src = str(tmp_path / "tag_src")
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "completely different text with other words entirely")],
        ["doc_id", "text"],
    )
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    tagged = streaming_minhash_tag(stream, "text")
    q = (
        tagged.writeStream.format("memory").queryName("tag_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    out = {r["doc_id"]: r["band_hashes"] for r in spark.sql("select * from tag_stream").collect()}
    assert out[1] == out[2]  # identical docs share every band
    assert out[1] != out[3]


def test_streaming_session_stats_batch_equivalence(spark):
    """Native session_window sessions match the window-function path on the
    same batch input (same gap => same (user, n_events, duration) multiset)."""
    from polars_st_spark.streaming import streaming_session_stats

    df = _mk_events(spark)
    native = streaming_session_stats(df, gap="30 minutes")
    ref = session_stats(df, gap_minutes=30.0)
    got = sorted(
        (r["user_id"], r["n_events"], r["duration_us"])
        for r in native.collect()
    )
    expected = sorted(
        (r["user_id"], r["n_events"], r["duration_us"])
        for r in ref.collect()
    )
    assert got == expected


def test_streaming_session_stats_stream(spark, tmp_path):
    """Append-mode stream emits exactly the sessions the watermark closed."""
    from polars_st_spark.streaming import streaming_session_stats

    src = str(tmp_path / "ss_src")
    chk = str(tmp_path / "ss_chk")
    base = datetime.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (1, base, 1.0),
        (1, base + datetime.timedelta(minutes=10), 1.0),
        # 8 hours later: watermark (max_ts - 1h) passes the first session
        (1, base + datetime.timedelta(hours=8), 1.0),
        (2, base + datetime.timedelta(minutes=5), 1.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    sess = streaming_session_stats(stream, gap="30 minutes", watermark="1 hour")
    q = (
        sess.writeStream.format("memory").queryName("ss_stream")
        .option("checkpointLocation", chk).outputMode("append")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from ss_stream").collect()
    got = {(r["user_id"], r["n_events"]) for r in out}
    # closed: user 1's 2-event session and user 2's singleton; the 8h event's
    # session is still open (watermark == its start) and must NOT be emitted
    assert got == {(1, 2), (2, 1)}


def test_ntz_requires_fixed_offset_zone(spark):
    """NTZ sessionization under a DST-observing session zone raises loudly
    instead of silently mis-gapping across transitions (ADVICE r3)."""
    import datetime

    import pytest

    from polars_st_spark.operators.sessions import sessionize

    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 3, 10, 1, 30)), (1, datetime.datetime(2024, 3, 10, 3, 5))],
        "user_id int, ts timestamp_ntz",
    )
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
        with pytest.raises(ValueError, match="fixed-offset"):
            sessionize(df, "user_id", "ts", gap_minutes=60).collect()
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        assert sessionize(df, "user_id", "ts", gap_minutes=60).count() == 2
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_streaming_interval_join_batch_parity(spark, tmp_path):
    """Stream-stream interval join: the availableNow streamed result equals
    the identical batch join (watermarks are no-ops in batch)."""
    from pyspark.sql import functions as F

    from polars_st_spark.streaming import streaming_interval_join

    base = spark.range(300).select(
        (F.col("id") % 20).alias("user_id"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") * 37).alias("ts"),
        F.col("id").alias("ev"),
    )
    clicks = spark.range(200).select(
        (F.col("id") % 20).alias("user_id"),
        F.timestamp_seconds(F.lit(1_700_000_050) + F.col("id") * 53).alias("ts"),
        F.col("id").alias("click"),
    )
    lsrc, rsrc, chk = str(tmp_path / "l"), str(tmp_path / "r"), str(tmp_path / "c")
    base.write.mode("overwrite").parquet(lsrc)
    clicks.write.mode("overwrite").parquet(rsrc)
    ls = spark.readStream.schema(base.schema).parquet(lsrc)
    rs = spark.readStream.schema(clicks.schema).parquet(rsrc)
    out = streaming_interval_join(ls, rs, lower="0 seconds", upper="3 minutes")
    q = (out.writeStream.format("memory").queryName("ij_stream")
         .option("checkpointLocation", chk).trigger(availableNow=True).start())
    q.awaitTermination(90)
    got = {(r["user_id"], r["ev"], r["click"])
           for r in spark.sql("select * from ij_stream").collect()}
    want = {(r["user_id"], r["ev"], r["click"])
            for r in streaming_interval_join(base, clicks, lower="0 seconds",
                                             upper="3 minutes").collect()}
    assert got == want and len(got) > 50
    import pytest as _pt

    with _pt.raises(ValueError, match="how"):
        streaming_interval_join(base, clicks, how="full")
