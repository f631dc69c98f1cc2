"""URL/domain curation operators (operators/weburl.py)."""

import pytest
from pyspark.sql import functions as F

from polars_st_spark.operators import weburl as W


@pytest.fixture(scope="module")
def urls(spark):
    rows = [
        (1, "https://www.example.com/path/page?q=1"),
        (2, "http://news.bbc.co.uk:8080/article#top"),
        (3, "https://user:pw@sub.deep.example.org/x"),
        (4, "https://EXAMPLE.COM/UPPER"),
        (5, "ftp://files.university.ac.jp/data"),
        (6, "not a url at all"),
        (7, "https://localhost/dev"),
        (8, "https://shop.example.com/item?utm_source=x&id=7&utm_campaign=y"),
        (9, "https://a.b/?gclid=abc123"),
        (10, "https://t.co/Zx9"),
    ]
    return spark.createDataFrame(rows, "id long, url string")


def test_url_host_and_registered_domain(urls):
    got = {
        r["id"]: (r["host"], r["dom"])
        for r in urls.select(
            "id",
            W.url_host("url").alias("host"),
            W.registered_domain(W.url_host("url")).alias("dom"),
        ).collect()
    }
    assert got[1] == ("www.example.com", "example.com")
    assert got[2] == ("news.bbc.co.uk", "bbc.co.uk")      # port + 2nd-level registry
    assert got[3] == ("sub.deep.example.org", "example.org")  # userinfo stripped
    assert got[4] == ("example.com", "example.com")       # lower-cased
    assert got[5] == ("files.university.ac.jp", "university.ac.jp")
    assert got[6] == ("", "")                              # non-URL -> empty
    assert got[7] == ("localhost", "localhost")            # single label
    assert got[10] == ("t.co", "t.co")                     # bare 2-label stays


def test_url_strip_tracking(urls):
    got = {
        r["id"]: r["clean"]
        for r in urls.select("id", W.url_strip_tracking("url").alias("clean")).collect()
    }
    assert got[8] == "https://shop.example.com/item?id=7"
    assert got[9] == "https://a.b/"
    assert got[1] == "https://www.example.com/path/page?q=1"  # untouched


def test_domain_blocklist_filter(urls, spark):
    out = W.domain_blocklist_filter(urls, "url", ["bbc.co.uk", "t.co"])
    assert {r["id"] for r in out.collect()} == {1, 3, 4, 5, 6, 7, 8, 9}
    flagged = W.domain_blocklist_filter(urls, "url", ["bbc.co.uk"], keep_col="ok")
    assert {r["id"]: r["ok"] for r in flagged.collect()}[2] is False
    # DataFrame blocklist -> broadcast anti-join path, same result
    bdf = spark.createDataFrame([("bbc.co.uk",), ("t.co",)], "dom string")
    out2 = W.domain_blocklist_filter(urls, "url", bdf)
    assert {r["id"] for r in out2.collect()} == {1, 3, 4, 5, 6, 7, 8, 9}
    flag2 = W.domain_blocklist_filter(urls, "url", bdf, keep_col="ok")
    got2 = {r["id"]: r["ok"] for r in flag2.collect()}
    assert got2[2] is False and got2[10] is False and got2[1] is True
    # empty python blocklist keeps everything
    assert W.domain_blocklist_filter(urls, "url", []).count() == 10


def test_strip_tracking_runs_and_fragments(spark):
    rows = [
        (1, "https://a.b/p?utm_a=1&utm_b=2&utm_c=3&id=7"),
        (2, "https://a.b/p?utm_a=1&utm_b=2"),
        (3, "https://a.b/p?id=1&fbclid=xyz#frag"),
        (4, "https://a.b/p#onlyfrag"),
        (5, "https://a.b/p?utm_a=1#frag"),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    got = {r["id"]: r["c"] for r in df.select(
        "id", W.url_strip_tracking("url").alias("c")).collect()}
    assert got[1] == "https://a.b/p?id=7"
    assert got[2] == "https://a.b/p"
    assert got[3] == "https://a.b/p?id=1#frag"
    assert got[4] == "https://a.b/p#onlyfrag"
    assert got[5] == "https://a.b/p#frag"


def test_weburl_and_script_streaming_parity(spark, tmp_path):
    """URL canonicalization/domain ops and script detection are stateless
    codegen, so they run unchanged under Structured Streaming and match
    batch output exactly (the curation-front-door streaming shape)."""
    from polars_st_spark.operators import textops

    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")
    df = spark.range(60).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("https://s"), (F.col("id") % 7).cast("string"),
            F.lit(".example."),
            F.when(F.col("id") % 2 == 0, F.lit("com")).otherwise(F.lit("co.uk")),
            F.lit("/p?utm_source=a&id="), F.col("id").cast("string"),
        ).alias("url"),
        F.concat(F.lit("text body "), F.col("id").cast("string")).alias("text"),
    )
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)

    def shape(d):
        flagged = W.domain_blocklist_filter(d, "url", ["example.co.uk"], keep_col="ok")
        return flagged.select(
            "doc_id",
            W.registered_domain(W.url_host("url")).alias("dom"),
            W.url_strip_tracking("url").alias("clean"),
            "ok",
            textops.dominant_script("text").alias("script"),
        )

    q = (shape(stream).writeStream.format("memory").queryName("url_stream")
         .option("checkpointLocation", chk).trigger(availableNow=True).start())
    q.awaitTermination(60)
    got = {tuple(r) for r in spark.sql("select * from url_stream").collect()}
    want = {tuple(r) for r in shape(df).collect()}
    assert got == want and len(got) == 60
