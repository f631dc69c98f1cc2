"""Dump .explain("formatted") for the 8 headline bench queries to
plans/r11/<query>_<tag>.txt (r11 optimization-round evidence).

Usage: python scripts/dump_plans_r11.py before|after

Builds the exact DataFrames bench.py's _headline_attempt times (same
cached inputs, same operators) and captures their formatted physical
plans. Driver-side only — nothing is executed except the tiny input
cache materialization needed for realistic plan shapes.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "8")
OUT = os.path.join(_HERE, "plans", "r11")
os.makedirs(OUT, exist_ok=True)


def main():
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("r11-plan-dump")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import polars_st_spark as st
    import __spark_entry__ as E
    from polars_st_spark.operators import dedup as _dedup
    from polars_st_spark.operators import knn as _knn
    from polars_st_spark.operators import textops as _t
    from polars_st_spark.operators.sjoin import st_sjoin

    ncpu = int(CPUS)
    li_rects = E._li_rects(spark, SF_DIR).repartition(ncpu).cache()
    cust = E._cust_pts(spark, SF_DIR).repartition(ncpu).cache()
    nations = E._nation_rects(spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(ncpu).cache()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").repartition(ncpu).cache()

    nations5 = nations.where(F.col("n_nationkey") < 5).select(
        "n_nationkey", "x0", "y0", "x1", "y1", F.col("rect").alias("nrect"))

    frames = {
        "b1_elementwise": li_rects.select(
            F.sum(st.st_area("rect")).alias("a"),
            F.sum(st.st_length("rect")).alias("l")),
        "b2_predicate": st.filter_pairs(
            li_rects.select("l_orderkey", "x0", "y0", "x1", "y1", "rect"),
            nations5, predicate="intersects", lcol="rect", rcol="nrect",
            lbox=("x0", "y0", "x1", "y1"), rbox=("x0", "y0", "x1", "y1"),
            broadcast=True),
        "b3_grouped_union": li_rects.groupBy("l_suppkey")
            .agg(st.st_union_all("rect").alias("u"))
            .select(F.sum(st.st_area("u"))),
        "b4_sjoin": st_sjoin(
            cust.withColumnRenamed("pt", "geometry"),
            nations.withColumnRenamed("rect", "geometry"),
            predicate="within", strategy="broadcast"),
        "b5_flagship": E._supp_rects(spark, SF_DIR)
            .groupBy("s_nationkey")
            .agg(st.st_intersection_all("rect").alias("g"))
            .select("s_nationkey", st.st_area("g"), st.st_to_wkt("g")),
        "p1_minhash_dedup": _dedup.near_dup_pairs(docs, threshold=0.05),
        "p2_knn": _knn.cosine_topk(
            emb.where(F.col("vec_id") < 20), emb, k=10),
        "p3_textstats": docs.select(
            F.sum(_t.token_count("text")),
            F.count(_t.lang_predict("text")),
            F.sum(_t.quality_score("text"))),
    }
    for name, df in frames.items():
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT, f"{name}_{TAG}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
