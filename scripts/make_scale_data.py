"""Build the deterministic derived ~10x scale dataset for the scale-ramp
proof (round-6 task #1): salt-and-replicate the sf0.1 parquet with shifted
keys so every scale-suite query sees 10x rows with the SAME workload
character, without touching /root/testdata.

Replication rules (replica r in 0..9; r=0 is byte-identical content):
- lineitem / customer / supplier / orders keys shift by r * KEYSPACE so key
  cardinality scales with rows (groupBy/join key counts grow 10x, matching
  a real TPC-H scale-up where suppliers/customers grow with SF).
- nation / region are DIMENSIONS: fixed 25/5 rows at every SF (TPC-H rule),
  copied through unchanged.
- documents: doc_id shifts; for r > 0 every 3rd token gets a per-replica
  suffix, so every 3-shingle window contains a changed token — cross-replica
  Jaccard is exactly 0 (near-dup candidate pairs scale ~10x, not 100x) while
  within-replica near-dup structure is preserved verbatim (both members of a
  pair receive the identical transform).
- embeddings: vec_id shifts; the vector is circularly rolled by r dims
  (norm-preserving, decorrelates replicas so knn/semdedup neighborhood sizes
  scale instead of collapsing into 10-way exact-duplicate stacks).

Tables not read by the scale suite (events, part) are skipped.

Output is written with 32 files per table so the scan has real splits (a
single 100 MB local parquet would serialize the scan on 1-3 partitions and
measure nothing but that).

Usage: python scripts/make_scale_data.py [src_sf_dir] [out_dir] [factor]
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/scale_data/sf1"
FACTOR = int(sys.argv[3]) if len(sys.argv) > 3 else 10

KEYSPACE = {
    "l_orderkey": 100_000_000,
    "l_suppkey": 1_000_000,
    "c_custkey": 10_000_000,
    "s_suppkey": 1_000_000,
    "o_orderkey": 100_000_000,
    "o_custkey": 10_000_000,
    "doc_id": 10_000_000,
    "vec_id": 1_048_576,
}


def main() -> None:
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("make-scale-data")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)

    def replicate(name: str, transform=None) -> None:
        src = spark.read.parquet(f"{SRC}/{name}.parquet")
        reps = []
        for r in range(FACTOR):
            df = src
            for col in df.columns:
                if col in KEYSPACE and r:
                    df = df.withColumn(col, F.col(col) + F.lit(r * KEYSPACE[col]))
            if transform is not None:
                df = transform(df, r)
            reps.append(df)
        out = reps[0]
        for df in reps[1:]:
            out = out.unionByName(df)
        out.repartition(32).write.mode("overwrite").parquet(f"{OUT}/{name}.parquet")
        print(f"{name}: {src.count()} -> {spark.read.parquet(f'{OUT}/{name}.parquet').count()} rows")

    def salt_docs(df, r):
        if r == 0:
            return df
        # modify every 3rd token in place: any 3 consecutive tokens contain
        # one index ≡ 2 (mod 3), so NO 3-shingle survives across replicas
        toks = F.split(F.col("text"), " ")
        salted = F.transform(
            toks,
            lambda t, i: F.when(i % 3 == 2, F.concat(t, F.lit(f"_r{r}"))).otherwise(t),
        )
        return df.withColumn("text", F.array_join(salted, " "))

    def roll_embeddings(df, r):
        if r == 0:
            return df
        dim = len(df.select("embedding").first()[0])
        k = r % dim
        rolled = F.concat(
            F.slice(F.col("embedding"), k + 1, dim - k),
            F.slice(F.col("embedding"), 1, k),
        )
        return df.withColumn("embedding", rolled)

    replicate("lineitem")
    replicate("customer")
    replicate("supplier")
    replicate("documents", salt_docs)
    replicate("embeddings", roll_embeddings)
    # dimensions: fixed size at every SF (write-through, still multi-file
    # so downstream reads look identical in shape)
    for dim in ("nation", "region"):
        spark.read.parquet(f"{SRC}/{dim}.parquet").repartition(1).write.mode(
            "overwrite").parquet(f"{OUT}/{dim}.parquet")
        print(f"{dim}: copied (dimension table)")
    spark.stop()


if __name__ == "__main__":
    main()
