"""Round-12 investigation: the ~0.3-0.45 s payload-independent Python-node
job tax at local[32] (VERDICT r11 next-round item 1).

Measures, in ONE session (reps after a warm run, median reported):
  jvm_sum        pure-JVM agg over the cached 600k-row input (reference)
  arrow_noop     do-nothing arrow_udf (evalType 250) over the same input
  arrow_noop_p8  same UDF, input coalesced to 8 partitions
  arrow_noop_p1  same UDF, 1 partition
  tiny_noop      same UDF over a 32-row range (fixed overhead, ~no data)
  tiny_noop_1t   same over a 1-row/1-partition range (1 task)
  worker_pids    distinct Python worker PIDs seen per job, over 5 jobs
                 (reuse check: should be stable after warmup)
  pickle_ms      driver-side cloudpickle time + size for the noop UDF and
                 a real kernel UDF (st_area)

Env knobs (new session per setting would be needed for configs; this probe
focuses on mechanism, not config tuning):
  PROBE_CPUS (default 32), PROBE_REPS (default 5)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = os.environ.get("PROBE_CPUS", "32")
REPS = int(os.environ.get("PROBE_REPS", "5"))


def median(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


def timed(fn, label, reps=REPS):
    fn()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(round(time.time() - t0, 4))
    print(f"{label:16s} median={median(ts):.3f}  reps={ts}", flush=True)
    return median(ts)


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.sql.functions import arrow_udf

    extra = {}
    for kv in os.environ.get("PROBE_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            extra[k] = v
    b = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("pytax-probe")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.ui.enabled", "false")
    )
    for k, v in extra.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    print("extra conf:", extra, flush=True)

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    df = spark.read.parquet(os.path.join(sf, "supplier.parquet")).select(
        "s_suppkey", "s_nationkey"
    )
    # replicate to ~600k rows like the bench input scale
    big = df
    for _ in range(4):
        big = big.union(big)
    big = big.repartition(int(CPUS)).cache()
    n = big.count()
    print(f"input rows={n} partitions={big.rdd.getNumPartitions()}", flush=True)

    import pyarrow as pa

    @arrow_udf("bigint")
    def noop(a: pa.Array) -> pa.Array:
        return a

    # ---- warm all workers
    big.select(noop("s_suppkey").alias("x")).write.format("noop").mode(
        "overwrite"
    ).save()

    def jvm_sum():
        big.selectExpr("sum(s_suppkey + s_nationkey) as s").collect()

    def arrow_noop():
        big.select(noop("s_suppkey").alias("x")).write.format("noop").mode(
            "overwrite"
        ).save()

    b8 = big.coalesce(8)
    def arrow_noop_p8():
        b8.select(noop("s_suppkey").alias("x")).write.format("noop").mode(
            "overwrite"
        ).save()

    b1 = big.coalesce(1)
    def arrow_noop_p1():
        b1.select(noop("s_suppkey").alias("x")).write.format("noop").mode(
            "overwrite"
        ).save()

    tiny = spark.range(0, 32, 1, 32)
    def tiny_noop():
        tiny.select(noop("id").alias("x")).write.format("noop").mode(
            "overwrite"
        ).save()

    tiny1 = spark.range(0, 1, 1, 1)
    def tiny_noop_1t():
        tiny1.select(noop("id").alias("x")).write.format("noop").mode(
            "overwrite"
        ).save()

    def jvm_tiny():
        tiny.selectExpr("sum(id) as s").collect()

    timed(jvm_sum, "jvm_sum")
    timed(arrow_noop, "arrow_noop_p32")
    timed(arrow_noop_p8, "arrow_noop_p8")
    timed(arrow_noop_p1, "arrow_noop_p1")
    timed(tiny_noop, "tiny_noop_32t")
    timed(tiny_noop_1t, "tiny_noop_1t")
    timed(jvm_tiny, "jvm_tiny_32t")

    # ---- worker PID stability across jobs (reuse check)
    @arrow_udf("bigint")
    def pid_udf(a: pa.Array) -> pa.Array:
        import os as _os

        return pa.array([_os.getpid()] * len(a), type=pa.int64())

    seen = []
    for i in range(5):
        pids = set(
            r.p
            for r in tiny.select(pid_udf("id").alias("p")).distinct().collect()
        )
        seen.append(pids)
    stable = all(s <= seen[0] | seen[1] for s in seen[2:])
    print(
        f"worker_pids jobs: sizes={[len(s) for s in seen]} "
        f"new_after_job2={[len(s - (seen[0] | seen[1])) for s in seen[2:]]}",
        flush=True,
    )

    # ---- driver-side pickle cost of a real kernel UDF
    from pyspark.serializers import CloudPickleSerializer

    ser = CloudPickleSerializer()
    import polars_st_spark as st

    area_col = st.st_area(F.col("g"))  # builds the Column; grab its udf func
    t0 = time.time()
    blob = ser.dumps((noop.func, None))
    t_noop = time.time() - t0
    print(f"pickle noop: {len(blob)} bytes in {t_noop*1000:.1f} ms", flush=True)
    from polars_st_spark.functions import scalar as _sc

    # time building + pickling the st_area udf function object
    t0 = time.time()
    c = st.st_area(F.col("g"))
    t_build = time.time() - t0
    print(f"st_area Column build: {t_build*1000:.1f} ms", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
