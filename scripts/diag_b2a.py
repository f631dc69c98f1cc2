"""Decompose b2a_relate_adjacent at a given scale dir: where do the
seconds go — st_rectangle construction, the relate kernel, or the extra
Python node from the mixed 200/250 evalTypes?"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as _bench  # noqa: E402
from scripts.bench_scale import _build_session  # noqa: E402

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "scale_data/sf1"
ncpu = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

spark = _build_session(str(ncpu))
from pyspark.sql import functions as F  # noqa: E402

import polars_st_spark as st  # noqa: E402

li = _bench._li_rects_cached(spark, sf_dir, ncpu)
n = li.count()
print("rows:", n, flush=True)

rect2 = st.st_rectangle(
    "x1", "y0", F.col("x1") + (F.col("x1") - F.col("x0")), "y1")


def t(tag, mk):
    reps = []
    for i in range(3):
        df = mk()
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        reps.append(round(time.time() - t0, 3))
    print(tag, reps, flush=True)


# (a) rect construction alone
t("a_rect_only      ", lambda: li.select(rect2.alias("r2")))
# (b) full b2a shape (construct + relate fused?)
t("b_full_relate    ", lambda: li.select(
    st.st_relate("rect", rect2).alias("m")))
# (c) relate over two precomputed cached rect columns
pre = li.select("rect", rect2.alias("r2")).cache()
pre.count()
t("c_relate_precomp ", lambda: pre.select(
    st.st_relate("rect", "r2").alias("m")))
# (d) count_distinct protocol shape (what the ramp times)
t("d_full_cd        ", lambda: li.select(
    F.count_distinct(st.st_relate("rect", rect2))))

print("== plan of full shape ==", flush=True)
print(li.select(st.st_relate("rect", rect2).alias("m"))
      ._jdf.queryExecution().explainString(
          spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
              "formatted")))
pre.unpersist()
li.unpersist()
spark.stop()
