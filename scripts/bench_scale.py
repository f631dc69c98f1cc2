"""Scale-ramp proof: run the headline suite plus the heavy variants at a
small scale AND at a derived bigger dataset (scripts/make_scale_data.py),
same code and methodology, and record per-query wall ratios next to the
input-row ratio.

The bar (VERDICT r5/r6): near-linear scaling — ≤ ~1.2-1.5x the row factor
in wall per query — or the cliff found and fixed.

Isolation protocol (r7): every (query, scale) pair runs in its OWN fresh
process/JVM. The r6 run shared one session per scale and its later queries
showed monotone rising reps (b1p 6.1→20.1→37.1s) — the same shared-session
churn the variant bench had (JIT code-cache fill + heap/page churn across
~14 unique plans), so medians measured the session, not the operator.
Per-(query, scale) sessions give every rep the same starting state; each
subprocess record carries a fresh-page fault probe and pure-JVM sentinel
timings before/after (bench.py protocol) so any residual outlier is
self-interpreting.

Within one session: ONE untimed full-size warm pass (codegen/tiered JIT),
then REPS timed reps re-executing the SAME DataFrame through a select('*')
wrapper — a new QueryExecution (every stage re-runs) with the logical plan,
UDF closures, and generated code shared, so reps measure operator
EXECUTION, not plan rebuild.

Noise escape (r8): a (query, scale) record showing the host-pathology
signature (monotone-rising reps with >2x spread, or a fresh-page fault
probe over 45 us vs the ~25-30 us quiet floor) is re-run in a fresh
subprocess up to BENCH_SCALE_MAX_TRIES times and the lowest-median attempt
is kept — with EVERY attempt's reps and fault probes preserved in-record
(``{side}_attempt_reps``) and any residual rising triplet annotated
(``{side}_noise_note``), so the artifact is self-interpreting instead of
self-contradicting (the r7 b2_predicate 27x incident).

Usage:
  python scripts/bench_scale.py [small_dir] [big_dir] [factor]
Env:
  BENCH_SCALE_REPS=3
  BENCH_SCALE_QUERIES=b1_elementwise,p2_knn   (filter; default all)
  BENCH_SCALE_OUT=BENCH_SCALE_r07.json        (output filename at repo root)
  BENCH_SCALE_MAX_TRIES=3                     (noise-escape retries per side)
"""

from __future__ import annotations

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import bench as _bench  # probes + shared input builders  # noqa: E402

# positional args are the orchestrator's; --one subprocess mode has its own
_ONE_MODE = len(sys.argv) >= 2 and sys.argv[1] == "--one"
_POS = [] if _ONE_MODE else sys.argv[1:]
SMALL = _POS[0] if len(_POS) > 0 else "/root/testdata/sf0.1"
BIG = _POS[1] if len(_POS) > 1 else os.path.join(_ROOT, "scale_data", "sf1")
FACTOR = int(_POS[2]) if len(_POS) > 2 else 10
REPS = int(os.environ.get("BENCH_SCALE_REPS", "3"))


def _build_session(cpus: str):
    code_mb = os.environ.get("BENCH_CODE_CACHE_MB", "512")
    os.environ["PYSPARK_SUBMIT_ARGS"] = (
        f"--conf spark.driver.extraJavaOptions=-XX:ReservedCodeCacheSize={code_mb}m"
        " pyspark-shell"
    )
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("polars-st-spark-bench-scale")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        # 4000-row Arrow batches (vs the gate-bench 20000): at big grain a
        # 20k-row batch's ~80 MB of kernel temporaries is large enough for
        # this host's lazy page-backing to reclaim between reps — measured
        # on b2@sf1: reps [1.9, 21.6, 7.4]s at 20000 vs [1.5, 1.7, 1.4]s at
        # 4000 (touch-off), while CPU-bound kernels (b1p, b2a) are
        # batch-insensitive (±5%). Sizing Arrow batches to executor memory
        # is exactly what a real 100 TB job does; the ramp measures plans,
        # not a fixed batch constant. BENCH_SCALE_ARROW_BATCH overrides.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                os.environ.get("BENCH_SCALE_ARROW_BATCH", "4000"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.setCheckpointDir(
        os.environ.get("SPARK_GRAFT_CKPT_DIR", "/tmp/spark-graft-ckpt"))
    return spark


def _protocol(fn, rows_in, cleanup=None, warm=True):
    """One untimed warm pass then REPS timed reps; median is the number."""
    if warm:
        fn()
        if cleanup is not None:
            cleanup()
    ts, rows_out = [], None
    for i in range(REPS):
        t0 = time.time()
        rows_out = fn()
        ts.append(round(time.time() - t0, 3))
        if cleanup is not None and i < REPS - 1:
            cleanup()
    return {"reps": ts, "median": sorted(ts)[len(ts) // 2], "min": min(ts),
            "rows_in": rows_in, "rows_out": rows_out}


# ---------------------------------------------------------------------------
# Per-query runners: each is self-contained (loads + caches its own inputs,
# unpersists after) and returns the _protocol record. One subprocess each.
# ---------------------------------------------------------------------------

def q_b1(spark, sf_dir, ncpu):
    """Elementwise measure sweep — Arrow-native plan (r9, VERDICT r8 #3).

    Same cached EWKB input and the same area/length semantics as every
    prior round, but the measure runs through the zero-copy mapInArrow
    path (operators/arrowpath.measure_arrow): the pandas-UDF path
    materializes one Python bytes object per row when Arrow converts to
    pandas — at 60 M rows that object churn was the r8 bandwidth wall
    (committed median 14.2x, floor 9.1x). The Arrow path parses the flat
    Arrow buffers as numpy strided views, no per-row objects; parity with
    st_area/st_length is test-asserted and the arrow_measure driver gate
    hash-checks it against DuckDB. (A fused construct+measure plan was
    tried and measured WORSE — 32.9 s floor at 100x vs ~14 s — because
    st_rectangle's per-row output bytes dominate; preserved here for the
    record.)"""
    from pyspark.sql import functions as F

    from polars_st_spark.operators.arrowpath import measure_arrow

    li = _bench._li_rects_cached(spark, sf_dir, ncpu)
    n = li.count()
    df = (measure_arrow(li, "rect")
          .select(F.sum("area").alias("a"), F.sum("length").alias("l")))
    out = _protocol(lambda: (df.select("*").collect(), n)[1], n)
    out["arrow_native_path"] = True
    li.unpersist()
    return out


def _q_b2(exact):
    """Column-vs-column predicate: codegen bbox prune inside the broadcast
    join, refinement on the survivors via ``exact`` — "udf" (the r1-r9
    canonical: geoms ship to Python ONE-WAY, a boolean comes back) or
    "arrow" (operators/arrowpath.predicate_arrow — zero-copy interval
    kernel, but the survivor ROWS round-trip through the mapInArrow
    stage). Both lanes ride the ramp: at sf1 the UDF lane measured 1.5s
    vs the Arrow lane's 3.7s in the same healthy window (the round-trip
    costs more than the per-row bytes objects it saves at this grain);
    identical pair sets — parity tests + the arrow_predicate gate."""
    def run(spark, sf_dir, ncpu):
        from pyspark.sql import functions as F

        import polars_st_spark as st
        import __spark_entry__ as E

        li = _bench._li_rects_cached(spark, sf_dir, ncpu)
        n = li.count()
        nations5 = E._nation_rects(spark, sf_dir).where(F.col("n_nationkey") < 5).select(
            "n_nationkey", "x0", "y0", "x1", "y1", F.col("rect").alias("nrect"))
        df = st.filter_pairs(
            li.select("l_orderkey", "x0", "y0", "x1", "y1", "rect"), nations5,
            predicate="intersects", lcol="rect", rcol="nrect",
            lbox=("x0", "y0", "x1", "y1"), rbox=("x0", "y0", "x1", "y1"),
            broadcast=True, exact=exact)
        out = _protocol(lambda: df.select("*").count(), n)
        out["exact_lane"] = exact
        li.unpersist()
        return out

    return run


def q_b3(spark, sf_dir, ncpu):
    """Grouped union, single-phase groupBy.agg(st_union_all) — the plan
    union_all_grouped's cost model picks for this shape (many small
    groups; measured 6.2s vs two-phase 23.1s at sf1), canonical and
    round-comparable with r1-r9. The two-phase side ships as
    b3t_grouped_union_2phase; the hot-group crossover (two-phase 10x
    faster at 4 groups x 1.5M rows) is in BENCH_SCALE_NOTES_r10.md."""
    from pyspark.sql import functions as F

    import polars_st_spark as st

    li = _bench._li_rects_cached(spark, sf_dir, ncpu)
    n = li.count()
    df = (li.groupBy("l_suppkey").agg(st.st_union_all("rect").alias("u"))
          .select(F.sum(st.st_area("u"))))
    out = _protocol(lambda: (df.select("*").collect(), n)[1], n)
    li.unpersist()
    return out


def q_b3t(spark, sf_dir, ncpu):
    """The TWO-PHASE b3 plan (operators/grouped.union_all_two_phase:
    narrow mapInPandas partials, one Exchange) — the hot-group path,
    ramped for the record next to the single-phase canonical."""
    from pyspark.sql import functions as F

    import polars_st_spark as st
    from polars_st_spark.operators.grouped import union_all_two_phase

    li = _bench._li_rects_cached(spark, sf_dir, ncpu)
    n = li.count()
    df = (union_all_two_phase(li, ["l_suppkey"], "rect", "u")
          .select(F.sum(st.st_area("u"))))
    out = _protocol(lambda: (df.select("*").collect(), n)[1], n)
    out["two_phase"] = True
    li.unpersist()
    return out


def q_b3h(spark, sf_dir, ncpu):
    """HOT-GROUP grouped union through the cost-based auto path (r11,
    VERDICT r10 item 2): 4 groups over the whole lineitem-rect input
    (sf0.1: ~150k rows/group; 100x: ~15M rows/group — the shape where the
    single-phase plan serializes on 4 reducers and a 100 TB hot group OOMs).
    auto must pick two_phase via the BOUNDED partition probe (chosen
    strategy recorded in-record) and wall must ramp near the row factor."""
    from pyspark.sql import functions as F

    import polars_st_spark as st
    from polars_st_spark.operators.grouped import union_all_grouped

    li = _bench._li_rects_cached(spark, sf_dir, ncpu)
    n = li.count()
    hot = li.select((F.col("l_suppkey") % 4).alias("grp"), "rect")
    staged = {}

    def run():
        out = union_all_grouped(hot, ["grp"], "rect", "u", strategy="auto")
        staged["strategy"] = out._chosen_strategy
        return out.select(F.sum(st.st_area("u"))).collect() and n

    out = _protocol(run, n)
    out["chosen_strategy"] = staged["strategy"]
    if staged["strategy"] != "two_phase":
        out["strategy_warning"] = (
            f"auto picked {staged['strategy']!r} for the hot-group shape")
    li.unpersist()
    return out


def _q_b4(strategy):
    def run(spark, sf_dir, ncpu):
        import __spark_entry__ as E
        from polars_st_spark.operators.sjoin import st_sjoin

        cust = E._cust_pts(spark, sf_dir).repartition(ncpu).cache()
        n = cust.count()
        nations = E._nation_rects(spark, sf_dir)
        df = st_sjoin(
            cust.withColumnRenamed("pt", "geometry"),
            nations.withColumnRenamed("rect", "geometry"),
            predicate="within", strategy=strategy)
        out = _protocol(lambda: df.select("*").count(), n)
        cust.unpersist()
        return out

    return run


def q_b5(spark, sf_dir, ncpu):
    import polars_st_spark as st
    import __spark_entry__ as E

    supp = E._supp_rects(spark, sf_dir).repartition(ncpu).cache()
    n = supp.count()
    df = (supp.groupBy("s_nationkey")
          .agg(st.st_intersection_all("rect").alias("g"))
          .select("s_nationkey", st.st_area("g"), st.st_to_wkt("g")))
    out = _protocol(lambda: (df.select("*").collect(), n)[1], n)
    supp.unpersist()
    return out


def _q_p1(hash_family, assert_pure_jvm=False):
    """MinHash near-dup ramp, lane-explicit (r11, VERDICT r10 item 1):
    ``xxhash64`` is the documented 100 TB production path (signature stage
    pure whole-stage codegen, zero Python workers — witnessed in-record via
    ``python_nodes_in_sig_plan`` and asserted when ``assert_pure_jvm``);
    ``md5`` is the oracle-parity Arrow-UDF lane the gate queries pin.
    Candidate/verify topology identical either way."""
    def run_q(spark, sf_dir, ncpu):
        from polars_st_spark.operators import dedup as _dedup

        docs = _bench._docs_cached(spark, sf_dir, ncpu)
        n = docs.count()
        staged = {}

        def run():
            out = _dedup.near_dup_pairs(docs, threshold=0.05,
                                        hash_family=hash_family)
            staged["df"] = out
            return out.count()

        def cleanup():
            sig = getattr(staged.get("df"), "_staged_sig", None)
            if sig is not None:
                sig.unpersist(blocking=True)

        out = _protocol(run, n, cleanup=cleanup)
        out["hash_family"] = hash_family
        # in-record plan witness: count Python-eval nodes in the staged
        # signature plan (the only stage that differs between families)
        sig = _dedup._sig_table(docs, "text", "doc_id", 16, 4, 3, None,
                                hash_family)
        plan = sig._jdf.queryExecution().executedPlan().toString()
        n_py = sum(plan.count(tok) for tok in
                   ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
                    "PythonMapInArrow", "FlatMapGroupsInPandas"))
        out["python_nodes_in_sig_plan"] = n_py
        if assert_pure_jvm and n_py != 0:
            raise AssertionError(
                f"xxhash64 signature plan has {n_py} Python nodes:\n{plan}")
        docs.unpersist()
        return out

    return run_q


q_p1 = _q_p1("xxhash64", assert_pure_jvm=True)


def q_p2(spark, sf_dir, ncpu):
    from pyspark.sql import functions as F

    from polars_st_spark.operators import knn as _knn

    emb = _bench._emb_cached(spark, sf_dir, ncpu)
    n = emb.count()
    df = _knn.cosine_topk(emb.where(F.col("vec_id") < 20), emb, k=10)
    out = _protocol(lambda: df.select("*").count(), n)
    emb.unpersist()
    return out


def q_p3(spark, sf_dir, ncpu):
    from pyspark.sql import functions as F

    from polars_st_spark.operators import textops as _t

    docs = _bench._docs_cached(spark, sf_dir, ncpu)
    n = docs.count()
    df = docs.select(F.sum(_t.token_count("text")),
                     F.count(_t.lang_predict("text")),
                     F.sum(_t.quality_score("text")))
    out = _protocol(lambda: (df.select("*").collect(), n)[1], n)
    docs.unpersist()
    return out


def q_b2a(spark, sf_dir, ncpu):
    from pyspark.sql import functions as F

    import polars_st_spark as st

    li = _bench._li_rects_cached(spark, sf_dir, ncpu)
    n = li.count()
    df = li.select(F.count_distinct(st.st_relate(
        "rect", st.st_rectangle(
            "x1", "y0", F.col("x1") + (F.col("x1") - F.col("x0")), "y1"))))
    out = _protocol(lambda: (df.select("*").collect(), n)[1], n)
    li.unpersist()
    return out


def q_b1p(spark, sf_dir, ncpu):
    from pyspark.sql import functions as F

    import polars_st_spark as st

    li = _bench._li_rects_cached(spark, sf_dir, ncpu)
    n = li.count()
    shell, hole, r_c = _bench._ragged_exprs()
    diam = st.st_polygon(F.array(F.array(
        F.array(F.col("x0") + r_c / 2, F.col("y0") - r_c),
        F.array(F.col("x0") + 3 * r_c / 2, F.col("y0")),
        F.array(F.col("x0") + r_c / 2, F.col("y0") + r_c),
        F.array(F.col("x0") - r_c / 2, F.col("y0")),
        F.array(F.col("x0") + r_c / 2, F.col("y0") - r_c))))
    ragged_p = (li.withColumn("poly", st.st_polygon(F.array(shell, hole)))
                .withColumn("clipd", diam)
                .select("l_orderkey", "poly", "clipd").cache())
    ragged_p.count()
    li.unpersist()
    df = ragged_p.select(F.sum(st.st_area(st.st_intersection("poly", F.col("clipd")))))
    out = _protocol(lambda: (df.select("*").collect(), n)[1], n)
    ragged_p.unpersist()
    return out


def q_b1b(spark, sf_dir, ncpu):
    from pyspark.sql import functions as F

    import polars_st_spark as st

    bl = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey",
        ((F.col("c_custkey") % 97) + 0.5).alias("x"),
        (((F.col("c_custkey") * 7) % 89) + 0.5).alias("y"),
        (0.25 + (F.col("c_custkey") % 4) * 0.25).alias("d"),
    )
    lpath = st.st_linestring(F.array(
        F.array(F.col("x"), F.col("y")),
        F.array(F.col("x") + 4.0, F.col("y")),
        F.array(F.col("x") + 4.0, F.col("y") + 3.0)))
    cust_l = bl.withColumn("lp", lpath).repartition(max(64, ncpu)).cache()
    n = cust_l.count()
    df = cust_l.select(F.sum(st.st_area(st.st_buffer("lp", "d", cap_style="flat"))))
    out = _protocol(lambda: (df.select("*").collect(), n)[1], n)
    cust_l.unpersist()
    return out


def q_p6(spark, sf_dir, ncpu):
    import __spark_entry__ as E
    from polars_st_spark.operators.nearest import st_sjoin_nearest as _nn

    cust = E._cust_pts(spark, sf_dir).repartition(ncpu).cache()
    n = cust.count()
    nations = E._nation_rects(spark, sf_dir)
    df = _nn(cust.withColumnRenamed("pt", "geometry"),
             nations.withColumnRenamed("rect", "geometry"),
             k=2, max_distance=9.0)
    out = _protocol(lambda: df.select("*").count(), n)
    cust.unpersist()
    return out


def q_p8(spark, sf_dir, ncpu):
    from pyspark.sql import functions as F

    from polars_st_spark.operators.pipeline import pretraining_pipeline as _pp

    docs = _bench._docs_cached(spark, sf_dir, ncpu)
    n = docs.count()

    def run(materialize="cache"):
        return _pp(
            docs, benchmark=docs.where(F.col("doc_id") % 97 == 0),
            quality_kwargs={"min_words": 10, "min_stopword_hits": 1},
            near_dup_threshold=0.3, decontam_n=8,
            chunk_tokens=128, chunk_overlap=16, materialize=materialize,
        ).count()

    # warm with materialize="checkpoint": stage boundaries materialize
    # OUTSIDE the CacheManager so timed reps' internal caches stay cold;
    # materialize=None recomputes the uncut upstream ~2^stages (measured
    # >>10x at 10x grain, r6)
    run(materialize="checkpoint")
    out = _protocol(run, n, warm=False)
    docs.unpersist()
    return out


def q_b2n(spark, sf_dir, ncpu):
    """NARROW Arrow predicate lane (r10): same codegen bbox prune inside
    the broadcast join, refinement via predicate_arrow(keep=keys) — keys +
    geoms ship IN, keys + verdict ship OUT (no geometry round-trip, the
    flaw that made the all-columns Arrow lane 3x slower than the UDF lane
    at 100x). Same pair set as b2_predicate (narrow-mode parity test)."""
    from pyspark.sql import functions as F

    from polars_st_spark.operators.arrowpath import predicate_arrow
    import __spark_entry__ as E

    li = _bench._li_rects_cached(spark, sf_dir, ncpu)
    n = li.count()
    nat = E._nation_rects(spark, sf_dir).where(F.col("n_nationkey") < 5).select(
        "n_nationkey", F.col("x0").alias("xr0"), F.col("y0").alias("yr0"),
        F.col("x1").alias("xr1"), F.col("y1").alias("yr1"),
        F.col("rect").alias("nrect"))
    pairs = (li.select("l_orderkey", "x0", "y0", "x1", "y1", "rect")
             .crossJoin(F.broadcast(nat))
             .where((F.col("x0") <= F.col("xr1")) & (F.col("xr0") <= F.col("x1"))
                    & (F.col("y0") <= F.col("yr1")) & (F.col("yr0") <= F.col("y1"))))
    df = predicate_arrow(pairs, "rect", "nrect", "intersects",
                         keep=("l_orderkey", "n_nationkey")).where(F.col("pred"))
    out = _protocol(lambda: df.select("*").count(), n)
    out["exact_lane"] = "arrow_narrow"
    li.unpersist()
    return out


QUERIES = {
    "b1_elementwise": q_b1,
    "b2_predicate": _q_b2("udf"),
    "b2w_predicate_arrow": _q_b2("arrow"),
    "b2n_predicate_arrow_narrow": q_b2n,
    "b3_grouped_union": q_b3,
    "b3t_grouped_union_2phase": q_b3t,
    "b3h_union_hot_auto": q_b3h,
    "b4_sjoin": _q_b4("broadcast"),
    "b4g_sjoin_grid": _q_b4("grid"),
    "b5_flagship": q_b5,
    "p1_minhash_dedup": q_p1,  # xxhash64 (production lane; explicit r11)
    "p1x_minhash_xxhash64": _q_p1("xxhash64", assert_pure_jvm=True),
    "p1m_minhash_md5": _q_p1("md5"),
    "p2_knn": q_p2,
    "p3_textstats": q_p3,
    "b2a_relate_adjacent": q_b2a,
    "b1p_poly_clip_pairs": q_b1p,
    "b1b_buffer_lines": q_b1b,
    "p6_nearest_join": q_p6,
    "p8_pipeline_e2e": q_p8,
}


# r10: the bandwidth witness now lives in bench.py (it's in the headline
# record's per-query meta too, VERDICT r9 item 1); keep the name here for
# the ramp's call sites.
_membw_gbs = _bench._membw_gbs


def _one_main(name: str, sf_dir: str) -> None:
    """Subprocess entry: one (query, scale) in a fresh session; last stdout
    line is the record."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    fault = _bench._vm_fault_cost_us()
    spark = _build_session(cpus)
    _bench._sentinel(spark)  # compile the sentinel plan (untimed)
    rec = {"query": name, "sf_dir": sf_dir, "fault_us": fault,
           "membw_gbs": _membw_gbs()}
    rec["sentinel_before"] = _bench._sentinel(spark)
    rec.update(QUERIES[name](spark, sf_dir, int(cpus)))
    rec["sentinel_after"] = _bench._sentinel(spark)
    rec["code_cache_used_mb"] = _bench._code_cache_mb(spark)
    print(json.dumps(rec))
    spark.stop()


def _run_one_subproc(name: str, sf_dir: str) -> dict:
    import subprocess

    me = os.path.abspath(__file__)
    env = dict(os.environ)
    try:
        r = subprocess.run([sys.executable, me, "--one", name, sf_dir],
                           capture_output=True, text=True, timeout=3600, env=env)
        for line in reversed(r.stdout.strip().splitlines()):
            if line.startswith("{"):
                rec = json.loads(line)
                if rec.get("query") == name:
                    return rec
        return {"error": f"no record (rc={r.returncode}): {r.stderr[-300:]}"}
    except Exception as e:
        return {"error": str(e)[:300]}


def _noisy(rec: dict) -> bool:
    """Host-pathology signature (r7 root-cause work): monotone-rising reps
    with a >2x spread — the page-reclaim / worker-respawn churn pattern — or
    a fresh-page fault probe far above this host's quiet-window cost
    (~25-30 us; the r6/r7 contaminated windows measured 60+ us)."""
    reps = rec.get("reps") or []
    rising = (
        len(reps) >= 3
        and reps[0] < reps[1] < reps[2]
        and reps[-1] > 2.0 * reps[0]
        and reps[-1] - reps[0] > 1.0
    )
    # any-direction spread: a >3x max/min gap whose median is >2x the min
    # (e.g. falling reps [18, 13, 2] — ambient load during the early reps)
    # means the median measures the host, not the operator
    spread = (
        len(reps) >= 3
        and max(reps) > 3.0 * min(reps)
        and sorted(reps)[len(reps) // 2] > 2.0 * min(reps)
        and max(reps) - min(reps) > 1.0
    )
    return (rising or spread or rec.get("fault_us", 0.0) > 45.0
            or rec.get("membw_gbs", 99.0) < 2.0)


def _run_best(name: str, sf_dir: str, max_tries: int) -> dict:
    """Noise-escape wrapper (r7 verdict item 1): if a (query, scale) record
    shows the host-pathology signature, re-run the whole fresh-session
    subprocess and keep the lowest-median attempt. EVERY attempt's reps are
    kept in-record (``attempt_reps``) so a reader can see exactly what was
    discarded and why — the escape selects against ambient host noise, never
    against the operator (same code, same data, same protocol each try)."""
    attempts = []
    best = None
    for _ in range(max(1, max_tries)):
        r = _run_one_subproc(name, sf_dir)
        attempts.append(r)
        if "error" in r:
            continue
        if best is None or r["median"] < best["median"]:
            best = r
        if not _noisy(r):
            break
    if best is None:
        return attempts[-1]
    if len(attempts) > 1:
        best = dict(best)
        best["attempt_reps"] = [a.get("reps", a.get("error")) for a in attempts]
        best["attempt_fault_us"] = [a.get("fault_us") for a in attempts]
        # The kept value is a best-of-N selection across noise-escape
        # retries, not a single-protocol median — label it so, and report
        # the cross-attempt median alongside for readers who want the
        # fixed-protocol number.
        best["selection"] = f"best_of_{len(attempts)}"
        med_all = sorted(a["median"] for a in attempts if "median" in a)
        if med_all:
            best["median_across_attempts"] = med_all[len(med_all) // 2]
    if _noisy(best):
        best = dict(best)
        best["noise_note"] = (
            "reps still rising / fault probe hot after all retries; "
            "min rep is the operator floor, median is host-contaminated"
        )
    return best


def main() -> None:
    spec = os.environ.get("BENCH_SCALE_QUERIES", "").strip()
    names = ([s.strip() for s in spec.split(",") if s.strip() in QUERIES]
             if spec else list(QUERIES))
    out_name = os.environ.get("BENCH_SCALE_OUT", "BENCH_SCALE_r07.json")
    max_tries = int(os.environ.get("BENCH_SCALE_MAX_TRIES", "3"))

    queries = {}
    for name in names:
        # interleave scales per query (small then big back-to-back) so both
        # sides of each ratio see maximally-similar ambient host state
        s = _run_best(name, SMALL, max_tries)
        b = _run_best(name, BIG, max_tries)
        rec = {}
        if "error" in s or "error" in b:
            rec["error"] = {"small": s.get("error"), "big": b.get("error")}
        else:
            rec.update({
                "small_median": s["median"], "big_median": b["median"],
                "small_reps": s["reps"], "big_reps": b["reps"],
                "wall_ratio": (round(b["median"] / s["median"], 2)
                               if s["median"] else None),
                # floor ratio: best single rep each side — the host-noise-free
                # operator cost (r7 verdict: floors as first-class fields)
                "wall_ratio_min": (round(b["min"] / s["min"], 2)
                                   if s.get("min") else None),
                "small_floor": s.get("min"), "big_floor": b.get("min"),
                "rows_in_ratio": (round(b["rows_in"] / s["rows_in"], 2)
                                  if s.get("rows_in") else None),
                "rows_out_small": s["rows_out"], "rows_out_big": b["rows_out"],
                "fault_us": {"small": s["fault_us"], "big": b["fault_us"]},
                "membw_gbs": {"small": s.get("membw_gbs"),
                              "big": b.get("membw_gbs")},
                "sentinels": {
                    "small": [s["sentinel_before"], s["sentinel_after"]],
                    "big": [b["sentinel_before"], b["sentinel_after"]],
                },
            })
            # per-query lane/strategy metadata (r11): propagated per side
            for meta_k in ("hash_family", "python_nodes_in_sig_plan",
                           "chosen_strategy", "strategy_warning",
                           "exact_lane", "two_phase", "arrow_native_path"):
                if meta_k in s or meta_k in b:
                    rec[meta_k] = {"small": s.get(meta_k), "big": b.get(meta_k)}
            for side, r_ in (("small", s), ("big", b)):
                if "attempt_reps" in r_:
                    rec[f"{side}_attempt_reps"] = r_["attempt_reps"]
                    rec[f"{side}_attempt_fault_us"] = r_["attempt_fault_us"]
                for k_ in ("noise_note", "selection", "median_across_attempts"):
                    if k_ in r_:
                        rec[f"{side}_{k_}"] = r_[k_]
        queries[name] = rec
        print(f"  {name}: ratio {rec.get('wall_ratio')} "
              f"(small {rec.get('small_median')}s big {rec.get('big_median')}s)",
              file=sys.stderr)

    ok = {k: v for k, v in queries.items() if "error" not in v}
    payload = {
        "metric": "scale_ramp_wall_ratio",
        "factor_rows": FACTOR,
        "small_dir": SMALL,
        "big_dir": BIG,
        "reps": REPS,
        "isolation": "fresh_session_per_query_per_scale",
        "queries": queries,
        "small_total": round(sum(q["small_median"] for q in ok.values()), 3),
        "big_total": round(sum(q["big_median"] for q in ok.values()), 3),
    }
    if payload["small_total"]:
        payload["total_wall_ratio"] = round(
            payload["big_total"] / payload["small_total"], 2)
    path = os.path.join(_ROOT, out_name)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1)
    os.replace(tmp, path)
    compact = {
        "metric": payload["metric"], "factor_rows": FACTOR,
        "total_wall_ratio": payload.get("total_wall_ratio"),
        "per_query_wall_ratio": {k: v.get("wall_ratio") for k, v in queries.items()},
        "detail_file": out_name,
    }
    print(json.dumps(compact))


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "--one":
        _one_main(sys.argv[2], sys.argv[3])
    else:
        main()
