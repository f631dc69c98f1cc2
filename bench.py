"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`queries`/`value` are FIRST-shot timings (comparable with rounds 1-4);
`queries_median3`/`value_median3` are per-query medians of 3 reps — the
variance-aware number (identical-code totals spread 7.3-12.5s on this VM,
so single shots cannot answer 2x-contract questions; see README "Bench
variance"). `queries_reps` carries all raw reps for audit. Variants run
ONE untimed full-size warm pass then a single timed shot (r5: per-plan
JVM codegen/JIT plus this host's first-touch fault storms land on
whichever variant runs cold — 61.8s vs 1.8s steady was observed for the
same variant across runs; internal caches staged by a warm pass are
unpersisted so the timed shot never CacheManager-hits warm data).
`vm_fault_us_per_page` records host health; the single-process floor is
re-measured in the same run (`floor_same_run`) with median-of-`floor_reps`
per query — symmetric with queries_median3. The printed line is a COMPACT
subset (the driver captures ~2 KB of stdout tail); the complete record
(reps, variants, per-query ratios) is written to BENCH_FULL.json.

Query set maps to BASELINE.md:
- b1_elementwise: st_area+st_length over lineitem-derived rects (B1)
- b2_predicate:   st_contains column-vs-column over joined pairs (B2)
- b3_grouped_union: groupBy(l_suppkey) → union_all → area (B3, flagship union)
- b4_sjoin:       customer points × nation rects broadcast STRtree join (B4)
- b5_flagship:    groupBy → intersection_all → area + wkt (B5)
- p1_minhash_dedup: minhash-LSH near-dup pairs over documents
- p2_knn:         brute-force cosine top-10, 20 queries × corpus
- p3_textstats:   token counts + lang id + quality over documents
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _vm_fault_cost_us() -> float:
    """Measure this host's FRESH-page first-touch cost (µs/4KiB page) so
    every bench record carries the VM-health context needed to interpret
    it: this environment backs guest memory lazily (README "Bench
    variance"), the cost ranges ~0.2µs (fully backed) to ~95µs (cold or
    reclaimed), and it drifts over the VM's lifetime — identical code
    measured 6.1s→17.6s medians as this number rose. 64 MiB probe, freed
    immediately."""
    import numpy as np

    n_pages = (64 << 20) >> 12
    t0 = time.time()
    buf = np.empty(n_pages * 512, dtype=np.float64)
    buf[::512] = 1.0
    dt = time.time() - t0
    del buf
    return round(dt / n_pages * 1e6, 2)


def _refresh_floor(sf_dir: str) -> bool:
    """Re-measure the single-process floor IN THIS RUN (untimed) so the
    vs_floor ratios compare engine and floor under the SAME host state —
    on this VM the fault cost drifts over its lifetime (see
    _vm_fault_cost_us), and a floor measured on a healthier host makes
    the ratio meaningless in either direction. Falls back to the
    committed BASELINE_MEASURED.json when the script fails.
    BENCH_FLOOR_REFRESH=0 disables."""
    import subprocess

    if os.environ.get("BENCH_FLOOR_REFRESH", "1") == "0":
        return False
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scripts", "baseline_single_node.py")
    try:
        r = subprocess.run([sys.executable, script, sf_dir],
                           capture_output=True, timeout=900)
        return r.returncode == 0
    except Exception:
        return False


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    vm_fault_us = _vm_fault_cost_us()
    floor_same_run = _refresh_floor(sf_dir)
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("polars-st-spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # the p8 warm pass uses materialize="checkpoint", whose concomp stage
    # prefers RELIABLE checkpointing (the 100 TB posture) — needs a dir
    spark.sparkContext.setCheckpointDir(
        os.environ.get("SPARK_GRAFT_CKPT_DIR", "/tmp/spark-graft-ckpt"))

    import polars_st_spark as st
    from polars_st_spark.operators import dedup as _dedup
    from polars_st_spark.operators import knn as _knn
    from polars_st_spark.operators import textops as _t
    from polars_st_spark.operators.sjoin import st_sjoin
    import __spark_entry__ as E

    # Single-file local parquet arrives as 1-3 scan partitions, which would
    # serialize every downstream expression on a few cores. At 100 TB the
    # scan has thousands of splits; give the local stand-in the same
    # parallelism.
    ncpu = int(cpus)
    li_rects = E._li_rects(spark, sf_dir).repartition(ncpu).cache()
    li_rects.count()  # materialize input once so timings measure the operator
    cust = E._cust_pts(spark, sf_dir).repartition(ncpu).cache()
    cust.count()
    nations = E._nation_rects(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(ncpu).cache()
    docs.count()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(ncpu).cache()
    emb.count()

    # Session warmup: spin up the Arrow Python workers and JIT the heavy
    # expression/codegen paths on a 100-row slice so per-query timings
    # measure the operators, not first-use compilation. Every measured query
    # still runs exactly once.
    # (a near_dup_pairs warmup was tried and removed: its multi-stage
    # shuffle leaves the session in a state that triples the next big
    # Arrow-transfer query — see round-2 notes)
    # limit(100) only touches 1 of N scan partitions, so the first measured
    # geometry query used to pay ~N Python-worker cold starts (round-2 b1
    # regressed 1.4s -> 9.8s from exactly this). A sampled full-partition
    # pass spins up every worker with ~2% of the rows.
    warm = docs.limit(100)
    warm.select(
        F.sum(_t.token_count("text")),
        F.count(_t.lang_predict("text")),
        F.sum(_t.quality_score("text")),
    ).collect()
    # 25% slice for the geometry warmups: at 2% the first timed geometry
    # query still paid ~0.8s of worker/JIT ramp (measured r4: first run
    # 1.43s vs 0.57s steady-state; at 25% the first run lands at 0.66s).
    li_rects.sample(fraction=0.25, seed=1).select(
        F.sum(st.st_area("rect")), F.sum(st.st_length("rect"))
    ).collect()
    cust.sample(fraction=0.25, seed=1).select(F.count(st.st_x("pt"))).collect()
    # compile the wide cosine/rank expression tree once (first-use codegen of
    # the aggregate dot product dominated a cold p2 at ~10s)
    _knn.cosine_topk(emb.limit(1), emb.limit(50), k=1).count()
    # compile the dedup higher-order-function tree once on a ~2% sampled
    # slice: first-use codegen/JIT dominated a cold p1 at 4-6s vs its ~1s
    # steady state (measured r4). A limit(200) warmup touches ONE scan
    # partition (the round-2 b1 lesson) and left the xxhash64 headline
    # varying 1.3-4.2s across runs; the fraction sample touches every
    # partition with ~2% of the rows. materialize=None keeps the warmup
    # plan out of the cache manager, so the measured run's cache is cold.
    # (the r2-era warmup that was removed ran FULL-SIZE and its shuffle
    # state tripled the next Arrow query; the 2% slice shows no such effect)
    _dedup.near_dup_pairs(
        docs.sample(fraction=0.02, seed=1), threshold=0.05, materialize=None
    ).count()

    def timed(fn, warm=True, cleanup=None):
        # One untimed full-size warm run, then a single timed shot: the
        # warm run eats the per-plan JVM codegen/tiered-JIT cost AND this
        # host's first-touch fault storms (see _vm_fault_cost_us), both of
        # which otherwise land on whichever variant the VM picks on —
        # 61.8s vs a 1.8s steady state was observed for the SAME variant
        # across two runs. ``cleanup`` unpersists internal caches the warm
        # run staged, so the timed shot never CacheManager-hits warm-run
        # data (the p1 rep lesson). warm=False keeps the old single-shot
        # for callables that already warmed themselves.
        if warm:
            fn()
            if cleanup is not None:
                cleanup()
        t0 = time.time()
        fn()
        return round(time.time() - t0, 3)

    # Headline queries run THREE reps each: `queries` keeps the FIRST shot
    # (round-over-round comparable with r1-r4), `queries_median3` the
    # median. Identical-code totals on this VM spread 7.3-12.5s across runs
    # (ambient noisy-neighbor; the r3->r4 "b1 regression" 0.58->1.26s was
    # exactly this — standalone steady state is 0.45-0.63s), so single
    # shots cannot resolve 2x-contract questions; the median can. A
    # min-over-reps variant stays rejected: operators that cache internally
    # (near_dup_pairs' staged signature table) get a CacheManager hit on
    # later reps — p1 unpersists its staged table between reps so every
    # rep does full work.
    queries = {}
    queries_reps = {}

    def headline(name, fn, cleanup=None, reps=3):
        ts = []
        for i in range(reps):
            t0 = time.time()
            fn()
            ts.append(round(time.time() - t0, 3))
            if cleanup is not None and i < reps - 1:
                cleanup()
        queries[name] = ts[0]
        queries_reps[name] = ts

    def med3(ts):
        return sorted(ts)[len(ts) // 2]

    headline(
        "b1_elementwise",
        lambda: li_rects.select(
            F.sum(st.st_area("rect")).alias("a"),
            F.sum(st.st_length("rect")).alias("l"),
        ).collect(),
    )

    # Column-vs-column predicate over all pairs, via the library's documented
    # scale path (filter_pairs): bbox prune on the ingest-native coordinate
    # columns inside the join condition (codegen), exact predicate UDF only on
    # the prune survivors. Same result as sum(st_intersects) over every pair.
    nations5 = nations.where(F.col("n_nationkey") < 5).select(
        "n_nationkey", "x0", "y0", "x1", "y1", F.col("rect").alias("nrect")
    )
    headline(
        "b2_predicate",
        lambda: st.filter_pairs(
            li_rects.select("l_orderkey", "x0", "y0", "x1", "y1", "rect"),
            nations5,
            predicate="intersects",
            lcol="rect",
            rcol="nrect",
            lbox=("x0", "y0", "x1", "y1"),
            rbox=("x0", "y0", "x1", "y1"),
            broadcast=True,
        ).count(),
    )

    headline(
        "b3_grouped_union",
        lambda: li_rects.groupBy("l_suppkey")
        .agg(st.st_union_all("rect").alias("u"))
        .select(F.sum(st.st_area("u"))).collect(),
    )

    headline(
        "b4_sjoin",
        lambda: st_sjoin(
            cust.withColumnRenamed("pt", "geometry"),
            nations.withColumnRenamed("rect", "geometry"),
            predicate="within",
            strategy="broadcast",
        ).count(),
    )

    headline(
        "b5_flagship",
        lambda: E._supp_rects(spark, sf_dir)
        .groupBy("s_nationkey")
        .agg(st.st_intersection_all("rect").alias("g"))
        .select("s_nationkey", st.st_area("g"), st.st_to_wkt("g"))
        .collect(),
    )

    _p1_last = {}

    def _p1():
        out = _dedup.near_dup_pairs(docs, threshold=0.05)
        _p1_last["df"] = out
        out.count()

    def _p1_cleanup():
        sig = getattr(_p1_last.get("df"), "_staged_sig", None)
        if sig is not None:
            sig.unpersist(blocking=True)

    headline("p1_minhash_dedup", _p1, cleanup=_p1_cleanup)

    headline(
        "p2_knn",
        lambda: _knn.cosine_topk(  # default strategy: Arrow/BLAS local top-k
            emb.where(F.col("vec_id") < 20), emb, k=10
        ).count(),
    )

    headline(
        "p3_textstats",
        lambda: docs.select(
            F.sum(_t.token_count("text")),
            F.count(_t.lang_predict("text")),
            F.sum(_t.quality_score("text")),
        ).collect(),
    )

    # scale-path variants, reported separately so the headline total stays
    # comparable across rounds (same 8 canonical queries):
    # - p1 with the md5 hash family (the oracle-parity family; the headline
    #   now runs the pure-JVM xxhash64 default — zero Python workers)
    # - p2 with the pure-SQL aggregate(zip_with) plan (the headline now runs
    #   the Arrow numpy-matmul local-top-k default)
    # - b1g: the same measure sweep over RAGGED holed n-gons (varying vertex
    #   counts per row) — the CSR fast path (geo/ragged.py); compare per-row
    #   cost against b1's uniform-rect path
    variants = {}
    import math as _m

    n_c = (F.lit(3) + F.col("l_linenumber") % 5).cast("int")
    r_c = (F.lit(1.0) + (F.col("l_quantity").cast("int") % 10)).cast("double")
    two_pi = F.lit(2.0 * _m.pi)
    shell = F.transform(
        F.sequence(F.lit(0), n_c),
        lambda k: F.array(
            F.col("x0") + r_c * F.cos(two_pi * (k % n_c) / n_c),
            F.col("y0") + r_c * F.sin(two_pi * (k % n_c) / n_c),
        ),
    )
    hole = F.array(
        F.array(F.col("x0") - r_c / 4, F.col("y0") - r_c / 4),
        F.array(F.col("x0") - r_c / 4, F.col("y0") + r_c / 4),
        F.array(F.col("x0") + r_c / 4, F.col("y0") + r_c / 4),
        F.array(F.col("x0") + r_c / 4, F.col("y0") - r_c / 4),
        F.array(F.col("x0") - r_c / 4, F.col("y0") - r_c / 4),
    )
    ragged = li_rects.withColumn("poly", st.st_polygon(F.array(shell, hole))).select(
        "l_orderkey", "poly").cache()
    ragged.count()
    # (sampled warmups removed r5: timed() runs one full-size untimed
    # warm pass per variant, which subsumes them)
    variants["b1g_elementwise_ragged"] = timed(
        lambda: ragged.select(
            F.sum(st.st_area("poly")).alias("a"),
            F.sum(st.st_length("poly")).alias("l"),
        ).collect()
    )
    # - b1c: constructive ops over the same ragged batch — r5 vectorized
    #   Douglas-Peucker keep-mask + level-synchronous monotone-chain hull
    #   with batched EWKB assembly (geo/ragged.py), ~12-15x the per-row
    #   factory path at equal bytes
    variants["b1c_constructive_ragged"] = timed(
        lambda: ragged.select(
            F.sum(st.st_count_coordinates(st.st_simplify("poly", 0.05))).alias("n"),
            F.sum(st.st_area(st.st_convex_hull("poly"))).alias("ha"),
        ).collect()
    )
    # - b1p: row-paired polygon×polygon intersection over the holed n-gons
    #   vs a per-row convex diamond — the r5 level-sync Sutherland–Hodgman
    #   batch kernel (geo/shclip.clip_poly_poly_batch); 600k clips at sf0.1
    diam = st.st_polygon(F.array(F.array(
        F.array(F.col("x0") + r_c / 2, F.col("y0") - r_c),
        F.array(F.col("x0") + 3 * r_c / 2, F.col("y0")),
        F.array(F.col("x0") + r_c / 2, F.col("y0") + r_c),
        F.array(F.col("x0") - r_c / 2, F.col("y0")),
        F.array(F.col("x0") + r_c / 2, F.col("y0") - r_c))))
    ragged_p = li_rects.withColumn("poly", st.st_polygon(F.array(shell, hole))) \
        .withColumn("clipd", diam).select("l_orderkey", "poly", "clipd").cache()
    ragged_p.count()
    variants["b1p_poly_clip_pairs"] = timed(
        lambda: ragged_p.select(
            F.sum(st.st_area(st.st_intersection("poly", F.col("clipd")))).alias("a")
        ).collect()
    )
    ragged_p.unpersist()
    # - b1b: LINE buffers (round join, per-row distance) — the r5
    #   vectorized overlay union engine (geo/overlay.union_many: one-shot
    #   node/classify/stitch of stroke + join + cap pieces; was 517 ms/row
    #   through the incremental pairwise overlay, now ~4 ms/row)
    bl_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey",
        ((F.col("c_custkey") % 97) + 0.5).alias("x"),
        (((F.col("c_custkey") * 7) % 89) + 0.5).alias("y"),
        (0.25 + (F.col("c_custkey") % 4) * 0.25).alias("d"),
    )
    lpath = st.st_linestring(F.array(
        F.array(F.col("x"), F.col("y")),
        F.array(F.col("x") + 4.0, F.col("y")),
        F.array(F.col("x") + 4.0, F.col("y") + 3.0)))
    # customer at sf0.1 is a single parquet row-group: spread the per-row
    # buffer work across the executor threads
    cust_l = bl_cust.withColumn("lp", lpath).repartition(64).cache()
    cust_l.count()
    variants["b1b_buffer_lines"] = timed(
        lambda: cust_l.select(
            F.sum(st.st_area(st.st_buffer("lp", "d", cap_style="flat"))).alias("a")
        ).collect()
    )
    # - b2g: row-paired polygon×polygon intersects over the same ragged
    #   holed n-gons vs a shifted copy — the CSR segment-pair kernel
    #   (geo/ragged.polys_intersect), i.e. the sjoin refinement hot path
    ragged2 = ragged.withColumn(
        "poly2", st.st_translate("poly", 0.8, 0.4)).cache()
    ragged2.count()
    variants["b2g_predicate_ragged"] = timed(
        lambda: ragged2.select(
            F.sum(st.st_intersects("poly", F.col("poly2")).cast("int"))
        ).collect()
    )
    # - b2r: full DE-9IM matrices over the same ragged pairs — the r4f
    #   conservative relate kernel (disjoint/containment rows closed-form,
    #   boundary interplay scalar); counts distinct matrices
    variants["b2r_relate_ragged"] = timed(
        lambda: ragged2.select(
            F.count_distinct(st.st_relate("poly", F.col("poly2")))
        ).collect()
    )
    # coverage-topology relate: every lineitem rect against its shared-edge
    # neighbor — 600k full DE-9IM matrices through the r4g contact-only
    # bucket (0% kernel-decided before it; the scalar path needs ~13 min);
    # timed()'s full-size warm pass covers codegen/JIT ramp
    variants["b2a_relate_adjacent"] = timed(
        lambda: li_rects.select(
            F.count_distinct(
                st.st_relate(
                    "rect",
                    st.st_rectangle(
                        "x1", "y0",
                        F.col("x1") + (F.col("x1") - F.col("x0")), "y1"),
                )
            )
        ).collect()
    )
    _p1m_last = {}

    def _p1m():
        out = _dedup.near_dup_pairs(docs, threshold=0.05, hash_family="md5")
        _p1m_last["df"] = out
        out.count()

    def _p1m_cleanup():
        sig = getattr(_p1m_last.get("df"), "_staged_sig", None)
        if sig is not None:
            sig.unpersist(blocking=True)

    variants["p1m_minhash_md5"] = timed(_p1m, cleanup=_p1m_cleanup)
    variants["p2s_knn_sql"] = timed(
        lambda: _knn.cosine_topk(
            emb.where(F.col("vec_id") < 20), emb, k=10, strategy="sql"
        ).count()
    )
    # - p4: the r4c pipeline family (deterministic sampling gate + greedy
    #   packing + token-window chunking) in one pass over documents — all
    #   codegen/applyInPandas, measures the non-geometry pipeline surface
    from polars_st_spark.operators import sampling as _samp
    from polars_st_spark.operators.textops import chunk_text as _chunk

    def _p4():
        kept = _samp.stratified_sample(
            docs, "lang", {"en": 1.0, "es": 0.5, "fr": 0.5, "de": 0.5}, "doc_id")
        packed = _samp.pack_greedy(kept, "lang", "doc_id", "n_chars", 8192)
        return _chunk(packed, "doc_id", "text", chunk_tokens=256, overlap=32).count()

    variants["p4_sample_pack_chunk"] = timed(_p4)
    # - p5: corpus hygiene — per-doc Gopher signals (shuffle-free codegen),
    #   C4 line dedup (one line-hash shuffle), 6-gram decontamination
    #   (broadcast semi-join) in one pass
    from polars_st_spark.operators import filters as _hyg

    def _p5():
        ml = F.regexp_replace(F.col("text"), " (data|table|row) ", "\n")
        base = docs.select("doc_id", "text", ml.alias("mtext"))
        sig = _hyg.repetition_signals(base, "mtext", "doc_id")
        ld = _hyg.line_dedup(base.select("doc_id", F.col("mtext").alias("text")))
        dec = _hyg.decontaminate(
            base.select("doc_id", "text"),
            docs.where(F.col("doc_id") % 97 == 0), n=6, mode="tag")
        return (
            sig.join(ld.select("doc_id", F.length("text").alias("clean_len")), "doc_id")
            .join(dec.select("doc_id", "contaminated"), "doc_id").count()
        )

    variants["p5_hygiene"] = timed(_p5)
    # - p6: k-nearest spatial join, grid strategy (cell equi-join on the
    #   max_distance lattice) — customers × nations at sf grain
    from polars_st_spark.operators.nearest import st_sjoin_nearest as _nn

    # p6 gets two reps (VERDICT r4 #5: diagnose its 3x run-to-run spread —
    # the candidate volume is deterministic, so a spread here is ambient;
    # nearest_cell_stats() gives the per-cell histogram offline).
    # Plan warmup first (same contract as b1/b2a): an interleaved A/B this
    # round showed the FIRST run of ANY nearest-join plan costs 35-50s in
    # JVM codegen + tiered JIT of its many generated classes (2 UDF stages
    # + explode + join + window) while the steady state is ~2.4s and the
    # in-UDF Python time is ~0.01s/batch. A 2% sampled warmup did NOT fix
    # it (300 rows never crosses the C2 invocation thresholds, so the
    # timed run still executed interpreted/C1 code); the warmup must be
    # FULL-SIZE — one untimed run, then the reps measure the operator.
    _p6 = lambda: _nn(  # noqa: E731
        cust.withColumnRenamed("pt", "geometry"),
        nations.withColumnRenamed("rect", "geometry"),
        k=2, max_distance=9.0,
    ).count()
    variants["p6_nearest_join"] = timed(_p6)
    variants["p6_nearest_join_rep2"] = timed(_p6, warm=False)
    # - p7: TF-IDF + BM25 over the documents corpus (two uniform-key
    #   shuffles + broadcast query scoring)
    from polars_st_spark.operators import tfidf as _tfidf

    def _p7():
        n = docs.count()
        ti = _tfidf.tf_idf(docs, n_docs=n).count()
        bm = _tfidf.bm25_search(docs, ["data", "table"], n=10, n_docs=n,
                                avg_dl=100.0).count()
        return ti + bm

    variants["p7_tfidf_bm25"] = timed(_p7)
    # - p8: the composed end-to-end corpus build (quality -> exact dedup ->
    #   near-dup keep -> decontamination -> scrub -> chunk) in one plan
    from polars_st_spark.operators.pipeline import pretraining_pipeline as _pp

    # - p9: SemDeDup — distributed k-means fit (3 Lloyd rounds, one
    #   map-side-combined agg per round) + cluster-bounded pairwise cosine
    from polars_st_spark.operators import cluster as _cl

    def _p9():
        cents = _cl.kmeans_fit(emb, k=8, vec_col="embedding", iters=3, seed=7)
        return _cl.semantic_dedup(
            emb, id_col="vec_id", centroids=cents, threshold=0.9
        ).where(F.col("is_dup")).count()

    variants["p9_semdedup"] = timed(_p9)
    # - p10: corpus curation sweep — cross-doc shingle ownership + the
    #   temperature-mixture gate (count of the curated-kept set)
    def _p10():
        cov = _dedup.ngram_coverage(docs, n=5).where(F.col("borrowed_frac") < 0.5)
        mixed = _samp.temperature_mixture(
            cov.join(docs.select("doc_id", "lang"), "doc_id"), "lang", "doc_id"
        )
        return mixed.count()

    variants["p10_curation"] = timed(_p10)

    def _p8(materialize="cache"):
        return _pp(
            docs, benchmark=docs.where(F.col("doc_id") % 97 == 0),
            quality_kwargs={"min_words": 10, "min_stopword_hits": 1},
            near_dup_threshold=0.3, decontam_n=8,
            chunk_tokens=128, chunk_overlap=16, materialize=materialize,
        ).count()

    # warmup with materialize="checkpoint": localCheckpoint materializes the
    # stage boundaries OUTSIDE the CacheManager, so the timed run's internal
    # caches are still COLD (the p1 rep-cleanup lesson) while the warm pass
    # costs one pipeline run. materialize=None is NOT usable here: with no
    # stage cut, every downstream stage that scans its input twice doubles
    # the whole upstream recompute — the r6 scale ramp measured the None
    # composition at >>10x the cache-mode cost at 10x grain (recompute tree
    # ~2^stages).
    _p8(materialize="checkpoint")
    variants["p8_pipeline_e2e"] = timed(_p8, warm=False)

    total = round(sum(queries.values()), 3)
    medians = {k: med3(v) for k, v in queries_reps.items()}
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    payload = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "queries_reps": queries_reps,
        "queries_median3": medians,
        "value_median3": round(sum(medians.values()), 3),
        "variants": variants,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # host-health context: fresh-page fault cost at bench start
        # (µs/4KiB; ~0.2 = backed/healthy, 30-95 = lazy/reclaimed VM state
        # that inflates every first-touch — see README "Bench variance")
        "vm_fault_us_per_page": vm_fault_us,
        # True when BASELINE_MEASURED.json was re-measured by THIS run
        # (same host state as the engine numbers — the fair comparison)
        "floor_same_run": floor_same_run,
    }
    # ratio vs the measured single-node floor (scripts/baseline_single_node.py
    # -> BASELINE_MEASURED.json): closed-form numpy/pandas single process, no
    # geometry materialization — a conservative lower bound, not a peer engine
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json")
    try:
        with open(base_path) as f:
            base = json.load(f)
    except (OSError, ValueError):
        base = None  # missing/corrupt floor file: still print the payload
    if base is not None:
        if str(base.get("sf")) == str(payload["sf"]):
            payload["baseline_floor_sec"] = base["queries"]
            # floor queries are themselves medians of `floor_reps` runs
            # (scripts/baseline_single_node.py) — symmetric methodology
            payload["floor_reps"] = base.get("floor_reps", 1)
            payload["vs_floor"] = {
                k: round(queries[k] / base["queries"][k], 2)
                for k in queries if base["queries"].get(k)
            }
            payload["vs_floor_median3"] = {
                k: round(medians[k] / base["queries"][k], 2)
                for k in medians if base["queries"].get(k)
            }
            ftot = sum(v for k, v in base["queries"].items() if k in medians)
            if ftot:
                payload["total_vs_floor_median3"] = round(
                    payload["value_median3"] / ftot, 2)
            vf = base.get("variant_floors", {})
            payload["variants_vs_floor"] = {
                k: round(variants[k] / vf[k], 2) for k in variants if vf.get(k)
            }
    # The driver captures only the tail of stdout (~2 KB) — the full payload
    # overflows it (round-5 BENCH had parsed:null). Write the COMPLETE record
    # to BENCH_FULL.json and print a compact final line that carries the
    # contract fields (metric/value/unit/queries/sf) plus the headline
    # medians and ratios, staying well under the capture window.
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_FULL.json")
    tmp = full_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1)
    os.replace(tmp, full_path)
    compact = {
        k: payload[k]
        for k in ("metric", "value", "unit", "queries", "queries_median3",
                  "value_median3", "sf", "vm_fault_us_per_page",
                  "floor_same_run", "floor_reps", "total_vs_floor_median3")
        if k in payload
    }
    compact["detail_file"] = "BENCH_FULL.json"
    print(json.dumps(compact))
    spark.stop()


if __name__ == "__main__":
    main()
