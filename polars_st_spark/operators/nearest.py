"""Nearest-neighbor spatial join: for each left geometry, the ``k``
closest right geometries (the geopandas ``sjoin_nearest`` surface — the
reference engine itself stops at predicate joins, SURVEY §2.9; this
extends the join family for the pipeline mandate).

Two strategies, chosen by whether a distance cap exists:

- ``max_distance`` set (the 100 TB path): right geometries are assigned to
  every cell of a ``max_distance``-sized grid that their bbox EXPANDED by
  ``max_distance`` touches; left geometries to every cell their own bbox
  touches (one cell for points). For any pair within the cap the closest
  left point's cell is in both sets, so candidates come from one hash
  equi-join on cell id — never a cross product — then multi-cell pairs
  are deduplicated by a REFERENCE-CELL filter (each pair counts only in
  the lexicographically smallest common cell — a codegen predicate, not
  a shuffle), the exact distance kernel filters, and a per-left-row
  top-k window ranks.
  Replication is bounded: ceil(w/d+2)·ceil(h/d+2) cells per right row
  (compact geometries ⇒ ~9), bbox cells per left row.
- ``max_distance`` None: the right side is broadcast and every pair is
  scored (exact, simple — correct only when the right side is small, the
  dimension-table case; raises above ``broadcast_limit`` rows instead of
  melting the cluster).

Ties on distance break by a content hash of the full right row —
deterministic across runs and partitionings, no reliance on row order
(rows identical in every column are interchangeable either way).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_st_spark.functions.scalar import st_bounds

__all__ = ["st_sjoin_nearest", "nearest_cell_stats"]


def st_sjoin_nearest(
    left: DataFrame,
    right: DataFrame,
    k: int = 1,
    max_distance: float | None = None,
    how: str = "inner",
    lsuffix: str = "",
    rsuffix: str = "_right",
    left_on: str = "geometry",
    right_on: str = "geometry",
    distance_col: str = "distance",
    broadcast_limit: int = 1_000_000,
    max_cell_candidates: int | None = None,
    strategy: str = "auto",
) -> DataFrame:
    """k-nearest spatial join. Output: left columns + matched right columns
    (name conflicts suffixed) + ``distance_col``; ``how='left'`` keeps
    unmatched left rows (possible only with ``max_distance``) with nulls.
    Rank ties on identical distances resolve by right-geometry content
    hash, so results are deterministic and rerun-stable.

    ``max_cell_candidates`` (grid strategy only): guard against a
    degenerate cell whose left×right candidate product would dominate the
    join (the hot-cell failure mode VERDICT r4 flagged as p6's run-to-run
    spread suspect) — when any cell exceeds the cap the join RAISES naming
    the cell and its product (a silent drop would change results; choose a
    smaller ``max_distance``, pre-aggregate coincident points, or raise
    the cap). Costs one extra count aggregation on each staged cell table;
    leave None (default) to skip. :func:`nearest_cell_stats` returns the
    same histogram for offline diagnosis.

    ``strategy`` (max_distance None only): ``"auto"``/``"strtree"`` (r5
    default) broadcasts the right side and answers each left row with an
    EXPANDING-RING STRtree query — work is O(n_left · (k + log n_right))
    instead of the ``"cross"`` plan's O(n_left · n_right) full cross-join
    scoring (kept available for audit; identical distances, ties may pick
    a different equal-distance row — strtree ties break on a stable
    content digest of the right row)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if distance_col in left.columns or distance_col in right.columns:
        raise ValueError(
            f"distance_col={distance_col!r} collides with an existing input "
            "column; pass a different distance_col"
        )
    from pyspark.sql.window import Window

    # stage a unique left row id BEFORE any join (monotonic id is evaluated
    # per source row only when staged in its own projection)
    lid = "__nn_lrow"
    lstaged = left.select(F.monotonically_increasing_id().alias(lid), "*")

    # suffix conflicting columns like st_sjoin
    overlap = [c for c in right.columns if c in left.columns]
    rsel = [
        F.col(c).alias(c + rsuffix) if c in overlap else F.col(c)
        for c in right.columns
    ]
    rstaged = right.select(*rsel)
    r_geom = right_on + rsuffix if right_on in overlap else right_on

    tie = F.xxhash64(*[F.col(c) for c in rstaged.columns])
    # r12 (guide §4.4, VERDICT r11 item 4): the distance UDF expression used
    # to appear in the candidate filter AND the output projection/window
    # order — Spark's filter pushdown duplicated it into TWO full
    # ArrowEvalPython passes over the candidate stream (plan nodes (21)+(24)
    # in plans/r12/p6_nearest_join_before.txt). A query-local
    # non-deterministic copy of the same kernel pins ONE evaluation in a
    # staged projection; the filter and the rank read the materialized
    # column. Values are unchanged (the kernel is pure) — only the plan is.
    from pyspark.sql.functions import arrow_udf

    from polars_st_spark.functions.scalar import _distance_pair_udf

    _nn_dist = arrow_udf(_distance_pair_udf.func, "double").asNondeterministic()
    dist = _nn_dist(F.col(left_on), F.col(r_geom))

    if max_distance is None:
        if strategy not in ("auto", "strtree", "cross"):
            raise ValueError(f"strategy must be auto/strtree/cross, got {strategy!r}")
        n_right = rstaged.count()
        if n_right > broadcast_limit:
            raise ValueError(
                f"right side has {n_right} rows > broadcast_limit="
                f"{broadcast_limit}; pass max_distance= for the scalable "
                "grid strategy (or raise broadcast_limit explicitly)"
            )
        if strategy in ("auto", "strtree"):
            ranked = _nearest_strtree(
                lstaged, rstaged, k, left_on, r_geom, distance_col, lid)
            return _finish_how(ranked, lstaged, lid, how)
        # null/empty left geometries produce null distance for EVERY
        # candidate; drop those pairs so the strategies agree (the grid
        # path never cells such rows) and how='left' routes them to the
        # unmatched set instead of k arbitrary null-distance matches
        cand = (
            lstaged.crossJoin(F.broadcast(rstaged))
            .withColumn(distance_col, dist)
            .where(F.col(distance_col).isNotNull())
        )
    else:
        d = float(max_distance)
        if d <= 0:
            raise ValueError("max_distance must be positive")
        def cell_array(b, pad: float):
            # all (cx, cy) cells touched by bbox b expanded by pad — a flat
            # array of structs via sequence/transform, JVM-side
            cx0 = F.floor((b[0] - pad) / d).cast("long")
            cx1 = F.floor((b[2] + pad) / d).cast("long")
            cy0 = F.floor((b[1] - pad) / d).cast("long")
            cy1 = F.floor((b[3] + pad) / d).cast("long")
            return F.flatten(
                F.transform(
                    F.sequence(cx0, cx1),
                    lambda cx: F.transform(
                        F.sequence(cy0, cy1),
                        lambda cy: F.struct(cx.alias("cx"), cy.alias("cy")),
                    ),
                )
            )

        # left: own-bbox cells (one for points). right: bbox ⊕ d cells.
        # The closest left point lies in the left bbox AND within d of the
        # right bbox, so its cell is in both sets — no pair escapes.
        # The bounds UDF result must be STAGED as a column before the
        # higher-order cell lambda (Spark rejects Python UDFs inside
        # lambda functions at analysis).
        l2 = lstaged.withColumn("__nn_lb", st_bounds(F.col(left_on))).withColumn(
            "__nn_cell", F.explode(cell_array(F.col("__nn_lb"), 0.0))
        )
        r2 = rstaged.withColumn("__nn_rb", st_bounds(F.col(r_geom))).withColumn(
            "__nn_cell", F.explode(cell_array(F.col("__nn_rb"), d))
        )
        # reference-cell dedup (the grid-sjoin trick): a pair sharing several
        # cells is counted ONLY in the lexicographically smallest common one
        # — a codegen filter on the join output instead of a dropDuplicates
        # SHUFFLE of every candidate pair
        ref_cx = F.greatest(
            F.floor(F.col("__nn_lb")[0] / d), F.floor((F.col("__nn_rb")[0] - d) / d)
        ).cast("long")
        ref_cy = F.greatest(
            F.floor(F.col("__nn_lb")[1] / d), F.floor((F.col("__nn_rb")[1] - d) / d)
        ).cast("long")
        if max_cell_candidates is not None:
            hot = (
                l2.groupBy("__nn_cell").count()
                .withColumnRenamed("count", "_nl")
                .join(r2.groupBy("__nn_cell").count()
                      .withColumnRenamed("count", "_nr"), on="__nn_cell")
                .where(F.col("_nl") * F.col("_nr") > int(max_cell_candidates))
                .select("__nn_cell", (F.col("_nl") * F.col("_nr")).alias("_prod"))
                .orderBy(F.col("_prod").desc())
                .limit(3)
                .collect()
            )
            if hot:
                cells = ", ".join(
                    f"cell({r['__nn_cell']['cx']},{r['__nn_cell']['cy']})"
                    f"={r['_prod']}" for r in hot)
                raise ValueError(
                    "st_sjoin_nearest: cell candidate product exceeds "
                    f"max_cell_candidates={max_cell_candidates}: {cells}. "
                    "Use a smaller max_distance, pre-aggregate coincident "
                    "points, or raise the cap."
                )
        cand = (
            l2.join(r2, on="__nn_cell")
            .where((F.col("__nn_cell.cx") == ref_cx) & (F.col("__nn_cell.cy") == ref_cy))
            .drop("__nn_cell", "__nn_lb", "__nn_rb")
            .withColumn(distance_col, dist)
            .where(F.col(distance_col) <= F.lit(d))
        )

    w = Window.partitionBy(lid).orderBy(
        F.col(distance_col).asc_nulls_last(), tie.asc())
    ranked = (
        cand.withColumn("__nn_rank", F.row_number().over(w))
        .where(F.col("__nn_rank") <= k)
        .drop("__nn_rank")
    )
    return _finish_how(ranked, lstaged, lid, how)


def _finish_how(ranked: DataFrame, lstaged: DataFrame, lid: str, how: str) -> DataFrame:
    if how == "inner":
        return ranked.drop(lid)
    # how='left': rejoin unmatched left rows with null right columns
    matched = ranked
    out_cols = [c for c in matched.columns if c != lid]
    unmatched = lstaged.join(
        matched.select(lid).distinct(), on=lid, how="left_anti"
    )
    mtypes = {f.name: f.dataType for f in matched.schema.fields}
    for c in out_cols:
        if c not in unmatched.columns:
            unmatched = unmatched.withColumn(c, F.lit(None).cast(mtypes[c]))
    return matched.select(*out_cols).unionByName(
        unmatched.select(*out_cols)
    )


def _nearest_strtree(
    lstaged: DataFrame,
    rstaged: DataFrame,
    k: int,
    left_on: str,
    r_geom: str,
    distance_col: str,
    lid: str,
) -> DataFrame:
    """Broadcast expanding-ring STRtree k-NN (the r5 no-cap default).

    The right table is collected (``broadcast_limit``-guarded by the
    caller) with its bboxes; each worker bulk-loads one STR-packed R-tree
    and answers every left row with an expanding box query: start at a
    density-derived radius, double until >= k candidates AND the k-th
    candidate distance fits inside the ring (an item whose bbox misses a
    box expanded by r is > r away — Chebyshev bound), then rank exact
    distances. Ties break on a stable content digest of the right row
    (rerun- and partitioning-independent). Null/empty left rows emit
    nothing — how='left' routes them to the unmatched set."""
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    spark = lstaged.sparkSession
    rpdf = rstaged.toPandas()
    n_right = len(rpdf)
    rbounds = _driver_bounds(rpdf[r_geom].to_numpy())
    digest = pd.util.hash_pandas_object(rpdf, index=False).to_numpy() \
        if n_right else np.empty(0, dtype=np.uint64)
    bc = spark.sparkContext.broadcast((rpdf, rbounds, digest))
    out_schema = StructType(
        list(lstaged.schema.fields)
        + list(rstaged.schema.fields)
        + [StructField(distance_col, DoubleType())]
    )
    lcols = list(lstaged.columns)
    rcols = list(rstaged.columns)

    def fn(batches):
        from polars_st_spark.geo import algos
        from polars_st_spark.geo.index import STRtree
        from polars_st_spark.geo.wkb import from_ewkb

        rpdf_, rb, dg = bc.value
        tree = STRtree(rb)
        with np.errstate(invalid="ignore"):
            valid = ~np.isnan(rb[:, 0])
        nv = int(valid.sum())
        if nv:
            gx0, gy0 = np.nanmin(rb[:, 0]), np.nanmin(rb[:, 1])
            gx1, gy1 = np.nanmax(rb[:, 2]), np.nanmax(rb[:, 3])
            span = max(gx1 - gx0, gy1 - gy0, 1e-9)
            r0 = max(span * ((min(k, nv) / nv) ** 0.5), span * 1e-6)
        rcache: dict = {}

        def rget(j):
            g = rcache.get(j)
            if g is None:
                g = from_ewkb(bytes(rpdf_[r_geom].iloc[j]))
                rcache[j] = g
            return g

        for pdf in batches:
            if not nv or not len(pdf):
                yield pd.DataFrame(columns=lcols + rcols + [distance_col])
                continue
            lb = _driver_bounds(pdf[left_on].to_numpy())
            li_out: list = []
            ri_out: list = []
            d_out: list = []
            for i in range(len(pdf)):
                if np.isnan(lb[i, 0]):
                    continue
                gl = from_ewkb(bytes(pdf[left_on].iloc[i]))
                r = r0
                kk = min(k, nv)
                while True:
                    cand = tree.query(lb[i, 0] - r, lb[i, 1] - r,
                                      lb[i, 2] + r, lb[i, 3] + r)
                    if len(cand) >= kk or len(cand) == nv:
                        ds = np.array([algos.distance(gl, rget(j)) for j in cand])
                        ok = ~np.isnan(ds)
                        cand2, ds2 = cand[ok], ds[ok]
                        if len(cand2) >= kk or len(cand) == nv:
                            if len(cand2):
                                order = np.lexsort((dg[cand2], ds2))
                                top = order[:kk]
                                dk = ds2[top[-1]] if len(top) else np.inf
                                if dk <= r or len(cand) == nv:
                                    for t in top:
                                        li_out.append(i)
                                        ri_out.append(cand2[t])
                                        d_out.append(ds2[t])
                                    break
                            elif len(cand) == nv:
                                break
                    r *= 2.0
                    if r > 4 * span and len(cand) == nv:
                        break
            if not li_out:
                yield pd.DataFrame(columns=lcols + rcols + [distance_col])
                continue
            out = pdf.iloc[li_out][lcols].reset_index(drop=True)
            rsel = rpdf_.iloc[ri_out][rcols].reset_index(drop=True)
            for c in rcols:
                out[c] = rsel[c]
            out[distance_col] = np.asarray(d_out, dtype=np.float64)
            yield out

    return lstaged.mapInPandas(fn, schema=out_schema)


def _driver_bounds(bufs) -> np.ndarray:
    """(n, 4) bboxes of EWKB values (NaN for null/empty/odd rows) —
    vectorized through the CSR parsers with a scalar fallback."""
    from polars_st_spark.geo import ragged
    from polars_st_spark.geo.wkb import from_ewkb

    for parser in (ragged.parse_polygonal, ragged.parse_lineal,
                   ragged.parse_multipoints):
        p = parser(bufs)
        if p is not None:
            return ragged.bounds(p)
    out = np.full((len(bufs), 4), np.nan)
    for i, b in enumerate(bufs):
        if b is None:
            continue
        g = from_ewkb(bytes(b))
        bb = g.bounds()
        if bb[0] == bb[0]:
            out[i] = bb
    return out


def nearest_cell_stats(
    left: DataFrame,
    right: DataFrame,
    max_distance: float,
    left_on: str = "geometry",
    right_on: str = "geometry",
    top: int = 20,
) -> DataFrame:
    """Per-cell candidate diagnosis for the grid strategy of
    :func:`st_sjoin_nearest` (VERDICT r4 #5): the ``top`` cells by
    left×right candidate product, with both side counts — run this when a
    nearest join's wall time spreads run-to-run to see whether a hot cell
    (coincident points, a cap much larger than point spacing) dominates
    the distance kernel. Returns (cx, cy, n_left, n_right, product)."""
    d = float(max_distance)
    if d <= 0:
        raise ValueError("max_distance must be positive")

    def cells(df, geom, pad):
        b = st_bounds(F.col(geom))
        staged = df.select(b.alias("__b"))
        cx0 = F.floor((F.col("__b")[0] - pad) / d).cast("long")
        cx1 = F.floor((F.col("__b")[2] + pad) / d).cast("long")
        cy0 = F.floor((F.col("__b")[1] - pad) / d).cast("long")
        cy1 = F.floor((F.col("__b")[3] + pad) / d).cast("long")
        arr = F.flatten(F.transform(
            F.sequence(cx0, cx1),
            lambda cx: F.transform(
                F.sequence(cy0, cy1),
                lambda cy: F.struct(cx.alias("cx"), cy.alias("cy")),
            ),
        ))
        return staged.select(F.explode(arr).alias("__nn_cell"))

    lc = cells(left, left_on, 0.0).groupBy("__nn_cell").count() \
        .withColumnRenamed("count", "n_left")
    rc = cells(right, right_on, d).groupBy("__nn_cell").count() \
        .withColumnRenamed("count", "n_right")
    return (
        lc.join(rc, on="__nn_cell")
        .select(
            F.col("__nn_cell.cx").alias("cx"),
            F.col("__nn_cell.cy").alias("cy"),
            "n_left", "n_right",
            (F.col("n_left") * F.col("n_right")).alias("product"),
        )
        .orderBy(F.col("product").desc())
        .limit(top)
    )
