"""Distributed connected components (alternating large-star / small-star) and
near-duplicate GROUP resolution on top of it.

Near-dup detection yields PAIRS (dedup.near_dup_pairs); keeping one document
per duplicate *cluster* needs the transitive closure — A~B, B~C puts A and C
in one group even if they never collided in LSH. The alternating-star
algorithm (Kiveris et al., "Connected Components in MapReduce and Beyond",
public) converges in O(log n) rounds of pure DataFrame ops:

- large-star: every node connects its LARGER neighbors to its smallest
  known neighbor;  small-star: the smaller-or-equal ones (plus itself).
- each half-round is ONE shuffle (window-min over the src partition — no
  groupBy+rejoin, no collect_list hub blowup); the large-star output feeds
  the small-star WITHOUT an intermediate dedup (window-min is multiset-
  safe), so a full round is 3 shuffles (2 windows + 1 closing distinct)
  regardless of component shape; skewed hub nodes cost a wide partition,
  not a driver spill.
- convergence is checked with a count+xor-hash signature of the edge set;
  checkpoints are lazy and the signature action materializes them, so a
  round costs exactly ONE job.

At the fixpoint every edge points to its component's minimum id, which
becomes the component label. Isolated nodes (no edges) keep themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["connected_components", "near_dup_groups"]


def _canon(edges: DataFrame) -> DataFrame:
    """Distinct undirected edges as (u > v) pairs, self-loops dropped."""
    u, v = F.col("_u"), F.col("_v")
    return (
        edges.select(F.greatest(u, v).alias("_u"), F.least(u, v).alias("_v"))
        .where(F.col("_u") != F.col("_v"))
        .distinct()
    )


def _star(edges: DataFrame, large: bool, canon: bool = True) -> DataFrame:
    """One star half-round over SYMMETRIZED edges: for each node u with
    neighborhood N(u), attach the selected neighbors to m = min(N(u), u).

    ``canon=False`` skips the dedup shuffle on the output: a window MIN is
    identical over a multiset, so a large-star half-round can feed the
    small-star directly with duplicate (and self-loop) edges — at most a
    2x row inflation for ONE half-round, in exchange for one fewer
    shuffle per full round (the fixpoint edge set is still canonicalized
    by the small-star's closing _canon)."""
    sym = edges.unionByName(
        edges.select(F.col("_v").alias("_u"), F.col("_u").alias("_v"))
    )
    w = Window.partitionBy("_u")
    m = F.least(F.min("_v").over(w), F.col("_u"))
    ann = sym.withColumn("_m", m)
    if large:
        out = ann.where(F.col("_v") > F.col("_u")).select(
            F.col("_v").alias("_u"), F.col("_m").alias("_v")
        )
    else:
        out = ann.where(F.col("_v") <= F.col("_u")).select(
            F.col("_v").alias("_u"), F.col("_m").alias("_v")
        ).unionByName(ann.select("_u", F.col("_m").alias("_v")))
    return _canon(out) if canon else out


def _signature(edges: DataFrame) -> tuple[int, int]:
    # bit_xor, not sum: XOR cannot overflow (Spark 4 runs ANSI mode, where a
    # long-sum overflow raises) and edges are distinct so nothing cancels.
    row = edges.select(
        F.count("*").alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("_u", "_v")), F.lit(0)).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    materialize: str = "local",
) -> DataFrame:
    """Component label (the component's minimum node id) for every node that
    appears in ``edges``. Output columns: (node, component). Node ids must be
    orderable (int/long/string).

    Every round MUST truncate lineage, not merely cache: each star round
    references the previous edge set 3-4 times, so the LOGICAL PLAN grows
    exponentially and the analyzer itself OOMs after ~10 rounds if only
    ``cache()`` is used. ``materialize="local"`` (default) uses eager
    ``localCheckpoint`` (executor memory/disk); ``"checkpoint"`` writes to
    the configured reliable checkpoint dir — prefer it at 100 TB where
    executor loss mid-iteration would otherwise restart the computation."""
    if materialize not in ("local", "checkpoint"):
        raise ValueError("materialize must be 'local' or 'checkpoint'")
    e = _canon(
        edges.select(F.col(src).alias("_u"), F.col(dst).alias("_v"))
    )
    # edge-free input (clean corpus: no near-dup pairs at all) skips the
    # whole iteration — otherwise a no-op dedup still pays 2+ star rounds
    # of checkpointed shuffles (visible in the e2e pipeline latency).
    # Checkpoints are LAZY: the signature action right after is what
    # materializes them — one job per round instead of two (the round
    # count is what dominates wall-time on small inputs; at scale the
    # saved job is a saved full pass over the edge set).
    e = e.localCheckpoint(eager=False) if materialize == "local" else e.checkpoint(eager=False)
    if _signature(e)[0] == 0:
        return (
            edges.select(F.col(src).alias("node"))
            .unionByName(edges.select(F.col(dst).alias("node")))
            .distinct()
            .withColumn("component", F.col("node"))
        )
    prev = None
    for _ in range(max_iter):
        # fused round: large-star feeds small-star WITHOUT the intermediate
        # dedup shuffle (window-min is multiset-safe); 3 shuffles per round
        e = _star(_star(e, large=True, canon=False), large=False)
        e = e.localCheckpoint(eager=False) if materialize == "local" else e.checkpoint(eager=False)
        sig = _signature(e)
        if sig == prev:
            break
        prev = sig
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    # fixpoint: stars around each component min -> (_u=node, _v=component)
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    labels = e.select(F.col("_u").alias("node"), F.col("_v").alias("component"))
    return (
        nodes.join(labels, on="node", how="left")
        .select("node", F.coalesce("component", "node").alias("component"))
    )


def near_dup_groups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    materialize: str | None = "cache",
    **near_dup_kwargs,
) -> DataFrame:
    """Duplicate clusters from MinHash-LSH pairs via transitive closure:
    (doc_id, group_id, keep) where group_id is the cluster's min doc_id and
    ``keep`` marks the canonical survivor. Docs with no near-dup partner are
    their own singleton group (keep=true)."""
    from polars_st_spark.operators.dedup import near_dup_pairs

    pairs = near_dup_pairs(
        df, text_col=text_col, id_col=id_col, threshold=threshold,
        materialize=materialize, **near_dup_kwargs,
    )
    comp = connected_components(
        pairs, src="id_a", dst="id_b",
        materialize="checkpoint" if materialize == "checkpoint" else "local",
    ).withColumnRenamed("node", id_col).withColumnRenamed("component", "group_id")
    all_ids = df.select(id_col)
    return (
        all_ids.join(comp, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("group_id", F.col(id_col)).alias("group_id"),
        )
        .withColumn("keep", F.col("group_id") == F.col(id_col))
    )
