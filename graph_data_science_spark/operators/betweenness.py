"""Betweenness centrality — Brandes forward/backward, all sampled sources
advanced simultaneously.

Reference semantics (algo/.../betweenness/BetweennessCentrality.java:42-92
+ SelectionStrategy.java:55): per-source forward BFS counting shortest
paths (sigma), then backward dependency accumulation
``delta(v) += sigma(v)/sigma(w) * (1 + delta(w))`` over shortest-path DAG
edges; BC(v) = Σ_s delta_s(v). Source sampling (RandomDegree strategy)
bounds cost on big graphs; full accuracy = all sources.

Spark-first: a single state DataFrame keyed by (source, node) advances
ALL sources' BFS waves together — each hop is one join + one aggregation
regardless of source count (the Brandes analog of MSBFS). The backward
sweep iterates global-max-depth levels, each one join + groupBy. Cost is
O(depth) shuffles, not O(sources x depth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from ..plans.checkpoint import loop_checkpoint


def betweenness(
    graph: Graph,
    *,
    sources: list[int] | None = None,
    sampling_size: int | None = None,
    sampling_seed: int = 42,
    normalize_undirected: bool = False,
    max_exact_nodes: int = 100_000,
) -> DataFrame:
    """(internal_id, score). ``sources=None`` uses every vertex (exact);
    ``sampling_size`` picks top-degree-weighted random sources (the
    reference's RandomDegree flavor: degree-biased).

    Exact mode materializes O(sources × reachable-nodes) state — n² on a
    connected graph. Above ``max_exact_nodes`` vertices it refuses to run
    without ``sources``/``sampling_size`` rather than producing a
    cluster-killing shuffle (raise the limit explicitly if you mean it)."""
    spark = graph.spark
    if sources is None and sampling_size is None:
        n = graph.node_count()
        if n > max_exact_nodes:
            raise ValueError(
                f"betweenness exact mode on {n} nodes materializes n² "
                "state; pass sampling_size=... (GDS RandomDegree "
                "sampling) or raise max_exact_nodes explicitly"
            )
    edges = (
        graph.edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    if sources is not None:
        src_df = spark.createDataFrame(
            [(s,) for s in sources], "s long"
        )
    elif sampling_size is not None:
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        src_df = (
            graph.vertices.select(F.col("internal_id").alias("s"))
            .join(deg.withColumnRenamed("src", "s"), "s", "left")
            .orderBy(
                (F.coalesce("d", F.lit(0)) * F.abs(F.xxhash64("s", F.lit(sampling_seed)))).desc()
            )
            .limit(sampling_size)
            .select("s")
        )
    else:
        src_df = graph.vertices.select(F.col("internal_id").alias("s"))
    src_df = src_df.localCheckpoint(eager=True)

    # ---- forward: (s, v, dist, sigma) ---------------------------------
    visited = src_df.select(
        "s", F.col("s").alias("v"), F.lit(0).alias("dist"),
        F.lit(1.0).alias("sigma"),
    ).localCheckpoint(eager=True)
    frontier = visited
    depth = 0
    while True:
        depth += 1
        nxt = (
            frontier.join(
                edges.withColumnRenamed("src", "v"), "v"
            )
            .groupBy("s", F.col("dst").alias("v"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(visited.select("s", "v"), ["s", "v"], "left_anti")
            .select("s", "v", F.lit(depth).alias("dist"), "sigma")
        )
        nxt = loop_checkpoint(nxt, depth)
        if nxt.isEmpty():
            depth -= 1
            break
        visited = loop_checkpoint(visited.unionByName(nxt), depth)
        frontier = nxt

    # ---- backward: delta accumulation level by level -------------------
    # state: (s, v, dist, sigma, delta)
    state = visited.withColumn("delta", F.lit(0.0)).localCheckpoint(eager=True)
    for h in range(depth, 0, -1):
        at_h = state.filter(F.col("dist") == h).select(
            "s", F.col("v").alias("w"),
            F.col("sigma").alias("sigma_w"), F.col("delta").alias("delta_w"),
        )
        contribs = (
            edges.join(at_h.withColumnRenamed("w", "dst"), "dst")
            .select(
                "s", F.col("src").alias("v"), "sigma_w", "delta_w",
            )
            .join(
                state.filter(F.col("dist") == h - 1).select(
                    "s", "v", F.col("sigma").alias("sigma_v")
                ),
                ["s", "v"],
            )
            .groupBy("s", "v")
            .agg(
                F.sum(
                    F.col("sigma_v") / F.col("sigma_w")
                    * (1.0 + F.col("delta_w"))
                ).alias("dd")
            )
        )
        state = (
            state.join(contribs, ["s", "v"], "left")
            .select(
                "s", "v", "dist", "sigma",
                (F.col("delta") + F.coalesce("dd", F.lit(0.0))).alias(
                    "delta"
                ),
            )
        )
        state = loop_checkpoint(state, depth - h + 1)

    bc = (
        state.filter(F.col("v") != F.col("s"))
        .groupBy(F.col("v").alias("internal_id"))
        .agg(F.sum("delta").alias("score"))
    )
    out = (
        graph.vertices.select("internal_id")
        .join(bc, "internal_id", "left")
        .select(
            "internal_id", F.coalesce("score", F.lit(0.0)).alias("score")
        )
    )
    if normalize_undirected:
        out = out.select(
            "internal_id", (F.col("score") / 2.0).alias("score")
        )
    return out
