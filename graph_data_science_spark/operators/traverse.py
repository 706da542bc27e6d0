"""Traversal + shortest paths: BFS, DFS, single-source shortest path.

- :func:`bfs` (gds.alpha.bfs.stream, ref alpha/.../traverse/Traverse.java:34-201):
  hop levels via iterative frontier joins — one shuffle per hop.
- :func:`dfs` (gds.alpha.dfs.stream): inherently sequential; computed on
  per-partition adjacency after a single collect of the *reachable*
  subgraph (documented driver-side fallback, intended for small traversals
  — GDS's own DFS is single-threaded too).
- :func:`sssp` (gds.alpha.shortestPath.deltaStepping /
  gds.beta.shortestPath.dijkstra cost-equivalent, ref
  beta/paths/dijkstra/Dijkstra.java:48, ShortestPathDeltaStepping.java:52):
  frontier-relaxation (Bellman-Ford style with changed-set frontier, the
  scalable Spark formulation of delta-stepping); exact distances for
  non-negative weights.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from ..plans.checkpoint import loop_checkpoint


def bfs(
    graph: Graph, source: int, *, max_depth: int | None = None
) -> DataFrame:
    """(internal_id, hop) for nodes reachable from ``source``."""
    spark = graph.spark
    edges = graph.edges.select("src", "dst").distinct().localCheckpoint(
        eager=False
    )
    visited = spark.createDataFrame(
        [(source, 0)], "internal_id long, hop int"
    ).localCheckpoint(eager=True)
    frontier = visited
    hop = 0
    while True:
        hop += 1
        if max_depth is not None and hop > max_depth:
            break
        nxt = (
            edges.join(
                frontier.select(F.col("internal_id").alias("src")), "src"
            )
            .select(F.col("dst").alias("internal_id"))
            .distinct()
            .join(visited.select("internal_id", F.lit(1).alias("__v")),
                  "internal_id", "left_anti")
            .select("internal_id", F.lit(hop).alias("hop"))
        )
        nxt = loop_checkpoint(nxt, hop)
        if nxt.isEmpty():
            break
        visited = loop_checkpoint(visited.unionByName(nxt), hop)
        frontier = nxt
    return visited


def dfs(graph: Graph, source: int, *, max_nodes: int = 1_000_000) -> list[int]:
    """Preorder DFS visit order (neighbors in ascending id order, matching
    a deterministic schedule). Driver-side on the reachable subgraph."""
    reach = bfs(graph, source)
    sub = (
        graph.edges.join(
            reach.select(F.col("internal_id").alias("src")), "src"
        )
        .select("src", "dst")
        .distinct()
        .collect()
    )
    if len(sub) > max_nodes:
        raise ValueError("DFS subgraph too large for driver-side traversal")
    adj: dict[int, list[int]] = {}
    for r in sub:
        adj.setdefault(r["src"], []).append(r["dst"])
    for v in adj:
        adj[v].sort(reverse=True)  # stack pops smallest first
    order, seen, stack = [], set(), [source]
    while stack:
        v = stack.pop()
        if v in seen:
            continue
        seen.add(v)
        order.append(v)
        stack.extend(n for n in adj.get(v, []) if n not in seen)
    return order


def sssp(
    graph: Graph,
    source: int,
    *,
    weighted: bool = True,
    max_iterations: int = 10_000,
) -> DataFrame:
    """(internal_id, distance double). Unreached nodes are absent.

    Frontier relaxation: each iteration relaxes only edges out of nodes
    whose distance improved last round; converged when no improvement.
    Exact for non-negative weights (Bellman-Ford fixpoint)."""
    spark = graph.spark
    w = F.col("weight") if weighted else F.lit(1.0)
    edges = graph.edges.select(
        "src", "dst", w.cast("double").alias("w")
    ).localCheckpoint(eager=False)
    dist = spark.createDataFrame(
        [(source, 0.0)], "internal_id long, distance double"
    ).localCheckpoint(eager=True)
    frontier = dist
    for _it in range(max_iterations):
        cand = (
            edges.join(
                frontier.select(
                    F.col("internal_id").alias("src"),
                    F.col("distance").alias("d_src"),
                ),
                "src",
            )
            .select(
                F.col("dst").alias("internal_id"),
                (F.col("d_src") + F.col("w")).alias("cand"),
            )
            .groupBy("internal_id")
            .agg(F.min("cand").alias("cand"))
        )
        merged = dist.join(cand, "internal_id", "full").select(
            "internal_id",
            F.least(
                F.coalesce("distance", F.lit(float("inf"))),
                F.coalesce("cand", F.lit(float("inf"))),
            ).alias("distance"),
            (
                F.coalesce("cand", F.lit(float("inf")))
                < F.coalesce("distance", F.lit(float("inf")))
            ).alias("improved"),
        )
        merged = loop_checkpoint(merged, _it + 1)
        frontier = merged.filter("improved").select("internal_id", "distance")
        dist = merged.select("internal_id", "distance")
        if frontier.isEmpty():
            break
    return dist


def shortest_path(
    graph: Graph, source: int, target: int, *, weighted: bool = True
) -> float | None:
    """Source→target cost (gds.beta.shortestPath.dijkstra cost surface)."""
    row = (
        sssp(graph, source, weighted=weighted)
        .filter(F.col("internal_id") == target)
        .collect()
    )
    return float(row[0]["distance"]) if row else None
