"""DAG operators: topological sort, longest path, Bellman-Ford.

Reference scope note: the reference tree (~GDS 1.6) does not ship these —
they arrived in GDS 2.x (`gds.dag.topologicalSort`, `gds.dag.longestPath`,
`gds.bellmanFord`); included here for the link-graph workloads they serve
(dependency ordering of an import/build graph, critical-path analysis,
shortest paths with signed edge costs).

Spark-first shapes:

- :func:`topological_sort` — layered Kahn peeling. Each round removes the
  current in-degree-0 set as one layer: ``indeg`` is a groupBy(dst) agg,
  the new layer is a left-anti join of live nodes against it, and the
  peeled nodes' out-edges leave the live set with a second left-anti.
  Rounds = DAG depth; everything is (long, long) rows and each round is
  O(3) shuffles of the shrinking live set. Nodes on or downstream-closed
  under a cycle are never peeled and are EXCLUDED from the output
  (GDS 2.x semantics: cyclic nodes are absent, no error). The returned
  ``layer`` equals the maximum hop distance from any source node
  (maxDistanceFromSource with unit weights): a node is peeled in round k
  iff its longest predecessor chain has k edges.
- :func:`dag_longest_path` — the same peel, accumulating the weighted
  longest distance from the sources: when round k peels node v, every
  in-edge of v originates in an earlier layer, so
  ``dist(v) = max(dist(u) + w(u,v))`` is final the moment v is peeled.
  One extra join of the new layer's in-edges against the settled
  distance table per round.
- :func:`bellman_ford` — signed-weight single-source shortest paths with
  negative-cycle detection: the same changed-set frontier relaxation as
  :func:`..traverse.sssp` (one shuffle per round), but iterated to the
  |V|-round Bellman-Ford bound; a frontier still improving after |V|-1
  relaxation rounds proves a reachable negative cycle (raised by default).

Scale notes: peeling rounds equal DAG depth — fine for dependency/build
graphs (depth tens), wrong for path-like DAGs (depth ~|V|); the round
count is capped and raises rather than running unbounded. All loops
truncate plan growth via ``loop_checkpoint``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from ..plans.checkpoint import loop_checkpoint


class NegativeCycleError(RuntimeError):
    """A negative-weight cycle is reachable from the source."""


def _peel(
    graph: Graph,
    *,
    weighted: bool,
    max_layers: int,
    metrics_out: dict | None,
) -> DataFrame:
    """Kahn-peel ``graph``; returns (internal_id, layer int, dist double)
    for every node NOT on/under a cycle. ``dist`` is the weighted longest
    distance from any source (in-degree-0) node; with ``weighted=False``
    dist == layer."""
    w = F.col("weight") if weighted and "weight" in graph.edges.columns \
        else F.lit(1.0)
    edges = (
        graph.edges.select("src", "dst", w.cast("double").alias("w"))
        .groupBy("src", "dst")
        .agg(F.max("w").alias("w"))  # longest path: parallel edges -> max
        .localCheckpoint(eager=True)
    )
    live_nodes = graph.vertices.select(
        F.col("internal_id").alias("id")
    ).localCheckpoint(eager=True)
    live_edges = edges
    spark = graph.spark
    done = spark.createDataFrame(
        [], "internal_id long, layer int, dist double"
    )
    layer = -1
    while True:
        layer += 1
        if layer > max_layers:
            raise RuntimeError(
                f"topological peel exceeded max_layers={max_layers}; "
                "the DAG is deeper than expected (path-like DAGs do not "
                "fit the layered formulation — raise max_layers if "
                "intended)"
            )
        indeg = live_edges.select(F.col("dst").alias("id")).distinct()
        roots = live_nodes.join(indeg, "id", "left_anti")
        # settled longest distance: all in-edges of a root come from DONE
        # nodes (that is what made it a root). Sources get dist 0.
        dist = (
            edges.join(
                roots.select(F.col("id").alias("dst")), "dst"
            )
            .join(
                done.select(
                    F.col("internal_id").alias("src"),
                    F.col("dist").alias("d_src"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.max(F.col("d_src") + F.col("w")).alias("dist"))
        )
        new = roots.join(dist, "id", "left").select(
            F.col("id").alias("internal_id"),
            F.lit(layer).alias("layer"),
            F.coalesce("dist", F.lit(0.0)).alias("dist"),
        )
        new = loop_checkpoint(new, layer, every=4)
        if new.isEmpty():
            break
        done = loop_checkpoint(done.unionByName(new), layer, every=4)
        live_nodes = loop_checkpoint(
            live_nodes.join(new.select(F.col("internal_id").alias("id")),
                            "id", "left_anti"),
            layer,
            every=4,
        )
        live_edges = loop_checkpoint(
            live_edges.join(
                new.select(F.col("internal_id").alias("src")), "src",
                "left_anti",
            ),
            layer,
            every=4,
        )
    if metrics_out is not None:
        metrics_out["layers"] = layer
        metrics_out["excluded_cyclic"] = live_nodes.count()
    return done


def topological_sort(
    graph: Graph,
    *,
    max_layers: int = 10_000,
    metrics_out: dict | None = None,
) -> DataFrame:
    """(internal_id, layer int) — layer is the maximum hop distance from
    any source node; ordering by (layer, internal_id) is a deterministic
    valid topological order. Nodes on a cycle (or reachable only through
    one) are absent (GDS 2.x `gds.dag.topologicalSort` semantics)."""
    return _peel(
        graph, weighted=False, max_layers=max_layers,
        metrics_out=metrics_out,
    ).select("internal_id", "layer")


def dag_longest_path(
    graph: Graph,
    *,
    weighted: bool = True,
    max_layers: int = 10_000,
    metrics_out: dict | None = None,
) -> DataFrame:
    """(internal_id, distance double) — weighted longest distance from
    the DAG's source (in-degree-0) nodes (GDS 2.x `gds.dag.longestPath`
    cost surface). Cyclic nodes are absent; parallel edges take the
    maximum weight."""
    return _peel(
        graph, weighted=weighted, max_layers=max_layers,
        metrics_out=metrics_out,
    ).select("internal_id", F.col("dist").alias("distance"))


def bellman_ford(
    graph: Graph,
    source: int,
    *,
    weighted: bool = True,
    on_negative_cycle: str = "raise",
    metrics_out: dict | None = None,
) -> DataFrame:
    """(internal_id, distance double) single-source shortest paths that
    admit NEGATIVE edge weights (GDS 2.x `gds.bellmanFord`). Unreached
    nodes are absent.

    Changed-set frontier relaxation (identical plan shape to
    ``traverse.sssp``) run to the Bellman-Ford bound: any improvement
    still possible after |V|-1 rounds proves a reachable negative cycle.
    ``on_negative_cycle``: "raise" (default) raises
    :class:`NegativeCycleError`; "flag" returns the (meaningless along
    the cycle) distances and sets ``metrics_out["negative_cycle"]``.
    """
    if on_negative_cycle not in ("raise", "flag"):
        raise ValueError("on_negative_cycle must be 'raise' or 'flag'")
    spark = graph.spark
    w = F.col("weight") if weighted and "weight" in graph.edges.columns \
        else F.lit(1.0)
    edges = (
        graph.edges.select("src", "dst", w.cast("double").alias("w"))
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
        .localCheckpoint(eager=False)
    )
    n = graph.vertices.count()
    dist = spark.createDataFrame(
        [(source, 0.0)], "internal_id long, distance double"
    ).localCheckpoint(eager=True)
    frontier = dist
    neg_cycle = False
    for it in range(1, n + 1):
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
        merged = loop_checkpoint(merged, it)
        frontier = merged.filter("improved").select(
            "internal_id", "distance"
        )
        dist = merged.select("internal_id", "distance")
        if frontier.isEmpty():
            break
    else:
        # |V| rounds exhausted with a live frontier: the |V|-th round
        # still improved some distance -> reachable negative cycle.
        neg_cycle = True
    if metrics_out is not None:
        metrics_out["iterations"] = it
        metrics_out["negative_cycle"] = neg_cycle
    if neg_cycle and on_negative_cycle == "raise":
        raise NegativeCycleError(
            "a negative-weight cycle is reachable from the source; "
            "distances along it are unbounded below"
        )
    return dist
