"""Steiner tree (shortest-path heuristic).

Reference scope note: `gds.steinerTree` arrived in GDS 2.x (the ~1.6
reference has no Steiner procedure); included to close the path-family
surface — "cheapest subnetwork connecting a source to a set of
terminals" is the standard link-graph cabling/ownership question.

Algorithm: the shortest-path heuristic (the GDS default without
rerouting): every terminal is connected to the source along its
single-source shortest path. :func:`..paths.dijkstra_path` reconstructs
paths from ONE predecessor pass with a deterministic min-id tie-break,
so all paths are branches of a single predecessor tree — their edge
union is therefore itself a tree (no cycle handling needed), and the
result is reproducible across partitionings. Approximation quality is
the classic shortest-path-heuristic bound (≤ 2× optimal on metric
instances; GDS ships the same heuristic).

Output matches the GDS stream shape: one row per tree node —
(internal_id, parent, weight) with weight the cost of the parent→node
edge (source row: parent = source, weight 0). Unreachable terminals are
absent (GDS omits them too).

Scale notes: one sssp relaxation over the full graph (frontier joins,
same plan as traverse.sssp) + path reconstruction over the terminals'
ancestor closure only; the edge union is a groupBy over path segments —
rows bounded by Σ path lengths, not by |E|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from .paths import dijkstra_path


def steiner_tree(
    graph: Graph,
    source: int,
    targets: list[int],
    *,
    weighted: bool = True,
    metrics_out: dict | None = None,
) -> DataFrame:
    """(internal_id long, parent long, weight double) — the tree rows.

    ``metrics_out``: totalWeight (sum of tree edge weights) and
    effectiveNodeCount (tree nodes incl. source), matching the GDS
    stats surface.
    """
    paths = dijkstra_path(
        graph, source, targets=list(targets), weighted=weighted
    )
    # a target equal to the source yields a single-node path; guard it
    # out — sequence(1, 0) DESCENDS in Spark ([1, 0]), which would emit a
    # NULL-id segment plus a spurious duplicate root row
    seg = paths.filter(F.size("node_ids") > 1).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(node_ids) - 1), "
                "i -> struct(node_ids[i-1] AS parent, node_ids[i] AS id, "
                "costs[i] - costs[i-1] AS w))"
            )
        ).alias("e")
    )
    # all paths are branches of one predecessor tree: each node has ONE
    # parent, so min() just dedups float noise from shared prefixes
    edges = (
        seg.groupBy(F.col("e.id").alias("internal_id"))
        .agg(
            F.min("e.parent").alias("parent"),
            F.min("e.w").alias("weight"),
        )
    )
    root = graph.spark.createDataFrame(
        [(source, source, 0.0)], "internal_id long, parent long, weight double"
    )
    tree = root.unionByName(edges)
    if metrics_out is not None:
        agg = tree.agg(
            F.sum("weight").alias("tw"), F.count(F.lit(1)).alias("nc")
        ).collect()[0]
        metrics_out["totalWeight"] = float(agg["tw"])
        metrics_out["effectiveNodeCount"] = int(agg["nc"])
    return tree
