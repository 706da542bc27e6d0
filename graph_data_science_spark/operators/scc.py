"""Strongly connected components (gds.alpha.scc, ref:
alpha/alpha-algo/.../scc/SccAlgorithm.java:34 — sequential Tarjan there).

Spark-first formulation: the *coloring* algorithm (Orzan FB-coloring — the
standard distributed SCC used by Pregel-family systems):

repeat until every node is assigned:
  1. forward max-label propagation over the unassigned subgraph:
     color(v) = max node id that can reach v (iterative join+max, the same
     kernel as WCC's min-label propagation),
  2. every color class has a root r with color(r) == r; the SCC of r =
     nodes of color r that can reach r *within* the color class — one
     backward BFS per round (all roots in parallel, label = color),
  3. assign & remove those SCCs; iterate.

Output matches GDS: (internal_id, component) where the component id is the
root's id (a stable, deterministic representative). Each round peels at
least every root's SCC; rounds are O(number of 'deep' SCC chains), with
all per-round work fully data-parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from ..plans.checkpoint import loop_checkpoint


def scc(graph: Graph, *, max_rounds: int | None = None) -> DataFrame:
    """``max_rounds=None`` (default) loops until every node is assigned —
    each round peels at least every root's SCC so the count is naturally
    bounded by the number of SCCs. Passing a finite ``max_rounds`` raises
    if nodes remain unassigned when it is exhausted (GDS assigns every
    node a component; silently returning a partial assignment would be a
    correctness bug on long dependency chains)."""
    spark = graph.spark
    edges = (
        graph.edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = graph.vertices.select("internal_id").localCheckpoint(eager=True)
    assigned = spark.createDataFrame([], "internal_id long, component long")

    round_no = 0
    while True:
        if nodes.isEmpty():
            break
        round_no += 1
        if max_rounds is not None and round_no > max_rounds:
            raise RuntimeError(
                f"scc: max_rounds={max_rounds} exhausted with nodes still "
                "unassigned; pass max_rounds=None to run to completion"
            )
        live = nodes
        e = (
            edges.join(
                live.select(F.col("internal_id").alias("src")), "src"
            )
            .join(live.select(F.col("internal_id").alias("dst")), "dst")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        # 1. forward max-label propagation to fixpoint
        colors = live.select(
            "internal_id", F.col("internal_id").alias("color")
        ).localCheckpoint(eager=True)
        _fwd = 0
        while True:
            _fwd += 1
            msgs = (
                e.join(
                    colors.select(
                        F.col("internal_id").alias("src"), "color"
                    ),
                    "src",
                )
                .groupBy(F.col("dst").alias("internal_id"))
                .agg(F.max("color").alias("in_max"))
            )
            nxt = (
                colors.join(msgs, "internal_id", "left")
                .select(
                    "internal_id",
                    F.col("color").alias("old"),
                    F.greatest(
                        "color", F.coalesce("in_max", "color")
                    ).alias("color"),
                )
            )
            nxt = loop_checkpoint(nxt, _fwd)
            changed = nxt.filter(F.col("color") != F.col("old")).count()
            colors = nxt.select("internal_id", "color")
            if changed == 0:
                break
        # 2. backward BFS from roots within each color class
        roots = colors.filter(F.col("internal_id") == F.col("color")).select(
            "internal_id", "color"
        )
        in_scc = roots.localCheckpoint(eager=True)
        frontier = in_scc
        rev = e.select(
            F.col("dst").alias("from_"), F.col("src").alias("to_")
        )
        _bwd = 0
        while True:
            _bwd += 1
            step = (
                rev.join(
                    frontier.select(
                        F.col("internal_id").alias("from_"), "color"
                    ),
                    "from_",
                )
                .select(F.col("to_").alias("internal_id"), "color")
                .join(
                    colors.withColumnRenamed("color", "c2"), "internal_id"
                )
                .filter(F.col("color") == F.col("c2"))
                .select("internal_id", "color")
                .distinct()
                .join(
                    in_scc.select("internal_id"), "internal_id", "left_anti"
                )
            )
            step = loop_checkpoint(step, _bwd)
            if step.isEmpty():
                break
            in_scc = loop_checkpoint(in_scc.unionByName(step), _bwd)
            frontier = step
        assigned = loop_checkpoint(
            assigned.unionByName(
                in_scc.select("internal_id", F.col("color").alias("component"))
            ),
            round_no,
        )
        nodes = loop_checkpoint(
            nodes.join(
                in_scc.select("internal_id"), "internal_id", "left_anti"
            ),
            round_no,
        )

    return assigned
