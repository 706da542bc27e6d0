"""Minimum/maximum spanning tree (gds.alpha.spanningTree.*).

The reference runs sequential Prim (alpha/.../spanningTrees/Prim.java:48).
The data-parallel formulation is **Borůvka**: every component picks its
cheapest outgoing edge, all picked edges join the forest at once, and
components contract — O(log V) rounds, each round = one aggregation + a
hash-min WCC contraction. Deterministic tie-breaking by
(weight, src, dst) makes the result unique.

Returns the forest's edge set (parent-pointer-free, matching GDS's
relationship-stream shape): (src, dst, weight).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from ..plans.checkpoint import loop_checkpoint


def spanning_tree(
    graph: Graph, *, maximum: bool = False, max_rounds: int = 64
) -> DataFrame:
    """Minimum (or maximum) spanning forest over the undirected view."""
    sign = -1.0 if maximum else 1.0
    e = graph.edges.select(
        F.least("src", "dst").alias("a"),
        F.greatest("src", "dst").alias("b"),
        (F.col("weight") * sign).alias("w"),
    ).filter(F.col("a") != F.col("b"))
    # parallel edges: keep cheapest (deterministic)
    e = e.groupBy("a", "b").agg(F.min("w").alias("w")).localCheckpoint(
        eager=True
    )

    comp = (
        e.select(F.col("a").alias("v"))
        .unionByName(e.select(F.col("b").alias("v")))
        .distinct()
        .select("v", F.col("v").alias("c"))
        .localCheckpoint(eager=True)
    )
    forest = None
    for _round in range(max_rounds):
        ca = comp.select(F.col("v").alias("a"), F.col("c").alias("ca"))
        cb = comp.select(F.col("v").alias("b"), F.col("c").alias("cb"))
        cross = (
            e.join(ca, "a")
            .join(cb, "b")
            .filter(F.col("ca") != F.col("cb"))
        )
        if cross.isEmpty():
            break
        # each component's cheapest outgoing edge; ties -> smallest (a, b)
        pick_expr = F.min(
            F.struct(F.col("w"), F.col("a"), F.col("b"))
        ).alias("pick")
        picks = (
            cross.select(F.col("ca").alias("comp"), "w", "a", "b")
            .unionByName(
                cross.select(F.col("cb").alias("comp"), "w", "a", "b")
            )
            .groupBy("comp")
            .agg(pick_expr)
            .select(
                F.col("pick.a").alias("a"),
                F.col("pick.b").alias("b"),
                F.col("pick.w").alias("w"),
            )
            .distinct()
        )
        picks = loop_checkpoint(picks, _round + 1)
        forest = (
            picks if forest is None
            else loop_checkpoint(
                forest.unionByName(picks).distinct(), _round + 1
            )
        )
        # contract: hash-min propagation over picked edges until stable
        links = picks.select("a", "b")
        _c = 0
        while True:
            _c += 1
            ca2 = comp.select(F.col("v").alias("a"), F.col("c").alias("c1"))
            cb2 = comp.select(F.col("v").alias("b"), F.col("c").alias("c2"))
            m = links.join(ca2, "a").join(cb2, "b")
            pairs = m.select(
                F.col("c1").alias("x"), F.col("c2").alias("y")
            ).unionByName(
                m.select(F.col("c2").alias("x"), F.col("c1").alias("y"))
            )
            relabel = pairs.groupBy("x").agg(F.min("y").alias("newc")).filter(
                F.col("newc") < F.col("x")
            )
            if relabel.isEmpty():
                break
            comp = loop_checkpoint(
                comp.join(
                    relabel.withColumnRenamed("x", "c"), "c", "left"
                )
                .select(
                    "v", F.coalesce("newc", F.col("c")).alias("c")
                ),
                _c,
            )
    if forest is None:
        return graph.spark.createDataFrame(
            [], "src long, dst long, weight double"
        )
    return forest.select(
        F.col("a").alias("src"),
        F.col("b").alias("dst"),
        (F.col("w") * sign).alias("weight"),
    )
