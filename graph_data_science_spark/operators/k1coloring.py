"""K-1 coloring (gds.beta.k1coloring) — iterative greedy conflict
resolution.

Reference semantics (beta/k1coloring/K1Coloring.java:65; ColoringStep /
ValidationStep): start with color 0 everywhere; repeat {assign each
*conflicting* node the smallest color not used by its neighbors; a node
conflicts if a neighbor has the same color and (tie-break) it loses the
priority comparison} until no conflicts or max_iterations. The result is a
valid (not necessarily minimal) coloring; GDS breaks symmetric conflicts by
node id — we keep the higher id as the "loser" that recolors.

Spark: per iteration, one join to find conflicts + one aggregation
collecting forbidden colors for conflicted nodes only (sorted set built
JVM-side; smallest free color via array scan) — the frontier shrinks
geometrically so later iterations touch few rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from ..plans.checkpoint import loop_checkpoint


def k1coloring(
    graph: Graph, *, max_iterations: int = 10
) -> tuple[DataFrame, int, bool]:
    """Returns (colors_df(internal_id, color long), ran_iterations, did_converge).
    Treats the graph as undirected (a proper coloring constraint is
    symmetric)."""
    e = graph.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    sym = (
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    colors = graph.vertices.select(
        "internal_id", F.lit(0).cast("long").alias("color")
    ).localCheckpoint(eager=True)

    ran, converged = max_iterations, False
    for t in range(1, max_iterations + 1):
        mine = colors.select(
            F.col("internal_id").alias("src"), F.col("color").alias("c_src")
        )
        theirs = colors.select(
            F.col("internal_id").alias("dst"), F.col("color").alias("c_dst")
        )
        adj = sym.join(mine, "src").join(theirs, "dst")
        # loser of a same-color conflict = higher node id (recolors next)
        conflicted = (
            adj.filter(
                (F.col("c_src") == F.col("c_dst"))
                & (F.col("src") > F.col("dst"))
            )
            .select("src")
            .distinct()
        )
        n_conf = conflicted.count()
        if n_conf == 0:
            ran, converged = t, True
            break
        # forbidden = all neighbor colors of conflicted nodes
        forb = (
            adj.join(conflicted, "src")
            .groupBy("src")
            .agg(F.array_sort(F.collect_set("c_dst")).alias("used"))
        )
        # smallest non-negative color not in `used`: scan the sorted set —
        # position where used[i] != i is the first gap
        first_free = F.coalesce(
            F.get(
                F.filter(
                    F.transform(
                        F.sequence(F.lit(0), F.size("used") - 1),
                        lambda i: F.when(F.get("used", i) != i, i).otherwise(
                            F.lit(None)
                        ),
                    ),
                    lambda x: x.isNotNull(),
                ),
                F.lit(0),
            ),
            F.size("used"),
        ).cast("long")
        recolored = forb.select(
            F.col("src").alias("internal_id"), first_free.alias("new_color")
        )
        colors = loop_checkpoint(
            colors.join(recolored, "internal_id", "left")
            .select(
                "internal_id",
                F.coalesce("new_color", "color").alias("color"),
            ),
            t,
        )

    return colors, ran, converged
