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
        # loser of a same-color conflict = higher node id (recolors next).
        # offset = rank among the loser's smaller-id same-color conflict
        # neighbors: instead of every loser speculatively grabbing the
        # SAME first-free color (which on dense/clique-like regions
        # resolves one node per round — O(chromatic-number) rounds), the
        # r-th-ranked loser takes the r-th free color, so a clique colors
        # in one round and collisions only persist across non-adjacent
        # overlap — geometric convergence in practice.
        conflicted = (
            adj.filter(
                (F.col("c_src") == F.col("c_dst"))
                & (F.col("src") > F.col("dst"))
            )
            .groupBy("src")
            .agg((F.count(F.lit(1)) - 1).alias("offset"))
        )
        n_conf = conflicted.count()
        if n_conf == 0:
            ran, converged = t, True
            break
        # forbidden = all neighbor colors of conflicted nodes
        forb = (
            adj.join(conflicted, "src")
            .groupBy("src", "offset")
            .agg(F.array_sort(F.collect_set("c_dst")).alias("used"))
        )
        # offset-th non-negative color not in `used`: enumerate the free
        # colors in [0, size(used)+offset] (always enough to contain
        # offset+1 gaps) and index into them
        free_pick = F.get(
            F.array_except(
                F.sequence(
                    F.lit(0), F.size("used") + F.col("offset") + F.lit(1)
                ),
                F.col("used"),
            ),
            F.col("offset"),
        ).cast("long")
        recolored = forb.select(
            F.col("src").alias("internal_id"), free_pick.alias("new_color")
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
