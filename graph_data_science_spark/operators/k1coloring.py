"""K-1 coloring (gds.beta.k1coloring) — iterative greedy conflict
resolution.

Reference semantics (beta/k1coloring/K1Coloring.java:65; ColoringStep /
ValidationStep): start with color 0 everywhere; repeat {assign each
*conflicting* node the smallest color not used by its neighbors; a node
conflicts if a neighbor has the same color and (tie-break) it loses the
priority comparison} until no conflicts or max_iterations. The result is a
valid (not necessarily minimal) coloring; GDS breaks symmetric conflicts by
node id — we keep the higher id as the "loser" that recolors.

Spark: initial colors hash-spread over a Δ+1 palette (expected
monochromatic edges m/(Δ+1) — the all-zero start used before round 3
made the first conflict graph THE WHOLE GRAPH, which on dense inputs
(sf0.1 mod graph: avg degree ≈148) resolved only a sliver per round —
53k residual conflicts after 10 rounds). Each iteration then recolors
the hash-priority WINNERS among conflicted nodes: u recolors only if
its per-round priority beats every *conflicted* neighbor, so no
neighbor of a recoloring node moves in the same round — the smallest
free color is chosen against static neighbor colors and can never
create a new conflict. Conflict edges strictly shrink (Luby-style
expected constant fraction per round); one join to find conflicts +
one aggregation collecting forbidden colors for winners only.
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
    # Δ+1 palette spread: expected m/(Δ+1) initial conflict edges
    delta_row = sym.groupBy("src").count().agg(F.max("count")).collect()
    palette = int(delta_row[0][0] or 0) + 1
    colors = graph.vertices.select(
        "internal_id",
        F.pmod(F.xxhash64("internal_id"), F.lit(palette))
        .cast("long")
        .alias("color"),
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
        confl_nodes = (
            adj.filter(F.col("c_src") == F.col("c_dst"))
            .select("src")
            .distinct()
            .localCheckpoint(eager=False)
        )
        n_conf = confl_nodes.count()
        if n_conf == 0:
            ran, converged = t, True
            break
        # Luby-style winners: a conflicted node recolors iff its
        # per-round hash priority (ties broken by id) beats every
        # CONFLICTED neighbor — no neighbor of a winner moves this
        # round, so picks are against static colors and never create a
        # new conflict; the global max always wins, so the loop cannot
        # stall.
        pri = F.xxhash64(F.col("src"), F.lit(t))
        nbr_best = (
            sym.join(
                confl_nodes.withColumnRenamed("src", "dst"), "dst"
            )
            .select(
                "src",
                F.struct(
                    F.xxhash64(F.col("dst"), F.lit(t)).alias("p"),
                    F.col("dst").alias("n"),
                ).alias("cand"),
            )
            .groupBy("src")
            .agg(F.max("cand").alias("mx"))
        )
        winners = (
            confl_nodes.join(nbr_best, "src")
            .filter(
                F.struct(pri.alias("p"), F.col("src").alias("n"))
                > F.col("mx")
            )
            .select("src")
        )
        # forbidden = ALL neighbor colors of each winner; pick the
        # smallest non-negative color outside the set (enumerate
        # [0, |used|+1] — always contains a gap)
        forb = (
            adj.join(winners, "src")
            .groupBy("src")
            .agg(F.array_sort(F.collect_set("c_dst")).alias("used"))
        )
        free_pick = F.get(
            F.array_except(
                F.sequence(F.lit(0), F.size("used") + F.lit(1)),
                F.col("used"),
            ),
            F.lit(0),
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
