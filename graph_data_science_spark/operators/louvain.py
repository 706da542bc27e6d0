"""Modularity optimization + Louvain (gds.beta.modularityOptimization,
gds.louvain.*).

Reference semantics studied (beta/modularity/ModularityOptimization.java:
60-237 — per-node best-gain move with graph-coloring for parallel safety;
louvain/Louvain.java:84-124 — <=10 levels of optimize→coarsen, stop when
communities stop shrinking; defaults LouvainBaseConfig.java:36-58:
tolerance 1e-4, maxIterations 10, maxLevels 10).

Spark-first schedule: synchronous half-sweeps — on iteration t only nodes
with ``internal_id % 2 == t % 2`` may move (parity alternation replaces
GDS's k1-coloring; both exist to stop simultaneous-swap oscillation, and
like GDS the result is schedule-dependent but the modularity is
monotonically non-decreasing). Gain evaluation is two shuffles per
iteration: community totals + per-node neighbor-community weights, then a
struct-argmax. Modularity Q is recomputed exactly each iteration.

Louvain coarsens by community contraction (groupBy(c_src, c_dst).sum) and
recurses; the final assignment is the composition of per-level maps.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from ..plans.checkpoint import loop_checkpoint


def _sym_edges(graph: Graph) -> DataFrame:
    """Undirected weighted simple edges, both directions materialized,
    parallel edges summed. Self-loops preserved (they carry intra-weight)."""
    e = graph.edges.select("src", "dst", "weight")
    # reverse ALL edges (self-loops too): every edge's weight is counted
    # twice uniformly, so Q is unchanged (scale-invariant) and coarsened
    # self-loops stay on the same footing as cross edges
    rev = e.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
    )
    return (
        e.unionByName(rev)
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
    )


def modularity(sym: DataFrame, assignment: DataFrame) -> float:
    """Q over a both-directions edge table and (internal_id, community)."""
    m2 = sym.agg(F.sum("weight")).collect()[0][0] or 1.0
    a = assignment.select(
        F.col("internal_id").alias("src"), F.col("community").alias("c_src")
    )
    b = assignment.select(
        F.col("internal_id").alias("dst"), F.col("community").alias("c_dst")
    )
    joined = sym.join(a, "src").join(b, "dst")
    inside = (
        joined.filter(F.col("c_src") == F.col("c_dst"))
        .agg(F.sum("weight"))
        .collect()[0][0]
        or 0.0
    )
    deg = sym.groupBy("src").agg(F.sum("weight").alias("deg"))
    tot = (
        deg.join(
            a.withColumnRenamed("c_src", "c"), "src"
        )
        .groupBy("c")
        .agg(F.sum("deg").alias("tot"))
        .agg(F.sum(F.col("tot") * F.col("tot")))
        .collect()[0][0]
        or 0.0
    )
    return inside / m2 - tot / (m2 * m2)


@dataclass
class ModularityResult:
    assignment: DataFrame  # (internal_id, community)
    modularity: float
    ran_iterations: int


def modularity_optimization(
    graph: Graph,
    *,
    max_iterations: int = 10,
    tolerance: float = 1e-4,
    seed_assignment: DataFrame | None = None,
    gamma: float = 1.0,
) -> ModularityResult:
    """``gamma``: resolution parameter (CPM-style scaling of the null
    model term; 1.0 = classic modularity — larger values favor more,
    smaller communities). Used by :mod:`.leiden`."""
    sym = _sym_edges(graph).localCheckpoint(eager=True)
    m2 = sym.agg(F.sum("weight")).collect()[0][0] or 1.0
    deg = sym.groupBy(F.col("src").alias("internal_id")).agg(
        F.sum("weight").alias("deg")
    )
    deg = (
        graph.vertices.select("internal_id")
        .join(deg, "internal_id", "left")
        .select("internal_id", F.coalesce("deg", F.lit(0.0)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    if seed_assignment is None:
        comm = deg.select(
            "internal_id", F.col("internal_id").alias("community")
        )
    else:
        comm = seed_assignment
    comm = comm.localCheckpoint(eager=True)

    q_prev = modularity(sym, comm)
    ran = 0
    for t in range(max_iterations):
        ran = t + 1
        a = comm.select(
            F.col("internal_id").alias("dst"),
            F.col("community").alias("c_dst"),
        )
        # k_i_c: weight from node to each neighboring community
        kic = (
            sym.join(a, "dst")
            .groupBy(F.col("src").alias("internal_id"), F.col("c_dst").alias("c"))
            .agg(F.sum("weight").alias("kic"))
        )
        # staying put must always be a candidate: a node whose own community
        # has no intra-community neighbor (true for every node at singleton
        # init) gets no kic row for it, and without this floor the argmax
        # can pick a strictly-negative-ΔQ move. kic >= 0, so max() keeps the
        # real intra-weight when one exists.
        own_rows = comm.select(
            "internal_id",
            F.col("community").alias("c"),
            F.lit(0.0).alias("kic"),
        )
        kic = (
            kic.unionByName(own_rows)
            .groupBy("internal_id", "c")
            .agg(F.max("kic").alias("kic"))
        )
        ctot = (
            comm.join(deg, "internal_id")
            .groupBy(F.col("community").alias("c"))
            .agg(F.sum("deg").alias("tot"))
        )
        own = comm.select("internal_id", F.col("community").alias("own_c"))
        cand = (
            kic.join(ctot, "c")
            .join(own, "internal_id")
            .join(deg, "internal_id")
        )
        # gain ∝ kic - gamma * deg_i * tot'_c / m2, tot' excludes i when
        # c == own
        gain = F.col("kic") - F.lit(gamma) * F.col("deg") * (
            F.col("tot")
            - F.when(F.col("c") == F.col("own_c"), F.col("deg")).otherwise(0.0)
        ) / F.lit(m2)
        best = (
            cand.withColumn("gain", gain)
            .groupBy("internal_id")
            .agg(
                F.max(F.struct(F.col("gain"), (-F.col("c")).alias("negc")))
                .alias("b")
            )
            .select(
                "internal_id",
                (-F.col("b.negc")).alias("best_c"),
            )
        )
        movers = best.withColumn(
            "may_move", F.pmod(F.col("internal_id"), F.lit(2)) == (t % 2)
        )
        nxt = (
            comm.join(movers, "internal_id", "left")
            .select(
                "internal_id",
                F.when(
                    F.col("may_move") & F.col("best_c").isNotNull(),
                    F.col("best_c"),
                )
                .otherwise(F.col("community"))
                .alias("community"),
            )
        )
        comm = loop_checkpoint(nxt, t + 1)
        if t % 2 == 1:  # evaluate after each even+odd sweep pair
            q = modularity(sym, comm)
            if q - q_prev < tolerance:
                q_prev = max(q, q_prev)
                break
            q_prev = q
    return ModularityResult(
        assignment=comm, modularity=modularity(sym, comm), ran_iterations=ran
    )


@dataclass
class LouvainResult:
    assignment: DataFrame  # (internal_id, community)
    modularity: float
    levels: int


def louvain(
    graph: Graph,
    *,
    max_levels: int = 10,
    max_iterations: int = 10,
    tolerance: float = 1e-4,
) -> LouvainResult:
    mapping = graph.vertices.select(
        "internal_id", F.col("internal_id").alias("community")
    ).localCheckpoint(eager=True)
    cur = Graph(
        graph.vertices.select(
            "internal_id", F.col("internal_id").alias("original_id")
        ),
        _sym_edges(graph),
    )
    last_q = -1.0
    levels = 0
    for _level in range(max_levels):
        res = modularity_optimization(
            cur, max_iterations=max_iterations, tolerance=tolerance
        )
        levels += 1
        n_before = cur.vertices.count()
        n_comm = res.assignment.select("community").distinct().count()
        # compose: node -> current community -> new community
        mapping = loop_checkpoint(
            mapping.join(
                res.assignment.withColumnRenamed(
                    "community", "new_c"
                ).withColumnRenamed("internal_id", "community"),
                "community",
            )
            .select("internal_id", F.col("new_c").alias("community")),
            levels,
        )
        if res.modularity - last_q < tolerance or n_comm == n_before:
            last_q = max(res.modularity, last_q)
            break
        last_q = res.modularity
        # coarsen
        a = res.assignment.select(
            F.col("internal_id").alias("src"), F.col("community").alias("cs")
        )
        b = res.assignment.select(
            F.col("internal_id").alias("dst"), F.col("community").alias("cd")
        )
        new_edges = (
            cur.edges.join(a, "src")
            .join(b, "dst")
            .groupBy(F.col("cs").alias("src"), F.col("cd").alias("dst"))
            .agg(F.sum("weight").alias("weight"))
        )
        new_edges = loop_checkpoint(new_edges, levels)
        new_vertices = (
            res.assignment.select(
                F.col("community").alias("internal_id")
            )
            .distinct()
            .select("internal_id", F.col("internal_id").alias("original_id"))
        )
        new_vertices = loop_checkpoint(new_vertices, levels)
        cur = Graph(new_vertices, new_edges)
    return LouvainResult(
        assignment=mapping, modularity=last_q, levels=levels
    )
