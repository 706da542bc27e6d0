"""Leiden community detection (local moving → refinement → aggregation).

Reference scope note: `gds.leiden` arrived in GDS 2.x (the ~1.6
reference ships Louvain only); included because Leiden's headline fix —
Louvain can and does emit internally DISCONNECTED communities (Traag,
Waltman & van Eck 2019, "From Louvain to Leiden: guaranteeing
well-connected communities", Sci. Rep. 9:5233) — matters most on exactly
the web-scale link graphs this engine targets.

Per level:

1. **Local moving** — :func:`..louvain.modularity_optimization` (the same
   synchronous parity-sweep schedule as our Louvain; ``gamma`` resolution
   supported).
2. **Refinement** — every community is split into the connected
   components of its induced intra-community subgraph (one WCC run over
   the intra-community edges; component labels are min node ids, so
   refined ids are globally unique without coordination). This is the
   deterministic connectivity refinement: it restores Leiden's guarantee
   directly, and splitting a disconnected community NEVER decreases
   modularity (no intra edges cross its components, so the inside term is
   unchanged while Σtot² strictly drops). Divergence from the paper,
   documented: Leiden's randomized well-connectedness refinement can also
   split connected-but-weakly-linked communities; the deterministic
   variant keeps results reproducible across cluster sizes, which the
   engine treats as the higher-priority property.
3. **Aggregation** — contract the graph on the REFINED partition, seeding
   the next level's local moving with the phase-1 communities (each
   refined community starts where local moving had put it — the defining
   Leiden aggregation rule; plain Louvain restarts from singletons).

The final assignment gets one last refinement pass, so the OUTPUT
invariant holds unconditionally: **every community is connected**.

Scale shape: everything is the Louvain machinery (per-sweep kic/ctot
aggregations + struct-argmax) plus one WCC per level over edges that
shrink every level. Per-level frames checkpoint with
``fresh_local_checkpoint`` (stats RESET, not plain ``localCheckpoint``):
each level multiplies inherited ``sizeInBytes`` estimates through
several joins, so by level 3 on a 100k-node graph the plain-checkpoint
stats are astronomically-large BigIntegers and the driver spends
minutes per planning step in ``BigInteger.multiply`` (diagnosed with a
thread dump; the loop-iteration reset of ``loop_checkpoint`` never
fires within ``max_levels`` ≤ 10 levels).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from ..plans.checkpoint import fresh_local_checkpoint
from .louvain import _sym_edges, modularity, modularity_optimization
from .wcc import wcc


def _refine_connected(
    vertices: DataFrame, sym_edges: DataFrame, assignment: DataFrame
) -> DataFrame:
    """Split each community into the connected components of its induced
    subgraph. Returns (internal_id, refined) — refined ids are the min
    internal id of the component (globally unique across communities)."""
    a = assignment.select(
        F.col("internal_id").alias("src"), F.col("community").alias("c_src")
    )
    b = assignment.select(
        F.col("internal_id").alias("dst"), F.col("community").alias("c_dst")
    )
    intra = (
        sym_edges.join(a, "src")
        .join(b, "dst")
        .filter(F.col("c_src") == F.col("c_dst"))
        .select("src", "dst", "weight")
    )
    comp = wcc(Graph(vertices, intra))
    return comp.select("internal_id", F.col("component").alias("refined"))


@dataclass
class LeidenResult:
    assignment: DataFrame  # (internal_id, community) — communities CONNECTED
    modularity: float
    levels: int


def leiden(
    graph: Graph,
    *,
    gamma: float = 1.0,
    max_levels: int = 10,
    max_iterations: int = 10,
    tolerance: float = 1e-4,
) -> LeidenResult:
    """Connected-communities detection. ``gamma`` is the resolution
    parameter (GDS 2.x default 1.0). The returned partition satisfies the
    Leiden guarantee: every community induces a connected subgraph."""
    mapping = graph.vertices.select(
        "internal_id", F.col("internal_id").alias("community")
    ).localCheckpoint(eager=True)
    cur_vertices = graph.vertices.select(
        "internal_id", F.col("internal_id").alias("original_id")
    )
    cur_sym = _sym_edges(graph).localCheckpoint(eager=True)
    seed: DataFrame | None = None
    last_q = -1.0
    levels = 0
    for _level in range(max_levels):
        cur = Graph(cur_vertices, cur_sym)
        res = modularity_optimization(
            cur,
            max_iterations=max_iterations,
            tolerance=tolerance,
            seed_assignment=seed,
            gamma=gamma,
        )
        levels += 1
        refined = fresh_local_checkpoint(
            _refine_connected(cur_vertices, cur_sym, res.assignment)
        )
        # compose: original node -> current aggregated node -> refined
        mapping = fresh_local_checkpoint(
            mapping.join(
                refined.withColumnsRenamed(
                    {"internal_id": "community", "refined": "new_c"}
                ),
                "community",
            ).select("internal_id", F.col("new_c").alias("community"))
        )
        q = modularity(cur_sym, refined.withColumnRenamed(
            "refined", "community"))
        n_before = cur.vertices.count()
        n_refined = refined.select("refined").distinct().count()
        if q - last_q < tolerance or n_refined == n_before:
            last_q = max(q, last_q)
            break
        last_q = q
        # aggregate on the refined partition
        a = refined.select(
            F.col("internal_id").alias("src"), F.col("refined").alias("rs")
        )
        b = refined.select(
            F.col("internal_id").alias("dst"), F.col("refined").alias("rd")
        )
        cur_sym = fresh_local_checkpoint(
            cur_sym.join(a, "src")
            .join(b, "dst")
            .groupBy(F.col("rs").alias("src"), F.col("rd").alias("dst"))
            .agg(F.sum("weight").alias("weight"))
        )
        cur_vertices = fresh_local_checkpoint(
            refined.select(F.col("refined").alias("internal_id"))
            .distinct()
            .select(
                "internal_id", F.col("internal_id").alias("original_id")
            )
        )
        # Leiden seeding: each refined community starts in the community
        # local moving had assigned its nodes to (they all share one).
        seed = fresh_local_checkpoint(
            refined.join(res.assignment, "internal_id")
            .groupBy(F.col("refined").alias("internal_id"))
            .agg(F.min("community").alias("community"))
        )
    return LeidenResult(
        assignment=mapping, modularity=last_q, levels=levels
    )
