"""Approximate Maximum k-Cut (gds.maxkcut) — deterministic local search.

Reference semantics (GDS 2.x `gds.maxkcut`: place every node into one of
``k`` communities so the total weight of edges CROSSING communities is
maximized; the reference runs VNS — randomized greedy local moves with
perturbation restarts — and returns the assignment plus ``cutCost``).
The reference tree predates the procedure; semantics follow the published
GDS 2.x API (approxMaxKCut: k, iterations, relationship weights).

Spark-first formulation, deterministic by construction so the result is
exactly replayable in plain SQL (the same discipline as
``operators/mlops.split_relationships``):

- init: community = portable multiplicative hash of the node id mod k
  (no ``rand()`` — identical on any engine / partitioning).
- each iteration is one synchronous local-search sweep: for every node
  compute its weight to each of the k communities (one shuffle join of
  the symmetrized edges against the current assignment + one groupBy),
  then move it to the community minimizing internal weight (argmin with
  smallest-community tiebreak — minimizing weight to OWN community
  maximizes the cut). Only nodes whose per-iteration parity hash fires
  actually move: synchronous all-node updates oscillate on bipartite-ish
  structures (the classic 2-coloring flip-flop); gating alternating
  halves is the standard symmetric-break and keeps every step a pure
  function of (id, iteration) — no schedule dependence.
- cut cost = sum of weights over the ORIGINAL directed edges whose
  endpoints land in different communities.

Scale: per iteration one equi-join edges⋈assignment (shuffle on dst),
one (node, community) partial-aggregated sum, and one k·|V|-row window
argmin partitioned by node — no per-node adjacency arrays, no driver
loops over nodes. k is small (2-8 in practice) so the candidate explode
is a constant factor on |V|.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..graph import Graph
from ..plans.checkpoint import loop_checkpoint

_MOD = 1_000_003  # prime modulus of the portable hash (mlops._SPLIT_MOD)


def _init_comm(col, k: int):
    return F.pmod(col * F.lit(2654435761) + F.lit(97), F.lit(_MOD)) % k


def _move_gate(col, iteration: int):
    return (
        F.pmod(col * F.lit(40503) + F.lit(iteration * 97), F.lit(_MOD)) % 2
        == 0
    )


@dataclass
class MaxKCutResult:
    assignment: DataFrame  # (internal_id, community)
    cut_cost: float
    k: int
    ran_iterations: int


def approx_max_k_cut(
    graph: Graph,
    k: int = 2,
    *,
    iterations: int = 8,
    relationship_weight: str | None = None,
) -> MaxKCutResult:
    """Deterministic approximate max k-cut.

    ``relationship_weight`` names an edge column; unweighted edges count
    1.0. Self-loops never cross a cut and are dropped.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    w = (
        F.col(relationship_weight).cast("double")
        if relationship_weight
        else F.lit(1.0)
    )
    e = (
        graph.edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst", w.alias("w"))
    )
    sym = e.unionByName(
        e.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    ).localCheckpoint(eager=False)

    nodes = graph.vertices.select("internal_id")
    comm = nodes.select(
        "internal_id",
        _init_comm(F.col("internal_id"), k).cast("long").alias("community"),
    ).localCheckpoint(eager=True)

    cands = nodes.select(
        "internal_id",
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("cand"),
    ).localCheckpoint(eager=True)

    win = Window.partitionBy("internal_id").orderBy("w_to", "cand")
    for t in range(1, iterations + 1):
        w_to = (
            sym.join(
                comm.select(
                    F.col("internal_id").alias("dst"),
                    F.col("community").alias("cand"),
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("internal_id"), "cand")
            .agg(F.sum("w").alias("w_to"))
        )
        best = (
            cands.join(w_to, ["internal_id", "cand"], "left")
            .withColumn("w_to", F.coalesce("w_to", F.lit(0.0)))
            .withColumn("rn", F.row_number().over(win))
            .filter(F.col("rn") == 1)
            .select("internal_id", F.col("cand").alias("best"))
        )
        comm = loop_checkpoint(
            comm.join(best, "internal_id").select(
                "internal_id",
                F.when(
                    _move_gate(F.col("internal_id"), t), F.col("best")
                )
                .otherwise(F.col("community"))
                .cast("long")
                .alias("community"),
            ),
            t,
        )

    ca = comm.select(
        F.col("internal_id").alias("src"), F.col("community").alias("ca")
    )
    cb = comm.select(
        F.col("internal_id").alias("dst"), F.col("community").alias("cb")
    )
    cut = (
        e.join(ca, "src")
        .join(cb, "dst")
        .filter(F.col("ca") != F.col("cb"))
        .agg(F.coalesce(F.sum("w"), F.lit(0.0)))
        .collect()[0][0]
    )
    return MaxKCutResult(
        assignment=comm,
        cut_cost=float(cut),
        k=k,
        ran_iterations=iterations,
    )
