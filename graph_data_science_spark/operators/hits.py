"""HITS hubs & authorities (gds.alpha.hits — Pregel-based in the
reference: alpha/alpha-proc/.../gds/pregel/Hits.java:41-65).

Per iteration (synchronous, matching the Pregel formulation):
  auth(v)  = Σ_{u→v} hub(u)      then L2-normalize auths
  hub(v)   = Σ_{v→w} auth(w)     then L2-normalize hubs
Convergence: max |Δ| ≤ tolerance or max_iterations.

Spark: two one-shuffle aggregations per iteration (forward and reverse
edge direction), normalization constants via tiny agg actions; plan
truncated each iteration with localCheckpoint.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from ..plans.checkpoint import loop_checkpoint


@dataclass
class HitsResult:
    scores: DataFrame  # (internal_id, hub double, auth double)
    ran_iterations: int
    converged: bool


def hits(
    graph: Graph,
    *,
    max_iterations: int = 20,
    tolerance: float = 1e-7,
) -> HitsResult:
    edges = graph.edges.select("src", "dst").localCheckpoint(eager=False)
    state = graph.vertices.select(
        "internal_id", F.lit(1.0).alias("hub"), F.lit(1.0).alias("auth")
    ).localCheckpoint(eager=True)

    ran, converged = max_iterations, False
    for t in range(1, max_iterations + 1):
        hubs = state.select(F.col("internal_id").alias("src"), "hub")
        auth_msgs = (
            edges.join(hubs, "src")
            .groupBy(F.col("dst").alias("internal_id"))
            .agg(F.sum("hub").alias("auth_new"))
        )
        s1 = state.join(auth_msgs, "internal_id", "left").select(
            "internal_id",
            "hub",
            "auth",
            F.coalesce("auth_new", F.lit(0.0)).alias("auth_raw"),
        )
        a_norm = s1.agg(F.sqrt(F.sum(F.col("auth_raw") ** 2))).collect()[0][0] or 1.0
        s1 = s1.withColumn("auth_next", F.col("auth_raw") / F.lit(a_norm))

        auths = s1.select(F.col("internal_id").alias("dst"), "auth_next")
        hub_msgs = (
            edges.join(auths, "dst")
            .groupBy(F.col("src").alias("internal_id"))
            .agg(F.sum("auth_next").alias("hub_raw"))
        )
        s2 = s1.join(hub_msgs, "internal_id", "left").select(
            "internal_id",
            "hub",
            "auth",
            "auth_next",
            F.coalesce("hub_raw", F.lit(0.0)).alias("hub_raw"),
        )
        h_norm = s2.agg(F.sqrt(F.sum(F.col("hub_raw") ** 2))).collect()[0][0] or 1.0
        nxt = s2.select(
            "internal_id",
            (F.col("hub_raw") / F.lit(h_norm)).alias("hub"),
            F.col("auth_next").alias("auth"),
            F.greatest(
                F.abs(F.col("hub_raw") / F.lit(h_norm) - F.col("hub")),
                F.abs(F.col("auth_next") - F.col("auth")),
            ).alias("delta"),
        )
        nxt = loop_checkpoint(nxt, t)
        max_delta = nxt.agg(F.max("delta")).collect()[0][0] or 0.0
        state = nxt.select("internal_id", "hub", "auth")
        if max_delta <= tolerance:
            ran, converged = t, True
            break

    return HitsResult(scores=state, ran_iterations=ran, converged=converged)
