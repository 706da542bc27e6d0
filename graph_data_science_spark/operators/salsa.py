"""SALSA link analysis (Stochastic Approach for Link-Structure Analysis).

Reference scope note: the reference ships HITS as its Pregel example
(`alpha/.../pregel/Hits.java`) but not SALSA (Lempel & Moran 2001, "SALSA:
the stochastic approach for link-structure analysis", ACM TOIS 19(2));
included because SALSA is the production variant of HITS actually used in
web-scale link ranking (degree-normalized, so tightly-knit communities
cannot capture all the score mass — the TKC effect HITS suffers).

Power iteration of the two alternating stochastic chains:

    auth_{t+1}(i) = Σ_{j→i} hub_t(j) / outdeg(j)
    hub_{t+1}(j)  = Σ_{j→i} auth_{t+1}(i) / indeg(i)

restricted to the link support (hub side: outdeg > 0; authority side:
indeg > 0). Both steps are column-stochastic on that support, so the L1
mass (= 1) is preserved exactly — no per-iteration normalization pass,
which also removes HITS's global-norm collect from the loop. Stationary
point within a connected support component: auth ∝ indeg, hub ∝ outdeg
(each scaled by the component's share of mass) — pinned in pytest.

Plan shape per iteration: two edge joins + two groupBy aggregations
(map-side combined), identical to PageRank's scatter/gather —
no driver-side collects inside the loop; plans truncated by
``loop_checkpoint``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from ..plans.checkpoint import loop_checkpoint


@dataclass
class SalsaResult:
    scores: DataFrame  # (internal_id, hub, auth)
    ran_iterations: int


def salsa(
    graph: Graph,
    *,
    max_iterations: int = 20,
) -> SalsaResult:
    """(internal_id, hub double, auth double). Nodes outside the hub /
    authority support score 0.0 on that side (SALSA is defined on the
    bipartite support graph)."""
    if max_iterations < 1:
        raise ValueError(
            "salsa requires max_iterations >= 1 (power iteration needs at "
            "least one auth/hub sweep)"
        )
    edges = graph.edges.select("src", "dst").distinct().localCheckpoint(
        eager=False
    )
    outdeg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("double").alias("od")
    ).localCheckpoint(eager=False)
    indeg = edges.groupBy("dst").agg(
        F.count(F.lit(1)).cast("double").alias("idg")
    ).localCheckpoint(eager=False)
    n_hubs = outdeg.count()
    hub = outdeg.select(
        F.col("src").alias("internal_id"),
        (F.lit(1.0) / F.lit(float(n_hubs))).alias("hub"),
    ).localCheckpoint(eager=True)

    auth = None
    for t in range(1, max_iterations + 1):
        auth = (
            edges.join(outdeg, "src")
            .join(
                hub.select(F.col("internal_id").alias("src"), "hub"), "src"
            )
            .groupBy(F.col("dst").alias("internal_id"))
            .agg(F.sum(F.col("hub") / F.col("od")).alias("auth"))
        )
        hub = (
            edges.join(indeg, "dst")
            .join(
                auth.select(F.col("internal_id").alias("dst"), "auth"),
                "dst",
            )
            .groupBy(F.col("src").alias("internal_id"))
            .agg(F.sum(F.col("auth") / F.col("idg")).alias("hub"))
        )
        hub = loop_checkpoint(hub, t)
    scores = (
        graph.vertices.select("internal_id")
        .join(hub, "internal_id", "left")
        .join(auth, "internal_id", "left")
        .select(
            "internal_id",
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
            F.coalesce("auth", F.lit(0.0)).alias("auth"),
        )
    )
    return SalsaResult(scores=scores, ran_iterations=max_iterations)
