"""Community conductance metric.

Reference scope note: `gds.conductance` arrived in GDS 2.x (the ~1.6
reference ships modularity only); included as the standard companion
metric for the community detectors already here (louvain, labelprop,
wcc) — a link-graph operator users run right after community detection.

Semantics (matching the GDS 2.x alpha procedure): for each community C,

    conductance(C) = w_ext / (w_ext + w_int)

where ``w_ext`` sums the weights of relationships from a member of C to a
non-member, and ``w_int`` sums relationships between two members — both
over the directed relationship list as projected (no implicit
symmetrization). Nodes with NULL community are ignored entirely (GDS
skips negative community ids the same way). Communities with no outgoing
relationships at all are emitted with conductance 0.0.

Spark-first shape: two broadcast-or-shuffle joins map endpoint →
community, then ONE groupBy(community) aggregation computes both sums
with map-side combine — conditional aggregation instead of separate
int/ext pipelines, so the edge list is scanned once. At 100 TB the
community map is usually small enough to broadcast; pass
``broadcast_communities=True`` to force it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph


def conductance(
    graph: Graph,
    communities: DataFrame,
    *,
    weighted: bool = False,
    broadcast_communities: bool = False,
) -> DataFrame:
    """Per-community conductance.

    ``communities``: (internal_id, community) assignment — e.g. the
    output of louvain/label_propagation/wcc. Returns
    (community, conductance double) sorted-ready (one row per community
    that has at least one assigned member with an incident edge).
    """
    w = F.col("weight") if weighted and "weight" in graph.edges.columns \
        else F.lit(1.0)
    comm = communities.select(
        F.col("internal_id").alias("__id"), F.col("community")
    ).filter(F.col("community").isNotNull())
    if broadcast_communities:
        comm = F.broadcast(comm)
    e = graph.edges.select("src", "dst", w.cast("double").alias("w"))
    tagged = (
        e.join(
            comm.select(
                F.col("__id").alias("src"), F.col("community").alias("c_src")
            ),
            "src",
        )
        .join(
            comm.select(
                F.col("__id").alias("dst"), F.col("community").alias("c_dst")
            ),
            "dst",
        )
    )
    agg = tagged.groupBy(F.col("c_src").alias("community")).agg(
        F.sum(F.when(F.col("c_src") == F.col("c_dst"), F.col("w"))
              .otherwise(F.lit(0.0))).alias("w_int"),
        F.sum(F.when(F.col("c_src") != F.col("c_dst"), F.col("w"))
              .otherwise(F.lit(0.0))).alias("w_ext"),
    )
    # a groupBy over c_src misses communities whose members have no
    # outgoing edges at all — union them back in at 0.0 (docstring
    # contract: every assigned community gets a row)
    universe = comm.select("community").distinct()
    return universe.join(agg, "community", "left").select(
        "community",
        F.when(
            F.coalesce("w_int", F.lit(0.0))
            + F.coalesce("w_ext", F.lit(0.0)) > 0,
            F.col("w_ext") / (F.col("w_int") + F.col("w_ext")),
        )
        .otherwise(F.lit(0.0))
        .alias("conductance"),
    )
