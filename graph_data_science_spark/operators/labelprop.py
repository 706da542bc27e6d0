"""Label Propagation — synchronous variant with GDS vote/tie semantics.

Reference semantics (Neo4j GDS ~1.6, studied for behavior only):
- init label = ``seedProperty`` where present, else
  ``maxSeedLabel + internal_id + 1``; with no seed property at all the
  label is the node id (ref: algo/.../labelpropagation/InitStep.java:58-79),
- per iteration, node v's out-neighbors vote for their own labels; vote
  weight = relationshipWeight × nodeWeight(neighbor)
  (ref: labelpropagation/ComputeStepConsumer.java:44-58),
- winner = max total vote weight, tie → smaller label id
  (ref: ComputeStepConsumer.tallyVotes:64-77),
- nodes with no neighbors keep their label; convergence = no label changed
  (ref: LabelPropagation.java:139-149); default maxIterations 10
  (ref: LabelPropagationBaseConfig.java:38-42).

GDS runs a *semi-asynchronous* schedule (batches share a live label array)
whose result is schedule-dependent — its own test suite acknowledges
oscillation (NonStabilizingLabelPropagationTest.java). We implement the
deterministic synchronous schedule (all votes read iteration t-1 labels):
same fixed points, reproducible under any parallelism — the property that
matters on a cluster.

Scale design: one shuffle per iteration — votes are a
``groupBy(node, label).sum`` followed by a ``max_by`` struct-argmax (no
window/sort shuffle: the argmax packs (weight, -label) into a struct and
takes ``F.max``, which Spark executes with map-side partial aggregation).
Plan lineage truncated each iteration via localCheckpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph


def label_propagation(
    graph: Graph,
    *,
    max_iterations: int = 10,
    weighted: bool = False,
    seed_property: str | None = None,
    node_weight_property: str | None = None,
) -> DataFrame:
    """Returns (internal_id long, label long, ran_iterations metadata on df)."""
    vertices = graph.vertices

    if seed_property:
        max_seed = (
            vertices.agg(F.max(F.col(seed_property).cast("long"))).collect()[0][0]
            or 0
        )
        labels = vertices.select(
            "internal_id",
            F.coalesce(
                F.col(seed_property).cast("long"),
                F.col("internal_id") + F.lit(max_seed + 1),
            ).alias("label"),
        )
    else:
        labels = vertices.select(
            "internal_id", F.col("internal_id").alias("label")
        )

    if node_weight_property:
        node_w = vertices.select(
            "internal_id",
            F.coalesce(
                F.col(node_weight_property).cast("double"), F.lit(1.0)
            ).alias("node_w"),
        )
    else:
        node_w = vertices.select("internal_id", F.lit(1.0).alias("node_w"))

    edges = graph.edges.select(
        "src",
        "dst",
        (F.col("weight") if weighted else F.lit(1.0)).alias("rel_w"),
    )
    edges = edges.localCheckpoint(eager=False)
    node_w = node_w.localCheckpoint(eager=False)
    labels = labels.localCheckpoint(eager=True)

    from ..plans.checkpoint import loop_checkpoint

    for _it in range(max_iterations):
        nbr = (
            labels.withColumnRenamed("internal_id", "dst")
            .withColumnRenamed("label", "nbr_label")
            .join(node_w.withColumnRenamed("internal_id", "dst"), "dst")
        )
        votes = (
            edges.join(nbr, "dst")
            .groupBy("src", "nbr_label")
            .agg(F.sum(F.col("rel_w") * F.col("node_w")).alias("vote"))
        )
        # argmax(vote, tie -> min label) without a window sort:
        # max over struct(vote, -label) == (max vote, then min label)
        winner = votes.groupBy("src").agg(
            F.max(F.struct(F.col("vote"), (-F.col("nbr_label")).alias("neg")))
            .alias("w")
        ).select(
            F.col("src").alias("internal_id"),
            (-F.col("w.neg")).alias("new_label"),
        )
        nxt = labels.join(winner, "internal_id", "left").select(
            "internal_id",
            F.col("label").alias("old_label"),
            F.coalesce("new_label", "label").alias("label"),
        )
        nxt = loop_checkpoint(nxt, _it + 1)
        changed = nxt.filter(F.col("label") != F.col("old_label")).count()
        labels = nxt.select("internal_id", "label")
        if changed == 0:
            break

    return labels
