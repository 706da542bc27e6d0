"""Weakly connected components — iterative min-label hash propagation.

Output contract matches GDS union-by-min disjoint-set semantics
(ref: core/.../core/utils/paged/dss/HugeAtomicDisjointSetStruct.java:166-193 —
component id == minimum internal node id of the component;
driver wcc/Wcc.java:106-126). The Pregel min-label formulation the north
rule mandates is the reference's own alternative formulation
(ref: examples/pregel-example/.../cc/ConnectedComponentsPregel.java:57-74).

Variants:
- ``threshold``: union only edges with weight > threshold
  (ref: wcc/Wcc.java:183-204, config wcc/WccBaseConfig.java:30-44),
- ``seed_property``: incremental/seeded communities
  (ref: wcc/Wcc.java:78-80,111-113).

Scale design: each iteration is one shuffle (groupBy(dst).min) over the
symmetrized edge table; lineage is truncated every iteration via
localCheckpoint; convergence = zero changed labels (a count aggregate).
Label shortcutting (pointer-jumping over the label graph) cuts rounds from
O(diameter) to ~O(log n) on long chains — critical at 10^12-edge scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from ..plans.checkpoint import loop_checkpoint


def wcc(
    graph: Graph,
    *,
    threshold: float | None = None,
    seed_property: str | None = None,
    max_iterations: int = 100,
    shortcutting: bool = True,
) -> DataFrame:
    """Returns (internal_id long, component long)."""
    # Shared seed labels may span disconnected components (GDS seeded
    # semantics: same seed => same community id). Pointer-jumping assumes
    # label values are unique per component, so disable it when seeded.
    if seed_property:
        shortcutting = False
    edges = graph.edges
    if threshold is not None:
        edges = edges.filter(F.col("weight") > F.lit(threshold))

    # weakly connected: symmetrize regardless of stored orientation
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    sym = sym.filter(F.col("src") != F.col("dst")).distinct()
    sym = sym.localCheckpoint(eager=False)

    if seed_property:
        max_seed = (
            graph.vertices.agg(F.max(seed_property).cast("long")).collect()[0][0] or 0
        )
        labels = graph.vertices.select(
            "internal_id",
            F.coalesce(
                F.col(seed_property).cast("long"),
                F.col("internal_id") + F.lit(max_seed + 1),
            ).alias("label"),
        )
    else:
        labels = graph.vertices.select(
            "internal_id", F.col("internal_id").alias("label")
        )
    labels = labels.localCheckpoint(eager=True)

    for _it in range(max_iterations):
        # scatter: each endpoint pushes its label to the other side; gather: min
        msgs = (
            sym.join(labels, sym.src == labels.internal_id)
            .select(F.col("dst").alias("internal_id"), "label")
            .groupBy("internal_id")
            .agg(F.min("label").alias("nbr_min"))
        )
        nxt = (
            labels.join(msgs, "internal_id", "left")
            .select(
                "internal_id",
                F.col("label").alias("old_label"),
                F.least("label", F.coalesce("nbr_min", "label")).alias("label"),
            )
        )
        if shortcutting:
            # pointer-jumping: label -> min(label) reachable through the
            # label-pointer graph collapses long chains exponentially faster.
            ptr = (
                nxt.groupBy(F.col("old_label").alias("label"))
                .agg(F.min("label").alias("jump"))
            )
            nxt = (
                nxt.join(ptr, nxt.label == ptr.label, "left")
                .select(
                    nxt.internal_id,
                    nxt.old_label,
                    F.least(nxt.label, F.coalesce("jump", nxt.label)).alias("label"),
                )
            )
        # plan truncation with periodic stats reset (see plans/checkpoint.py:
        # inherited sizeInBytes otherwise squares per iteration)
        nxt = loop_checkpoint(nxt, _it + 1)
        changed = nxt.filter(F.col("label") != F.col("old_label")).count()
        labels = nxt.select("internal_id", "label")
        if changed == 0:
            break

    return labels.select("internal_id", F.col("label").alias("component"))


def wcc_stats(components: DataFrame) -> DataFrame:
    """stats-mode aggregate (ref: AbstractCommunityResultBuilder.java:50-62):
    componentCount + component-size distribution percentiles."""
    sizes = components.groupBy("component").agg(F.count(F.lit(1)).alias("size"))
    return sizes.agg(
        F.count(F.lit(1)).alias("componentCount"),
        F.min("size").alias("min"),
        F.max("size").alias("max"),
        F.mean("size").alias("mean"),
        F.expr("percentile_approx(size, 0.5)").alias("p50"),
        F.expr("percentile_approx(size, 0.75)").alias("p75"),
        F.expr("percentile_approx(size, 0.9)").alias("p90"),
        F.expr("percentile_approx(size, 0.95)").alias("p95"),
        F.expr("percentile_approx(size, 0.99)").alias("p99"),
    )


def consecutive_ids(result: DataFrame, id_col: str = "component") -> DataFrame:
    """Remap community ids to consecutive 0..k-1 ascending
    (ref: WccStreamProc.java:94-101, ConsecutiveLongNodeProperties).
    Implemented as dense_rank over the distinct ids (small: k rows)."""
    distinct = result.select(id_col).distinct()
    from pyspark.sql.window import Window

    remap = distinct.withColumn(
        "__consecutive", F.dense_rank().over(Window.orderBy(id_col)) - 1
    )
    return (
        result.join(F.broadcast(remap), id_col)
        .drop(id_col)
        .withColumnRenamed("__consecutive", id_col)
    )
