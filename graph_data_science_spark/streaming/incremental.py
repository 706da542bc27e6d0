"""Incremental (seeded) recomputation + Structured Streaming driver.

GDS precedent: WCC/LP/Louvain accept ``seedProperty`` so a new snapshot
reuses the previous result and converges in few iterations
(ref: wcc/Wcc.java:78-80,111-113; labelpropagation/InitStep.java:58-79).

- :func:`incremental_wcc` — previous component ids seed the min-label
  propagation over (old ∪ new) edges; unchanged regions converge in one
  round because their labels are already fixpoints.
- :func:`stream_wcc` — Structured Streaming: new edge rows arrive on a
  stream; ``foreachBatch`` folds each micro-batch into the running
  component assignment via :func:`incremental_wcc`. State lives in the
  returned holder (a parquet checkpoint dir on a real deployment).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from ..operators.wcc import wcc


def incremental_wcc(
    graph: Graph, previous: DataFrame | None, *, max_iterations: int = 100
) -> DataFrame:
    """previous: (internal_id, component) from the prior snapshot or None."""
    if previous is None:
        return wcc(graph, max_iterations=max_iterations)
    seeded = graph.vertices.join(
        previous.withColumnRenamed("component", "__seed"),
        "internal_id",
        "left",
    )
    g2 = Graph(
        seeded,
        graph.edges,
        orientation=graph.orientation,
        is_multigraph=graph.is_multigraph,
    )
    return wcc(g2, seed_property="__seed", max_iterations=max_iterations)


@dataclass
class StreamingWccState:
    edges: DataFrame
    components: DataFrame | None = None


def stream_wcc(
    edge_stream: DataFrame,
    initial_edges: DataFrame,
    *,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Wire a Structured Streaming query: each micro-batch of new edges
    (src long, dst long) unions into the edge set and re-solves components
    seeded from the previous assignment.

    Returns (query, state_holder); ``state_holder.components`` always holds
    the latest (internal_id, component). Edge frames accumulate via
    localCheckpoint so lineage stays flat across batches.
    """
    from ..graph import from_edge_df

    state = StreamingWccState(
        edges=initial_edges.select("src", "dst").localCheckpoint(eager=True)
    )
    if not initial_edges.isEmpty():
        g0 = from_edge_df(state.edges)
        comp0 = wcc(g0)
        state.components = (
            g0.vertices.join(comp0, "internal_id")
            .select(
                F.col("original_id").cast("long").alias("node"),
                "component",
            )
            .localCheckpoint(eager=True)
        )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        new_edges = batch_df.select("src", "dst")
        if new_edges.isEmpty():
            return
        state.edges = (
            state.edges.unionByName(new_edges)
            .distinct()
            .localCheckpoint(eager=True)
        )
        g = from_edge_df(state.edges)
        prev = None
        if state.components is not None:
            # map previous per-original-node components onto new internal ids
            prev = (
                g.vertices.select(
                    "internal_id",
                    F.col("original_id").cast("long").alias("node"),
                )
                .join(state.components, "node")
                .select("internal_id", "component")
            )
        comp = incremental_wcc(g, prev)
        state.components = (
            g.vertices.join(comp, "internal_id")
            .select(
                F.col("original_id").cast("long").alias("node"), "component"
            )
            .localCheckpoint(eager=True)
        )

    writer = (
        edge_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(fold)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start(), state
