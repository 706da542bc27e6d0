"""All-pairs shortest paths — streamed (source, target, distance) rows.

Reference semantics:

- unweighted `gds.alpha.allShortestPaths` runs the bit-parallel MSBFS and
  emits one row per (source, reachable target) EXCLUDING self-pairs
  (alpha/alpha-algo/.../msbfs/MSBFSAllShortestPaths.java:45-170; the 2×5
  grid test expects 35 rows = 45 pairs − 10 selves,
  MSBFSAllShortestPathsTest.java:98).
- weighted runs one Dijkstra per source and INCLUDES (s, s, 0.0)
  (WeightedAllShortestPaths.java via WeightedAllShortestPathsTest.java:103-106:
  45 rows on the same grid, one of them (0,0,0.0)).

Spark formulation — the result set is O(n²), so it must be *produced*
distributed, never collected:

- unweighted: the same batched MSBFS loop as closeness/harmonic
  (`closeness._msbfs_tallies`), but instead of tallying counts per source
  bit, each hop's newly-visited (batch, node, new_mask) rows are unpivoted
  into (batch, bit, target, hop) rows and accumulated as a DataFrame.
  Job count is O(diameter); every hop advances all 64-source batches at
  once. Row expansion is bounded by the true output size (each output row
  is emitted exactly once, at its first visit).
- weighted: frontier relaxation keyed by (s, internal_id) — the
  multi-source generalization of `traverse.sssp`. State is one row per
  (source, reached vertex): exactly the output size, the unavoidable
  lower bound for all-pairs output.

At 100 TB scale all-pairs output is astronomically large; `sources=`
bounds the sweep to a sample or an explicit list (same escape hatch the
reference offers by running on a subgraph). Default keeps reference
parity: every node is a source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from ..plans.checkpoint import loop_checkpoint
from .closeness import _sources_df


def _msbfs_distances(graph: Graph, sources_df: DataFrame) -> DataFrame:
    """(s long, target long, distance double) for every target reachable
    from s in ≥1 hop. Same batching as closeness._msbfs_tallies."""
    spark = graph.spark
    edges = graph.edges.select("src", "dst").distinct().localCheckpoint(
        eager=False
    )
    from pyspark.sql.window import Window

    slots = sources_df.select(
        F.col("s").cast("long").alias("s"),
        (F.row_number().over(Window.orderBy("s")) - 1).alias("rn"),
    ).select(
        "s",
        (F.col("rn") / 64).cast("long").alias("batch"),
        (F.col("rn") % 64).cast("int").alias("bit"),
    )
    slots = slots.localCheckpoint(eager=True)

    init = (
        slots.select(
            "batch",
            F.col("s").alias("internal_id"),
            F.expr("shiftleft(CAST(1 AS BIGINT), bit)").alias("mask"),
        )
        .groupBy("batch", "internal_id")
        .agg(F.bit_or("mask").alias("mask"))
        .localCheckpoint(eager=True)
    )
    visited = init
    frontier = init

    # unpivot the 64 bits of new_mask -> one row per newly-reached source
    stack_expr = "stack(64, " + ", ".join(
        f"{i}, CAST(shiftrightunsigned(new_mask, {i}) & 1 AS INT)"
        for i in range(64)
    ) + ") as (bit, hit)"

    out = spark.createDataFrame(
        [], "batch long, bit int, target long, distance double"
    )

    hop = 0
    while True:
        hop += 1
        prop = (
            edges.join(
                frontier.select(
                    "batch", F.col("internal_id").alias("src"), "mask"
                ),
                "src",
            )
            .groupBy("batch", F.col("dst").alias("internal_id"))
            .agg(F.bit_or("mask").alias("in_mask"))
        )
        nxt = (
            prop.join(visited, ["batch", "internal_id"], "left")
            .select(
                "batch",
                "internal_id",
                F.col("in_mask")
                .bitwiseAND(
                    F.bitwise_not(F.coalesce(F.col("mask"), F.lit(0)))
                )
                .alias("new_mask"),
            )
            .filter(F.col("new_mask") != 0)
        )
        nxt = loop_checkpoint(nxt, hop)
        if nxt.isEmpty():
            break
        hop_rows = (
            nxt.selectExpr("batch", "internal_id", stack_expr)
            .filter(F.col("hit") == 1)
            .select(
                "batch",
                "bit",
                F.col("internal_id").alias("target"),
                F.lit(float(hop)).alias("distance"),
            )
        )
        out = loop_checkpoint(out.unionByName(hop_rows), hop)
        visited = loop_checkpoint(
            visited.join(nxt, ["batch", "internal_id"], "full").select(
                "batch",
                "internal_id",
                (
                    F.coalesce("mask", F.lit(0)).bitwiseOR(
                        F.coalesce("new_mask", F.lit(0))
                    )
                ).alias("mask"),
            ),
            hop,
        )
        frontier = nxt.withColumnRenamed("new_mask", "mask")

    return out.join(slots, ["batch", "bit"]).select("s", "target", "distance")


def _weighted_distances(graph: Graph, sources_df: DataFrame) -> DataFrame:
    """(s, target, distance) via (s, v)-keyed frontier relaxation — all
    sources advance in the same jobs. Includes (s, s, 0.0)."""
    edges = graph.edges.select(
        "src", "dst", F.col("weight").cast("double").alias("w")
    ).localCheckpoint(eager=False)
    dist = sources_df.select(
        "s", F.col("s").alias("internal_id"), F.lit(0.0).alias("distance")
    ).localCheckpoint(eager=True)
    frontier = dist
    it = 0
    while True:
        it += 1
        cand = (
            edges.join(
                frontier.select(
                    "s",
                    F.col("internal_id").alias("src"),
                    F.col("distance").alias("d_src"),
                ),
                "src",
            )
            .select(
                "s",
                F.col("dst").alias("internal_id"),
                (F.col("d_src") + F.col("w")).alias("cand"),
            )
            .groupBy("s", "internal_id")
            .agg(F.min("cand").alias("cand"))
        )
        merged = dist.join(cand, ["s", "internal_id"], "full").select(
            "s",
            "internal_id",
            F.least(
                F.coalesce("distance", F.lit(float("inf"))),
                F.coalesce("cand", F.lit(float("inf"))),
            ).alias("distance"),
            (
                F.coalesce("cand", F.lit(float("inf")))
                < F.coalesce("distance", F.lit(float("inf")))
            ).alias("improved"),
        )
        merged = loop_checkpoint(merged, it)
        frontier = merged.filter("improved").select(
            "s", "internal_id", "distance"
        )
        dist = merged.select("s", "internal_id", "distance")
        if frontier.isEmpty():
            break
    return dist.select("s", F.col("internal_id").alias("target"), "distance")


def all_shortest_paths(
    graph: Graph,
    *,
    weighted: bool = False,
    sources: list[int] | None = None,
) -> DataFrame:
    """(s long, target long, distance double) — one row per shortest
    source→target distance. ``sources`` bounds the sweep (sample this at
    scale: the full result is O(n²) rows)."""
    src_df = _sources_df(graph, sources)
    if weighted:
        return _weighted_distances(graph, src_df)
    return _msbfs_distances(graph, src_df)
