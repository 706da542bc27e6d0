"""Closeness & harmonic centrality via multi-source BFS (MSBFS).

Reference: alpha closeness `closeness/MSClosenessCentrality.java:43`
(formula C(v) = (n-1)/farness(v); Wasserman-Faust variant
((r-1)/farness) * ((r-1)/(n-1)) where r = count reached), harmonic
`harmonic/HarmonicCentrality.java:31` (sum of 1/d), both built on the
bit-parallel MSBFS `msbfs/MultiSourceBFS.java:68` (64 sources per long).

Spark port of the ANP (aggregate-neighbor-processing) trick, batched at
scale: every source gets a (batch, bit) slot; the frontier DataFrame is
keyed by (batch, internal_id) and carries a 64-bit source bitmask, so ONE
``groupBy(batch, node).agg(bit_or(mask))`` per hop advances *all* batches'
64 BFS waves simultaneously — total job count is O(graph diameter), not
O(sources/64 × diameter). Per-source distance tallies accumulate in a
DataFrame (unpivoted 64 conditional sums per batch per hop), never on the
driver, so all-node centrality at 10^8 nodes holds: driver traffic per hop
is a single isEmpty() check.

``sources=`` limits the sweep to a sample (the GDS-sanctioned approach for
big graphs); default is exact all-nodes, matching the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from ..plans.checkpoint import loop_checkpoint


def _msbfs_tallies(graph: Graph, sources_df: DataFrame) -> DataFrame:
    """``sources_df``: one column ``s`` (internal ids). Returns
    (s long, far double, reached long, harm double) — farness, number of
    reached nodes, and Σ 1/d per source, all computed distributedly."""
    spark = graph.spark
    edges = graph.edges.select("src", "dst").distinct().localCheckpoint(
        eager=False
    )
    # (batch, bit) slot per source. row_number is a full sort of the source
    # ids — one shuffle at startup, deterministic slots.
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

    # mask with bit i set; bit 63 maps to the sign bit of a long
    init = slots.select(
        "batch",
        F.col("s").alias("internal_id"),
        F.expr("shiftleft(CAST(1 AS BIGINT), bit)").alias("mask"),
    )
    init = (
        init.groupBy("batch", "internal_id")
        .agg(F.bit_or("mask").alias("mask"))
        .localCheckpoint(eager=True)
    )
    visited = init
    frontier = init

    bit_counts = [
        F.sum(
            F.shiftrightunsigned("new_mask", i).bitwiseAND(F.lit(1))
        ).alias(f"c{i}")
        for i in range(64)
    ]
    stack_expr = "stack(64, " + ", ".join(
        f"{i}, c{i}" for i in range(64)
    ) + ") as (bit, c)"

    # accumulated per-hop tallies: (batch, bit, far, reached, harm)
    tallies = spark.createDataFrame(
        [], "batch long, bit int, far double, reached long, harm double"
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
        hop_tally = (
            nxt.groupBy("batch")
            .agg(*bit_counts)
            .selectExpr("batch", stack_expr)
            .filter(F.col("c") > 0)
            .select(
                "batch",
                "bit",
                (F.lit(float(hop)) * F.col("c")).alias("far"),
                F.col("c").cast("long").alias("reached"),
                (F.lit(1.0 / hop) * F.col("c")).alias("harm"),
            )
        )
        tallies = loop_checkpoint(tallies.unionByName(hop_tally), hop)
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

    agg = tallies.groupBy("batch", "bit").agg(
        F.sum("far").alias("far"),
        F.sum("reached").alias("reached"),
        F.sum("harm").alias("harm"),
    )
    return (
        slots.join(agg, ["batch", "bit"], "left")
        .select(
            "s",
            F.coalesce("far", F.lit(0.0)).alias("far"),
            F.coalesce("reached", F.lit(0)).alias("reached"),
            F.coalesce("harm", F.lit(0.0)).alias("harm"),
        )
    )


def _sources_df(graph: Graph, sources: list[int] | None) -> DataFrame:
    if sources is None:
        return graph.vertices.select(F.col("internal_id").alias("s"))
    return graph.spark.createDataFrame([(int(s),) for s in sources], "s long")


def closeness_centrality(
    graph: Graph,
    *,
    wasserman_faust: bool = False,
    sources: list[int] | None = None,
) -> DataFrame:
    """(internal_id, score). C(v) = (n-1)/farness(v), 0 if farness 0
    (ref formula at MSClosenessCentrality.java:60-75)."""
    n = graph.node_count()
    t = _msbfs_tallies(graph, _sources_df(graph, sources))
    if wasserman_faust:
        score = F.when(
            (F.col("far") > 0) & (F.lit(n) > 1) & (F.col("reached") > 0),
            (F.col("reached") / F.col("far"))
            * (F.col("reached") / F.lit(float(n - 1))),
        ).otherwise(0.0)
    else:
        score = F.when(
            (F.col("far") > 0) & (F.lit(n) > 1),
            F.lit(float(n - 1)) / F.col("far"),
        ).otherwise(0.0)
    return t.select(F.col("s").alias("internal_id"), score.alias("score"))


def harmonic_centrality(
    graph: Graph, *, sources: list[int] | None = None
) -> DataFrame:
    """(internal_id, score): score = (Σ 1/d(v,u)) / (n-1)
    (ref: HarmonicCentrality.java:31-80)."""
    n = graph.node_count()
    t = _msbfs_tallies(graph, _sources_df(graph, sources))
    score = (
        F.col("harm") / F.lit(float(n - 1)) if n > 1 else F.lit(0.0)
    )
    return t.select(F.col("s").alias("internal_id"), score.alias("score"))
