"""Closeness & harmonic centrality via multi-source BFS (MSBFS).

Reference: alpha closeness `closeness/MSClosenessCentrality.java:43`
(formula C(v) = (n-1)/farness(v); Wasserman-Faust variant
((r-1)/farness) * ((r-1)/(n-1)) where r = count reached), harmonic
`harmonic/HarmonicCentrality.java:31` (sum of 1/d), both built on the
bit-parallel MSBFS `msbfs/MultiSourceBFS.java:68` (64 sources per long).

Spark port of the ANP (aggregate-neighbor-processing) trick: the frontier
DataFrame carries a 64-bit source bitmask per node; one
``groupBy(node).agg(bit_or(mask))`` per hop advances all 64 BFS waves of a
batch at once. Per-source tallies are 64 conditional sums on the
new-bits column — one tiny aggregate per hop, no per-source loops.

Centrality accumulates on the *source* side (distances d(s, ·) from each
BFS feed farness(s)), so for all-node centrality we sweep batches of 64
sources; ``sources=`` limits to a sample (the GDS-sanctioned approach for
big graphs is sampling too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph


def _msbfs_tallies(
    graph: Graph, sources: list[int]
) -> dict[int, tuple[float, int, float]]:
    """For each source: (farness, reached_count, harmonic_sum)."""
    spark = graph.spark
    edges = graph.edges.select("src", "dst").distinct().localCheckpoint(
        eager=False
    )
    out: dict[int, tuple[float, int, float]] = {}
    for batch_start in range(0, len(sources), 64):
        batch = sources[batch_start : batch_start + 64]
        rows = []
        for i, s in enumerate(batch):
            bit = (1 << i) if i < 63 else -(1 << 63)
            rows.append((s, bit))
        init = spark.createDataFrame(rows, "internal_id long, mask long")
        init = (
            init.groupBy("internal_id")
            .agg(F.bit_or("mask").alias("mask"))
            .localCheckpoint(eager=True)
        )
        visited = init
        frontier = init
        far = [0.0] * len(batch)
        reached = [0] * len(batch)
        harm = [0.0] * len(batch)
        hop = 0
        while True:
            hop += 1
            prop = (
                edges.join(
                    frontier.select(
                        F.col("internal_id").alias("src"), "mask"
                    ),
                    "src",
                )
                .groupBy(F.col("dst").alias("internal_id"))
                .agg(F.bit_or("mask").alias("in_mask"))
            )
            nxt = (
                prop.join(visited, "internal_id", "left")
                .select(
                    "internal_id",
                    F.col("in_mask")
                    .bitwiseAND(
                        F.bitwise_not(F.coalesce(F.col("mask"), F.lit(0)))
                    )
                    .alias("new_mask"),
                )
                .filter(F.col("new_mask") != 0)
                .localCheckpoint(eager=True)
            )
            counts = nxt.agg(
                *[
                    F.sum(
                        F.shiftrightunsigned("new_mask", i).bitwiseAND(
                            F.lit(1)
                        )
                    ).alias(f"c{i}")
                    for i in range(len(batch))
                ]
            ).collect()
            row = counts[0]
            any_new = False
            for i in range(len(batch)):
                c = row[f"c{i}"] or 0
                if c:
                    any_new = True
                    far[i] += hop * c
                    reached[i] += c
                    harm[i] += c / hop
            if not any_new:
                break
            visited = (
                visited.join(nxt, "internal_id", "full")
                .select(
                    "internal_id",
                    (
                        F.coalesce("mask", F.lit(0)).bitwiseOR(
                            F.coalesce("new_mask", F.lit(0))
                        )
                    ).alias("mask"),
                )
                .localCheckpoint(eager=True)
            )
            frontier = nxt.withColumnRenamed("new_mask", "mask")
        for i, s in enumerate(batch):
            out[s] = (far[i], reached[i], harm[i])
    return out


def closeness_centrality(
    graph: Graph,
    *,
    wasserman_faust: bool = False,
    sources: list[int] | None = None,
) -> DataFrame:
    """(internal_id, score). C(v) = (n-1)/farness(v), 0 if farness 0
    (ref formula at MSClosenessCentrality.java:60-75)."""
    n = graph.node_count()
    if sources is None:
        sources = [
            r["internal_id"] for r in graph.vertices.select("internal_id").collect()
        ]
    tallies = _msbfs_tallies(graph, sources)
    rows = []
    for s, (far, r, _h) in tallies.items():
        if far > 0 and n > 1:
            if wasserman_faust:
                score = (r / far) * (r / (n - 1)) if r > 0 else 0.0
            else:
                score = (n - 1) / far
        else:
            score = 0.0
        rows.append((s, float(score)))
    return graph.spark.createDataFrame(
        rows, "internal_id long, score double"
    )


def harmonic_centrality(
    graph: Graph, *, sources: list[int] | None = None
) -> DataFrame:
    """(internal_id, score): score = (Σ 1/d(v,u)) / (n-1)
    (ref: HarmonicCentrality.java:31-80)."""
    n = graph.node_count()
    if sources is None:
        sources = [
            r["internal_id"] for r in graph.vertices.select("internal_id").collect()
        ]
    tallies = _msbfs_tallies(graph, sources)
    rows = [
        (s, float(h / (n - 1)) if n > 1 else 0.0)
        for s, (_f, _r, h) in tallies.items()
    ]
    return graph.spark.createDataFrame(rows, "internal_id long, score double")
