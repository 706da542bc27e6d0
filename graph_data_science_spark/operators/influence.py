"""Influence maximization — greedy + CELF under Independent Cascade.

Reference: alpha/alpha-algo/.../influenceMaximization/CELF.java:36 and
Greedy.java (gds.alpha.influenceMaximization.celf/greedy.stream): pick
``seedSetSize`` nodes maximizing expected IC spread, estimated by
``monteCarloSimulations`` cascade samples with uniform propagation
probability p; CELF adds lazy marginal-gain re-evaluation (submodularity).

Spark-first formulation (the GDS ICLazyForwardMC bit-trick, re-keyed for
shuffle parallelism): up to 64 Monte-Carlo simulations pack into ONE
64-bit mask column. Live edges are deterministic per sim —
bit r of an edge's ``live`` mask is set iff
``xxhash64(src, dst, r, seed) mod M < p*M`` — so every simulation is
reproducible under any partitioning. One multi-source BFS keyed
(candidate, node) with per-(cand,node) sim-bitmasks computes EVERY
candidate's per-sim reachable set simultaneously: O(diameter) shuffles
total for the whole initial CELF pass, not O(candidates × sims) jobs.

Scale note: the state table holds one row per (candidate, reached node) —
quadratic on well-connected graphs, same as the reference's per-node
forward-MC pass. For big graphs pass ``candidates`` (e.g. top-degree
sample), exactly how GDS users bound it.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from ..plans.checkpoint import loop_checkpoint

_M = 1_000_000


@dataclass
class InfluenceResult:
    seeds: list[int]
    gains: list[float]  # marginal expected spread at pick time


def _live_mask_col(p: float, mc: int, seed: int):
    bits = None
    for r in range(mc):
        live = (
            F.pmod(
                F.xxhash64("src", "dst", F.lit(r).cast("long"),
                           F.lit(seed).cast("long")),
                F.lit(_M),
            )
            < int(p * _M)
        )
        term = F.when(live, F.shiftleft(F.lit(1).cast("long"), r)).otherwise(
            F.lit(0).cast("long")
        )
        bits = term if bits is None else bits.bitwiseOR(term)
    return bits


def influence_maximization(
    graph: Graph,
    seed_set_size: int,
    *,
    propagation_probability: float = 0.1,
    monte_carlo_simulations: int = 64,
    candidates: list[int] | None = None,
    seed: int = 42,
    use_celf: bool = True,
) -> InfluenceResult:
    if not 1 <= monte_carlo_simulations <= 64:
        raise ValueError("monte_carlo_simulations must be in [1, 64]")
    mc = monte_carlo_simulations
    spark = graph.spark
    full_mask = -1 if mc == 64 else (1 << mc) - 1

    edges = (
        graph.edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .withColumn(
            "live", _live_mask_col(propagation_probability, mc, seed)
        )
        .filter(F.col("live") != 0)
        .localCheckpoint(eager=True)
    )

    if candidates is None:
        n = graph.node_count()
        if n > 100_000:
            raise ValueError(
                f"influence_maximization with all {n} nodes as candidates "
                "materializes candidate×reachable state; pass candidates= "
                "(e.g. a top-degree sample) on large graphs"
            )
        cand_df = graph.vertices.select(F.col("internal_id").alias("cand"))
    else:
        cand_df = spark.createDataFrame(
            [(int(c),) for c in candidates], "cand long"
        )

    # multi-candidate multi-sim BFS: (cand, node, mask)
    state = cand_df.select(
        "cand",
        F.col("cand").alias("node"),
        F.lit(full_mask).cast("long").alias("mask"),
    ).localCheckpoint(eager=True)
    frontier = state
    hop = 0
    while True:
        hop += 1
        prop = (
            frontier.join(
                edges.withColumnRenamed("src", "node"), "node"
            )
            .select(
                "cand",
                F.col("dst").alias("node"),
                F.col("mask").bitwiseAND(F.col("live")).alias("m"),
            )
            .filter(F.col("m") != 0)
            .groupBy("cand", "node")
            .agg(F.bit_or("m").alias("in_mask"))
        )
        nxt = (
            prop.join(state, ["cand", "node"], "left")
            .select(
                "cand",
                "node",
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
        state = loop_checkpoint(
            state.join(nxt, ["cand", "node"], "full").select(
                "cand",
                "node",
                (
                    F.coalesce("mask", F.lit(0)).bitwiseOR(
                        F.coalesce("new_mask", F.lit(0))
                    )
                ).alias("mask"),
            ),
            hop,
        )
        frontier = nxt.withColumnRenamed("new_mask", "mask")

    state = state.localCheckpoint(eager=True)

    # initial expected spreads: sum of per-node popcounts / mc
    init = {
        int(r["cand"]): float(r["s"]) / mc
        for r in state.groupBy("cand")
        .agg(F.sum(F.bit_count("mask")).alias("s"))
        .collect()
    }

    # covered: (node, mask) union over chosen seeds — marginal gain of c is
    # popcount(mask_c & ~covered) summed over nodes
    covered: DataFrame | None = None
    seeds: list[int] = []
    gains: list[float] = []
    # CELF queue: (negated cached gain, cand, round_evaluated)
    import heapq

    heap = [(-g, c, 0) for c, g in init.items()]
    heapq.heapify(heap)

    def marginal(c: int) -> float:
        sub = state.filter(F.col("cand") == c)
        if covered is None:
            return init[c]
        j = sub.join(covered, "node", "left").select(
            F.bit_count(
                F.col("mask").bitwiseAND(
                    F.bitwise_not(F.coalesce(F.col("cmask"), F.lit(0)))
                )
            ).alias("n")
        )
        got = j.agg(F.sum("n")).collect()[0][0] or 0
        return float(got) / mc

    while len(seeds) < seed_set_size and heap:
        if use_celf:
            while True:
                neg, c, rnd = heapq.heappop(heap)
                if rnd == len(seeds):
                    best, best_gain = c, -neg
                    break
                g = marginal(c)
                heapq.heappush(heap, (-g, c, len(seeds)))
        else:
            scored = [
                (marginal(c), c) for _, c, _ in heap
            ]
            best_gain, best = max(scored)
            heap = [(-g, c, len(seeds)) for g, c in scored if c != best]
            heapq.heapify(heap)
        seeds.append(best)
        gains.append(best_gain)
        add = state.filter(F.col("cand") == best).select(
            "node", F.col("mask").alias("add_mask")
        )
        if covered is None:
            covered = add.withColumnRenamed("add_mask", "cmask")
        else:
            covered = (
                covered.join(add, "node", "full")
                .select(
                    "node",
                    (
                        F.coalesce("cmask", F.lit(0)).bitwiseOR(
                            F.coalesce("add_mask", F.lit(0))
                        )
                    ).alias("cmask"),
                )
            )
        covered = covered.localCheckpoint(eager=True)

    return InfluenceResult(seeds=seeds, gains=gains)
