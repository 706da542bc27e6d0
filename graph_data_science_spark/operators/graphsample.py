"""Random-walk-with-restart graph sampling.

Reference scope note: `gds.graph.sample.rwr` arrived in GDS 2.x (the
~1.6 reference has no sampling procedures); included because subgraph
sampling is how web-scale link graphs become tractable for the expensive
operators (betweenness, GNN training, layout) — sample first, run there.

Algorithm (Leskovec-Faloutsos 2006 "Sampling from Large Graphs", the RWR
variant GDS implements): walk from the start node(s); at each step
restart with probability r, otherwise move to a uniform out-neighbor
(dead ends restart). Visited nodes join the sample; batches of walks are
added until the node budget ``ceil(sampling_ratio × |V|)`` is reached.

Spark-first + deterministic: the walk loop is the same plan shape as
:func:`..operators.mlops.random_walks` — one sorted adjacency
materialization, then one join per step; BOTH random decisions (restart
gate, neighbor rank) derive from hashes of (walk_id, step, seed), so the
sample is a pure function of the graph — reproducible across cluster
sizes and replayable by an external SQL engine when
``base_hash="md5"`` (the contract oracle replays every walk).

Scale notes: all walks in a batch start at the given start nodes, so the
step-0 adjacency probe is hot on those ids — spread ``start_nodes``
across the graph for very large samples (GDS does the same); per step
only (walk_id, cur) rows join, never full paths; the visited set
accumulates via distinct unions truncated by ``loop_checkpoint``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from ..plans.checkpoint import loop_checkpoint

_MILLION = 1_000_000


def _hash60(*cols) -> F.Column:
    """Engine-portable 60-bit md5 hash of '|'-joined string columns."""
    return F.conv(
        F.substring(F.md5(F.concat_ws("|", *cols)), 1, 15), 16, 10
    ).cast("long")


def rwr_sample_nodes(
    graph: Graph,
    *,
    sampling_ratio: float = 0.15,
    restart_probability: float = 0.1,
    start_nodes: list[int] | None = None,
    walks_per_batch: int = 128,
    walk_length: int = 8,
    max_batches: int = 64,
    stall_batches: int = 2,
    seed: int = 42,
    base_hash: str = "xxhash64",
    metrics_out: dict | None = None,
) -> DataFrame:
    """Sampled node ids: (internal_id long). The sample is the distinct
    visited set of whole batches, so it may slightly overshoot the
    budget (documented divergence from GDS's per-node stop — batch
    granularity is what makes the run deterministic AND distributed).

    On DIRECTED graphs the forward-reachable closure of the start set
    can be smaller than the budget; ``stall_batches`` consecutive
    batches adding zero new nodes stop the loop early
    (``metrics_out["stalled"] = True``) instead of spinning to
    ``max_batches``. Spread ``start_nodes`` across the graph when
    sampling large fractions of a directed graph.
    """
    spark = graph.spark
    n = graph.vertices.count()
    target = math.ceil(sampling_ratio * n)
    starts = start_nodes if start_nodes is not None else [0]
    r_gate = int(round(restart_probability * _MILLION))

    adj = (
        graph.edges.groupBy("src")
        .agg(F.sort_array(F.collect_set("dst")).alias("nbrs"))
        .localCheckpoint(eager=False)
    )
    starts_df = spark.createDataFrame(
        [(int(s),) for s in starts], "start long"
    )

    def gate_hash(step: int, salt: str) -> F.Column:
        if base_hash == "xxhash64":
            return F.xxhash64(
                "walk_id", F.lit(step), F.lit(seed), F.lit(salt)
            )
        if base_hash != "md5":
            raise ValueError(f"unknown base_hash {base_hash!r}")
        return _hash60(
            F.col("walk_id").cast("string"),
            F.lit(str(step)),
            F.lit(str(seed)),
            F.lit(salt),
        )

    visited = starts_df.select(
        F.col("start").alias("internal_id")
    ).distinct().localCheckpoint(eager=True)
    batches = 0
    stalled = 0
    count = visited.count()
    while count < target and batches < max_batches and \
            stalled < stall_batches:
        base = batches * walks_per_batch
        walks = (
            starts_df.crossJoin(
                spark.range(walks_per_batch).select(F.col("id").alias("rep"))
            )
            .select(
                (F.col("start") * (max_batches * walks_per_batch)
                 + base + F.col("rep")).alias("walk_id"),
                F.col("start"),
                F.col("start").alias("cur"),
            )
        )
        seen_cols = [walks.select(F.col("cur").alias("internal_id"))]
        for step in range(walk_length):
            restart = F.pmod(F.abs(gate_hash(step, "r")), F.lit(_MILLION)) \
                < r_gate
            walks = (
                walks.join(adj.withColumnRenamed("src", "cur"), "cur",
                           "left")
                .select(
                    "walk_id",
                    "start",
                    F.when(
                        restart
                        | F.col("nbrs").isNull()
                        | (F.size("nbrs") == 0),
                        F.col("start"),
                    )
                    .otherwise(
                        F.get(
                            "nbrs",
                            F.pmod(
                                F.abs(gate_hash(step, "n")),
                                F.size("nbrs"),
                            ).cast("int"),
                        )
                    )
                    .alias("cur"),
                )
            )
            seen_cols.append(
                walks.select(F.col("cur").alias("internal_id"))
            )
        batch_visited = seen_cols[0]
        for s in seen_cols[1:]:
            batch_visited = batch_visited.unionAll(s)
        visited = loop_checkpoint(
            visited.unionAll(batch_visited).distinct(), batches + 1,
            every=4,
        )
        new_count = visited.count()
        stalled = stalled + 1 if new_count == count else 0
        count = new_count
        batches += 1
    if metrics_out is not None:
        metrics_out["batches"] = batches
        metrics_out["sampled"] = count
        metrics_out["target"] = target
        metrics_out["stalled"] = stalled >= stall_batches
    return visited


def cnarw_weights(graph: Graph, *, scale: int = 65536) -> DataFrame:
    """Per-edge CNARW transition weights (src, dst, w_int, lo, tot).

    CNARW (Li et al. 2019 "Walking with Perception"; gds.graph.sample.cnarw
    in GDS 2.4) biases each step AWAY from neighbors that share many
    common neighbours with the current node: weight(u→v) =
    1 − |N(u)∩N(v)| / min(d(u), d(v)), so walks escape local clusters
    faster than uniform RWR and the sample covers more communities.

    Integer formulation for engine-portable exactness: ``w_int = 1 +
    floor(weight × scale)`` (floor of an exactly-representable rational —
    identical in Spark and DuckDB), plus the per-source prefix ranges
    ``[lo, lo + w_int)`` and total ``tot`` so a step picks the unique
    neighbor whose range contains ``hash % tot``. Computed ONCE per
    sample run, not per step.

    Scale notes: the common-neighbour count is the standard wedge join
    (edges ⋈ edges on shared head, semi-joined to real edges) — the same
    cost class as per-edge triangle support; degrees/prefix sums are one
    aggregation + one window each, all JVM codegen.
    """
    from pyspark.sql import Window

    e = graph.edges.select("src", "dst").distinct()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    # cn(u,v) = |N_out(u) ∩ N_out(v)| for edges (u,v)
    e1 = e.select(F.col("src").alias("u"), F.col("dst").alias("x"))
    e2 = e.select(F.col("src").alias("v"), F.col("dst").alias("x"))
    wedge = e1.join(e2, "x").select("u", "v")
    cn = (
        e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .join(wedge.groupBy("u", "v").agg(F.count(F.lit(1)).alias("cn")),
              ["u", "v"], "left")
        .fillna({"cn": 0})
    )
    du = deg.select(F.col("src").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("src").alias("v"), F.col("d").alias("dv"))
    w = (
        cn.join(du, "u")
        .join(dv, "v", "left")
        .fillna({"dv": 0})
        .select(
            F.col("u").alias("src"),
            F.col("v").alias("dst"),
            (
                F.lit(1)
                + F.floor(
                    (
                        F.lit(1.0)
                        - F.col("cn")
                        / F.greatest(F.least("du", "dv"), F.lit(1))
                    )
                    * F.lit(scale)
                )
            ).cast("long").alias("w_int"),
        )
    )
    win = Window.partitionBy("src").orderBy("dst")
    cum = w.select(
        "src", "dst", "w_int",
        (F.sum("w_int").over(win) - F.col("w_int")).alias("lo"),
    )
    tot = cum.groupBy("src").agg(
        (F.max(F.col("lo") + F.col("w_int"))).alias("tot")
    )
    return cum.join(tot, "src")


def cnarw_sample_nodes(
    graph: Graph,
    *,
    sampling_ratio: float = 0.15,
    restart_probability: float = 0.1,
    start_nodes: list[int] | None = None,
    walks_per_batch: int = 128,
    walk_length: int = 8,
    max_batches: int = 64,
    stall_batches: int = 2,
    seed: int = 42,
    base_hash: str = "xxhash64",
    metrics_out: dict | None = None,
) -> DataFrame:
    """Common-neighbour-aware random-walk sample (gds.graph.sample.cnarw).

    Same batch schedule, restart gate, determinism contract and stall
    handling as :func:`rwr_sample_nodes`; only the neighbor pick differs
    — weighted by :func:`cnarw_weights` via the integer prefix ranges,
    so no per-row adjacency arrays exist anywhere (hub-safe: a 10M-degree
    node contributes 10M (src,dst) rows, never one 10M-element cell).
    """
    spark = graph.spark
    n = graph.vertices.count()
    target = math.ceil(sampling_ratio * n)
    starts = start_nodes if start_nodes is not None else [0]
    r_gate = int(round(restart_probability * _MILLION))

    wtab = cnarw_weights(graph).localCheckpoint(eager=True)
    starts_df = spark.createDataFrame(
        [(int(s),) for s in starts], "start long"
    )

    def gate_hash(step: int, salt: str) -> F.Column:
        if base_hash == "xxhash64":
            return F.xxhash64(
                "walk_id", F.lit(step), F.lit(seed), F.lit(salt)
            )
        if base_hash != "md5":
            raise ValueError(f"unknown base_hash {base_hash!r}")
        return _hash60(
            F.col("walk_id").cast("string"),
            F.lit(str(step)),
            F.lit(str(seed)),
            F.lit(salt),
        )

    visited = starts_df.select(
        F.col("start").alias("internal_id")
    ).distinct().localCheckpoint(eager=True)
    batches = 0
    stalled = 0
    count = visited.count()
    while count < target and batches < max_batches and \
            stalled < stall_batches:
        base = batches * walks_per_batch
        walks = (
            starts_df.crossJoin(
                spark.range(walks_per_batch).select(
                    F.col("id").alias("rep")
                )
            )
            .select(
                (F.col("start") * (max_batches * walks_per_batch)
                 + base + F.col("rep")).alias("walk_id"),
                F.col("start"),
                F.col("start").alias("cur"),
            )
        )
        seen_cols = [walks.select(F.col("cur").alias("internal_id"))]
        for step in range(walk_length):
            restart = F.pmod(F.abs(gate_hash(step, "r")), F.lit(_MILLION)) \
                < r_gate
            t = F.pmod(F.abs(gate_hash(step, "n")), F.col("tot"))
            picked = (
                walks.join(
                    wtab.select(
                        F.col("src").alias("cur"), "dst", "lo", "w_int",
                        "tot",
                    ),
                    "cur",
                    "left",
                )
                .withColumn(
                    "pick_t",
                    F.when(
                        restart | F.col("tot").isNull(), F.lit(None)
                    ).otherwise(t),
                )
                .filter(
                    F.col("pick_t").isNull()
                    | (
                        (F.col("lo") <= F.col("pick_t"))
                        & (F.col("pick_t") < F.col("lo") + F.col("w_int"))
                    )
                )
                # restart/dead-end rows match EVERY neighbor row (or none
                # via the left join); collapse back to one row per walk
                .groupBy("walk_id", "start")
                .agg(
                    F.max(
                        F.when(F.col("pick_t").isNotNull(), F.col("dst"))
                    ).alias("picked")
                )
            )
            walks = picked.select(
                "walk_id",
                "start",
                F.coalesce("picked", "start").alias("cur"),
            )
            seen_cols.append(
                walks.select(F.col("cur").alias("internal_id"))
            )
        batch_visited = seen_cols[0]
        for s in seen_cols[1:]:
            batch_visited = batch_visited.unionAll(s)
        visited = loop_checkpoint(
            visited.unionAll(batch_visited).distinct(), batches + 1,
            every=4,
        )
        new_count = visited.count()
        stalled = stalled + 1 if new_count == count else 0
        count = new_count
        batches += 1
    if metrics_out is not None:
        metrics_out["batches"] = batches
        metrics_out["sampled"] = count
        metrics_out["target"] = target
        metrics_out["stalled"] = stalled >= stall_batches
    return visited


def cnarw_sample(graph: Graph, **kwargs) -> Graph:
    """Induced-subgraph CNARW sample (same contract as
    :func:`rwr_sample`)."""
    nodes = cnarw_sample_nodes(graph, **kwargs).localCheckpoint(eager=True)
    edges = (
        graph.edges.join(
            nodes.select(F.col("internal_id").alias("src")), "src"
        )
        .join(nodes.select(F.col("internal_id").alias("dst")), "dst")
    )
    vertices = graph.vertices.join(nodes, "internal_id")
    return Graph(
        vertices=vertices,
        edges=edges.select(*graph.edges.columns),
        orientation=graph.orientation,
    )


def rwr_sample(graph: Graph, **kwargs) -> Graph:
    """Induced-subgraph sample: vertices = :func:`rwr_sample_nodes`,
    edges = all original edges with BOTH endpoints sampled (ids
    preserved — not re-densified, so results map back to the parent
    graph directly)."""
    nodes = rwr_sample_nodes(graph, **kwargs).localCheckpoint(eager=True)
    edges = (
        graph.edges.join(
            nodes.select(F.col("internal_id").alias("src")), "src"
        )
        .join(nodes.select(F.col("internal_id").alias("dst")), "dst")
    )
    vertices = graph.vertices.join(nodes, "internal_id")
    return Graph(
        vertices=vertices,
        edges=edges.select(*graph.edges.columns),
        orientation=graph.orientation,
    )
