"""Shortest-path operators with full PATH output, Yen's K-shortest, A*.

Reference semantics:
- Dijkstra streaming result ``(index, sourceNode, targetNode, totalCost,
  nodeIds, costs)`` — ref core/.../beta/paths/dijkstra/Dijkstra.java:48
  (``PathResult``), proc surface ``gds.beta.shortestPath.dijkstra.stream``.
- Yen's K-shortest — ref core/.../beta/paths/yens/Yens.java:48 (spur-node
  deviations over repeated Dijkstra runs with relationship/node filters).
- A* — ref core/.../beta/paths/astar/AStar.java:38-101 (Dijkstra with a
  haversine heuristic over latitude/longitude node properties).

Spark-first formulations:
- Distances via frontier relaxation (Bellman-Ford fixpoint — exact for
  non-negative weights, one shuffle per wave; see traverse.sssp).
- Predecessors: the relaxation tracks, per settled node, the optimal
  predecessor with the SMALLEST internal id among cost-optimal ones —
  a deterministic tie-break, so the reconstructed path is unique and
  oracle-checkable.
- Path reconstruction: all-targets (and large target-list) mode
  flattens the predecessor forest DISTRIBUTED, by pointer doubling —
  every node carries its partial path segment and an ancestor pointer
  that squares each round, so the full source→v path for every settled
  v materializes in ceil(log2 L) self-joins with zero driver-side
  state (the round-2 driver dict-walk collected O(|V|) rows at scale).
  Explicit small target lists keep a bounded driver walk over the
  targets' ancestor closure (cheaper than log L distributed rounds for
  a handful of paths); single-target surfaces (A*, Yen's spur runs) use
  the one-row-per-hop walk.
- A* runs the same relaxation over *reduced* costs w'(u,v) = w(u,v) -
  h(u) + h(v) (non-negative for a consistent heuristic) plus
  branch-and-bound pruning: frontier rows with dist + h(v) >= best-known
  target cost are dropped — the distributed analogue of A*'s priority
  pruning.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from ..plans.checkpoint import loop_checkpoint


def sssp_with_predecessors(
    graph: Graph,
    source: int,
    *,
    weighted: bool = True,
    max_iterations: int = 10_000,
    edge_filter=None,
    heuristic: DataFrame | None = None,
    target: int | None = None,
) -> DataFrame:
    """(internal_id, distance double, pred long) for reached nodes.

    ``pred`` = smallest-id cost-optimal predecessor, derived in a single
    post-pass from the converged distances (``dist(u) + w(u,v) ==
    dist(v)``, min u) — deterministic regardless of relaxation wave
    order, and exactly reproducible by a SQL oracle computing the same
    min-plus fixpoint (both sides accumulate path cost left-to-right, so
    the float values agree bit-for-bit).

    ``heuristic``: optional (internal_id, h double) table — enables A*
    pruning against ``target`` (both must be given together).
    ``edge_filter``: optional Column predicate over (src, dst) applied to
    the edge table (Yen's spur filtering).
    """
    spark = graph.spark
    w = F.col("weight") if weighted else F.lit(1.0)
    edges = graph.edges.select("src", "dst", w.cast("double").alias("w"))
    if edge_filter is not None:
        edges = edges.filter(edge_filter)
    edges = edges.localCheckpoint(eager=False)
    use_astar = heuristic is not None and target is not None
    if use_astar:
        h = heuristic.select(
            F.col("internal_id").alias("__hid"), F.col("h").alias("__h")
        ).localCheckpoint(eager=False)

    dist = spark.createDataFrame(
        [(source, 0.0)], "internal_id long, distance double"
    ).localCheckpoint(eager=True)
    frontier = dist
    best_target = float("inf")
    for _it in range(max_iterations):
        cand = (
            edges.join(
                frontier.select(
                    F.col("internal_id").alias("src"),
                    F.col("distance").alias("d_src"),
                ),
                "src",
            )
            .select(
                F.col("dst").alias("internal_id"),
                (F.col("d_src") + F.col("w")).alias("cand"),
            )
            .groupBy("internal_id")
            .agg(F.min("cand").alias("cand"))
        )
        inf = F.lit(float("inf"))
        merged = (
            dist.join(cand, "internal_id", "full")
            .select(
                "internal_id",
                F.coalesce("distance", inf).alias("old_d"),
                F.coalesce("cand", inf).alias("new_d"),
            )
            .select(
                "internal_id",
                F.least("old_d", "new_d").alias("distance"),
                (F.col("new_d") < F.col("old_d")).alias("improved"),
            )
        )
        merged = loop_checkpoint(merged, _it + 1)
        frontier = merged.filter("improved").select("internal_id", "distance")
        if use_astar:
            # bound: drop frontier rows whose optimistic total already
            # exceeds the best-known target cost
            trow = (
                merged.filter(F.col("internal_id") == target)
                .select("distance")
                .collect()
            )
            if trow:
                best_target = min(best_target, float(trow[0][0]))
            if best_target < float("inf"):
                frontier = (
                    frontier.join(
                        h, frontier.internal_id == F.col("__hid"), "left"
                    )
                    .filter(
                        F.col("distance") + F.coalesce("__h", F.lit(0.0))
                        <= F.lit(best_target)
                    )
                    .select("internal_id", "distance")
                )
        dist = merged.select("internal_id", "distance")
        if frontier.isEmpty():
            break

    # post-pass: smallest-id optimal predecessor per settled node
    du = dist.select(F.col("internal_id").alias("src"),
                     F.col("distance").alias("du"))
    dv = dist.select(F.col("internal_id").alias("dst"),
                     F.col("distance").alias("dv"))
    preds = (
        edges.join(du, "src")
        .join(dv, "dst")
        .filter(F.col("du") + F.col("w") == F.col("dv"))
        .groupBy(F.col("dst").alias("internal_id"))
        .agg(F.min("src").alias("pred"))
    )
    return dist.join(preds, "internal_id", "left").select(
        "internal_id", "distance", "pred"
    )


def _walk_back(
    dist: DataFrame, source: int, target: int
) -> tuple[list[int], list[float]] | None:
    """Reconstruct source→target node ids + cumulative costs from a
    (internal_id, distance, pred) table. Returns None if unreachable."""
    rows = {}
    node = target
    ids: list[int] = []
    costs: list[float] = []
    # single-row lookups, one per hop
    while True:
        r = (
            dist.filter(F.col("internal_id") == node)
            .select("distance", "pred")
            .collect()
        )
        if not r:
            return None
        ids.append(node)
        costs.append(float(r[0]["distance"]))
        if node == source:
            break
        pred = r[0]["pred"]
        if pred is None:
            return None
        node = int(pred)
        if len(ids) > 10_000_000:  # safety: malformed pred cycle
            raise RuntimeError("predecessor cycle detected")
    ids.reverse()
    costs.reverse()
    return ids, costs


PATH_SCHEMA = (
    "index long, source_node long, target_node long, total_cost double, "
    "node_ids array<bigint>, costs array<double>"
)


def _assemble_paths_distributed(dist: DataFrame) -> DataFrame:
    """Flatten the predecessor forest into full per-node paths, fully
    distributed: (internal_id, seg_ids array, seg_costs array) where
    seg_ids is the source→node shortest path and seg_costs the
    cumulative distances along it.

    Pointer doubling: invariant — ``seg_ids(v)`` spans ``(jump(v), v]``
    of the shortest-path tree in path order. Each round concatenates
    every node's segment onto its current ancestor's segment and
    replaces ``jump`` with the ancestor's ancestor, so segment length
    doubles and the forest flattens in ceil(log2 max-path-len)
    self-joins. Total shuffled bytes across all rounds equal the output
    size times the round count — no O(|V|) driver collect anywhere."""
    seg = dist.select(
        "internal_id",
        F.col("pred").alias("jump"),
        F.array("internal_id").alias("seg_ids"),
        F.array("distance").alias("seg_costs"),
    ).localCheckpoint(eager=True)
    rounds = 0
    while not seg.filter(F.col("jump").isNotNull()).isEmpty():
        rounds += 1
        if rounds > 64:  # 2^64 hops — only a malformed pred cycle gets here
            raise RuntimeError("predecessor cycle detected")
        anc = seg.select(
            F.col("internal_id").alias("jump"),
            F.col("jump").alias("anc_jump"),
            F.col("seg_ids").alias("anc_ids"),
            F.col("seg_costs").alias("anc_costs"),
        )
        seg = seg.join(anc, "jump", "left").select(
            "internal_id",
            F.col("anc_jump").alias("jump"),
            F.when(F.col("jump").isNull(), F.col("seg_ids"))
            .otherwise(F.concat(F.col("anc_ids"), F.col("seg_ids")))
            .alias("seg_ids"),
            F.when(F.col("jump").isNull(), F.col("seg_costs"))
            .otherwise(F.concat(F.col("anc_costs"), F.col("seg_costs")))
            .alias("seg_costs"),
        )
        seg = loop_checkpoint(seg, rounds)
    return seg


def dijkstra_path(
    graph: Graph,
    source: int,
    targets: list[int] | None = None,
    *,
    weighted: bool = True,
    driver_walk_max_targets: int = 64,
) -> DataFrame:
    """gds.beta.shortestPath.dijkstra.stream surface: one row per
    reachable target with the full node path and per-node cumulative
    costs (ref PathResult: Dijkstra.java:48). ``targets=None`` streams
    a path to every reached node (single-source all-targets mode).

    All-targets mode (and target lists longer than
    ``driver_walk_max_targets``) assembles paths DISTRIBUTED via
    :func:`_assemble_paths_distributed` — nothing O(|V|) ever reaches
    the driver. Short explicit target lists take a bounded driver walk
    over the targets' ancestor closure instead (collect size ≤ sum of
    path lengths — cheaper than log L distributed rounds for a handful
    of paths). ``index`` enumerates results in ascending target id; the
    final global sort is presentation-layer (the reference streams an
    arbitrary-order result with a row counter)."""
    dist = sssp_with_predecessors(graph, source, weighted=weighted)
    dist = dist.localCheckpoint(eager=True)
    if targets is None or len(targets) > driver_walk_max_targets:
        from pyspark.sql import Window

        seg = _assemble_paths_distributed(dist)
        if targets is not None:
            seg = seg.filter(
                F.col("internal_id").isin([int(t) for t in targets])
            )
        res = seg.select(
            F.col("internal_id").alias("target_node"),
            F.element_at("seg_costs", -1).alias("total_cost"),
            F.col("seg_ids").alias("node_ids"),
            F.col("seg_costs").alias("costs"),
        )
        # Global index (rank of target id) WITHOUT a single-partition
        # window: range-partition by target, rank within each partition
        # in parallel, then add broadcast per-partition offsets — the
        # distributed zipWithIndex. Output is deterministic (ranks are
        # offsets + local ranks over unique targets) even though the
        # sampled range boundaries are not.
        res = (
            res.repartitionByRange(
                max(res.sparkSession.sparkContext.defaultParallelism, 2),
                "target_node",
            )
            .withColumn("__pid", F.spark_partition_id())
            .localCheckpoint(eager=True)
        )
        wp = Window.partitionBy("__pid").orderBy("target_node")
        counts = {
            r["__pid"]: r["cnt"]
            for r in res.groupBy("__pid")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        offsets, acc = {}, 0
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]
        off_df = F.broadcast(
            res.sparkSession.createDataFrame(
                [(int(p), int(o)) for p, o in offsets.items()],
                "__pid int, __off long",
            )
        )
        return (
            res.join(off_df, "__pid")
            .select(
                (F.row_number().over(wp) - 1 + F.col("__off"))
                .cast("long")
                .alias("index"),
                F.lit(source).cast("long").alias("source_node"),
                "target_node",
                "total_cost",
                "node_ids",
                "costs",
            )
        )
    # Short explicit target list: reconstruct from ONE collected
    # predecessor pass over the targets' ancestor closure.
    need = set(targets)
    pred_map: dict[int, tuple[float, int | None]] = {}
    pending = set(need)
    while pending:
        batch = list(pending)[:100_000]
        pending -= set(batch)
        got = (
            dist.filter(F.col("internal_id").isin(batch))
            .select("internal_id", "distance", "pred")
            .collect()
        )
        for r in got:
            p = None if r["pred"] is None else int(r["pred"])
            pred_map[int(r["internal_id"])] = (float(r["distance"]), p)
            if p is not None and p not in pred_map:
                pending.add(p)
    rows = []
    idx = 0
    for t in sorted(need):
        if t not in pred_map:
            continue
        ids = [t]
        while ids[-1] != source:
            p = pred_map.get(ids[-1], (None, None))[1]
            if p is None:
                ids = None
                break
            ids.append(p)
        if ids is None:
            continue
        ids.reverse()
        costs = [pred_map[v][0] for v in ids]
        rows.append((idx, source, t, costs[-1], ids, costs))
        idx += 1
    return graph.spark.createDataFrame(rows, PATH_SCHEMA)


def astar_path(
    graph: Graph,
    source: int,
    target: int,
    heuristic: DataFrame,
    *,
    weighted: bool = True,
) -> DataFrame:
    """gds.beta.shortestPath.astar.stream: single source→target path.
    ``heuristic``: (internal_id, h) admissible lower bounds on remaining
    cost (the reference uses haversine over latitude/longitude node
    properties — ref AStar.java:38-101; any consistent heuristic works).
    Exact: the relaxation only PRUNES provably-suboptimal frontier rows.
    """
    dist = sssp_with_predecessors(
        graph, source, weighted=weighted, heuristic=heuristic, target=target
    ).localCheckpoint(eager=True)
    walked = _walk_back(dist, source, target)
    if walked is None:
        return graph.spark.createDataFrame([], PATH_SCHEMA)
    ids, costs = walked
    return graph.spark.createDataFrame(
        [(0, source, target, costs[-1], ids, costs)], PATH_SCHEMA
    )


def haversine_heuristic(
    vertices: DataFrame, target_lat: float, target_lon: float,
    *, lat_col: str = "latitude", lon_col: str = "longitude",
) -> DataFrame:
    """(internal_id, h) — great-circle distance in km to the target
    coordinates (the reference's heuristic, AStar.java:76-101)."""
    R = 6371.0
    lat1 = F.radians(F.col(lat_col))
    lat2 = F.radians(F.lit(target_lat))
    dlat = F.radians(F.lit(target_lat) - F.col(lat_col))
    dlon = F.radians(F.lit(target_lon) - F.col(lon_col))
    a = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(lat1) * F.cos(lat2) * F.pow(F.sin(dlon / 2), 2)
    )
    return vertices.select(
        "internal_id",
        (2 * R * F.asin(F.sqrt(a))).alias("h"),
    )


@dataclass
class _YenCandidate:
    cost: float
    ids: tuple
    costs: tuple


def yens_k_shortest(
    graph: Graph,
    source: int,
    target: int,
    k: int,
    *,
    weighted: bool = True,
) -> DataFrame:
    """gds.beta.shortestPath.yens.stream: K loopless shortest paths
    (ref Yens.java:48 — spur-node deviations, each a Dijkstra run with
    the root prefix's nodes and the previously-used spur edges removed).
    Sequential in k×path-length Dijkstra runs, matching the reference's
    own control flow; each inner run is the distributed relaxation."""
    first = _walk_back(
        sssp_with_predecessors(graph, source, weighted=weighted)
        .localCheckpoint(eager=True),
        source,
        target,
    )
    if first is None:
        return graph.spark.createDataFrame([], PATH_SCHEMA)
    a_paths: list[_YenCandidate] = [
        _YenCandidate(first[1][-1], tuple(first[0]), tuple(first[1]))
    ]
    b_heap: list[_YenCandidate] = []

    while len(a_paths) < k:
        prev = a_paths[-1]
        for i in range(len(prev.ids) - 1):
            spur = prev.ids[i]
            root_ids = prev.ids[: i + 1]
            root_cost = prev.costs[i]
            # remove edges used by any accepted path sharing this root
            banned_edges = set()
            for p in a_paths:
                if p.ids[: i + 1] == root_ids and len(p.ids) > i + 1:
                    banned_edges.add((p.ids[i], p.ids[i + 1]))
            banned_nodes = set(root_ids[:-1])
            cond = F.lit(True)
            if banned_nodes:
                cond &= ~F.col("src").isin(list(banned_nodes))
                cond &= ~F.col("dst").isin(list(banned_nodes))
            for s, d in banned_edges:
                cond &= ~((F.col("src") == s) & (F.col("dst") == d))
            spur_dist = sssp_with_predecessors(
                graph, int(spur), weighted=weighted, edge_filter=cond
            ).localCheckpoint(eager=True)
            walked = _walk_back(spur_dist, int(spur), target)
            if walked is None:
                continue
            sp_ids, sp_costs = walked
            total_ids = root_ids[:-1] + tuple(sp_ids)
            total_costs = tuple(prev.costs[:i]) + tuple(
                root_cost + c for c in sp_costs
            )
            candidate = _YenCandidate(
                total_costs[-1], total_ids, total_costs
            )
            if all(c.ids != candidate.ids for c in b_heap) and all(
                p.ids != candidate.ids for p in a_paths
            ):
                b_heap.append(candidate)
        if not b_heap:
            break
        b_heap.sort(key=lambda c: (c.cost, c.ids))
        a_paths.append(b_heap.pop(0))

    rows = [
        (i, source, target, p.cost, list(p.ids), list(p.costs))
        for i, p in enumerate(a_paths)
    ]
    return graph.spark.createDataFrame(rows, PATH_SCHEMA)
