"""HDBSCAN node clustering (gds.hdbscan, GDS 2.x surface).

Reference semantics (published GDS 2.x API — the reference tree predates
the procedure): density-based clustering over a vector node property
(Campello/Moulavi/Sander 2013). ``samples`` = k for the core distance
(distance to the k-th nearest neighbor), ``minClusterSize`` = smallest
surviving cluster; points in no surviving cluster get label −1 (noise).

Spark-first decomposition:

1. **kNN** (euclidean) per node — brute-force blocked cross join as the
   exact baseline (same shape as ``pipeline/ann.cosine_topk_bruteforce``);
   at scale pass ``knn_edges`` precomputed by the bucketed ANN paths
   (LSH/IVF in ``pipeline/ann.py`` — the standard approximate-HDBSCAN
   practice, e.g. the reference hdbscan library's ``approx_min_span_tree``).
2. **Core distances** = k-th neighbor distance; one window per node.
3. **Mutual-reachability graph** over the kNN edge set:
   ``mreach(a,b) = max(d(a,b), core(a), core(b))`` — a join against the
   core-distance table on each endpoint.
4. **MST** over the mutual-reachability graph — the existing distributed
   Borůvka (`operators/spanningtree.py`); the kNN-graph MST is the
   standard scalable stand-in for the complete-graph MST (exact when the
   kNN graph connects each true cluster, the usual regime for k ≥
   samples).
5. **Condensed tree + excess-of-mass cluster extraction** — the MST has
   |V|−1 edges, orders of magnitude smaller than the input; the
   dendrogram condensation is inherently sequential union-find (GDS runs
   it single-threaded too), so it runs driver-side over the collected
   forest with an explicit node-count guard, mirroring the documented
   driver-side DFS policy (`operators/traverse.py`).

Determinism: brute-force kNN, core distances, mreach weights and Borůvka
(min-(w, a, b) picks) are all deterministic; union-find processes edges
in (w, a, b) sorted order → identical labels on any partitioning.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..graph import Graph, from_edge_df

_DRIVER_GUARD = 5_000_000  # MST rows collected for condensation


@dataclass
class HdbscanResult:
    labels: DataFrame          # (internal_id, label)  label −1 = noise
    n_clusters: int
    core_distances: DataFrame  # (internal_id, core_distance)


def _sq_dist(va, vb):
    return F.aggregate(
        F.zip_with(va, vb, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _knn_euclidean(emb: DataFrame, k: int) -> DataFrame:
    """(a, b, dist) — exact k nearest euclidean neighbors per node."""
    left = emb.select(F.col("internal_id").alias("a"),
                      F.col("vec").alias("va"))
    right = emb.select(F.col("internal_id").alias("b"),
                       F.col("vec").alias("vb"))
    pairs = left.crossJoin(right).filter(F.col("a") != F.col("b"))
    scored = pairs.select(
        "a", "b", F.sqrt(_sq_dist(F.col("va"), F.col("vb"))).alias("dist")
    )
    w = Window.partitionBy("a").orderBy(F.col("dist").asc(),
                                        F.col("b").asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def _condense_and_label(edges, n_points, min_cluster_size):
    """Single-linkage dendrogram -> condensed tree -> EOM selection.

    ``edges``: [(w, a, b)] sorted ascending. Returns {point: label}.
    Sequential union-find over |V|−1 MST rows (see module docstring).
    """
    # ---- single-linkage tree (scipy linkage convention) ----------------
    parent = {}
    uf_root = {}

    def find(x):
        r = x
        while uf_root.get(r, r) != r:
            r = uf_root[r]
        while uf_root.get(x, x) != x:
            uf_root[x], x = r, uf_root[x]
        return r

    next_id = n_points
    children = {}   # internal id -> (left, right)
    dist_of = {}    # internal id -> merge distance
    size = {p: 1 for p in range(n_points)}
    cluster_of = {} # current dendrogram node of each uf root
    for w, a, b in edges:
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        ca, cb = cluster_of.get(ra, ra), cluster_of.get(rb, rb)
        node = next_id
        next_id += 1
        children[node] = (ca, cb)
        dist_of[node] = w
        size[node] = size[ca] + size[cb]
        uf_root[ra] = rb
        cluster_of[rb] = node
    roots = {cluster_of.get(find(p), find(p)) for p in range(n_points)}
    if len(roots) > 1:
        # stitch disconnected kNN components under a virtual root at
        # lambda 0 (infinite distance): no cluster can span them
        node = next_id
        next_id += 1
        it = iter(sorted(roots))
        acc = next(it)
        for r in it:
            children[node] = (acc, r)
            dist_of[node] = float("inf")
            size[node] = size[acc] + size[r]
            acc = node
            node = next_id
            next_id += 1
        root = acc
    else:
        root = next(iter(roots))

    # ---- condensed tree ------------------------------------------------
    # rows: (parent_cluster, child, lambda, child_size); child < n_points
    # is a point, else a condensed cluster id
    cond = []
    cluster_ids = {root: 0}
    n_cond = 1
    stack = [(root, 0)]
    while stack:
        node, cid = stack.pop()
        if node < n_points:
            cond.append((cid, node, float("inf"), 1, True))
            continue
        d = dist_of[node]
        lam = 0.0 if d == float("inf") else (
            float("inf") if d == 0.0 else 1.0 / d
        )
        l, r = children[node]
        sl, sr = size[l], size[r]
        big_l = sl >= min_cluster_size
        big_r = sr >= min_cluster_size
        if big_l and big_r:  # true split: two new condensed clusters
            for ch in (l, r):
                new_id = n_cond
                n_cond += 1
                cond.append((cid, n_points + new_id, lam, size[ch], False))
                cluster_ids[ch] = new_id
                stack.append((ch, new_id))
        else:
            # children below min size fall out as points at this lambda;
            # the surviving side continues THE SAME cluster
            for ch, big in ((l, big_l), (r, big_r)):
                if big:
                    stack.append((ch, cid))
                else:
                    for p in _leaves(ch, children, n_points):
                        cond.append((cid, p, lam, 1, True))
    # point fall-out lambdas within surviving clusters: a point that
    # stays until its cluster fully dissolves exits at the smallest merge
    # lambda inside the cluster — approximated above by inf for leaf-level
    # points; cap per-cluster with the max finite lambda seen
    max_lam = {}
    for cid, child, lam, sz, is_pt in cond:
        if lam != float("inf"):
            max_lam[cid] = max(max_lam.get(cid, 0.0), lam)
    cond = [
        (cid, child,
         (max_lam.get(cid, 1.0) if lam == float("inf") else lam), sz, is_pt)
        for cid, child, lam, sz, is_pt in cond
    ]

    # ---- stability + excess-of-mass selection --------------------------
    birth = {0: 0.0}
    for cid, child, lam, sz, is_pt in cond:
        if not is_pt:
            birth[child - n_points] = lam
    stability = {c: 0.0 for c in birth}
    for cid, child, lam, sz, is_pt in cond:
        if is_pt:
            stability[cid] += (lam - birth[cid]) * 1
    kids = {}
    for cid, child, lam, sz, is_pt in cond:
        if not is_pt:
            kids.setdefault(cid, []).append(child - n_points)
    selected = {}

    def eom(c):
        ch = kids.get(c, [])
        if not ch:
            selected[c] = True
            return stability[c]
        sub = sum(eom(x) for x in ch)
        if stability[c] >= sub and c != 0:
            selected[c] = True
            _deselect_below(c)
            return stability[c]
        selected[c] = False
        return sub

    def _deselect_below(c):
        for x in kids.get(c, []):
            selected[x] = False
            _deselect_below(x)

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, n_cond + 100))
    try:
        eom(0)
    finally:
        sys.setrecursionlimit(old)
    selected[0] = False  # never the root (allowSingleCluster=false)

    # ---- labels: point -> nearest selected ancestor cluster -----------
    point_cluster = {}
    cparent = {}
    for cid, child, lam, sz, is_pt in cond:
        if is_pt:
            point_cluster[child] = cid
        else:
            cparent[child - n_points] = cid
    label_map = {}
    n_out = 0
    out = {}
    for p in range(n_points):
        c = point_cluster.get(p, 0)
        while c is not None and not selected.get(c, False):
            c = cparent.get(c)
        if c is None:
            out[p] = -1
        else:
            if c not in label_map:
                label_map[c] = n_out
                n_out += 1
            out[p] = label_map[c]
    return out, n_out


def _exact_mreach_mst(emb, core, n_points):
    """Exact MST of the complete mutual-reachability graph — Borůvka
    with per-component minimum-outgoing-edge aggregation Spark-side; the
    driver holds only the component map and the ≤ n−1 picked edges."""
    side = emb.join(core, "internal_id").localCheckpoint(eager=True)
    root = list(range(n_points))

    def find(x):
        while root[x] != x:
            root[x] = root[root[x]]
            x = root[x]
        return x

    spark = emb.sparkSession
    mst = []
    while True:
        comp_rows = [(p, find(p)) for p in range(n_points)]
        if len({c for _p, c in comp_rows}) <= 1:
            break
        comp_df = spark.createDataFrame(
            comp_rows, "internal_id long, comp long"
        )
        sided = side.join(F.broadcast(comp_df), "internal_id")
        la = sided.select(
            F.col("internal_id").alias("a"), F.col("vec").alias("va"),
            F.col("comp").alias("comp_a"),
            F.col("core_distance").alias("core_a"),
        )
        lb = sided.select(
            F.col("internal_id").alias("b"), F.col("vec").alias("vb"),
            F.col("comp").alias("comp_b"),
            F.col("core_distance").alias("core_b"),
        )
        picks = (
            la.crossJoin(lb)
            .filter(F.col("comp_a") != F.col("comp_b"))
            .select(
                "comp_a",
                F.struct(
                    F.greatest(
                        F.sqrt(_sq_dist(F.col("va"), F.col("vb"))),
                        F.col("core_a"), F.col("core_b"),
                    ).alias("w"),
                    F.col("a"), F.col("b"),
                ).alias("cand"),
            )
            .groupBy("comp_a")
            .agg(F.min("cand").alias("pick"))
            .select("pick.w", "pick.a", "pick.b")
            .collect()
        )
        if not picks:
            break
        merged = False
        for w, a, b in sorted(
            (float(r[0]), int(r[1]), int(r[2])) for r in picks
        ):
            ra, rb = find(a), find(b)
            if ra != rb:
                root[ra] = rb
                mst.append((w, a, b))
                merged = True
        if not merged:
            break
    return sorted(mst)


def _forest_components(edges, n_points):
    root = list(range(n_points))

    def find(x):
        while root[x] != x:
            root[x] = root[root[x]]
            x = root[x]
        return x

    for _w, a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            root[ra] = rb
    return {p: find(p) for p in range(n_points)}


def _leaves(node, children, n_points):
    stack, acc = [node], []
    while stack:
        x = stack.pop()
        if x < n_points:
            acc.append(x)
        else:
            stack.extend(children[x])
    return acc


def hdbscan(
    graph: Graph,
    property_name: str,
    *,
    samples: int = 5,
    min_cluster_size: int = 5,
    knn_edges: DataFrame | None = None,
) -> HdbscanResult:
    """Cluster nodes by the euclidean density of a vector property.

    ``knn_edges`` (a, b, dist) overrides the exact brute-force kNN with a
    precomputed (approximate) neighbor table — the 100-TB path via
    ``pipeline/ann``'s LSH/IVF buckets.
    """
    spark = graph.vertices.sparkSession
    emb = graph.vertices.select(
        "internal_id", F.col(property_name).alias("vec")
    )
    n = emb.count()
    if n > _DRIVER_GUARD:
        raise ValueError(
            f"hdbscan condensation collects the MST ({n} nodes > "
            f"{_DRIVER_GUARD}); cluster the output of pipeline/ann "
            "bucketing first or raise the guard explicitly"
        )
    approximate = knn_edges is not None
    if knn_edges is None:
        knn_edges = _knn_euclidean(emb, samples)
    knn_edges = knn_edges.localCheckpoint(eager=True)

    core = knn_edges.groupBy(F.col("a").alias("internal_id")).agg(
        F.max("dist").alias("core_distance")
    ).localCheckpoint(eager=True)

    if not approximate:
        # exact mode: true complete-graph mutual-reachability MST via
        # distributed Borůvka — each round one crossJoin + per-component
        # min-edge aggregation (O(log n) rounds, same n² class as the
        # exact kNN above; the scale path passes ``knn_edges``)
        edges = _exact_mreach_mst(emb, core, n)
        labels, n_clusters = _condense_and_label(edges, n, min_cluster_size)
        labels_df = spark.createDataFrame(
            [(int(p), int(l)) for p, l in labels.items()],
            "internal_id long, label long",
        )
        return HdbscanResult(
            labels=labels_df, n_clusters=n_clusters, core_distances=core
        )

    mreach = (
        knn_edges.join(
            core.select(F.col("internal_id").alias("a"),
                        F.col("core_distance").alias("core_a")), "a")
        .join(
            core.select(F.col("internal_id").alias("b"),
                        F.col("core_distance").alias("core_b")), "b")
        .select(
            F.col("a").alias("src"),
            F.col("b").alias("dst"),
            F.greatest("dist", "core_a", "core_b").alias("weight"),
        )
    )
    g_mreach = from_edge_df(mreach, weight="weight")
    from .spanningtree import spanning_tree

    forest = spanning_tree(g_mreach)  # (src, dst, weight)
    rows = forest.select(
        F.col("weight").cast("double"), F.col("src").cast("long"),
        F.col("dst").cast("long")
    ).collect()
    edges = sorted((float(r[0]), int(r[1]), int(r[2])) for r in rows)

    # A kNN graph too sparse to connect the true clusters (k below the
    # cluster size) leaves the forest disconnected; the merge heights
    # between those components would be lost and far-out points would
    # read as cluster members instead of noise. Complete the hierarchy
    # EXACTLY: by the cut property the complete-graph MST joins two
    # components through their minimum cross mutual-reachability edge, so
    # one component-keyed crossJoin + groupBy-min per component pair
    # recovers the true top of the dendrogram (cost |C_i|·|C_j| pairs —
    # only runs when the kNN graph is disconnected; at scale pass
    # ``knn_edges`` with k large enough to connect each cluster).
    comp_of = _forest_components(edges, n)
    if len(set(comp_of.values())) > 1:
        comp_df = spark.createDataFrame(
            [(int(p), int(c)) for p, c in comp_of.items()],
            "internal_id long, comp long",
        )
        side = (
            emb.join(comp_df, "internal_id")
            .join(core, "internal_id")
        )
        la = side.select(
            F.col("internal_id").alias("a"), F.col("vec").alias("va"),
            F.col("comp").alias("comp_a"),
            F.col("core_distance").alias("core_a"),
        )
        lb = side.select(
            F.col("internal_id").alias("b"), F.col("vec").alias("vb"),
            F.col("comp").alias("comp_b"),
            F.col("core_distance").alias("core_b"),
        )
        cross = (
            la.crossJoin(lb)
            .filter(F.col("comp_a") < F.col("comp_b"))
            .select(
                "comp_a", "comp_b",
                F.greatest(
                    F.sqrt(_sq_dist(F.col("va"), F.col("vb"))),
                    F.col("core_a"), F.col("core_b"),
                ).alias("w"),
                "a", "b",
            )
            .groupBy("comp_a", "comp_b")
            .agg(F.min(F.struct("w", "a", "b")).alias("pick"))
            .select("pick.w", "pick.a", "pick.b")
            .collect()
        )
        edges = sorted(
            edges + [(float(r[0]), int(r[1]), int(r[2])) for r in cross]
        )

    labels, n_clusters = _condense_and_label(
        edges, n, min_cluster_size
    )
    labels_df = spark.createDataFrame(
        [(int(p), int(l)) for p, l in labels.items()],
        "internal_id long, label long",
    )
    return HdbscanResult(
        labels=labels_df, n_clusters=n_clusters, core_distances=core
    )
