"""Biconnected components / bridges / articulation points vs a
sequential Tarjan reference (the textbook DFS the distributed
formulation must reproduce exactly)."""

import collections
import random

from graph_data_science_spark.graph import from_edge_df
from graph_data_science_spark.operators.biconnectivity import (
    articulation_points,
    biconnected_components,
    bridges,
)


def _tarjan(edges):
    """Sequential reference: bridges, articulation points, per-edge
    biconnected class."""
    adj = collections.defaultdict(list)
    for i, (a, b) in enumerate(edges):
        adj[a].append((b, i))
        adj[b].append((a, i))
    visited, tin, low = {}, {}, {}
    timer = [0]
    br, aps, comp_of_edge = set(), set(), {}
    stack, cid = [], [0]
    import sys

    sys.setrecursionlimit(100000)

    def dfs(u, pe):
        visited[u] = True
        tin[u] = low[u] = timer[0]
        timer[0] += 1
        ch = 0
        for (v, ei) in adj[u]:
            if ei == pe:
                continue
            if v in visited:
                if tin[v] < tin[u]:
                    stack.append(ei)
                low[u] = min(low[u], tin[v])
            else:
                stack.append(ei)
                ch += 1
                dfs(v, ei)
                low[u] = min(low[u], low[v])
                if low[v] > tin[u]:
                    br.add(ei)
                if pe != -1 and low[v] >= tin[u]:
                    aps.add(u)
                if low[v] >= tin[u]:
                    c = cid[0]
                    cid[0] += 1
                    while True:
                        e2 = stack.pop()
                        comp_of_edge[e2] = c
                        if e2 == ei:
                            break
        if pe == -1 and ch >= 2:
            aps.add(u)

    for v in sorted(adj):
        if v not in visited:
            dfs(v, -1)
    return br, aps, comp_of_edge


def _check(spark, edges):
    g = from_edge_df(spark.createDataFrame(edges, "src long, dst long"))
    id2orig = {
        r.internal_id: r.original_id for r in g.vertices.collect()
    }

    def me(s, d):
        a, b = id2orig[s], id2orig[d]
        return (min(a, b), max(a, b))

    bcc = biconnected_components(g).localCheckpoint(eager=True)
    br_s = {me(r.src, r.dst) for r in bridges(g, bcc=bcc).collect()}
    ap_s = {
        id2orig[r.internal_id]
        for r in articulation_points(g, bcc=bcc).collect()
    }
    bcc_s = {me(r.src, r.dst): r.component for r in bcc.collect()}

    br_b, ap_b, comp_b = _tarjan(edges)
    br_b = {edges[i] for i in br_b}
    assert br_s == br_b
    assert ap_s == ap_b
    # biconnected classes must induce the same PARTITION of the edges
    p1 = collections.defaultdict(set)
    p2 = collections.defaultdict(set)
    for i, e in enumerate(edges):
        p2[comp_b[i]].add(e)
    for e, c in bcc_s.items():
        p1[c].add(e)
    assert sorted(map(sorted, p1.values())) == sorted(
        map(sorted, p2.values())
    )


def test_handcrafted_blocks_bridges_aps(spark):
    """Two triangles joined by a cut vertex, a pendant path, a 4-cycle
    hung off a bridge, and a separate component: every structural case
    at once. Vertex ids are non-dense on purpose (exercises the id
    map)."""
    edges = [
        (0, 1), (1, 2), (0, 2),          # triangle A
        (2, 3), (3, 4), (2, 4),          # triangle B sharing vertex 2
        (4, 5), (5, 6),                  # pendant path (two bridges)
        (6, 7), (7, 8), (8, 9), (6, 9),  # 4-cycle after bridge (5,6)
        (20, 21), (21, 22),              # second component path
    ]
    _check(spark, edges)


def test_random_graph_matches_tarjan(spark):
    rng = random.Random(123)
    n = 24
    m = 40
    es = set()
    while len(es) < m:
        a, b = rng.sample(range(n), 2)
        es.add((min(a, b), max(a, b)))
    _check(spark, sorted(es))


def test_filtered_similarity_variants(spark):
    """Filtered nodeSimilarity/KNN restrict pairs (source/target) with
    top-k ranked AFTER the restriction."""
    from pyspark.sql import functions as F

    from graph_data_science_spark.graph import Graph, from_edge_df
    from graph_data_science_spark.operators.knn import filtered_knn
    from graph_data_science_spark.operators.nodesim import node_similarity

    # bipartite: sources 0..5 share subsets of targets 100..104
    edges = [(s, 100 + t) for s in range(6) for t in range(5)
             if (s + t) % 3 != 0]
    g = from_edge_df(spark.createDataFrame(edges, "src long, dst long"))
    supp = g.vertices.filter(F.col("original_id") < 100)
    src_f = supp.filter(F.col("original_id") % 2 == 0).select(
        "internal_id"
    )
    tgt_f = supp.filter(F.col("original_id") % 2 == 1).select(
        "internal_id"
    )
    full = node_similarity(g, top_k=0)
    filt = node_similarity(
        g, top_k=2, source_ids=src_f, target_ids=tgt_f
    )
    id2orig = {
        r.internal_id: r.original_id for r in g.vertices.collect()
    }
    rows = [(id2orig[r.node1], id2orig[r.node2], r.similarity)
            for r in filt.collect()]
    assert rows, "filtered result must be non-empty"
    assert all(a % 2 == 0 and b % 2 == 1 for a, b, _ in rows)
    # every filtered pair's similarity matches the unfiltered value
    fullmap = {(id2orig[r.node1], id2orig[r.node2]): r.similarity
               for r in full.collect()}
    for a, b, s in rows:
        assert abs(fullmap[(a, b)] - s) < 1e-12
    # top-k after filter: each source keeps its 2 best ODD partners
    # (ties pin the smaller partner id, the operator's tie-break)
    for a in {a for a, _, _ in rows}:
        mine = sorted(
            ((-s, b) for x, b, s in rows if x == a)
        )
        best = sorted(
            ((-s, b) for (x, b), s in fullmap.items()
             if x == a and b % 2 == 1)
        )[:2]
        assert mine == best

    # filtered knn: queries even ids, candidates odd ids
    emb = spark.createDataFrame(
        [(i, [float(i % 4), float((i * 7) % 5), 1.0]) for i in range(12)],
        "internal_id long, vec array<double>",
    )
    kg = Graph(emb, spark.createDataFrame([], "src long, dst long"))
    out = filtered_knn(
        kg, "vec", top_k=2,
        source_ids=emb.filter(F.col("internal_id") % 2 == 0).select(
            "internal_id"
        ),
        target_ids=emb.filter(F.col("internal_id") % 2 == 1).select(
            "internal_id"
        ),
    ).collect()
    assert {r.node1 % 2 for r in out} == {0}
    assert {r.node2 % 2 for r in out} == {1}
    per_src = collections.Counter(r.node1 for r in out)
    assert all(c <= 2 for c in per_src.values())


def test_kmeans_operator(spark):
    """gds.kmeans wrapper: planted clusters recovered, every node
    nearest its own centroid, silhouette high for separated data."""
    import numpy as np
    from pyspark.sql import functions as F

    from graph_data_science_spark.graph import Graph
    from graph_data_science_spark.operators.kmeans import kmeans

    rng = np.random.default_rng(3)
    rows = []
    for i in range(90):
        c = i % 3
        base = np.array([10.0 * c, -5.0 * c, 3.0])
        rows.append((i, (base + rng.normal(0, 0.1, 3)).tolist()))
    emb = spark.createDataFrame(
        rows, "internal_id long, vec array<double>"
    )
    g = Graph(emb, spark.createDataFrame([], "src long, dst long"))
    out = kmeans(
        g, "vec", k=3, max_iterations=10, compute_silhouette=True
    ).collect()
    assert len(out) == 90
    # planted clusters: assignment must be a pure function of i % 3
    by_plant = {}
    for r in out:
        by_plant.setdefault(r.internal_id % 3, set()).add(r.community)
    assert all(len(v) == 1 for v in by_plant.values())
    assert len({next(iter(v)) for v in by_plant.values()}) == 3
    assert all(r.distance_from_centroid >= 0 for r in out)
    assert all(r.silhouette > 0.9 for r in out)  # well separated


def test_weighted_node_similarity_hand_computed(spark):
    """Weighted overlap sum(min)/sum(max) vs a hand-computed fixture
    (ref NodeSimilarity.java:153-185 semantics: vectors aligned on the
    union of neighborhoods, missing entries 0)."""
    from graph_data_science_spark.graph import from_edge_df
    from graph_data_science_spark.operators.nodesim import node_similarity

    # a: {x:3, y:1}, b: {x:1, y:2, z:4}, c: {z:4}
    # a-b: min 1+1=2, max 3+2+4=9           -> 2/9
    # b-c: min 4,     max 1+2+4=7           -> 4/7
    # a-c: no shared neighbor -> no pair
    edges = [
        (0, 10, 3.0), (0, 11, 1.0),
        (1, 10, 1.0), (1, 11, 2.0), (1, 12, 4.0),
        (2, 12, 4.0),
    ]
    g = from_edge_df(
        spark.createDataFrame(edges, "src long, dst long, w double"),
        weight="w",
    )
    id2orig = {r.internal_id: r.original_id for r in g.vertices.collect()}
    rows = {
        (id2orig[r.node1], id2orig[r.node2]): r.similarity
        for r in node_similarity(
            g, relationship_weight="weight", top_k=0
        ).collect()
    }
    assert set(rows) == {(0, 1), (1, 0), (1, 2), (2, 1)}
    assert abs(rows[(0, 1)] - 2 / 9) < 1e-12
    assert abs(rows[(1, 2)] - 4 / 7) < 1e-12
    # both directions carry the symmetric score
    assert rows[(0, 1)] == rows[(1, 0)]
    # unweighted on the same graph differs (a-b jaccard = 2/3)
    uw = {
        (id2orig[r.node1], id2orig[r.node2]): r.similarity
        for r in node_similarity(g, top_k=0).collect()
    }
    assert abs(uw[(0, 1)] - 2 / 3) < 1e-12
