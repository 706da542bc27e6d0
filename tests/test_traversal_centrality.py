"""BFS/DFS/SSSP + HITS + closeness/harmonic + k1-coloring."""

import random

import numpy as np

from graph_data_science_spark.graph import UNDIRECTED, from_edge_list
from graph_data_science_spark.operators.closeness import (
    closeness_centrality,
    harmonic_centrality,
)
from graph_data_science_spark.operators.hits import hits
from graph_data_science_spark.operators.k1coloring import k1coloring
from graph_data_science_spark.operators.traverse import bfs, dfs, shortest_path, sssp


def _rand_graph(n, m, seed, weighted=False):
    rnd = random.Random(seed)
    edges = set()
    while len(edges) < m:
        a, b = rnd.randrange(n), rnd.randrange(n)
        if a != b:
            edges.add((a, b))
    out = []
    for a, b in sorted(edges):
        w = round(rnd.uniform(0.5, 3.0), 3) if weighted else 1.0
        out.append((f"{a:03d}", f"{b:03d}", w))
    return out


def _dist_matrix(n, edges, directed=True):
    """min-plus closure via numpy (exact, small graphs)."""
    D = np.full((n, n), np.inf)
    np.fill_diagonal(D, 0.0)
    for s, d, w in edges:
        s, d = int(s), int(d)
        D[s, d] = min(D[s, d], w)
        if not directed:
            D[d, s] = min(D[d, s], w)
    for _ in range(n):
        D = np.minimum(D, np.min(D[:, :, None] + D[None, :, :], axis=1))
    return D


def test_bfs_hops(spark):
    edges = _rand_graph(30, 80, 1)
    g = from_edge_list(spark, edges, node_ids=[f"{i:03d}" for i in range(30)])
    D = _dist_matrix(30, edges)
    got = {r["internal_id"]: r["hop"] for r in bfs(g, 0).collect()}
    for v in range(30):
        if np.isfinite(D[0, v]):
            assert got[v] == int(D[0, v])
        else:
            assert v not in got


def test_dfs_preorder(spark):
    #    0 -> 1 -> 3
    #      -> 2 -> 4
    g = from_edge_list(spark, [(0, 1), (0, 2), (1, 3), (2, 4)])
    assert dfs(g, 0) == [0, 1, 3, 2, 4]


def test_sssp_weighted_vs_numpy(spark):
    edges = _rand_graph(25, 70, 2, weighted=True)
    g = from_edge_list(spark, edges, node_ids=[f"{i:03d}" for i in range(25)])
    D = _dist_matrix(25, edges)
    got = {r["internal_id"]: r["distance"] for r in sssp(g, 0).collect()}
    for v in range(25):
        if np.isfinite(D[0, v]):
            assert abs(got[v] - D[0, v]) < 1e-9
        else:
            assert v not in got
    t = max(v for v in range(25) if np.isfinite(D[0, v]))
    assert abs(shortest_path(g, 0, t) - D[0, t]) < 1e-9


def test_hits_cycle_uniform(spark):
    # directed 4-cycle: hubs == auths == 0.5 each after normalization
    g = from_edge_list(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    res = hits(g, max_iterations=30, tolerance=1e-10)
    for r in res.scores.collect():
        assert abs(r["hub"] - 0.5) < 1e-6 and abs(r["auth"] - 0.5) < 1e-6
    assert res.converged


def test_hits_star(spark):
    # star: 0 -> {1,2,3}: node0 is the only hub; 1..3 equal authorities
    g = from_edge_list(spark, [(0, 1), (0, 2), (0, 3)])
    scores = {r["internal_id"]: r for r in hits(g).scores.collect()}
    assert abs(scores[0]["hub"] - 1.0) < 1e-9
    for v in (1, 2, 3):
        assert abs(scores[v]["auth"] - 1 / np.sqrt(3)) < 1e-9
        assert scores[v]["hub"] == 0.0


def test_k1coloring_proper(spark):
    edges = _rand_graph(40, 120, 3)
    g = from_edge_list(
        spark, edges, orientation=UNDIRECTED,
        node_ids=[f"{i:03d}" for i in range(40)],
    )
    colors, _ran, converged = k1coloring(g, max_iterations=20)
    assert converged
    cmap = {r["internal_id"]: r["color"] for r in colors.collect()}
    for s, d, _ in edges:
        assert cmap[int(s)] != cmap[int(d)]


def test_closeness_and_harmonic_path(spark):
    # path 0-1-2 undirected: GDS formulas
    g = from_edge_list(spark, [(0, 1), (1, 2)], orientation=UNDIRECTED)
    clos = {r["internal_id"]: r["score"] for r in closeness_centrality(g).collect()}
    assert abs(clos[1] - 1.0) < 1e-9          # (3-1)/(1+1)
    assert abs(clos[0] - 2 / 3) < 1e-9        # (3-1)/(1+2)
    harm = {r["internal_id"]: r["score"] for r in harmonic_centrality(g).collect()}
    assert abs(harm[1] - 1.0) < 1e-9          # (1+1)/2
    assert abs(harm[0] - (1 + 0.5) / 2) < 1e-9


def test_closeness_vs_numpy_random(spark):
    edges = _rand_graph(70, 150, 4)
    g = from_edge_list(
        spark, edges, orientation=UNDIRECTED,
        node_ids=[f"{i:03d}" for i in range(70)],
    )
    n = 70
    D = _dist_matrix(n, edges, directed=False)
    got = {r["internal_id"]: r["score"] for r in closeness_centrality(g).collect()}
    for v in range(n):
        finite = D[v][np.isfinite(D[v])]
        far = finite.sum()
        expect = (n - 1) / far if far > 0 else 0.0
        assert abs(got[v] - expect) < 1e-9, v
