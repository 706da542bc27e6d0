"""Betweenness vs a single-threaded Brandes oracle."""

import random
from collections import deque

from graph_data_science_spark.graph import UNDIRECTED, from_edge_list
from graph_data_science_spark.operators.betweenness import betweenness


def _brandes(n, adj):
    bc = [0.0] * n
    for s in range(n):
        sigma = [0.0] * n
        dist = [-1] * n
        delta = [0.0] * n
        preds = [[] for _ in range(n)]
        sigma[s], dist[s] = 1.0, 0
        order = []
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj.get(v, []):
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc


def test_betweenness_path_graph(spark):
    # directed path 0->1->2->3: only inner nodes carry dependency
    g = from_edge_list(spark, [(0, 1), (1, 2), (2, 3)])
    got = {r["internal_id"]: r["score"] for r in betweenness(g).collect()}
    assert got == {0: 0.0, 1: 2.0, 2: 2.0, 3: 0.0}


def test_betweenness_star_undirected(spark):
    g = from_edge_list(
        spark, [(0, i) for i in range(1, 5)], orientation=UNDIRECTED
    )
    got = {r["internal_id"]: r["score"] for r in betweenness(g).collect()}
    # center lies on all 4*3 = 12 ordered peripheral pairs
    assert got[0] == 12.0 and all(got[i] == 0.0 for i in range(1, 5))


def test_betweenness_random_vs_oracle(spark):
    rnd = random.Random(21)
    n = 40
    edges = sorted({(rnd.randrange(n), rnd.randrange(n)) for _ in range(110)})
    edges = [(a, b) for a, b in edges if a != b]
    g = from_edge_list(
        spark,
        [(f"{a:02d}", f"{b:02d}") for a, b in edges],
        node_ids=[f"{i:02d}" for i in range(n)],
    )
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    oracle = _brandes(n, adj)
    got = {r["internal_id"]: r["score"] for r in betweenness(g).collect()}
    for v in range(n):
        assert abs(got[v] - oracle[v]) < 1e-9, v


def test_betweenness_sampled_subset(spark):
    g = from_edge_list(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    got = {r["internal_id"]: r["score"]
           for r in betweenness(g, sources=[0]).collect()}
    # only source 0's dependencies: inner nodes 1,2,3 each on paths to
    # later nodes: delta = 3, 2, 1
    assert got == {0: 0.0, 1: 3.0, 2: 2.0, 3: 1.0, 4: 0.0}
