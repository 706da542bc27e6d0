"""HyperANF neighborhood function vs exact BFS ball sizes."""

from collections import deque

import numpy as np

from graph_data_science_spark.graph import from_edge_list
from graph_data_science_spark.operators.hyperanf import (
    effective_diameter,
    neighborhood_function,
)


def _exact_nf(edges, nodes):
    adj = {v: set() for v in nodes}
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    dist_counts = {}
    for s in nodes:
        seen = {s: 0}
        dq = deque([s])
        while dq:
            v = dq.popleft()
            for u in adj[v]:
                if u not in seen:
                    seen[u] = seen[v] + 1
                    dq.append(u)
        for d in seen.values():
            dist_counts[d] = dist_counts.get(d, 0) + 1
    # N(t) = # ordered pairs (incl. self) within distance <= t
    out, acc = [], 0
    for t in sorted(dist_counts):
        acc += dist_counts[t]
        out.append((t, acc))
    return out


def test_neighborhood_function_tracks_exact(spark):
    rng = np.random.default_rng(3)
    n = 80
    edges = sorted(
        {
            (int(a), int(b))
            for a, b in rng.integers(0, n, size=(160, 2))
            if a != b
        }
    )
    nodes = sorted({v for e in edges for v in e})
    g = from_edge_list(spark, [(str(a), str(b)) for a, b in edges])
    m = {}
    nf = neighborhood_function(g, metrics_out=m)
    exact = dict(_exact_nf(edges, nodes))
    max_exact_t = max(exact)
    # converged within the exact diameter
    assert m["rounds"] <= max_exact_t + 1
    # estimates track the exact ball sizes within HLL error (m=64
    # registers, rsd 13%; sums over ~80 nodes tighten it — allow 20%)
    for t, est in nf:
        ex = exact.get(min(t, max_exact_t))
        assert abs(est - ex) / ex < 0.2, (t, est, ex)
    # monotone non-decreasing
    vals = [v for _, v in nf]
    assert all(b >= a * (1 - 1e-9) for a, b in zip(vals, vals[1:]))


def test_effective_diameter_two_cliques_bridge(spark):
    # two K8 cliques joined by a 6-node path: diameter dominated by the
    # path; q=1.0 effective diameter == exact diameter
    edges = []
    for base in (0, 20):
        edges += [
            (base + a, base + b) for a in range(8) for b in range(a + 1, 8)
        ]
    path = [7, 40, 41, 42, 43, 20]
    edges += list(zip(path, path[1:]))
    g = from_edge_list(spark, [(str(a), str(b)) for a, b in edges])
    r = effective_diameter(g, q=1.0)
    # exact diameter: clique node -> path (5 hops) -> far clique node = 7
    assert 6 <= r["effective_diameter"] <= 8
    # one extra round detects register stability; q=1.0 lands on the
    # true diameter, strictly before that stability round
    assert r["effective_diameter"] <= r["neighborhood_function"][-1][0]
