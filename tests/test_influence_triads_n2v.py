"""Influence maximization (CELF/greedy), balanced triads, Node2Vec."""

import itertools
import random

from pyspark.sql import functions as F

from graph_data_science_spark.graph import from_edge_list
from graph_data_science_spark.operators.influence import (
    _live_mask_col,
    influence_maximization,
)
from graph_data_science_spark.operators.triangle import balanced_triads


def _rand_digraph(n, m, seed):
    rnd = random.Random(seed)
    edges = set()
    while len(edges) < m:
        a, b = rnd.randrange(n), rnd.randrange(n)
        if a != b:
            edges.add((a, b))
    return [(f"{a:03d}", f"{b:03d}", 1.0) for a, b in sorted(edges)]


def _python_greedy(live_edges_by_sim, n, k, mc):
    """Exact greedy over the sampled cascades (what CELF must reproduce)."""
    reach = {}  # (cand) -> list[frozenset] per sim
    for c in range(n):
        per_sim = []
        for r in range(mc):
            seen = {c}
            stack = [c]
            adj = live_edges_by_sim[r]
            while stack:
                u = stack.pop()
                for v in adj.get(u, ()):
                    if v not in seen:
                        seen.add(v)
                        stack.append(v)
            per_sim.append(frozenset(seen))
        reach[c] = per_sim
    chosen, gains = [], []
    covered = [set() for _ in range(mc)]
    for _ in range(k):
        best, best_gain = None, -1.0
        for c in range(n):
            if c in chosen:
                continue
            g = sum(len(reach[c][r] - covered[r]) for r in range(mc)) / mc
            # tie-break: smaller id (matches the heap ordering)
            if g > best_gain + 1e-12:
                best, best_gain = c, g
        chosen.append(best)
        gains.append(best_gain)
        for r in range(mc):
            covered[r] |= reach[best][r]
    return chosen, gains


def test_influence_matches_exact_greedy_over_sampled_cascades(spark):
    n, mc, k = 20, 16, 3
    edges = _rand_digraph(n, 60, 5)
    g = from_edge_list(spark, edges, node_ids=[f"{i:03d}" for i in range(n)])
    p, seed = 0.4, 42
    # collect the engine's own deterministic live-edge masks, then verify
    # seed selection against an exact python greedy over those cascades
    live = (
        g.edges.select("src", "dst")
        .withColumn("live", _live_mask_col(p, mc, seed))
        .collect()
    )
    live_by_sim = [dict() for _ in range(mc)]
    for r_ in live:
        for r in range(mc):
            if (r_["live"] >> r) & 1:
                live_by_sim[r].setdefault(int(r_["src"]), []).append(
                    int(r_["dst"])
                )
    want_seeds, want_gains = _python_greedy(live_by_sim, n, k, mc)

    for use_celf in (True, False):
        res = influence_maximization(
            g, k, propagation_probability=p,
            monte_carlo_simulations=mc, seed=seed, use_celf=use_celf,
        )
        assert res.seeds == want_seeds, (use_celf, res.seeds, want_seeds)
        for a, b in zip(res.gains, want_gains):
            assert abs(a - b) < 1e-9


def test_balanced_triads(spark):
    # signed K4: edges with mixed signs
    edges = [
        ("0", "1", 1.0), ("0", "2", -1.0), ("0", "3", 1.0),
        ("1", "2", -1.0), ("1", "3", -1.0), ("2", "3", 1.0),
    ]
    g = from_edge_list(spark, edges, node_ids=["0", "1", "2", "3"])
    sign = {}
    for a, b, w in edges:
        sign[(int(a), int(b))] = w >= 0
    bal = {i: 0 for i in range(4)}
    unbal = {i: 0 for i in range(4)}
    for x, y, z in itertools.combinations(range(4), 3):
        s = [sign[(x, y)], sign[(x, z)], sign[(y, z)]]
        neg = sum(1 for v in s if not v)
        ok = neg % 2 == 0
        for v in (x, y, z):
            (bal if ok else unbal)[v] += 1
    got = {
        r["internal_id"]: (r["balanced"], r["unbalanced"])
        for r in balanced_triads(g).collect()
    }
    for v in range(4):
        assert got[v] == (bal[v], unbal[v]), (v, got[v], bal[v], unbal[v])


def test_node2vec_trains_embeddings(spark):
    from graph_data_science_spark.operators.mlops import node2vec

    n = 12
    edges = _rand_digraph(n, 40, 3)
    g = from_edge_list(spark, edges, node_ids=[f"{i:03d}" for i in range(n)])
    emb = node2vec(
        g, embedding_dimension=8, walks_per_node=4, walk_length=6,
        iterations=1, seed=7,
    ).collect()
    assert len(emb) == n
    for r in emb:
        assert len(r["embedding"]) == 8
        assert all(abs(x) < 100 for x in r["embedding"])
