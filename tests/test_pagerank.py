"""PageRank tests — ports of the reference golden fixtures
(ref: algo/src/test/java/org/neo4j/graphalgo/pagerank/PageRankTest.java)
plus a numpy power-iteration oracle on a seeded random graph."""

import random

import numpy as np
import pytest

from graph_data_science_spark.graph import from_edge_list
from graph_data_science_spark.operators.pagerank import pagerank

# Wikipedia example graph (PageRankTest.java:57-118)
WIKI_EDGES = [
    ("b", "c"), ("c", "b"), ("d", "a"), ("d", "b"), ("e", "b"), ("e", "d"),
    ("e", "f"), ("f", "b"), ("f", "e"), ("g", "b"), ("g", "e"), ("h", "b"),
    ("h", "e"), ("i", "b"), ("i", "e"), ("j", "e"), ("k", "e"),
]
WIKI_NODES = list("abcdefghijk")

EXPECTED = {
    "a": 0.3040965, "b": 3.5604297, "c": 3.1757906, "d": 0.3625935,
    "e": 0.7503465, "f": 0.3625935, "g": 0.15, "h": 0.15, "i": 0.15,
    "j": 0.15, "k": 0.15,
}
EXPECTED_P1 = {  # sourceNodes = {a, e}
    "a": 0.17053529152163158, "b": 0.3216114449911402, "c": 0.27329311398643763,
    "d": 0.048318333106500536, "e": 0.17053529152163158,
    "f": 0.048318333106500536, "g": 0.0, "h": 0.0, "i": 0.0, "j": 0.0, "k": 0.0,
}
EXPECTED_P2 = {  # sourceNodes = {k, b}
    "a": 0.017454997930076894, "b": 0.813246950528992, "c": 0.690991752640184,
    "d": 0.041070583050331164, "e": 0.1449550029964717,
    "f": 0.041070583050331164, "g": 0.0, "h": 0.0, "i": 0.0, "j": 0.0,
    "k": 0.15000000000000002,
}

WEIGHTED_EDGES = [
    ("b", "c", 1.0), ("c", "b", 1.0), ("d", "a", 0.2), ("d", "b", 0.8),
    ("e", "b", 0.10), ("e", "d", 0.70), ("e", "f", 0.20), ("f", "b", 0.7),
    ("f", "e", 0.3), ("g", "b", 0.01), ("g", "e", 0.99), ("h", "b", 0.5),
    ("h", "e", 0.5), ("i", "b", 0.5), ("i", "e", 0.5), ("j", "e", 1.0),
    ("k", "e", 1.0),
]
EXPECTED_WEIGHTED = {
    "a": 0.24919, "b": 3.69822, "c": 3.29307, "d": 0.58349, "e": 0.72855,
    "f": 0.27385, "g": 0.15, "h": 0.15, "i": 0.15, "j": 0.15, "k": 0.15,
}


def scores_by_name(graph, outcome):
    v = {r["internal_id"]: r["original_id"] for r in graph.vertices.collect()}
    return {v[r["internal_id"]]: r["score"] for r in outcome.scores.collect()}


@pytest.fixture(scope="module")
def wiki(spark):
    return from_edge_list(spark, WIKI_EDGES, node_ids=WIKI_NODES)


def test_wiki_graph(spark, wiki):
    out = pagerank(wiki, tolerance=0.0, max_iterations=41)
    got = scores_by_name(wiki, out)
    for n, exp in EXPECTED.items():
        assert got[n] == pytest.approx(exp, abs=1e-5), n


@pytest.mark.parametrize(
    "sources,expected", [(["a", "e"], EXPECTED_P1), (["k", "b"], EXPECTED_P2)]
)
def test_personalized(spark, wiki, sources, expected):
    out = pagerank(wiki, tolerance=0.0, max_iterations=41, source_nodes=sources)
    got = scores_by_name(wiki, out)
    for n, exp in expected.items():
        assert got[n] == pytest.approx(exp, abs=1e-5), n


def test_weighted(spark):
    g = from_edge_list(spark, WEIGHTED_EDGES, node_ids=WIKI_NODES)
    out = pagerank(g, tolerance=0.0, max_iterations=41, weighted=True)
    got = scores_by_name(g, out)
    for n, exp in EXPECTED_WEIGHTED.items():
        assert got[n] == pytest.approx(exp, abs=1e-5), n


def test_zero_weights_send_nothing(spark):
    g = from_edge_list(
        spark, [(s, d, 0.0) for s, d, *_ in WEIGHTED_EDGES], node_ids=WIKI_NODES
    )
    out = pagerank(g, tolerance=0.0, max_iterations=5, weighted=True)
    got = scores_by_name(g, out)
    assert all(v == pytest.approx(0.15) for v in got.values())


def test_tolerance_iteration_pins(spark, wiki):
    # ref: PageRankTest.java:120-133
    out = pagerank(wiki, tolerance=0.5, max_iterations=41)
    assert out.ran_iterations == 2 and out.converged
    out = pagerank(wiki, tolerance=0.1, max_iterations=41)
    assert out.ran_iterations == 13 and out.converged


def numpy_pagerank(n, edges, damping=0.85, iters=60):
    """Dense oracle replicating the GDS delta-push recurrence exactly."""
    out_deg = np.zeros(n)
    for s, d in edges:
        out_deg[s] += 1
    rank = np.full(n, 1 - damping)
    delta = rank.copy()
    A = np.zeros((n, n))
    for s, d in edges:
        A[d, s] += 1.0
    for _ in range(iters - 1):
        send = np.where(out_deg > 0, delta / np.maximum(out_deg, 1), 0.0)
        msg = A @ send
        delta = damping * msg
        rank = rank + delta
    return rank


def test_random_graph_vs_numpy(spark):
    rng = random.Random(7)
    n = 120
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(500)})
    edges = [(s, d) for s, d in edges if s != d]
    g = from_edge_list(
        spark,
        [(f"{s:03d}", f"{d:03d}") for s, d in edges],
        node_ids=[f"{i:03d}" for i in range(n)],
    )
    out = pagerank(g, tolerance=0.0, max_iterations=60)
    got = {r["internal_id"]: r["score"] for r in out.scores.collect()}
    exp = numpy_pagerank(n, edges, iters=60)
    for i in range(n):
        assert got[i] == pytest.approx(exp[i], abs=1e-6), i


def test_l1_convergence_mode(spark, wiki):
    # the 41-iteration fixture is NOT the converged limit; compare the
    # L1-converged result against a long numpy run of the same recurrence
    out = pagerank(wiki, tolerance=0.0, max_iterations=200, l1_tolerance=1e-6)
    assert out.converged
    name_to_id = {r["original_id"]: r["internal_id"] for r in wiki.vertices.collect()}
    edges = [(name_to_id[s], name_to_id[d]) for s, d in WIKI_EDGES]
    exp = numpy_pagerank(len(WIKI_NODES), edges, iters=300)
    got = {r["internal_id"]: r["score"] for r in out.scores.collect()}
    for name, i in name_to_id.items():
        assert got[i] == pytest.approx(exp[i], abs=1e-5), name
