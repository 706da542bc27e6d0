"""SCC vs python Tarjan oracle, random generator, FastRP, Louvain."""

import random

import numpy as np
from pyspark.sql import functions as F

from graph_data_science_spark.graph import Graph, from_edge_list
from graph_data_science_spark.operators.fastrp import fastrp
from graph_data_science_spark.operators.louvain import (
    louvain,
    modularity,
    modularity_optimization,
    _sym_edges,
)
from graph_data_science_spark.operators.scc import scc
from graph_data_science_spark.sources.generator import generate_graph


def _tarjan(n, edges):
    import sys

    sys.setrecursionlimit(100000)
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    index = {}
    low = {}
    on = set()
    stack = []
    out = {}
    counter = [0]

    def strong(v):
        work = [(v, 0)]
        while work:
            node, pi = work[-1]
            if pi == 0:
                index[node] = low[node] = counter[0]
                counter[0] += 1
                stack.append(node)
                on.add(node)
            recurse = False
            for i in range(pi, len(adj.get(node, []))):
                w = adj[node][i]
                if w not in index:
                    work[-1] = (node, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on:
                    low[node] = min(low[node], index[w])
            if recurse:
                continue
            if low[node] == index[node]:
                comp = []
                while True:
                    w = stack.pop()
                    on.discard(w)
                    comp.append(w)
                    if w == node:
                        break
                for w in comp:
                    out[w] = frozenset(comp)
            work.pop()
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[node])

    for v in range(n):
        if v not in index:
            strong(v)
    return out


def test_scc_two_cycles_and_tail(spark):
    # cycle {0,1,2}, cycle {3,4}, tail 5 -> 0
    g = from_edge_list(
        spark, [(0, 1), (1, 2), (2, 0), (3, 4), (4, 3), (5, 0)]
    )
    got = {r["internal_id"]: r["component"] for r in scc(g).collect()}
    assert got[0] == got[1] == got[2]
    assert got[3] == got[4]
    assert got[5] not in (got[0], got[3])
    assert len(got) == 6


def test_scc_random_vs_tarjan(spark):
    rnd = random.Random(11)
    n = 50
    edges = sorted({(rnd.randrange(n), rnd.randrange(n)) for _ in range(150)})
    edges = [(a, b) for a, b in edges if a != b]
    g = from_edge_list(
        spark,
        [(f"{a:03d}", f"{b:03d}") for a, b in edges],
        node_ids=[f"{i:03d}" for i in range(n)],
    )
    got = {r["internal_id"]: r["component"] for r in scc(g).collect()}
    oracle = _tarjan(n, edges)
    assert len(got) == n
    # same partition structure
    for a in range(n):
        for b in range(a + 1, n):
            assert (got[a] == got[b]) == (oracle[a] == oracle[b]), (a, b)


def test_generator_deterministic_and_shaped(spark):
    g1 = generate_graph(spark, 200, 4, distribution="UNIFORM", seed=7)
    g2 = generate_graph(
        spark, 200, 4, distribution="UNIFORM", seed=7, num_partitions=5
    )
    e1 = sorted(map(tuple, g1.edges.collect()))
    e2 = sorted(map(tuple, g2.edges.collect()))
    assert e1 == e2  # partitioning-independent determinism
    assert len(e1) == 800  # uniform: exactly n*avg_degree
    gp = generate_graph(spark, 200, 4, distribution="POWER_LAW", seed=7)
    degs = (
        gp.edges.groupBy("src").count().agg(F.max("count")).collect()[0][0]
    )
    assert degs > 8  # heavy tail exists


def test_fastrp_properties(spark):
    # two cliques loosely bridged: embeddings inside a clique should be
    # closer than across
    edges = [(a, b) for a in range(5) for b in range(5) if a != b]
    edges += [(a, b) for a in range(5, 10) for b in range(5, 10) if a != b]
    edges += [(0, 5)]
    g = from_edge_list(spark, edges)
    emb = {
        r["internal_id"]: np.array(r["embedding"])
        for r in fastrp(g, embedding_dim=32, seed=3).collect()
    }
    assert len(emb) == 10 and all(len(v) == 32 for v in emb.values())

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return float(a @ b / (na * nb)) if na and nb else 0.0

    within = np.mean([cos(emb[1], emb[b]) for b in (2, 3, 4)])
    across = np.mean([cos(emb[1], emb[b]) for b in (6, 7, 8)])
    assert within > across
    # determinism
    emb2 = {
        r["internal_id"]: np.array(r["embedding"])
        for r in fastrp(g, embedding_dim=32, seed=3).collect()
    }
    for k in emb:
        assert np.allclose(emb[k], emb2[k])


def test_louvain_two_cliques(spark):
    edges = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    edges += [(a, b) for a in range(6, 12) for b in range(a + 1, 12)]
    edges += [(0, 6)]
    g = from_edge_list(
        spark, [(f"{a:02d}", f"{b:02d}") for a, b in edges]
    )
    res = louvain(g)
    comm = {r["internal_id"]: r["community"] for r in res.assignment.collect()}
    assert len({comm[v] for v in range(6)}) == 1
    assert len({comm[v] for v in range(6, 12)}) == 1
    assert comm[0] != comm[6]
    assert res.modularity > 0.3


def test_modularity_optimization_monotone(spark):
    rnd = random.Random(5)
    edges = sorted({(rnd.randrange(30), rnd.randrange(30)) for _ in range(90)})
    edges = [(a, b) for a, b in edges if a != b]
    g = from_edge_list(
        spark,
        [(f"{a:02d}", f"{b:02d}") for a, b in edges],
        node_ids=[f"{i:02d}" for i in range(30)],
    )
    res = modularity_optimization(g, max_iterations=8)
    sym = _sym_edges(g)
    init = g.vertices.select(
        "internal_id", F.col("internal_id").alias("community")
    )
    assert res.modularity >= modularity(sym, init) - 1e-12
