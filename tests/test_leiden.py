"""Leiden: connected-communities guarantee, refinement, determinism."""

from pyspark.sql import functions as F

from graph_data_science_spark.graph import Graph, from_edge_list
from graph_data_science_spark.operators.leiden import (
    _refine_connected,
    leiden,
)
from graph_data_science_spark.operators.louvain import _sym_edges


def _two_cliques_bridge(spark):
    """Two 4-cliques joined by one bridge edge."""
    edges = []
    for base in (0, 10):
        ids = [base + i for i in range(4)]
        edges += [(str(a), str(b)) for a in ids for b in ids if a < b]
    edges.append(("3", "10"))
    return from_edge_list(spark, edges)


def _connected(nodes, edges):
    """BFS connectivity over an undirected edge set."""
    nodes = set(nodes)
    if len(nodes) <= 1:
        return True
    adj = {}
    for a, b in edges:
        if a in nodes and b in nodes:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    seen, stack = set(), [next(iter(nodes))]
    while stack:
        v = stack.pop()
        if v in seen:
            continue
        seen.add(v)
        stack.extend(adj.get(v, ()))
    return seen == nodes


def test_refine_splits_disconnected_community(spark):
    g = from_edge_list(
        spark, [("0", "1"), ("2", "3")]
    )  # two disjoint pairs
    # force everything into ONE community
    bad = g.vertices.select(
        "internal_id", F.lit(0).cast("long").alias("community")
    )
    refined = _refine_connected(
        g.vertices.select(
            "internal_id", F.col("internal_id").alias("original_id")
        ),
        _sym_edges(g),
        bad,
    )
    groups = {}
    for r in refined.collect():
        groups.setdefault(r.refined, set()).add(r.internal_id)
    assert len(groups) == 2
    assert {frozenset(s) for s in groups.values()} == {
        frozenset({0, 1}),
        frozenset({2, 3}),
    }


def test_leiden_two_cliques(spark):
    g = _two_cliques_bridge(spark)
    res = leiden(g)
    assign = {r.internal_id: r.community for r in res.assignment.collect()}
    assert len(assign) == 8  # totality
    # the two cliques end up in (at least) two communities, each connected
    edges = [(e.src, e.dst) for e in g.edges.collect()]
    comms = {}
    for node, c in assign.items():
        comms.setdefault(c, set()).add(node)
    assert len(comms) >= 2
    for members in comms.values():
        assert _connected(members, edges)
    assert res.modularity > 0.3


def test_leiden_deterministic(spark):
    g = _two_cliques_bridge(spark)
    a1 = sorted(
        (r.internal_id, r.community) for r in leiden(g).assignment.collect()
    )
    a2 = sorted(
        (r.internal_id, r.community) for r in leiden(g).assignment.collect()
    )
    assert a1 == a2


def test_leiden_gamma_resolution(spark):
    # high gamma favors smaller communities: with gamma large, the two
    # cliques must NOT merge into one community
    g = _two_cliques_bridge(spark)
    res = leiden(g, gamma=2.0)
    n_comm = res.assignment.select("community").distinct().count()
    assert n_comm >= 2
