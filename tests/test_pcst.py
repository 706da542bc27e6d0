"""Prize-collecting Steiner tree: exact rooted optimum on trees (brute
force cross-check), net-worth floors on general graphs, forest validity,
partition invariance."""

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.graph import Graph, UNDIRECTED, from_edge_df
from graph_data_science_spark.operators.pcst import prize_steiner_tree


def _graph(spark, edges, prizes, parts=None):
    e = spark.createDataFrame(
        [(a, b, float(w)) for a, b, w in edges],
        "src long, dst long, weight double",
    )
    if parts:
        e = e.repartition(parts)
    g = from_edge_df(e, weight="weight", orientation=UNDIRECTED)
    p = spark.createDataFrame(
        [(v, float(pz)) for v, pz in prizes.items()],
        "internal_id long, prize double",
    )
    g.vertices = g.vertices.join(p, "internal_id", "left").fillna(
        {"prize": 0.0}
    )
    return g


def _net_worth(out_rows, prizes):
    return sum(prizes.get(r.internal_id, 0.0) for r in out_rows) - sum(
        r.weight for r in out_rows
    )


def _brute_rooted_optimum(edges, prizes, root):
    """Best net worth over connected subtrees containing root (edges of
    the subtree = tree edges induced on the vertex subset)."""
    verts = sorted(prizes)
    adj = {v: [] for v in verts}
    wmap = {}
    for a, b, w in edges:
        adj[a].append(b)
        adj[b].append(a)
        wmap[frozenset((a, b))] = w
    best = -np.inf
    others = [v for v in verts if v != root]
    for r in range(len(others) + 1):
        for combo in itertools.combinations(others, r):
            sub = set(combo) | {root}
            sub_edges = [
                fs for fs in wmap if fs <= sub
            ]
            # connected + acyclic on a tree input iff |E| = |V| - 1 and
            # connected; check connectivity by BFS
            seen = {root}
            stack = [root]
            while stack:
                u = stack.pop()
                for nb in adj[u]:
                    if nb in sub and nb not in seen and frozenset(
                        (u, nb)
                    ) in sub_edges:
                        seen.add(nb)
                        stack.append(nb)
            if seen != sub:
                continue
            nw = sum(prizes[v] for v in sub) - sum(
                wmap[fs] for fs in sub_edges
            )
            best = max(best, nw)
    return best


def test_rooted_exact_on_random_trees(spark):
    rng = np.random.default_rng(11)
    for trial in range(4):
        n = int(rng.integers(5, 11))
        # random tree: node i attaches to a random earlier node
        edges = [
            (int(rng.integers(0, i)), i, int(rng.integers(1, 9)))
            for i in range(1, n)
        ]
        prizes = {v: int(rng.integers(0, 10)) for v in range(n)}
        g = _graph(spark, edges, prizes)
        out = prize_steiner_tree(g, root=0).collect()
        got = _net_worth(out, prizes)
        want = _brute_rooted_optimum(edges, prizes, 0)
        assert got == pytest.approx(want), (trial, edges, prizes)
        # root always present, exactly one self-row
        roots = [r for r in out if r.internal_id == r.parent]
        assert [r.internal_id for r in roots] == [0]


def test_unrooted_beats_trivial_solutions(spark):
    rng = np.random.default_rng(23)
    n = 40
    edges = []
    for i in range(1, n):
        edges.append((int(rng.integers(0, i)), i, int(rng.integers(1, 20))))
    for _ in range(30):  # extra non-tree edges -> real MSF step
        a, b = rng.integers(0, n, 2)
        if a != b:
            edges.append((int(a), int(b), int(rng.integers(1, 20))))
    prizes = {v: int(rng.integers(0, 12)) for v in range(n)}
    g = _graph(spark, edges, prizes)
    metrics = {}
    out = prize_steiner_tree(g, metrics_out=metrics).collect()
    nw = _net_worth(out, prizes)
    assert nw >= max(prizes.values())  # at least the best single vertex
    assert metrics["sumOfPrizes"] - metrics["totalWeight"] == pytest.approx(
        nw
    )
    # forest validity: every non-root's parent is in the output, and its
    # (parent, v) edge exists in the graph with the emitted weight
    kept = {r.internal_id for r in out}
    emap = {}
    for a, b, w in edges:
        key = frozenset((a, b))
        emap[key] = min(emap.get(key, np.inf), w)
    for r in out:
        assert r.parent in kept
        if r.internal_id != r.parent:
            assert emap[frozenset((r.internal_id, r.parent))] <= r.weight
            assert r.weight > 0


def test_worthless_graph_yields_empty_unrooted(spark):
    # all prizes zero: nothing is worth keeping (empty solution)
    edges = [(0, 1, 3), (1, 2, 4)]
    g = _graph(spark, edges, {0: 0, 1: 0, 2: 0})
    out = prize_steiner_tree(g).collect()
    assert out == []


def test_partition_invariance(spark):
    rng = np.random.default_rng(7)
    n = 30
    edges = [
        (int(rng.integers(0, i)), i, int(rng.integers(1, 9)))
        for i in range(1, n)
    ]
    prizes = {v: int(rng.integers(0, 9)) for v in range(n)}
    a = prize_steiner_tree(_graph(spark, edges, prizes, parts=2), root=0)
    b = prize_steiner_tree(_graph(spark, edges, prizes, parts=17), root=0)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb
