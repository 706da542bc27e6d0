"""K-core decomposition vs an independent sequential-peeling reference."""

import numpy as np
import pytest

from graph_data_science_spark.graph import from_edge_list
from graph_data_science_spark.operators.kcore import k_core


def _peel_reference(edges):
    """Textbook sequential min-degree peeling (Batagelj-Zaversnik)."""
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    core = {}
    alive = set(adj)
    k = 0
    while alive:
        v = min(alive, key=lambda x: (deg[x], x))
        k = max(k, deg[v])
        core[v] = k
        alive.discard(v)
        for u in adj[v]:
            if u in alive:
                deg[u] -= 1
    return core


def _run(spark, edges, extra_nodes=()):
    g = from_edge_list(spark, [(str(a), str(b)) for a, b in edges])
    out = k_core(g)
    id_map = {
        r["original_id"]: r["internal_id"] for r in g.vertices.collect()
    }
    cores = {r.internal_id: r.core for r in out.collect()}
    return {
        orig: cores[iid] for orig, iid in id_map.items()
    }


def test_kcore_known_structures(spark):
    # K5 (core 4) + a tail path (core 1) + a 4-cycle (core 2)
    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    tail = [(4, 10), (10, 11)]
    cyc = [(20, 21), (21, 22), (22, 23), (23, 20)]
    got = _run(spark, k5 + tail + cyc)
    ref = _peel_reference(k5 + tail + cyc)
    assert got == {str(k): v for k, v in ref.items()}
    assert got["0"] == 4 and got["11"] == 1 and got["20"] == 2


def test_kcore_random_matches_peeling(spark):
    rng = np.random.default_rng(17)
    n = 60
    edges = {
        (int(a), int(b))
        for a, b in rng.integers(0, n, size=(240, 2))
        if a != b
    }
    got = _run(spark, sorted(edges))
    ref = _peel_reference(sorted(edges))
    assert got == {str(k): v for k, v in ref.items()}


def test_kcore_raises_without_fixpoint(spark):
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    with pytest.raises(RuntimeError):
        k_core(from_edge_list(spark, [(str(a), str(b)) for a, b in k4]),
               max_iterations=0)
