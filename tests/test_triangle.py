"""Triangle zoo from the reference test suite (FIXTURES.md §3.4) + dense
numpy trace(A^3)/6 oracle on a random graph."""

import random

import numpy as np

from graph_data_science_spark.graph import UNDIRECTED, from_edge_list
from graph_data_science_spark.operators.triangle import (
    average_clustering_coefficient,
    local_clustering_coefficient,
    triangle_count,
    triangles_stream,
)


def _graph(spark, edges, node_ids=None):
    return from_edge_list(
        spark, edges, orientation=UNDIRECTED, node_ids=node_ids
    )


def _per_node(spark, edges, node_ids=None, **kw):
    res = triangle_count(_graph(spark, edges, node_ids), **kw)
    return (
        {r["internal_id"]: r["triangles"] for r in res.per_node.collect()},
        res.global_count,
    )


def test_path_has_no_triangles(spark):
    per, total = _per_node(spark, [(0, 1), (1, 2)])
    assert total == 0 and set(per.values()) == {0}


def test_single_triangle_plus_isolate(spark):
    per, total = _per_node(spark, [(0, 1), (1, 2), (2, 0)], node_ids=[3])
    assert total == 1
    assert per == {0: 1, 1: 1, 2: 1, 3: 0}


def test_k5(spark):
    edges = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    per, total = _per_node(spark, edges)
    assert total == 10  # C(5,3)
    assert set(per.values()) == {6}  # C(4,2) per node


def test_two_triangles_sharing_hub(spark):
    per, total = _per_node(
        spark, [(0, 1), (1, 2), (2, 0), (0, 3), (3, 4), (4, 0)]
    )
    assert total == 2
    assert per[0] == 2 and per[1] == per[2] == per[3] == per[4] == 1


def test_self_loops_and_parallel_edges_ignored(spark):
    per, total = _per_node(
        spark, [(0, 0), (0, 1), (0, 1), (1, 2), (2, 0), (1, 1)]
    )
    assert total == 1
    assert per == {0: 1, 1: 1, 2: 1}


def test_max_degree_exclusion(spark):
    # hub 0 in both triangles; maxDegree=2 excludes it -> no triangles remain
    per, total = _per_node(
        spark,
        [(0, 1), (1, 2), (2, 0), (0, 3), (3, 4), (4, 0)],
        max_degree=2,
    )
    assert per[0] == -1
    assert total == 0


def test_triangles_stream_rows(spark):
    rows = triangles_stream(
        _graph(spark, [(0, 1), (1, 2), (2, 0), (0, 3), (3, 4), (4, 0)])
    ).collect()
    got = {(r["node_a"], r["node_b"], r["node_c"]) for r in rows}
    assert got == {(0, 1, 2), (0, 3, 4)}


def test_random_graph_vs_numpy_trace(spark):
    rnd = random.Random(13)
    n = 60
    edges = list({(rnd.randrange(n), rnd.randrange(n)) for _ in range(300)})
    edges = [(a, b) for a, b in edges if a != b]
    g = from_edge_list(
        spark,
        [(f"{a:03d}", f"{b:03d}") for a, b in edges],
        orientation=UNDIRECTED,
        node_ids=[f"{i:03d}" for i in range(n)],
    )
    A = np.zeros((n, n))
    for a, b in edges:
        A[a, b] = A[b, a] = 1.0
    res = triangle_count(g)
    per = {r["internal_id"]: r["triangles"] for r in res.per_node.collect()}
    total = res.global_count
    assert total == int(round(np.trace(A @ A @ A) / 6))
    diag = np.diag(A @ A @ A) / 2
    for v in range(n):
        assert per[v] == int(round(diag[v]))
    # LCC cross-check
    lcc = {
        r["internal_id"]: r["coefficient"]
        for r in local_clustering_coefficient(g).collect()
    }
    deg = A.sum(axis=1)
    for v in range(n):
        expect = 0.0 if deg[v] < 2 else 2.0 * diag[v] / (deg[v] * (deg[v] - 1))
        assert abs(lcc[v] - expect) < 1e-12
    avg = average_clustering_coefficient(local_clustering_coefficient(g))
    assert abs(avg - np.mean([
        0.0 if deg[v] < 2 else 2.0 * diag[v] / (deg[v] * (deg[v] - 1))
        for v in range(n)
    ])) < 1e-12


def test_probe_vs_join_strategies_agree(spark, monkeypatch):
    """The block-probe kernel and the wedge-join plan are alternate
    physical strategies for the same operator — per-node counts must be
    identical on a random graph (incl. isolated vertices + hubs)."""
    rng = random.Random(7)
    n = 120
    edges = {(rng.randrange(n), rng.randrange(n)) for _ in range(900)}
    edges = [(a, b) for a, b in edges if a != b]
    g = _graph(spark, edges, node_ids=range(n))

    monkeypatch.setenv("GDS_TRI_STRATEGY", "probe")
    probe = {
        r["internal_id"]: r["triangles"]
        for r in triangle_count(g).per_node.collect()
    }
    monkeypatch.setenv("GDS_TRI_STRATEGY", "join")
    join = {
        r["internal_id"]: r["triangles"]
        for r in triangle_count(g).per_node.collect()
    }
    assert probe == join
    assert sum(probe.values()) % 3 == 0 and sum(probe.values()) > 0


def test_dense_vs_join_strategies_agree(spark, monkeypatch):
    """The blocked-GEMM kernel is a third physical strategy (gated on
    small dense graphs): per-node counts must match the wedge-join plan
    on a dense random graph with isolated vertices, and on K_12 where
    every wedge closes."""
    rng = random.Random(11)
    n = 80
    edges = {(rng.randrange(n), rng.randrange(n)) for _ in range(1400)}
    edges = [(a, b) for a, b in edges if a != b]
    # 5 isolated vertices beyond any edge endpoint
    g = _graph(spark, edges, node_ids=range(n + 5))

    monkeypatch.setenv("GDS_TRI_STRATEGY", "dense")
    dense = {
        r["internal_id"]: r["triangles"]
        for r in triangle_count(g).per_node.collect()
    }
    monkeypatch.setenv("GDS_TRI_STRATEGY", "join")
    join = {
        r["internal_id"]: r["triangles"]
        for r in triangle_count(g).per_node.collect()
    }
    assert dense == join
    assert sum(dense.values()) > 0

    k = 12
    gk = _graph(spark, [(i, j) for i in range(k) for j in range(i + 1, k)])
    monkeypatch.setenv("GDS_TRI_STRATEGY", "dense")
    res = triangle_count(gk)
    assert res.global_count == k * (k - 1) * (k - 2) // 6
    per = {r["internal_id"]: r["triangles"] for r in res.per_node.collect()}
    assert set(per.values()) == {(k - 1) * (k - 2) // 2}


def test_dense_gate_and_max_degree(spark, monkeypatch):
    """auto picks dense only for small dense graphs; max_degree exclusion
    flows through the dense path (excluded hubs report -1 and their
    triangles vanish)."""
    from graph_data_science_spark.plans.tridense import dense_applicable

    assert dense_applicable(1000, 499500)          # K_1000
    assert not dense_applicable(1000, 3000)        # sparse
    assert not dense_applicable(10_000_000, 10**9)  # too many vertices

    k = 10
    edges = [(i, j) for i in range(k) for j in range(i + 1, k)]
    monkeypatch.setenv("GDS_TRI_STRATEGY", "dense")
    per, _ = _per_node(spark, edges, max_degree=k - 2)
    # every vertex of K_10 has degree 9 > 8: all excluded
    assert set(per.values()) == {-1}

    # hub + pendant triangle mix: hub excluded, triangle intact
    # (single-digit ids: internal ids follow the string sort of originals)
    edges = [(0, i) for i in range(1, 7)] + [(1, 2), (7, 8), (8, 9), (7, 9)]
    per, total = _per_node(spark, edges, node_ids=range(10), max_degree=5)
    assert per[0] == -1
    assert per[7] == per[8] == per[9] == 1
    assert total == 1


def test_triangle_count_approx_doulion(spark):
    import numpy as np

    from graph_data_science_spark.graph import from_edge_list
    from graph_data_science_spark.operators.triangle import (
        triangle_count,
        triangle_count_approx,
    )

    # dense-ish random graph with many triangles so the estimator's
    # 1/(p*sqrt(T)) error bound is tight
    rng = np.random.default_rng(5)
    n = 120
    edges = sorted(
        {
            (int(a), int(b))
            for a, b in rng.integers(0, n, size=(2400, 2))
            if a != b
        }
    )
    g = from_edge_list(spark, [(str(a), str(b)) for a, b in edges])
    exact = triangle_count(g).global_count
    assert exact > 500
    r = triangle_count_approx(g, p=0.5, seed=3)
    # p=0.5: rel error bound ~ 1/(0.5*sqrt(T)) ~ 6%; allow 25%
    assert abs(r["estimate"] - exact) / exact < 0.25
    assert 0 < r["sampled_edges"] < len(edges)
    # deterministic replay
    r2 = triangle_count_approx(g, p=0.5, seed=3)
    assert r2["estimate"] == r["estimate"]
    # p=1 degenerates to the exact count
    assert triangle_count_approx(g, p=1.0)["estimate"] == exact
