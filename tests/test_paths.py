"""Dijkstra path output, A*, Yen's K-shortest."""

import itertools
import random

from graph_data_science_spark.graph import from_edge_list
from graph_data_science_spark.operators.paths import (
    astar_path,
    dijkstra_path,
    yens_k_shortest,
)


def _rand_weighted(n, m, seed):
    rnd = random.Random(seed)
    edges = set()
    while len(edges) < m:
        a, b = rnd.randrange(n), rnd.randrange(n)
        if a != b:
            edges.add((a, b))
    return [
        (f"{a:03d}", f"{b:03d}", round(rnd.uniform(0.5, 3.0), 3))
        for a, b in sorted(edges)
    ]


def _local_dijkstra(n, edges, source):
    import heapq

    adj = {}
    for s, d, w in edges:
        adj.setdefault(int(s), []).append((int(d), w))
    dist = {source: 0.0}
    heap = [(0.0, source)]
    while heap:
        du, u = heapq.heappop(heap)
        if du > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, []):
            nd = du + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(heap, (nd, v))
    return dist


def _all_simple_paths(edges, source, target, max_len=6):
    adj = {}
    for s, d, w in edges:
        adj.setdefault(int(s), []).append((int(d), w))

    out = []

    def rec(path, cost):
        u = path[-1]
        if u == target:
            out.append((cost, tuple(path)))
            return
        if len(path) > max_len:
            return
        for v, w in adj.get(u, []):
            if v not in path:
                rec(path + [v], cost + w)

    rec([source], 0.0)
    return sorted(out)


def test_dijkstra_path_costs_and_validity(spark):
    n = 25
    edges = _rand_weighted(n, 70, 7)
    g = from_edge_list(spark, edges, node_ids=[f"{i:03d}" for i in range(n)])
    expect = _local_dijkstra(n, edges, 0)
    eset = {(int(s), int(d)): w for s, d, w in edges}

    rows = dijkstra_path(g, 0).collect()
    got = {r["target_node"]: r for r in rows}
    assert set(got) == set(expect)
    for t, r in got.items():
        assert abs(r["total_cost"] - expect[t]) < 1e-9
        ids, costs = r["node_ids"], r["costs"]
        assert ids[0] == 0 and ids[-1] == t
        assert abs(costs[-1] - r["total_cost"]) < 1e-12
        assert costs[0] == 0.0
        for a, b, ca, cb in zip(ids, ids[1:], costs, costs[1:]):
            assert (a, b) in eset
            assert abs(cb - ca - eset[(a, b)]) < 1e-9


def test_astar_matches_dijkstra(spark):
    n = 25
    edges = _rand_weighted(n, 70, 11)
    g = from_edge_list(spark, edges, node_ids=[f"{i:03d}" for i in range(n)])
    expect = _local_dijkstra(n, edges, 0)
    reachable = sorted(expect)
    target = reachable[-1]
    # admissible heuristic: half the true remaining distance to target
    back = _local_dijkstra(
        n, [(d, s, w) for s, d, w in edges], target
    )
    hdf = spark.createDataFrame(
        [(v, back.get(v, 0.0) / 2.0) for v in range(n)],
        "internal_id long, h double",
    )
    got = astar_path(g, 0, target, hdf).collect()
    assert len(got) == 1
    assert abs(got[0]["total_cost"] - expect[target]) < 1e-9
    ids = got[0]["node_ids"]
    assert ids[0] == 0 and ids[-1] == target


def test_yens_k_shortest(spark):
    # diamond-ish graph with several distinct simple paths
    edges = [
        ("0", "1", 1.0), ("0", "2", 2.0), ("1", "3", 1.0),
        ("2", "3", 1.0), ("1", "2", 0.5), ("0", "3", 5.0),
        ("2", "4", 1.0), ("3", "4", 0.5),
    ]
    g = from_edge_list(spark, edges, node_ids=[str(i) for i in range(5)])
    brute = _all_simple_paths(edges, 0, 4)
    k = 4
    got = yens_k_shortest(g, 0, 4, k).collect()
    got = sorted(got, key=lambda r: r["index"])
    assert len(got) == min(k, len(brute))
    for i, r in enumerate(got):
        assert abs(r["total_cost"] - brute[i][0]) < 1e-9
        # loopless
        assert len(set(r["node_ids"])) == len(r["node_ids"])
    # costs non-decreasing in index
    for a, b in itertools.pairwise(got):
        assert a["total_cost"] <= b["total_cost"] + 1e-12


def test_dijkstra_path_modes_agree(spark):
    """Driver-walk (small explicit targets) and distributed
    pointer-doubling assembly must produce identical paths."""
    n = 25
    edges = _rand_weighted(n, 70, 11)
    g = from_edge_list(spark, edges, node_ids=[f"{i:03d}" for i in range(n)])
    reachable = sorted(
        r["target_node"] for r in dijkstra_path(g, 0).collect()
    )
    targets = reachable[:8]

    def key(rows):
        return sorted(
            (r["target_node"], round(r["total_cost"], 9),
             tuple(r["node_ids"]), tuple(round(c, 9) for c in r["costs"]))
            for r in rows
        )

    via_driver = key(dijkstra_path(g, 0, targets=targets).collect())
    via_dist = key(
        dijkstra_path(
            g, 0, targets=targets, driver_walk_max_targets=0
        ).collect()
    )
    assert via_driver == via_dist
    # index enumerates ascending target id in both modes
    idx = {
        r["target_node"]: r["index"]
        for r in dijkstra_path(
            g, 0, targets=targets, driver_walk_max_targets=0
        ).collect()
    }
    assert [idx[t] for t in sorted(idx)] == list(range(len(idx)))
