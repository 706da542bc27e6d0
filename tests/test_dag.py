"""DAG operators: topological sort, longest path, Bellman-Ford,
conductance."""

import math

import pytest

from graph_data_science_spark.graph import from_edge_list
from graph_data_science_spark.operators.conductance import conductance
from graph_data_science_spark.operators.dag import (
    NegativeCycleError,
    bellman_ford,
    dag_longest_path,
    topological_sort,
)


def _ids(g):
    return {r["original_id"]: r["internal_id"] for r in g.vertices.collect()}


def _by_orig(g, df, col):
    m = {v: k for k, v in _ids(g).items()}
    return {m[r["internal_id"]]: r[col] for r in df.collect()}


def test_topological_sort_diamond(spark):
    # 0->1, 0->2, 1->3, 2->3 (+ isolated via node_ids): layers 0/1/1/2.
    g = from_edge_list(
        spark,
        [("0", "1"), ("0", "2"), ("1", "3"), ("2", "3")],
        node_ids=["0", "1", "2", "3", "9"],
    )
    layers = _by_orig(g, topological_sort(g), "layer")
    assert layers == {"0": 0, "1": 1, "2": 1, "3": 2, "9": 0}


def test_topological_sort_excludes_cycles(spark):
    # 3->4, 4<->5: 4 and 5 are cyclic, both excluded; 0..3 keep layers.
    m = {}
    g = from_edge_list(
        spark,
        [("0", "1"), ("1", "3"), ("3", "4"), ("4", "5"), ("5", "4")],
    )
    out = topological_sort(g, metrics_out=m)
    layers = _by_orig(g, out, "layer")
    assert layers == {"0": 0, "1": 1, "3": 2}
    assert m["excluded_cyclic"] == 2


def test_dag_longest_path_weighted(spark):
    g = from_edge_list(
        spark,
        [("0", "1", 1.0), ("0", "2", 5.0), ("1", "3", 1.0),
         ("2", "3", 1.0)],
    )
    dist = _by_orig(g, dag_longest_path(g), "distance")
    assert dist == {"0": 0.0, "1": 1.0, "2": 5.0, "3": 6.0}


def test_dag_longest_path_parallel_edges_take_max(spark):
    g = from_edge_list(
        spark, [("0", "1", 1.0), ("0", "1", 4.0)], aggregation="NONE"
    )
    dist = _by_orig(g, dag_longest_path(g), "distance")
    assert dist["1"] == 4.0


def test_bellman_ford_negative_edge(spark):
    # 0->1 w4, 0->2 w2, 2->1 w-3: dist(1) = -1 via 2.
    g = from_edge_list(
        spark, [("0", "1", 4.0), ("0", "2", 2.0), ("2", "1", -3.0)]
    )
    ids = _ids(g)
    m = {}
    dist = _by_orig(
        g,
        bellman_ford(g, ids["0"], metrics_out=m),
        "distance",
    )
    assert dist == {"0": 0.0, "1": -1.0, "2": 2.0}
    assert m["negative_cycle"] is False


def test_bellman_ford_negative_cycle_raises(spark):
    g = from_edge_list(
        spark, [("0", "1", 1.0), ("1", "2", -2.0), ("2", "1", -2.0)]
    )
    ids = _ids(g)
    with pytest.raises(NegativeCycleError):
        bellman_ford(g, ids["0"])
    m = {}
    bellman_ford(g, ids["0"], on_negative_cycle="flag", metrics_out=m)
    assert m["negative_cycle"] is True


def test_bellman_ford_unreachable_negative_cycle_ok(spark):
    # negative cycle exists but is NOT reachable from the source.
    g = from_edge_list(
        spark,
        [("0", "1", 1.0), ("8", "9", -2.0), ("9", "8", -2.0)],
    )
    ids = _ids(g)
    m = {}
    dist = _by_orig(
        g, bellman_ford(g, ids["0"], metrics_out=m), "distance"
    )
    assert dist == {"0": 0.0, "1": 1.0}
    assert m["negative_cycle"] is False


def test_conductance_hand_computed(spark):
    # A = {0,1}, B = {2,3}. Directed edges:
    #   0->1 (A int), 1->2 (A ext), 2->3 (B int), 3->0 (B ext), 2->0 (B ext)
    g = from_edge_list(
        spark,
        [("0", "1"), ("1", "2"), ("2", "3"), ("3", "0"), ("2", "0")],
    )
    ids = _ids(g)
    comm = spark.createDataFrame(
        [(ids["0"], "A"), (ids["1"], "A"), (ids["2"], "B"), (ids["3"], "B")],
        "internal_id long, community string",
    )
    out = {r["community"]: r["conductance"]
           for r in conductance(g, comm).collect()}
    assert math.isclose(out["A"], 0.5)
    assert math.isclose(out["B"], 2.0 / 3.0)


def test_conductance_weighted_and_null_skip(spark):
    g = from_edge_list(
        spark, [("0", "1", 2.0), ("1", "2", 6.0), ("0", "3", 100.0)]
    )
    ids = _ids(g)
    # node 3 unassigned -> its edge is ignored entirely
    comm = spark.createDataFrame(
        [(ids["0"], 1), (ids["1"], 1), (ids["2"], 2), (ids["3"], None)],
        "internal_id long, community int",
    )
    out = {r["community"]: r["conductance"]
           for r in conductance(g, comm, weighted=True).collect()}
    assert math.isclose(out[1], 6.0 / 8.0)  # int 2 (0->1), ext 6 (1->2)
