"""Steiner tree (shortest-path heuristic)."""

import math

from graph_data_science_spark.graph import from_edge_list
from graph_data_science_spark.operators.steiner import steiner_tree


def _ids(g):
    return {r["original_id"]: r["internal_id"] for r in g.vertices.collect()}


def test_steiner_shares_prefix(spark):
    #   s -1- a -1- t1
    #          \-2- t2        expensive direct edges s-t1 (5), s-t2 (5)
    g = from_edge_list(
        spark,
        [("s", "a", 1.0), ("a", "t1", 1.0), ("a", "t2", 2.0),
         ("s", "t1", 5.0), ("s", "t2", 5.0)],
    )
    ids = _ids(g)
    m = {}
    tree = {
        r.internal_id: (r.parent, r.weight)
        for r in steiner_tree(
            g, ids["s"], [ids["t1"], ids["t2"]], metrics_out=m
        ).collect()
    }
    # shared prefix s->a used once; both terminals hang off a
    assert tree[ids["s"]] == (ids["s"], 0.0)
    assert tree[ids["a"]] == (ids["s"], 1.0)
    assert tree[ids["t1"]] == (ids["a"], 1.0)
    assert tree[ids["t2"]] == (ids["a"], 2.0)
    assert math.isclose(m["totalWeight"], 4.0)
    assert m["effectiveNodeCount"] == 4


def test_steiner_unreachable_terminal_absent(spark):
    g = from_edge_list(
        spark, [("s", "a", 1.0), ("x", "y", 1.0)]
    )
    ids = _ids(g)
    tree = steiner_tree(g, ids["s"], [ids["a"], ids["y"]])
    nodes = {r.internal_id for r in tree.collect()}
    assert nodes == {ids["s"], ids["a"]}
