"""Partitioning invariance of the round-2 operator additions.

The engine's signature property: results must be pure functions of the
graph, never of task scheduling or partition boundaries. Each test runs
the operator on the same graph with two different edge partitionings and
pins identical results.
"""

from pyspark.sql import functions as F

from graph_data_science_spark.graph import from_edge_list
from graph_data_science_spark.operators.conductance import conductance
from graph_data_science_spark.operators.dag import (
    bellman_ford,
    dag_longest_path,
    topological_sort,
)
from graph_data_science_spark.operators.leiden import leiden
from graph_data_science_spark.operators.salsa import salsa
from graph_data_science_spark.operators.sllpa import sllpa
from graph_data_science_spark.operators.steiner import steiner_tree


def _graph_pair(spark, edges, parts=7):
    g1 = from_edge_list(spark, edges)
    g2 = from_edge_list(spark, edges)
    g2.edges = g2.edges.repartition(parts)
    return g1, g2


_DAG_EDGES = [
    ("0", "1", 1.0), ("0", "2", 5.0), ("1", "3", 1.0), ("2", "3", 1.0),
    ("3", "4", 2.0), ("1", "4", 9.0), ("2", "5", 1.5),
]

_COMM_EDGES = [
    (str(a), str(b), 1.0)
    for base in (0, 10)
    for a in range(base, base + 4)
    for b in range(base, base + 4)
    if a < b
] + [("3", "10", 1.0)]


def test_dag_family_partition_invariant(spark):
    g1, g2 = _graph_pair(spark, _DAG_EDGES)
    for fn in (topological_sort, dag_longest_path):
        r1 = sorted(map(tuple, fn(g1).collect()))
        r2 = sorted(map(tuple, fn(g2).collect()))
        assert r1 == r2, fn.__name__
    b1 = sorted(map(tuple, bellman_ford(g1, 0).collect()))
    b2 = sorted(map(tuple, bellman_ford(g2, 0).collect()))
    assert b1 == b2


def test_leiden_partition_invariant(spark):
    g1, g2 = _graph_pair(spark, _COMM_EDGES)
    r1 = sorted(map(tuple, leiden(g1).assignment.collect()))
    r2 = sorted(map(tuple, leiden(g2).assignment.collect()))
    assert r1 == r2


def test_sllpa_partition_invariant(spark):
    g1, g2 = _graph_pair(spark, _COMM_EDGES)
    r1 = sorted(map(tuple, sllpa(g1, max_iterations=6).collect()))
    r2 = sorted(map(tuple, sllpa(g2, max_iterations=6).collect()))
    assert r1 == r2


def test_salsa_conductance_steiner_partition_invariant(spark):
    g1, g2 = _graph_pair(spark, _DAG_EDGES)
    s1 = sorted(
        (r.internal_id, round(r.hub, 12), round(r.auth, 12))
        for r in salsa(g1, max_iterations=8).scores.collect()
    )
    s2 = sorted(
        (r.internal_id, round(r.hub, 12), round(r.auth, 12))
        for r in salsa(g2, max_iterations=8).scores.collect()
    )
    assert s1 == s2
    comm = g1.vertices.select(
        "internal_id", (F.col("internal_id") % 2).alias("community")
    )
    c1 = sorted(
        (r.community, round(r.conductance, 12))
        for r in conductance(g1, comm).collect()
    )
    c2 = sorted(
        (r.community, round(r.conductance, 12))
        for r in conductance(g2, comm).collect()
    )
    assert c1 == c2
    t1 = sorted(map(tuple, steiner_tree(g1, 0, [3, 5]).collect()))
    t2 = sorted(map(tuple, steiner_tree(g2, 0, [3, 5]).collect()))
    assert t1 == t2
