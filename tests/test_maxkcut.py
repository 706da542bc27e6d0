"""Approximate maximum k-cut (operators/maxkcut.py)."""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.graph import from_edge_df
from graph_data_science_spark.operators.maxkcut import approx_max_k_cut


def _fixture_edges(spark, n_parts=2):
    # two natural clusters joined by light bridges: a good cut separates
    # within-cluster heavy edges into different communities
    rows = [
        (0, 1, 5.0), (1, 2, 4.0), (2, 0, 3.0),
        (3, 4, 5.0), (4, 5, 4.0), (5, 3, 3.0),
        (0, 3, 1.0), (2, 5, 1.0),
    ]
    return spark.createDataFrame(rows, "src long, dst long, w double") \
        .repartition(n_parts)


def test_assignment_complete_and_bounded(spark):
    g = from_edge_df(_fixture_edges(spark), weight="w")
    res = approx_max_k_cut(g, 3, iterations=4, relationship_weight="weight")
    rows = res.assignment.collect()
    assert len(rows) == 6
    assert {r.internal_id for r in rows} == set(range(6))
    assert all(0 <= r.community < 3 for r in rows)


def test_cut_cost_matches_recomputation(spark):
    g = from_edge_df(_fixture_edges(spark), weight="w")
    res = approx_max_k_cut(g, 2, iterations=6, relationship_weight="weight")
    ca = res.assignment.select(
        F.col("internal_id").alias("src"), F.col("community").alias("ca"))
    cb = res.assignment.select(
        F.col("internal_id").alias("dst"), F.col("community").alias("cb"))
    recomputed = (
        g.edges.filter(F.col("src") != F.col("dst"))
        .join(ca, "src").join(cb, "dst")
        .filter(F.col("ca") != F.col("cb"))
        .agg(F.coalesce(F.sum("weight"), F.lit(0.0)))
        .collect()[0][0]
    )
    assert res.cut_cost == pytest.approx(recomputed)


def test_local_search_improves_over_init(spark):
    g = from_edge_df(_fixture_edges(spark), weight="w")
    init = approx_max_k_cut(g, 2, iterations=0, relationship_weight="weight")
    final = approx_max_k_cut(g, 2, iterations=6, relationship_weight="weight")
    assert final.cut_cost >= init.cut_cost
    # total weight 26; a decent 2-cut must beat half of it
    assert final.cut_cost >= 13.0


def test_partition_invariance(spark):
    a = approx_max_k_cut(
        from_edge_df(_fixture_edges(spark, 1), weight="w"), 3, iterations=5,
        relationship_weight="weight")
    b = approx_max_k_cut(
        from_edge_df(_fixture_edges(spark, 7), weight="w"), 3, iterations=5,
        relationship_weight="weight")
    assert sorted(map(tuple, a.assignment.collect())) == \
        sorted(map(tuple, b.assignment.collect()))
    assert a.cut_cost == b.cut_cost


def test_unweighted_defaults_to_one(spark):
    e = _fixture_edges(spark).drop("w")
    g = from_edge_df(e)
    res = approx_max_k_cut(g, 2, iterations=4)
    assert res.cut_cost == int(res.cut_cost)  # integral: each edge counts 1
    assert 0 < res.cut_cost <= 8


def test_k_validation(spark):
    g = from_edge_df(_fixture_edges(spark), weight="w")
    with pytest.raises(ValueError):
        approx_max_k_cut(g, 1)
