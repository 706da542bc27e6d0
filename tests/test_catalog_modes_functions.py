"""Catalog lifecycle, modes layer, scalar/similarity/link-prediction
functions, ML utility ops, incremental + streaming WCC."""

import math

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.catalog import GraphCatalog
from graph_data_science_spark.functions import (
    adamic_adar_pairs,
    common_neighbors_pairs,
    cosine,
    euclidean_distance,
    jaccard,
    overlap,
    pearson,
    preferential_attachment_pairs,
    total_neighbors_pairs,
)
from graph_data_science_spark.graph import from_edge_list
from graph_data_science_spark.modes import (
    centrality_stats,
    community_stats,
    estimate,
)
from graph_data_science_spark.operators.mlops import (
    one_hot_encoding,
    random_walks,
    scale_properties,
    split_relationships,
)
from graph_data_science_spark.operators.wcc import wcc
from graph_data_science_spark.streaming.incremental import incremental_wcc


def _edges_df(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long")


def test_catalog_lifecycle(spark, tmp_path):
    cat = GraphCatalog()
    cat.create("g1", _edges_df(spark, [(1, 2), (2, 3), (10, 11)]))
    assert cat.exists("g1") and not cat.exists("nope")
    info = cat.list()[0]
    assert info["nodeCount"] == 5 and info["relationshipCount"] == 3
    with pytest.raises(ValueError):
        cat.create("g1", _edges_df(spark, [(1, 2)]))

    comp = wcc(cat.get("g1"))
    cat.mutate_node_property("g1", "component", comp)
    assert "component" in cat.get("g1").vertices.columns
    # subgraph filter via SQL exprs (Catalyst = the expression engine)
    sub = cat.create_subgraph(
        "g1_sub", "g1", node_filter="internal_id < 3"
    )
    assert sub.vertices.count() == 3
    # export + reimport round trip
    p = str(tmp_path / "exported")
    cat.export("g1", p)
    back = GraphCatalog.import_from(spark, p)
    assert back.edges.count() == 3
    dd = cat.degree_distribution("g1")
    assert dd["max"] == 1
    cat.drop("g1_sub")
    assert not cat.exists("g1_sub")


def test_catalog_cypher_projection(spark):
    spark.createDataFrame(
        [(1, 2), (2, 3)], "a long, b long"
    ).createOrReplaceTempView("rels")
    cat = GraphCatalog()
    g = cat.create_cypher(
        "gc",
        spark,
        "SELECT DISTINCT a AS id FROM rels",
        "SELECT a AS src, b AS dst FROM rels",
    )
    assert g.relationship_count() == 2


def test_modes_stats_and_estimate(spark):
    g = from_edge_list(spark, [(0, 1), (1, 2), (3, 4)])
    comp = wcc(g)
    cs = community_stats(comp)
    assert cs["communityCount"] == 2
    assert cs["max"] == 3 and cs["min"] == 2
    st = centrality_stats(
        comp.select(F.col("component").cast("double").alias("score"))
    )
    assert st["min"] == 0.0
    est = estimate(g)
    assert est["nodeCount"] == 5 and est["bytesMin"] > 0


def test_similarity_functions(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0], [1, 2, 3], [2, 3, 4])],
        "a array<double>, b array<double>, s1 array<int>, s2 array<int>",
    )
    row = df.select(
        cosine("a", "b").alias("cos"),
        euclidean_distance("a", "b").alias("dist"),
        jaccard("s1", "s2").alias("jac"),
        overlap("s1", "s2").alias("ov"),
        pearson("a", "b").alias("pr"),
    ).collect()[0]
    assert abs(row["cos"]) < 1e-12
    assert abs(row["dist"] - math.sqrt(2)) < 1e-12
    assert abs(row["jac"] - 2 / 4) < 1e-12
    assert abs(row["ov"] - 2 / 3) < 1e-12
    assert abs(row["pr"] + 1.0) < 1e-12  # perfectly anti-correlated


def test_linkprediction_pairs(spark):
    # triangle 0-1-2 plus pendant 3 on node 0 (undirected semantics)
    g = from_edge_list(spark, [(0, 1), (1, 2), (2, 0), (0, 3)])
    cn = {(r["node1"], r["node2"]): r["score"]
          for r in common_neighbors_pairs(g).collect()}
    assert cn[(0, 1)] == 1  # share node 2
    assert cn[(1, 3)] == 1  # share node 0
    aa = {(r["node1"], r["node2"]): r["score"]
          for r in adamic_adar_pairs(g).collect()}
    assert abs(aa[(1, 3)] - 1 / math.log(3)) < 1e-12  # via node 0, deg 3
    pa = {(r["node1"], r["node2"]): r["score"]
          for r in preferential_attachment_pairs(g).collect()}
    assert pa[(1, 2)] == 4.0  # deg(1)=2 * deg(2)=2
    tn = {(r["node1"], r["node2"]): r["score"]
          for r in total_neighbors_pairs(g).collect()}
    assert tn[(1, 2)] == 3  # {0,2} ∪ {0,1} = {0,1,2}


def test_mlops(spark):
    g = from_edge_list(spark, [(i, (i + 1) % 20) for i in range(20)])
    v = g.vertices.withColumn(
        "x", F.col("internal_id").cast("double")
    ).withColumn("cat", F.pmod("internal_id", F.lit(3)).cast("int"))
    scaled = scale_properties(v, {"x": "MINMAX"})
    mx = scaled.agg(F.max("x"), F.min("x")).collect()[0]
    assert mx[0] == 1.0 and mx[1] == 0.0
    oh = one_hot_encoding(v, "cat")
    row = oh.filter(F.col("cat") == 1).first()
    assert row["cat_onehot"] == [0, 1, 0]
    remaining, test = split_relationships(g, holdout_fraction=0.3, seed=1)
    n_pos = test.filter("label = 1").count()
    assert remaining.count() + n_pos == 20
    assert test.filter("label = 0").count() > 0
    walks = random_walks(g, walks_per_node=2, walk_length=4, seed=9)
    rows = walks.collect()
    assert len(rows) == 40
    # validate against actual internal-id edges (string id-map reorders)
    ring = {(r["src"], r["dst"]) for r in g.edges.collect()}
    for r in rows:
        p = r["path"]
        assert len(p) == 4 and p[0] == r["start"]
        for a, b in zip(p, p[1:]):
            assert (a, b) in ring
    # determinism
    again = {r["walk_id"]: tuple(r["path"]) for r in
             random_walks(g, walks_per_node=2, walk_length=4, seed=9).collect()}
    for r in rows:
        assert tuple(r["path"]) == again[r["walk_id"]]


def test_incremental_wcc(spark):
    g1 = from_edge_list(spark, [(0, 1), (2, 3)], node_ids=[0, 1, 2, 3])
    c1 = wcc(g1)
    # new edge merges the two components; seeded rerun keeps stable min id
    g2 = from_edge_list(spark, [(0, 1), (2, 3), (1, 2)])
    prev = c1  # internal ids align (same sorted original ids)
    c2 = {r["internal_id"]: r["component"]
          for r in incremental_wcc(g2, prev).collect()}
    assert len(set(c2.values())) == 1


def test_typed_relationship_lifecycle(spark, tmp_path):
    """mutate_relationships → streamRelationshipProperty →
    writeRelationship → delete by type (gds.graph.writeRelationship /
    streamRelationshipProperties parity)."""
    cat = GraphCatalog()
    cat.create("gr", _edges_df(spark, [(1, 2), (2, 3)]))
    base_edges = cat.get("gr").relationship_count()

    sim = spark.createDataFrame(
        [(0, 2, 0.9), (1, 0, 0.5)], "src long, dst long, weight double"
    )
    g2 = cat.mutate_relationships("gr", "SIMILAR", sim)
    assert g2.relationship_count() == base_edges + 2

    streamed = cat.stream_relationship_properties("gr", ["weight"])
    assert streamed.columns == ["src", "dst", "relationshipType", "weight"]
    by_type = {
        r["relationshipType"]: r["cnt"]
        for r in streamed.groupBy("relationshipType")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert by_type == {None: base_edges, "SIMILAR": 2}

    p = str(tmp_path / "rels")
    n = cat.write_relationship("gr", "SIMILAR", p, property_name="weight")
    assert n == 2
    back = spark.read.parquet(p)
    assert back.columns == ["src", "dst", "weight"]
    assert back.count() == 2

    cat.delete_relationships("gr", "__type = 'SIMILAR'")
    assert cat.get("gr").edges.count() == base_edges


def test_model_publish_save_load(spark, tmp_path):
    import numpy as np

    cat = GraphCatalog()
    cat.model_store("m1", {"type": "fastrp", "payload": np.arange(4.0)})
    pub = cat.model_publish("m1")
    assert pub["shared"] is True and "payload" not in pub

    p = str(tmp_path / "models" / "m1.json")
    cat.model_save("m1", p)
    cat.model_drop("m1")
    assert not cat.model_exists("m1")
    m = cat.model_load("m1", p)
    assert cat.model_exists("m1")
    assert m["type"] == "fastrp" and m["shared"] is True
    assert np.allclose(m["payload"], np.arange(4.0))
