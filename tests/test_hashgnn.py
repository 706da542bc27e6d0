"""HashGNN: determinism, partitioning invariance, structural similarity."""

from graph_data_science_spark.graph import from_edge_list
from graph_data_science_spark.operators.hashgnn import hashgnn


def _emb(df):
    return {r.internal_id: tuple(r.embedding) for r in df.collect()}


def test_hashgnn_deterministic_and_partition_invariant(spark):
    edges = [(str(i), str((i + 1) % 12)) for i in range(12)]
    g = from_edge_list(spark, edges)
    e1 = _emb(hashgnn(g))
    e2 = _emb(hashgnn(g))
    assert e1 == e2
    # repartitioned edges give the identical embedding
    g2 = from_edge_list(spark, edges)
    g2.edges = g2.edges.repartition(7)
    assert _emb(hashgnn(g2)) == e1


def test_hashgnn_shapes_and_seed(spark):
    g = from_edge_list(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    out = _emb(hashgnn(g, dimension=32, density=4))
    for bits in out.values():
        assert 1 <= len(bits) <= 4
        assert all(0 <= b < 32 for b in bits)
        assert list(bits) == sorted(bits)
    assert out != _emb(hashgnn(g, dimension=32, density=4, seed=7))


def test_hashgnn_structural_similarity(spark):
    # two disjoint triangles with IDENTICAL provided features per role:
    # message passing only mixes within a component, and hash keys are
    # node-independent, so isomorphic nodes with equal features get
    # equal embeddings
    edges = [("a0", "a1"), ("a1", "a2"), ("a2", "a0"),
             ("b0", "b1"), ("b1", "b2"), ("b2", "b0")]
    g = from_edge_list(spark, edges)
    ids = {r["original_id"]: r["internal_id"] for r in g.vertices.collect()}
    feats = spark.createDataFrame(
        [(ids[f"{c}{i}"], i) for c in "ab" for i in range(3)],
        "internal_id long, bit int",
    )
    out = _emb(hashgnn(g, dimension=16, density=3, features=feats))
    for i in range(3):
        assert out[ids[f"a{i}"]] == out[ids[f"b{i}"]]
