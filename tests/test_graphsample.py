"""Random-walk-with-restart graph sampling."""

from graph_data_science_spark.graph import from_edge_list
from graph_data_science_spark.operators.graphsample import (
    rwr_sample,
    rwr_sample_nodes,
)


def _ring(spark, n=40):
    # directed ring + chords: connected, every node has out-degree 2
    edges = []
    for i in range(n):
        edges.append((str(i).zfill(3), str((i + 1) % n).zfill(3)))
        edges.append((str(i).zfill(3), str((i + 7) % n).zfill(3)))
    return from_edge_list(spark, edges)


def test_rwr_reaches_target_and_is_deterministic(spark):
    g = _ring(spark)
    m1, m2 = {}, {}
    s1 = {
        r.internal_id
        for r in rwr_sample_nodes(
            g, sampling_ratio=0.5, metrics_out=m1
        ).collect()
    }
    s2 = {
        r.internal_id
        for r in rwr_sample_nodes(
            g, sampling_ratio=0.5, metrics_out=m2
        ).collect()
    }
    assert s1 == s2
    assert m1 == m2
    assert m1["sampled"] >= m1["target"] == 20
    assert 0 in s1  # default start node always sampled


def test_rwr_multi_batch_growth(spark):
    g = _ring(spark)
    m = {}
    rwr_sample_nodes(
        g,
        sampling_ratio=0.9,
        walks_per_batch=2,
        walk_length=3,
        metrics_out=m,
    )
    assert m["batches"] > 1  # tiny batches force accumulation rounds


def test_rwr_induced_subgraph(spark):
    g = _ring(spark)
    sub = rwr_sample(g, sampling_ratio=0.4)
    nodes = {r.internal_id for r in sub.vertices.collect()}
    for e in sub.edges.collect():
        assert e.src in nodes and e.dst in nodes
    # every sampled edge exists in the parent graph
    parent = {(e.src, e.dst) for e in g.edges.collect()}
    assert {(e.src, e.dst) for e in sub.edges.collect()} <= parent


def test_rwr_stalls_on_unreachable_budget(spark):
    # directed chain 0->1->2; forward reach of 0 is 3 nodes but the
    # budget asks for 5: the stall guard must stop early, not spin to
    # max_batches
    g = from_edge_list(
        spark,
        [("0", "1"), ("1", "2")],
        node_ids=["0", "1", "2", "7", "8", "9"],
    )
    m = {}
    out = rwr_sample_nodes(
        g, sampling_ratio=0.9, start_nodes=[0], max_batches=50,
        walks_per_batch=8, walk_length=4, metrics_out=m,
    )
    assert out.count() == 3
    assert m["stalled"] is True
    assert m["batches"] < 10


def test_rwr_portable_hash_matches_semantics(spark):
    g = _ring(spark)
    s_md5 = {
        r.internal_id
        for r in rwr_sample_nodes(
            g, sampling_ratio=0.3, base_hash="md5"
        ).collect()
    }
    # md5 mode is also deterministic and hits the budget
    assert len(s_md5) >= 12
