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


# ---------------------------------------------------------------------------
# CNARW
# ---------------------------------------------------------------------------
def test_cnarw_weights_bias(spark):
    """Edges into a shared-neighbour-rich target get LOWER weight."""
    from graph_data_science_spark.operators.graphsample import (
        cnarw_weights,
    )

    # 0 -> {1, 2}; 0 and 1 share neighbour 2 (0->2, 1->2); 0 and 2
    # share nothing. So weight(0->1) < weight(0->2).
    g = from_edge_list(spark, [(0, 1), (0, 2), (1, 2)])
    w = {
        (r.src, r.dst): r.w_int
        for r in cnarw_weights(g).collect()
    }
    assert w[(0, 1)] < w[(0, 2)]
    # prefix ranges tile [0, tot) per src
    rows = sorted(
        (r.lo, r.w_int)
        for r in cnarw_weights(g).filter("src = 0").collect()
    )
    assert rows[0][0] == 0
    assert rows[1][0] == rows[0][1]


def test_cnarw_deterministic_and_partition_invariant(spark):
    from graph_data_science_spark.operators.graphsample import (
        cnarw_sample_nodes,
    )

    edges = [(i, (i * 3 + 1) % 40) for i in range(40)] + [
        (i, (i * 7 + 2) % 40) for i in range(40)
    ]
    g1 = from_edge_list(spark, edges)
    g2 = from_edge_list(spark, edges)
    g2.edges = g2.edges.repartition(13)
    kw = dict(
        sampling_ratio=0.5, start_nodes=[0], walks_per_batch=16,
        walk_length=6, max_batches=4,
    )
    a = sorted(r.internal_id for r in cnarw_sample_nodes(g1, **kw).collect())
    b = sorted(r.internal_id for r in cnarw_sample_nodes(g2, **kw).collect())
    assert a == b and len(a) >= 20


def test_cnarw_escapes_clique_faster_than_rwr(spark):
    """On a clique with a thin path attached, CNARW's common-neighbour
    penalty pushes walks toward the path exit, so it visits at least as
    many path nodes as uniform RWR under the same budget."""
    from graph_data_science_spark.operators.graphsample import (
        cnarw_sample_nodes,
        rwr_sample_nodes,
    )

    k = 8
    clique = [(i, j) for i in range(k) for j in range(k) if i != j]
    path = [(k - 1, k), (k, k - 1)]
    for i in range(k, k + 12):
        path += [(i, i + 1), (i + 1, i)]
    g = from_edge_list(spark, clique + path)
    kw = dict(
        sampling_ratio=1.0, start_nodes=[0], walks_per_batch=24,
        walk_length=10, max_batches=2, stall_batches=8,
    )
    cn_nodes = {
        r.internal_id for r in cnarw_sample_nodes(g, **kw).collect()
    }
    rwr_nodes = {
        r.internal_id for r in rwr_sample_nodes(g, **kw).collect()
    }
    cn_path = sum(1 for v in cn_nodes if v >= k)
    rwr_path = sum(1 for v in rwr_nodes if v >= k)
    assert cn_path >= rwr_path
    assert cn_path >= 2  # actually escaped


def test_cnarw_induced_subgraph(spark):
    from graph_data_science_spark.operators.graphsample import (
        cnarw_sample,
    )

    g = from_edge_list(spark, [(i, i + 1) for i in range(30)])
    sub = cnarw_sample(
        g, sampling_ratio=0.4, start_nodes=[0], walks_per_batch=8,
        walk_length=5, max_batches=8,
    )
    nodes = {r.internal_id for r in sub.vertices.collect()}
    for e in sub.edges.collect():
        assert e.src in nodes and e.dst in nodes
