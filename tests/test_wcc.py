"""WCC tests — ports of the reference's structural assertions
(ref: algo/src/test/java/org/neo4j/graphalgo/wcc/WccTest.java:49-104) plus a
seeded-random oracle (pure-python union-find; scipy unavailable here)."""

import random

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.graph import (
    NATURAL,
    REVERSE,
    UNDIRECTED,
    from_edge_list,
)
from graph_data_science_spark.operators.wcc import consecutive_ids, wcc, wcc_stats


def sixteen_chains_edges():
    # 16 disjoint 10-node path components: nodes 0..159, edges i->i+1 per block
    edges = []
    for block in range(16):
        base = block * 10
        for i in range(9):
            edges.append((f"{base + i:03d}", f"{base + i + 1:03d}"))
    return edges


def union_find_oracle(n, edges):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component id = min member id
    comp = {}
    for v in range(n):
        r = find(v)
        comp.setdefault(r, []).append(v)
    out = {}
    for members in comp.values():
        m = min(members)
        for v in members:
            out[v] = m
    return out


@pytest.mark.parametrize("orientation", [NATURAL, REVERSE, UNDIRECTED])
def test_sixteen_chains(spark, orientation):
    g = from_edge_list(spark, sixteen_chains_edges(), orientation=orientation)
    res = wcc(g).collect()
    assert len(res) == 160
    comps = {}
    for row in res:
        comps.setdefault(row["component"], set()).add(row["internal_id"])
    assert len(comps) == 16
    # every node's component == its block's min internal id; internal ids are
    # assigned in sorted original-id order, so block k = ids [10k, 10k+10)
    for cid, members in comps.items():
        assert members == set(range(cid, cid + 10))


def test_threshold_and_seed(spark):
    # union only edges with weight > threshold (ref: Wcc.java:183-204)
    edges = [("a", "b", 2.0), ("b", "c", 0.5), ("c", "d", 2.0)]
    g = from_edge_list(spark, edges)
    res = {r["internal_id"]: r["component"] for r in wcc(g, threshold=1.0).collect()}
    # a,b together; c,d together (a=0,b=1,c=2,d=3 by sorted ids)
    assert res[0] == res[1] == 0
    assert res[2] == res[3] == 2

    # seeded: seed property wins as the community id
    seeded = g.vertices.withColumn(
        "seed",
        F.when(F.col("original_id").isin("a", "b"), F.lit(7)).otherwise(F.lit(None)),
    )
    g2 = type(g)(seeded, g.edges)
    res2 = {
        r["internal_id"]: r["component"]
        for r in wcc(g2, seed_property="seed").collect()
    }
    assert res2[0] == res2[1] == res2[2] == res2[3] == 7  # all connected -> seed 7


def test_random_graph_vs_union_find(spark):
    rng = random.Random(42)
    n = 500
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(700)
    ]
    oracle = union_find_oracle(n, edges)
    g = from_edge_list(
        spark,
        [(f"{a:04d}", f"{b:04d}") for a, b in edges],
        node_ids=[f"{i:04d}" for i in range(n)],
    )
    res = {r["internal_id"]: r["component"] for r in wcc(g).collect()}
    assert res == oracle


def test_stats_and_consecutive_ids(spark):
    g = from_edge_list(spark, sixteen_chains_edges())
    comp = wcc(g)
    stats = wcc_stats(comp).collect()[0]
    assert stats["componentCount"] == 16
    assert stats["min"] == 10 and stats["max"] == 10
    cons = consecutive_ids(comp)
    vals = sorted({r["component"] for r in cons.collect()})
    assert vals == list(range(16))


def test_fused_wcc_matches_classic(spark):
    """Fused min-label kernel (blob state, min reducer) is an alternate
    physical strategy for default WCC — identical assignments, and it
    refuses to return a partial result when the superstep budget is
    below the graph diameter."""
    import random

    import pytest

    from graph_data_science_spark.operators.wcc import build_wcc_csr

    rng = random.Random(5)
    n = 400
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(420)]
    g = from_edge_list(spark, edges, node_ids=range(n))
    classic = sorted(
        (r["internal_id"], r["component"]) for r in wcc(g).collect()
    )
    csr = build_wcc_csr(g)
    try:
        fused = sorted(
            (r["internal_id"], r["component"])
            for r in wcc(g, csr=csr, chunk_size=4).collect()
        )
        assert fused == classic

        with pytest.raises(ValueError):
            wcc(g, csr=csr, threshold=0.5)

        chain = from_edge_list(
            spark, [(i, i + 1) for i in range(60)], node_ids=range(61)
        )
        csr2 = build_wcc_csr(chain)
        try:
            with pytest.raises(RuntimeError):
                wcc(chain, csr=csr2, max_iterations=10)
        finally:
            csr2.cleanup()
    finally:
        csr.cleanup()


def test_fused_wcc_checkpoint_resume_identical(spark, tmp_path):
    """North-rule resume on WCC: the chunk-end checkpoint persists both
    vertex labels AND the in-flight frontier messages, so a run capped
    mid-convergence resumes from the store and lands on exactly the
    classic assignment, with per-bucket lineage rows recorded."""
    from graph_data_science_spark.operators.wcc import build_wcc_csr
    from graph_data_science_spark.plans.checkpoint import CheckpointStore

    chain = from_edge_list(
        spark, [(i, i + 1) for i in range(40)], node_ids=range(41)
    )
    expected = sorted(
        (r["internal_id"], r["component"]) for r in wcc(chain).collect()
    )
    csr = build_wcc_csr(chain, n_buckets=4)
    try:
        store = CheckpointStore(spark, str(tmp_path / "ck"))
        m1: dict = {}
        # interrupted leg: budget (10) << chain diameter (40); with a
        # store this returns partial state instead of raising
        wcc(chain, csr=csr, max_iterations=10, checkpoint=store,
            chunk_size=5, metrics_out=m1).collect()
        assert m1["converged"] is False and m1["ran_iterations"] == 10
        m2: dict = {}
        resumed = sorted(
            (r["internal_id"], r["component"])
            for r in wcc(
                chain, csr=csr, max_iterations=100, checkpoint=store,
                chunk_size=5, metrics_out=m2,
            ).collect()
        )
        assert resumed == expected
        assert m2["converged"] is True
        lin = store.lineage()
        assert lin.filter(lin.iteration == 10).count() == 4  # per-bucket
    finally:
        csr.cleanup()


def test_dense_identity_fast_path_matches_sorted_map(spark):
    """from_edge_df on integer ids already dense [0, n) takes the no-idmap
    fast path; its graph must be indistinguishable from the sorted-map
    build (same vertices, same edges, same WCC), and non-dense or string
    ids must still go through the id map."""
    from pyspark.sql import functions as F

    from graph_data_science_spark.graph import from_edge_df

    dense = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4), (4, 0)], "src long, dst long"
    )
    g = from_edge_df(dense)
    verts = {
        (r.internal_id, r.original_id) for r in g.vertices.collect()
    }
    assert verts == {(i, i) for i in range(5)}
    comp = {r.internal_id: r.component for r in wcc(g).collect()}
    assert comp[0] == comp[1] == comp[2] == comp[3] == comp[4]

    # same graph with ids shifted by +10 (non-dense): sorted map kicks in
    shifted = dense.select(
        (F.col("src") + 10).alias("src"), (F.col("dst") + 10).alias("dst")
    )
    g2 = from_edge_df(shifted)
    verts2 = {
        (r.internal_id, r.original_id) for r in g2.vertices.collect()
    }
    assert verts2 == {(i, i + 10) for i in range(5)}
    comp2 = {r.internal_id: r.component for r in wcc(g2).collect()}
    assert comp2 == comp
