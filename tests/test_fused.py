"""Fused blob-state kernel (plans/fused.py) vs the classic kernel."""

import random

from graph_data_science_spark.graph import from_edge_list
from graph_data_science_spark.operators.pagerank import pagerank
from graph_data_science_spark.plans.fused import build_bucketed_csr


def _graph(spark, n=200, m=900, seed=3):
    rnd = random.Random(seed)
    edges = set()
    while len(edges) < m:
        a, b = rnd.randrange(n), rnd.randrange(n)
        if a != b:
            edges.add((a, b))
    el = [
        (f"{a:04d}", f"{b:04d}", round(rnd.uniform(0.5, 2.0), 3))
        for a, b in sorted(edges)
    ]
    return from_edge_list(
        spark, el, node_ids=[f"{i:04d}" for i in range(n)]
    ), n


def test_fused_matches_classic_unweighted_weighted(spark):
    g, n = _graph(spark)
    for weighted in (False, True):
        classic = {
            r["internal_id"]: r["score"]
            for r in pagerank(
                g, tolerance=0.0, max_iterations=10, weighted=weighted
            ).scores.collect()
        }
        csr = build_bucketed_csr(g.edges, n, n_buckets=7)
        fused = {
            r["internal_id"]: r["score"]
            for r in pagerank(
                g,
                tolerance=0.0,
                max_iterations=10,
                weighted=weighted,
                csr=csr,
            ).scores.collect()
        }
        assert set(classic) == set(fused)
        assert max(abs(classic[k] - fused[k]) for k in classic) < 1e-9


def test_fused_personalized_with_tolerance_frontier(spark):
    g, n = _graph(spark, seed=11)
    kw = dict(
        tolerance=1e-4, max_iterations=15, source_nodes=["0003", "0007"]
    )
    classic = {
        r["internal_id"]: r["score"]
        for r in pagerank(g, **kw).scores.collect()
    }
    csr = build_bucketed_csr(g.edges, n, n_buckets=5)
    fused = {
        r["internal_id"]: r["score"]
        for r in pagerank(g, csr=csr, **kw).scores.collect()
    }
    assert max(abs(classic[k] - fused.get(k, 0.0)) for k in classic) < 1e-9


def test_fused_checkpoint_resume_identical(spark, tmp_path):
    """North-rule resume: a fused run interrupted mid-convergence resumes
    from the checkpoint store and lands byte-identical to an
    uninterrupted run, with per-superstep lineage rows recorded."""
    from graph_data_science_spark.plans.checkpoint import CheckpointStore

    g, n = _graph(spark, seed=7)
    csr = build_bucketed_csr(g.edges, n, n_buckets=4)
    expected = {
        r["internal_id"]: r["score"]
        for r in pagerank(
            g, tolerance=0.0, max_iterations=12, csr=csr
        ).scores.collect()
    }
    store = CheckpointStore(spark, str(tmp_path / "ck"))
    part1 = pagerank(
        g, tolerance=0.0, max_iterations=6, csr=csr, checkpoint=store
    )
    assert part1.ran_iterations == 6
    part2 = pagerank(
        g, tolerance=0.0, max_iterations=12, csr=csr, checkpoint=store
    )
    resumed = {
        r["internal_id"]: r["score"] for r in part2.scores.collect()
    }
    assert resumed == expected  # byte-identical doubles
    lin = store.lineage()
    its = sorted(
        r["iteration"] for r in lin.select("iteration").distinct().collect()
    )
    assert its == list(range(1, 13))
    cols = set(lin.columns)
    assert {"iteration", "rows", "delta_norm", "wall_time"} <= cols
    # per-partition lineage (north rule): at chunk_size=1 every superstep
    # is a chunk end, so each iteration carries one row per bucket whose
    # row counts sum to |V|
    it1 = lin.filter(lin.iteration == 1).collect()
    assert sorted(r["partition_id"] for r in it1) == [0, 1, 2, 3]
    assert sum(r["rows"] for r in it1) == n


def test_fused_l1_convergence_and_metrics(spark):
    g, n = _graph(spark, seed=5)
    csr = build_bucketed_csr(g.edges, n, n_buckets=4)
    out = pagerank(
        g, tolerance=0.0, l1_tolerance=1e-6 * n, max_iterations=100, csr=csr
    )
    assert out.converged
    assert out.ran_iterations < 100
    # metrics monotone-ish: l1 decreasing at the tail
    l1s = [m["l1"] for m in out.metrics]
    assert l1s[-1] <= l1s[1]
    assert all(m["rows"] == n for m in out.metrics)
