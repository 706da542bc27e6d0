"""Label propagation: GDS vote/tie semantics under a synchronous schedule,
cross-checked against a single-threaded Python reference."""

import random

from graph_data_science_spark.graph import from_edge_list
from graph_data_science_spark.operators.labelprop import label_propagation


def _python_sync_lp(n, edges, max_iterations, init=None, node_w=None, rel_w=None):
    """Reference implementation: synchronous schedule, vote weight =
    rel_weight * node_weight(neighbor), winner = max weight then min label."""
    labels = list(init) if init else list(range(n))
    node_w = node_w or [1.0] * n
    out = {}
    for i, (s, d) in enumerate(edges):
        out.setdefault(s, []).append((d, (rel_w or [1.0] * len(edges))[i]))
    for _ in range(max_iterations):
        nxt = list(labels)
        changed = False
        for v in range(n):
            votes = {}
            for (nbr, w) in out.get(v, []):
                lbl = labels[nbr]
                votes[lbl] = votes.get(lbl, 0.0) + w * node_w[nbr]
            if votes:
                best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))[0]
                nxt[v] = best
                changed = changed or best != labels[v]
        labels = nxt
        if not changed:
            break
    return labels


FOLLOW_GRAPH = [  # GDS LabelPropagationTest fixture topology (FIXTURES.md §3.3)
    (0, 1), (0, 2), (4, 3), (1, 5), (3, 4),
    (5, 0), (0, 5), (1, 0), (5, 1), (2, 3),
]


def test_lp_follow_graph_sync(spark):
    g = from_edge_list(spark, FOLLOW_GRAPH)
    got = {
        r["internal_id"]: r["label"]
        for r in label_propagation(g, max_iterations=1).collect()
    }
    expected = _python_sync_lp(6, FOLLOW_GRAPH, 1)
    assert got == dict(enumerate(expected))


def test_lp_seeded(spark):
    # seeds: Alice:2 Bridget:3 Charles:4 Doug:3 Mark:4 Michael:2
    seeds = {0: 2, 1: 3, 2: 4, 3: 3, 4: 4, 5: 2}
    g = from_edge_list(spark, FOLLOW_GRAPH)
    vertices = g.vertices.sparkSession.createDataFrame(
        [(k, str(k), v) for k, v in seeds.items()],
        "internal_id long, original_id string, seed long",
    )
    g.vertices = vertices
    got = {
        r["internal_id"]: r["label"]
        for r in label_propagation(
            g, max_iterations=10, seed_property="seed"
        ).collect()
    }
    expected = _python_sync_lp(6, FOLLOW_GRAPH, 10, init=[2, 3, 4, 3, 4, 2])
    assert got == dict(enumerate(expected))


def test_lp_random_vs_python_oracle(spark):
    rnd = random.Random(7)
    n = 80
    edges = list({(rnd.randrange(n), rnd.randrange(n)) for _ in range(400)})
    edges = [(s, d) for s, d in edges if s != d]
    # from_edge_list maps string ids lexicographically; use zero-padded ids
    g2 = from_edge_list(
        spark,
        [(f"{s:04d}", f"{d:04d}") for s, d in edges],
        node_ids=[f"{i:04d}" for i in range(n)],
    )
    got = {
        r["internal_id"]: r["label"]
        for r in label_propagation(g2, max_iterations=5).collect()
    }
    expected = _python_sync_lp(n, edges, 5)
    assert got == dict(enumerate(expected))


def test_lp_weighted_votes(spark):
    # 0 -> 1 (w=1), 0 -> 2 (w=5): weighted LP must adopt label 2
    g = from_edge_list(spark, [(0, 1, 1.0), (0, 2, 5.0)])
    got = {
        r["internal_id"]: r["label"]
        for r in label_propagation(g, max_iterations=1, weighted=True).collect()
    }
    assert got[0] == 2
    # unweighted: tie -> smaller label
    got_u = {
        r["internal_id"]: r["label"]
        for r in label_propagation(g, max_iterations=1).collect()
    }
    assert got_u[0] == 1


def test_lp_fused_matches_classic(spark):
    """Fused (labelvote-reducer) LP == classic DataFrame LP, exactly —
    unweighted and weighted, fixed-iteration and converged runs."""
    from graph_data_science_spark.operators.labelprop import build_lp_csr

    rnd = random.Random(13)
    n = 150
    edges = list({(rnd.randrange(n), rnd.randrange(n)) for _ in range(700)})
    edges = [(s, d, round(rnd.uniform(0.5, 2.0), 3)) for s, d in edges if s != d]
    g = from_edge_list(
        spark,
        [(f"{s:04d}", f"{d:04d}", w) for s, d, w in edges],
        node_ids=[f"{i:04d}" for i in range(n)],
    )
    for weighted in (False, True):
        for iters, chunk in ((3, 1), (12, 4)):
            classic = {
                r["internal_id"]: r["label"]
                for r in label_propagation(
                    g, max_iterations=iters, weighted=weighted
                ).collect()
            }
            csr = build_lp_csr(g, n_buckets=6)
            metrics = {}
            fused = {
                r["internal_id"]: r["label"]
                for r in label_propagation(
                    g,
                    max_iterations=iters,
                    weighted=weighted,
                    csr=csr,
                    chunk_size=chunk,
                    metrics_out=metrics,
                ).collect()
            }
            csr.cleanup()
            assert fused == classic
            assert metrics["ran_iterations"] <= iters


def test_lp_fused_rejects_seeded_and_node_weighted(spark):
    from graph_data_science_spark.operators.labelprop import build_lp_csr

    g = from_edge_list(spark, [(0, 1), (1, 2)])
    csr = build_lp_csr(g, n_buckets=2)
    try:
        import pytest

        with pytest.raises(ValueError):
            label_propagation(g, seed_property="seed", csr=csr)
        with pytest.raises(ValueError):
            label_propagation(g, node_weight_property="w", csr=csr)
    finally:
        csr.cleanup()


def test_lp_fused_checkpoint_resume_identical(spark, tmp_path):
    """North-rule resume on LP: a fused run capped at 4 vote rounds
    resumes from the checkpoint store and matches an uninterrupted
    12-round run exactly (synchronous schedule preserved across the
    resume boundary because in-flight votes are checkpointed too)."""
    from graph_data_science_spark.operators.labelprop import build_lp_csr
    from graph_data_science_spark.plans.checkpoint import CheckpointStore

    rnd = random.Random(29)
    n = 120
    edges = list({(rnd.randrange(n), rnd.randrange(n)) for _ in range(500)})
    g = from_edge_list(
        spark,
        [(f"{s:03d}", f"{d:03d}") for s, d in edges if s != d],
        node_ids=[f"{i:03d}" for i in range(n)],
    )
    csr = build_lp_csr(g, n_buckets=5)
    try:
        expected = {
            r["internal_id"]: r["label"]
            for r in label_propagation(
                g, max_iterations=12, csr=csr
            ).collect()
        }
        store = CheckpointStore(spark, str(tmp_path / "ck"))
        label_propagation(
            g, max_iterations=4, csr=csr, checkpoint=store, chunk_size=2
        ).collect()
        resumed = {
            r["internal_id"]: r["label"]
            for r in label_propagation(
                g, max_iterations=12, csr=csr, checkpoint=store,
                chunk_size=2,
            ).collect()
        }
        assert resumed == expected
    finally:
        csr.cleanup()
