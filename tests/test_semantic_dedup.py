"""Clustered (SemDeDup-style) semantic dedup + distributed k-means."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.pipeline.ann import (
    centroid_assign_column,
    cosine_neardup_pairs,
    kmeans_assign,
    kmeans_fit,
    seeded_centroids,
    semantic_dedup,
    semantic_neardup_pairs,
)

DIM = 8


@pytest.fixture(scope="module")
def clustered_emb(spark):
    """3 tight planted clusters + exact duplicates inside each."""
    rng = np.random.Generator(np.random.PCG64(99))
    anchors = rng.standard_normal((3, DIM)) * 5.0
    rows = []
    vid = 0
    for a in anchors:
        for _ in range(20):
            v = a + rng.standard_normal(DIM) * 0.01
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semantic_pairs_subset_of_exact(clustered_emb):
    """Cluster gating only REMOVES pairs (precision 1 wrt the exact set)."""
    exact = {
        (r.vec_id, r.dup_id)
        for r in cosine_neardup_pairs(clustered_emb, threshold=0.95).collect()
    }
    sem = {
        (r.vec_id, r.dup_id)
        for r in semantic_neardup_pairs(
            clustered_emb, threshold=0.95, n_clusters=4, seed=11
        ).collect()
    }
    assert sem <= exact
    # planted near-identical clusters: most same-cluster pairs survive
    assert len(sem) >= len(exact) * 0.5


def test_semantic_dedup_keeps_one_per_tight_cluster(clustered_emb):
    out = semantic_dedup(
        clustered_emb, threshold=0.999, n_clusters=4, seed=11
    )
    kept = [r.vec_id for r in out.collect() if r.keep]
    # 60 vectors in 3 near-duplicate groups -> a handful of keepers;
    # every group's smallest member is kept (greedy-by-id)
    assert len(kept) < 20
    assert 0 in kept


def test_centroid_assign_column_matches_numpy(clustered_emb):
    cents = seeded_centroids(DIM, 4, 11)
    plan = {
        r.vec_id: r.c
        for r in clustered_emb.select(
            "vec_id",
            centroid_assign_column("embedding", cents).alias("c"),
        ).collect()
    }
    closure = {
        r.vec_id: r.cluster
        for r in kmeans_assign(clustered_emb, cents).collect()
    }
    assert plan == closure


def test_kmeans_recovers_planted_clusters(clustered_emb):
    cents = kmeans_fit(clustered_emb, k=3, max_iter=10, seed=11)
    asg = kmeans_assign(clustered_emb, cents)
    rows = asg.collect()
    by_group = {}
    for r in rows:
        by_group.setdefault(r.vec_id // 20, set()).add(r.cluster)
    # each planted group maps to exactly one k-means cluster, all distinct
    assert all(len(cs) == 1 for cs in by_group.values())
    assert len({next(iter(cs)) for cs in by_group.values()}) == 3


def test_kmeans_deterministic_under_repartition(clustered_emb):
    c1 = kmeans_fit(clustered_emb, k=3, max_iter=4, seed=11)
    c2 = kmeans_fit(clustered_emb.repartition(7), k=3, max_iter=4, seed=11)
    assert np.allclose(c1, c2, atol=1e-9)


def test_kmeans_k_exceeds_n_raises(spark):
    df = spark.createDataFrame(
        [(0, [0.0] * DIM), (1, [1.0] * DIM)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError):
        kmeans_fit(df, k=5, max_iter=1, seed=1)


def test_trained_centroids_feed_semantic_dedup(clustered_emb):
    """kmeans_fit -> semantic_neardup_pairs(centroids=...) finds every
    within-group pair (clusters align with the planted groups)."""
    cents = kmeans_fit(clustered_emb, k=3, max_iter=10, seed=11)
    sem = semantic_neardup_pairs(
        clustered_emb, threshold=0.999, centroids=cents
    )
    # 3 groups x C(20,2) pairs = 570, all same-cluster after training
    assert sem.count() == 570


def test_max_cluster_size_guard(clustered_emb):
    """Salt-splitting bounds per-cell pair cost; emitted pairs remain a
    subset of the unguarded set and exact duplicates still pair up
    within at least one cell often enough to dedup the planted groups."""
    full = {
        (r.vec_id, r.dup_id)
        for r in semantic_neardup_pairs(
            clustered_emb, threshold=0.999, n_clusters=4, seed=11
        ).collect()
    }
    capped_df = semantic_neardup_pairs(
        clustered_emb, threshold=0.999, n_clusters=4, seed=11,
        max_cluster_size=8,
    )
    capped = {(r.vec_id, r.dup_id) for r in capped_df.collect()}
    assert capped <= full
    assert len(capped) < len(full)  # the split really dropped cross-cell pairs
    assert len(capped) > 0
    # determinism under repartition (salt is hash-gated, not RNG)
    again = {
        (r.vec_id, r.dup_id)
        for r in semantic_neardup_pairs(
            clustered_emb.repartition(7), threshold=0.999, n_clusters=4,
            seed=11, max_cluster_size=8,
        ).collect()
    }
    assert again == capped


def test_assign_matmul_matches_literal(clustered_emb):
    """The scale-path closure-matmul assignment yields the same pair set
    as the oracle-pinned plan-literal assignment (well-separated data —
    no argmax ties)."""
    lit = {
        (r.vec_id, r.dup_id)
        for r in semantic_neardup_pairs(
            clustered_emb, threshold=0.999, n_clusters=4, seed=11,
            assign="literal",
        ).collect()
    }
    mat = {
        (r.vec_id, r.dup_id)
        for r in semantic_neardup_pairs(
            clustered_emb, threshold=0.999, n_clusters=4, seed=11,
            assign="matmul",
        ).collect()
    }
    assert mat == lit
    with pytest.raises(ValueError):
        semantic_neardup_pairs(
            clustered_emb, threshold=0.9, assign="bogus"
        ).count()


def test_pair_mode_matmul_matches_join(clustered_emb):
    """The GEMM pair scorer finds the same pair set as the JVM fold
    (cosines may differ in the last ulp; the planted data has margin)."""
    join_pairs = {
        (r.vec_id, r.dup_id)
        for r in semantic_neardup_pairs(
            clustered_emb, threshold=0.999, n_clusters=4, seed=11,
            pair_mode="join",
        ).collect()
    }
    mm = semantic_neardup_pairs(
        clustered_emb, threshold=0.999, n_clusters=4, seed=11,
        pair_mode="matmul",
    )
    mm_pairs = {(r.vec_id, r.dup_id) for r in mm.collect()}
    assert mm_pairs == join_pairs
    assert all(r.cosine >= 0.999 for r in mm.collect())
    with pytest.raises(ValueError):
        semantic_neardup_pairs(
            clustered_emb, threshold=0.9, pair_mode="bogus"
        ).count()


def test_pair_mode_matmul_with_cap(clustered_emb):
    """GEMM scorer composes with the salt-split guard (grouping keys
    include the cell)."""
    out = semantic_neardup_pairs(
        clustered_emb, threshold=0.999, n_clusters=4, seed=11,
        pair_mode="matmul", max_cluster_size=8,
    )
    rows = out.collect()
    assert len(rows) > 0
    assert all(r.vec_id < r.dup_id for r in rows)


def test_quantize_embeddings_roundtrip(spark):
    from graph_data_science_spark.pipeline.ann import quantize_embeddings

    rng = np.random.Generator(np.random.PCG64(5))
    rows = [(i, [float(x) for x in rng.standard_normal(DIM)]) for i in range(30)]
    rows.append((30, [0.0] * DIM))  # zero vector
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = {r.vec_id: r for r in quantize_embeddings(emb).collect()}
    assert len(q) == 31
    for vid, vec in rows:
        r = q[vid]
        assert all(-127 <= x <= 127 for x in r.qvec)
        # dequantization error bounded by half a quantization step
        for orig, qi in zip(vec, r.qvec):
            assert abs(qi * r.scale - orig) <= r.scale / 2 + 1e-12
    assert q[30].scale == 1.0 and all(x == 0 for x in q[30].qvec)


def test_quantized_topk_matches_exact_ranking(spark, clustered_emb):
    from graph_data_science_spark.pipeline.ann import (
        cosine_topk_bruteforce,
        cosine_topk_quantized,
    )

    # isotropic vectors: neighbor cosine gaps are far above the int8
    # resolution, so the quantized ranking must match the float ranking
    rng = np.random.Generator(np.random.PCG64(21))
    iso = spark.createDataFrame(
        [(i, [float(x) for x in rng.standard_normal(DIM)]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    exact = {
        (r.vec_id, r.neighbor_id)
        for r in cosine_topk_bruteforce(iso, k=3).collect()
    }
    quant = {
        (r.vec_id, r.neighbor_id)
        for r in cosine_topk_quantized(iso, k=3).collect()
    }
    assert len(quant) == len(exact)
    assert len(exact & quant) / len(exact) >= 0.9

    # tight clusters: within-cluster cosines differ by less than one
    # quantization step (ranking there is legitimately tie-broken
    # differently), but every quantized neighbor must still come from
    # the caller's own planted cluster
    q = cosine_topk_quantized(clustered_emb, k=5).collect()
    assert all(r.vec_id // 20 == r.neighbor_id // 20 for r in q)
    assert all(r.cosine > 0.99 for r in q)
