"""Borůvka spanning tree vs a Kruskal oracle; KNN over vertex vectors."""

import random

import numpy as np
from pyspark.sql import functions as F

from graph_data_science_spark.graph import UNDIRECTED, from_edge_list
from graph_data_science_spark.operators.knn import knn
from graph_data_science_spark.operators.spanningtree import spanning_tree


def _kruskal_weight(n, edges, maximum=False):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    total, used = 0.0, 0
    for w, a, b in sorted(
        ((e[2], e[0], e[1]) for e in edges), reverse=maximum
    ):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            total += w
            used += 1
    return total, used


def test_mst_simple(spark):
    edges = [(0, 1, 1.0), (1, 2, 2.0), (0, 2, 3.0), (2, 3, 1.5)]
    g = from_edge_list(spark, edges, orientation=UNDIRECTED)
    t = spanning_tree(g).collect()
    assert len(t) == 3
    assert abs(sum(r["weight"] for r in t) - 4.5) < 1e-12
    tmax = spanning_tree(g, maximum=True).collect()
    assert abs(sum(r["weight"] for r in tmax) - 6.5) < 1e-12


def test_mst_random_vs_kruskal(spark):
    rnd = random.Random(31)
    n = 40
    seen = set()
    edges = []
    for _ in range(160):
        a, b = rnd.randrange(n), rnd.randrange(n)
        if a != b and (min(a, b), max(a, b)) not in seen:
            seen.add((min(a, b), max(a, b)))
            edges.append((min(a, b), max(a, b), round(rnd.uniform(1, 9), 3)))
    g = from_edge_list(
        spark,
        [(f"{a:02d}", f"{b:02d}", w) for a, b, w in edges],
        orientation=UNDIRECTED,
        node_ids=[f"{i:02d}" for i in range(n)],
    )
    t = spanning_tree(g).collect()
    want_w, want_n = _kruskal_weight(n, edges)
    assert len(t) == want_n
    assert abs(sum(r["weight"] for r in t) - want_w) < 1e-9


def test_knn_over_vertex_vectors(spark):
    rng = np.random.default_rng(8)
    vecs = rng.standard_normal((30, 8))
    g = from_edge_list(
        spark, [(f"{i:02d}", f"{(i + 1) % 30:02d}") for i in range(30)],
        node_ids=[f"{i:02d}" for i in range(30)],
    )
    emb_df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        "internal_id long, emb array<double>",
    )
    g.vertices = g.vertices.join(emb_df, "internal_id")
    exact = knn(g, "emb", top_k=1, exact=True).collect()
    V = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    S = V @ V.T
    np.fill_diagonal(S, -np.inf)
    for r in exact:
        assert r["node2"] == int(np.argmax(S[r["node1"]]))
    approx = knn(g, "emb", top_k=1, tables=8, bits=4).collect()
    hits = sum(
        1 for r in approx if r["node2"] == int(np.argmax(S[r["node1"]]))
    )
    assert hits / 30 > 0.5


def test_knn_nn_descent_beats_lsh_seed(spark):
    """NN-Descent refinement: recall@k strictly dominates its own LSH
    seeding and lands near-exact on a small set."""
    import numpy as np

    rng = np.random.default_rng(17)
    n, d, k = 60, 12, 3
    vecs = rng.standard_normal((n, d))
    from graph_data_science_spark.pipeline.ann import (
        cosine_topk_bruteforce,
        cosine_topk_lsh,
        nn_descent_topk,
    )

    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    def pairs(df):
        return {(r["vec_id"], r["neighbor_id"]) for r in df.collect()}

    exact = pairs(cosine_topk_bruteforce(emb, k=k))
    seed = pairs(cosine_topk_lsh(emb, k=k, bits=8, tables=2, seed=5))
    refined = pairs(
        nn_descent_topk(emb, k=k, iterations=8, bits=8, tables=2, seed=5)
    )
    recall_seed = len(seed & exact) / len(exact)
    recall_ref = len(refined & exact) / len(exact)
    assert recall_ref >= recall_seed
    assert recall_ref > 0.9
