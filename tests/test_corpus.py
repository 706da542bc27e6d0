"""Corpus synthesis + import-edge extraction (the input_hint path)."""

import hashlib

from pyspark.sql import functions as F

from graph_data_science_spark.sources.corpus import (
    content_sha256,
    expected_edges_closed_form,
    extract_import_edges,
    synthesize_corpus,
    verify_sha256,
)
from graph_data_science_spark.graph import from_edge_df

N_REPOS = 60


def test_corpus_schema_and_determinism(spark):
    c1 = synthesize_corpus(spark, N_REPOS).cache()
    assert c1.columns == ["repo", "path", "commit", "lang", "content"]
    assert c1.count() > N_REPOS  # multiple files for some repos
    # regeneration is bit-identical (sha256 per-row invariant)
    c2 = synthesize_corpus(spark, N_REPOS, num_partitions=3)
    assert verify_sha256(c2, content_sha256(c1)) == 0
    # spot-check sha256 against hashlib on the driver
    row = c1.orderBy("repo", "path").first()
    assert (
        hashlib.sha256(row["content"].encode()).hexdigest()
        == content_sha256(c1)
        .filter((F.col("repo") == row["repo"]) & (F.col("path") == row["path"]))
        .first()["sha256"]
    )


def test_extracted_edges_match_closed_form(spark):
    corpus = synthesize_corpus(spark, N_REPOS)
    edges = extract_import_edges(corpus)
    got = {
        (r["src"], r["dst"]): r["weight"] for r in edges.collect()
    }
    assert got == expected_edges_closed_form(N_REPOS)


def test_edge_table_to_graph(spark):
    corpus = synthesize_corpus(spark, N_REPOS)
    edges = extract_import_edges(corpus)
    g = from_edge_df(edges, weight="weight")
    assert g.vertices.columns == ["internal_id", "original_id"]
    n = g.node_count()
    ids = [r["internal_id"] for r in g.vertices.orderBy("internal_id").collect()]
    assert ids == list(range(n))  # dense, sorted assignment


def test_dense_fast_path_matches_generic_build(spark):
    """from_dense_edge_df == from_edge_df modulo the id space: same
    PageRank scores per original id, plus baseline scores for ids in
    [0, n) that never appear as endpoints (isolated vertices)."""
    from graph_data_science_spark.graph import from_dense_edge_df
    from graph_data_science_spark.operators.pagerank import pagerank
    from graph_data_science_spark.sources.corpus import repo_id_expr

    corpus = synthesize_corpus(spark, N_REPOS)
    edges = extract_import_edges(corpus)
    dense = edges.select(
        repo_id_expr("src").alias("src"),
        repo_id_expr("dst").alias("dst"),
        "weight",
    )
    # ids extracted from repo names are exactly the dense repo id
    assert {r["src"] for r in dense.select("src").distinct().collect()} <= set(
        range(N_REPOS)
    )

    g_fast = from_dense_edge_df(dense, n_vertices=N_REPOS, weight="weight")
    assert g_fast.node_count() == N_REPOS
    g_slow = from_edge_df(dense, weight="weight")

    def scores(g):
        out = pagerank(g, max_iterations=10).scores
        m = {
            r["original_id"]: r["internal_id"]
            for r in g.vertices.collect()
        }
        inv = {v: k for k, v in m.items()}
        return {
            inv[r["internal_id"]]: r["score"] for r in out.collect()
        }

    fast, slow = scores(g_fast), scores(g_slow)
    for oid, s in slow.items():
        assert abs(fast[oid] - s) < 1e-9, (oid, fast[oid], s)
