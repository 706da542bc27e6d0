"""Link-graph analytics end-to-end: corpus -> edges -> algorithms.

Synthesizes a deterministic (repo, path, commit, lang, content) corpus,
extracts cross-repo import edges, and runs the north-star algorithm
suite on the dependency graph.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_data_science_spark.graph import from_dense_edge_df
from graph_data_science_spark.operators.hyperanf import effective_diameter
from graph_data_science_spark.operators.kcore import k_core
from graph_data_science_spark.operators.labelprop import label_propagation
from graph_data_science_spark.operators.pagerank import pagerank
from graph_data_science_spark.operators.triangle import triangle_count
from graph_data_science_spark.operators.wcc import wcc
from graph_data_science_spark.plans.fused import build_bucketed_csr
from graph_data_science_spark.session import get_spark
from graph_data_science_spark.sources.corpus import (
    extract_import_edges,
    repo_id_expr,
    synthesize_corpus,
    verify_sha256,
    content_sha256,
)

N_REPOS = 20_000

spark = get_spark("example-link-graph", master="local[8]",
                  shuffle_partitions=16)
spark.sparkContext.setLogLevel("ERROR")

corpus = synthesize_corpus(spark, N_REPOS)
expected = content_sha256(corpus)
assert verify_sha256(corpus, expected) == 0  # per-row invariant

edges = extract_import_edges(corpus).localCheckpoint(eager=True)
dense = edges.select(
    repo_id_expr("src").alias("src"), repo_id_expr("dst").alias("dst"),
    "weight",
)
g = from_dense_edge_df(dense, n_vertices=N_REPOS, weight="weight")
print(f"graph: {g.node_count():,} nodes, {g.relationship_count():,} edges")

csr = build_bucketed_csr(g.edges, g.node_count())
pr = pagerank(g, tolerance=0.0, l1_tolerance=1e-6 * g.node_count(),
              max_iterations=100, csr=csr)
print(f"pagerank: converged={pr.converged} in {pr.ran_iterations} supersteps")
pr.scores.orderBy("score", ascending=False).show(5)

print("wcc components:",
      wcc(g).select("component").distinct().count())
print("label propagation communities:",
      label_propagation(g, max_iterations=10)
      .select("label").distinct().count())
tri = triangle_count(g)
print("global triangle count:", tri.global_count)
tri.per_node.orderBy("triangles", ascending=False).show(5)
cores = k_core(g)
print("max coreness:", cores.agg({"core": "max"}).collect()[0][0])
print("effective diameter:",
      effective_diameter(g, q=0.9)["effective_diameter"])
csr.cleanup()
spark.stop()
