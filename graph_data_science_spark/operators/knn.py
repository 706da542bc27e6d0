"""KNN over node property vectors (gds.beta.knn, gds.alpha.ml.ann).

The reference's NN-Descent (similarity/knn/Knn.java:45-244) is an
iterative neighbor-of-neighbor refinement. On Spark, random-hyperplane
LSH bucketing (+ optional refinement rounds) reaches the same
approximate-top-k contract with shuffle-join mechanics; the exact
brute-force path is the correctness baseline. Both reuse
``pipeline.ann`` kernels over the vertex property column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from ..pipeline.ann import cosine_topk_bruteforce, cosine_topk_lsh


def knn(
    graph: Graph,
    property_name: str,
    *,
    top_k: int = 10,
    exact: bool = False,
    bits: int = 8,
    tables: int = 4,
    seed: int = 5,
) -> DataFrame:
    """(node1, node2, similarity) — cosine over a vector vertex property."""
    emb = graph.vertices.select(
        F.col("internal_id").alias("vec_id"),
        F.col(property_name).alias("embedding"),
    )
    fn = cosine_topk_bruteforce if exact else cosine_topk_lsh
    kwargs = {} if exact else {"bits": bits, "tables": tables, "seed": seed}
    out = fn(emb, k=top_k, **kwargs)
    return out.select(
        F.col("vec_id").alias("node1"),
        F.col("neighbor_id").alias("node2"),
        F.col("cosine").alias("similarity"),
    )
