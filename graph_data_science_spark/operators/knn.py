"""KNN over node property vectors (gds.beta.knn, gds.alpha.ml.ann).

Three methods over ``pipeline.ann`` kernels:

- ``method="nn_descent"`` (default): the reference's NN-Descent
  (similarity/knn/Knn.java:45-244) — LSH-seeded kNN graph iteratively
  refined through neighbor-of-neighbor joins until the update count
  drops below delta·n·k, matching the reference's termination.
- ``method="lsh"``: one-shot random-hyperplane bucketing (cheapest).
- ``exact=True``: brute-force — the correctness baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from ..pipeline.ann import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    nn_descent_topk,
)


def knn(
    graph: Graph,
    property_name: str,
    *,
    top_k: int = 10,
    exact: bool = False,
    method: str = "nn_descent",
    iterations: int = 10,
    delta: float = 0.001,
    bits: int = 8,
    tables: int = 4,
    seed: int = 5,
) -> DataFrame:
    """(node1, node2, similarity) — cosine over a vector vertex property."""
    emb = graph.vertices.select(
        F.col("internal_id").alias("vec_id"),
        F.col(property_name).alias("embedding"),
    )
    if exact:
        out = cosine_topk_bruteforce(emb, k=top_k)
    elif method == "nn_descent":
        out = nn_descent_topk(
            emb, k=top_k, iterations=iterations, delta=delta,
            bits=bits, tables=min(tables, 2), seed=seed,
        )
    else:
        out = cosine_topk_lsh(
            emb, k=top_k, bits=bits, tables=tables, seed=seed
        )
    return out.select(
        F.col("vec_id").alias("node1"),
        F.col("neighbor_id").alias("node2"),
        F.col("cosine").alias("similarity"),
    )


def filtered_knn(
    graph: Graph,
    property_name: str,
    *,
    top_k: int = 10,
    source_ids: DataFrame | None = None,
    target_ids: DataFrame | None = None,
) -> DataFrame:
    """gds.alpha.knn.filtered semantics (GDS 2.x): top-k cosine
    neighbors restricted to node1 ∈ sources, node2 ∈ targets — the
    target restriction applies BEFORE the per-source top-k, so each
    source ranks its k best among the allowed candidates only.

    Runs the exact cross-set brute-force kernel (query rows × candidate
    rows); use the unfiltered :func:`knn` NN-Descent/LSH paths when no
    filter shrinks the problem. Filters are single-column DataFrames of
    internal ids."""
    emb = graph.vertices.select(
        F.col("internal_id").alias("vec_id"),
        F.col(property_name).alias("embedding"),
    )
    q = emb
    if source_ids is not None:
        q = emb.join(
            source_ids.toDF("vec_id").distinct(), "vec_id", "left_semi"
        )
    db = emb
    if target_ids is not None:
        db = emb.join(
            target_ids.toDF("vec_id").distinct(), "vec_id", "left_semi"
        )
    out = cosine_topk_bruteforce(q, k=top_k, database=db)
    return out.select(
        F.col("vec_id").alias("node1"),
        F.col("neighbor_id").alias("node2"),
        F.col("cosine").alias("similarity"),
    )
