"""K-Means node clustering (gds.kmeans, GDS 2.x surface — absent from
the ~1.6 reference; precedent: gds.beta.kmeans operates on a vector
node property and streams communityId / distanceFromCentroid /
silhouette).

Backed by the pipeline's distributed Lloyd's iteration
(``pipeline/ann.kmeans_fit``: deterministic hash-gate init, one job
per iteration, k×dim partial-sum shuffle — never vectors to the
driver) plus a single Arrow pass computing per-node distance and the
simplified (centroid-based) silhouette: a = distance to own centroid,
b = min distance to any other centroid, s = (b − a) / max(a, b) — the
same simplification GDS documents for its silhouette computation.

Centroid means sum floats in shuffle order, so exact values are stable
only to the last ulp across cluster layouts; verify structurally
(every node nearest its own centroid), not by value hash.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from ..pipeline.ann import kmeans_fit


def kmeans(
    graph: Graph,
    property_name: str,
    *,
    k: int = 10,
    max_iterations: int = 10,
    seed: int = 11,
    compute_silhouette: bool = False,
) -> DataFrame:
    """(internal_id, community, distance_from_centroid[, silhouette])."""
    emb = graph.vertices.select(
        F.col("internal_id").alias("vec_id"),
        F.col(property_name).cast("array<double>").alias("v"),
    )
    cents = kmeans_fit(
        emb, k=k, max_iter=max_iterations, seed=seed,
        id_col="vec_id", vec_col="v",
    )
    half_sq = 0.5 * (cents * cents).sum(axis=1)
    cents_t = cents.T.copy()
    with_sil = compute_silhouette

    def tag(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf["v"].to_numpy())
            # squared distances to every centroid via one matmul
            d2 = (
                (m * m).sum(axis=1)[:, None]
                - 2.0 * (m @ cents_t)
                + 2.0 * half_sq[None, :]
            )
            np.maximum(d2, 0.0, out=d2)
            own = d2.argmin(axis=1)
            a = np.sqrt(d2[np.arange(len(m)), own])
            out = {
                "internal_id": pdf["vec_id"],
                "community": own.astype(np.int64),
                "distance_from_centroid": a,
            }
            if with_sil:
                if d2.shape[1] == 1:  # k=1: silhouette degenerates to 0
                    b = a.copy()
                else:
                    d2[np.arange(len(m)), own] = np.inf
                    b = np.sqrt(d2.min(axis=1))
                denom = np.maximum(a, b)
                sil = np.where(denom > 0, (b - a) / denom, 0.0)
                out["silhouette"] = sil
            yield pd.DataFrame(out)

    schema = (
        "internal_id long, community long, distance_from_centroid double"
    )
    if with_sil:
        schema += ", silhouette double"
    return emb.mapInPandas(tag, schema)
