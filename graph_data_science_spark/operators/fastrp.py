"""FastRP node embeddings (gds.fastRP.*).

Reference semantics (gds/embeddings/fastrp/FastRP.java:46-447, config
FastRPBaseConfig.java:47-71): very sparse random projection init
(entries ±sqrt(3) w.p. 1/6 each, 0 w.p. 2/3 — Achlioptas projections),
optional degree scaling ``deg^normalizationStrength``; L iterations of
neighbor-mean propagation, each intermediate L2-normalized; final
embedding = Σ_t iterationWeights[t] · e_t. Default iterationWeights
[0.0, 1.0, 1.0], embeddingDimension 128 in GDS.

Spark-first: init vectors are a *hash function of (seed, node_id, dim)* —
no RNG state, so any partition regenerates identically (same trick as the
corpus generator). Neighbor-mean aggregation runs in ``applyInPandas``
over dst-grouped messages (numpy vector sums inside Arrow batches);
weights multiply before the mean (weighted variant).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..graph import Graph

SQRT3 = float(np.sqrt(3.0))


def _init_vectors(vertices: DataFrame, dim: int, seed: int) -> DataFrame:
    """(internal_id, vec array<double>): hash-based sparse projections."""

    def gen(it):
        for pdf in it:
            ids = pdf["internal_id"].to_numpy(np.int64)
            # deterministic per (seed, id, dim): splitmix-style mix
            d = np.arange(dim, dtype=np.uint64)[None, :]
            x = (
                ids.astype(np.uint64)[:, None] * np.uint64(0x9E3779B97F4A7C15)
                + d * np.uint64(0xBF58476D1CE4E5B9)
                + np.uint64(seed & 0xFFFFFFFF) * np.uint64(0x94D049BB133111EB)
            )
            x ^= x >> np.uint64(30)
            x *= np.uint64(0xD6E8FEB86659FD93)
            x ^= x >> np.uint64(27)
            u = (x & np.uint64(0xFFFFFFFF)).astype(np.float64) / float(1 << 32)
            vec = np.where(
                u < 1 / 6, SQRT3, np.where(u < 2 / 6, -SQRT3, 0.0)
            )
            yield pd.DataFrame(
                {"internal_id": ids, "vec": [v for v in vec]}
            )

    return vertices.select("internal_id").mapInPandas(
        gen, "internal_id long, vec array<double>"
    )


def _l2_normalize_rows(df: DataFrame, col: str = "vec") -> DataFrame:
    def norm(it):
        for pdf in it:
            m = np.stack(pdf[col].to_numpy())
            n = np.linalg.norm(m, axis=1, keepdims=True)
            n[n == 0] = 1.0
            m = m / n
            yield pd.DataFrame(
                {"internal_id": pdf["internal_id"], col: [r for r in m]}
            )

    return df.mapInPandas(norm, f"internal_id long, {col} array<double>")


def fastrp(
    graph: Graph,
    *,
    embedding_dim: int = 64,
    iteration_weights: tuple[float, ...] = (0.0, 1.0, 1.0),
    normalization_strength: float = 0.0,
    weighted: bool = False,
    seed: int = 42,
) -> DataFrame:
    """(internal_id, embedding array<double>)."""
    emb = _init_vectors(graph.vertices, embedding_dim, seed)
    if normalization_strength != 0.0:
        deg = graph.out_degrees(weighted=weighted)

        def scale(it):
            for pdf in it:
                m = np.stack(pdf["vec"].to_numpy())
                d = pdf["degree"].to_numpy(np.float64)
                d[d == 0] = 1.0
                m = m * (d[:, None] ** normalization_strength)
                yield pd.DataFrame(
                    {"internal_id": pdf["internal_id"], "vec": [r for r in m]}
                )

        emb = emb.join(deg, "internal_id").mapInPandas(
            scale, "internal_id long, vec array<double>"
        )
    emb = _l2_normalize_rows(emb).localCheckpoint(eager=True)

    edges = graph.edges.select(
        "src", "dst",
        (F.col("weight") if weighted else F.lit(1.0)).alias("w"),
    ).localCheckpoint(eager=False)

    acc = None
    cur = emb
    for t, iw in enumerate(iteration_weights):
        if t > 0:
            msgs = edges.join(
                cur.withColumnRenamed("internal_id", "src"), "src"
            ).select(F.col("dst").alias("internal_id"), "vec", "w")

            def mean_agg(key, pdf: pd.DataFrame):
                m = np.stack(pdf["vec"].to_numpy())
                w = pdf["w"].to_numpy(np.float64)[:, None]
                tot = float(pdf["w"].sum())
                v = (m * w).sum(axis=0) / (tot if tot else 1.0)
                return pd.DataFrame(
                    {"internal_id": [key[0]], "vec": [v]}
                )

            agg = msgs.groupBy("internal_id").applyInPandas(
                mean_agg, "internal_id long, vec array<double>"
            )
            cur = (
                graph.vertices.select("internal_id")
                .join(agg, "internal_id", "left")
                .select(
                    "internal_id",
                    F.coalesce(
                        "vec",
                        F.array(*[F.lit(0.0)] * embedding_dim),
                    ).alias("vec"),
                )
            )
            cur = _l2_normalize_rows(cur).localCheckpoint(eager=True)
        if iw != 0.0:
            contrib = cur.select(
                "internal_id",
                F.transform("vec", lambda x: x * iw).alias("vec"),
            )
            if acc is None:
                acc = contrib
            else:
                joined = acc.withColumnRenamed("vec", "a").join(
                    contrib.withColumnRenamed("vec", "b"), "internal_id"
                )
                acc = joined.select(
                    "internal_id",
                    F.zip_with("a", "b", lambda x, y: x + y).alias("vec"),
                ).localCheckpoint(eager=True)

    if acc is None:
        acc = cur
    return acc.select("internal_id", F.col("vec").alias("embedding"))
