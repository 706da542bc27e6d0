"""Random graph generation (gds.beta.graph.generate).

Reference semantics (core/.../beta/generator/RandomGraphGenerator.java:57,
RelationshipDistribution.java:29-53, config
RandomGraphGeneratorConfig.java:46-108):
- nodeCount, averageDegree, distribution UNIFORM | RANDOM | POWER_LAW,
  relationship property producer (FIXED | RANDOM), seeded.
- UNIFORM: every node exactly averageDegree out-edges, targets uniform.
- RANDOM: out-degree ~ Gaussian around averageDegree (clamped >= 0).
- POWER_LAW: out-degree power-law-ish with mean ~ averageDegree.

Spark-first: ``spark.range(n)`` fanned through ``mapInPandas``; every
row's degree/targets derive from a per-node-id-seeded PCG64 stream, so the
graph is identical at any partitioning/parallelism.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..graph import Graph

UNIFORM = "UNIFORM"
RANDOM = "RANDOM"
POWER_LAW = "POWER_LAW"


def generate_graph(
    spark: SparkSession,
    node_count: int,
    average_degree: int,
    *,
    distribution: str = UNIFORM,
    seed: int = 42,
    weight_range: tuple[float, float] | None = None,
    num_partitions: int | None = None,
) -> Graph:
    distribution = distribution.upper()
    if distribution not in (UNIFORM, RANDOM, POWER_LAW):
        raise ValueError(f"unknown distribution {distribution!r}")
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 2)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            srcs, dsts, ws = [], [], []
            for nid in pdf["id"].to_numpy(np.int64):
                rng = np.random.Generator(
                    np.random.PCG64([seed, int(nid)])
                )
                if distribution == UNIFORM:
                    deg = average_degree
                elif distribution == RANDOM:
                    deg = max(
                        0,
                        int(
                            round(
                                rng.normal(
                                    average_degree, average_degree / 2
                                )
                            )
                        ),
                    )
                else:  # POWER_LAW, mean ~ average_degree
                    deg = min(
                        int(rng.pareto(2.0) * average_degree / 2) + 1,
                        node_count - 1,
                    )
                if deg == 0:
                    continue
                t = rng.integers(0, node_count, size=deg)
                srcs.append(np.full(deg, nid, dtype=np.int64))
                dsts.append(t.astype(np.int64))
                if weight_range is not None:
                    lo, hi = weight_range
                    ws.append(rng.uniform(lo, hi, size=deg))
                else:
                    ws.append(np.ones(deg))
            if not srcs:
                yield pd.DataFrame(
                    {"src": pd.Series(dtype="int64"),
                     "dst": pd.Series(dtype="int64"),
                     "weight": pd.Series(dtype="float64")}
                )
                continue
            yield pd.DataFrame(
                {
                    "src": np.concatenate(srcs),
                    "dst": np.concatenate(dsts),
                    "weight": np.concatenate(ws),
                }
            )

    edges = spark.range(0, node_count, 1, num_partitions).mapInPandas(
        gen, "src long, dst long, weight double"
    )
    from pyspark.sql import functions as F

    vertices = spark.range(node_count).select(
        F.col("id").alias("internal_id"), F.col("id").alias("original_id")
    )
    return Graph(vertices, edges, meta={"generator": distribution, "seed": seed})
