"""Execution-mode layer: stream / stats / mutate / write (+ estimate).

Every GDS algorithm ships these modes (ref: proc/common/.../AlgoBaseProc.
java:62-309, StreamProc/StatsProc/MutateProc/WriteProc). Spark mapping:
- stream  → the result DataFrame itself (lazy),
- stats   → one aggregate plan over it (histogram fields mirror
  algo-common/.../AbstractCommunityResultBuilder.java:50-62:
  min/mean/max/p50/p75/p90/p95/p99/p999 + count),
- mutate  → attach as a vertex property on the cataloged graph,
- write   → persist to parquet/Iceberg,
- estimate→ cheap size model (rows × width); Spark spills, so this is a
  UX-parity report, not an admission gate (ref estimation framework:
  core/.../mem/MemoryEstimations.java:167-290).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .catalog import GraphCatalog
from .graph import Graph

_PCTS = (0.5, 0.75, 0.9, 0.95, 0.99, 0.999)


def community_stats(result: DataFrame, community_col: str = "component") -> dict:
    """componentCount/communityCount + community-size histogram."""
    sizes = result.groupBy(community_col).agg(F.count(F.lit(1)).alias("size"))
    aggs = [
        F.count(F.lit(1)).alias("communityCount"),
        F.min("size").alias("min"),
        F.mean("size").alias("mean"),
        F.max("size").alias("max"),
    ] + [
        F.expr(f"percentile_approx(size, {p})").alias(
            f"p{str(p).replace('0.', '')}"
        )
        for p in _PCTS
    ]
    return sizes.agg(*aggs).collect()[0].asDict()


def centrality_stats(result: DataFrame, score_col: str = "score") -> dict:
    aggs = [
        F.min(score_col).alias("min"),
        F.mean(score_col).alias("mean"),
        F.max(score_col).alias("max"),
    ] + [
        F.expr(f"percentile_approx({score_col}, {p})").alias(
            f"p{str(p).replace('0.', '')}"
        )
        for p in _PCTS
    ]
    return result.agg(*aggs).collect()[0].asDict()


def stream(result: DataFrame) -> DataFrame:
    return result


def mutate(
    catalog: GraphCatalog, graph_name: str, property_name: str, result: DataFrame
) -> Graph:
    return catalog.mutate_node_property(graph_name, property_name, result)


def write(result: DataFrame, path: str) -> int:
    result.write.mode("overwrite").parquet(path)
    return result.count()


_TYPE_WIDTHS = {
    "long": 8, "bigint": 8, "double": 8, "int": 4, "integer": 4,
    "float": 4, "boolean": 1, "string": 32,
}


def estimate(
    graph: Graph, algorithm: str | None = None, **config
) -> dict:
    """Memory estimate à la gds.<algo>.estimate.

    With ``algorithm`` given, delegates to the per-algorithm estimation
    trees (``estimation.estimate_algorithm`` — ref per-algo factories via
    core/.../mem/MemoryEstimations.java:167-290). Without it, falls back
    to the generic pregel-state model."""
    from .estimation import estimate_graph

    if algorithm is None:
        algorithm = "pregel"
        config.setdefault(
            "state_doubles", config.pop("doubles_per_node", 2)
        )
    return estimate_graph(graph, algorithm, **config)
