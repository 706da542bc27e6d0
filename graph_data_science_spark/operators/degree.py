"""Degree centrality (gds.degree.*).

Semantics (ref: algo/.../degree/DegreeCentrality.java:63-85,117-126):
- unweighted: out-degree under the graph's orientation (NATURAL = out,
  REVERSE = in, UNDIRECTED = both),
- weighted: sum of **positive** relationship weights only.

Pure one-shuffle groupBy with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph


def degree_centrality(graph: Graph, *, weighted: bool = False) -> DataFrame:
    """(internal_id long, score double); isolated vertices score 0."""
    deg = graph.out_degrees(weighted=weighted)
    return deg.select("internal_id", F.col("degree").alias("score"))
