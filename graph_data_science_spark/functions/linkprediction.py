"""Link-prediction pair measures (gds.alpha.linkprediction.*, ref:
alpha/alpha-proc/.../linkprediction/{AdamicAdarFunc, CommonNeighborsFunc,
PreferentialAttachmentFunc, ResourceAllocationFunc, SameCommunityFunc,
TotalNeighborsFunc}).

The reference computes one pair at a time; at Spark scale the useful
surface is the *pairwise table*: every function returns
(node1, node2, <measure>) for all pairs sharing >= 1 neighbor (or all
requested pairs), computed with one wedge join + aggregation.

Neighborhoods are undirected (GDS defaults to BOTH direction for these).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph


def _sym(graph: Graph) -> DataFrame:
    e = graph.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    return (
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
    )


def _wedges(sym: DataFrame) -> DataFrame:
    n1 = sym.select(F.col("src").alias("node1"), F.col("dst").alias("z"))
    n2 = sym.select(F.col("src").alias("node2"), F.col("dst").alias("z"))
    return n1.join(n2, "z").filter(F.col("node1") < F.col("node2"))


def common_neighbors_pairs(graph: Graph) -> DataFrame:
    return (
        _wedges(_sym(graph))
        .groupBy("node1", "node2")
        .agg(F.count(F.lit(1)).cast("long").alias("score"))
    )


def adamic_adar_pairs(graph: Graph) -> DataFrame:
    sym = _sym(graph)
    deg = sym.groupBy(F.col("src").alias("z")).agg(
        F.count(F.lit(1)).alias("dz")
    )
    return (
        _wedges(sym)
        .join(deg, "z")
        .filter(F.col("dz") > 1)
        .groupBy("node1", "node2")
        .agg(F.sum(1.0 / F.log("dz")).alias("score"))
    )


def resource_allocation_pairs(graph: Graph) -> DataFrame:
    sym = _sym(graph)
    deg = sym.groupBy(F.col("src").alias("z")).agg(
        F.count(F.lit(1)).alias("dz")
    )
    return (
        _wedges(sym)
        .join(deg, "z")
        .groupBy("node1", "node2")
        .agg(F.sum(1.0 / F.col("dz")).alias("score"))
    )


def preferential_attachment_pairs(graph: Graph) -> DataFrame:
    """deg(a) * deg(b) for all pairs sharing a neighbor (the score itself
    needs only degrees; pair universe = co-neighbor pairs)."""
    sym = _sym(graph)
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    pairs = _wedges(sym).select("node1", "node2").distinct()
    d1 = deg.select(F.col("src").alias("node1"), F.col("deg").alias("d1"))
    d2 = deg.select(F.col("src").alias("node2"), F.col("deg").alias("d2"))
    return (
        pairs.join(d1, "node1")
        .join(d2, "node2")
        .select(
            "node1", "node2",
            (F.col("d1") * F.col("d2")).cast("double").alias("score"),
        )
    )


def total_neighbors_pairs(graph: Graph) -> DataFrame:
    """|N(a) ∪ N(b)| = deg(a) + deg(b) - common."""
    sym = _sym(graph)
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    common = common_neighbors_pairs(graph)
    d1 = deg.select(F.col("src").alias("node1"), F.col("deg").alias("d1"))
    d2 = deg.select(F.col("src").alias("node2"), F.col("deg").alias("d2"))
    return (
        common.join(d1, "node1")
        .join(d2, "node2")
        .select(
            "node1", "node2",
            (F.col("d1") + F.col("d2") - F.col("score"))
            .cast("long")
            .alias("score"),
        )
    )


def same_community_pairs(
    communities: DataFrame, pairs: DataFrame
) -> DataFrame:
    """(node1, node2, score 0/1) given (internal_id, community)."""
    c1 = communities.select(
        F.col("internal_id").alias("node1"), F.col("community").alias("c1")
    )
    c2 = communities.select(
        F.col("internal_id").alias("node2"), F.col("community").alias("c2")
    )
    return (
        pairs.join(c1, "node1")
        .join(c2, "node2")
        .select(
            "node1", "node2",
            (F.col("c1") == F.col("c2")).cast("long").alias("score"),
        )
    )
