"""Triangle counting, triangle streaming, local clustering coefficient.

Reference semantics (Neo4j GDS ~1.6):
- requires an UNDIRECTED graph; each triangle {a,b,c} counted once via id
  ordering (ref: algo/.../triangle/IntersectingTriangleCount.java:129-178),
- self-loops never form triangles; parallel edges don't double-count
  (merge-intersection dedup, ref: triangle/intersect/GraphIntersect.java:57-160),
- ``max_degree`` excludes hubs — excluded nodes report -1 and their
  triangles are not counted (ref: IntersectingTriangleCount.java:58,160-163,
  config TriangleCountBaseConfig.java:36-46),
- LCC: ``C(v) = 2*T(v) / (deg(v) * (deg(v)-1))``, 0 when degree < 2; degree
  excludes parallel edges on multigraphs
  (ref: triangle/LocalClusteringCoefficient.java:85-129).

Spark-first execution (NOT the reference's cursor machinery): canonicalize
the undirected edge set to unique ``a < b`` pairs, then **degree-order**
each edge (low-degree endpoint first, ties by id). Every edge is then
joined only "upward", so the self-join fan-out per vertex is bounded by
O(sqrt(|E|)) arboricity-style instead of max-degree — the standard
scalable formulation of triangle listing on MapReduce/Spark systems.
Two broadcast-free shuffle joins total; AQE handles residual skew.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph


@dataclass
class TriangleCountResult:
    per_node: DataFrame  # (internal_id long, triangles long) — -1 if excluded
    global_count: int


def _canonical_undirected(edges: DataFrame) -> DataFrame:
    """Unique a<b pairs, self-loops dropped, parallel edges collapsed."""
    return (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _distinct_degrees(canon: DataFrame) -> DataFrame:
    """(internal_id, deg) over the deduplicated undirected simple graph."""
    return (
        canon.select(F.col("a").alias("internal_id"))
        .unionAll(canon.select(F.col("b").alias("internal_id")))
        .groupBy("internal_id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def _oriented(
    canon: DataFrame, degrees: DataFrame, keep_deg: bool = False
) -> DataFrame:
    """Orient each undirected edge low-degree -> high-degree (ties: smaller
    id first). Returns (u, v) with u 'before' v in the total degree order;
    with ``keep_deg`` also (dv,) the degree of v — the probe kernel
    orients wedge pairs locally from it, with no degree lookups."""
    da = degrees.select(F.col("internal_id").alias("a"), F.col("deg").alias("da"))
    db = degrees.select(F.col("internal_id").alias("b"), F.col("deg").alias("db"))
    e = canon.join(da, "a").join(db, "b")
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    cols = [
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    ]
    if keep_deg:
        cols.append(
            F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv")
        )
    return e.select(*cols)


def triangles_stream(
    graph: Graph, *, max_degree: int | None = None
) -> DataFrame:
    """Emit one row (node_a, node_b, node_c) per triangle
    (ref: alpha triangle/TriangleStream.java:51-200; same join plan as the
    count — the stream is a free by-product)."""
    canon = _canonical_undirected(graph.edges)
    degrees = _distinct_degrees(canon)
    if max_degree is not None:
        keep = degrees.filter(F.col("deg") <= max_degree).select(
            F.col("internal_id")
        )
        canon = (
            canon.join(keep.withColumnRenamed("internal_id", "a"), "a")
            .join(keep.withColumnRenamed("internal_id", "b"), "b")
        )
        degrees = _distinct_degrees(canon)
    o = _oriented(canon, degrees)
    e1 = o.select(F.col("u").alias("x"), F.col("v").alias("y"))
    e2 = o.select(F.col("u").alias("y"), F.col("v").alias("z"))
    e3 = o.select(F.col("u").alias("x"), F.col("v").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    return tri.select(
        F.least("x", "y", "z").alias("node_a"),
        F.when(
            (F.col("x") != F.least("x", "y", "z"))
            & (F.col("x") != F.greatest("x", "y", "z")),
            F.col("x"),
        )
        .when(
            (F.col("y") != F.least("x", "y", "z"))
            & (F.col("y") != F.greatest("x", "y", "z")),
            F.col("y"),
        )
        .otherwise(F.col("z"))
        .alias("node_b"),
        F.greatest("x", "y", "z").alias("node_c"),
    )


def triangle_count(
    graph: Graph, *, max_degree: int | None = None
) -> TriangleCountResult:
    """Per-node + global triangle counts over the undirected simple graph."""
    canon = _canonical_undirected(graph.edges)
    all_degrees = _distinct_degrees(canon)
    excluded = None
    if max_degree is not None:
        excluded = all_degrees.filter(F.col("deg") > max_degree).select(
            "internal_id"
        )
        keep = all_degrees.filter(F.col("deg") <= max_degree).select(
            "internal_id"
        )
        canon = (
            canon.join(keep.withColumnRenamed("internal_id", "a"), "a")
            .join(keep.withColumnRenamed("internal_id", "b"), "b")
        )
    strategy = os.environ.get("GDS_TRI_STRATEGY", "auto")
    use_probe = False
    use_dense = False
    if strategy != "join":
        from ..plans.tridense import dense_applicable
        from ..plans.triprobe import probe_applicable

        # canon feeds the gate count, the degree agg, and the orientation
        # join — materialize it once instead of re-deriving the upstream
        # pipeline per action
        canon = canon.localCheckpoint(eager=True)
        n_vertices = graph.node_count()
        n_edges = canon.count()
        # density-adaptive physical strategy: small dense graphs take the
        # blocked-GEMM kernel (work = V^3 BLAS MACs, no wedge
        # enumeration); everything else probes wedges against mmap'd key
        # blocks while per-host residency allows, else the pure
        # shuffle-join plan
        use_dense = strategy == "dense" or (
            strategy == "auto" and dense_applicable(n_vertices, n_edges)
        )
        if not use_dense:
            use_probe = strategy == "probe" or probe_applicable(
                n_vertices, n_edges
            )
    degrees = _distinct_degrees(canon)
    if use_dense:
        from ..plans.tridense import triangle_dense_counts

        per_corner = triangle_dense_counts(
            canon, graph.node_count(), graph.spark
        ).withColumnRenamed("vertex", "internal_id")
    elif use_probe:
        # block-probe kernel (plans/triprobe.py): no wedge shuffle —
        # wedges are generated and probed in numpy against mmap'd
        # per-bucket key blocks; only (vertex, count) rows move
        from ..plans.triprobe import triangle_probe_counts

        o = _oriented(canon, degrees, keep_deg=True)
        per_corner = triangle_probe_counts(
            o, n_vertices, graph.spark
        ).withColumnRenamed("vertex", "internal_id")
    else:
        o = _oriented(canon, degrees).localCheckpoint(eager=False)
        e1 = o.select(F.col("u").alias("x"), F.col("v").alias("y"))
        e2 = o.select(F.col("u").alias("y"), F.col("v").alias("z"))
        e3 = o.select(F.col("u").alias("x"), F.col("v").alias("z"))
        tri = e1.join(e2, "y").join(e3, ["x", "z"])

        # ONE pass over the wedge join: explode the 3 corners per
        # triangle row instead of unionAll of three selects (which
        # re-executes the two joins three times — measured 2-3x slower
        # on the dense co-supplier graph, where the join output is ~1e8
        # rows at sf0.1).
        corners = tri.select(
            F.explode(F.array("x", "y", "z")).alias("internal_id")
        )
        per_corner = corners.groupBy("internal_id").agg(
            F.count(F.lit(1)).alias("triangles")
        )
    per_node = (
        graph.vertices.select("internal_id")
        .join(per_corner, "internal_id", "left")
        .select(
            "internal_id",
            F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
        )
    )
    if excluded is not None:
        per_node = per_node.join(
            excluded.withColumn("__ex", F.lit(True)), "internal_id", "left"
        ).select(
            "internal_id",
            F.when(F.col("__ex"), F.lit(-1))
            .otherwise(F.col("triangles"))
            .cast("long")
            .alias("triangles"),
        )
    per_node = per_node.cache()
    global_count = per_node.filter(F.col("triangles") > 0).agg(
        (F.sum("triangles") / 3).cast("long")
    ).collect()[0][0]
    return TriangleCountResult(per_node=per_node, global_count=int(global_count or 0))


def local_clustering_coefficient(
    graph: Graph,
    *,
    max_degree: int | None = None,
    triangle_counts: DataFrame | None = None,
) -> DataFrame:
    """(internal_id, coefficient). Seeding from precomputed triangle counts
    mirrors gds.localClusteringCoefficient's seedProperty
    (ref: LocalClusteringCoefficient.java:74-76)."""
    canon = _canonical_undirected(graph.edges)
    degrees = _distinct_degrees(canon)
    if triangle_counts is None:
        triangle_counts = triangle_count(graph, max_degree=max_degree).per_node
    return (
        graph.vertices.select("internal_id")
        .join(triangle_counts, "internal_id", "left")
        .join(degrees, "internal_id", "left")
        .select(
            "internal_id",
            F.when(F.col("triangles") < 0, float("nan"))
            .when(
                (F.col("deg").isNull()) | (F.col("deg") < 2), F.lit(0.0)
            )
            .otherwise(
                2.0 * F.col("triangles") / (F.col("deg") * (F.col("deg") - 1))
            )
            .alias("coefficient"),
        )
    )


def average_clustering_coefficient(lcc: DataFrame) -> float:
    row = lcc.filter(~F.isnan("coefficient")).agg(
        F.avg("coefficient")
    ).collect()[0][0]
    return float(row or 0.0)


def balanced_triads(graph: Graph) -> DataFrame:
    """gds.alpha.balancedTriads.stream (ref alpha/alpha-proc/.../triangle/
    BalancedTriadsProc): per-node counts of balanced / unbalanced triads
    over the signed undirected graph — a triad is balanced iff the product
    of its three edge signs is positive.

    Parallel edges for a pair collapse by weight SUM; sign(0) counts as
    positive. Returns (internal_id, balanced long, unbalanced long).
    """
    e = graph.edges.select(
        F.least("src", "dst").alias("a"),
        F.greatest("src", "dst").alias("b"),
        F.col("weight"),
    ).filter(F.col("a") != F.col("b"))
    canon = (
        e.groupBy("a", "b")
        .agg(F.sum("weight").alias("w"))
        .select("a", "b", (F.col("w") >= 0).alias("pos"))
    )
    e1 = canon.select(F.col("a").alias("x"), F.col("b").alias("y"),
                      F.col("pos").alias("p1"))
    e2 = canon.select(F.col("a").alias("y"), F.col("b").alias("z"),
                      F.col("pos").alias("p2"))
    e3 = canon.select(F.col("a").alias("x"), F.col("b").alias("z"),
                      F.col("pos").alias("p3"))
    tri = (
        e1.join(e2, "y")
        .join(e3, ["x", "z"])
        .select(
            "x", "y", "z",
            # balanced ⇔ even number of negative signs ⇔ odd number of
            # positives among 3 ⇔ p1 XOR p2 XOR p3
            (F.col("p1") != (F.col("p2") != F.col("p3"))).alias("balanced"),
        )
    )
    corners = (
        tri.select(F.col("x").alias("internal_id"), "balanced")
        .unionAll(tri.select(F.col("y").alias("internal_id"), "balanced"))
        .unionAll(tri.select(F.col("z").alias("internal_id"), "balanced"))
    )
    counts = corners.groupBy("internal_id").agg(
        F.sum(F.when(F.col("balanced"), 1).otherwise(0)).alias("balanced"),
        F.sum(F.when(F.col("balanced"), 0).otherwise(1)).alias("unbalanced"),
    )
    return (
        graph.vertices.select("internal_id")
        .join(counts, "internal_id", "left")
        .select(
            "internal_id",
            F.coalesce("balanced", F.lit(0)).cast("long").alias("balanced"),
            F.coalesce("unbalanced", F.lit(0)).cast("long").alias(
                "unbalanced"
            ),
        )
    )


def triangle_count_approx(
    graph: Graph,
    *,
    p: float = 0.1,
    seed: int = 42,
) -> dict:
    """DOULION approximate GLOBAL triangle count (Tsourakakis, Kang,
    Miller & Faloutsos, KDD 2009): keep each undirected edge with
    probability ``p`` (here: deterministically, via the portable edge
    hash — reproducible on any cluster), count triangles on the sparse
    sample, scale by ``1/p^3``. Expected relative error ~
    ``1/(p * sqrt(T))`` on graphs with T triangles; the sample cuts
    both the edge volume (×p) and the wedge-join work (×~p^2), which is
    the point at 10^12-edge scale.

    Returns {estimate, sampled_triangles, p, sampled_edges}."""
    if not 0.0 < p <= 1.0:
        raise ValueError(f"p must be in (0, 1], got {p}")
    from ..graph import Graph as _G
    from ..pipeline.sampling import sample_hash, HASH_SPACE

    canon = _canonical_undirected(graph.edges)
    thr = int(p * HASH_SPACE)
    kept = canon.where(
        sample_hash(seed, F.col("a").cast("string"),
                    F.col("b").cast("string")) < thr
    ).select(F.col("a").alias("src"), F.col("b").alias("dst"))
    n_kept = kept.count()
    sub = _G(graph.vertices, kept)
    res = triangle_count(sub)
    return {
        "estimate": res.global_count / (p ** 3),
        "sampled_triangles": res.global_count,
        "p": p,
        "sampled_edges": n_kept,
    }
