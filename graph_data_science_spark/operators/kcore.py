"""K-core decomposition via distributed h-index iteration.

Coreness c(v): the largest k such that v belongs to a maximal subgraph
of minimum degree k — the standard link-graph density peel (spam rings,
crawl-frontier prioritization, community cores). The reference (Neo4j
GDS ~1.6) does not ship k-core (it arrived in GDS 2.x); this follows
the published distributed formulation instead of sequential peeling:

    Lü et al. 2016, "The H-index of a network node and its relation to
    degree and coreness" (Nature Communications 7:10168): iterating
    c_{t+1}(v) = H({c_t(u) : u ~ v}) from c_0(v) = deg(v) converges
    monotonically (non-increasing) to the coreness for every node.

Spark-first shape: each round is ONE shuffle — join current cores onto
the symmetrized edge list, then per vertex compute the h-index as
``max(least(rank, value))`` over neighbors ranked by value descending
(a window, no UDF). Rounds needed are tiny in practice (O(log n)-ish on
real graphs; bounded by the peeling depth); every value is integer, so
the whole run — including the convergence fixpoint — replays exactly in
ANSI SQL, unlike sequential peeling whose order is engine-internal.

Scale notes: the per-round join shuffles (src) and the window shuffles
(dst) — 2 exchanges of (long, long) rows per round; plan growth is
truncated by loop_checkpoint. Skewed hubs concentrate one vertex's
neighbor values on one task; at 10^9-edge hubs pre-aggregate equal
values (value, count) before ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..graph import Graph
from ..plans.checkpoint import loop_checkpoint


def _sym_simple_edges(graph: Graph) -> DataFrame:
    """Undirected simple edge set: both directions, self-loops dropped,
    parallel edges collapsed (degree = #distinct neighbors, the k-core
    convention)."""
    e = graph.edges.select("src", "dst")
    return (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def h_index_col(win: Window) -> "F.Column":
    """h-index over a window of integer ``value`` rows: with values
    ranked descending, h = max(min(rank, value))."""
    r = F.row_number().over(win)
    return F.max(F.least(r, F.col("value")))


def k_core(
    graph: Graph,
    *,
    max_iterations: int = 100,
    metrics_out: dict | None = None,
) -> DataFrame:
    """Returns (internal_id long, core long) for every vertex.

    Isolated vertices (no edges after self-loop removal) have core 0.
    Raises if the h-index iteration has not reached its fixpoint within
    ``max_iterations`` (the fixpoint IS the coreness; a partial result
    is not a valid decomposition). ``metrics_out["iterations"]`` reports
    the rounds used."""
    edges = _sym_simple_edges(graph).localCheckpoint(eager=True)
    cores = (
        edges.groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).cast("long").alias("core"))
    ).localCheckpoint(eager=True)

    win = Window.partitionBy("dst").orderBy(
        F.col("value").desc(), F.col("src").asc()
    )
    converged = False
    it = 0
    for it in range(1, max_iterations + 1):
        nbr = edges.join(
            cores.select(F.col("id").alias("src"), F.col("core").alias("value")),
            "src",
        )
        new = (
            nbr.select("dst", "src", "value")
            .withColumn("__h", F.least(F.row_number().over(win), F.col("value")))
            .groupBy(F.col("dst").alias("id"))
            .agg(F.max("__h").cast("long").alias("core"))
        )
        # h <= deg ensures monotone non-increase; count changed rows
        joined = cores.join(new.withColumnRenamed("core", "__new"), "id", "left")
        stepped = joined.select(
            "id",
            F.coalesce(F.col("__new"), F.col("core")).alias("core"),
            (F.coalesce(F.col("__new"), F.col("core")) != F.col("core")).alias(
                "__chg"
            ),
        )
        stepped = loop_checkpoint(stepped, it)
        changed = stepped.filter("__chg").count()
        cores = stepped.drop("__chg")
        if changed == 0:
            converged = True
            break
    if metrics_out is not None:
        metrics_out["iterations"] = it
    if not converged:
        raise RuntimeError(
            f"k_core did not reach its fixpoint in {max_iterations} rounds; "
            "raise max_iterations (partial h-index values are NOT coreness)"
        )
    return (
        graph.vertices.select(F.col("internal_id"))
        .join(cores, F.col("internal_id") == F.col("id"), "left")
        .select(
            "internal_id", F.coalesce(F.col("core"), F.lit(0)).alias("core")
        )
    )
