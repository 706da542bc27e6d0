"""Prize-collecting Steiner tree (gds.prizeSteinerTree, GDS 2.5+).

Reference semantics: given node prizes and edge costs, find a tree
maximizing net worth = sum(prizes of tree nodes) − sum(costs of tree
edges); nodes may be left out (paying their prize as penalty). The
reference implements the Goemans–Williamson growth scheme single-threaded
(gds 2.x ``PrizeSteinerTree`` / ``PCSTFast``-style); a sequential
moat-growth is the wrong shape for Spark, so the distributed formulation
here is the other classic: **minimum spanning forest + exact strong
pruning**:

1. Borůvka MSF over the undirected weighted view
   (:func:`..spanningtree.spanning_tree` — O(log V) rounds, each one
   aggregation + hash-min contraction).
2. **Strong pruning** as an iterative leaf-peel DP: every round, all
   current leaves fold into their neighbor — a leaf ``v`` with
   accumulated subtree value ``val(v)`` (initially its prize) and
   attaching edge cost ``w`` contributes ``max(0, val(v) − w)`` to its
   parent and its edge is kept iff ``val(v) − w > 0``. One round =
   a degree aggregation + one join + one grouped sum, all whole-stage
   codegen; rounds = ceil(tree radius), each removes every current leaf.
3. A kept edge survives only if its whole chain toward the root is kept:
   resolved by pointer doubling over the peel parent pointers
   (O(log depth) joins), not a driver walk.

On a tree input the rooted variant is EXACTLY optimal (strong pruning is
the textbook DP for "best subtree containing the root"); on general
graphs MSF+prune is a documented heuristic, as GW-growth is a 2-approx —
net-worth floors (≥ best single vertex, ≥ empty solution) are asserted
in tests and the contract validity row.

Unrooted mode peels to each tree's center and then falls back to the
best single vertex of the tree if that beats the center's pruned
subtree, so the returned forest's net worth is never below the best
trivial solution.

Output matches the GDS stream shape (one row per kept node):
``(internal_id, parent, weight)`` with ``parent = internal_id`` and
weight 0 on each tree root. ``metrics_out``: sumOfPrizes, totalWeight,
effectiveNodeCount.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from ..plans.checkpoint import loop_checkpoint
from .spanningtree import spanning_tree


def _peel(
    tree_edges: DataFrame,
    prizes: DataFrame,
    root: int | None,
    max_rounds: int,
):
    """Iterative leaf-peel strong-prune DP.

    ``tree_edges``: (a, b, w) forest rows.  ``prizes``: (v, prize).
    Returns (parents DataFrame (v, parent, w, kept), centers DataFrame
    (v, val)) where ``parents`` holds one row per peeled vertex and
    ``centers`` the per-tree survivors with their accumulated value.
    """
    spark = prizes.sparkSession
    val = prizes.select("v", F.col("prize").cast("double").alias("val"))
    edges = tree_edges.select("a", "b", F.col("w").cast("double"))
    parents = spark.createDataFrame(
        [], "v long, parent long, w double, kept boolean"
    )
    for rnd in range(max_rounds):
        if edges.isEmpty():
            break
        deg = (
            edges.select(F.col("a").alias("v"))
            .unionByName(edges.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        d1 = deg.filter(F.col("deg") == 1).select("v")
        # leaf rows: (v, parent, w); an edge with BOTH endpoints leaves
        # (2-node tree) peels only the larger id so one survives as root
        da = d1.select(F.col("v").alias("a"), F.lit(True).alias("la"))
        db = d1.select(F.col("v").alias("b"), F.lit(True).alias("lb"))
        e = (
            edges.join(da, "a", "left")
            .join(db, "b", "left")
            .withColumn("la", F.coalesce("la", F.lit(False)))
            .withColumn("lb", F.coalesce("lb", F.lit(False)))
        )
        # both-leaf (2-node tree) tie-break: peel the larger id — unless
        # one endpoint is the protected root, then peel the other
        both = F.col("la") & F.col("lb")
        if root is not None:
            r = F.lit(root)
            tb_v = F.when(F.col("a") == r, F.col("b")).when(
                F.col("b") == r, F.col("a")
            ).otherwise(F.greatest("a", "b"))
            tb_p = F.when(F.col("a") == r, F.col("a")).when(
                F.col("b") == r, F.col("b")
            ).otherwise(F.least("a", "b"))
        else:
            tb_v, tb_p = F.greatest("a", "b"), F.least("a", "b")
        leaf = e.filter(F.col("la") | F.col("lb")).select(
            F.when(both, tb_v)
            .when(F.col("la"), F.col("a"))
            .otherwise(F.col("b"))
            .alias("v"),
            F.when(both, tb_p)
            .when(F.col("la"), F.col("b"))
            .otherwise(F.col("a"))
            .alias("parent"),
            "w",
        )
        if root is not None:
            # rooted mode: the root never peels even when it is the only
            # leaf endpoint of its edge (the edge waits until the other
            # side becomes a leaf, which the both-leaf swap then handles)
            leaf = leaf.filter(F.col("v") != F.lit(root))
        if leaf.isEmpty():
            break
        scored = leaf.join(val, "v").select(
            "v", "parent", "w",
            (F.col("val") - F.col("w")).alias("margin"),
        )
        parents = parents.unionByName(
            scored.select(
                "v", "parent", "w", (F.col("margin") > 0).alias("kept")
            )
        )
        gains = scored.groupBy(F.col("parent").alias("v")).agg(
            F.sum(F.greatest("margin", F.lit(0.0))).alias("gain")
        )
        peeled = scored.select("v")
        val = (
            val.join(peeled.withColumn("gone", F.lit(True)), "v", "left")
            .filter(F.col("gone").isNull())
            .drop("gone")
            .join(gains, "v", "left")
            .select(
                "v",
                (F.col("val") + F.coalesce("gain", F.lit(0.0))).alias(
                    "val"
                ),
            )
        )
        pa = peeled.withColumnRenamed("v", "a").withColumn(
            "ga", F.lit(True)
        )
        pb = peeled.withColumnRenamed("v", "b").withColumn(
            "gb", F.lit(True)
        )
        edges = (
            edges.join(pa, "a", "left")
            .join(pb, "b", "left")
            .filter(F.col("ga").isNull() & F.col("gb").isNull())
            .drop("ga", "gb")
        )
        val = loop_checkpoint(val, rnd)
        edges = loop_checkpoint(edges, rnd)
        parents = loop_checkpoint(parents, rnd)
    else:
        raise RuntimeError(
            f"prize_steiner_tree: peel did not finish in {max_rounds} "
            "rounds (tree radius exceeds max_rounds — raise it)"
        )
    return parents, val


def _resolve_kept(parents: DataFrame) -> DataFrame:
    """(v, anc, ok) — whether v's whole parent chain is kept, and the
    chain's final root (its tree center) — pointer doubling.

    ``parents``: (v, parent, w, kept); roots are absent (chain ends when
    ``parent`` has no row). ok(v) starts as kept(v) and each round
    becomes ok(v) AND ok(anc); anc jumps to anc's anc — O(log depth)."""
    state = parents.select(
        "v", F.col("parent").alias("anc"), F.col("kept").alias("ok")
    )
    for rnd in range(64):
        hop = state.select(
            F.col("v").alias("anc"),
            F.col("anc").alias("anc2"),
            F.col("ok").alias("ok2"),
        )
        nxt = state.join(hop, "anc", "left").select(
            "v",
            F.coalesce("anc2", "anc").alias("anc"),
            (F.col("ok") & F.coalesce("ok2", F.lit(True))).alias("ok"),
        )
        # converged when no row advanced (every anc is a chain root)
        if rnd % 4 == 3:
            nxt = loop_checkpoint(nxt, rnd, every=16)
            moved = (
                state.select("v", F.col("anc").alias("pa"))
                .join(nxt.select("v", F.col("anc").alias("na")), "v")
                .filter(F.col("pa") != F.col("na"))
            )
            state = nxt
            if moved.isEmpty():
                break
        else:
            state = nxt
    return state


def prize_steiner_tree(
    graph: Graph,
    prize_col: str = "prize",
    *,
    root: int | None = None,
    max_rounds: int = 512,
    metrics_out: dict | None = None,
) -> DataFrame:
    """(internal_id long, parent long, weight double) — pruned forest.

    ``root``: rooted variant (the root is always kept; exact optimum on
    tree inputs). ``root=None``: unrooted GDS semantics — per spanning
    tree, the better of the center's pruned subtree and the tree's best
    single vertex.
    """
    prizes = graph.vertices.select(
        F.col("internal_id").alias("v"),
        F.coalesce(F.col(prize_col).cast("double"), F.lit(0.0)).alias(
            "prize"
        ),
    ).localCheckpoint(eager=True)
    msf = spanning_tree(graph).select(
        F.col("src").alias("a"),
        F.col("dst").alias("b"),
        F.col("weight").alias("w"),
    )
    parents, centers = _peel(msf, prizes, root, max_rounds)
    parents = parents.localCheckpoint(eager=True)
    centers = centers.localCheckpoint(eager=True)
    resolved = _resolve_kept(parents)
    kept_v = resolved.filter(F.col("ok")).select("v", "anc")
    if root is not None:
        # rooted semantics: only the root's own tree is the answer —
        # other spanning trees' centers (and isolated vertices, which
        # survive the peel trivially) are not part of a rooted solution
        kept_v = kept_v.filter(F.col("anc") == F.lit(root))
        centers = centers.filter(F.col("v") == F.lit(root))

    kept_rows = parents.join(kept_v.select("v"), "v").select(
        F.col("v").alias("internal_id"),
        "parent",
        F.col("w").alias("weight"),
    )
    root_rows = centers.select(
        F.col("v").alias("internal_id"),
        F.col("v").alias("parent"),
        F.lit(0.0).alias("weight"),
    )
    out = root_rows.unionByName(kept_rows)

    if root is None:
        # per-tree fallback: if the center's pruned subtree is worth less
        # than the tree's best single vertex, emit that vertex alone.
        # val(center) IS the net worth of its pruned subtree, so compare
        # against max prize over the center's spanning tree. Tree
        # membership comes free from the resolve pass: every peeled
        # vertex's final anc is its center.
        member = resolved.select(
            "v", F.col("anc").alias("center")
        ).unionByName(centers.select("v", F.col("v").alias("center")))
        best = (
            member.join(prizes, "v")
            .groupBy("center")
            .agg(
                F.max(F.struct("prize", F.col("v").alias("bv"))).alias(
                    "best"
                )
            )
            .select(
                "center",
                F.col("best.prize").alias("best_prize"),
                F.col("best.bv").alias("best_v"),
            )
        )
        verdict = centers.join(
            best, centers["v"] == best["center"], "left"
        ).select(
            centers["v"].alias("center"),
            "val",
            F.coalesce("best_prize", F.lit(0.0)).alias("best_prize"),
            "best_v",
        )
        # centers where the single vertex wins (strictly)
        swap = verdict.filter(
            F.col("best_prize") > F.col("val")
        ).localCheckpoint(eager=True)
        if not swap.isEmpty():
            losers = swap.select("center")
            # drop the losing center's entire emitted subtree
            out_centers = member.select(
                "v", "center"
            )
            out = (
                out.join(
                    out_centers.withColumnRenamed("v", "internal_id"),
                    "internal_id",
                    "left",
                )
                .join(
                    losers.withColumn("lose", F.lit(True)), "center", "left"
                )
                .filter(F.col("lose").isNull())
                .drop("center", "lose")
            )
            out = out.unionByName(
                swap.select(
                    F.col("best_v").alias("internal_id"),
                    F.col("best_v").alias("parent"),
                    F.lit(0.0).alias("weight"),
                )
            )
        # drop empty-worth singleton roots (net worth 0 with no prize)
        out = out.join(
            prizes.withColumnRenamed("v", "internal_id"), "internal_id"
        )
        singleton = (
            out.groupBy(F.col("parent").alias("internal_id"))
            .agg(F.count(F.lit(1)).alias("treesize"))
        )
        out = (
            out.join(singleton, "internal_id", "left")
            .filter(
                (F.col("internal_id") != F.col("parent"))
                | (F.coalesce("treesize", F.lit(1)) > 1)
                | (F.col("prize") > 0)
            )
            .select("internal_id", "parent", "weight")
        )
    out = out.localCheckpoint(eager=True)
    if metrics_out is not None:
        prow = (
            out.join(
                prizes.withColumnRenamed("v", "internal_id"),
                "internal_id",
            )
            .agg(
                F.sum("prize").alias("sp"),
                F.sum("weight").alias("tw"),
                F.count(F.lit(1)).alias("nc"),
            )
            .collect()[0]
        )
        metrics_out["sumOfPrizes"] = float(prow["sp"] or 0.0)
        metrics_out["totalWeight"] = float(prow["tw"] or 0.0)
        metrics_out["effectiveNodeCount"] = int(prow["nc"])
    return out
