"""Biconnected components, bridges and articulation points.

GDS 2.x ships ``gds.bridges`` and ``gds.articulationPoints`` (absent
from the ~1.6 reference tree, whose sequential implementations are
DFS/Tarjan — `alpha` tier precedent: SccAlgorithm.java's Tarjan). DFS
does not distribute, so this module uses the classic PRAM formulation
(Tarjan–Vishkin 1985, re-expressed as DataFrame ops):

1. **Spanning forest** — existing Borůvka (:mod:`.spanningtree`).
2. **Euler tour without DFS** — each tree edge becomes two arcs;
   ``succ((s,t)) = (t, next_t(s))`` with ``next_t`` the circular
   sorted-neighbor order at ``t``. Breaking the circle at each tree's
   root (min vertex id) and **list-ranking by pointer doubling**
   (Wyllie: rank += rank[succ]; succ = succ[succ] — O(log n) rounds of
   self-joins) yields tour positions, hence preorder intervals
   ``[tin, tout]`` and the parent orientation — no sequential DFS
   anywhere.
3. **Subtree reach** — ``lo/hi(v)`` = min/max ``tin`` over v's
   non-tree neighbors (and itself); subtree aggregates ``LO/HI(c)``
   are range-min/max over the contiguous preorder interval of the
   subtree, answered by a **doubling sparse table** (O(n log n) rows,
   O(log n) build rounds — the PRAM-classic trade).
4. **Auxiliary graph** — vertices are the edges of G; unite
   (a) for every non-tree edge (u,v): its deeper tree edge(s), and
   e_u—e_v when neither endpoint is an ancestor of the other;
   (b) tree edge pairs e_c—e_parent(c) whenever some non-tree edge
   escapes ``subtree(c)`` past ``subtree(parent(c))``
   (``LO(c) < tin(p)`` or ``HI(c) > tout(p)``).
   Connected components of this auxiliary graph (hash-min + pointer
   jumping) ARE the biconnected components.
5. **Bridges** = tree edges alone in their class (and without a
   parallel duplicate); **articulation points** = vertices incident to
   ≥ 2 distinct classes.

Semantics are simple-graph (parallel edges collapse, but disqualify
their tree edge from being a bridge; self-loops are ignored) over the
undirected view, matching the GDS procedures. Vertices without edges
appear in no output.

Scale notes: every step is O(E) or O(n log n) rows with O(log n)
rounds; the only per-key sequential work is the sorted-neighbor window
(per-vertex partitions — same skew profile as any adjacency groupBy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..graph import Graph
from ..plans.checkpoint import loop_checkpoint
from .spanningtree import spanning_tree


def _cc(edges: DataFrame, n_checkpoint_base: int = 0) -> DataFrame:
    """Min-label connected components over an (a, b) edge list:
    hash-min neighbor exchange + pointer jumping per round (O(log n)
    rounds). Returns (v, comp) for every endpoint vertex."""
    lab = (
        edges.select(F.col("a").alias("v"))
        .unionByName(edges.select(F.col("b").alias("v")))
        .distinct()
        .select("v", F.col("v").alias("l"))
        .localCheckpoint(eager=True)
    )
    sym = edges.select("a", "b").unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    for it in range(64):
        nbr = (
            sym.join(lab.select(F.col("v").alias("b"),
                                F.col("l").alias("lb")), "b")
            .groupBy(F.col("a").alias("v"))
            .agg(F.min("lb").alias("m"))
        )
        new = (
            lab.join(nbr, "v", "left")
            .select("v", F.least("l", F.coalesce("m", "l")).alias("l"))
        )
        # pointer jump: l <- l(l)
        new = (
            new.join(
                new.select(F.col("v").alias("l"),
                           F.col("l").alias("l2")),
                "l",
            )
            .select("v", F.least("l", "l2").alias("l"))
        )
        new = loop_checkpoint(new, n_checkpoint_base + it)
        changed = (
            new.join(lab.withColumnRenamed("l", "old"), "v")
            .filter(F.col("l") != F.col("old"))
            .limit(1)
            .count()
        )
        lab = new
        if changed == 0:
            break
    else:
        raise RuntimeError(
            "biconnectivity._cc did not converge within 64 rounds — "
            "with hash-min + pointer jumping this is mathematically "
            "impossible unless the loop structure regressed"
        )
    return lab.select("v", F.col("l").alias("comp"))


def _enumerate(df: DataFrame, order_cols: list, out_col: str) -> DataFrame:
    """Dense global index [0, n) ascending in ``order_cols`` order,
    without a single-partition window: range-repartition on the order
    columns, rank within partitions, add broadcast per-partition
    offsets (the distributed zipWithIndex used across this repo)."""
    parts = max(df.sparkSession.sparkContext.defaultParallelism, 2)
    ranged = (
        df.repartitionByRange(parts, *[F.col(c) for c in order_cols])
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {
        r["__pid"]: r["cnt"]
        for r in ranged.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if not offsets:
        # empty input: create_map() with zero args is untyped and fails
        # to resolve when indexed — any int->int literal map works since
        # there are no rows to look up.
        offsets = {0: 0}
    omap = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        ranged.withColumn("__rk", F.row_number().over(w) - 1)
        .withColumn(out_col, omap[F.col("__pid")] + F.col("__rk"))
        .drop("__pid", "__rk")
    )


def _euler_intervals(tree: DataFrame) -> DataFrame:
    """Rooted intervals for a spanning forest given as (src, dst) edge
    rows (undirected, src < dst). Returns one row per tree vertex:
    (v, tree, parent, tin, tout, size) — ``parent`` null at each
    tree's root (its min vertex id), ``[tin, tout]`` the tour-position
    interval of ``subtree(v)``, ``size`` the subtree vertex count.

    No DFS: the Euler circle is defined locally by sorted circular
    adjacency, broken at each root, and list-ranked by Wyllie pointer
    doubling (O(log n) self-join rounds)."""
    te = tree.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    comp = _cc(te).withColumnRenamed("v", "cv").localCheckpoint(
        eager=True
    )

    # sorted circular adjacency at every vertex: after arriving at v
    # from u, the tour leaves v toward nxt(v, u)
    adj = te.select(F.col("a").alias("v"), F.col("b").alias("u")) \
        .unionByName(te.select(F.col("b").alias("v"),
                               F.col("a").alias("u")))
    wv = Window.partitionBy("v").orderBy("u")
    nxt = adj.select(
        "v", "u",
        F.coalesce(
            F.lead("u").over(wv), F.first("u").over(wv)
        ).alias("nxt"),
    )

    # arcs (s, t); succ((s,t)) = (t, nxt(t, s)); the arc entering each
    # root from its max neighbor terminates the tour (its successor
    # would wrap to the root's min neighbor = the start arc)
    arcs = adj.select(F.col("u").alias("s"), F.col("v").alias("t"))
    succ = arcs.join(
        nxt.select(F.col("v").alias("t"), F.col("u").alias("s"),
                   F.col("nxt")),
        ["t", "s"],
    ).select("s", "t", F.col("t").alias("ns"), F.col("nxt").alias("nt"))
    maxnbr = adj.groupBy(F.col("v")).agg(F.max("u").alias("mx"))
    roots = comp.filter(F.col("cv") == F.col("comp")).select(
        F.col("cv").alias("v")
    )
    term = roots.join(maxnbr, "v").select(
        F.col("mx").alias("s"), F.col("v").alias("t")
    )
    state = (
        succ.join(term.withColumn("__t", F.lit(True)), ["s", "t"],
                  "left")
        .select(
            "s", "t",
            F.when(F.col("__t").isNull(), F.col("ns")).alias("ns"),
            F.when(F.col("__t").isNull(), F.col("nt")).alias("nt"),
            F.when(F.col("__t").isNull(), F.lit(1))
            .otherwise(F.lit(0)).cast("long").alias("r"),
        )
        .localCheckpoint(eager=True)
    )
    # Wyllie list ranking: r += r[succ]; succ = succ[succ]. After k
    # rounds every arc at distance < 2^k has reached the terminal, so
    # ceil(log2(max tour length)) rounds suffice — known up front from
    # the tree sizes (one action, no per-round convergence checks).
    tlen = (
        comp.groupBy("comp").agg(
            ((F.count(F.lit(1)) - 1) * 2).alias("len")
        )
    ).localCheckpoint(eager=True)
    max_len = tlen.agg(F.max("len")).collect()[0][0] or 2
    rounds = max(1, int(max_len - 1).bit_length())
    for it in range(rounds):
        nxt_state = state.select(
            F.col("s").alias("ns"), F.col("t").alias("nt"),
            F.col("ns").alias("ns2"), F.col("nt").alias("nt2"),
            F.col("r").alias("r2"),
        )
        state = loop_checkpoint(
            state.join(nxt_state, ["ns", "nt"], "left").select(
                "s", "t",
                F.col("ns2").alias("ns"), F.col("nt2").alias("nt"),
                (F.col("r") + F.coalesce("r2", F.lit(0))).alias("r"),
            ),
            it,
        )

    # position from the tour start: pos = len(tree) - 1 - rank
    pos = (
        state.join(
            comp.select(F.col("cv").alias("t"), F.col("comp")), "t"
        )
        .join(tlen, "comp")
        .select(
            "s", "t", "comp",
            (F.col("len") - 1 - F.col("r")).alias("pos"), "len",
        )
    )

    # orientation: for edge {a,b} the smaller-pos arc points down
    down = (
        pos.select(
            F.least("s", "t").alias("a"), F.greatest("s", "t").alias("b"),
            "s", "t", "comp", "pos", "len",
        )
        .groupBy("a", "b")
        .agg(
            F.min(F.struct("pos", "s", "t", "comp", "len")).alias("dn"),
            F.max("pos").alias("up_pos"),
        )
        .select(
            F.col("dn.t").alias("v"), F.col("dn.s").alias("parent"),
            F.col("dn.comp").alias("tree"),
            F.col("dn.pos").alias("tin"),
            F.col("up_pos").alias("tout"),
            F.col("dn.len").alias("len"),
        )
    )
    verts = down.select(
        "v", "tree", "parent", "tin", "tout",
        ((F.col("tout") - F.col("tin") + 1) / 2).cast("long")
        .alias("size"),
    )
    root_rows = (
        down.select("tree", "len").distinct().select(
            F.col("tree").alias("v"), F.col("tree"),
            F.lit(None).cast("long").alias("parent"),
            F.lit(-1).cast("long").alias("tin"),
            F.col("len").cast("long").alias("tout"),
            ((F.col("len") + 2) / 2).cast("long").alias("size"),
        )
    )
    return verts.unionByName(root_rows).localCheckpoint(eager=True)


def _subtree_reach(verts: DataFrame, nontree: DataFrame) -> DataFrame:
    """(v, LO, HI): min/max ``tin`` reachable from ``subtree(v)`` via a
    non-tree edge (or within it — tin itself is the identity). Range
    min/max over the contiguous preorder interval of each subtree via a
    doubling sparse table."""
    tinmap = verts.select(F.col("v").alias("w"), F.col("tin"))
    ntsym = nontree.select(F.col("a").alias("v"), F.col("b").alias("w")) \
        .unionByName(
            nontree.select(F.col("b").alias("v"), F.col("a").alias("w"))
        )
    reach = (
        ntsym.join(tinmap, "w")
        .groupBy("v")
        .agg(F.min("tin").alias("nlo"), F.max("tin").alias("nhi"))
    )
    base = (
        verts.join(reach, "v", "left")
        .select(
            "v", "tree", "tin", "tout", "size",
            F.least("tin", F.coalesce("nlo", "tin")).alias("lo"),
            F.greatest("tin", F.coalesce("nhi", "tin")).alias("hi"),
        )
    )
    base = _enumerate(base, ["tree", "tin"], "pre").localCheckpoint(
        eager=True
    )

    n = base.count()
    levels = [
        base.select(
            F.lit(0).alias("k"), F.col("pre").alias("i"),
            F.col("lo").alias("mn"), F.col("hi").alias("mx"),
        )
    ]
    cur = levels[0]
    k = 0
    while (1 << (k + 1)) <= n:
        k += 1
        half = 1 << (k - 1)
        right = cur.select(
            (F.col("i") - half).alias("i"),
            F.col("mn").alias("mn2"), F.col("mx").alias("mx2"),
        )
        cur = (
            cur.join(right, "i", "left")
            .select(
                F.lit(k).alias("k"), "i",
                F.least("mn", F.coalesce("mn2", "mn")).alias("mn"),
                F.greatest("mx", F.coalesce("mx2", "mx")).alias("mx"),
            )
            .localCheckpoint(eager=True)
        )
        levels.append(cur)
    table = levels[0]
    for lv in levels[1:]:
        table = table.unionByName(lv)

    q = base.select(
        "v", F.col("pre").alias("ql"),
        (F.col("pre") + F.col("size") - 1).alias("qr"),
    ).withColumn(
        "k",
        F.floor(F.log2(F.col("qr") - F.col("ql") + 1)).cast("int"),
    )
    left = table.select(
        F.col("k"), F.col("i").alias("ql"),
        F.col("mn").alias("mnl"), F.col("mx").alias("mxl"),
    )
    right = table.select(
        F.col("k"), F.col("i").alias("qi2"),
        F.col("mn").alias("mnr"), F.col("mx").alias("mxr"),
    )
    return (
        q.join(left, ["k", "ql"])
        .withColumn("qi2", F.col("qr") - F.pow(F.lit(2), "k").cast(
            "long") + 1)
        .join(right, ["k", "qi2"])
        .select(
            "v",
            F.least("mnl", "mnr").alias("LO"),
            F.greatest("mxl", "mxr").alias("HI"),
        )
    )


def biconnected_components(graph: Graph) -> DataFrame:
    """(src, dst, component) — one row per distinct undirected edge
    (src < dst); ``component`` is a stable label (the min auxiliary key
    in the class). Edges share a component iff they lie on a common
    simple cycle (plus: every bridge is its own singleton class)."""
    e = (
        graph.edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("m"))
        .localCheckpoint(eager=True)
    )
    tree = spanning_tree(graph).select("src", "dst").localCheckpoint(
        eager=True
    )
    nontree = e.join(
        tree.select(F.col("src").alias("a"), F.col("dst").alias("b")),
        ["a", "b"],
        "left_anti",
    ).localCheckpoint(eager=True)

    verts = _euler_intervals(tree)
    reach = _subtree_reach(verts, nontree)

    # auxiliary-graph keys: tree edge (parent(c), c) -> 2c;
    # non-tree edge -> 2*idx + 1
    nt = _enumerate(nontree, ["a", "b"], "idx").select(
        "a", "b", (F.col("idx") * 2 + 1).alias("key")
    ).localCheckpoint(eager=True)

    vinfo = verts.select("v", "parent", "tin", "tout")
    nta = nt.join(
        vinfo.select(
            F.col("v").alias("a"), F.col("tin").alias("tin_a"),
            F.col("tout").alias("tout_a"),
        ),
        "a",
    ).join(
        vinfo.select(
            F.col("v").alias("b"), F.col("tin").alias("tin_b"),
            F.col("tout").alias("tout_b"),
        ),
        "b",
    )
    a_anc_b = (F.col("tin_a") <= F.col("tin_b")) & (
        F.col("tin_b") <= F.col("tout_a")
    )
    b_anc_a = (F.col("tin_b") <= F.col("tin_a")) & (
        F.col("tin_a") <= F.col("tout_b")
    )
    # rule A: attach the non-tree edge to its non-ancestor endpoint's
    # tree edge; when neither is an ancestor, also unite the two
    unite_a = nta.filter(~a_anc_b).select(
        F.col("key").alias("x"), (F.col("a") * 2).alias("y")
    )
    unite_b = nta.filter(~b_anc_a).select(
        F.col("key").alias("x"), (F.col("b") * 2).alias("y")
    )
    unite_ab = nta.filter(~a_anc_b & ~b_anc_a).select(
        (F.col("a") * 2).alias("x"), (F.col("b") * 2).alias("y")
    )
    # rule B: e_c — e_parent(c) when subtree(c) escapes subtree(parent)
    pinfo = vinfo.select(
        F.col("v").alias("parent"), F.col("tin").alias("tin_p"),
        F.col("tout").alias("tout_p"),
        F.col("parent").alias("grandparent"),
    )
    rb = (
        verts.filter(F.col("parent").isNotNull())
        .join(reach, "v")
        .join(pinfo, "parent")
        .filter(F.col("grandparent").isNotNull())  # e_parent must exist
        .filter(
            (F.col("LO") < F.col("tin_p")) | (F.col("HI") > F.col(
                "tout_p"))
        )
        .select(
            (F.col("v") * 2).alias("x"), (F.col("parent") * 2).alias("y")
        )
    )
    aux = (
        unite_a.unionByName(unite_b).unionByName(unite_ab)
        .unionByName(rb)
        .select(F.col("x").alias("a"), F.col("y").alias("b"))
    )
    lab = _cc(aux, n_checkpoint_base=8)

    tree_keyed = verts.filter(F.col("parent").isNotNull()).select(
        F.least("v", "parent").alias("src"),
        F.greatest("v", "parent").alias("dst"),
        (F.col("v") * 2).alias("key"),
    )
    all_edges = tree_keyed.unionByName(
        nt.select(F.col("a").alias("src"), F.col("b").alias("dst"),
                  "key")
    )
    return (
        all_edges.join(
            lab.withColumnRenamed("v", "key"), "key", "left"
        )
        .select(
            "src", "dst",
            F.coalesce("comp", F.col("key")).alias("component"),
        )
    )


def bridges(graph: Graph, *, bcc: DataFrame | None = None) -> DataFrame:
    """(src, dst) with src < dst: edges whose removal disconnects their
    component — singleton biconnected classes without a parallel
    duplicate (gds.bridges semantics on the undirected simple view).
    Pass a precomputed ``biconnected_components`` frame to share the
    heavy pipeline with :func:`articulation_points`."""
    e = (
        graph.edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    if bcc is None:
        bcc = biconnected_components(graph)
    sizes = bcc.groupBy("component").agg(
        F.count(F.lit(1)).alias("csize")
    )
    return (
        bcc.join(sizes, "component")
        .filter(F.col("csize") == 1)
        .join(e, ["src", "dst"])
        .filter(F.col("m") == 1)
        .select("src", "dst")
    )


def articulation_points(
    graph: Graph, *, bcc: DataFrame | None = None
) -> DataFrame:
    """(internal_id, n_components): vertices whose removal disconnects
    their component — incident to ≥ 2 distinct biconnected classes
    (gds.articulationPoints semantics); ``n_components`` counts them."""
    if bcc is None:
        bcc = biconnected_components(graph)
    inc = bcc.select(
        F.col("src").alias("internal_id"), "component"
    ).unionByName(
        bcc.select(F.col("dst").alias("internal_id"), "component")
    ).distinct()
    return (
        inc.groupBy("internal_id")
        .agg(F.countDistinct("component").alias("n_components"))
        .filter(F.col("n_components") >= 2)
    )
