"""Similarity search over an embedding column (array<float>).

- :func:`cosine_topk_bruteforce` — exact all-pairs cosine top-k: the
  correctness baseline. JVM-only math (``zip_with`` + ``aggregate``), block
  nested-loop via a hint-free shuffle join; O(n^2 d) — fine to ~10^5 rows.
- :func:`cosine_topk_lsh` — the scale path: random-hyperplane LSH buckets
  (sign bits of r·v for K seeded hyperplanes, T tables); candidates only
  join within a bucket. Recall < 1 by construction; tune (K, T).
- :func:`ivf_topk` — IVF-style: k-means-lite (seeded random centroids, one
  assignment pass — a deterministic stand-in for trained centroids),
  queries probe ``nprobe`` nearest centroids only.

All variants return (vec_id long, neighbor_id long, cosine double).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F


def _norm_col(vec: str):
    return F.sqrt(
        F.aggregate(
            F.col(vec), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x
        )
    )


def _dot(a: str, b: str):
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk_bruteforce(
    emb: DataFrame,
    *,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    database: DataFrame | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors of every row of ``emb`` among
    ``database`` (defaults to ``emb`` itself — classic self-ANN). An
    explicit ``database`` gives the filtered / cross-set variant
    (query set ≠ candidate set) used by gds.alpha.knn.filtered."""
    a = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("va"),
        _norm_col(vec_col).alias("na"),
    )
    b = (emb if database is None else database).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vb"),
        _norm_col(vec_col).alias("nb"),
    )
    pairs = a.crossJoin(b).filter(F.col("vec_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "vec_id",
        "neighbor_id",
        (_dot("va", "vb") / (F.col("na") * F.col("nb"))).alias("cosine"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def _hyperplanes(dim: int, bits: int, table: int, seed: int) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed * 1000 + table))
    return rng.standard_normal((bits, dim))


def cosine_topk_lsh(
    emb: DataFrame,
    *,
    k: int = 3,
    bits: int = 8,
    tables: int = 4,
    seed: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: only pairs sharing a (table, signature) bucket are
    scored. Signature = sign bits of hyperplane projections, computed with
    JVM ``aggregate`` over a broadcast-literal plane array."""
    dim = len(emb.select(vec_col).first()[0])
    buckets = None
    for t in range(tables):
        planes = _hyperplanes(dim, bits, t, seed)
        sig = F.lit(0).cast("long")
        for i in range(bits):
            proj = F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.array(*[F.lit(float(x)) for x in planes[i]]),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            sig = sig + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
        part = emb.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("v"),
            F.lit(t).alias("table"),
            sig.alias("bucket"),
        )
        buckets = part if buckets is None else buckets.unionByName(part)

    # candidate pairs dedup on IDS ONLY — a distinct() that carries the
    # vectors would shuffle every embedding once per bucket membership
    # (dims × tables × bytes); vectors are re-joined after the dedup.
    a = buckets.select("table", "bucket", "vec_id")
    b = buckets.select(
        "table", "bucket", F.col("vec_id").alias("neighbor_id")
    )
    cand_ids = (
        a.join(b, ["table", "bucket"])
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select("vec_id", "neighbor_id")
        .distinct()
    )
    va = emb.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("va")
    )
    vb = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vb")
    )
    cands = cand_ids.join(va, "vec_id").join(vb, "neighbor_id")
    na = _norm_col("va")
    nb = _norm_col("vb")
    scored = cands.select(
        "vec_id",
        "neighbor_id",
        (_dot("va", "vb") / (na * nb)).alias("cosine"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def ivf_topk(
    emb: DataFrame,
    *,
    k: int = 3,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF: assign every vector to its nearest of ``n_centroids`` seeded
    random unit centroids; a query scores only vectors in its ``nprobe``
    nearest centroid cells. Deterministic (seeded centroids).

    Centroid assignment runs as ONE vectorized numpy matmul per Arrow
    batch inside mapInPandas — the centroid matrix lives in the closure
    (cloudpickled once per worker), NOT as n_centroids × dim plan
    literals, which at real dims (768+) would bloat every plan and
    recompile per query."""
    dim = len(emb.select(vec_col).first()[0])
    cents = seeded_centroids(dim, n_centroids, seed)
    cents_t = cents.T.copy()

    src = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )

    def assign(pdf_iter):
        import pandas as pd

        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf["v"].to_numpy())  # (batch, dim)
            scores = m @ cents_t  # (batch, n_centroids)
            order = np.argsort(-scores, axis=1, kind="stable")[:, :nprobe]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "v": pdf["v"],
                    "probes": [row.astype("int32") for row in order],
                }
            )

    ranked = src.mapInPandas(
        assign, "vec_id long, v array<double>, probes array<int>"
    )
    data_side = ranked.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("vb"),
        F.col("probes")[0].alias("cell"),  # vectors live in their top cell
    )
    query_side = ranked.select(
        "vec_id", F.col("v").alias("va"), F.explode("probes").alias("cell")
    )
    cands = query_side.join(data_side, "cell").filter(
        F.col("vec_id") != F.col("neighbor_id")
    )
    na = _norm_col("va")
    nb = _norm_col("vb")
    # no distinct needed: each data vector lives in exactly ONE cell, so a
    # (query, neighbor) pair joins at most once
    out = cands.select(
        "vec_id",
        "neighbor_id",
        (_dot("va", "vb") / (na * nb)).alias("cosine"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def nn_descent_topk(
    emb: DataFrame,
    *,
    k: int = 10,
    iterations: int = 10,
    delta: float = 0.001,
    bits: int = 8,
    tables: int = 2,
    seed: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """NN-Descent (ref similarity/knn/Knn.java:45-244): iterative
    neighbor-of-neighbor refinement of an approximate kNN graph.

    Spark formulation: seed the kNN graph with one cheap LSH pass, then
    per round (1) take the UNDIRECTED current neighborhood (forward +
    reverse edges — the reference's new/old neighbor lists collapse into
    one symmetric candidate source under set-semantics joins), (2)
    propose neighbors-of-neighbors through a self-join on the shared
    middle vertex (≤ (2k)² candidate ids per node, ids only — vectors are
    re-joined after dedup), (3) score and merge with the current graph,
    keep top-k. Converges when fewer than ``delta × n × k`` neighbor
    entries changed in a round, like the reference's updateCount
    termination.

    Cost per round: the middle-join is Σ_v undirected-deg(v)² ≤ n·(2k)²
    candidate rows — independent of dimension until scoring, linear in n
    for fixed k. All joins are hash-partitioned equi-joins.
    """
    vecs = emb.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
    )
    n_total = vecs.count()

    # Seed graph = LSH candidates (good when buckets are dense) UNION a
    # deterministic k-regular hash-ring (the reference's random-neighbor
    # init — guarantees every node starts with k candidates even where
    # LSH buckets are singletons, without which refinement cannot
    # bootstrap). Ring ranks come from dense_ids (scalable global rank).
    from ..graph import dense_ids

    import random as _random

    rnd = _random.Random(seed)
    offsets: list[int] = []
    while len(offsets) < min(k, max(n_total - 1, 1)):
        off = rnd.randrange(1, max(n_total, 2))
        if off not in offsets:
            offsets.append(off)
    ranked = dense_ids(vecs.select("vec_id"), "vec_id", out_col="__rank")
    ring = ranked.select(
        "vec_id",
        F.explode(
            F.array(*[F.lit(o) for o in offsets])
        ).alias("__off"),
        "__rank",
    ).select(
        "vec_id",
        F.pmod(F.col("__rank") + F.col("__off"), F.lit(n_total)).alias(
            "__nrank"
        ),
    ).join(
        ranked.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("__rank").alias("__nrank"),
        ),
        "__nrank",
    ).select("vec_id", "neighbor_id").filter(
        F.col("vec_id") != F.col("neighbor_id")
    )
    ring_scored = (
        ring.join(vecs.withColumnRenamed("v", "va"), "vec_id")
        .join(
            vecs.select(
                F.col("vec_id").alias("neighbor_id"), F.col("v").alias("vb")
            ),
            "neighbor_id",
        )
        .select(
            "vec_id",
            "neighbor_id",
            (_dot("va", "vb") / (_norm_col("va") * _norm_col("vb"))
             ).alias("cosine"),
        )
    )
    lsh_seed = cosine_topk_lsh(
        emb, k=k, bits=bits, tables=tables, seed=seed,
        id_col=id_col, vec_col=vec_col,
    ).select("vec_id", "neighbor_id", "cosine")
    w0 = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    cur = (
        lsh_seed.unionByName(ring_scored)
        .dropDuplicates(["vec_id", "neighbor_id"])
        .withColumn("__rn", F.row_number().over(w0))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    for _round in range(iterations):
        und = cur.select("vec_id", "neighbor_id").unionByName(
            cur.select(
                F.col("neighbor_id").alias("vec_id"),
                F.col("vec_id").alias("neighbor_id"),
            )
        ).distinct()
        left = und.select(F.col("vec_id"), F.col("neighbor_id").alias("mid"))
        right = und.select(
            F.col("vec_id").alias("mid"), F.col("neighbor_id")
        )
        nn_cand = (
            left.join(right, "mid")
            .select("vec_id", "neighbor_id")
            .filter(F.col("vec_id") != F.col("neighbor_id"))
        )
        # randomJoins (ref KnnBaseConfig.randomJoins, default 10): a few
        # iteration-varying ring candidates per node break the local
        # optima a pure neighbor-of-neighbor walk converges into when k
        # is small
        rj_offsets = [
            rnd.randrange(1, max(n_total, 2)) for _ in range(min(4, k + 1))
        ]
        random_joins = ranked.select(
            "vec_id",
            F.explode(
                F.array(*[F.lit(o) for o in rj_offsets])
            ).alias("__off"),
            "__rank",
        ).select(
            "vec_id",
            F.pmod(
                F.col("__rank") + F.col("__off"), F.lit(n_total)
            ).alias("__nrank"),
        ).join(
            ranked.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("__rank").alias("__nrank"),
            ),
            "__nrank",
        ).select("vec_id", "neighbor_id").filter(
            F.col("vec_id") != F.col("neighbor_id")
        )
        cand = (
            nn_cand.unionByName(random_joins)
            .distinct()
            # don't re-score pairs already in the graph
            .join(
                cur.select("vec_id", "neighbor_id"),
                ["vec_id", "neighbor_id"],
                "left_anti",
            )
        )
        scored = (
            cand.join(vecs.withColumnRenamed("v", "va"), "vec_id")
            .join(
                vecs.select(
                    F.col("vec_id").alias("neighbor_id"),
                    F.col("v").alias("vb"),
                ),
                "neighbor_id",
            )
            .select(
                "vec_id",
                "neighbor_id",
                (_dot("va", "vb") / (_norm_col("va") * _norm_col("vb"))
                 ).alias("cosine"),
            )
        )
        nxt = (
            cur.unionByName(scored)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
            .localCheckpoint(eager=True)
        )
        changed = nxt.join(
            cur, ["vec_id", "neighbor_id"], "left_anti"
        ).count()
        cur = nxt
        if changed <= delta * n_total * k:
            break
    return cur


def cosine_neardup_pairs(
    emb: DataFrame,
    *,
    threshold: float,
    method: str = "exact",
    bits: int = 8,
    tables: int = 8,
    seed: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (vec_id < dup_id, cosine)
    with ``cosine >= threshold``.

    - ``method="exact"``: all-pairs block nested-loop over the a<b
      triangle — the correctness baseline, O(n^2 d); fine to ~10^5 rows.
    - ``method="lsh"``: the scale path. Random-hyperplane buckets
      (``bits`` sign bits x ``tables`` tables) generate candidates; ONLY
      ids travel through the bucket join + distinct, vectors are
      re-joined afterwards, and every candidate is re-scored with the
      exact cosine — precision is 1 by construction, recall < 1 (raise
      ``tables`` to trade shuffle volume for recall). Hub buckets split
      across tables, so no single-bucket quadratic blowup beyond
      2^bits-way skew, which AQE's skew-join handles.

    Both paths are pure JVM expressions (``zip_with``/``aggregate``).
    """
    if method not in ("exact", "lsh"):
        raise ValueError(f"unknown method {method!r}")
    a = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("va"),
        _norm_col(vec_col).alias("na"),
    )
    b = emb.select(
        F.col(id_col).alias("dup_id"),
        F.col(vec_col).alias("vb"),
        _norm_col(vec_col).alias("nb"),
    )
    if method == "exact":
        cands = a.crossJoin(b).filter(F.col("vec_id") < F.col("dup_id"))
    else:
        dim = len(emb.select(vec_col).first()[0])
        buckets = None
        for t in range(tables):
            planes = _hyperplanes(dim, bits, t, seed)
            sig = F.lit(0).cast("long")
            for i in range(bits):
                proj = F.aggregate(
                    F.zip_with(
                        F.col(vec_col),
                        F.array(*[F.lit(float(x)) for x in planes[i]]),
                        lambda x, y: x.cast("double") * y,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                sig = sig + F.when(proj > 0, F.lit(1 << i)).otherwise(
                    F.lit(0)
                )
            part = emb.select(
                F.col(id_col).alias("vec_id"),
                F.lit(t).alias("table"),
                sig.alias("bucket"),
            )
            buckets = part if buckets is None else buckets.unionByName(part)
        # ids-only candidate dedup (vectors re-joined after the distinct)
        ca = buckets
        cb = buckets.select(
            "table", "bucket", F.col("vec_id").alias("dup_id")
        )
        cand_ids = (
            ca.join(cb, ["table", "bucket"])
            .filter(F.col("vec_id") < F.col("dup_id"))
            .select("vec_id", "dup_id")
            .distinct()
        )
        cands = cand_ids.join(a, "vec_id").join(b, "dup_id")
    return cands.select(
        "vec_id",
        "dup_id",
        (_dot("va", "vb") / (F.col("na") * F.col("nb"))).alias("cosine"),
    ).filter(F.col("cosine") >= threshold)


def cosine_neardup_dedup(
    emb: DataFrame,
    *,
    threshold: float,
    method: str = "exact",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **kw,
) -> DataFrame:
    """(vec_id, keep): greedy-by-id near-dup dedup — a vector is dropped
    iff it has a near-duplicate (cosine >= threshold) with a smaller id.
    Deterministic, one anti-join past the pair stream; compose the pair
    stream with :func:`operators.wcc.wcc` instead for connected-component
    dedup semantics."""
    pairs = cosine_neardup_pairs(
        emb, threshold=threshold, method=method,
        id_col=id_col, vec_col=vec_col, **kw,
    )
    dropped = pairs.select(F.col("dup_id").alias(id_col)).distinct()
    return (
        emb.select(id_col)
        .join(dropped.withColumn("__drop", F.lit(True)), id_col, "left")
        .select(F.col(id_col), F.col("__drop").isNull().alias("keep"))
    )


# ---------------------------------------------------------------------------
# Clustered (SemDeDup-style) semantic dedup + distributed k-means
# ---------------------------------------------------------------------------
def seeded_centroids(dim: int, k: int, seed: int) -> np.ndarray:
    """k seeded random unit centroids — the deterministic, zero-training
    cluster basis shared by :func:`ivf_topk` and the exact-oracle path of
    :func:`semantic_neardup_pairs` (same RNG stream as ivf_topk)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    cents = rng.standard_normal((k, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    return cents


def centroid_assign_column(vec_col: str, cents: np.ndarray):
    """Plan-literal argmax-dot centroid assignment.

    Scores are sequential ``zip_with``/``aggregate`` folds over inlined
    centroid literals — the same left-to-right summation DuckDB's
    ``list_dot_product`` performs — so an oracle replays every assignment
    bit-exactly (ties break to the smaller centroid id on both sides).
    Use for k*dim up to a few thousand; above that, assign with the
    numpy-closure path inside :func:`kmeans_assign` instead (vectorized
    matmul per Arrow batch, no plan bloat, engine-local)."""
    scores = []
    for c in cents:
        scores.append(
            F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.array(*[F.lit(float(x)) for x in c]),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    arr = F.array(*scores)
    # array_position returns the FIRST index holding the max -> smaller
    # centroid id wins ties, matching ORDER BY score DESC, cid ASC
    return (F.array_position(arr, F.array_max(arr)) - 1).cast("int")


def semantic_neardup_pairs(
    emb: DataFrame,
    *,
    threshold: float,
    n_clusters: int = 8,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    max_cluster_size: int | None = None,
    assign: str = "auto",
    pair_mode: str = "auto",
) -> DataFrame:
    """SemDeDup-formulation near-dup pairs: cluster the embedding space,
    then score pairs ONLY within a cluster (a<b, cosine >= threshold).

    The cluster gate cuts the pair space from n^2 to sum |cluster_i|^2 —
    with balanced clusters a k-fold reduction, and each cluster's pair
    join shuffles independently (partition by cluster id), so the plan
    scales out where the exact all-pairs baseline cannot. The price is
    SemDeDup's own: a near-dup pair split across a cluster boundary is
    missed (recall < 1; raise n_clusters for speed, lower for recall).

    ``max_cluster_size`` guards the skew case (one trained mega-cluster
    re-creates the n^2 blowup): clusters above the cap are salt-split
    into ceil(size/cap) sub-cells by a deterministic hash of the id, so
    no cell pairs more than ~cap^2 rows. Pairs across sub-cells of the
    same cluster are missed — prefer raising n_clusters; the cap is the
    bounded-cost backstop (same rationale as the MinHash/SimHash bucket
    caps in pipeline/text.py).

    ``centroids=None`` uses seeded random unit centroids (deterministic;
    with the plan-literal assignment this whole operator is replayable in
    SQL — see the ``semantic_neardup`` contract oracle). Pass trained
    centroids from :func:`kmeans_fit` for better cluster locality.

    ``assign``: ``"literal"`` inlines the centroid matrix as plan
    literals (oracle-replayable; only viable while k*dim stays in the
    low thousands), ``"matmul"`` assigns via the numpy-closure matmul of
    :func:`kmeans_assign` (the scale path — dim 768 x k 50k centroids
    never touch the plan), ``"auto"`` picks literal iff k*dim <= 4096.
    Both are deterministic; they may disagree on argmax ties in the last
    float ulp, so the contract oracle pins the literal path.

    ``pair_mode``: ``"join"`` scores each candidate pair with the
    sequential-fold JVM cosine (bit-equal to the DuckDB oracle);
    ``"matmul"`` computes each cluster cell's full cosine matrix as one
    blocked numpy GEMM inside ``applyInPandas`` (~10x faster per pair,
    last-ulp different summation). ``"auto"`` follows ``assign``.
    """
    dim = len(emb.select(vec_col).first()[0])
    if centroids is None:
        centroids = seeded_centroids(dim, n_clusters, seed)
    if assign == "auto":
        assign = "literal" if centroids.size <= 4096 else "matmul"
    if assign == "literal":
        assigned = emb.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("v"),
            centroid_assign_column(vec_col, centroids).alias("cluster"),
        )
    elif assign == "matmul":
        assigned = kmeans_assign(
            emb, centroids, id_col=id_col, vec_col=vec_col
        ).join(
            emb.select(
                F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
            ),
            "vec_id",
        )
    else:
        raise ValueError(f"unknown assign mode {assign!r}")
    keys = ["cluster"]
    if max_cluster_size is not None:
        from .sampling import sample_hash

        sizes = assigned.groupBy("cluster").agg(
            F.count(F.lit(1)).alias("__n")
        )
        n_sub = F.greatest(
            F.lit(1).cast("long"),
            F.ceil(F.col("__n") / F.lit(max_cluster_size)).cast("long"),
        )
        assigned = (
            assigned.join(F.broadcast(sizes), "cluster")
            .withColumn(
                "cell", F.pmod(sample_hash(seed, "vec_id"), n_sub)
            )
            .drop("__n")
        )
        keys = ["cluster", "cell"]
    if pair_mode == "auto":
        pair_mode = "join" if assign == "literal" else "matmul"
    if pair_mode == "join":
        # oracle-replayable: sequential-fold cosine per pair, bit-equal to
        # DuckDB's list_dot_product
        a = assigned.select(
            *keys,
            F.col("vec_id"),
            F.col("v").alias("va"),
            _norm_col("v").alias("na"),
        )
        b = assigned.select(
            *keys,
            F.col("vec_id").alias("dup_id"),
            F.col("v").alias("vb"),
            _norm_col("v").alias("nb"),
        )
        return (
            a.join(b, keys)
            .filter(F.col("vec_id") < F.col("dup_id"))
            .select(
                "vec_id",
                "dup_id",
                (_dot("va", "vb") / (F.col("na") * F.col("nb"))).alias(
                    "cosine"
                ),
            )
            .filter(F.col("cosine") >= threshold)
        )
    if pair_mode != "matmul":
        raise ValueError(f"unknown pair_mode {pair_mode!r}")

    # scale path: one normalized BLAS matmul per cluster cell instead of
    # a per-pair higher-order-function fold — the whole cell's cosine
    # matrix is one blocked GEMM, only (id, id, cosine) rows leave the
    # worker. A cell must fit in executor memory: pair with
    # max_cluster_size (cap x dim floats + a 2048 x cap score panel).
    thr = float(threshold)

    def cell_pairs(key, pdf):
        import pandas as pd

        ids = pdf["vec_id"].to_numpy(np.int64)
        m = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0.0] = 1.0
        mn = m / norms[:, None]
        out = []
        panel = 2048
        for s in range(0, len(ids), panel):
            sim = mn[s : s + panel] @ mn.T
            ii, jj = np.nonzero(sim >= thr)
            gi, gj = ids[s + ii], ids[jj]
            keep = gi < gj
            out.append(
                pd.DataFrame(
                    {
                        "vec_id": gi[keep],
                        "dup_id": gj[keep],
                        "cosine": sim[ii[keep], jj[keep]],
                    }
                )
            )
        return (
            pd.concat(out, ignore_index=True)
            if out
            else pd.DataFrame(
                {"vec_id": [], "dup_id": [], "cosine": []}
            ).astype({"vec_id": "int64", "dup_id": "int64"})
        )

    return assigned.groupBy(*keys).applyInPandas(
        cell_pairs, "vec_id long, dup_id long, cosine double"
    )


def semantic_dedup(
    emb: DataFrame,
    *,
    threshold: float,
    n_clusters: int = 8,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    max_cluster_size: int | None = None,
    assign: str = "auto",
    pair_mode: str = "auto",
) -> DataFrame:
    """(vec_id, keep): greedy-by-id dedup over the cluster-gated pair
    stream — a vector is dropped iff a same-cluster near-duplicate with a
    smaller id exists (SemDeDup keeps one representative per duplicate
    group; smallest-id is the deterministic choice)."""
    pairs = semantic_neardup_pairs(
        emb, threshold=threshold, n_clusters=n_clusters, seed=seed,
        id_col=id_col, vec_col=vec_col, centroids=centroids,
        max_cluster_size=max_cluster_size, assign=assign,
        pair_mode=pair_mode,
    )
    dropped = pairs.select(F.col("dup_id").alias(id_col)).distinct()
    return (
        emb.select(id_col)
        .join(dropped.withColumn("__drop", F.lit(True)), id_col, "left")
        .select(F.col(id_col), F.col("__drop").isNull().alias("keep"))
    )


def kmeans_assign(
    emb: DataFrame,
    centroids: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster): nearest-centroid (max dot on unit centroids /
    min squared distance otherwise) assignment — one numpy matmul per
    Arrow batch, centroid matrix in the closure (broadcast once per
    worker), never per-row Python and never plan literals."""
    cents = np.asarray(centroids, dtype=np.float64)
    cents_t = cents.T.copy()
    half_sq = 0.5 * (cents * cents).sum(axis=1)  # argmin ||v-c||^2 ==
    # argmax (v.c - 0.5||c||^2): one matmul covers non-unit centroids too

    src = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )

    def assign(pdf_iter):
        import pandas as pd

        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf["v"].to_numpy())
            scores = m @ cents_t - half_sq
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cluster": np.argmax(scores, axis=1).astype("int32"),
                }
            )

    return src.mapInPandas(assign, "vec_id long, cluster int")


def kmeans_fit(
    emb: DataFrame,
    *,
    k: int = 8,
    max_iter: int = 10,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Distributed Lloyd's k-means over the embedding column; returns the
    (k, dim) centroid matrix (feed to :func:`kmeans_assign` /
    :func:`semantic_neardup_pairs`).

    Init is the k vectors with the smallest ``xxhash64(id)`` — a
    deterministic uniform draw (same hash-gate rationale as
    ``pipeline/sampling``). Each iteration is ONE job: assignment via
    the closure matmul, then per-cluster mean as (cluster, pos) partial
    sums — k*dim tiny rows shuffle, never vectors to the driver beyond
    the k centroids themselves. Iteration-count bounded, no convergence
    collect loop beyond the k*dim aggregate each round.

    Centroid means sum floats in shuffle order, so results are stable
    only to the last ulp across cluster layouts — pair with the
    structural validity oracle (every point nearest its own centroid),
    not a value-hash oracle.
    """
    src = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    init_rows = (
        src.orderBy(F.xxhash64(F.col("vec_id")), F.col("vec_id"))
        .limit(k)
        .collect()
    )
    cents = np.array([r.v for r in init_rows], dtype=np.float64)
    if len(cents) < k:
        raise ValueError(f"k={k} exceeds the {len(cents)} input vectors")

    for _ in range(max_iter):
        assigned = kmeans_assign(
            src, cents, id_col="vec_id", vec_col="v"
        ).join(src, "vec_id")
        sums = (
            assigned.select(
                "cluster", F.posexplode("v").alias("pos", "val")
            )
            .groupBy("cluster", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = cents.copy()
        counts = np.zeros(k, dtype=np.int64)
        acc = np.zeros_like(cents)
        for r in sums:
            acc[r.cluster, r.pos] = r.s
            counts[r.cluster] = r.n
        nonempty = counts > 0
        new[nonempty] = acc[nonempty] / counts[nonempty, None]
        if np.allclose(new, cents, rtol=0, atol=1e-12):
            cents = new
            break
        cents = new
    return cents


# ---------------------------------------------------------------------------
# Scalar quantization: the memory-side scale lever for ANN. float32
# embeddings at 100 TB are often the single largest column; symmetric
# int8 quantization cuts the vector bytes 4x while cosine ranking is
# preserved almost exactly (per-vector scales cancel out of cosine).
# ---------------------------------------------------------------------------


def quantize_embeddings(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """(vec_id, scale, qvec): per-vector symmetric scalar quantization —
    ``scale = max|v| / qmax`` and ``q_i = clamp(floor(v_i/scale + 0.5))``
    with ``qmax = 2^(bits-1) - 1`` (127 for int8).

    ``floor(x + 0.5)`` is used instead of ``round`` deliberately: its
    tie behavior is identical in every engine (Spark, DuckDB, numpy),
    so the quantized vectors are bit-reproducible and an external
    oracle can replay them exactly. Zero vectors get scale 1.0.

    Pure JVM projection — zero shuffle; the dequantized value is
    ``q_i * scale``."""
    if not 2 <= bits <= 16:
        raise ValueError(f"bits must be in [2, 16], got {bits}")
    qmax = float((1 << (bits - 1)) - 1)
    max_abs = F.aggregate(
        F.col(vec_col),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    scale = F.when(max_abs == 0.0, F.lit(1.0)).otherwise(max_abs / qmax)
    base = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("__v"),
        scale.alias("scale"),
    )
    q = F.transform(
        F.col("__v"),
        lambda x: F.greatest(
            F.lit(int(-qmax)),
            F.least(
                F.lit(int(qmax)),
                F.floor(x.cast("double") / F.col("scale") + 0.5),
            ),
        ).cast("int"),
    )
    return base.select("vec_id", "scale", q.alias("qvec"))


def cosine_topk_quantized(
    emb: DataFrame,
    *,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Brute-force cosine top-k over int8-quantized vectors — the
    4x-less-memory variant of :func:`cosine_topk_bruteforce`. Per-vector
    scales cancel out of cosine, so the score is exactly the cosine of
    the integer vectors: all dot products are integer-exact in doubles
    (|q| <= 127 ⇒ no float noise until the final divide), which is what
    makes the whole ranking externally replayable."""
    q = quantize_embeddings(emb, id_col=id_col, vec_col=vec_col, bits=bits)
    qd = F.aggregate(
        F.zip_with("qa", "qb", lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    a = q.select(
        F.col("vec_id"),
        F.col("qvec").alias("qa"),
        F.sqrt(
            F.aggregate(
                F.col("qvec"),
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x,
            )
        ).alias("na"),
    )
    b = a.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("qa").alias("qb"),
        F.col("na").alias("nb"),
    )
    scored = (
        a.crossJoin(b)
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .filter((F.col("na") > 0) & (F.col("nb") > 0))
        .select(
            "vec_id",
            "neighbor_id",
            (qd / (F.col("na") * F.col("nb"))).alias("cosine"),
        )
    )
    win = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(win))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )
