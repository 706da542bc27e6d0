"""GraphSage inductive node embeddings (gds.beta.graphSage.*).

Reference semantics (gds/embeddings/graphsage/GraphSageModelTrainer.java:59,
GraphSage.java, Aggregator.java — MEAN aggregator, activation SIGMOID/RELU,
sampleSizes [25, 10], unsupervised skip-gram loss with negative sampling,
predict streams one embedding per node): the model is a small stack of
per-layer weight matrices applied to (self, mean-of-neighbors) features;
training fits those weights on sampled minibatches, prediction runs the
learned layers over the full graph.

Spark-first split of the work:

- **predict** is the 100-TB path: each layer is one dst-grouped
  neighbor-mean (``applyInPandas`` numpy sums inside Arrow batches — the
  same shape as FastRP's propagation step) followed by a ``mapInPandas``
  dense matmul + activation with the (tiny) broadcast weight matrices.
  One shuffle per layer, no driver state, full-neighborhood means (a
  deterministic superset of GDS's sampled predict-time neighborhoods).
- **train** is inherently minibatch (GDS trains on batchSize=100 node
  batches too): the vertex set is hash-partitioned into
  ``ceil(|V| / batch_size)`` disjoint batches and EVERY epoch iterates
  the whole batch queue — one Adam step per batch visit on the
  unsupervised objective ``-log σ(z_u·z_v) − Q·mean log σ(−z_u·z_n)``
  (positive v = sampled neighbor, negatives = hash-sampled nodes) —
  matching the reference's per-epoch batch loop
  (GraphSageModelTrainer.java:59 trainEpoch iterates the batch tasks).
  Each batch's fanout-sampled L-hop neighborhood is bounded
  (``batch_size × Π sample_sizes`` rows), sampled once per batch
  (deterministic hash-rank sampling) and reused across epochs; the
  Adam state is a single sequential optimizer over the queue (the
  reference runs per-batch updaters against shared weights — same
  minibatch semantics, deterministic here). Weights are O(dim²) —
  kilobytes — so driver training + distributed inference is the right
  scale split. ``max_batches`` caps the queue (driver memory holds the
  cached neighborhoods) for very large graphs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..graph import Graph

_ACTIVATIONS = ("SIGMOID", "RELU")


def _act(x: np.ndarray, kind: str) -> np.ndarray:
    if kind == "RELU":
        return np.maximum(x, 0.0)
    return 1.0 / (1.0 + np.exp(-np.clip(x, -60, 60)))


def _act_grad(pre: np.ndarray, post: np.ndarray, kind: str) -> np.ndarray:
    if kind == "RELU":
        return (pre > 0).astype(np.float64)
    return post * (1.0 - post)


@dataclass
class GraphSageModel:
    """Learned weights + config; store via the model catalog."""

    feature_cols: list[str]
    embedding_dim: int
    aggregator: str  # MEAN (POOL maps onto the same message shape)
    activation: str
    sample_sizes: list[int]
    # per layer: (W_self (out,in), W_neigh (out,in))
    layers: list[tuple[np.ndarray, np.ndarray]] = field(default_factory=list)
    train_loss: float = float("nan")
    # mean batch loss per epoch (ref reports per-epoch losses too)
    loss_history: list[float] = field(default_factory=list)

    @property
    def name(self) -> str:  # model-catalog compatibility
        return "graphSage"


def feature_frame(
    graph: Graph, feature_cols: list[str] | None
) -> tuple[DataFrame, int]:
    """(internal_id, feat array<double>) from vertex property columns;
    falls back to [log1p(out-degree)] when no properties are projected
    (GDS requires featureProperties; the degree fallback keeps the
    operator usable on property-less projections)."""
    if feature_cols:
        feats = graph.vertices.select(
            "internal_id",
            F.array(
                *[F.col(c).cast("double") for c in feature_cols]
            ).alias("feat"),
        )
        return feats, len(feature_cols)
    deg = graph.out_degrees()
    feats = (
        graph.vertices.select("internal_id")
        .join(deg, "internal_id", "left")
        .select(
            "internal_id",
            F.array(
                F.log1p(F.coalesce(F.col("degree"), F.lit(0.0)))
            ).alias("feat"),
        )
    )
    return feats, 1


def _sampled_neighborhood(
    graph: Graph,
    batch: DataFrame,
    sample_sizes: list[int],
    seed: int,
) -> tuple[DataFrame, DataFrame]:
    """(nodes, sampled_edges) for the batch's L-hop sampled neighborhood.

    Fanout sampling by hash-rank: for each frontier node keep the
    ``fanout`` neighbors with the smallest xxhash64(src, dst, seed) —
    deterministic under any partitioning, no rand(). The frontier is
    minibatch-bounded, so the per-src window is cheap.
    """
    from pyspark.sql import Window

    nodes = batch.select("internal_id")
    frontier = nodes
    samples = []
    for hop, fanout in enumerate(sample_sizes):
        hop_edges = graph.edges.join(
            frontier.withColumnRenamed("internal_id", "src").hint("broadcast"),
            "src",
        ).select("src", "dst")
        w = Window.partitionBy("src").orderBy(
            F.xxhash64("src", "dst", F.lit(seed + hop))
        )
        sampled = (
            hop_edges.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= fanout)
            .select("src", "dst")
        )
        samples.append(sampled)
        frontier = sampled.select(
            F.col("dst").alias("internal_id")
        ).distinct()
        nodes = nodes.unionByName(frontier).distinct()
    edges = samples[0]
    for s in samples[1:]:
        edges = edges.unionByName(s)
    return nodes.distinct(), edges.distinct()


def _forward(
    h0: np.ndarray,
    src: np.ndarray,
    dst: np.ndarray,
    layers: list[tuple[np.ndarray, np.ndarray]],
    activation: str,
):
    """Forward pass over the (driver-side) sampled subgraph; returns the
    per-layer cache for backprop. Neighbor mean via index scatter —
    O(E·dim), no dense adjacency."""
    n = h0.shape[0]
    cnt = np.zeros(n)
    np.add.at(cnt, src, 1.0)
    cnt_safe = np.where(cnt == 0, 1.0, cnt)
    cache = []
    h = h0
    for ws, wn in layers:
        m = np.zeros((n, h.shape[1]))
        np.add.at(m, src, h[dst])
        m /= cnt_safe[:, None]
        pre = h @ ws.T + m @ wn.T
        post = _act(pre, activation)
        cache.append((h, m, pre, post))
        h = post
    return h, cache, cnt_safe


def graphsage_train(
    graph: Graph,
    *,
    feature_cols: list[str] | None = None,
    embedding_dim: int = 64,
    aggregator: str = "MEAN",
    activation: str = "SIGMOID",
    sample_sizes: list[int] | None = None,
    batch_size: int = 256,
    epochs: int = 4,
    learning_rate: float = 0.1,
    negative_sample_weight: float = 5.0,
    n_negative: int = 5,
    seed: int = 42,
    max_batches: int | None = None,
) -> GraphSageModel:
    """Fit GraphSage layer weights (gds.beta.graphSage.train).

    The vertex set is hash-partitioned into ``ceil(|V| / batch_size)``
    disjoint batches; every epoch sweeps the WHOLE batch queue with one
    Adam step per batch (the reference's trainEpoch iterates its batch
    tasks the same way — GraphSageModelTrainer.java:59). Each batch's
    sampled L-hop neighborhood (≤ batch×Πfanouts rows) is collected
    once and reused across epochs. ``max_batches`` caps the queue for
    very large graphs (the cached neighborhoods live on the driver)."""
    if activation not in _ACTIVATIONS:
        raise ValueError(f"activation must be one of {_ACTIVATIONS}")
    sample_sizes = list(sample_sizes or [25, 10])
    feats, in_dim = feature_frame(graph, feature_cols)

    n_total = graph.node_count()
    n_batches = max(1, -(-n_total // batch_size))
    if max_batches is not None:
        n_batches = max(1, min(n_batches, max_batches))
    vs = graph.vertices.select("internal_id").withColumn(
        "__b",
        F.pmod(
            F.xxhash64("internal_id", F.lit(seed)), F.lit(n_batches)
        ).cast("int"),
    ).localCheckpoint(eager=False)

    rng = np.random.default_rng(seed)
    dims = [in_dim] + [embedding_dim] * len(sample_sizes)
    layers = []
    for li in range(len(sample_sizes)):
        lim = np.sqrt(6.0 / (dims[li] + dims[li + 1]))
        layers.append(
            (
                rng.uniform(-lim, lim, (dims[li + 1], dims[li])),
                rng.uniform(-lim, lim, (dims[li + 1], dims[li])),
            )
        )

    # ---- batch queue: collect each batch's bounded neighborhood once ----
    batch_data: list[tuple] = []
    for b in range(n_batches):
        batch = (
            vs.filter(F.col("__b") == b)
            .select("internal_id")
            .orderBy(F.xxhash64("internal_id", F.lit(seed + 1)), "internal_id")
            .limit(batch_size)
        )
        nodes, edges = _sampled_neighborhood(
            graph, batch, sample_sizes, seed + 101 * b
        )
        node_pdf = (
            nodes.join(feats, "internal_id").orderBy("internal_id").toPandas()
        )
        if len(node_pdf) == 0:
            continue
        ids = node_pdf["internal_id"].to_numpy(np.int64)
        pos = {int(v): i for i, v in enumerate(ids)}
        h0 = np.stack(node_pdf["feat"].to_numpy()).astype(np.float64)
        e_pdf = edges.toPandas()
        src = np.array([pos[int(s)] for s in e_pdf["src"]], dtype=np.int64)
        dst = np.array([pos[int(d)] for d in e_pdf["dst"]], dtype=np.int64)
        batch_ids = [int(r.internal_id) for r in batch.collect()]
        batch_idx = np.array([pos[x] for x in batch_ids], dtype=np.int64)
        # positive partner: the hash-min sampled neighbor of each node
        nbr_of: dict[int, int] = {}
        for s, d in zip(src, dst):
            nbr_of.setdefault(int(s), int(d))
        pairs = [(x, nbr_of[x]) for x in batch_idx if int(x) in nbr_of]
        if not pairs:
            continue
        u_idx = np.array([p[0] for p in pairs])
        v_idx = np.array([p[1] for p in pairs])
        batch_data.append((h0, src, dst, u_idx, v_idx, len(ids)))

    if not batch_data:
        return GraphSageModel(
            feature_cols or [], embedding_dim, aggregator, activation,
            sample_sizes, layers,
        )

    # ---- training loop: epochs × batch queue, one Adam step per visit --
    mom = [(np.zeros_like(ws), np.zeros_like(wn)) for ws, wn in layers]
    vel = [(np.zeros_like(ws), np.zeros_like(wn)) for ws, wn in layers]
    b1, b2, eps = 0.9, 0.999, 1e-8
    t = 0
    loss = float("nan")
    loss_history: list[float] = []
    for _epoch in range(epochs):
        epoch_losses: list[float] = []
        for h0, src, dst, u_idx, v_idx, n_ids in batch_data:
            z, cache, cnt_safe = _forward(h0, src, dst, layers, activation)
            neg_idx = rng.integers(0, n_ids, size=(len(u_idx), n_negative))
            zu, zv, zn = z[u_idx], z[v_idx], z[neg_idx]
            s_pos = np.einsum("ij,ij->i", zu, zv)
            s_neg = np.einsum("ij,kij->ik", zu, zn.transpose(1, 0, 2))
            p_pos = 1.0 / (1.0 + np.exp(-np.clip(s_pos, -60, 60)))
            p_neg = 1.0 / (1.0 + np.exp(-np.clip(s_neg, -60, 60)))
            loss = float(
                -np.mean(np.log(p_pos + 1e-12))
                - negative_sample_weight
                * np.mean(np.log(1 - p_neg + 1e-12))
            )
            epoch_losses.append(loss)
            # dL/dz
            dz = np.zeros_like(z)
            c = 1.0 / len(u_idx)
            g_pos = -(1.0 - p_pos) * c
            np.add.at(dz, u_idx, g_pos[:, None] * zv)
            np.add.at(dz, v_idx, g_pos[:, None] * zu)
            g_neg = negative_sample_weight * p_neg * c / n_negative
            np.add.at(dz, u_idx, np.einsum("ik,ikj->ij", g_neg, zn))
            for k in range(n_negative):
                np.add.at(dz, neg_idx[:, k], g_neg[:, k][:, None] * zu)
            # backprop through layers
            grads = [None] * len(layers)
            dh = dz
            for li in range(len(layers) - 1, -1, -1):
                ws, wn = layers[li]
                h, m, pre, post = cache[li]
                dpre = dh * _act_grad(pre, post, activation)
                gws = dpre.T @ h
                gwn = dpre.T @ m
                dh_prev = dpre @ ws
                dm = dpre @ wn
                dm_scaled = dm / cnt_safe[:, None]
                np.add.at(dh_prev, dst, dm_scaled[src])
                grads[li] = (gws, gwn)
                dh = dh_prev
            t += 1
            new_layers = []
            for li, ((ws, wn), (gws, gwn)) in enumerate(zip(layers, grads)):
                upd = []
                for w, g, mi in ((ws, gws, 0), (wn, gwn, 1)):
                    mm = b1 * mom[li][mi] + (1 - b1) * g
                    vv = b2 * vel[li][mi] + (1 - b2) * g * g
                    mom_li = list(mom[li]); mom_li[mi] = mm
                    vel_li = list(vel[li]); vel_li[mi] = vv
                    mom[li] = tuple(mom_li); vel[li] = tuple(vel_li)
                    mhat = mm / (1 - b1**t)
                    vhat = vv / (1 - b2**t)
                    upd.append(
                        w - learning_rate * mhat / (np.sqrt(vhat) + eps)
                    )
                new_layers.append((upd[0], upd[1]))
            layers = new_layers
        loss_history.append(float(np.mean(epoch_losses)))
    return GraphSageModel(
        feature_cols or [], embedding_dim, aggregator, activation,
        sample_sizes, layers, train_loss=loss, loss_history=loss_history,
    )


def graphsage_predict(
    graph: Graph, model: GraphSageModel
) -> DataFrame:
    """(internal_id, embedding array<double>) — distributed inference
    (gds.beta.graphSage.stream/mutate/write).

    Per layer: dst-grouped neighbor mean (one shuffle) then a broadcast
    matmul + activation inside Arrow batches; final embeddings
    L2-normalized (GDS streams normalized embeddings).
    """
    feats, _ = feature_frame(graph, model.feature_cols or None)
    edges = graph.edges.select("src", "dst").localCheckpoint(eager=False)
    cur = feats.withColumnRenamed("feat", "vec")
    activation = model.activation
    for ws, wn in model.layers:
        # node u aggregates its OUT-neighbors' vectors — the same
        # direction the sampled training neighborhoods use
        msgs = edges.join(
            cur.withColumnRenamed("internal_id", "dst"), "dst"
        ).select(F.col("src").alias("internal_id"), "vec")

        def mean_agg(key, pdf: pd.DataFrame):
            mat = np.stack(pdf["vec"].to_numpy())
            return pd.DataFrame(
                {"internal_id": [key[0]], "nbr": [mat.mean(axis=0)]}
            )

        nbr = msgs.groupBy("internal_id").applyInPandas(
            mean_agg, "internal_id long, nbr array<double>"
        )
        joined = cur.join(nbr, "internal_id", "left")
        ws_b, wn_b = ws, wn

        def apply_layer(it, ws=ws_b, wn=wn_b, act=activation):
            for pdf in it:
                if len(pdf) == 0:
                    yield pd.DataFrame({"internal_id": [], "vec": []})
                    continue
                h = np.stack(pdf["vec"].to_numpy())
                m = np.stack(
                    [
                        np.asarray(v, dtype=np.float64)
                        if v is not None
                        else np.zeros(h.shape[1])
                        for v in pdf["nbr"].to_numpy()
                    ]
                )
                out = _act(h @ ws.T + m @ wn.T, act)
                yield pd.DataFrame(
                    {
                        "internal_id": pdf["internal_id"],
                        "vec": [r for r in out],
                    }
                )

        cur = joined.mapInPandas(
            apply_layer, "internal_id long, vec array<double>"
        )

    def l2norm(it):
        for pdf in it:
            mat = np.stack(pdf["vec"].to_numpy())
            nrm = np.linalg.norm(mat, axis=1, keepdims=True)
            nrm[nrm == 0] = 1.0
            mat = mat / nrm
            yield pd.DataFrame(
                {
                    "internal_id": pdf["internal_id"],
                    "embedding": [r for r in mat],
                }
            )

    return cur.mapInPandas(l2norm, "internal_id long, embedding array<double>")


def graphsage(
    graph: Graph, **kwargs
) -> tuple[GraphSageModel, DataFrame]:
    """Train + predict in one call (gds.beta.graphSage.train then
    .stream). Returns (model, embeddings)."""
    model = graphsage_train(graph, **kwargs)
    return model, graphsage_predict(graph, model)
