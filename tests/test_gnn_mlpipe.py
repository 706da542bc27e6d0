"""GraphSage train/predict + NC/LP pipeline tests.

Fixtures: two-cluster graphs with cluster-correlated features — the
embedding/classifier must separate the clusters.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.graph import UNDIRECTED, from_edge_df
from graph_data_science_spark.operators.gnn import (
    graphsage_predict,
    graphsage_train,
)
from graph_data_science_spark.operators.mlpipe import (
    link_prediction_predict,
    link_prediction_train,
    node_classification_predict,
    node_classification_train,
)


def _two_cluster_graph(spark, n_per=12, seed=7):
    """Two dense clusters bridged by one edge; feature = cluster signal."""
    rng = np.random.default_rng(seed)
    edges = []
    for c in range(2):
        base = c * n_per
        for i in range(n_per):
            for j in range(i + 1, n_per):
                if rng.random() < 0.6:
                    edges.append((base + i, base + j))
    edges.append((0, n_per))  # bridge
    e = spark.createDataFrame(edges, "src long, dst long")
    g = from_edge_df(e, orientation=UNDIRECTED)
    feat_rows = [
        (i, float(1.0 if i < n_per else -1.0) + rng.normal(0, 0.1),
         float(i % 3), int(i < n_per))
        for i in range(2 * n_per)
    ]
    feats = spark.createDataFrame(
        feat_rows, "internal_id long, f1 double, f2 double, cls long"
    )
    g.vertices = g.vertices.join(feats, "internal_id", "left").fillna(
        {"f1": 0.0, "f2": 0.0, "cls": 0}
    )
    return g, n_per


def test_graphsage_shapes_and_determinism(spark):
    g, n_per = _two_cluster_graph(spark)
    model = graphsage_train(
        g, feature_cols=["f1", "f2"], embedding_dim=8,
        sample_sizes=[5, 3], batch_size=16, epochs=3, seed=11,
    )
    assert len(model.layers) == 2
    assert model.layers[0][0].shape == (8, 2)
    assert model.layers[1][0].shape == (8, 8)
    emb = graphsage_predict(g, model).orderBy("internal_id")
    rows = emb.collect()
    assert len(rows) == g.node_count()
    assert all(len(r.embedding) == 8 for r in rows)
    # L2 normalized
    for r in rows[:5]:
        assert abs(np.linalg.norm(r.embedding) - 1.0) < 1e-9
    # deterministic end to end
    model2 = graphsage_train(
        g, feature_cols=["f1", "f2"], embedding_dim=8,
        sample_sizes=[5, 3], batch_size=16, epochs=3, seed=11,
    )
    rows2 = graphsage_predict(g, model2).orderBy("internal_id").collect()
    for a, b in zip(rows, rows2):
        assert np.allclose(a.embedding, b.embedding)


def test_graphsage_separates_clusters(spark):
    g, n_per = _two_cluster_graph(spark)
    model = graphsage_train(
        g, feature_cols=["f1"], embedding_dim=4, sample_sizes=[8, 4],
        batch_size=24, epochs=5, seed=3,
    )
    emb = {
        r.internal_id: np.array(r.embedding)
        for r in graphsage_predict(g, model).collect()
    }
    same, cross = [], []
    ids = sorted(emb)
    for i in ids:
        for j in ids:
            if i >= j:
                continue
            cos = float(emb[i] @ emb[j])
            (same if (i < n_per) == (j < n_per) else cross).append(cos)
    assert np.mean(same) > np.mean(cross)


def test_graphsage_degree_fallback_features(spark):
    g, _ = _two_cluster_graph(spark)
    model = graphsage_train(
        g, feature_cols=None, embedding_dim=4, sample_sizes=[4],
        batch_size=8, epochs=2,
    )
    assert model.layers[0][0].shape == (4, 1)
    out = graphsage_predict(g, model)
    assert out.count() == g.node_count()


def test_node_classification_train_predict(spark):
    g, n_per = _two_cluster_graph(spark)
    model = node_classification_train(
        g, feature_cols=["f1", "f2"], target_col="cls",
        params=[{"penalty": 0.0}, {"penalty": 0.5}],
        metric="ACCURACY", seed=5,
    )
    # f1 is (almost) linearly separable by class -> near-perfect holdout
    assert model.metrics["test"]["ACCURACY"] >= 0.9
    assert model.best_params in [{"penalty": 0.0}, {"penalty": 0.5}]
    pred = node_classification_predict(model, g)
    rows = pred.collect()
    assert len(rows) == g.node_count()
    acc = np.mean(
        [
            r.predicted_class == (1 if r.internal_id < n_per else 0)
            for r in rows
        ]
    )
    assert acc >= 0.9
    assert all(abs(sum(r.probabilities) - 1.0) < 1e-6 for r in rows)


def test_node_classification_f1_metric(spark):
    g, _ = _two_cluster_graph(spark)
    model = node_classification_train(
        g, feature_cols=["f1"], target_col="cls",
        params=[{"penalty": 0.0}], metric="F1_WEIGHTED", seed=5,
    )
    assert 0.0 <= model.metrics["test"]["F1_WEIGHTED"] <= 1.0
    assert model.metrics["test"]["F1_WEIGHTED"] >= 0.85


def test_link_prediction_train_predict(spark):
    g, n_per = _two_cluster_graph(spark, n_per=14)
    model = link_prediction_train(
        g, feature_cols=["f1", "f2"], combiner="HADAMARD",
        params=[{"penalty": 0.0}], seed=9,
    )
    # intra-cluster pairs share feature sign -> hadamard separates
    assert model.metrics["test"]["AUCPR"] > 0.6
    top = link_prediction_predict(model, g, top_n=20)
    rows = top.collect()
    assert 0 < len(rows) <= 20
    assert all(0.0 <= r.probability <= 1.0 for r in rows)
    # predictions are non-edges
    edges = {(r.src, r.dst) for r in g.edges.collect()}
    assert all((r.src, r.dst) not in edges for r in rows)
    # top pairs should be intra-cluster (same feature sign)
    intra = np.mean(
        [(r.src < n_per) == (r.dst < n_per) for r in rows]
    )
    assert intra >= 0.8


def test_link_prediction_combiners(spark):
    g, _ = _two_cluster_graph(spark)
    for combiner in ("COSINE", "L2"):
        model = link_prediction_train(
            g, feature_cols=["f1", "f2"], combiner=combiner,
            params=[{"penalty": 0.0}], seed=9,
        )
        assert 0.0 <= model.metrics["test"]["AUCPR"] <= 1.0
    with pytest.raises(ValueError):
        link_prediction_train(
            g, feature_cols=["f1"], combiner="NOPE",
        )


def test_graphsage_all_batches_schedule(spark):
    """The trainer sweeps the whole batch queue per epoch: loss history
    decreases, and covering every batch separates two planted
    communities at least as well as training on one batch only."""
    g, n_per = _two_cluster_graph(spark, n_per=30, seed=13)
    kw = dict(
        feature_cols=["f1"], embedding_dim=4, sample_sizes=[6, 3],
        batch_size=16, epochs=5, seed=3,
    )
    model = graphsage_train(g, **kw)  # 60 nodes / 16 → 4 batches
    assert len(model.loss_history) == 5
    assert model.loss_history[-1] < model.loss_history[0]

    def separation(m):
        emb = {
            r.internal_id: np.array(r.embedding)
            for r in graphsage_predict(g, m).collect()
        }
        ids = sorted(emb)
        same, cross = [], []
        for i in ids:
            for j in ids:
                if i >= j:
                    continue
                cos = float(emb[i] @ emb[j])
                (same if (i < n_per) == (j < n_per) else cross).append(cos)
        return float(np.mean(same) - np.mean(cross))

    single = graphsage_train(g, max_batches=1, **kw)
    assert separation(model) >= separation(single) - 1e-6


# ---------------------------------------------------------------------------
# node regression
# ---------------------------------------------------------------------------
def _regression_graph(spark, n=120):
    """Deterministic linear target y = 3*f1 - 2*f2 + 5 (+ tiny noise)."""
    from graph_data_science_spark.graph import Graph

    rows = [
        (i, float(i % 17), float((i * 7) % 23),
         3.0 * (i % 17) - 2.0 * ((i * 7) % 23) + 5.0 + ((i % 7) - 3) * 0.01)
        for i in range(1, n + 1)
    ]
    v = spark.createDataFrame(
        rows, "internal_id long, f1 double, f2 double, y double"
    )
    return Graph(v, spark.createDataFrame([], "src long, dst long"))


def test_node_regression_recovers_linear_rule(spark):
    from graph_data_science_spark.operators.mlpipe import (
        node_regression_predict,
        node_regression_train,
    )

    g = _regression_graph(spark)
    model = node_regression_train(
        g, feature_cols=["f1", "f2"], target_col="y",
        params=[{"penalty": 0.0, "solver": "normal"}], seed=42,
    )
    # OLS on a near-noiseless linear target: coefficients ~ (3, -2),
    # intercept ~ 5, and test RMSE at the noise floor (<0.05)
    coefs = list(model.model.coefficients)
    assert abs(coefs[0] - 3.0) < 0.05 and abs(coefs[1] + 2.0) < 0.05
    assert abs(model.model.intercept - 5.0) < 0.2
    assert model.metrics["test"]["ROOT_MEAN_SQUARED_ERROR"] < 0.05
    pred = node_regression_predict(model, g)
    bad = (
        pred.join(g.vertices, "internal_id")
        .filter(F.abs(F.col("predicted_value") - F.col("y")) > 0.1)
        .count()
    )
    assert bad == 0


def test_node_regression_model_selection_prefers_unpenalized(spark):
    from graph_data_science_spark.operators.mlpipe import (
        node_regression_train,
    )

    g = _regression_graph(spark)
    model = node_regression_train(
        g, feature_cols=["f1", "f2"], target_col="y",
        params=[{"penalty": 100.0}, {"penalty": 0.0, "solver": "normal"}],
        metric="MEAN_ABSOLUTE_ERROR", seed=42,
    )
    # the heavy ridge penalty shrinks coefficients and loses validation
    assert model.best_params == {"penalty": 0.0, "solver": "normal"}
    scores = {str(s["params"]): s["MEAN_ABSOLUTE_ERROR"]
              for s in model.metrics["validation"]}
    assert scores["{'penalty': 0.0, 'solver': 'normal'}"] < scores[
        "{'penalty': 100.0}"]


def test_node_regression_random_forest_candidate(spark):
    from graph_data_science_spark.operators.mlpipe import (
        node_regression_predict,
        node_regression_train,
    )

    g = _regression_graph(spark)
    model = node_regression_train(
        g, feature_cols=["f1", "f2"], target_col="y",
        params=[{"model": "RANDOM_FOREST", "num_trees": 30,
                 "max_depth": 8}],
        seed=42,
    )
    pred = node_regression_predict(model, g)
    assert pred.count() == 120
    # forest on a deterministic grid target: far better than the mean
    # predictor (y spans ~[-39, 53]; std ~ 18)
    assert model.metrics["test"]["ROOT_MEAN_SQUARED_ERROR"] < 10.0
