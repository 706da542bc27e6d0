"""Node-classification and link-prediction train/predict pipelines
(gds.alpha.ml.nodeClassification.*, gds.alpha.ml.linkPrediction.*).

Reference semantics (gds/ml/nodemodels/NodeClassificationTrain.java,
gds/ml/linkmodels/LinkPredictionTrain.java): candidate logistic-regression
configs are trained on a train split, scored on a validation split
(metrics ACCURACY / F1_WEIGHTED for NC, AUCPR for LP), the winner is
retrained on the full train set and evaluated on the held-out test set;
LP pair features combine the two endpoint vectors (HADAMARD / COSINE /
L2 — LinkFeatureCombiners.java).

Spark-first: the model IS Spark MLlib's LogisticRegression (JVM-side
L-BFGS over the distributed feature frame — scales with executors);
splits are deterministic arithmetic hashes of ids (portable, partition-
independent — same device as ``mlops.split_relationships``); metrics are
DataFrame aggregations. No driver-side loops over rows anywhere.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from .mlops import _SPLIT_MOD, _split_hash, split_relationships

HADAMARD = "HADAMARD"
COSINE = "COSINE"
L2 = "L2"
_COMBINERS = (HADAMARD, COSINE, L2)


def _lr(params: dict):
    from pyspark.ml.classification import LogisticRegression

    return LogisticRegression(
        featuresCol="features",
        labelCol="label",
        predictionCol="prediction",
        regParam=float(params.get("penalty", 0.0)),
        elasticNetParam=float(params.get("elastic_net", 0.0)),
        maxIter=int(params.get("max_iterations", 100)),
        tol=float(params.get("tolerance", 1e-6)),
        standardization=False,
    )


def _fit(params: dict, df: DataFrame):
    """Fit + strip the training summary. The summary holds a SparkSession
    reference; `transform` closures capture the model, and a session whose
    ObservationManager has been touched (any Observation-using job, e.g.
    the fused Pregel kernel) is not task-serializable — so a summary-
    carrying model poisons every later action on its output. The summary
    is not persisted, so a save/load round-trip drops it."""
    import shutil
    import tempfile

    from pyspark.ml.classification import LogisticRegressionModel

    m = _lr(params).fit(df)
    path = tempfile.mkdtemp(prefix="gds_lr_")
    try:
        m.write().overwrite().save(path)
        return LogisticRegressionModel.load(path)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def _node_features(
    graph: Graph, feature_cols: list[str]
) -> DataFrame:
    """(internal_id, features vector) from vertex property columns."""
    from pyspark.ml.functions import array_to_vector

    return graph.vertices.select(
        "internal_id",
        array_to_vector(
            F.array(*[F.col(c).cast("double") for c in feature_cols])
        ).alias("features"),
    )


@dataclass
class NodeClassificationModel:
    model: object  # fitted LogisticRegressionModel
    feature_cols: list[str]
    best_params: dict
    metrics: dict = field(default_factory=dict)

    @property
    def name(self) -> str:
        return "nodeClassification"


def _nc_metric(pred: DataFrame, metric: str) -> float:
    """ACCURACY or F1_WEIGHTED as DataFrame aggregations."""
    if metric == "ACCURACY":
        row = pred.agg(
            F.avg(
                (F.col("prediction") == F.col("label")).cast("double")
            ).alias("m")
        ).collect()[0]
        return float(row["m"] or 0.0)
    # weighted F1: per-class F1 weighted by true-class support
    per = (
        pred.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("support"),
            F.sum(
                (F.col("prediction") == F.col("label")).cast("long")
            ).alias("tp"),
        )
        .join(
            pred.groupBy(F.col("prediction").alias("label"))
            .agg(F.count(F.lit(1)).alias("pred_n")),
            "label",
            "left",
        )
        .select(
            "support",
            (
                2.0
                * F.col("tp")
                / (F.col("support") + F.coalesce("pred_n", F.lit(0)))
            ).alias("f1"),
        )
        .agg(
            (
                F.sum(F.col("f1") * F.col("support")) / F.sum("support")
            ).alias("m")
        )
        .collect()[0]
    )
    return float(per["m"] or 0.0)


def node_classification_train(
    graph: Graph,
    *,
    feature_cols: list[str],
    target_col: str,
    params: list[dict] | None = None,
    metric: str = "F1_WEIGHTED",
    holdout_fraction: float = 0.3,
    seed: int = 42,
) -> NodeClassificationModel:
    """Model-selecting NC training (gds.alpha.ml.nodeClassification.train).

    Deterministic hash split → per-candidate fit on train, score on
    validation → best candidate refit on train∪validation → test metric.
    """
    params = params or [{"penalty": 0.0}, {"penalty": 0.1}]
    labeled = _node_features(graph, feature_cols).join(
        graph.vertices.select(
            "internal_id", F.col(target_col).cast("double").alias("label")
        ),
        "internal_id",
    )
    h = F.pmod(
        F.col("internal_id") * F.lit(2654435761) + F.lit(seed * 97),
        F.lit(_SPLIT_MOD),
    )
    test_cut = int(holdout_fraction * _SPLIT_MOD)
    test = labeled.filter(h < test_cut)
    rest = labeled.filter(h >= test_cut)
    val_cut = test_cut + int(holdout_fraction * (_SPLIT_MOD - test_cut))
    val = rest.filter(h < val_cut)
    train = rest.filter(h >= val_cut)
    train = train.cache()
    val = val.cache()

    best, best_score, best_params = None, float("-inf"), params[0]
    val_scores = []
    for p in params:
        m = _fit(p, train)
        s = _nc_metric(m.transform(val), metric)
        val_scores.append({"params": p, metric: round(s, 6)})
        if s > best_score:
            best, best_score, best_params = m, s, p
    final = _fit(best_params, rest)
    test_score = _nc_metric(final.transform(test), metric)
    train_score = _nc_metric(final.transform(rest), metric)
    return NodeClassificationModel(
        final,
        feature_cols,
        best_params,
        metrics={
            "validation": val_scores,
            "outer_train": {metric: round(train_score, 6)},
            "test": {metric: round(test_score, 6)},
        },
    )


def node_classification_predict(
    model: NodeClassificationModel, graph: Graph
) -> DataFrame:
    """(internal_id, predicted_class, probabilities array<double>)."""
    from pyspark.ml.functions import vector_to_array

    feats = _node_features(graph, model.feature_cols)
    return model.model.transform(feats).select(
        "internal_id",
        F.col("prediction").cast("long").alias("predicted_class"),
        vector_to_array("probability").alias("probabilities"),
    )


# ---------------------------------------------------------------------------
# link prediction
# ---------------------------------------------------------------------------
@dataclass
class LinkPredictionModel:
    model: object
    feature_cols: list[str]
    combiner: str
    best_params: dict
    metrics: dict = field(default_factory=dict)

    @property
    def name(self) -> str:
        return "linkPrediction"


def _pair_features(
    pairs: DataFrame, node_feats: DataFrame, combiner: str
) -> DataFrame:
    """Combine endpoint feature arrays per LinkFeatureCombiners.java:
    HADAMARD elementwise product, COSINE similarity scalar, L2 squared
    differences. ``node_feats``: (internal_id, feat array<double>)."""
    from pyspark.ml.functions import array_to_vector

    fa = node_feats.select(
        F.col("internal_id").alias("src"), F.col("feat").alias("fa")
    )
    fb = node_feats.select(
        F.col("internal_id").alias("dst"), F.col("feat").alias("fb")
    )
    j = pairs.join(fa, "src").join(fb, "dst")
    if combiner == HADAMARD:
        arr = F.zip_with("fa", "fb", lambda a, b: a * b)
    elif combiner == L2:
        arr = F.zip_with("fa", "fb", lambda a, b: (a - b) * (a - b))
    else:  # COSINE: one scalar feature
        dot = F.aggregate(
            F.zip_with("fa", "fb", lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        na = F.sqrt(
            F.aggregate(
                F.transform("fa", lambda a: a * a),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        nb = F.sqrt(
            F.aggregate(
                F.transform("fb", lambda b: b * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        arr = F.array(dot / (na * nb + F.lit(1e-12)))
    return j.withColumn("features", array_to_vector(arr)).drop("fa", "fb")


def link_prediction_train(
    graph: Graph,
    *,
    feature_cols: list[str],
    combiner: str = HADAMARD,
    params: list[dict] | None = None,
    holdout_fraction: float = 0.3,
    negative_sampling_ratio: float = 1.0,
    seed: int = 42,
) -> LinkPredictionModel:
    """gds.alpha.ml.linkPrediction.train: deterministic edge holdout with
    negative sampling (``split_relationships``), pair features via the
    combiner, candidate LR fits scored by area-under-PR on a validation
    sub-split, winner refit on the full train set."""
    if combiner not in _COMBINERS:
        raise ValueError(f"combiner must be one of {_COMBINERS}")
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    params = params or [{"penalty": 0.0}, {"penalty": 0.1}]
    node_feats = graph.vertices.select(
        "internal_id",
        F.array(*[F.col(c).cast("double") for c in feature_cols]).alias(
            "feat"
        ),
    )
    remaining, test_pairs = split_relationships(
        graph,
        holdout_fraction=holdout_fraction,
        negative_sampling_ratio=negative_sampling_ratio,
        seed=seed,
    )
    # train positives/negatives from the remaining graph (second split)
    train_graph = Graph(graph.vertices, remaining)
    train_graph._node_count = graph._node_count
    _, train_pairs = split_relationships(
        train_graph,
        holdout_fraction=min(1.0, holdout_fraction * 2),
        negative_sampling_ratio=negative_sampling_ratio,
        seed=seed + 1,
    )
    train_f = _pair_features(train_pairs, node_feats, combiner).cache()
    test_f = _pair_features(test_pairs, node_feats, combiner).cache()
    ev = BinaryClassificationEvaluator(
        labelCol="label", rawPredictionCol="rawPrediction",
        metricName="areaUnderPR",
    )
    h = _split_hash(F.col("src"), F.col("dst"), seed + 2)
    vcut = int(0.3 * _SPLIT_MOD)
    tr = train_f.filter(h >= vcut)
    va = train_f.filter(h < vcut)
    # tiny graphs can leave the validation sub-split single-class; AUCPR
    # is undefined there — fall back to scoring on the train side
    if va.select("label").distinct().count() < 2:
        va = tr
    best, best_score, best_params = None, float("-inf"), params[0]
    val_scores = []
    for p in params:
        m = _fit(p, tr)
        s = float(ev.evaluate(m.transform(va)))
        val_scores.append({"params": p, "AUCPR": round(s, 6)})
        if s > best_score:
            best, best_score, best_params = m, s, p
    final = _fit(best_params, train_f)
    test_score = float(ev.evaluate(final.transform(test_f)))
    return LinkPredictionModel(
        final,
        feature_cols,
        combiner,
        best_params,
        metrics={
            "validation": val_scores,
            "test": {"AUCPR": round(test_score, 6)},
        },
    )


def link_prediction_predict(
    model: LinkPredictionModel,
    graph: Graph,
    *,
    top_n: int = 100,
    candidate_pairs: DataFrame | None = None,
    max_candidates_per_node: int = 50,
) -> DataFrame:
    """(src, dst, probability) — top-N non-edges by predicted link
    probability (gds.alpha.ml.linkPrediction.predict.stream).

    Candidates default to 2-hop (friend-of-friend) pairs with a per-node
    hash-rank cap — the scalable candidate generator: wedges only, never
    the n² cross join, and each node contributes at most
    ``max_candidates_per_node`` wedge partners.
    """
    from pyspark.ml.functions import vector_to_array
    from pyspark.sql import Window

    node_feats = graph.vertices.select(
        "internal_id",
        F.array(
            *[F.col(c).cast("double") for c in model.feature_cols]
        ).alias("feat"),
    )
    if candidate_pairs is None:
        e = graph.edges.select("src", "dst")
        ea = e.select(F.col("src").alias("a"), F.col("dst").alias("mid"))
        eb = e.select(F.col("src").alias("mid"), F.col("dst").alias("b"))
        wedges = (
            ea.join(eb, "mid")
            .filter(F.col("a") != F.col("b"))
            .select(F.col("a").alias("src"), F.col("b").alias("dst"))
            .distinct()
            .join(e, ["src", "dst"], "left_anti")
        )
        w = Window.partitionBy("src").orderBy(
            F.xxhash64("src", "dst"), "dst"
        )
        candidate_pairs = (
            wedges.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= max_candidates_per_node)
            .select("src", "dst")
        )
    scored = model.model.transform(
        _pair_features(candidate_pairs, node_feats, model.combiner)
    )
    return (
        scored.select(
            "src",
            "dst",
            F.element_at(vector_to_array("probability"), 2).alias(
                "probability"
            ),
        )
        .orderBy(F.desc("probability"), "src", "dst")
        .limit(top_n)
    )


# ---------------------------------------------------------------------------
# node regression
# ---------------------------------------------------------------------------
MSE = "MEAN_SQUARED_ERROR"
RMSE = "ROOT_MEAN_SQUARED_ERROR"
MAE = "MEAN_ABSOLUTE_ERROR"
_NR_METRICS = (MSE, RMSE, MAE)


@dataclass
class NodeRegressionModel:
    model: object  # fitted LinearRegressionModel / RandomForestRegressionModel
    feature_cols: list[str]
    best_params: dict
    metrics: dict = field(default_factory=dict)

    @property
    def name(self) -> str:
        return "nodeRegression"


def _nr_estimator(params: dict):
    """LINEAR_REGRESSION (default) or RANDOM_FOREST — the two model
    families the reference's node-regression pipeline trains
    (pipeline/src/main/java/org/neo4j/gds/ml/pipeline/nodePipeline/
    regression/NodeRegressionTrain.java; candidates are
    LinearRegressionTrainConfig / RandomForestRegressorTrainerConfig).
    Both map to their MLlib counterparts: JVM-side, distributed fit."""
    kind = params.get("model", "LINEAR_REGRESSION")
    if kind == "RANDOM_FOREST":
        from pyspark.ml.regression import RandomForestRegressor

        return RandomForestRegressor(
            featuresCol="features",
            labelCol="label",
            predictionCol="prediction",
            numTrees=int(params.get("num_trees", 20)),
            maxDepth=int(params.get("max_depth", 5)),
            seed=int(params.get("seed", 42)),
        )
    from pyspark.ml.regression import LinearRegression

    return LinearRegression(
        featuresCol="features",
        labelCol="label",
        predictionCol="prediction",
        regParam=float(params.get("penalty", 0.0)),
        elasticNetParam=float(params.get("elastic_net", 0.0)),
        maxIter=int(params.get("max_iterations", 100)),
        tol=float(params.get("tolerance", 1e-6)),
        # penalty 0 + "normal" = exact OLS via the normal equations —
        # deterministic and replayable in closed form (the contract
        # oracle solves the same 3x3 system with Cramer's rule in SQL)
        solver=params.get("solver", "auto"),
        standardization=False,
    )


def _fit_nr(params: dict, df: DataFrame):
    """Fit + summary-strip via a save/load round-trip (same session-
    serializability hazard as ``_fit`` — see its docstring)."""
    import shutil
    import tempfile

    m = _nr_estimator(params).fit(df)
    path = tempfile.mkdtemp(prefix="gds_nr_")
    try:
        m.write().overwrite().save(path)
        return type(m).load(path)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def _nr_metric(pred: DataFrame, metric: str) -> float:
    """MSE / RMSE / MAE as one DataFrame aggregation (lower is better)."""
    err = F.col("prediction") - F.col("label")
    agg = F.avg(F.abs(err)) if metric == MAE else F.avg(err * err)
    row = pred.agg(agg.alias("m")).collect()[0]
    v = float(row["m"] or 0.0)
    return v ** 0.5 if metric == RMSE else v


def node_regression_train(
    graph: Graph,
    *,
    feature_cols: list[str],
    target_col: str,
    params: list[dict] | None = None,
    metric: str = RMSE,
    holdout_fraction: float = 0.3,
    seed: int = 42,
) -> NodeRegressionModel:
    """Model-selecting node-regression training
    (gds.alpha.pipeline.nodeRegression.train — NodeRegressionTrain.java).

    Identical schedule to :func:`node_classification_train`: deterministic
    arithmetic hash split → per-candidate fit on train, score on
    validation (lower = better for all three regression metrics) → best
    candidate refit on train∪validation → held-out test metric. The split
    hash is partition-independent, so the fitted model is a pure function
    of (graph, params, seed) up to float summation order.
    """
    if metric not in _NR_METRICS:
        raise ValueError(f"metric must be one of {_NR_METRICS}")
    params = params or [{"penalty": 0.0}, {"penalty": 0.1}]
    labeled = _node_features(graph, feature_cols).join(
        graph.vertices.select(
            "internal_id", F.col(target_col).cast("double").alias("label")
        ),
        "internal_id",
    )
    h = F.pmod(
        F.col("internal_id") * F.lit(2654435761) + F.lit(seed * 97),
        F.lit(_SPLIT_MOD),
    )
    test_cut = int(holdout_fraction * _SPLIT_MOD)
    test = labeled.filter(h < test_cut)
    rest = labeled.filter(h >= test_cut)
    val_cut = test_cut + int(holdout_fraction * (_SPLIT_MOD - test_cut))
    val = rest.filter(h < val_cut)
    train = rest.filter(h >= val_cut)
    train = train.cache()
    val = val.cache()

    best, best_score, best_params = None, float("inf"), params[0]
    val_scores = []
    for p in params:
        m = _fit_nr(p, train)
        s = _nr_metric(m.transform(val), metric)
        val_scores.append({"params": p, metric: round(s, 6)})
        if s < best_score:
            best, best_score, best_params = m, s, p
    final = _fit_nr(best_params, rest)
    test_score = _nr_metric(final.transform(test), metric)
    train_score = _nr_metric(final.transform(rest), metric)
    return NodeRegressionModel(
        final,
        feature_cols,
        best_params,
        metrics={
            "validation": val_scores,
            "outer_train": {metric: round(train_score, 6)},
            "test": {metric: round(test_score, 6)},
        },
    )


def node_regression_predict(
    model: NodeRegressionModel, graph: Graph
) -> DataFrame:
    """(internal_id, predicted_value) for every node in the graph."""
    feats = _node_features(graph, model.feature_cols)
    return model.model.transform(feats).select(
        "internal_id", F.col("prediction").alias("predicted_value")
    )
