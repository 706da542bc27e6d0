"""Per-algorithm memory estimation trees (no Spark needed)."""

import pytest

from graph_data_science_spark.estimation import (
    _ESTIMATORS,
    estimate_algorithm,
)

N, M = 1_000_000, 20_000_000


@pytest.mark.parametrize("algo", sorted(_ESTIMATORS))
def test_every_estimator_produces_sane_range(algo):
    r = estimate_algorithm(algo, N, M)
    assert r["nodeCount"] == N and r["relationshipCount"] == M
    assert 0 < r["bytesMin"] <= r["bytesMax"]
    assert r["requiredMemory"].startswith("[")
    assert algo in r["treeView"].splitlines()[0]
    assert r["mapView"]["components"], "tree should have components"


def test_estimates_scale_with_graph_size():
    small = estimate_algorithm("pagerank", N, M)
    big = estimate_algorithm("pagerank", 10 * N, 10 * M)
    assert big["bytesMin"] > 5 * small["bytesMin"]


def test_config_drives_the_tree():
    lo = estimate_algorithm("fastrp", N, M, embedding_dim=16)
    hi = estimate_algorithm("fastrp", N, M, embedding_dim=256)
    assert hi["bytesMin"] > 10 * lo["bytesMin"]
    sampled = estimate_algorithm("betweenness", N, M, sampling_size=64)
    exact = estimate_algorithm("betweenness", N, M)
    assert sampled["bytesMax"] < exact["bytesMax"]


def test_unknown_algorithm_raises():
    with pytest.raises(KeyError):
        estimate_algorithm("nope", N, M)
