"""HDBSCAN density clustering (operators/hdbscan.py)."""

from pyspark.sql import functions as F

from graph_data_science_spark.graph import from_edge_df
from graph_data_science_spark.operators.hdbscan import hdbscan


def _blob_graph(spark, n_parts=2):
    """Three tight, well-separated 2D blobs (8 points each) plus two far
    outliers; a chain edge set just to give the Graph a topology (HDBSCAN
    only reads the vector property)."""
    pts = []
    nid = 0
    for cx, cy in ((0.0, 0.0), (100.0, 0.0), (0.0, 100.0)):
        for i in range(8):
            # deterministic jitter in [-1, 1]
            dx = ((i * 37) % 20 - 10) / 10.0
            dy = ((i * 53) % 20 - 10) / 10.0
            pts.append((nid, [cx + dx, cy + dy]))
            nid += 1
    pts.append((nid, [500.0, 500.0]))      # outlier 1
    pts.append((nid + 1, [-500.0, 480.0])) # outlier 2
    n = len(pts)
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long"
    ).repartition(n_parts)
    g = from_edge_df(edges)
    vec = spark.createDataFrame(pts, "internal_id long, vec array<double>")
    g.vertices = g.vertices.join(vec, "internal_id")
    return g, n


def test_recovers_planted_blobs(spark):
    g, n = _blob_graph(spark)
    res = hdbscan(g, "vec", samples=3, min_cluster_size=4)
    rows = {r.internal_id: r.label for r in res.labels.collect()}
    assert len(rows) == n
    assert res.n_clusters == 3
    # each blob is one pure cluster
    for blob in range(3):
        labels = {rows[blob * 8 + i] for i in range(8)}
        assert len(labels) == 1 and -1 not in labels
    # blobs get distinct labels
    assert len({rows[0], rows[8], rows[16]}) == 3
    # far outliers are noise
    assert rows[n - 1] == -1 and rows[n - 2] == -1


def test_core_distances_positive_and_complete(spark):
    g, n = _blob_graph(spark)
    res = hdbscan(g, "vec", samples=3, min_cluster_size=4)
    core = res.core_distances.collect()
    assert len(core) == n
    assert all(r.core_distance > 0 for r in core)


def test_partition_invariance(spark):
    g1, _ = _blob_graph(spark, 1)
    g7, _ = _blob_graph(spark, 7)
    r1 = hdbscan(g1, "vec", samples=3, min_cluster_size=4)
    r7 = hdbscan(g7, "vec", samples=3, min_cluster_size=4)
    assert sorted(map(tuple, r1.labels.collect())) == \
        sorted(map(tuple, r7.labels.collect()))


def test_min_cluster_size_filters_small_groups(spark):
    g, n = _blob_graph(spark)
    # min_cluster_size bigger than any blob -> everything noise
    res = hdbscan(g, "vec", samples=3, min_cluster_size=10)
    labels = {r.label for r in res.labels.collect()}
    assert labels == {-1}
    assert res.n_clusters == 0


def test_precomputed_knn_edges_path(spark):
    g, n = _blob_graph(spark)
    from graph_data_science_spark.operators.hdbscan import _knn_euclidean
    emb = g.vertices.select("internal_id", F.col("vec").alias("vec"))
    pre = _knn_euclidean(emb, 3)
    res = hdbscan(g, "vec", samples=3, min_cluster_size=4, knn_edges=pre)
    assert res.n_clusters == 3
