"""All-pairs shortest paths vs the reference's grid-fixture expectations
(MSBFSAllShortestPathsTest.java:98-99, WeightedAllShortestPathsTest.java:103-106):
2×5 grid → 35 unweighted rows (no self-pairs), 45 weighted rows
(incl. (s,s,0.0)), and dist(0, 9) = 5.0 in both."""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.graph import from_edge_list
from graph_data_science_spark.operators.allpaths import all_shortest_paths

# width=2, height=5 grid, creation-order ids (GridBuilder.java:55-67):
# horizontal (2i, 2i+1) per line, vertical (2(i-1)+j, 2i+j)
GRID_EDGES = [(0, 1), (2, 3), (4, 5), (6, 7), (8, 9)] + [
    (2 * (i - 1) + j, 2 * i + j) for i in range(1, 5) for j in (0, 1)
]


@pytest.fixture(scope="module")
def grid(spark):
    return from_edge_list(
        spark, [(str(a), str(b)) for a, b in GRID_EDGES]
    )


def _orig_ids(g):
    # from_edge_list assigns internal ids; map back to the int names
    return {
        r["internal_id"]: int(r["original_id"])
        for r in g.vertices.collect()
    }


def test_unweighted_grid(grid):
    ids = _orig_ids(grid)
    rows = all_shortest_paths(grid).collect()
    got = {(ids[r["s"]], ids[r["target"]]): r["distance"] for r in rows}
    assert len(got) == 35
    assert all(s != t for (s, t) in got)
    assert got[(0, 9)] == 5.0
    assert got[(0, 1)] == 1.0
    assert got[(1, 9)] == 4.0


def test_weighted_grid(grid):
    ids = _orig_ids(grid)
    rows = all_shortest_paths(grid, weighted=True).collect()
    got = {(ids[r["s"]], ids[r["target"]]): r["distance"] for r in rows}
    assert len(got) == 45
    assert got[(0, 0)] == 0.0
    assert got[(0, 9)] == 5.0
    assert sum(1 for (s, t) in got if s == t) == 10


def test_sources_subset(grid):
    ids = _orig_ids(grid)
    inv = {v: k for k, v in ids.items()}
    rows = all_shortest_paths(grid, sources=[inv[0]]).collect()
    got = {ids[r["target"]]: r["distance"] for r in rows}
    assert len(got) == 9
    assert got[9] == 5.0


def test_weighted_respects_weights(spark):
    g = from_edge_list(
        spark, [("a", "b", 10.0), ("a", "c", 1.0), ("c", "b", 2.0)]
    )
    ids = {
        r["internal_id"]: r["original_id"] for r in g.vertices.collect()
    }
    rows = all_shortest_paths(g, weighted=True).collect()
    got = {(ids[r["s"]], ids[r["target"]]): r["distance"] for r in rows}
    assert got[("a", "b")] == 3.0  # via c, not the direct 10.0 edge
