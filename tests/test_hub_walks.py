"""Hub-safety guard for random walks (round-3 verdict What's-wrong #4).

The old formulation materialized each source's FULL adjacency as one
collect_list cell — a 10M-out-degree hub became a single ~80 MB row in
one task, an OOM scale-killer on power-law web graphs. The rewrite
rank-indexes edges and picks the hash-th neighbor by equi-join, so no
row ever holds a hub's adjacency. Two guards:

1. plan shape: no ObjectHashAggregate/collect_list in the walks plan;
2. a 2M-out-degree hub walks fine in a FRESH 2g-heap JVM (subprocess —
   the session fixture's driver is too big to prove anything).
"""

import subprocess
import sys

HUB_SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.driver.memory", "2g")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from graph_data_science_spark.graph import from_dense_edge_df
from graph_data_science_spark.operators.mlops import random_walks

N = 2_000_000
# vertex 0 -> 1..N (one hub), plus a back edge so walks keep moving
hub = spark.range(1, N + 1).select(
    F.lit(0).cast("long").alias("src"), F.col("id").alias("dst")
)
back = spark.range(1, N + 1).select(
    F.col("id").alias("src"), F.lit(0).cast("long").alias("dst")
)
g = from_dense_edge_df(hub.unionByName(back), n_vertices=N + 1)
starts = spark.createDataFrame([(0,)], "internal_id long")
walks = random_walks(
    g, walks_per_node=4, walk_length=5, start_nodes=starts
)
rows = walks.collect()
assert len(rows) == 4, rows
for r in rows:
    assert len(r.path) == 5, r
    assert r.path[0] == 0 and r.path[2] == 0 and r.path[4] == 0, r
    assert 1 <= r.path[1] <= N and 1 <= r.path[3] <= N, r
print("HUB_WALKS_OK")
spark.stop()
"""


def test_walk_plan_has_no_adjacency_aggregation(spark):
    from pyspark.sql import functions as F

    from graph_data_science_spark.graph import from_edge_df
    from graph_data_science_spark.operators.mlops import (
        node2vec_walks,
        random_walks,
    )

    edges = [(i, (i * 3 + 1) % 20) for i in range(60)]
    g = from_edge_df(spark.createDataFrame(edges, "src long, dst long"))
    for walks in (
        random_walks(g, walks_per_node=1, walk_length=3),
        node2vec_walks(
            g, walks_per_node=1, walk_length=3,
            return_factor=2.0, in_out_factor=0.5,
        ),
    ):
        plan = walks._sc._jvm.PythonSQLUtils.explainString(
            walks._jdf.queryExecution(), "formatted"
        )
        assert "collect_list" not in plan and "collect_set" not in plan, (
            "walks plan aggregates adjacency into per-row arrays"
        )


def test_hub_walks_survive_2g_heap():
    out = subprocess.run(
        [sys.executable, "-c", HUB_SCRIPT],
        capture_output=True, text=True, timeout=420,
    )
    assert "HUB_WALKS_OK" in out.stdout, (
        f"stdout: {out.stdout[-2000:]}\nstderr: {out.stderr[-2000:]}"
    )
