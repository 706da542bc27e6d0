"""Throughput evidence for the round-2 graph-operator additions.

Runs the new operators (SALSA, HashGNN, Leiden, SLLPA, k-core, RWR
sample, conductance, heavy hitters over hosts) on the synthesized
source-code dependency graph — the same corpus the north-rule bench
uses — and prints ONE JSON line with per-op wall seconds.

Usage: python tools/bench_graph_ops.py [n_repos]   (default 120_000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_repos = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    cpus = int(os.environ.get("BENCH_CPUS", os.cpu_count() or 8))

    from pyspark.sql import functions as F

    from graph_data_science_spark.graph import from_dense_edge_df
    from graph_data_science_spark.operators.conductance import conductance
    from graph_data_science_spark.operators.graphsample import (
        rwr_sample_nodes,
    )
    from graph_data_science_spark.operators.hashgnn import hashgnn
    from graph_data_science_spark.operators.kcore import k_core
    from graph_data_science_spark.operators.leiden import leiden
    from graph_data_science_spark.operators.salsa import salsa
    from graph_data_science_spark.operators.sllpa import sllpa
    from graph_data_science_spark.session import get_spark
    from graph_data_science_spark.sources.corpus import (
        extract_import_edges,
        repo_id_expr,
        synthesize_corpus,
    )

    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    spark = get_spark("gds-bench-graph-ops", master=f"local[{cpus}]",
                      shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")

    corpus = synthesize_corpus(spark, n_repos)
    edges = extract_import_edges(corpus).localCheckpoint(eager=True)
    dense = edges.select(
        repo_id_expr("src").alias("src"), repo_id_expr("dst").alias("dst"),
        "weight",
    )
    g = from_dense_edge_df(dense, n_vertices=n_repos, weight="weight")
    g.edges = g.edges.localCheckpoint(eager=True)
    n_edges = g.relationship_count()

    timings: dict[str, float] = {}
    extras: dict[str, int] = {}

    def timed(name, fn):
        print(f"[bench] start {name}", flush=True)
        t0 = time.monotonic()
        out = fn()
        timings[name] = round(time.monotonic() - t0, 3)
        extras[name] = out
        print(f"[bench] done {name} {timings[name]}s", flush=True)

    timed("salsa_10it", lambda: salsa(g, max_iterations=10).scores.count())
    timed(
        "hashgnn_d64_2it",
        lambda: hashgnn(g, dimension=64, iterations=2, density=4).count(),
    )
    timed("kcore", lambda: k_core(g).count())
    # directed dependency graph: spread the start set (single-start
    # forward reach is far below 10% of nodes — the stall guard would
    # stop, but spreading is the honest way to sample a directed graph)
    starts = [int(7919 * i) % n_repos for i in range(256)]
    m: dict = {}
    timed(
        "rwr_sample_10pct",
        lambda: rwr_sample_nodes(
            g, sampling_ratio=0.1, start_nodes=starts,
            walks_per_batch=64, walk_length=12, max_batches=8,
            metrics_out=m,
        ).count(),
    )
    extras["rwr_batches"] = m.get("batches", 0)
    extras["rwr_stalled"] = bool(m.get("stalled", False))
    timed(
        "sllpa_5it",
        lambda: sllpa(g, max_iterations=5, threshold=0.3).count(),
    )

    def leiden_run():
        res = leiden(g, max_levels=3, max_iterations=4)
        n = res.assignment.select("community").distinct().count()
        extras["leiden_q"] = round(res.modularity, 4)
        return n

    timed("leiden_3lvl", leiden_run)
    comm = None

    def conductance_run():
        from graph_data_science_spark.operators.wcc import wcc

        c = wcc(g).select(
            "internal_id", F.col("component").alias("community")
        )
        return conductance(g, c).count()

    timed("conductance_over_wcc", conductance_run)

    print(json.dumps({
        "metric": "graph_ops_sec",
        "n_repos": n_repos,
        "n_edges": n_edges,
        "cpus": cpus,
        "ops_sec": timings,
        "outputs": extras,
        "total_sec": round(sum(timings.values()), 3),
    }))


if __name__ == "__main__":
    main()
