"""Hub-skew benchmark: fused kernel with shard-scatter vs without, vs
the classic salted kernel, on a power-law graph with one mega-hub
(max out-degree ≈ |E|/10 — the adversarial case for range bucketing,
where one bucket holds ~7× the average edge mass).

Prints one JSON line with edges/s for each engine and the per-superstep
wall times (the sharded kernel's critical path is the largest SHARD, not
the whole hub bucket).

Usage: python tools/bench_skew.py [--vertices 1000000] [--edges 20000000]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vertices", type=int, default=1_000_000)
    ap.add_argument("--edges", type=int, default=20_000_000)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from graph_data_science_spark.graph import from_dense_edge_df
    from graph_data_science_spark.operators.pagerank import pagerank
    from graph_data_science_spark.plans.fused import build_bucketed_csr
    from graph_data_science_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    spark = get_spark("gds-skew-bench", master=f"local[{args.cpus}]",
                      shuffle_partitions=2 * args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    n, m = args.vertices, args.edges
    hub_m = m // 10
    # hub: vertex 0 → pseudo-random targets; background: hash-spread
    hub = spark.range(hub_m).select(
        F.lit(0).cast("long").alias("src"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n - 1)) + 1).alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    bg = spark.range(m - hub_m).select(
        (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(n - 1)) + 1).alias("src"),
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(n))).alias("dst"),
        F.lit(1.0).alias("weight"),
    ).filter(F.col("src") != F.col("dst"))
    edges = hub.unionAll(bg).localCheckpoint(eager=True)
    g = from_dense_edge_df(edges, n_vertices=n, weight="weight")
    g.edges = g.edges.localCheckpoint(eager=True)
    m_real = g.relationship_count()

    results: dict = {"vertices": n, "edges": m_real, "iters": args.iters,
                     "max_degree": hub_m, "cpus": args.cpus}

    def run_fused_engine(tag: str, csr) -> None:
        # warmup (block-cache fault-in) then measured pass
        pagerank(g, tolerance=0.0, max_iterations=3, csr=csr, chunk_size=3)
        t0 = time.monotonic()
        out = pagerank(
            g, tolerance=0.0, max_iterations=args.iters, csr=csr,
            chunk_size=5,
        )
        out.scores.count()
        sec = time.monotonic() - t0
        results[f"{tag}_sec"] = round(sec, 2)
        results[f"{tag}_edges_per_sec"] = round(m_real * args.iters / sec)
        results[f"{tag}_superstep_sec"] = [
            round(mm["wall_time"], 3) for mm in out.metrics
        ]

    # fused WITHOUT hub sharding (threshold far above any bucket)
    csr_plain = build_bucketed_csr(
        g.edges, n, n_buckets=2 * args.cpus,
        hub_shard_edges=1 << 40,
    )
    results["plain_shard_map"] = {}
    run_fused_engine("fused_unsharded", csr_plain)
    csr_plain.cleanup()

    # fused WITH hub sharding (defaults)
    csr_shard = build_bucketed_csr(g.edges, n, n_buckets=2 * args.cpus)
    results["shard_map"] = {
        str(k): v for k, v in (csr_shard.shard_map or {}).items()
    }
    run_fused_engine("fused_sharded", csr_shard)
    csr_shard.cleanup()

    # classic row kernel (salted hub splitting)
    t0 = time.monotonic()
    out = pagerank(g, tolerance=0.0, max_iterations=args.iters)
    out.scores.count()
    sec = time.monotonic() - t0
    results["classic_sec"] = round(sec, 2)
    results["classic_edges_per_sec"] = round(m_real * args.iters / sec)

    results["sharded_vs_unsharded"] = round(
        results["fused_unsharded_sec"] / results["fused_sharded_sec"], 3
    )
    results["sharded_vs_classic"] = round(
        results["classic_sec"] / results["fused_sharded_sec"], 3
    )
    results["median_superstep_sharded"] = round(
        statistics.median(results["fused_sharded_superstep_sec"]), 3
    )
    results["median_superstep_unsharded"] = round(
        statistics.median(results["fused_unsharded_superstep_sec"]), 3
    )
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
