"""spark-submit entry point: PageRank over an edge table, cluster-ready.

North-rule launch path — package the library and submit the same code that
runs in tests/bench to a multi-executor cluster:

    cd /root/repo && zip -qr /tmp/gds_spark.zip graph_data_science_spark
    spark-submit \
        --py-files /tmp/gds_spark.zip \
        --num-executors 64 --executor-cores 4 --executor-memory 16g \
        --conf spark.sql.shuffle.partitions=512 \
        tools/submit_pagerank.py \
        --edges s3://bucket/edges.parquet \
        --output s3://bucket/pagerank_scores \
        --checkpoint s3://bucket/ck/run1 \
        --max-iterations 20 --tolerance 1e-7 --n-buckets 512

Notes for cluster runs (vs the local[*] defaults):
- ``--n-buckets`` should be ≥ 4× total executor cores; buckets are the
  unit of both CSR block placement and blob-state parallelism.
- ``SPARK_GRAFT_LOCAL_DIR`` must point at storage every executor can
  reach for the CSR block side files (HDFS/NFS/executor-local NVMe with
  external shuffle off); blocks are written once and memory-mapped.
- ``--checkpoint`` enables the per-superstep parquet state + lineage
  table; re-submitting the identical command resumes mid-convergence.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", required=True,
                    help="parquet path with (src, dst[, weight]) columns")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--max-iterations", type=int, default=20)
    ap.add_argument("--tolerance", type=float, default=1e-7)
    ap.add_argument("--damping", type=float, default=0.85)
    ap.add_argument("--weighted", action="store_true")
    ap.add_argument("--n-buckets", type=int, default=None)
    ap.add_argument("--chunk-size", type=int, default=5)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("gds-pagerank").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from graph_data_science_spark.graph import from_edge_df
    from graph_data_science_spark.operators.pagerank import pagerank
    from graph_data_science_spark.plans.checkpoint import CheckpointStore
    from graph_data_science_spark.plans.fused import build_bucketed_csr

    edges = spark.read.parquet(args.edges)
    weight = "weight" if "weight" in edges.columns else None
    g = from_edge_df(edges, weight=weight)
    n, m = g.node_count(), g.relationship_count()

    t0 = time.monotonic()
    csr = build_bucketed_csr(g.edges, n, n_buckets=args.n_buckets)
    store = (
        CheckpointStore(spark, args.checkpoint) if args.checkpoint else None
    )
    out = pagerank(
        g,
        damping=args.damping,
        tolerance=args.tolerance,
        max_iterations=args.max_iterations,
        weighted=args.weighted,
        checkpoint=store,
        csr=csr,
        chunk_size=args.chunk_size,
    )
    scores = out.scores.join(
        g.vertices.select("internal_id", "original_id"), "internal_id"
    ).select(
        g.vertices.original_id.alias("id"), "score"
    )
    scores.write.mode("overwrite").parquet(args.output)
    elapsed = time.monotonic() - t0
    print(json.dumps({
        "nodes": n, "edges": m,
        "iterations": out.ran_iterations, "converged": out.converged,
        "sec": round(elapsed, 2),
        "edges_per_sec": round(m * out.ran_iterations / elapsed),
        "output": args.output,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
