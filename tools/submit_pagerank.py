"""spark-submit entry point: north-star algorithms over an edge table.

North-rule launch path — package the library and submit the same code that
runs in tests/bench to a multi-executor cluster:

    cd /root/repo && zip -qr /tmp/gds_spark.zip graph_data_science_spark
    spark-submit \
        --py-files /tmp/gds_spark.zip \
        --num-executors 64 --executor-cores 4 --executor-memory 16g \
        --conf spark.sql.shuffle.partitions=512 \
        tools/submit_pagerank.py \
        --algo pagerank \
        --edges s3://bucket/edges.parquet \
        --output s3://bucket/pagerank_scores \
        --checkpoint s3://bucket/ck/run1 \
        --max-iterations 20 --tolerance 1e-7 --n-buckets 512

``--algo`` selects the job: ``pagerank`` (default), ``wcc`` (min-label
over the symmetrized CSR), or ``labelprop`` (labelvote over the
reversed-edge CSR). All three run the fused blob-state kernel
(plans/fused.py) and share the checkpoint/lineage/resume machinery.

Notes for cluster runs (vs the local[*] defaults):
- ``--n-buckets`` should be ≥ 4× total executor cores; buckets are the
  unit of both CSR block placement and blob-state parallelism.
- ``--block-dir`` (or ``SPARK_GRAFT_BLOCK_DIR``) must point at storage
  every executor can READ — NFS / fuse-DFS / shared scratch — for the
  CSR block side files; blocks are written once through the DataFrame
  writer and memory-mapped by executors. With a non-local master and no
  shared dir configured the job fails fast with a clear error instead
  of silently producing a single-host block store (verified end-to-end
  by tools/cluster_verify.py on a 2-worker standalone cluster with
  disjoint worker local dirs).
- ``--checkpoint`` enables the per-superstep parquet state + lineage
  table; the directory must likewise be shared (and driver-visible —
  resume scans it driver-side). Re-submitting the identical command
  resumes mid-convergence.
  (File name kept as submit_pagerank.py for compatibility with existing
  launch configs.)
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--algo", default="pagerank",
                    choices=["pagerank", "wcc", "labelprop"])
    ap.add_argument("--edges", required=True,
                    help="parquet path with (src, dst[, weight]) columns")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--max-iterations", type=int, default=None,
                    help="default: 20 for pagerank/labelprop, 100 for wcc")
    ap.add_argument("--tolerance", type=float, default=1e-7,
                    help="pagerank only: L1 convergence tolerance")
    ap.add_argument("--damping", type=float, default=0.85)
    ap.add_argument("--weighted", action="store_true")
    ap.add_argument("--n-buckets", type=int, default=None)
    ap.add_argument("--chunk-size", type=int, default=5)
    ap.add_argument("--block-dir", default=None,
                    help="shared dir for CSR block side files (sets "
                         "SPARK_GRAFT_BLOCK_DIR); required on a "
                         "multi-executor master")
    args = ap.parse_args()
    if args.block_dir:
        import os

        os.environ["SPARK_GRAFT_BLOCK_DIR"] = args.block_dir
    max_iters = args.max_iterations or (100 if args.algo == "wcc" else 20)

    from pyspark.sql import SparkSession, functions as F

    spark = SparkSession.builder.appName(f"gds-{args.algo}").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from graph_data_science_spark.graph import from_edge_df
    from graph_data_science_spark.plans.checkpoint import CheckpointStore

    edges = spark.read.parquet(args.edges)
    weight = "weight" if "weight" in edges.columns else None
    g = from_edge_df(edges, weight=weight)
    n, m = g.node_count(), g.relationship_count()

    store = (
        CheckpointStore(spark, args.checkpoint) if args.checkpoint else None
    )
    orig = g.vertices.select("internal_id", "original_id")
    metrics: dict = {}
    t0 = time.monotonic()
    if args.algo == "pagerank":
        from graph_data_science_spark.operators.pagerank import pagerank
        from graph_data_science_spark.plans.fused import build_bucketed_csr

        csr = build_bucketed_csr(g.edges, n, n_buckets=args.n_buckets)
        out = pagerank(
            g,
            damping=args.damping,
            tolerance=args.tolerance,
            max_iterations=max_iters,
            weighted=args.weighted,
            checkpoint=store,
            csr=csr,
            chunk_size=args.chunk_size,
        )
        metrics["iterations"] = out.ran_iterations
        metrics["converged"] = out.converged
        result = out.scores.join(orig, "internal_id").select(
            F.col("original_id").alias("id"), "score"
        )
    elif args.algo == "wcc":
        from graph_data_science_spark.operators.wcc import build_wcc_csr, wcc

        csr = build_wcc_csr(g, n_buckets=args.n_buckets)
        comp = wcc(
            g,
            csr=csr,
            max_iterations=max_iters,
            chunk_size=args.chunk_size,
            checkpoint=store,
            metrics_out=metrics,
        )
        result = comp.join(orig, "internal_id").select(
            F.col("original_id").alias("id"), "component"
        )
    else:  # labelprop
        from graph_data_science_spark.operators.labelprop import (
            build_lp_csr,
            label_propagation,
        )

        csr = build_lp_csr(g, n_buckets=args.n_buckets)
        labels = label_propagation(
            g,
            csr=csr,
            max_iterations=max_iters,
            weighted=args.weighted,
            chunk_size=args.chunk_size,
            checkpoint=store,
            metrics_out=metrics,
        )
        result = labels.join(orig, "internal_id").select(
            F.col("original_id").alias("id"), "label"
        )
    result.write.mode("overwrite").parquet(args.output)
    elapsed = time.monotonic() - t0
    iters = metrics.get("iterations", metrics.get("ran_iterations", 0))
    print(json.dumps({
        "algo": args.algo, "nodes": n, "edges": m,
        "iterations": iters,
        "converged": metrics.get("converged"),
        "sec": round(elapsed, 2),
        "edges_per_sec": round(m * max(iters, 1) / elapsed),
        "output": args.output,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
