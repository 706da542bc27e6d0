"""Dense block-matmul triangle kernel for small, dense graphs.

Both the wedge-join plan and the block-probe kernel do work proportional
to the WEDGE count — Sum_u C(outdeg_o(u), 2) — which on a near-complete
graph is Theta(V^3) explicit pair probes (the contract's co-supplier
graph at sf0.1 is the complete graph K_1000: ~1.7e8 wedges). But per-node
triangle counts never need wedge enumeration: with the symmetric 0/1
adjacency A (no self-loops),

    triangles(i) = 1/2 * sum_j (A @ A)[i, j] * A[i, j]

so a blocked GEMM computes every per-node count in V^3 fused
multiply-adds through BLAS — two orders of magnitude faster per wedge
than index arithmetic + binary search, with zero shuffled wedge rows.

Plan (two applyInPandas passes, same per-host block-file model as the
probe kernel / fused CSR):

1. symmetrize the canonical a<b edge set, group by row-range bucket, and
   write each bucket's dense float32 row block A_b (width x V) as an
   uncompressed parquet blob via the DataFrame writer (committer-backed,
   worker-mmap'd once per host);
2. group the same frame again; bucket b's task accumulates
   S = sum_c A_b[:, rows_c] @ A_c (BLAS sgemm per block pair), then emits
   (vertex, 1/2 * rowsum(S * A_b)) — V rows total leave python.

Exactness: entries of S are integer counts <= V-1 < 2^24, exact in
float32; the final rowsum reduces in float64.

Applicability gate (`dense_applicable`): V <= GDS_TRI_DENSE_MAX_V
(default 16384, i.e. <= 1 GiB of A per host at 4 B/entry) and edge
density >= GDS_TRI_DENSE_MIN_DENSITY (default 5% — below that the
probe kernel's O(wedges) beats the dense V^3). The caller falls back to
probe/join beyond the gate, so 100 TB graphs never take this path; it
exists because real link graphs contain small dense cores (and the
degree-capped contract graphs ARE such cores).

Reference semantics preserved: each triangle counted once per corner,
parallel edges / self-loops already collapsed by the caller's
canonicalization (ref: algo/.../triangle/IntersectingTriangleCount.java:
129-178).
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .fused import _cache_get, _cache_put, write_static_payloads


def dense_applicable(n_vertices: int, n_canon_edges: int) -> bool:
    max_v = int(os.environ.get("GDS_TRI_DENSE_MAX_V", 16384))
    min_density = float(os.environ.get("GDS_TRI_DENSE_MIN_DENSITY", 0.05))
    if n_vertices < 3 or n_vertices > max_v:
        return False
    possible = n_vertices * (n_vertices - 1) / 2.0
    return n_canon_edges >= min_density * possible


def _load_block(
    block_dir: str, bucket: int, width: int, n: int
) -> np.ndarray:
    """Bucket's dense (width x n) float32 adjacency rows, worker-cached."""
    key = ("tri_dense", block_dir, bucket)
    hit = _cache_get(key)
    if hit is not None:
        return hit
    import pyarrow.parquet as pq

    paths = sorted(
        glob.glob(
            os.path.join(
                block_dir, "static_arows", f"bucket={bucket}", "*.parquet"
            )
        )
    )
    if not paths:
        arr = np.zeros((width, n), dtype=np.float32)
    else:
        t = pq.read_table(paths[0], columns=["payload"], memory_map=True)
        arr = np.frombuffer(
            t.column("payload")[0].as_buffer(), np.float32
        ).reshape(width, n)
    _cache_put(key, arr)
    return arr


def triangle_dense_counts(
    canon: DataFrame, n_vertices: int, spark
) -> DataFrame:
    """Per-corner triangle counts (vertex long, triangles long) from the
    canonical a<b edge set, via blocked symmetric-adjacency GEMM."""
    import uuid

    from .csr import register_owned_block_dir

    n = int(n_vertices)
    # >= 32 rows per block keeps each sgemm call BLAS-efficient; cap at
    # 4x parallelism so heavy blocks average out (row work is uniform
    # here — every block row costs the same V-length dot products)
    nbk = min(
        max(4 * spark.sparkContext.defaultParallelism, 8),
        max(1, -(-n // 32)),
    )
    bw = max(1, -(-n // nbk))
    nbk = -(-n // bw)
    from .csr import resolve_block_root

    block_dir = register_owned_block_dir(
        os.path.join(
            resolve_block_root(spark), f"gds_trid_{uuid.uuid4().hex[:12]}"
        )
    )

    sym = canon.select("a", "b").unionAll(
        canon.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    keyed = sym.select(
        (F.col("a") / bw).cast("int").alias("pid"), "a", "b"
    ).localCheckpoint(eager=True)  # reused by both passes

    def pack_rows(key_, pdf: pd.DataFrame) -> pd.DataFrame:
        b = int(key_[0])
        base = b * bw
        width = min(bw, n - base)
        block = np.zeros((width, n), dtype=np.float32)
        rows = pdf["a"].to_numpy(np.int64) - base
        cols = pdf["b"].to_numpy(np.int64)
        block[rows, cols] = 1.0
        return pd.DataFrame(
            {"bucket": [b], "payload": [block.ravel().tobytes()]}
        )

    def kernel(key_, pdf: pd.DataFrame) -> pd.DataFrame:
        b = int(key_[0])
        base = b * bw
        width = min(bw, n - base)
        ab = _load_block(block_dir, b, width, n)
        s = np.zeros((width, n), dtype=np.float32)
        for c in range(nbk):
            cbase = c * bw
            cw = min(bw, n - cbase)
            ac = _load_block(block_dir, c, cw, n)
            # S += A_b[:, rows_c] @ A_c  (sgemm; integer-exact in f32)
            np.add(
                s,
                np.ascontiguousarray(ab[:, cbase : cbase + cw]) @ ac,
                out=s,
            )
        tri = 0.5 * np.einsum(
            "ij,ij->i", s, ab, dtype=np.float64, casting="unsafe"
        )
        return pd.DataFrame(
            {
                "vertex": base + np.arange(width, dtype=np.int64),
                "cnt": np.rint(tri).astype(np.int64),
            }
        )

    # compute-heavy per shuffled byte: pin the exchange to nbk partitions
    # with AQE off (same pattern as the probe kernel / fused loop)
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    parts_before = spark.conf.get("spark.sql.shuffle.partitions", "200")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", str(nbk))
    try:
        # committer-backed write (no worker-direct file I/O): safe under
        # task retries/speculation, lands on shared storage on a cluster
        write_static_payloads(
            block_dir,
            "arows",
            keyed.groupBy("pid").applyInPandas(
                pack_rows, "bucket int, payload binary"
            ),
        )
        # buckets with no edges spawn no task — their vertices count 0
        # triangles and the caller's left join fills the zeros
        out = keyed.groupBy("pid").applyInPandas(kernel, "vertex long, cnt long")
        result = out.filter(F.col("cnt") > 0).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
        spark.conf.set("spark.sql.shuffle.partitions", parts_before)
    return result.select("vertex", F.col("cnt").alias("triangles"))
