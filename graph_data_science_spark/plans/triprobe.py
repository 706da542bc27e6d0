"""Block-probe triangle kernel.

The DataFrame wedge-join plan (operators/triangle.py) shuffles one row
per wedge — O(sum_u C(outdeg_o(u), 2)) rows through Tungsten. On graphs
with dense regions (the contract's co-supplier graph is near-complete)
that is ~1e8 shuffled rows at sf0.1 for 1000 vertices. This kernel keeps
the same degree-ordered orientation but generates wedges and probes edge
existence in numpy against per-bucket sorted key blocks that workers
memory-map through the shared block cache (one page-cache copy per
host) — the same per-host-graph-replica model as the fused Pregel CSR.

Plan (two applyInPandas passes over the oriented edge set, no wedge
shuffle at all):

1. group oriented edges by first-endpoint bucket; each bucket's sorted
   packed keys ``u * n + v`` land as an uncompressed parquet blob via
   the DataFrame writer (committer-backed — retry/speculation-safe, and
   on a cluster the blocks land on the required shared block root);
2. group the same frame again; each task builds its bucket's oriented
   adjacency, generates the i<j wedge pairs vectorized (closed-form
   index arithmetic, no per-pair python), orients each pair by the
   (deg, id) total order, and binary-searches the target bucket's key
   blob; corner hits are pre-aggregated with ``np.unique`` before
   leaving the task, so the only shuffle is (vertex, count) rows
   bounded by 3 × |V|.

Applicability gate (checked by the caller): packed keys are 8 B/edge and
the degree array 8 B/vertex, resident once per host via mmap — use this
kernel while that fits the per-executor block budget
(``GDS_TRI_PROBE_MAX_BYTES``, default 8 GiB ≈ 1e9 edges) and
``n_vertices`` < 3e9 (key packing in int64); beyond either bound the
caller falls back to the shuffle-join plan, which has no per-host
residency requirement.

Reference semantics preserved: each triangle counted once at each
corner, degree-ordered orientation with id tie-break
(ref: algo/.../triangle/IntersectingTriangleCount.java:129-178).
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .fused import _cache_get, _cache_put, write_static_payloads

# wedge-buffer cap per task before probing: 5 buffered arrays + ~10
# flush temporaries at 8 B each ≈ 120 B/wedge peak — 4M keeps a task
# under ~500 MB, sized for a real executor's memory, not this sandbox
WEDGE_FLUSH = int(os.environ.get("GDS_TRI_WEDGE_FLUSH", 4_000_000))


def _load_keys(block_dir: str, bucket: int) -> np.ndarray:
    key = ("tri_keys", block_dir, bucket)
    hit = _cache_get(key)
    if hit is not None:
        return hit
    import pyarrow.parquet as pq

    paths = sorted(
        glob.glob(
            os.path.join(
                block_dir, "static_keys", f"bucket={bucket}", "*.parquet"
            )
        )
    )
    if not paths:
        arr = np.empty(0, np.int64)
    else:
        t = pq.read_table(paths[0], columns=["payload"], memory_map=True)
        arr = np.frombuffer(t.column("payload")[0].as_buffer(), np.int64)
    _cache_put(key, arr)
    return arr


def _pair_indices(m: int) -> tuple[np.ndarray, np.ndarray]:
    """All (i, j) with i < j < m, closed-form (no per-pair python)."""
    tails = np.arange(m - 1, 0, -1)
    cum = np.cumsum(tails)
    p = np.arange(cum[-1])
    i = np.searchsorted(cum, p, side="right")
    prev = np.where(i > 0, cum[i - 1], 0)
    j = p - prev + i + 1
    return i, j


def triangle_probe_counts(
    oriented: DataFrame,
    n_vertices: int,
    spark,
) -> DataFrame:
    """Per-corner triangle counts (vertex long, triangles long) over the
    degree-ordered edge set ``oriented`` (u, v, dv) — ``dv`` = degree of
    ``v``, carried on the row so wedge pairs orient locally with zero
    degree lookups."""
    import uuid

    from .csr import register_owned_block_dir

    # kernel + key blocks are HASH-bucketed by u: the wedge work of a
    # one-shot kernel is Sum C(outdeg_o(u), 2), heavily skewed toward the
    # orientation-early vertices, so contiguous id ranges would leave one
    # task with nearly all wedges on dense graphs. Hash spreads the heavy
    # sources; per-u work is bounded by C(outdeg_o, 2) with outdeg_o ~
    # O(sqrt(E)) under degree ordering. Per-bucket fixed cost is paid
    # once (no superstep loop), so no vertices-per-bucket floor applies.
    from .csr import resolve_block_root

    nbk = max(4 * spark.sparkContext.defaultParallelism, 8)
    block_dir = register_owned_block_dir(
        os.path.join(
            resolve_block_root(spark), f"gds_tri_{uuid.uuid4().hex[:12]}"
        )
    )

    n = int(n_vertices)
    keyed = (
        oriented.select(
            F.pmod(F.col("u"), F.lit(nbk)).cast("int").alias("pid"),
            "u",
            "v",
            F.col("dv").cast("double").alias("dv"),
        )
        .localCheckpoint(eager=True)  # reused by both passes below
    )

    def pack_keys(key_, pdf):
        b = int(key_[0])
        k = np.sort(
            pdf["u"].to_numpy(np.int64) * n + pdf["v"].to_numpy(np.int64)
        )
        return pd.DataFrame({"bucket": [b], "payload": [k.tobytes()]})

    def kernel(key_, pdf):
        u = pdf["u"].to_numpy(np.int64)
        v = pdf["v"].to_numpy(np.int64)
        dv = pdf["dv"].to_numpy(np.float64)
        order = np.lexsort((v, u))
        u, v, dv = u[order], v[order], dv[order]
        uniq, idx0, cnts = np.unique(u, return_index=True, return_counts=True)

        acc_ids: list[np.ndarray] = []
        acc_cnt: list[np.ndarray] = []
        buf_x: list[np.ndarray] = []
        buf_y: list[np.ndarray] = []
        buf_dx: list[np.ndarray] = []
        buf_dy: list[np.ndarray] = []
        buf_u: list[np.ndarray] = []
        pending = 0

        def flush() -> None:
            nonlocal pending
            if not pending:
                return
            X = np.concatenate(buf_x)
            Y = np.concatenate(buf_y)
            dX = np.concatenate(buf_dx)
            dY = np.concatenate(buf_dy)
            U = np.concatenate(buf_u)
            for b in (buf_x, buf_y, buf_dx, buf_dy, buf_u):
                b.clear()
            pending = 0
            x_first = (dX < dY) | ((dX == dY) & (X < Y))
            A = np.where(x_first, X, Y)
            B = np.where(x_first, Y, X)
            keys = A * n + B
            tb = A % nbk  # key blocks are hash-bucketed
            hit = np.zeros(len(keys), dtype=bool)
            o2 = np.argsort(tb, kind="stable")
            ko, tbo = keys[o2], tb[o2]
            blocks, starts = np.unique(tbo, return_index=True)
            ends = np.r_[starts[1:], len(ko)]
            for bi, s, e in zip(blocks, starts, ends):
                ks = _load_keys(block_dir, int(bi))
                seg = ko[s:e]
                pos = np.searchsorted(ks, seg)
                ok = pos < len(ks)
                ok[ok] = ks[pos[ok]] == seg[ok]
                hit[o2[s:e]] = ok
            ids = np.concatenate([U[hit], X[hit], Y[hit]])
            if len(ids):
                uq, c = np.unique(ids, return_counts=True)
                acc_ids.append(uq)
                acc_cnt.append(c)

        for ui in range(len(uniq)):
            m = int(cnts[ui])
            if m < 2:
                continue
            lo = idx0[ui]
            d = v[lo : lo + m]  # sorted ascending ids
            dd = dv[lo : lo + m]
            i, j = _pair_indices(m)
            buf_x.append(d[i])
            buf_y.append(d[j])
            buf_dx.append(dd[i])
            buf_dy.append(dd[j])
            buf_u.append(np.full(len(i), uniq[ui], dtype=np.int64))
            pending += len(i)
            if pending >= WEDGE_FLUSH:
                flush()
        flush()
        if not acc_ids:
            return pd.DataFrame({"vertex": [], "cnt": []}).astype(
                {"vertex": np.int64, "cnt": np.int64}
            )
        ids = np.concatenate(acc_ids)
        cnt = np.concatenate(acc_cnt)
        uq, inv = np.unique(ids, return_inverse=True)
        tot = np.bincount(inv, weights=cnt).astype(np.int64)
        return pd.DataFrame({"vertex": uq, "cnt": tot})

    # the kernel is compute-heavy per shuffled byte (1e8 wedges from 10 MB
    # of edge rows at sf0.1): AQE's byte-based coalescing would fuse the
    # whole stage into one task — pin the exchange to nbk partitions with
    # AQE off, same pattern as run_fused's superstep loop
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    parts_before = spark.conf.get("spark.sql.shuffle.partitions", "200")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", str(nbk))
    try:
        # committer-backed write (no worker-direct file I/O): safe under
        # task retries/speculation, lands on shared storage on a cluster
        write_static_payloads(
            block_dir,
            "keys",
            keyed.groupBy("pid").applyInPandas(
                pack_keys, "bucket int, payload binary"
            ),
        )
        out = keyed.groupBy("pid").applyInPandas(
            kernel, "vertex long, cnt long"
        )
        result = (
            out.groupBy("vertex")
            .agg(F.sum("cnt").cast("long").alias("triangles"))
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
        spark.conf.set("spark.sql.shuffle.partitions", parts_before)
    return result


def probe_applicable(n_vertices: int, n_oriented_edges: int) -> bool:
    """Gate: per-host mmap residency (keys 8 B/edge + degrees 8 B/vertex)
    within budget, and int64 key packing valid."""
    budget = int(os.environ.get("GDS_TRI_PROBE_MAX_BYTES", 8 << 30))
    if n_vertices >= 3_000_000_000:
        return False
    return 8 * (n_oriented_edges + n_vertices) <= budget
