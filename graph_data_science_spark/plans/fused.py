"""Fused blob-state Pregel kernel — one python round-trip per superstep.

Motivation (measured on local[8]→local[32], 22M edges, 1.5M vertices):
a row-wise exchange of the vertex-state DataFrame costs ~0.85 s and does
NOT scale with cores (UnsafeRow serialization + shuffle of millions of
tiny rows is the serial term), and the classic kernel does 2-3 of them
per superstep. This kernel removes row-wise state entirely:

- Vertices are range-partitioned into ``n_buckets`` contiguous id
  buckets; CSR (CSC-within-block) chunks are partitioned by the SOURCE's
  bucket, so bucket b's task holds exactly the out-edges of its own
  vertices (``build_bucketed_csr``).
- The vertex state of a bucket is ONE DataFrame row carrying dense numpy
  arrays as binary blobs (vertex ids are implicit: ``base + arange``).
- A superstep is ONE ``cogroup(msgs, state).applyInPandas``:
  combine incoming packed messages into a dense bucket array → apply →
  scatter from the bucket's own CSC chunks → emit the new state row plus
  per-destination-bucket packed message rows. Everything that crosses an
  exchange or the Arrow boundary is a handful of blob rows per bucket —
  both shuffles per superstep ship O(n_buckets²) blobs, never O(V) rows.
- Per-superstep metrics ride on the state row as plain numeric columns
  and are read through an Observation on the same action — one Spark job
  per superstep total.

Static per-vertex inputs (e.g. out-degree for PageRank's push) are
written once as dense per-bucket arrays next to the CSR blocks and read
through the same worker-resident cache (memory-mapped, uncompressed).

Cluster story: every block and static array is written through the
DataFrame writer (task-commit protocol handles retries/speculation) to
``resolve_block_root``-resolved storage — tmpfs on a local master, a
REQUIRED shared filesystem (``SPARK_GRAFT_BLOCK_DIR``) on a
multi-executor master, enforced with a loud error. Executors only ever
READ the block files (mmap + per-worker LRU), so any POSIX mount every
executor can see (NFS / fuse-DFS / cluster scratch) works; the OS page
cache gives one resident copy per host.

Skew note: range partitioning gives up the salted-hash hub splitting of
``build_csr_graph``; choose ``n_buckets`` ≥ 4× cores so heavy buckets
average out, and keep the classic kernel for graphs with single-vertex
degree ≫ |E|/n_buckets.

Reference semantics preserved: scatter/gather with an associative
reducer, vote-to-halt via the frontier mask, per-superstep metrics
(iteration, rows, delta-norm, wall-time) — ref core/.../beta/pregel/
(PregelComputation.java:38-117, Pregel.java:137-165).
"""

from __future__ import annotations

import glob
import os
import time
from collections import OrderedDict
from dataclasses import dataclass
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .checkpoint import CheckpointStore, Timer, loop_checkpoint
from .csr import _build_chunks

# kind 0 = state row (pay1..payK = algorithm state arrays, metrics cols;
#   task_sec = the bucket task's own wall time, read into lineage),
# kind 1 = packed messages (pay1 = int32 bucket-local dst ids, pay2 =
#   float64 values; the "labelvote" reducer additionally ships pay3 =
#   float64 vote weights so a message is a (dst, label, weight) triple),
# kind 2 = hub shard job (pay1 = dense send array; active = shard id),
# kind 3 = shard-lineage row (task_sec only — consumed by the checkpoint
#   lineage read, ignored by the gather)
FUSED_SCHEMA = (
    "kind int, bucket int, pay1 binary, pay2 binary, pay3 binary, "
    "l1 double, active long, nrows long, task_sec double"
)


@dataclass
class BucketedCsr:
    block_dir: str
    n_buckets: int
    bucket_width: int
    n_vertices: int
    # builds since the degree fold-in carry per-bucket out_degree /
    # out_wdegree statics written during the CSR pass itself
    has_degree_statics: bool = False
    # hub buckets (edge mass ≫ average): bucket -> n_shards; their
    # scatter runs as parallel shard tasks (chunk_no % n_shards == shard)
    shard_map: dict | None = None

    def cleanup(self) -> None:
        import shutil

        shutil.rmtree(self.block_dir, ignore_errors=True)


def build_bucketed_csr(
    edges: DataFrame,
    n_vertices: int,
    *,
    n_buckets: int | None = None,
    block_dir: str | None = None,
    max_chunk_edges: int = 4_000_000,
    hub_shard_edges: int | None = None,
) -> BucketedCsr:
    """One shuffle: bucket by src range, pack CSC chunks, persist
    uncompressed (workers memory-map them — one page-cache copy/host).

    Hub skew: a bucket whose edge mass exceeds both 2×``hub_shard_edges``
    (env ``GDS_HUB_SHARD_EDGES``, default 1M) and 2× the mean bucket
    mass packs ~``hub_shard_edges``-sized chunks and is recorded in
    ``shard_map`` (bucket → n_shards); the superstep loop then scatters
    it as parallel shard tasks instead of one serial task. Chunks hold
    disjoint dst runs, so shard-partial messages are exact under every
    (associative) reducer."""
    spark = edges.sparkSession
    if n_buckets is None:
        # 4× parallelism so heavy buckets average out (see module skew
        # note) — but never more buckets than the graph can fill: each
        # bucket is an applyInPandas group + O(n_buckets) message blobs
        # per superstep, pure fixed overhead once buckets are small.
        # Floor measured at 8192 vertices/bucket: on a 120k-vertex
        # corpus graph, 58 buckets ran 0.50 s/superstep vs 0.30 s at
        # 14-16 (task scheduling + Arrow round-trips dominate below the
        # floor); big graphs keep the parallelism-derived count.
        n_buckets = min(
            max(4 * spark.sparkContext.defaultParallelism, 8),
            max(1, n_vertices // 8192),
        )
    bucket_width = max(1, -(-n_vertices // n_buckets))
    n_buckets = -(-n_vertices // bucket_width)

    if block_dir is None:
        import uuid

        from .csr import register_owned_block_dir, resolve_block_root

        block_dir = register_owned_block_dir(os.path.join(
            resolve_block_root(spark), f"gds_fcsr_{uuid.uuid4().hex[:12]}"
        ))

    e = edges.select(
        (F.col("src") / bucket_width).cast("int").alias("pid"),
        "src",
        "dst",
        F.col("weight").cast("double").alias("weight"),
    )

    def build(key, pdf):
        # the group already holds every out-edge of this bucket's
        # vertices: fold the degree statics into the same pass instead of
        # paying a second full scan+shuffle of the edge table later. They
        # ride as a chunk == -1 row of the SAME output frame, so the one
        # committer-backed DataFrame write below covers blocks AND
        # statics — no worker-direct file I/O anywhere (cluster-safe with
        # task retries / speculative execution).
        b = int(key[0])
        base = b * bucket_width
        width = min(bucket_width, n_vertices - base)
        n_e = len(pdf)
        tgt = max_chunk_edges
        if n_e > 2 * shard_edges:
            # heavy bucket: equalized ~shard_edges chunks so the shard
            # stage gets balanced parallel scatter units
            parts = -(-n_e // shard_edges)
            tgt = min(max_chunk_edges, -(-n_e // parts))
        out = _build_chunks(key, pdf, tgt)
        if width > 0:
            src_local = pdf["src"].to_numpy(np.int64) - base
            w = pdf["weight"].to_numpy(np.float64)
            deg = np.bincount(src_local, minlength=width).astype(
                np.float64
            )[:width]
            # weighted degree sums positive weights only (matches
            # Graph.out_degrees / ref DegreeCentrality.java:117-126)
            wdeg = np.bincount(
                src_local, weights=np.maximum(w, 0.0), minlength=width
            )[:width]
            static_row = pd.DataFrame(
                [(b, -1, 0, 0, deg.tobytes(), wdeg.tobytes(), b"", b"", b"")],
                columns=out.columns,
            )
            out = pd.concat([out, static_row], ignore_index=True)
        return out

    if hub_shard_edges is None:
        hub_shard_edges = int(
            os.environ.get("GDS_HUB_SHARD_EDGES", 1_000_000)
        )
    shard_edges = max(1, hub_shard_edges)

    built = e.groupBy("pid").applyInPandas(
        build,
        "pid int, chunk int, n_src long, n_edges long, src_ids binary, "
        "dst_ids binary, dst_offsets binary, src_idx binary, weights binary",
    )
    (
        built.write.partitionBy("pid")
        .mode("overwrite")
        .option("compression", "none")
        .parquet(os.path.join(block_dir, "csr"))
    )
    # per-bucket edge mass from the just-written blocks (column-pruned
    # scan of the tiny per-chunk header rows — no second edge scan):
    # buckets ≫ average become shard-scattered hubs
    summary = (
        spark.read.parquet(os.path.join(block_dir, "csr"))
        .filter(F.col("chunk") >= 0)
        .groupBy("pid")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_edges").alias("m"),
        )
        .collect()
    )
    total_m = sum(int(r["m"]) for r in summary) or 1
    heavy = max(2 * shard_edges, -(-2 * total_m // max(n_buckets, 1)))
    shard_cap = max(2, 4 * spark.sparkContext.defaultParallelism)
    shard_map = {
        int(r["pid"]): min(int(r["n_chunks"]), shard_cap)
        for r in summary
        if int(r["m"]) > heavy and int(r["n_chunks"]) >= 2
    }
    return BucketedCsr(
        block_dir=block_dir,
        n_buckets=n_buckets,
        bucket_width=bucket_width,
        n_vertices=n_vertices,
        has_degree_statics=True,
        shard_map=shard_map or None,
    )


def write_static_payloads(
    block_dir: str, name: str, payloads: DataFrame
) -> None:
    """Persist per-bucket binary payload rows (``bucket int, payload
    binary``) as ``static_<name>/bucket=N/*.parquet`` through the
    DataFrame writer — the task-commit protocol makes retried /
    speculative tasks safe, and the files land wherever ``block_dir``
    points (shared storage on a cluster). Uncompressed so worker reads
    stay zero-copy mmap views."""
    (
        payloads.write.partitionBy("bucket")
        .mode("overwrite")
        .option("compression", "none")
        .parquet(os.path.join(block_dir, f"static_{name}"))
    )


def write_static_array(
    csr: BucketedCsr, df: DataFrame, name: str, default: float = 0.0
) -> None:
    """Persist a per-vertex double column as dense per-bucket arrays.
    ``df``: (vertex long, value double)."""
    bw = csr.bucket_width

    def pack(key, pdf: pd.DataFrame):
        b = int(key[0])
        arr = np.full(bw, default, dtype=np.float64)
        idx = pdf["vertex"].to_numpy(np.int64) - b * bw
        arr[idx] = pdf["value"].to_numpy(np.float64)
        return pd.DataFrame({"bucket": [b], "payload": [arr.tobytes()]})

    out = (
        df.select(
            (F.col("vertex") / bw).cast("int").alias("bucket"),
            "vertex",
            F.col("value").cast("double").alias("value"),
        )
        .groupBy("bucket")
        .applyInPandas(pack, "bucket int, payload binary")
    )
    (
        out.write.partitionBy("bucket")
        .mode("overwrite")
        .option("compression", "none")
        .parquet(os.path.join(csr.block_dir, f"static_{name}"))
    )


_FUSED_CACHE: OrderedDict = OrderedDict()
_FUSED_CACHE_MAX = int(os.environ.get("GDS_BLOCK_CACHE_BLOCKS", "256")) * 4

_CSR_COLS = ("src_ids", "dst_ids", "dst_offsets", "src_idx", "weights")
_CSR_DTYPES = (np.int64, np.int64, np.int64, np.int32, np.float64)


def _cache_get(key):
    hit = _FUSED_CACHE.get(key)
    if hit is not None:
        _FUSED_CACHE.move_to_end(key)
    return hit


def _cache_put(key, val):
    _FUSED_CACHE[key] = val
    while len(_FUSED_CACHE) > _FUSED_CACHE_MAX:
        _FUSED_CACHE.popitem(last=False)


def load_bucket_chunks(block_dir: str, bucket: int) -> list[tuple]:
    """Decoded CSR chunks for one bucket: list of (chunk_no, arrays)
    where arrays = (src_ids, dst_ids, dst_offsets, src_idx, weights).
    The chunk number keys hub-shard scatter (shard s owns chunks with
    ``chunk_no % n_shards == s``)."""
    key = ("csr", block_dir, bucket)
    hit = _cache_get(key)
    if hit is not None:
        return hit
    import pyarrow.parquet as pq

    chunks = []
    for path in sorted(
        glob.glob(os.path.join(block_dir, "csr", f"pid={bucket}", "*.parquet"))
    ):
        t = pq.read_table(
            path, columns=["chunk", *_CSR_COLS], memory_map=True
        )
        chunk_no = t.column("chunk")
        cols = [t.column(c) for c in _CSR_COLS]
        for i in range(t.num_rows):
            cno = chunk_no[i].as_py()
            if cno < 0:
                # degree statics folded into the CSR write (chunk == -1
                # row: src_ids = out_degree, dst_ids = out_wdegree) —
                # decode into the static cache alongside the chunks
                _cache_put(
                    ("static", block_dir, "out_degree", bucket),
                    np.frombuffer(cols[0][i].as_buffer(), np.float64),
                )
                _cache_put(
                    ("static", block_dir, "out_wdegree", bucket),
                    np.frombuffer(cols[1][i].as_buffer(), np.float64),
                )
                continue
            arrays = []
            for col, dt in zip(cols, _CSR_DTYPES):
                arrays.append(np.frombuffer(col[i].as_buffer(), dtype=dt))
            chunks.append((int(cno), tuple(arrays)))
    _cache_put(key, chunks)
    return chunks


def load_static(block_dir: str, name: str, bucket: int, bw: int,
                default: float = 0.0) -> np.ndarray:
    key = ("static", block_dir, name, bucket)
    hit = _cache_get(key)
    if hit is not None:
        return hit
    import pyarrow.parquet as pq

    paths = sorted(
        glob.glob(
            os.path.join(
                block_dir, f"static_{name}", f"bucket={bucket}", "*.parquet"
            )
        )
    )
    if paths:
        t = pq.read_table(paths[0], columns=["payload"], memory_map=True)
        arr = np.frombuffer(t.column("payload")[0].as_buffer(), np.float64)
    elif name in ("out_degree", "out_wdegree"):
        # degree statics live as chunk == -1 rows inside the CSR files
        # (written by build_bucketed_csr's single pass); loading the
        # bucket's chunks populates the static cache as a side effect
        load_bucket_chunks(block_dir, bucket)
        hit = _cache_get(key)
        if hit is not None:
            return hit
        arr = np.full(bw, default, dtype=np.float64)
    else:
        arr = np.full(bw, default, dtype=np.float64)
    _cache_put(key, arr)
    return arr


def _combine_labelvote(
    allv: np.ndarray, alll: np.ndarray, allw: np.ndarray, width: int
) -> tuple[np.ndarray, np.ndarray]:
    """Reduce (dst, label, weight) message triples to the winning label
    per destination: max total vote weight, tie → smaller label (GDS LP
    tie semantics, ref algo/.../labelpropagation/ComputeStepConsumer.java
    tallyVotes:64-77). Fully vectorized: lexsort by (dst, label) →
    segment-sum votes → per-dst segment argmax with first-wins (labels
    ascending within a dst ⇒ ties resolve to the smaller label).
    Deterministic: the caller concatenates message rows in sorted-sender
    order, and lexsort is stable, so float summation order is fixed."""
    if len(allv) == 0:
        return np.full(width, np.nan), np.zeros(width, dtype=bool)
    order = np.lexsort((alll, allv))
    sv = allv[order]
    sl = alll[order]
    sw = allw[order]
    newg = np.r_[True, (sv[1:] != sv[:-1]) | (sl[1:] != sl[:-1])]
    gstarts = np.nonzero(newg)[0]
    gv = sv[gstarts]
    gl = sl[gstarts]
    gw = np.add.reduceat(sw, gstarts)
    dmask = np.r_[True, gv[1:] != gv[:-1]]
    dstarts = np.nonzero(dmask)[0]
    best = np.maximum.reduceat(gw, dstarts)
    seg_id = np.cumsum(dmask) - 1
    is_best = gw == best[seg_id]
    sentinel = len(gw)
    first = np.minimum.reduceat(
        np.where(is_best, np.arange(sentinel), sentinel), dstarts
    )
    msg_vals = np.full(width, np.nan)
    msg_vals[gv[dstarts]] = gl[first]
    msg_mask = np.zeros(width, dtype=bool)
    msg_mask[gv[dstarts]] = True
    return msg_vals, msg_mask


def _emit_scatter(
    rows: dict,
    send: np.ndarray,
    chunks: list[tuple],
    base: int,
    bucket: int,
    bw: int,
    nb: int,
    bucket_edges: np.ndarray,
    reducer: str,
    use_weights: bool,
    msg_dtype=None,
) -> None:
    """Scatter ``send`` along the given CSR chunks and append kind-1
    message rows to ``rows``. ``chunks`` is a (chunk_no, arrays) list —
    the caller chooses which chunks (all of them inline, or one hub
    shard's subset). Chunks within a bucket hold DISJOINT dst runs
    (_build_chunks never splits a dst across chunks), so per-shard
    partial message rows stay exact for every reducer and the receiving
    side's sender-sorted combine order stays deterministic.

    ``msg_dtype=np.int32`` (min/max reducers, unweighted, integer-valued
    sends < 2^31 only — validated by run_fused): per-edge gathers, the
    message sort and the shuffled pay2 payload all carry int32 instead
    of float64 — 8 B/message instead of 12 and roughly half the
    memory-bandwidth per superstep, which is what the full-frontier
    supersteps are bound by at high core counts (BENCH.md). Exact: the
    integer labels are preserved bit-for-bit, NaN "don't send" maps to
    an INT32_MAX/INT32_MIN sentinel that the reducer can never emit for
    a vertex that received a real message."""
    if reducer == "labelvote":
        if np.isnan(send).all():
            return
        for _cno, chunk in chunks:
            src_ids, dst_ids, dst_offsets, src_idx, weights = chunk
            lab_pe = send[src_ids - base][src_idx]
            w_pe = (
                weights
                if use_weights
                else np.ones(len(lab_pe), dtype=np.float64)
            )
            dst_pe = np.repeat(dst_ids, np.diff(dst_offsets))
            sent = ~np.isnan(lab_pe)
            if not sent.all():
                lab_pe = lab_pe[sent]
                w_pe = w_pe[sent]
                dst_pe = dst_pe[sent]
            if len(dst_pe) == 0:
                continue
            # map-side combine per (dst, label): early supersteps see
            # unique labels (no reduction), late supersteps collapse
            # most vote traffic
            order = np.lexsort((lab_pe, dst_pe))
            sd = dst_pe[order]
            sl2 = lab_pe[order]
            sw2 = w_pe[order]
            newg = np.r_[
                True,
                (sd[1:] != sd[:-1]) | (sl2[1:] != sl2[:-1]),
            ]
            gstarts = np.nonzero(newg)[0]
            gd = sd[gstarts]
            gl = sl2[gstarts]
            gw = np.add.reduceat(sw2, gstarts)
            gd_local = (gd % bw).astype(np.int32)
            cut = np.searchsorted(gd, bucket_edges)
            lo = 0
            for b in range(nb):
                hi = cut[b]
                if hi > lo:
                    rows["kind"].append(1)
                    rows["bucket"].append(b)
                    rows["pay1"].append(gd_local[lo:hi].tobytes())
                    rows["pay2"].append(gl[lo:hi].tobytes())
                    rows["pay3"].append(gw[lo:hi].tobytes())
                    rows["l1"].append(0.0)
                    rows["active"].append(bucket)
                    rows["nrows"].append(int(hi - lo))
                    rows["task_sec"].append(0.0)
                lo = hi
        return
    n_nan = int(np.isnan(send).sum())
    if n_nan >= len(send):
        return
    all_sent = n_nan == 0 and not use_weights
    int_mode = msg_dtype is not None
    if int_mode:
        # sentinel: a value the min/max over real messages can never
        # take (run_fused validates values fit int32)
        sentinel = (
            np.int32(2**31 - 1) if reducer == "min" else np.int32(-(2**31))
        )
    for _cno, chunk in chunks:
        src_ids, dst_ids, dst_offsets, src_idx, weights = chunk
        sel = send[src_ids - base]
        act = ~np.isnan(sel)
        n_act = int(act.sum())
        if n_act == 0:
            # no source in this chunk sends — O(n_src) check instead of
            # the O(E) per-edge pipeline below
            continue
        if int_mode:
            # one O(n_src) conversion; every O(E) step below then moves
            # 4-byte lanes instead of 8-byte ones
            sel = np.where(act, sel, float(sentinel)).astype(np.int32)
        if n_act * 16 < len(sel) and not all_sent:
            # sparse frontier (convergence tail): touch only the active
            # sources' edges. One O(E) bool gather finds them; their dst
            # run ids come from searchsorted on the offset table — no
            # O(E) double gathers / np.where chains / reduceat over the
            # full chunk. This is what keeps thin-tail supersteps from
            # paying full-frontier numpy cost (the serial term in the
            # N->4N scaling evidence, BENCH.md).
            emask = act[src_idx]
            idx = np.flatnonzero(emask)
            if len(idx) == 0:
                continue
            vals_pe = sel[src_idx[idx]]
            if use_weights:
                vals_pe = vals_pe * weights[idx]
                ok = np.isfinite(vals_pe)
                if not ok.all():
                    idx = idx[ok]
                    vals_pe = vals_pe[ok]
                    if len(idx) == 0:
                        continue
            runs = np.searchsorted(dst_offsets, idx, side="right") - 1
            dst_pe = dst_ids[runs]
            order = np.argsort(dst_pe, kind="stable")
            sd = dst_pe[order]
            sv = vals_pe[order]
            gstarts = np.flatnonzero(np.r_[True, sd[1:] != sd[:-1]])
            verts = sd[gstarts]
            if reducer == "sum":
                vals = np.add.reduceat(sv, gstarts)
            elif reducer == "count":
                vals = np.diff(np.r_[gstarts, len(sv)]).astype(
                    np.float64
                )
            elif reducer == "min":
                vals = np.minimum.reduceat(sv, gstarts)
            else:
                vals = np.maximum.reduceat(sv, gstarts)
            verts_local = (verts % bw).astype(np.int32)
            cut = np.searchsorted(verts, bucket_edges)
            lo = 0
            for b in range(nb):
                hi = cut[b]
                if hi > lo:
                    rows["kind"].append(1)
                    rows["bucket"].append(b)
                    rows["pay1"].append(verts_local[lo:hi].tobytes())
                    rows["pay2"].append(vals[lo:hi].tobytes())
                    rows["pay3"].append(b"")
                    rows["l1"].append(0.0)
                    rows["active"].append(bucket)
                    rows["nrows"].append(int(hi - lo))
                    rows["task_sec"].append(0.0)
                lo = hi
            continue
        per_edge = sel[src_idx]
        if use_weights:
            per_edge = per_edge * weights
            per_edge[~np.isfinite(per_edge)] = np.nan
        starts = dst_offsets[:-1]
        if all_sent:
            # fast path (every vertex sends — the common case for power
            # iterations before the frontier thins): skip the sent-mask
            # and its three O(E) temporaries entirely
            if reducer == "sum":
                accm = np.add.reduceat(per_edge, starts)
            elif reducer == "count":
                accm = np.diff(dst_offsets).astype(np.float64)
            elif reducer == "min":
                accm = np.minimum.reduceat(per_edge, starts)
            else:
                accm = np.maximum.reduceat(per_edge, starts)
            verts = dst_ids
            vals = accm
        elif int_mode:
            # the sentinel rides through the reduction and marks
            # untouched dsts afterwards — no per-edge sent mask, no
            # cnts reduceat, two fewer O(E) temporaries than the float
            # masked path below
            red = np.minimum if reducer == "min" else np.maximum
            accm = red.reduceat(per_edge, starts)
            touched = accm != sentinel
            if not touched.any():
                continue
            verts = dst_ids[touched]
            vals = accm[touched]
        else:
            sent = ~np.isnan(per_edge)
            if not sent.any():
                continue
            cnts = np.add.reduceat(sent.astype(np.float64), starts)
            touched = cnts > 0
            if reducer == "sum":
                accm = np.add.reduceat(
                    np.where(sent, per_edge, 0.0), starts
                )
            elif reducer == "count":
                accm = cnts
            elif reducer == "min":
                accm = np.minimum.reduceat(
                    np.where(sent, per_edge, np.inf), starts
                )
            else:
                accm = np.maximum.reduceat(
                    np.where(sent, per_edge, -np.inf), starts
                )
            verts = dst_ids[touched]
            vals = accm[touched]
        # vectorized bucket-local id conversion: one mod + one astype
        # over the whole array, then slice
        verts_local = (verts % bw).astype(np.int32)
        cut = np.searchsorted(verts, bucket_edges)
        lo = 0
        for b in range(nb):
            hi = cut[b]
            if hi > lo:
                rows["kind"].append(1)
                rows["bucket"].append(b)
                rows["pay1"].append(verts_local[lo:hi].tobytes())
                rows["pay2"].append(vals[lo:hi].tobytes())
                rows["pay3"].append(b"")
                rows["l1"].append(0.0)
                # sender bucket: the deterministic combine-order key on
                # the receive side
                rows["active"].append(bucket)
                rows["nrows"].append(int(hi - lo))
                rows["task_sec"].append(0.0)
            lo = hi


@dataclass
class FusedResult:
    state: DataFrame  # FUSED_SCHEMA rows, kind == 0
    ran_iterations: int
    converged: bool
    metrics: list[dict]
    bucket_width: int = 0

    def to_rows(self, cols: tuple[str, str]) -> DataFrame:
        """Unpack blob state back to (vertex long, <c1> double, <c2>
        double) rows."""
        c1, c2 = cols
        bw_df = self.state
        bw = self.bucket_width

        def unpack(pdf_iter):
            for pdf in pdf_iter:
                for r in pdf.itertuples(index=False):
                    a1 = np.frombuffer(r.pay1, dtype=np.float64)
                    a2 = np.frombuffer(r.pay2, dtype=np.float64)
                    base = r.bucket * bw  # last bucket may be narrower
                    yield pd.DataFrame(
                        {
                            "vertex": base + np.arange(len(a1), dtype=np.int64),
                            c1: a1,
                            c2: a2,
                        }
                    )

        return bw_df.mapInPandas(
            unpack, f"vertex long, {c1} double, {c2} double"
        )


def run_fused(
    csr: BucketedCsr,
    compute: Callable,
    *,
    max_iterations: int,
    reducer: str = "sum",
    converged_fn: Callable[[dict], bool] | None = None,
    checkpoint: CheckpointStore | None = None,
    use_weights: bool = False,
    chunk_size: int = 1,
    adaptive_chunk_max: int | None = None,
    adaptive_threshold: float = 0.05,
    msg_dtype=None,
    spark=None,
) -> FusedResult:
    """Superstep loop over blob state.

    ``chunk_size`` > 1 chains that many supersteps lazily into ONE Spark
    job (per-superstep metrics still observed individually): the
    intermediate message blobs then exist only as shuffle files — they
    never pass through the block manager — which at ~16 B/edge of message
    traffic is the dominant materialization cost. Trade-off: convergence
    is detected at chunk granularity (the returned state is the
    chunk-end state even if an earlier superstep already met the
    criterion), so keep the default 1 when exact ranIterations parity
    matters and raise it for fixed-iteration throughput runs.

    ``adaptive_chunk_max``: when set, the chunk size doubles (up to this
    cap) every time the newest superstep's active fraction drops below
    ``adaptive_threshold`` — the thin-frontier convergence tail then
    amortizes its fixed per-job stage-launch cost over many supersteps
    (the serial term that caps multi-core scaling efficiency; see
    BENCH.md). Convergence detection stays exact per-superstep via the
    per-superstep Observations — only the returned state may overshoot
    to chunk end, so enable this only for computes whose post-convergence
    supersteps are idempotent (min-label WCC, labelvote LP).

    ``compute(bucket, iteration, state, msg_vals, msg_mask, static) ->
    (new_state: tuple[np.ndarray, np.ndarray], send: np.ndarray | None,
    l1: float, active: int)``

    - ``state``: None on the first superstep (compute initializes), else
      the (pay1, pay2) arrays from the previous superstep.
    - ``msg_vals``/``msg_mask``: dense reduced incoming messages for this
      bucket and a received-mask (both None on the first superstep).
    - ``send``: per-vertex value to push along out-edges (NaN = don't
      send), or None to send nothing.
    - ``static``: accessor ``static(name, default)`` for dense per-bucket
      arrays written by :func:`write_static_array`.
    """
    if spark is None:
        raise ValueError("spark session required")
    if msg_dtype is not None:
        # int32 message lanes are exact ONLY when every sent value is an
        # integer in (-2^31, 2^31-1) — i.e. label/id-valued computes —
        # and the reducer is a lattice op (min/max picks one of the
        # inputs; sum/count would overflow and labelvote ships float
        # weights). The caller asserts the value range (wcc checks
        # n_vertices); here we pin the reducer contract.
        if reducer not in ("min", "max") or use_weights:
            raise ValueError(
                "msg_dtype=int32 requires an unweighted min/max reducer"
            )
        if np.dtype(msg_dtype) != np.int32:
            raise ValueError("only int32 msg_dtype is supported")
    nb, bw = csr.n_buckets, csr.bucket_width
    n_vertices = csr.n_vertices
    block_dir = csr.block_dir
    bucket_edges = np.arange(1, nb + 1, dtype=np.int64) * bw
    shard_map = csr.shard_map or {}

    out_cols = (
        "kind", "bucket", "pay1", "pay2", "pay3", "l1", "active", "nrows",
        "task_sec",
    )

    def shard_udf(key, pdf: pd.DataFrame) -> pd.DataFrame:
        """Hub-shard scatter stage. Groups keyed (bucket, g2): g2 == -1
        is the pass-through group (state + regular message rows flow on
        unchanged); g2 >= 0 scatters shard g2's chunk subset of a hub
        bucket — so a hub's edge mass runs as n_shards parallel tasks
        instead of one serial one. Exact: chunks hold disjoint dst runs
        (partial sums per shard never overlap a dst)."""
        g2 = int(key[1])
        if g2 < 0:
            return pdf[list(out_cols)]
        t_task = time.monotonic()
        bucket = int(key[0])
        base = bucket * bw
        n_shards = shard_map.get(bucket, 1)
        rows = {c: [] for c in out_cols}
        send = np.frombuffer(pdf.iloc[0]["pay1"], dtype=np.float64)
        chunks = [
            (cno, arrs)
            for cno, arrs in load_bucket_chunks(block_dir, bucket)
            if cno % n_shards == g2
        ]
        _emit_scatter(
            rows, send, chunks, base, bucket, bw, nb, bucket_edges,
            reducer, use_weights, msg_dtype,
        )
        # kind-3 lineage-only row: this shard task's wall time (ignored
        # by the gather; read by the checkpoint lineage pass, then dies)
        rows["kind"].append(3)
        rows["bucket"].append(bucket)
        rows["pay1"].append(b"")
        rows["pay2"].append(b"")
        rows["pay3"].append(b"")
        rows["l1"].append(0.0)
        rows["active"].append(g2)
        rows["nrows"].append(0)
        rows["task_sec"].append(time.monotonic() - t_task)
        return pd.DataFrame(rows)

    def make_udf(iteration: int):
        # single-input grouped UDF (state + message rows share the schema,
        # keyed by target bucket): ONE exchange per superstep, rows split
        # by `kind` python-side. Message ids ship as BUCKET-LOCAL int32
        # (25% fewer message bytes than global int64).
        def udf(key, pdf: pd.DataFrame):
            if os.environ.get("GDS_FUSED_PROFILE"):
                import cProfile
                import pstats

                prof = cProfile.Profile()
                prof.enable()
                try:
                    return _udf_body(key, pdf)
                finally:
                    prof.disable()
                    with open(
                        f"/tmp/gds_prof_{os.getpid()}.txt", "a"
                    ) as fh:
                        st = pstats.Stats(prof, stream=fh)
                        st.sort_stats("cumulative").print_stats(12)
            return _udf_body(key, pdf)

        def _udf_body(key, pdf: pd.DataFrame):
            t_task = time.monotonic()
            bucket = int(key[0])
            base = bucket * bw
            width = min(bw, n_vertices - base)
            if width <= 0:
                return pd.DataFrame({c: [] for c in out_cols})

            def static(name, default=0.0):
                return load_static(block_dir, name, bucket, bw, default)[
                    :width
                ]

            if iteration == 1:
                state = None
                msg_vals = None
                msg_mask = None
            else:
                kinds = pdf["kind"].to_numpy()
                sidx = np.nonzero(kinds == 0)[0]
                if len(sidx) == 0:
                    return pd.DataFrame({c: [] for c in out_cols})
                srow = pdf.iloc[int(sidx[0])]
                state = (
                    np.frombuffer(srow["pay1"], dtype=np.float64).copy(),
                    np.frombuffer(srow["pay2"], dtype=np.float64).copy(),
                )
                p1 = pdf["pay1"].to_numpy()
                p2 = pdf["pay2"].to_numpy()
                midx = np.nonzero(kinds == 1)[0]
                # deterministic combine order: message rows arrive in
                # shuffle order (run-dependent); float summation is not
                # associative, so sort by sender bucket (carried in the
                # `active` column of kind-1 rows) for byte-identical
                # results across runs and checkpoint resumes
                if len(midx) > 1:
                    senders = pdf["active"].to_numpy()[midx]
                    midx = midx[np.argsort(senders, kind="stable")]
                val_np = np.int32 if msg_dtype is not None else np.float64
                vs = [np.frombuffer(p1[i], dtype=np.int32) for i in midx]
                ms = [np.frombuffer(p2[i], dtype=val_np) for i in midx]
                if vs:
                    allv = np.concatenate(vs) if len(vs) > 1 else vs[0]
                    allm = np.concatenate(ms) if len(ms) > 1 else ms[0]
                else:
                    allv = np.empty(0, np.int32)
                    allm = np.empty(0, val_np)
                if reducer == "labelvote":
                    p3 = pdf["pay3"].to_numpy()
                    ws_ = [
                        np.frombuffer(p3[i], dtype=np.float64) for i in midx
                    ]
                    allw = (
                        np.concatenate(ws_)
                        if len(ws_) > 1
                        else (ws_[0] if ws_ else np.empty(0, np.float64))
                    )
                    msg_vals, msg_mask = _combine_labelvote(
                        allv, allm, allw, width
                    )
                else:
                    # bincount is the vectorized combine (np.add.at is a
                    # scalar loop ~100 ns/element — it alone dominated
                    # python CPU at 145M-edge scale)
                    cnt = np.bincount(allv, minlength=width).astype(
                        np.float64
                    )
                    if reducer == "sum":
                        acc = np.bincount(
                            allv, weights=allm, minlength=width
                        )
                    elif reducer == "count":
                        acc = cnt.copy()
                    else:
                        # min/max: sort by target, segment-reduce (the
                        # sort and gather run in int32 lanes when
                        # msg_dtype is set — the combine result is then
                        # widened once, O(width) not O(messages))
                        if reducer == "min":
                            acc = np.full(
                                width,
                                2**31 - 1 if msg_dtype is not None
                                else np.inf,
                                dtype=allm.dtype,
                            )
                            red = np.minimum
                        else:
                            acc = np.full(
                                width,
                                -(2**31) if msg_dtype is not None
                                else -np.inf,
                                dtype=allm.dtype,
                            )
                            red = np.maximum
                        if len(allv):
                            order = np.argsort(allv, kind="stable")
                            sv = allv[order]
                            sm = allm[order]
                            starts = np.nonzero(
                                np.r_[True, sv[1:] != sv[:-1]]
                            )[0]
                            acc[sv[starts]] = red.reduceat(sm, starts)
                        if msg_dtype is not None:
                            acc = acc.astype(np.float64)
                    msg_mask = cnt > 0
                    msg_vals = acc

            new_state, send, l1, active = compute(
                bucket, iteration, state, msg_vals, msg_mask, static
            )
            rows = {c: [] for c in out_cols}
            rows["kind"].append(0)
            rows["bucket"].append(bucket)
            rows["pay1"].append(new_state[0].tobytes())
            rows["pay2"].append(new_state[1].tobytes())
            rows["pay3"].append(b"")
            rows["l1"].append(float(l1))
            rows["active"].append(int(active))
            rows["nrows"].append(width)
            rows["task_sec"].append(0.0)  # backfilled below

            if send is not None:
                n_shards = shard_map.get(bucket, 0)
                if n_shards > 1:
                    # hub bucket: don't scatter serially here — emit one
                    # kind-2 shard job per shard (pay1 = the dense send
                    # array); the shard stage scatters its chunk subset
                    # in parallel tasks. Skip entirely when nothing sends.
                    if not bool(np.isnan(send).all()):
                        blob = send.tobytes()
                        for s in range(n_shards):
                            rows["kind"].append(2)
                            rows["bucket"].append(bucket)
                            rows["pay1"].append(blob)
                            rows["pay2"].append(b"")
                            rows["pay3"].append(b"")
                            rows["l1"].append(0.0)
                            rows["active"].append(s)  # shard id
                            rows["nrows"].append(0)
                            rows["task_sec"].append(0.0)
                else:
                    _emit_scatter(
                        rows, send, load_bucket_chunks(block_dir, bucket),
                        base, bucket, bw, nb, bucket_edges, reducer,
                        use_weights, msg_dtype,
                    )
            # the first row is this bucket's state row: record the task's
            # own wall time so lineage shows true per-partition balance
            rows["task_sec"][0] = time.monotonic() - t_task
            return pd.DataFrame(rows)

        return udf

    from pyspark.sql import Observation

    jsc = spark.sparkContext._jsc

    def _persistent_ids() -> set:
        return {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()}

    def _unpersist(ids: set) -> None:
        jmap = jsc.getPersistentRDDs()
        for rid in ids:
            jrdd = jmap.get(rid)
            if jrdd is not None:
                jrdd.unpersist(False)

    ckpt_history: list[set] = []
    start_iter = 1
    cur = None
    if checkpoint is not None:
        resumed = checkpoint.latest_complete()
        if resumed is not None:
            it0, cur = resumed
            start_iter = it0 + 1
    if cur is None:
        cur = spark.range(nb).select(
            F.lit(0).alias("kind"),
            F.col("id").cast("int").alias("bucket"),
            F.lit(b"").alias("pay1"),
            F.lit(b"").alias("pay2"),
            F.lit(b"").alias("pay3"),
            F.lit(0.0).alias("l1"),
            F.lit(0).cast("long").alias("active"),
            F.lit(0).cast("long").alias("nrows"),
            F.lit(0.0).alias("task_sec"),
        )

    all_metrics: list[dict] = []
    converged = False
    ran = max_iterations
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    # With AQE off, every cogroup/groupby stage in the loop launches
    # spark.sql.shuffle.partitions tasks — for small bucket counts most
    # are empty yet still pay scheduling + python-worker round-trips
    # (measured ~1.4 s/superstep of pure overhead on a 1-bucket graph at
    # 64 partitions). The blob exchange needs at most one partition per
    # bucket, so size the loop's shuffles to the bucket count.
    parts_before = spark.conf.get("spark.sql.shuffle.partitions", "200")
    loop_parts = nb + sum(shard_map.values())  # buckets + hub shard tasks
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(min(int(parts_before), loop_parts)),
    )

    def _obs_metrics(obs_name: str):
        return (
            F.sum(
                F.when(F.col("kind") == 0, F.col("l1")).otherwise(0.0)
            ).alias("l1"),
            F.sum(
                F.when(F.col("kind") == 0, F.col("active")).otherwise(0)
            ).alias("active"),
            F.sum(
                F.when(F.col("kind") == 0, F.col("nrows")).otherwise(0)
            ).alias("rows"),
        )

    try:
        t = start_iter
        chunk_no = 0
        cur_chunk = chunk_size
        while t <= max_iterations and not converged:
            chunk_no += 1
            todo = min(cur_chunk, max_iterations - t + 1)
            # chain `todo` supersteps lazily: intermediate message blobs
            # live only in shuffle files, never in the block manager; each
            # superstep still gets its own Observation.
            observations: list[tuple[int, object]] = []
            with Timer() as timer:
                for i in range(todo):
                    it = t + i
                    out = cur.groupby("bucket").applyInPandas(
                        make_udf(it), FUSED_SCHEMA
                    )
                    if shard_map:
                        # second grouped stage: hub shard jobs (kind 2)
                        # fan out to (bucket, shard) tasks; everything
                        # else passes through the same exchange
                        out = out.groupby(
                            F.col("bucket"),
                            F.when(F.col("kind") == 2, F.col("active"))
                            .otherwise(F.lit(-1))
                            .cast("int")
                            .alias("g2"),
                        ).applyInPandas(shard_udf, FUSED_SCHEMA)
                    obs = Observation(f"fused_{it}_{chunk_no}")
                    out = out.observe(obs, *_obs_metrics(f"fused_{it}"))
                    observations.append((it, obs))
                    cur = out
                per_bucket = None
                if checkpoint is not None:
                    cur = checkpoint.write_state(cur, t + todo - 1)
                    # per-partition lineage (north rule): the kind-0 state
                    # rows carry per-bucket rows/l1 — read them back from
                    # the just-written checkpoint (column-pruned scan of
                    # n_buckets tiny rows, negligible)
                    per_bucket = [
                        (
                            r["bucket"],
                            r["nrows"],
                            float(r["l1"] or 0.0),
                            float(r["task_sec"] or 0.0),
                        )
                        for r in cur.filter(F.col("kind").isin(0, 3))
                        .select("bucket", "nrows", "l1", "task_sec")
                        .collect()
                    ]
                else:
                    before = _persistent_ids()
                    cur = loop_checkpoint(cur, chunk_no)
                    ckpt_history.append(_persistent_ids() - before)
                    if len(ckpt_history) > 2:
                        _unpersist(ckpt_history.pop(0))
            per_ss = timer.elapsed / todo
            for it, obs in observations:
                got = obs.get
                metrics = {
                    "iteration": it,
                    "rows": int(got["rows"] or 0),
                    "l1": float(got["l1"] or 0.0),
                    "active": int(got["active"] or 0),
                    "wall_time": per_ss,
                }
                all_metrics.append(metrics)
                if checkpoint is not None:
                    # chunk-end superstep: true per-bucket lineage rows;
                    # intra-chunk supersteps exist only as shuffle files,
                    # so their lineage is the observed aggregate
                    lineage = (
                        per_bucket
                        if it == t + todo - 1 and per_bucket
                        else [(-1, metrics["rows"], metrics["l1"])]
                    )
                    checkpoint.write_lineage(it, lineage, per_ss)
                if metrics["active"] == 0 or (
                    converged_fn is not None and converged_fn(metrics)
                ):
                    # convergence detected at chunk granularity: state is
                    # the chunk-end state; ran reports the detecting step
                    converged = True
                    ran = it
                    break
            t += todo
            if (
                adaptive_chunk_max
                and not converged
                and all_metrics
                and all_metrics[-1]["rows"] > 0
                and all_metrics[-1]["active"]
                < adaptive_threshold * all_metrics[-1]["rows"]
            ):
                cur_chunk = min(cur_chunk * 2, adaptive_chunk_max)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
        spark.conf.set("spark.sql.shuffle.partitions", parts_before)

    return FusedResult(
        state=cur.filter(F.col("kind") == 0),
        ran_iterations=ran,
        converged=converged,
        metrics=all_metrics,
        bucket_width=bw,
    )
