"""The Pregel-style superstep kernel — the engine's one custom operator.

API mirrors the reference's PregelComputation contract
(ref: core/.../beta/pregel/PregelComputation.java:38-117 — init/compute/
reducer/applyRelationshipWeight; run loop Pregel.java:137-165; vote/wake
ComputeStep.java:99-103) re-expressed for Spark's execution model:

superstep t =
    scatter : frontier state (pid = inline hash; hub salts broadcast) →
              groupBy(pid).applyInPandas against worker-cached CSR block
              files → vectorized numpy message generation with
              **block-local pre-reduce** (np.bincount — the map-side
              combine). Only vertex state crosses the shuffle; block
              bytes stay memory-mapped in the reused python workers,
    gather  : groupBy(vertex).agg(<associative reducer>)  — one shuffle,
    apply   : state ⋈ messages → column expressions (JVM-side),
    persist : checkpoint parquet write + re-read (plan truncation + resume)
              or localCheckpoint (+ explicit unpersist of old states),
    metrics : folded into the persist action via Observation (no extra
              job); with a CheckpointStore, a per-partition aggregate
              feeds lineage rows (iteration, partition_id, rows,
              delta_norm, wall_time).

Messages are doubles and reducers are Sum/Min/Max/Count, exactly the
reference's reducing-messenger surface (ref: beta/pregel/Reducer.java:44-126).
Convergence = empty frontier (≡ "no messages sent ∧ all voted to halt",
ref: beta/pregel/PartitionedComputer.java:77-82) or an algorithm-supplied
predicate over the metrics (e.g. L1 norm ≤ tol).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from .checkpoint import CheckpointStore, Timer, loop_checkpoint
from .csr import CsrGraph, decode_block_row, expand_ranges

MSG_SCHEMA = "vertex long, msg double"

_LOCAL_REDUCE = {
    "sum": "sum",
    "min": "min",
    "max": "max",
    "count": "count",
}
_GLOBAL_REDUCE = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "count": F.sum,  # counts pre-counted locally; combine by summing
}


@dataclass
class PregelResult:
    state: DataFrame
    ran_iterations: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def _scatter_messages(
    csr: CsrGraph,
    state: DataFrame,
    iteration: int,
    scatter_cols: list[str],
    scatter_fn: Callable,
    reducer: str,
    frontier_cond: Column | None,
) -> DataFrame:
    frontier = state.filter(frontier_cond) if frontier_cond is not None else state
    # broadcast the (tiny) hub salt table; non-hub pid is computed inline —
    # the only shuffle on the state side is the cogroup's groupBy(pid).
    # No hubs at all -> no join, no per-superstep broadcast (driver-serial
    # broadcast latency is the #1 Amdahl term in the superstep loop).
    src_state = frontier.withColumnRenamed("vertex", "src")
    if csr.has_hubs:
        routed = src_state.join(
            F.broadcast(csr.hub_salts), "src", "left"
        ).select(
            F.explode(csr.pids_col()).alias("pid"),
            F.col("src").alias("vertex"),
            *scatter_cols,
        )
    else:
        routed = src_state.select(
            csr.pid_col().alias("pid"),
            F.col("src").alias("vertex"),
            *scatter_cols,
        )

    _EMPTY = pd.DataFrame({"vertex": pd.Series(dtype="int64"),
                           "msg": pd.Series(dtype="float64")})

    def _compute_chunks(chunks, state_pdf: pd.DataFrame) -> pd.DataFrame:
        """Vectorized message generation + block-local pre-reduce (the
        map-side combine of the Pregel reducer) over CSC chunks.

        Per-edge source values come from a gather out of an n_src-sized
        (cache-resident) array; the reduce is sequential ``reduceat`` over
        the dst runs. Sources absent from the frontier contribute NaN,
        which scatter arithmetic propagates — NaN == "no message"
        (reducing-messenger sentinel), so frontier filtering and message
        suppression share one mask.
        """
        sv = state_pdf["vertex"].to_numpy(np.int64)
        cols = {c: state_pdf[c].to_numpy(np.float64) for c in scatter_cols}
        outs = []
        for src_ids, dst_ids, dst_offsets, src_idx, weights in chunks:
            pos = np.searchsorted(src_ids, sv)
            valid = (pos < len(src_ids))
            valid[valid] &= src_ids[pos[valid]] == sv[valid]
            if not valid.any():
                continue
            vpos = pos[valid]
            per_edge = {}
            for c, vals in cols.items():
                arr = np.full(len(src_ids), np.nan)
                arr[vpos] = vals[valid]
                per_edge[c] = arr[src_idx]
            msg = scatter_fn(iteration, per_edge, weights)
            sent = ~np.isnan(msg)
            if not sent.any():
                continue
            starts = dst_offsets[:-1]
            cnts = np.add.reduceat(sent.astype(np.float64), starts)
            touched = cnts > 0
            if reducer == "sum":
                acc = np.add.reduceat(np.where(sent, msg, 0.0), starts)
            elif reducer == "count":
                acc = cnts
            elif reducer == "min":
                acc = np.minimum.reduceat(
                    np.where(sent, msg, np.inf), starts
                )
            else:  # max
                acc = np.maximum.reduceat(
                    np.where(sent, msg, -np.inf), starts
                )
            outs.append(
                pd.DataFrame(
                    {"vertex": dst_ids[touched], "msg": acc[touched]}
                )
            )
        if not outs:
            return _EMPTY
        if len(outs) == 1:
            return outs[0]
        allm = pd.concat(outs, ignore_index=True)
        agg = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}[
            reducer
        ]
        return getattr(
            allm.groupby("vertex", sort=False)["msg"], agg
        )().reset_index()

    if csr.block_dir is not None:
        block_dir = csr.block_dir

        def scatter_file_udf(key, state_pdf: pd.DataFrame):
            if len(state_pdf) == 0:
                return _EMPTY
            from .csr import load_block

            chunks = load_block(block_dir, int(key[0]))
            if not chunks:
                return _EMPTY
            return _compute_chunks(chunks, state_pdf)

        msgs = routed.groupby("pid").applyInPandas(
            scatter_file_udf, MSG_SCHEMA
        )
    else:

        def scatter_udf(key, block_pdf, state_pdf):
            if len(block_pdf) == 0 or len(state_pdf) == 0:
                return _EMPTY
            chunks = [decode_block_row(row)
                      for row in block_pdf.itertuples(index=False)]
            return _compute_chunks(chunks, state_pdf)

        msgs = csr.blocks.groupby("pid").cogroup(
            routed.groupby("pid")
        ).applyInPandas(scatter_udf, MSG_SCHEMA)

    global_agg = _GLOBAL_REDUCE[reducer]
    return msgs.groupBy("vertex").agg(global_agg("msg").alias("msg"))


PACKED_SCHEMA = "bucket int, vertices binary, msgs binary"


def _scatter_packed(
    csr: CsrGraph,
    state: DataFrame,
    iteration: int,
    scatter_cols: list[str],
    scatter_fn: Callable,
    reducer: str,
    frontier_cond: Column | None,
    bucket_width: int,
    n_buckets: int,
) -> DataFrame:
    """Scatter emitting per-(block, bucket) PACKED message arrays.

    Each output row carries two binary cells (int64 vertex ids + float64
    pre-reduced values) covering one contiguous vertex-range bucket — a
    few thousand rows total instead of O(E) per-message rows, so the JVM
    never touches messages row-wise. Exact because reducers are
    associative: the bucket combiner finishes the reduction.
    """
    frontier = state.filter(frontier_cond) if frontier_cond is not None else state
    src_state = frontier.withColumnRenamed("vertex", "src")
    if csr.has_hubs:
        routed = src_state.join(
            F.broadcast(csr.hub_salts), "src", "left"
        ).select(
            F.explode(csr.pids_col()).alias("pid"),
            F.col("src").alias("vertex"),
            *scatter_cols,
        )
    else:
        routed = src_state.select(
            csr.pid_col().alias("pid"),
            F.col("src").alias("vertex"),
            *scatter_cols,
        )
    block_dir = csr.block_dir
    bucket_edges = np.arange(1, n_buckets + 1, dtype=np.int64) * bucket_width

    def scatter_udf(key, state_pdf: pd.DataFrame):
        from .csr import load_block

        out_b, out_v, out_m = [], [], []
        if len(state_pdf) == 0:
            return pd.DataFrame({"bucket": [], "vertices": [], "msgs": []})
        sv = state_pdf["vertex"].to_numpy(np.int64)
        cols = {c: state_pdf[c].to_numpy(np.float64) for c in scatter_cols}
        for chunk in load_block(block_dir, int(key[0])):
            src_ids, dst_ids, dst_offsets, src_idx, weights = chunk
            pos = np.searchsorted(src_ids, sv)
            valid = (pos < len(src_ids))
            valid[valid] &= src_ids[pos[valid]] == sv[valid]
            if not valid.any():
                continue
            per_edge = {}
            for c, vals in cols.items():
                arr = np.full(len(src_ids), np.nan)
                arr[pos[valid]] = vals[valid]
                per_edge[c] = arr[src_idx]
            msg = scatter_fn(iteration, per_edge, weights)
            sent = ~np.isnan(msg)
            if not sent.any():
                continue
            starts = dst_offsets[:-1]
            cnts = np.add.reduceat(sent.astype(np.float64), starts)
            touched = cnts > 0
            if reducer == "sum":
                acc = np.add.reduceat(np.where(sent, msg, 0.0), starts)
            elif reducer == "count":
                acc = cnts
            elif reducer == "min":
                acc = np.minimum.reduceat(
                    np.where(sent, msg, np.inf), starts
                )
            else:
                acc = np.maximum.reduceat(
                    np.where(sent, msg, -np.inf), starts
                )
            verts = dst_ids[touched]
            vals = acc[touched]
            # split into contiguous vertex-range buckets (dst_ids sorted)
            cut = np.searchsorted(verts, bucket_edges)
            lo = 0
            for b in range(n_buckets):
                hi = cut[b]
                if hi > lo:
                    out_b.append(b)
                    out_v.append(verts[lo:hi].tobytes())
                    out_m.append(vals[lo:hi].tobytes())
                lo = hi
        return pd.DataFrame(
            {"bucket": pd.Series(out_b, dtype="int32"),
             "vertices": out_v, "msgs": out_m}
        )

    return routed.groupby("pid").applyInPandas(scatter_udf, PACKED_SCHEMA)


def _combine_apply_packed(
    packed: DataFrame,
    state: DataFrame,
    iteration: int,
    reducer: str,
    apply_np: Callable,
    bucket_width: int,
) -> DataFrame:
    """cogroup(packed msgs, state) by vertex-range bucket; the final
    reduce runs over a bucket-sized (cache-resident) dense array; apply
    is a numpy callback producing the new state rows directly — messages
    never materialize as rows anywhere."""
    out_schema = state.schema

    def combine(key, msgs_pdf: pd.DataFrame, state_pdf: pd.DataFrame):
        if len(state_pdf) == 0:
            return pd.DataFrame(
                {f.name: pd.Series(dtype="float64") for f in out_schema}
            )
        base = int(key[0]) * bucket_width
        if reducer in ("sum", "count"):
            acc = np.zeros(bucket_width)
            fill = 0.0
        elif reducer == "min":
            acc = np.full(bucket_width, np.inf)
            fill = np.inf
        else:
            acc = np.full(bucket_width, -np.inf)
            fill = -np.inf
        cnt = np.zeros(bucket_width)
        for row in msgs_pdf.itertuples(index=False):
            v = np.frombuffer(row.vertices, dtype=np.int64) - base
            m = np.frombuffer(row.msgs, dtype=np.float64)
            if reducer in ("sum", "count"):
                np.add.at(acc, v, m)
            elif reducer == "min":
                np.fmin.at(acc, v, m)
            else:
                np.fmax.at(acc, v, m)
            np.add.at(cnt, v, 1.0)
        sidx = state_pdf["vertex"].to_numpy(np.int64) - base
        received = cnt[sidx] > 0
        msg_vals = np.where(received, acc[sidx], np.nan)
        return apply_np(state_pdf, msg_vals, iteration)

    bucket_col = (F.col("vertex") / bucket_width).cast("int")
    grouped_state = state.withColumn("bucket", bucket_col).groupby("bucket")
    return packed.groupby("bucket").cogroup(grouped_state).applyInPandas(
        combine, out_schema
    )


def run_pregel(
    csr: CsrGraph,
    init_state: DataFrame,
    *,
    scatter_cols: list[str],
    scatter_fn: Callable,
    reducer: str,
    apply_fn: Callable[[DataFrame, DataFrame, int], DataFrame],
    frontier_fn: Callable[[int], Column],
    max_iterations: int,
    converged_fn: Callable[[dict], bool] | None = None,
    checkpoint: CheckpointStore | None = None,
    scatter_all: bool = False,
    apply_np: Callable | None = None,
) -> PregelResult:
    """Run the superstep loop. ``init_state`` must contain columns
    ``vertex long`` and ``delta double`` (delta feeds lineage's delta_norm
    and the default convergence frontier) plus whatever the algorithm needs.

    ``apply_np(state_pdf, msg_values, iteration) -> state_pdf`` enables the
    packed fast path (messages stay in packed numpy arrays end-to-end;
    requires file-backed CSR blocks and dense vertex ids). ``apply_fn``
    remains the row/DataFrame fallback used when apply_np is None or the
    CSR is in cogroup mode.

    Resume: if ``checkpoint`` holds a complete iteration, the loop restarts
    from it (same code path — scatter depends only on state).
    """
    state = init_state
    # AQE re-plans every stage on the driver — pure serial latency in a
    # tight superstep loop with fixed-size shuffles; turn it off for the
    # loop and restore afterwards.
    spark = init_state.sparkSession
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    smj_before = spark.conf.get("spark.sql.join.preferSortMergeJoin", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    # state⋈messages each superstep: hash join beats re-sorting both sides
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    try:
        return _run_pregel_loop(
            csr, state, scatter_cols, scatter_fn, reducer, apply_fn,
            frontier_fn, max_iterations, converged_fn, checkpoint,
            scatter_all, apply_np,
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
        spark.conf.set("spark.sql.join.preferSortMergeJoin", smj_before)


def _run_pregel_loop(
    csr: CsrGraph,
    state: DataFrame,
    scatter_cols: list[str],
    scatter_fn: Callable,
    reducer: str,
    apply_fn: Callable[[DataFrame, DataFrame, int], DataFrame],
    frontier_fn: Callable[[int], Column],
    max_iterations: int,
    converged_fn: Callable[[dict], bool] | None,
    checkpoint: CheckpointStore | None,
    scatter_all: bool,
    apply_np: Callable | None = None,
) -> PregelResult:
    spark = state.sparkSession
    jsc = spark.sparkContext._jsc

    use_packed = apply_np is not None and csr.block_dir is not None
    if use_packed:
        n_vertices = int(
            state.agg(F.max("vertex")).collect()[0][0] or 0
        ) + 1
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
        bucket_width = max(1, -(-n_vertices // n_buckets))
        n_buckets = -(-n_vertices // bucket_width)

    def _persistent_ids() -> set:
        return {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()}

    def _unpersist(ids: set) -> None:
        jmap = jsc.getPersistentRDDs()
        for rid in ids:
            jrdd = jmap.get(rid)
            if jrdd is not None:
                jrdd.unpersist(False)

    start_iter = 1
    if checkpoint is not None:
        resumed = checkpoint.latest_complete()
        if resumed is not None:
            it0, state = resumed
            start_iter = it0 + 1
        else:
            state = state.localCheckpoint(eager=True)
    else:
        state = state.localCheckpoint(eager=True)
    # localCheckpoint pins RDD blocks in the block manager; without
    # explicit cleanup a long run accumulates every iteration's state and
    # degrades under memory pressure. Free state from >=2 iterations back.
    ckpt_history: list[set] = []

    all_metrics: list[dict] = []
    converged = False
    # GDS counting (ref: Pregel.java:137-165): ranIterations == the superstep
    # index at which convergence was detected (loop breaks before increment),
    # or maxIterations if the loop exhausts.
    ran = max_iterations

    # superstep `start_iter - 1`'s sends happen lazily inside iteration t's
    # message plan: scatter always reads the *current* state.
    from pyspark.sql import Observation

    for t in range(start_iter, max_iterations):
        with Timer() as timer:
            if use_packed:
                packed = _scatter_packed(
                    csr, state, t - 1, scatter_cols, scatter_fn, reducer,
                    None if scatter_all else frontier_fn(t - 1),
                    bucket_width, n_buckets,
                )
                new_state = _combine_apply_packed(
                    packed, state, t, reducer, apply_np, bucket_width
                )
            else:
                msgs = _scatter_messages(
                    csr, state, t - 1, scatter_cols, scatter_fn, reducer,
                    None if scatter_all else frontier_fn(t - 1),
                )
                new_state = apply_fn(state, msgs, t)
            frontier_next = frontier_fn(t)
            if checkpoint is not None:
                new_state = checkpoint.write_state(new_state, t)
                # lineage wants per-partition rows: dedicated aggregate job
                per_part = (
                    new_state.groupBy(F.spark_partition_id().alias("pid"))
                    .agg(
                        F.count(F.lit(1)).alias("rows"),
                        F.sum(F.abs(F.col("delta"))).alias("l1"),
                        F.sum(
                            F.when(frontier_next, 1).otherwise(0)
                        ).alias("active"),
                    )
                    .collect()
                )
                rows = sum(r["rows"] for r in per_part)
                l1 = float(sum(r["l1"] or 0.0 for r in per_part))
                active = int(sum(r["active"] for r in per_part))
            else:
                # fold metrics into the checkpoint action itself (observe):
                # one Spark job per superstep total
                obs = Observation(f"superstep_{t}")
                new_state = new_state.observe(
                    obs,
                    F.count(F.lit(1)).alias("rows"),
                    F.sum(F.abs(F.col("delta"))).alias("l1"),
                    F.sum(F.when(frontier_next, 1).otherwise(0)).alias(
                        "active"
                    ),
                )
                before = _persistent_ids()
                # loop_checkpoint: plain localCheckpoint most supersteps,
                # stats-resetting rebuild every few — without the reset the
                # inherited sizeInBytes estimate squares per superstep and
                # overflows BigInteger around superstep ~26.
                new_state = loop_checkpoint(new_state, t)
                ckpt_history.append(_persistent_ids() - before)
                if len(ckpt_history) > 2:
                    _unpersist(ckpt_history.pop(0))
                got = obs.get
                rows = got["rows"]
                l1 = float(got["l1"] or 0.0)
                active = int(got["active"] or 0)
        metrics = {
            "iteration": t,
            "rows": rows,
            "l1": l1,
            "active": active,
            "wall_time": timer.elapsed,
        }
        all_metrics.append(metrics)
        if checkpoint is not None:
            checkpoint.write_lineage(
                t,
                [(r["pid"], r["rows"], float(r["l1"] or 0.0)) for r in per_part],
                timer.elapsed,
            )
        state = new_state
        if active == 0 or (converged_fn is not None and converged_fn(metrics)):
            converged = True
            ran = t
            break

    return PregelResult(
        state=state, ran_iterations=ran, converged=converged, metrics=all_metrics
    )
