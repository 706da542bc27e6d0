"""Per-partition CSR block materialization.

The graph is stored as N "CSR blocks": each block holds a compressed
sparse row slice of the edge table (sorted unique src ids + offsets +
target ids + weights as packed little-endian numpy buffers). Blocks are
built once per graph (one shuffle) and cached; every superstep's scatter
phase streams vertex state into the blocks with a cogroup and emits
pre-combined messages — never per-row Python (all numpy inside Arrow
batches).

Skew handling (salting): a source whose out-degree exceeds
``hub_split_edges`` has its adjacency split across multiple blocks
(salt = dst % n_splits, deterministic). Partial per-block message sums
are exact because every supported reducer is associative; the final
``groupBy(dst).agg`` combine finishes the reduction. This mirrors the
reference's degree-based partitioning + atomic combine
(ref: core/.../core/utils/partition/PartitionUtils.java:74-78,
 beta/pregel/ReducingMessenger.java:75-80) re-expressed as a salted
shuffle, which is the scalable formulation on Spark.

CSR layout reference (semantics only): core/.../core/huge/HugeGraph.java:56-90.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

BLOCK_SCHEMA = (
    "pid int, chunk int, n_src long, n_edges long, "
    "src_ids binary, offsets binary, dsts binary, weights binary"
)

# Max edges per CSR chunk row (keeps single-row size ~128 MB at 8B/edge*3)
DEFAULT_MAX_CHUNK_EDGES = 4_000_000
# Out-degree above which a hub's adjacency is salted across blocks
DEFAULT_HUB_SPLIT_EDGES = 1_000_000


@dataclass
class CsrGraph:
    """blocks: cached CSR block DataFrame, hash-partitioned by ``pid`` at
    build time so every superstep's cogroup reuses the cached layout with
    NO re-shuffle of the (large) CSR byte arrays.

    hub_salts: tiny (src, salt_n) table for sources whose adjacency is
    salted across several blocks — broadcast at scatter time; every
    non-hub source's single pid is recomputed inline as
    ``pmod(xxhash64(src, 0), num_blocks)`` (no routing join at all).
    """

    blocks: DataFrame
    hub_salts: DataFrame  # (src long, salt_n int) — hubs only, broadcast-size
    num_blocks: int

    def pids_col(self):
        """array<int> of DISTINCT block pids for a ``src`` column (inline
        expr; distinct because different salts can hash to the same block
        — routing a source twice would duplicate its messages)."""
        salt_n = F.coalesce(F.col("salt_n"), F.lit(1))
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), salt_n - 1),
                lambda s: F.pmod(
                    F.xxhash64(F.col("src"), s.cast("long")),
                    F.lit(self.num_blocks),
                ).cast("int"),
            )
        )


def _build_chunks(key, pdf: pd.DataFrame, max_chunk_edges: int):
    pid = int(key[0])
    pdf = pdf.sort_values(["src", "dst"], kind="stable")
    src = pdf["src"].to_numpy(np.int64)
    dst = pdf["dst"].to_numpy(np.int64)
    w = pdf["weight"].to_numpy(np.float64)
    n = len(src)
    out = []
    start = 0
    chunk = 0
    while start < n:
        end = min(start + max_chunk_edges, n)
        # don't split a single src across chunks within a block: extend to
        # the end of the current src run
        if end < n:
            last = src[end - 1]
            while end < n and src[end] == last:
                end += 1
        s, d, ww = src[start:end], dst[start:end], w[start:end]
        uniq, counts = np.unique(s, return_counts=True)
        offsets = np.zeros(len(uniq) + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        out.append(
            (
                pid,
                chunk,
                len(uniq),
                int(end - start),
                uniq.tobytes(),
                offsets.tobytes(),
                d.tobytes(),
                ww.tobytes(),
            )
        )
        start = end
        chunk += 1
    return pd.DataFrame(
        out,
        columns=[
            "pid",
            "chunk",
            "n_src",
            "n_edges",
            "src_ids",
            "offsets",
            "dsts",
            "weights",
        ],
    )


def build_csr_graph(
    edges: DataFrame,
    num_blocks: int | None = None,
    *,
    hub_split_edges: int = DEFAULT_HUB_SPLIT_EDGES,
    max_chunk_edges: int = DEFAULT_MAX_CHUNK_EDGES,
) -> CsrGraph:
    """One shuffle: assign (src, salt) -> pid, group, pack CSR chunks.

    Returns cached blocks + per-src routing (which blocks hold my edges).
    """
    spark = edges.sparkSession
    if num_blocks is None:
        num_blocks = max(spark.sparkContext.defaultParallelism, 2)

    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("__outdeg"))
    salt_n = F.greatest(
        F.lit(1),
        F.ceil(F.col("__outdeg") / F.lit(hub_split_edges)).cast("int"),
    )
    e = edges.join(deg, "src").withColumn("__salt_n", salt_n)
    e = e.withColumn(
        "pid",
        F.pmod(
            F.xxhash64(
                F.col("src"),
                F.pmod(F.col("dst"), F.col("__salt_n").cast("long")),
            ),
            F.lit(num_blocks),
        ).cast("int"),
    )

    def build(key, pdf):
        return _build_chunks(key, pdf, max_chunk_edges)

    # groupBy(pid).applyInPandas leaves the output hash-partitioned by pid;
    # caching preserves that layout, so superstep cogroups need no exchange
    # on the blocks side.
    blocks = (
        e.select("pid", "src", "dst", "weight")
        .groupBy("pid")
        .applyInPandas(build, BLOCK_SCHEMA)
        .cache()
    )
    hub_salts = (
        deg.filter(F.col("__outdeg") > hub_split_edges)
        .select("src", salt_n.alias("salt_n"))
        .cache()
    )
    blocks.count()  # materialize once
    hub_salts.count()
    return CsrGraph(blocks=blocks, hub_salts=hub_salts, num_blocks=num_blocks)


def decode_block_row(row) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    src_ids = np.frombuffer(row.src_ids, dtype=np.int64)
    offsets = np.frombuffer(row.offsets, dtype=np.int64)
    dsts = np.frombuffer(row.dsts, dtype=np.int64)
    weights = np.frombuffer(row.weights, dtype=np.float64)
    return src_ids, offsets, dsts, weights


def expand_ranges(starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Concatenate [starts[i], ends[i]) ranges into one index array, O(total)."""
    counts = ends - starts
    nz = counts > 0
    starts, ends, counts = starts[nz], ends[nz], counts[nz]
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    out = np.ones(total, dtype=np.int64)
    pos = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=pos[1:])
    out[0] = starts[0]
    out[pos[1:]] = starts[1:] - ends[:-1] + 1
    np.cumsum(out, out=out)
    return out
