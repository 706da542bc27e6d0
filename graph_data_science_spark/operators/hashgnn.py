"""HashGNN — hashing-based binary node embeddings (no training).

Reference scope note: `gds.beta.hashgnn` arrived in GDS 2.x (Tan et al.
2021, "Hashing-Accelerated Graph Neural Networks"); the ~1.6 reference
has FastRP only. Included because HashGNN is the embedding that fits
this engine's design point exactly: message passing + min-hash selection
with NO floating-point training — every step is integer hashing, so the
whole embedding is deterministic, partitioning-invariant, and (in md5
mode) EXACTLY replayable by an external SQL engine.

Semantics (deterministic variant of the GDS procedure, divergences
documented):

- Node features are BINARY vectors stored as active-bit sets. If none
  are provided, they are hash-generated: node v starts with bits
  ``{ H(v, j, "init") % dimension : j < density }`` (the GDS
  binarization step for featureless graphs).
- Each iteration runs ``density`` min-hash selections: for slot s, node
  v considers every active bit b of itself (key ``H(t, s, b, "self")``)
  and of its in-neighbors (key ``H(t, s, b, "nbr")``), and adopts the
  bit with the smallest key. The new feature set is the union of the
  per-slot winners. Because keys depend only on (iteration, slot, bit,
  pool) — not on which node carried the bit — the per-node minimum
  distributes over any partitioning.
- Divergence: GDS samples neighbors and scales selection probability by
  ``neighborInfluence``; this variant pools ALL neighbors at equal
  influence (the deterministic limit), trading that knob for exact
  reproducibility — the property this engine ranks higher.

Plan shape per iteration: bits explode ×density slots, one edge join
ships neighbor bits, one groupBy((node, slot)) min(struct(key, bit))
argmin with map-side combine — the same message-volume class as a
weighted LP superstep (m × density rows). Plans truncate via
``loop_checkpoint``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from ..plans.checkpoint import loop_checkpoint


def _key(*cols) -> F.Column:
    """Engine-portable 60-bit md5 key of '|'-joined values."""
    return F.conv(
        F.substring(F.md5(F.concat_ws("|", *cols)), 1, 15), 16, 10
    ).cast("long")


def hashgnn(
    graph: Graph,
    *,
    dimension: int = 64,
    iterations: int = 2,
    density: int = 4,
    features: DataFrame | None = None,
    seed: int = 42,
) -> DataFrame:
    """(internal_id long, embedding array<int>) — sorted active-bit
    indices of the binary embedding (≤ ``density`` bits set).

    ``features``: optional (internal_id, bit int) active-bit table to
    embed real binary features; defaults to hash-generated bits.
    """
    spark = graph.spark
    slots = spark.range(density).select(F.col("id").cast("int").alias("s"))
    if features is None:
        bits = (
            graph.vertices.select("internal_id")
            .crossJoin(slots.select(F.col("s").alias("j")))
            .select(
                "internal_id",
                F.pmod(
                    _key(
                        F.col("internal_id").cast("string"),
                        F.col("j").cast("string"),
                        F.lit("init"),
                        F.lit(str(seed)),
                    ),
                    F.lit(dimension),
                ).cast("int").alias("bit"),
            )
            .distinct()
        )
    else:
        bits = features.select("internal_id", F.col("bit").cast("int"))
    bits = bits.localCheckpoint(eager=True)
    edges = graph.edges.select("src", "dst").distinct().localCheckpoint(
        eager=False
    )

    for t in range(1, iterations + 1):
        def keyed(pool_bits: DataFrame, tag: str, it: int = t) -> DataFrame:
            expanded = pool_bits.crossJoin(slots)
            return expanded.select(
                "internal_id",
                "s",
                "bit",
                _key(
                    F.lit(str(it)),
                    F.col("s").cast("string"),
                    F.col("bit").cast("string"),
                    F.lit(tag),
                    F.lit(str(seed)),
                ).alias("k"),
            )

        nbr_bits = (
            edges.join(
                bits.withColumnRenamed("internal_id", "src"), "src"
            )
            .select(F.col("dst").alias("internal_id"), "bit")
            .distinct()
        )
        cand = keyed(bits, "self").unionByName(keyed(nbr_bits, "nbr"))
        bits = (
            cand.groupBy("internal_id", "s")
            .agg(F.min(F.struct("k", "bit")).alias("w"))
            .select("internal_id", F.col("w.bit").alias("bit"))
            .distinct()
        )
        bits = loop_checkpoint(bits, t)
    return (
        bits.groupBy("internal_id")
        .agg(F.array_sort(F.collect_set("bit")).alias("embedding"))
    )
