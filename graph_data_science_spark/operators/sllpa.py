"""SLLPA — speaker-listener label propagation (OVERLAPPING communities).

Reference scope note: `gds.sllpa` arrived in GDS 2.x (Xie, Szymanski &
Liu 2011, "SLPA: Uncovering Overlapping Communities in Social Networks
via a Speaker-listener Interaction Dynamic Process", ICDM workshops);
the ~1.6 reference has disjoint communities only (Louvain/LP/WCC). A
web page legitimately belongs to several communities at once — SLLPA is
the standard LPA-family answer.

Process: every node keeps a label MEMORY (multiset, initialized to its
own id). Per iteration, every edge (u→v) makes u SPEAK one label drawn
from its memory with probability ∝ count, and v LISTENS: v adds the most
frequent label it heard this round (ties → smallest label) to its
memory. After T rounds, node v's communities are the labels holding at
least ``threshold`` of its memory.

Determinism (divergence from the paper's RNG, documented): the speaker
draw uses the exponential-race trick already powering
``pipeline.sampling.weighted_sample`` — label ℓ with count c wins the
draw for edge e at round t iff it minimizes ``-ln(H(t, e, ℓ)) / c``
where H is the engine-portable 60-bit md5 hash mapped to (0,1]. The
``-ln`` maps the uniform hash to an Exponential(1) arrival time, so the
minimum is exactly a weighted draw with weights c (the race
construction), and it remains a pure function of (round, edge, label,
count), so the run is reproducible
across cluster sizes AND exactly replayable in SQL. The listener's mode
is deterministic by the tie rule.

Plan shape per iteration: one edges×memory join (m × avg-memory rows,
the LP-message volume class), one argmin per edge, one mode-agg per
listener, one memory upsert — all map-side combinable aggregations;
plans truncate via ``loop_checkpoint``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from ..plans.checkpoint import loop_checkpoint

_SCALE = float(1 << 60)


def _u01(*cols) -> F.Column:
    """Engine-portable md5 hash mapped to (0, 1]."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", *cols)), 1, 15), 16, 10
    ).cast("double")
    return (h + F.lit(1.0)) / F.lit(_SCALE)


def sllpa(
    graph: Graph,
    *,
    max_iterations: int = 10,
    threshold: float = 0.1,
    seed: int = 42,
) -> DataFrame:
    """(internal_id long, community long) — one row per membership;
    nodes may appear in SEVERAL communities (that is the point). A label
    is emitted when its count reaches ceil(threshold × the node's own
    memory size) — nodes with no in-edges never hear anything, keep a
    memory of one (their own label), and are emitted as their own
    community."""
    edges = (
        graph.edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        # an edge id that both engines derive identically
        .withColumn(
            "eid",
            F.concat_ws(":", F.col("src").cast("string"),
                        F.col("dst").cast("string")),
        )
        .localCheckpoint(eager=False)
    )
    memory = graph.vertices.select(
        F.col("internal_id").alias("id"),
        F.col("internal_id").alias("label"),
        F.lit(1).alias("cnt"),
    ).localCheckpoint(eager=True)

    for t in range(1, max_iterations + 1):
        spoken_keys = (
            edges.join(memory.withColumnRenamed("id", "src"), "src")
            .select(
                "dst",
                "eid",
                "label",
                (
                    -F.log(
                        _u01(
                            F.lit(str(t)),
                            F.col("eid"),
                            F.col("label").cast("string"),
                            F.lit(str(seed)),
                        )
                    )
                    / F.col("cnt")
                ).alias("race"),
            )
        )
        spoken = (
            spoken_keys.groupBy("dst", "eid")
            .agg(F.min(F.struct("race", "label")).alias("w"))
            .select("dst", F.col("w.label").alias("label"))
        )
        heard = (
            spoken.groupBy("dst", "label")
            .agg(F.count(F.lit(1)).alias("n"))
            .groupBy("dst")
            .agg(
                F.min(F.struct((-F.col("n")).alias("neg"), F.col("label")))
                .alias("w")
            )
            .select(F.col("dst").alias("id"), F.col("w.label").alias("label"))
        )
        memory = (
            memory.unionByName(heard.withColumn("cnt", F.lit(1)))
            .groupBy("id", "label")
            .agg(F.sum("cnt").cast("int").alias("cnt"))
        )
        memory = loop_checkpoint(memory, t)
    totals = memory.groupBy("id").agg(F.sum("cnt").alias("total"))
    return (
        memory.join(totals, "id")
        .filter(
            F.col("cnt")
            >= F.ceil(F.lit(threshold) * F.col("total")).cast("int")
        )
        .select(F.col("id").alias("internal_id"),
                F.col("label").alias("community"))
    )
