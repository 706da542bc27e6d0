"""Graph data model: IdMap, orientation, aggregation, degrees.

Semantics mirror the reference (Neo4j GDS ~1.6):
- dense internal ids assigned in ascending original-id order
  (ref: core/.../core/loading/IdMap.java:49-114 — sorted assignment
  guarantees reproducible results),
- Orientation NATURAL / REVERSE / UNDIRECTED
  (ref: core/.../Orientation.java:30-32; UNDIRECTED stores both directions),
- parallel-edge Aggregation DEFAULT|NONE|SINGLE|SUM|MIN|MAX|COUNT
  (ref: core/.../core/Aggregation.java:28-83; DEFAULT resolves to NONE),
- weighted degree sums only *positive* weights
  (ref: algo/.../degree/DegreeCentrality.java:117-126).

Execution is Spark-first: the id map is a two-pass distributed dense-rank
(per-partition counts -> cumulative offsets -> offset add), NOT a
single-partition window, so it scales to 10^9+ vertices.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ByteType,
    IntegerType,
    LongType,
    ShortType,
    StructField,
    StructType,
)

# endpoint types eligible for the identity (no-id-map) fast path
_INTEGRAL_TYPES = (ByteType, ShortType, IntegerType, LongType)

NATURAL = "NATURAL"
REVERSE = "REVERSE"
UNDIRECTED = "UNDIRECTED"
ORIENTATIONS = (NATURAL, REVERSE, UNDIRECTED)

AGGREGATIONS = ("DEFAULT", "NONE", "SINGLE", "SUM", "MIN", "MAX", "COUNT")


def dense_ids(df: DataFrame, id_col: str, out_col: str = "internal_id") -> DataFrame:
    """Assign dense internal ids [0, n) ascending in ``id_col`` order.

    Scalable sort-based assignment: range-repartition by the id column,
    sort within partitions, then add cumulative per-partition offsets
    computed from partition row counts. Equivalent to
    ``row_number() over (order by id) - 1`` but without the
    single-partition global window.
    """
    distinct = df.select(id_col).distinct()
    # range partitioning gives globally ordered partitions
    parts = max(distinct.sparkSession.sparkContext.defaultParallelism, 1)
    ranged = distinct.repartitionByRange(parts, F.col(id_col)).sortWithinPartitions(id_col)
    # PIN the physical partitioning before reading it twice: the offsets
    # are collected in one action and consumed by mapInPandas in another,
    # and without the pin AQE may coalesce the range-shuffle differently
    # per action (plan-dependent), silently mis-basing the offsets —
    # duplicate + missing internal ids. localCheckpoint freezes one RDD
    # (O(n) id rows, the cheap thing) that both actions share.
    ranged = ranged.localCheckpoint(eager=True)
    ranged = ranged.withColumn("__pid", F.spark_partition_id())
    counts = (
        ranged.groupBy("__pid").count().orderBy("__pid").collect()
    )  # tiny: one row per partition
    offsets = {}
    acc = 0
    for row in counts:
        offsets[row["__pid"]] = acc
        acc += row["count"]

    schema = StructType(
        list(ranged.select(id_col).schema.fields) + [StructField(out_col, LongType(), False)]
    )

    def add_offsets(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one iterator == one partition, possibly MANY Arrow batches:
        # the position must accumulate across batches, not restart
        pos = None
        for pdf in it:
            if len(pdf) == 0:
                yield pdf.assign(**{out_col: pd.Series([], dtype="int64")})[
                    [id_col, out_col]
                ]
                continue
            if pos is None:
                pos = offsets.get(int(pdf["__pid"].iloc[0]), 0)
            out = pdf[[id_col]].copy()
            out[out_col] = range(pos, pos + len(pdf))
            pos += len(pdf)
            yield out

    return ranged.mapInPandas(add_offsets, schema)


@dataclass
class Graph:
    """An algorithm-ready graph: dense-id vertex + edge DataFrames.

    ``vertices``: (internal_id long, original_id <any>, ...properties)
    ``edges``:    (src long, dst long, weight double) — already oriented
                  and aggregated per the projection config.
    """

    vertices: DataFrame
    edges: DataFrame
    orientation: str = NATURAL
    is_multigraph: bool = True
    meta: dict = field(default_factory=dict)

    _node_count: int | None = None
    _rel_count: int | None = None

    @property
    def spark(self) -> SparkSession:
        return self.vertices.sparkSession

    def node_count(self) -> int:
        if self._node_count is None:
            self._node_count = self.vertices.count()
        return self._node_count

    def relationship_count(self) -> int:
        if self._rel_count is None:
            self._rel_count = self.edges.count()
        return self._rel_count

    # --- degrees -----------------------------------------------------
    def out_degrees(self, weighted: bool = False) -> DataFrame:
        """(internal_id, degree). Weighted degree sums positive weights only
        (ref: degree/DegreeCentrality.java:117-126)."""
        if weighted:
            deg = self.edges.groupBy("src").agg(
                F.sum(F.when(F.col("weight") > 0, F.col("weight")).otherwise(0.0)).alias(
                    "degree"
                )
            )
        else:
            deg = self.edges.groupBy("src").agg(
                F.count(F.lit(1)).cast("double").alias("degree")
            )
        return (
            self.vertices.select("internal_id")
            .join(deg, self.vertices.internal_id == deg.src, "left")
            .select("internal_id", F.coalesce("degree", F.lit(0.0)).alias("degree"))
        )

    def with_vertex_column(self, name: str, values: DataFrame) -> "Graph":
        """mutate-mode: attach (internal_id, <name>) as a vertex property."""
        joined = self.vertices.join(
            values.withColumnRenamed(values.columns[-1], name), "internal_id", "left"
        )
        return Graph(
            joined, self.edges, self.orientation, self.is_multigraph, dict(self.meta)
        )

    def with_relationships(
        self, rels: DataFrame, relationship_type: str
    ) -> "Graph":
        """mutate-mode relationship output (gds.nodeSimilarity.mutate,
        gds.beta.knn.mutate, gds.alpha.collapsePath.mutate — ref proc/.../
        MutateRelationshipsProc): union a typed relationship set into the
        graph. ``rels``: (src, dst[, weight]). Existing edges keep their
        ``__type`` (NULL for the base projection); the new set is tagged
        ``relationship_type`` so typed filters (delete_relationships,
        subgraph relationship_filter, write_relationship) address it."""
        base = self.edges
        if "__type" not in base.columns:
            base = base.withColumn(
                "__type", F.lit(None).cast("string")
            )
        new = rels
        if "weight" not in new.columns:
            new = new.withColumn("weight", F.lit(1.0))
        new = new.select(
            "src", "dst", F.col("weight").cast("double").alias("weight")
        ).withColumn("__type", F.lit(relationship_type))
        extra = [c for c in base.columns if c not in new.columns]
        for c in extra:
            new = new.withColumn(c, F.lit(None))
        merged = base.unionByName(new.select(*base.columns))
        return Graph(
            self.vertices, merged, self.orientation, self.is_multigraph,
            dict(self.meta),
        )


def orient_edges(edges: DataFrame, orientation: str) -> DataFrame:
    """Apply orientation (ref: Orientation.java:30-32).

    UNDIRECTED unions both directions — GDS stores both; triangle counting
    and undirected WCC rely on this.
    """
    if orientation == NATURAL:
        return edges
    cols = [c for c in edges.columns if c not in ("src", "dst")]
    if orientation == REVERSE:
        return edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), *cols
        )
    if orientation == UNDIRECTED:
        rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), *cols)
        return edges.select("src", "dst", *cols).unionByName(rev)
    raise ValueError(f"unknown orientation {orientation!r}")


def aggregate_edges(edges: DataFrame, aggregation: str = "DEFAULT") -> DataFrame:
    """Collapse parallel edges (ref: core/.../core/Aggregation.java:28-83).

    DEFAULT -> NONE (keep parallel edges, ref :142). SINGLE keeps an
    arbitrary-but-deterministic representative (min weight for stability).
    """
    aggregation = aggregation.upper()
    if aggregation not in AGGREGATIONS:
        raise ValueError(f"unknown aggregation {aggregation!r}")
    if aggregation in ("DEFAULT", "NONE"):
        return edges
    agg_expr = {
        "SINGLE": F.min("weight"),
        "SUM": F.sum("weight"),
        "MIN": F.min("weight"),
        "MAX": F.max("weight"),
        "COUNT": F.count(F.lit(1)).cast("double"),
    }[aggregation]
    return edges.groupBy("src", "dst").agg(agg_expr.alias("weight"))


def from_edge_list(
    spark: SparkSession,
    edges: list[tuple],
    *,
    orientation: str = NATURAL,
    aggregation: str = "DEFAULT",
    node_ids: list | None = None,
) -> Graph:
    """Build a Graph from python tuples (src, dst[, weight]) of original ids.

    Test/fixture helper — the GDL-fixture equivalent
    (ref: test-utils/.../gdl/GdlFactory.java:77).
    Ids are mapped to dense longs in sorted original-id order.
    """
    rows = [
        (str(e[0]), str(e[1]), float(e[2]) if len(e) > 2 else 1.0) for e in edges
    ]
    edf = spark.createDataFrame(rows, "src_orig string, dst_orig string, weight double")
    nodes = edf.select(F.col("src_orig").alias("original_id")).unionByName(
        edf.select(F.col("dst_orig").alias("original_id"))
    )
    if node_ids is not None:
        extra = spark.createDataFrame(
            [(str(n),) for n in node_ids], "original_id string"
        )
        nodes = nodes.unionByName(extra)
    idmap = dense_ids(nodes, "original_id")
    vertices = idmap.select("internal_id", "original_id")
    mapped = (
        edf.join(idmap.withColumnRenamed("original_id", "src_orig"), "src_orig")
        .withColumnRenamed("internal_id", "src")
        .join(idmap.withColumnRenamed("original_id", "dst_orig"), "dst_orig")
        .withColumnRenamed("internal_id", "dst")
        .select("src", "dst", "weight")
    )
    mapped = aggregate_edges(orient_edges(mapped, orientation), aggregation)
    g = Graph(
        vertices.cache(),
        mapped.cache(),
        orientation=orientation,
        is_multigraph=aggregation in ("DEFAULT", "NONE"),
    )
    return g


def from_dense_edge_df(
    edges: DataFrame,
    *,
    n_vertices: int | None = None,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    orientation: str = NATURAL,
    aggregation: str = "DEFAULT",
) -> Graph:
    """Fast-path :func:`from_edge_df` for endpoint ids that are ALREADY
    dense longs in ``[0, n_vertices)``.

    Skips the sort-based id map and the two endpoint joins entirely —
    ``vertices`` is ``spark.range(n)`` with ``internal_id ==
    original_id``. Ids in ``[0, n)`` that never appear as an endpoint
    become isolated vertices (GDS parity: the id map covers the whole
    node space, ref core/.../core/loading/IdMap.java:49-114). When
    ``n_vertices`` is None it is derived with one max() aggregation.

    The caller asserts density; a stray id >= n_vertices would silently
    corrupt CSR bucket addressing, so sanity-check upstream when unsure
    (the slow path tolerates arbitrary ids).
    """
    e = edges.select(
        F.col(src).cast("long").alias("src"),
        F.col(dst).cast("long").alias("dst"),
        (F.col(weight).cast("double") if weight else F.lit(1.0)).alias(
            "weight"
        ),
    )
    if n_vertices is None:
        row = e.agg(
            F.max("src").alias("ms"), F.max("dst").alias("md")
        ).first()
        n_vertices = int(max(row["ms"] or -1, row["md"] or -1)) + 1
    vertices = (
        e.sparkSession.range(n_vertices)
        .select(
            F.col("id").alias("internal_id"),
            F.col("id").alias("original_id"),
        )
    )
    mapped = aggregate_edges(orient_edges(e, orientation), aggregation)
    g = Graph(
        vertices,
        mapped,
        orientation=orientation,
        is_multigraph=aggregation in ("DEFAULT", "NONE"),
    )
    g._node_count = n_vertices
    return g


def from_edge_df(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    orientation: str = NATURAL,
    aggregation: str = "DEFAULT",
) -> Graph:
    """Build a Graph from an arbitrary edge DataFrame whose endpoints are
    already (or will be mapped to) dense longs.

    If endpoint ids are not dense longs, they are id-mapped with
    :func:`dense_ids` (sorted assignment, deterministic).
    """
    e = edges.select(
        F.col(src).alias("src_orig"),
        F.col(dst).alias("dst_orig"),
        (F.col(weight).cast("double") if weight else F.lit(1.0)).alias("weight"),
    )
    nodes = e.select(F.col("src_orig").alias("original_id")).unionByName(
        e.select(F.col("dst_orig").alias("original_id"))
    )
    # identity fast path: integer endpoint ids that are ALREADY dense
    # [0, n) need no id map at all — skip the sort-based assignment AND
    # the two endpoint joins (the detection agg rides on the distinct the
    # id map would compute anyway). Ids stay equal to the originals, the
    # same invariant the sorted map gives for a dense input.
    if isinstance(e.schema["src_orig"].dataType, _INTEGRAL_TYPES) and \
            isinstance(e.schema["dst_orig"].dataType, _INTEGRAL_TYPES):
        d = nodes.distinct().cache()
        lo, hi, cnt = d.agg(
            F.min("original_id"), F.max("original_id"), F.count(F.lit(1))
        ).collect()[0]
        if cnt and lo == 0 and hi == cnt - 1:
            vertices = d.select(
                F.col("original_id").cast("long").alias("internal_id"),
                F.col("original_id").cast("long").alias("original_id"),
            )
            mapped = e.select(
                F.col("src_orig").cast("long").alias("src"),
                F.col("dst_orig").cast("long").alias("dst"),
                "weight",
            )
            mapped = aggregate_edges(
                orient_edges(mapped, orientation), aggregation
            )
            return Graph(
                vertices,
                mapped,
                orientation=orientation,
                is_multigraph=aggregation in ("DEFAULT", "NONE"),
            )
        d.unpersist()
    idmap = dense_ids(nodes, "original_id").cache()
    vertices = idmap.select("internal_id", "original_id")
    # the id map is usually orders of magnitude smaller than the edge
    # table (nodes vs edges): broadcast it below a row bound instead of
    # shuffling the full edge table twice for the two endpoint joins.
    # The count also warms the cache the first downstream action needs.
    bcast_max = int(os.environ.get("GDS_IDMAP_BROADCAST_MAX_ROWS", 4_000_000))
    m = idmap
    if idmap.count() <= bcast_max:
        m = F.broadcast(idmap)
    mapped = (
        e.join(m.withColumnRenamed("original_id", "src_orig"), "src_orig")
        .withColumnRenamed("internal_id", "src")
        .join(m.withColumnRenamed("original_id", "dst_orig"), "dst_orig")
        .withColumnRenamed("internal_id", "dst")
        .select("src", "dst", "weight")
    )
    mapped = aggregate_edges(orient_edges(mapped, orientation), aggregation)
    return Graph(
        vertices,
        mapped,
        orientation=orientation,
        is_multigraph=aggregation in ("DEFAULT", "NONE"),
    )
