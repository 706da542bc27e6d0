"""Graph catalog — the gds.graph.* lifecycle surface.

Mirrors GraphStoreCatalog semantics (ref: core/.../core/loading/
GraphStoreCatalog.java:39-148 — get/set/exists/remove/degreeDistribution;
proc/catalog/GraphCreateProc, GraphListProc, GraphExistsProc,
GraphDropProc, GraphStreamNodePropertiesProc, GraphWriteNodePropertiesProc,
GraphRemoveNodePropertiesProc, GraphDeleteRelationshipProc,
GraphStoreExportProc, beta create.subgraph / export.csv).

Spark-first: a session-scoped dict of name → Graph; "write" targets
parquet directories locally and the identical ``writeTo`` API targets
Iceberg tables on a real cluster. The whole GDS Cypher-expression
subgraph-filter subsystem (beta/filter/expression/ExpressionParser.java)
collapses to Catalyst via ``F.expr`` — predicates are ANSI SQL over
vertex/edge columns.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from .graph import Graph, aggregate_edges, from_edge_df, orient_edges


@dataclass
class GraphCatalog:
    """Per-session named graph store."""

    _graphs: dict[str, Graph] = field(default_factory=dict)

    # -- lifecycle (gds.graph.create / list / exists / drop) -------------
    def create(
        self,
        name: str,
        edges: DataFrame,
        *,
        src: str = "src",
        dst: str = "dst",
        weight: str | None = None,
        orientation: str = "NATURAL",
        aggregation: str = "DEFAULT",
        fail_if_exists: bool = True,
    ) -> Graph:
        if fail_if_exists and name in self._graphs:
            raise ValueError(f"graph '{name}' already exists")
        g = from_edge_df(
            edges,
            src=src,
            dst=dst,
            weight=weight,
            orientation=orientation,
            aggregation=aggregation,
        )
        g.vertices = g.vertices.cache()
        g.edges = g.edges.cache()
        self._graphs[name] = g
        return g

    def create_cypher(
        self,
        name: str,
        spark: SparkSession,
        node_query: str,
        relationship_query: str,
        **kwargs,
    ) -> Graph:
        """gds.graph.create.cypher equivalent: arbitrary SQL for nodes and
        relationships (ref: GraphCreateFromCypherConfig.java:50-60) —
        Spark SQL *is* the query engine here."""
        rels = spark.sql(relationship_query)
        g = self.create(name, rels, **kwargs)
        nodes = spark.sql(node_query)
        extra_cols = [c for c in nodes.columns if c != "id"]
        if extra_cols:
            mapped = g.vertices.join(
                nodes.withColumnRenamed("id", "original_id"),
                "original_id",
                "left",
            )
            g.vertices = mapped.cache()
        return g

    def get(self, name: str) -> Graph:
        if name not in self._graphs:
            raise KeyError(f"graph '{name}' not found")
        return self._graphs[name]

    def exists(self, name: str) -> bool:
        return name in self._graphs

    def list(self) -> list[dict]:
        return [
            {
                "graphName": n,
                "nodeCount": g.node_count(),
                "relationshipCount": g.relationship_count(),
                "orientation": g.orientation,
            }
            for n, g in self._graphs.items()
        ]

    def drop(self, name: str) -> None:
        g = self._graphs.pop(name, None)
        if g is None:
            raise KeyError(f"graph '{name}' not found")
        for df in (g.vertices, g.edges):
            try:
                df.unpersist()
            except Exception:  # noqa: BLE001 — already unpersisted is fine
                pass

    # -- property ops ----------------------------------------------------
    def stream_node_properties(self, name: str, properties: list[str]) -> DataFrame:
        g = self.get(name)
        return g.vertices.select("internal_id", "original_id", *properties)

    def mutate_node_property(
        self, name: str, property_name: str, values: DataFrame
    ) -> Graph:
        """values: (internal_id, <anything>) — last column becomes the prop."""
        g = self.get(name)
        self._graphs[name] = g.with_vertex_column(property_name, values)
        return self._graphs[name]

    def remove_node_property(self, name: str, property_name: str) -> Graph:
        g = self.get(name)
        g.vertices = g.vertices.drop(property_name)
        return g

    def write_node_properties(
        self, name: str, properties: list[str], path: str
    ) -> None:
        """Persist vertex properties (parquet dir locally; point ``path`` at
        an Iceberg table + use .writeTo on a cluster)."""
        self.stream_node_properties(name, properties).write.mode(
            "overwrite"
        ).parquet(path)

    def mutate_relationships(
        self, name: str, relationship_type: str, rels: DataFrame
    ) -> Graph:
        """Relationship mutate-mode (gds.nodeSimilarity.mutate /
        gds.beta.knn.mutate / gds.alpha.collapsePath.mutate): add a typed
        relationship set to the cataloged graph. ``rels``: (src, dst
        [, weight])."""
        g = self.get(name)
        self._graphs[name] = g.with_relationships(rels, relationship_type)
        return self._graphs[name]

    def stream_relationship_properties(
        self, name: str, properties: list[str]
    ) -> DataFrame:
        """gds.graph.streamRelationshipProperty(ies): (src, dst,
        relationshipType, <properties...>)."""
        g = self.get(name)
        e = g.edges
        rel_type = (
            F.col("__type") if "__type" in e.columns
            else F.lit(None).cast("string")
        )
        return e.select(
            "src", "dst", rel_type.alias("relationshipType"), *properties
        )

    def write_relationship(
        self,
        name: str,
        relationship_type: str | None,
        path: str,
        *,
        property_name: str | None = None,
    ) -> int:
        """gds.graph.writeRelationship: persist one relationship type (and
        optionally one property) — parquet dir locally, Iceberg table via
        .writeTo on a cluster. Returns relationships written."""
        g = self.get(name)
        e = g.edges
        if relationship_type is not None:
            if "__type" not in e.columns:
                raise KeyError(
                    f"graph '{name}' has no typed relationships"
                )
            e = e.filter(F.col("__type") == relationship_type)
        cols = ["src", "dst"] + ([property_name] if property_name else [])
        out = e.select(*cols)
        out.write.mode("overwrite").parquet(path)
        return out.count()

    def delete_relationships(self, name: str, predicate: str) -> Graph:
        """Drop edges matching a SQL predicate (gds.graph.deleteRelationships
        generalized: GDS drops by type; types here are predicate-encoded)."""
        g = self.get(name)
        # keep rows where the predicate is FALSE **or NULL** — a bare
        # `~expr` drops NULL-evaluating rows too (SQL three-valued logic),
        # silently deleting e.g. untyped edges under `__type = 'X'`
        g.edges = g.edges.filter(
            ~F.coalesce(F.expr(predicate), F.lit(False))
        )
        return g

    # -- subgraph / export ----------------------------------------------
    def create_subgraph(
        self,
        name: str,
        from_graph: str,
        *,
        node_filter: str = "true",
        relationship_filter: str = "true",
    ) -> Graph:
        """gds.beta.graph.create.subgraph: Catalyst evaluates the filter
        expressions (the reference's whole openCypher expression subsystem
        maps to F.expr)."""
        g = self.get(from_graph)
        keep = g.vertices.filter(F.expr(node_filter)).select("internal_id")
        e = (
            g.edges.filter(F.expr(relationship_filter))
            .join(keep.withColumnRenamed("internal_id", "src"), "src")
            .join(keep.withColumnRenamed("internal_id", "dst"), "dst")
        )
        sub = Graph(
            g.vertices.join(keep, "internal_id"),
            e,
            orientation=g.orientation,
            is_multigraph=g.is_multigraph,
        )
        self._graphs[name] = sub
        return sub

    def export(self, name: str, path: str, *, fmt: str = "parquet") -> None:
        """gds.graph.export / gds.beta.graph.export.csv."""
        g = self.get(name)
        writer_v = g.vertices.write.mode("overwrite")
        writer_e = g.edges.write.mode("overwrite")
        if fmt == "csv":
            writer_v.option("header", True).csv(f"{path}/nodes")
            writer_e.option("header", True).csv(f"{path}/relationships")
        else:
            writer_v.parquet(f"{path}/nodes")
            writer_e.parquet(f"{path}/relationships")

    @staticmethod
    def import_from(spark: SparkSession, path: str, *, fmt: str = "parquet") -> Graph:
        """CSV/parquet re-import (ref: CsvToGraphStoreExporter round-trip)."""
        if fmt == "csv":
            v = spark.read.option("header", True).option(
                "inferSchema", True
            ).csv(f"{path}/nodes")
            e = spark.read.option("header", True).option(
                "inferSchema", True
            ).csv(f"{path}/relationships")
        else:
            v = spark.read.parquet(f"{path}/nodes")
            e = spark.read.parquet(f"{path}/relationships")
        return Graph(v, e)

    # -- model catalog (gds.beta.model.{list,exists,drop},
    #    gds.alpha.model.{load,store,publish,delete}) ---------------------
    _models: dict = None  # type: ignore[assignment]

    def _model_store(self) -> dict:
        if self._models is None:
            self._models = {}
        return self._models

    def model_store(self, name: str, model: dict) -> None:
        """Register a trained-model artifact (metadata + payload paths)."""
        self._model_store()[name] = dict(model)

    def model_exists(self, name: str) -> bool:
        return name in self._model_store()

    def model_list(self) -> list[dict]:
        return [
            {"modelName": n, **{k: v for k, v in m.items() if k != "payload"}}
            for n, m in self._model_store().items()
        ]

    def model_drop(self, name: str) -> None:
        if name not in self._model_store():
            raise KeyError(f"model '{name}' not found")
        del self._model_store()[name]

    def model_publish(self, name: str) -> dict:
        """gds.alpha.model.publish: mark a model shared (ref ModelCatalog
        multi-tenant visibility; single-tenant here, so publish = flag)."""
        store = self._model_store()
        if name not in store:
            raise KeyError(f"model '{name}' not found")
        store[name]["shared"] = True
        return {k: v for k, v in store[name].items() if k != "payload"}

    def model_save(self, name: str, path: str) -> None:
        """gds.alpha.model.store: persist the model artifact to disk
        (JSON metadata + payload; numpy arrays serialized as lists)."""
        import json

        import numpy as np

        store = self._model_store()
        if name not in store:
            raise KeyError(f"model '{name}' not found")

        def default(o):
            if isinstance(o, np.ndarray):
                return {"__nd__": o.tolist(), "dtype": str(o.dtype)}
            if isinstance(o, (np.integer, np.floating)):
                return o.item()
            raise TypeError(type(o).__name__)

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = f"{path}.tmp"
        with open(tmp, "w") as fh:
            json.dump({"modelName": name, **store[name]}, fh, default=default)
        os.replace(tmp, path)

    def model_load(self, name: str, path: str) -> dict:
        """gds.alpha.model.load: restore a stored model into the catalog."""
        import json

        import numpy as np

        def hook(d):
            if "__nd__" in d:
                return np.asarray(d["__nd__"], dtype=d["dtype"])
            return d

        with open(path) as fh:
            m = json.load(fh, object_hook=hook)
        m.pop("modelName", None)
        self._model_store()[name] = m
        return m

    def degree_distribution(self, name: str) -> dict:
        """ref: GraphStoreCatalog.getDegreeDistribution:112 — percentile
        summary of out-degrees."""
        g = self.get(name)
        deg = g.edges.groupBy("src").count()
        row = deg.agg(
            F.min("count").alias("min"),
            F.max("count").alias("max"),
            F.mean("count").alias("mean"),
            F.expr("percentile_approx(count, 0.5)").alias("p50"),
            F.expr("percentile_approx(count, 0.75)").alias("p75"),
            F.expr("percentile_approx(count, 0.9)").alias("p90"),
            F.expr("percentile_approx(count, 0.99)").alias("p99"),
        ).collect()[0]
        return row.asDict()
