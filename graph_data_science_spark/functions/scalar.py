"""gds.util.* scalar functions (ref: proc/common/.../functions/
AsNodeFunc.java, NodePropertyFunc.java, one-liners in gds.util)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .. import __version__
from ..graph import Graph


def version() -> str:
    """gds.version (ref: VersionFunc.java)."""
    return __version__


def nan() -> Column:
    return F.lit(float("nan"))


def infinity() -> Column:
    return F.lit(float("inf"))


def is_finite(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return ~F.isnan(c) & (F.abs(c) != F.lit(float("inf")))


def is_infinite(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.abs(c) == F.lit(float("inf"))


def as_node(graph: Graph, ids: DataFrame, id_col: str = "internal_id") -> DataFrame:
    """gds.util.asNode: internal id -> full vertex row."""
    return ids.join(graph.vertices, ids[id_col] == graph.vertices.internal_id)


def node_property(
    graph: Graph, property_name: str, ids: DataFrame | None = None
) -> DataFrame:
    """gds.util.nodeProperty: (internal_id, <property>)."""
    out = graph.vertices.select("internal_id", property_name)
    if ids is not None:
        out = out.join(ids.select("internal_id"), "internal_id")
    return out
