"""graph_data_science_spark — a from-scratch PySpark-native link-graph
analytics engine with the query/data-processing capabilities of the Neo4j
Graph Data Science library (reference: /root/reference, studied for
*semantics only*; the execution design here is Spark-first: DataFrame plans
optimized by Catalyst, vectorized pandas/Arrow UDFs for the CSR superstep
kernel, shuffle-based message aggregation).

Layout
------
- ``graph``       : Graph/IdMap/orientation/aggregation (GDS data model, §1 of SURVEY.md)
- ``catalog``     : named graph catalog (gds.graph.create/list/drop family)
- ``plans``       : the Pregel-style superstep kernel (per-partition CSR blocks,
                    salted scatter/gather, checkpoint + lineage + resume)
- ``operators``   : algorithm catalog (pagerank, wcc, labelprop, triangles, ...)
- ``sources``     : corpus synthesis + import-edge extraction (the input_hint path)
- ``functions``   : scalar/link-prediction/similarity functions
- ``streaming``   : incremental (seeded) re-runs
"""

__version__ = "0.1.0"
