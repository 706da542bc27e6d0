"""Web link-graph pipeline end-to-end: crawl rows -> clean graph -> ranking.

Synthesizes a deterministic messy crawl table (uppercase schemes, default
ports, tracking params, fragments), canonicalizes URLs, collapses to the
host graph, and runs the link-analysis suite: SALSA hubs/authorities,
anchor-text aggregation, token heavy hitters, Leiden communities
(connected by construction), and an RWR sample for the expensive
follow-up analyses.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graph_data_science_spark.graph import from_edge_df
from graph_data_science_spark.operators.graphsample import rwr_sample
from graph_data_science_spark.operators.leiden import leiden
from graph_data_science_spark.operators.salsa import salsa
from graph_data_science_spark.pipeline.heavyhitters import heavy_hitters
from graph_data_science_spark.pipeline.webgraph import (
    anchor_topk,
    host_graph,
    normalize_url,
)
from graph_data_science_spark.session import get_spark

N_PAGES = 30_000

spark = get_spark("example-web-graph", master="local[8]",
                  shuffle_partitions=16)
spark.sparkContext.setLogLevel("ERROR")

# deterministic messy crawl: page d -> pages (d*7+j) % N, j in 1..3
d = F.col("id")


def messy(col):
    return F.concat(
        F.lit("HTTP://Host"), (col % 97).cast("string"),
        F.lit(".Example.COM"),
        F.when(col % 5 == 0, F.lit(":80")).otherwise(F.lit("")),
        F.lit("/page/"), col.cast("string"),
        F.when(col % 3 == 0, F.lit("?utm_source=feed&q=1")).otherwise(
            F.lit("")),
        F.when(col % 7 == 0, F.lit("#top")).otherwise(F.lit("")),
    )


links = (
    spark.range(N_PAGES)
    .select("id", F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("j"))
    .select(
        messy(d).alias("src_url"),
        messy((d * 7 + F.col("j")) % N_PAGES).alias("dst_url"),
        F.concat(F.lit("anchor"), ((d + F.col("j")) % 11).cast("string"))
        .alias("anchor"),
    )
)

links = normalize_url(links, "src_url", "src_norm")
links = normalize_url(links, "dst_url", "dst_norm")
print("sample canonical URL:", links.select("src_norm").first()[0])

hosts = host_graph(links, "src_norm", "dst_norm")
print(f"host graph: {hosts.count():,} host-level edges")

g = from_edge_df(hosts, src="src_host", dst="dst_host", weight="weight")

res = salsa(g, max_iterations=20)
top_auth = (
    res.scores.join(g.vertices, "internal_id")
    .orderBy(F.desc("auth")).select("original_id", "auth").limit(5)
)
print("top authorities:")
top_auth.show(truncate=False)

anchors = anchor_topk(links, k=3, dst_col="dst_norm")
print("anchor texts for one target:")
anchors.orderBy("dst", "rank").limit(3).show(truncate=False)

hh = heavy_hitters(
    links.select(F.col("anchor").alias("item")), "item", k=5, exact=False
)
print("heavy-hitter anchors (Misra-Gries):")
hh.show(truncate=False)

communities = leiden(g)
n_comm = communities.assignment.select("community").distinct().count()
print(f"leiden: {n_comm} connected communities, "
      f"Q = {communities.modularity:.4f}")

sample = rwr_sample(g, sampling_ratio=0.3)
print(f"RWR sample: {sample.vertices.count()} of {g.node_count()} hosts, "
      f"{sample.edges.count()} induced edges")
