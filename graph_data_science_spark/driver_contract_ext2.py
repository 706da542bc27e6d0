"""Contract registry extension 2 — DAG family (topological sort, longest
path, Bellman-Ford), conductance, and link-graph web operators.

Derived graphs (all arithmetic-only so Spark and DuckDB compute identical
structures):

- ``stride DAG`` — two arithmetic edge families over supplier keys
  1..n: s → s + stride + (s % 3) and s → s + stride + 5 + (s % 7)
  (stride = max(1, ⌊n/8⌋), edges kept while dst ≤ n). Strictly
  increasing ⇒ acyclic; out-degree ≤ 2, in-branching ⇒ the longest-path
  MAX is exercised; depth ≈ 8-9 ⇒ the layered peel stays cheap.
- ``signed 2-hop DAG`` — the shortest-path customer→order→supplier DAG
  with weights shifted NEGATIVE: w1 = (o_orderkey % 97)/10 − 4.0,
  w2 = (l_suppkey % 53)/10 − 2.0 (Bellman-Ford exactness on signed
  costs; no cycles, so distances stay well-defined).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .driver_contract import (
    SQL_EDGES_SP,
    SQL_NODES_SP,
    _graph_sp,
    _lineitem,
)
from .driver_contract_ext import (
    CUST_OFFSET,
    ORDER_OFFSET,
    _mod_header,
    edges_mod,
)
from .graph import from_edge_df

# ---------------------------------------------------------------------------
# stride DAG
# ---------------------------------------------------------------------------

SQL_STRIDE = (
    "GREATEST(1, CAST(FLOOR((SELECT COUNT(*) FROM supplier) / 8.0) "
    "AS BIGINT))"
)

SQL_DAG2_EDGES = f"""
SELECT src, dst, weight FROM (
  SELECT s_suppkey AS src,
         s_suppkey + {SQL_STRIDE} + (s_suppkey % 3) AS dst,
         1.0 + (s_suppkey % 5) / 10.0 AS weight
  FROM supplier
  UNION ALL
  SELECT s_suppkey AS src,
         s_suppkey + {SQL_STRIDE} + 5 + (s_suppkey % 7) AS dst,
         1.0 + (s_suppkey % 11) / 10.0 AS weight
  FROM supplier)
WHERE dst <= (SELECT COUNT(*) FROM supplier)
"""


def edges_dag2(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = supp.count()
    stride = max(1, n // 8)
    s = F.col("s_suppkey")
    e1 = supp.select(
        s.alias("src"),
        (s + stride + F.pmod(s, F.lit(3))).alias("dst"),
        (1.0 + F.pmod(s, F.lit(5)) / 10.0).alias("weight"),
    )
    e2 = supp.select(
        s.alias("src"),
        (s + stride + 5 + F.pmod(s, F.lit(7))).alias("dst"),
        (1.0 + F.pmod(s, F.lit(11)) / 10.0).alias("weight"),
    )
    return e1.unionByName(e2).filter(F.col("dst") <= n)


def _graph_dag2(spark: SparkSession, sf_dir: str):
    return from_edge_df(edges_dag2(spark, sf_dir), weight="weight")


SQL_DAG2_CTES = f"""
dag AS MATERIALIZED ({SQL_DAG2_EDGES}),
nodes AS MATERIALIZED (SELECT DISTINCT id FROM
  (SELECT src AS id FROM dag UNION ALL SELECT dst FROM dag)),
roots AS (SELECT id FROM nodes
          WHERE id NOT IN (SELECT dst FROM dag))
"""


def _dag2_to_original(df: DataFrame, g) -> DataFrame:
    return (
        df.join(g.vertices, "internal_id")
        .select(F.col("original_id").cast("long").alias("id"),
                *[c for c in df.columns if c != "internal_id"])
    )


def q_topological_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dag import topological_sort

    g = _graph_dag2(spark, sf_dir)
    return _dag2_to_original(topological_sort(g), g)


def sql_topological_sort() -> str:
    # layer(v) = longest hop-path from any root: recursive path
    # enumeration (out-degree <= 2, depth <= ~9 -> bounded), MAX(d).
    return f"""
WITH RECURSIVE
{SQL_DAG2_CTES},
reach AS (
  SELECT id, 0 AS d FROM roots
  UNION ALL
  SELECT e.dst AS id, r.d + 1 AS d FROM reach r JOIN dag e ON e.src = r.id)
SELECT id, CAST(MAX(d) AS INT) AS layer FROM reach GROUP BY id
"""


def q_dag_longest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dag import dag_longest_path

    g = _graph_dag2(spark, sf_dir)
    out = dag_longest_path(g).select(
        "internal_id", F.round("distance", 6).alias("distance")
    )
    return _dag2_to_original(out, g)


def sql_dag_longest_path() -> str:
    return f"""
WITH RECURSIVE
{SQL_DAG2_CTES},
reach AS (
  SELECT id, CAST(0 AS DOUBLE) AS d FROM roots
  UNION ALL
  SELECT e.dst AS id, r.d + e.weight AS d
  FROM reach r JOIN dag e ON e.src = r.id)
SELECT id, ROUND(MAX(d), 6) AS distance FROM reach GROUP BY id
"""


def q_topo_cyclic_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topological sort on the CYCLIC mod graph: peeled layers must be a
    valid, exact longest-path layering of the acyclic prefix, and the
    excluded set must be precisely the non-peelable closure (every
    excluded node keeps an in-edge from another excluded node). All four
    violation counts computed Spark-side over the actual output."""
    from .operators.dag import topological_sort

    g = from_edge_df(edges_mod(spark, sf_dir))
    m: dict = {}
    out = topological_sort(g, metrics_out=m).localCheckpoint(eager=True)
    e = g.edges.select("src", "dst").distinct()
    lsrc = out.select(F.col("internal_id").alias("src"),
                      F.col("layer").alias("l_src"))
    ldst = out.select(F.col("internal_id").alias("dst"),
                      F.col("layer").alias("l_dst"))
    both = e.join(lsrc, "src").join(ldst, "dst")
    v_order = both.filter(F.col("l_src") >= F.col("l_dst")).count()
    # exact layer: layer(v) == coalesce(1 + max(in-layer among output), 0)
    expected = (
        out.join(
            both.groupBy(F.col("dst").alias("internal_id"))
            .agg((F.max("l_src") + 1).alias("exp")),
            "internal_id", "left",
        )
        .filter(F.col("layer") != F.coalesce(F.col("exp"), F.lit(0)))
        .count()
    )
    # no output node may have an in-edge from an excluded node
    excluded = (
        g.vertices.select(F.col("internal_id"))
        .join(out.select("internal_id"), "internal_id", "left_anti")
        .localCheckpoint(eager=True)
    )
    v_in_from_excl = (
        e.join(excluded.select(F.col("internal_id").alias("src")), "src")
        .join(out.select(F.col("internal_id").alias("dst")), "dst")
        .count()
    )
    # every excluded node keeps an in-edge from an excluded node
    v_excl_peelable = (
        excluded.select(F.col("internal_id").alias("dst"))
        .join(
            e.join(
                excluded.select(F.col("internal_id").alias("src")), "src"
            ).select("dst").distinct(),
            "dst", "left_anti",
        )
        .count()
    )
    n_out = out.count()
    return spark.createDataFrame(
        [(n_out + m["excluded_cyclic"], v_order, expected,
          v_in_from_excl, v_excl_peelable)],
        "nodes_total long, order_violations long, layer_violations long, "
        "edges_excluded_to_output long, excluded_without_cyclic_in long",
    )


def sql_topo_cyclic_validity() -> str:
    return f"""
WITH
{_mod_header()}
SELECT CAST(COUNT(*) AS BIGINT) AS nodes_total,
       CAST(0 AS BIGINT) AS order_violations,
       CAST(0 AS BIGINT) AS layer_violations,
       CAST(0 AS BIGINT) AS edges_excluded_to_output,
       CAST(0 AS BIGINT) AS excluded_without_cyclic_in
FROM nodes
"""


# ---------------------------------------------------------------------------
# Bellman-Ford on the signed 2-hop DAG
# ---------------------------------------------------------------------------

SQL_SIGNED_DAG = f"""
SELECT o_custkey + {CUST_OFFSET} AS src, o_orderkey + {ORDER_OFFSET} AS dst,
       (o_orderkey % 97) / 10.0 - 4.0 AS weight
FROM orders
UNION ALL
SELECT DISTINCT l_orderkey + {ORDER_OFFSET} AS src, l_suppkey AS dst,
       (l_suppkey % 53) / 10.0 - 2.0 AS weight
FROM lineitem
"""


def edges_signed_dag(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = _lineitem(spark, sf_dir)
    e1 = orders.select(
        (F.col("o_custkey") + CUST_OFFSET).alias("src"),
        (F.col("o_orderkey") + ORDER_OFFSET).alias("dst"),
        (F.pmod(F.col("o_orderkey"), F.lit(97)) / 10.0 - 4.0).alias(
            "weight"
        ),
    )
    e2 = (
        li.select(
            (F.col("l_orderkey") + ORDER_OFFSET).alias("src"),
            F.col("l_suppkey").alias("dst"),
        )
        .distinct()
        .select(
            "src", "dst",
            (F.pmod(F.col("dst"), F.lit(53)) / 10.0 - 2.0).alias("weight"),
        )
    )
    return e1.unionByName(e2)


def q_bellman_ford(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dag import bellman_ford

    g = from_edge_df(edges_signed_dag(spark, sf_dir), weight="weight")
    src_orig = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .agg(F.min("o_custkey"))
        .collect()[0][0]
        + CUST_OFFSET
    )
    src = int(
        g.vertices.filter(
            F.col("original_id").cast("long") == src_orig
        ).collect()[0]["internal_id"]
    )
    m: dict = {}
    dist = bellman_ford(g, src, metrics_out=m)
    assert m["negative_cycle"] is False
    return (
        dist.join(g.vertices, "internal_id")
        .select(
            F.col("original_id").cast("long").alias("target"),
            F.round("distance", 6).alias("distance"),
        )
    )


def sql_bellman_ford() -> str:
    return f"""
WITH dag AS MATERIALIZED ({SQL_SIGNED_DAG}),
c0 AS (SELECT MIN(src) AS s FROM dag WHERE src >= {CUST_OFFSET}),
hop1 AS (SELECT d.dst AS o, d.weight AS w1 FROM dag d, c0
         WHERE d.src = c0.s),
t0 AS (SELECT s AS target, CAST(0 AS DOUBLE) AS d FROM c0),
t1 AS (SELECT o AS target, w1 AS d FROM hop1),
t2 AS (SELECT d.dst AS target, MIN(h.w1 + d.weight) AS d
       FROM hop1 h JOIN dag d ON d.src = h.o GROUP BY d.dst)
SELECT target, ROUND(d, 6) AS distance
FROM (SELECT * FROM t0 UNION ALL SELECT * FROM t1 UNION ALL
      SELECT * FROM t2)
"""


# ---------------------------------------------------------------------------
# Conductance on the supplier→part graph, communities = original id % 7
# ---------------------------------------------------------------------------


def q_conductance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.conductance import conductance

    g = _graph_sp(spark, sf_dir)
    comm = g.vertices.select(
        "internal_id",
        F.pmod(F.col("original_id").cast("long"), F.lit(7)).alias(
            "community"
        ),
    )
    out = conductance(g, comm, broadcast_communities=True)
    return out.select(
        "community", F.round("conductance", 9).alias("conductance")
    )


def sql_conductance() -> str:
    return f"""
WITH edges AS MATERIALIZED ({SQL_EDGES_SP}),
nodes AS ({SQL_NODES_SP}),
universe AS (SELECT DISTINCT id % 7 AS community FROM nodes),
tagged AS (SELECT src % 7 AS c_src, dst % 7 AS c_dst FROM edges),
agg AS (SELECT c_src AS community,
        CAST(SUM(CASE WHEN c_src = c_dst THEN 1 ELSE 0 END) AS DOUBLE)
          AS w_int,
        CAST(SUM(CASE WHEN c_src != c_dst THEN 1 ELSE 0 END) AS DOUBLE)
          AS w_ext
        FROM tagged GROUP BY c_src)
SELECT u.community,
       ROUND(CASE WHEN COALESCE(w_int, 0) + COALESCE(w_ext, 0) > 0
             THEN w_ext / (w_int + w_ext)
             ELSE 0.0 END, 9) AS conductance
FROM universe u LEFT JOIN agg a ON a.community = u.community
"""


# ---------------------------------------------------------------------------
# Link-graph web operators: deterministic messy-URL corpus from documents
# ---------------------------------------------------------------------------
# messy URL of doc d: uppercase scheme/host, default port on d%5==0,
# trailing slash on d%4==0, tracking-polluted query by d%3, fragment on
# d%7==0 — every branch is doc_id arithmetic, so BOTH engines construct
# the same raw URL and the oracle derives the CANONICAL form
# independently (direct arithmetic, not a regex replay).

SQL_MESSY_URL = (
    "'HTTP://S' || (doc_id % 23) || '.EXAMPLE.com' || "
    "(CASE WHEN doc_id % 5 = 0 THEN ':80' ELSE '' END) || "
    "'/p/' || doc_id || "
    "(CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END) || "
    "(CASE WHEN doc_id % 3 = 0 THEN '?utm_source=x&b=2&a=1' "
    " WHEN doc_id % 3 = 1 THEN '?z=9&fbclid=abc&a=1' ELSE '' END) || "
    "(CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END)"
)

SQL_CANON_URL = (
    "'http://s' || (doc_id % 23) || '.example.com/p/' || doc_id || "
    "(CASE WHEN doc_id % 3 = 0 THEN '?a=1&b=2' "
    " WHEN doc_id % 3 = 1 THEN '?a=1&z=9' ELSE '' END)"
)


def _messy_url(d: F.Column) -> F.Column:
    return F.concat(
        F.lit("HTTP://S"), (d % 23).cast("string"), F.lit(".EXAMPLE.com"),
        F.when(d % 5 == 0, F.lit(":80")).otherwise(F.lit("")),
        F.lit("/p/"), d.cast("string"),
        F.when(d % 4 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(d % 3 == 0, F.lit("?utm_source=x&b=2&a=1"))
        .when(d % 3 == 1, F.lit("?z=9&fbclid=abc&a=1"))
        .otherwise(F.lit("")),
        F.when(d % 7 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def q_normalize_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline.webgraph import normalize_url

    d = F.col("doc_id")
    df = _docs(spark, sf_dir).select("doc_id", _messy_url(d).alias("url"))
    return normalize_url(df, "url").select("doc_id", "url_norm")


def sql_normalize_url() -> str:
    return (
        f"SELECT doc_id, {SQL_CANON_URL} AS url_norm FROM documents"
    )


def _links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src_url, dst_url, anchor): doc d links to (d*7+j) % N, j in 1..3,
    anchor 'w<(src+dst) % 13>'. Messy src/dst URLs."""
    docs = _docs(spark, sf_dir)
    n = docs.count()
    d = F.col("doc_id")
    ex = docs.select(
        "doc_id", F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias(
            "j")
    ).select(
        "doc_id", F.pmod(d * 7 + F.col("j"), F.lit(n)).alias("dst_id")
    )
    return ex.select(
        _messy_url(F.col("doc_id")).alias("src_url"),
        _messy_url(F.col("dst_id")).alias("dst_url"),
        F.concat(
            F.lit("w"),
            F.pmod(F.col("doc_id") + F.col("dst_id"), F.lit(13)).cast(
                "string"),
        ).alias("anchor"),
    )


SQL_LINKS = """
SELECT doc_id AS src_id, (doc_id * 7 + j.j) % (SELECT COUNT(*) FROM
  documents) AS dst_id
FROM documents, (SELECT UNNEST([1, 2, 3]) AS j) j
"""


def q_host_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline.webgraph import host_graph

    return host_graph(_links(spark, sf_dir))


def sql_host_graph() -> str:
    return f"""
WITH links AS MATERIALIZED ({SQL_LINKS}),
hosts AS (SELECT 's' || (src_id % 23) || '.example.com' AS src_host,
                 's' || (dst_id % 23) || '.example.com' AS dst_host
          FROM links)
SELECT src_host, dst_host, CAST(COUNT(*) AS BIGINT) AS weight
FROM hosts WHERE src_host != dst_host GROUP BY src_host, dst_host
"""


def q_anchor_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline.webgraph import anchor_topk

    return anchor_topk(_links(spark, sf_dir), k=2)


def sql_anchor_topk() -> str:
    # dst key is the raw (messy) dst_url the links carry
    messy_dst = SQL_MESSY_URL.replace("doc_id", "dst_id")
    return f"""
WITH links AS MATERIALIZED ({SQL_LINKS}),
counted AS (SELECT {messy_dst} AS dst,
                   'w' || ((src_id + dst_id) % 13) AS anchor,
                   CAST(COUNT(*) AS BIGINT) AS n_links
            FROM links GROUP BY 1, 2),
ranked AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY dst
             ORDER BY n_links DESC, anchor ASC) AS INT) AS rank
           FROM counted)
SELECT dst, anchor, n_links, rank FROM ranked WHERE rank <= 2
"""


# ---------------------------------------------------------------------------
# RWR graph sampling (exact oracle: portable-hash walk replay, one batch)
# ---------------------------------------------------------------------------

RWR_WALKS = 64
RWR_LEN = 6
RWR_GATE = 100_000  # restart_probability 0.1 in millionths


def q_rwr_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-batch RWR sample with the portable md5 hash: every restart
    decision and neighbor pick is a pure function of (walk_id, step), so
    DuckDB replays all 64 walks and the sampled node set matches exactly.
    Ids pinned to original suppkeys via the dense fast path."""
    from .driver_contract_ext import _n_supp
    from .graph import from_dense_edge_df
    from .operators.graphsample import rwr_sample_nodes

    e = edges_mod(spark, sf_dir)
    ns = _n_supp(spark, sf_dir)
    g = from_dense_edge_df(e, n_vertices=ns + 1)
    nodes = rwr_sample_nodes(
        g,
        sampling_ratio=1.0,  # capped by max_batches: sample = batch 0
        restart_probability=0.1,
        start_nodes=[1],
        walks_per_batch=RWR_WALKS,
        walk_length=RWR_LEN,
        max_batches=1,
        base_hash="md5",
    )
    return nodes.select(F.col("internal_id").alias("id"))


def sql_rwr_sample() -> str:
    return f"""
WITH RECURSIVE
{_mod_header()},
nbrs AS MATERIALIZED (
  SELECT src, dst,
         ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS rk
  FROM edges),
deg AS MATERIALIZED (SELECT src, COUNT(*) AS d FROM nbrs GROUP BY src),
starts AS (SELECT 1 * {RWR_WALKS} + r.rep AS walk_id, 1 AS start
           FROM UNNEST(range(0, {RWR_WALKS})) AS r(rep)),
walk(walk_id, start, step, cur) AS (
  SELECT walk_id, start, 0, start FROM starts
  UNION ALL
  SELECT w.walk_id, w.start, w.step + 1,
         CASE WHEN ('0x' || substr(md5(w.walk_id::VARCHAR || '|' ||
                    w.step::VARCHAR || '|42|r'), 1, 15))::BIGINT
                   % 1000000 < {RWR_GATE}
                   OR d.d IS NULL
              THEN w.start ELSE n.dst END
  FROM walk w
  LEFT JOIN deg d ON d.src = w.cur
  LEFT JOIN nbrs n ON n.src = w.cur
   AND n.rk = ('0x' || substr(md5(w.walk_id::VARCHAR || '|' ||
               w.step::VARCHAR || '|42|n'), 1, 15))::BIGINT % d.d
  WHERE w.step < {RWR_LEN}
)
SELECT DISTINCT cur AS id FROM walk
"""


# ---------------------------------------------------------------------------
# Leiden (schedule-dependent assignment -> validity oracle: totality +
# the Leiden guarantee itself, connectivity of every community)
# ---------------------------------------------------------------------------


def q_leiden_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leiden invariants computed over the actual output: every node in
    exactly one community, ZERO internally-disconnected communities (the
    guarantee that distinguishes Leiden from Louvain), and positive
    modularity on the supplier→part graph."""
    from .operators.leiden import _refine_connected, leiden
    from .operators.louvain import _sym_edges

    g = _graph_sp(spark, sf_dir)
    res = leiden(g)
    assign = res.assignment.localCheckpoint(eager=True)
    totals = assign.agg(
        F.count(F.lit(1)).alias("nodes_assigned"),
        (F.count(F.lit(1)) - F.countDistinct("internal_id")).alias(
            "duplicate_assignments"
        ),
    ).collect()[0]
    refined = _refine_connected(
        g.vertices.select(
            "internal_id", F.col("internal_id").alias("original_id")
        ),
        _sym_edges(g),
        assign,
    )
    disconnected = (
        assign.join(refined, "internal_id")
        .groupBy("community")
        .agg(F.countDistinct("refined").alias("n_parts"))
        .filter(F.col("n_parts") > 1)
        .count()
    )
    return spark.createDataFrame(
        [(
            int(totals["nodes_assigned"]),
            int(totals["duplicate_assignments"]),
            int(disconnected),
            bool(res.modularity > 0.0),
        )],
        "nodes_assigned long, duplicate_assignments long, "
        "disconnected_communities long, q_positive boolean",
    )


def sql_leiden_validity() -> str:
    return f"""
WITH edges AS MATERIALIZED ({SQL_EDGES_SP}),
nodes AS (SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges)
SELECT CAST(COUNT(*) AS BIGINT) AS nodes_assigned,
       CAST(0 AS BIGINT) AS duplicate_assignments,
       CAST(0 AS BIGINT) AS disconnected_communities,
       TRUE AS q_positive
FROM nodes
"""


# ---------------------------------------------------------------------------
# Steiner tree on the 2-hop DAG (exact: tree = union of predecessor-tree
# paths, replayed with the same min-cost/min-id pick as sql_dijkstra_path)
# ---------------------------------------------------------------------------


def q_steiner_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .driver_contract_ext import _graph_dag
    from .operators.steiner import steiner_tree

    g = _graph_dag(spark, sf_dir)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = _lineitem(spark, sf_dir)
    c0 = int(orders.agg(F.min("o_custkey")).collect()[0][0])
    targets = [
        int(r["l_suppkey"])
        for r in orders.filter(F.col("o_custkey") == c0)
        .select(F.col("o_orderkey").alias("l_orderkey"))
        .join(li.select("l_orderkey", "l_suppkey"), "l_orderkey")
        .select("l_suppkey")
        .distinct()
        .orderBy("l_suppkey")
        .limit(3)
        .collect()
    ]
    idmap = {
        int(r["original_id"]): int(r["internal_id"])
        for r in g.vertices.filter(
            F.col("original_id")
            .cast("long")
            .isin([c0 + CUST_OFFSET] + targets)
        ).collect()
    }
    tree = steiner_tree(
        g, idmap[c0 + CUST_OFFSET], [idmap[t] for t in targets]
    )
    vm = g.vertices.select(
        F.col("internal_id"), F.col("original_id").cast("long").alias("id")
    )
    pm = g.vertices.select(
        F.col("internal_id").alias("parent"),
        F.col("original_id").cast("long").alias("parent_id"),
    )
    return (
        tree.join(vm, "internal_id")
        .join(pm, "parent")
        .select("id", "parent_id", F.round("weight", 6).alias("weight"))
    )


def sql_steiner_tree() -> str:
    from .driver_contract_ext import SQL_DAG_EDGES

    return f"""
WITH dag AS MATERIALIZED ({SQL_DAG_EDGES}),
c0 AS (SELECT MIN(src) AS s FROM dag WHERE src >= {CUST_OFFSET}),
hop1 AS (SELECT d.dst AS o, d.weight AS w1 FROM dag d, c0
         WHERE d.src = c0.s),
hop2 AS (SELECT h.o, h.w1, d.dst AS sup, h.w1 + d.weight AS cost
         FROM hop1 h JOIN dag d ON d.src = h.o),
targets AS (SELECT DISTINCT sup FROM hop2 ORDER BY sup LIMIT 3),
best AS (SELECT sup, MIN(cost) AS cost FROM hop2
         WHERE sup IN (SELECT sup FROM targets) GROUP BY sup),
pick AS (SELECT h.sup, b.cost, MIN(h.o) AS via
         FROM hop2 h JOIN best b ON b.sup = h.sup AND h.cost = b.cost
         GROUP BY h.sup, b.cost),
rows AS (
  SELECT s AS id, s AS parent_id, CAST(0 AS DOUBLE) AS weight FROM c0
  UNION ALL
  SELECT DISTINCT via AS id, (SELECT s FROM c0) AS parent_id,
         1.0 + ((via - {ORDER_OFFSET}) % 97) / 10.0 AS weight
  FROM pick
  UNION ALL
  SELECT sup AS id, via AS parent_id,
         1.0 + (sup % 53) / 10.0 AS weight
  FROM pick)
SELECT id, parent_id, ROUND(weight, 6) AS weight FROM rows
"""


# ---------------------------------------------------------------------------
# SALSA on the mod graph (exact: unrolled power-iteration CTEs, the same
# pattern as the HITS oracle)
# ---------------------------------------------------------------------------

SALSA_ITERS = 4


def q_salsa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .driver_contract import _to_original
    from .driver_contract_ext import _graph_mod
    from .operators.salsa import salsa

    g = _graph_mod(spark, sf_dir)
    out = salsa(g, max_iterations=SALSA_ITERS).scores
    out = _to_original(out, g.vertices, "internal_id", "id")
    return out.select(
        "id",
        F.round("hub", 6).alias("hub"),
        F.round("auth", 6).alias("auth"),
    )


def sql_salsa() -> str:
    # mirrors operators/salsa.py exactly: L1-preserving alternating
    # stochastic chains, no normalization pass
    ctes = [
        _mod_header(),
        "od AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS DOUBLE) AS od "
        "FROM edges GROUP BY src)",
        "idg AS MATERIALIZED (SELECT dst, CAST(COUNT(*) AS DOUBLE) AS idg "
        "FROM edges GROUP BY dst)",
        "h0 AS (SELECT src AS id, 1.0 / (SELECT COUNT(*) FROM od) AS hub "
        "FROM od)",
    ]
    for k in range(1, SALSA_ITERS + 1):
        ctes.append(
            f"a{k} AS MATERIALIZED (SELECT e.dst AS id, "
            f"SUM(h.hub / o.od) AS auth FROM edges e "
            f"JOIN od o ON o.src = e.src "
            f"JOIN h{k - 1} h ON h.id = e.src GROUP BY e.dst)"
        )
        ctes.append(
            f"h{k} AS MATERIALIZED (SELECT e.src AS id, "
            f"SUM(a.auth / i.idg) AS hub FROM edges e "
            f"JOIN idg i ON i.dst = e.dst "
            f"JOIN a{k} a ON a.id = e.dst GROUP BY e.src)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT n.id, ROUND(COALESCE(h.hub, 0), 6) AS hub,
       ROUND(COALESCE(a.auth, 0), 6) AS auth
FROM nodes n
LEFT JOIN h{SALSA_ITERS} h ON h.id = n.id
LEFT JOIN a{SALSA_ITERS} a ON a.id = n.id
"""
    )


# ---------------------------------------------------------------------------
# Heavy hitters over the corpus token stream
# ---------------------------------------------------------------------------

HH_K = 20
HH_CAP = 64


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _docs(spark, sf_dir)
        .select(F.explode(F.split("text", " ")).alias("item"))
        .filter(F.col("item") != "")
    )


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline.heavyhitters import heavy_hitters

    return heavy_hitters(_doc_tokens(spark, sf_dir), "item", k=HH_K)


def sql_heavy_hitters() -> str:
    return f"""
WITH toks AS (SELECT t.item FROM documents,
  UNNEST(string_split(text, ' ')) AS t(item) WHERE t.item != '')
SELECT item, CAST(COUNT(*) AS BIGINT) AS est_count
FROM toks GROUP BY item
ORDER BY est_count DESC, item ASC LIMIT {HH_K}
"""


def q_heavy_hitters_mg_validity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Misra-Gries merge-theorem guarantees checked against exact counts
    computed over the same token stream: every estimate is a lower bound
    within n/capacity of the truth, and every item with true frequency
    > n/capacity is present. ``n_guaranteed`` is replayed exactly by the
    oracle (it depends only on the data, not on partitioning)."""
    from .pipeline.heavyhitters import heavy_hitters

    toks = _doc_tokens(spark, sf_dir)
    n = toks.count()
    # k = capacity here: presence is guaranteed in the merged SUMMARY;
    # a k smaller than the above-threshold item count would cut
    # guaranteed items at the final top-k (the word-soup corpus has ~30
    # words above n/64)
    mg = heavy_hitters(
        toks, "item", k=HH_CAP, exact=False, capacity=HH_CAP
    ).localCheckpoint(eager=True)
    true = toks.groupBy("item").agg(F.count(F.lit(1)).alias("cnt"))
    joined = mg.join(true, "item")
    bound_violations = joined.filter(
        (F.col("est_count") > F.col("cnt"))
        | (F.col("cnt") - F.col("est_count") > n / HH_CAP)
    ).count()
    guaranteed = true.filter(F.col("cnt") > n / HH_CAP)
    n_guaranteed = guaranteed.count()
    present = guaranteed.join(mg, "item").count()
    return spark.createDataFrame(
        [(n_guaranteed, n_guaranteed - present, bound_violations)],
        "n_guaranteed long, presence_violations long, bound_violations long",
    )


def sql_heavy_hitters_mg_validity() -> str:
    return f"""
WITH toks AS (SELECT t.item FROM documents,
  UNNEST(string_split(text, ' ')) AS t(item) WHERE t.item != ''),
n AS (SELECT COUNT(*) AS n FROM toks),
true_counts AS (SELECT item, COUNT(*) AS cnt FROM toks GROUP BY item)
SELECT CAST(COUNT(*) AS BIGINT) AS n_guaranteed,
       CAST(0 AS BIGINT) AS presence_violations,
       CAST(0 AS BIGINT) AS bound_violations
FROM true_counts, n WHERE cnt > n.n / {HH_CAP}.0
"""


# ---------------------------------------------------------------------------
# HashGNN on the mod graph (exact: every min-hash selection replayed)
# ---------------------------------------------------------------------------

HGNN_DIM = 32
HGNN_DENSITY = 3
HGNN_ITERS = 2


def q_hashgnn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .driver_contract_ext import _n_supp
    from .graph import from_dense_edge_df
    from .operators.hashgnn import hashgnn

    e = edges_mod(spark, sf_dir)
    ns = _n_supp(spark, sf_dir)
    g = from_dense_edge_df(e, n_vertices=ns + 1)
    # restrict the vertex set to actual graph nodes (dense range includes
    # id 0 / absent ids whose hash-features would be orphans)
    nodes = (
        e.select(F.col("src").alias("internal_id"))
        .unionAll(e.select(F.col("dst").alias("internal_id")))
        .distinct()
    )
    g.vertices = nodes.select(
        "internal_id", F.col("internal_id").alias("original_id")
    )
    out = hashgnn(
        g, dimension=HGNN_DIM, density=HGNN_DENSITY,
        iterations=HGNN_ITERS,
    )
    # array column projected to a string: the driver harness cannot
    # canonicalize list-typed cells (pandas sort/hash limitation)
    return out.select(
        F.col("internal_id").alias("id"),
        F.array_join(
            F.transform("embedding", lambda x: x.cast("string")), ","
        ).alias("embedding_str"),
    )


def _sql_hkey(parts: str) -> str:
    return f"('0x' || substr(md5({parts}), 1, 15))::BIGINT"


def sql_hashgnn() -> str:
    ctes = [
        _mod_header(),
        f"slots AS (SELECT UNNEST(range(0, {HGNN_DENSITY})) AS s)",
        "b0 AS MATERIALIZED (SELECT DISTINCT n.id, CAST("
        + _sql_hkey("n.id::VARCHAR || '|' || j.j::VARCHAR || '|init|42'")
        + f" % {HGNN_DIM} AS INT) AS bit "
        f"FROM nodes n, (SELECT UNNEST(range(0, {HGNN_DENSITY})) AS j) j)",
    ]
    for t in range(1, HGNN_ITERS + 1):
        p = f"b{t - 1}"
        ctes.append(
            f"nb{t} AS (SELECT DISTINCT e.dst AS id, b.bit "
            f"FROM edges e JOIN {p} b ON b.id = e.src)"
        )
        k_self = _sql_hkey(
            f"'{t}|' || s.s::VARCHAR || '|' || c.bit::VARCHAR "
            "|| '|self|42'"
        )
        k_nbr = _sql_hkey(
            f"'{t}|' || s.s::VARCHAR || '|' || c.bit::VARCHAR "
            "|| '|nbr|42'"
        )
        ctes.append(
            f"cand{t} AS (SELECT c.id, s.s, c.bit, {k_self} AS k "
            f"FROM {p} c, slots s "
            f"UNION ALL SELECT c.id, s.s, c.bit, {k_nbr} AS k "
            f"FROM nb{t} c, slots s)"
        )
        ctes.append(
            f"b{t} AS MATERIALIZED (SELECT DISTINCT id, bit FROM ("
            f"SELECT id, s, bit, ROW_NUMBER() OVER (PARTITION BY id, s "
            f"ORDER BY k, bit) AS rn FROM cand{t}) WHERE rn = 1)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT id, array_to_string(list(bit ORDER BY bit), ',') AS embedding_str
FROM b{HGNN_ITERS} GROUP BY id
"""
    )


# ---------------------------------------------------------------------------
# SLLPA on the mod graph (exact: every speaker draw + listener mode
# replayed — the exponential-race keys are pure md5 arithmetic)
# ---------------------------------------------------------------------------

SLLPA_ITERS = 4
SLLPA_THRESHOLD = 0.2
_SQL_U01_SCALE = "1152921504606846976.0"  # 2^60


def q_sllpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .driver_contract_ext import _n_supp
    from .graph import from_dense_edge_df
    from .operators.sllpa import sllpa

    e = edges_mod(spark, sf_dir)
    ns = _n_supp(spark, sf_dir)
    g = from_dense_edge_df(e, n_vertices=ns + 1)
    nodes = (
        e.select(F.col("src").alias("internal_id"))
        .unionAll(e.select(F.col("dst").alias("internal_id")))
        .distinct()
    )
    g.vertices = nodes.select(
        "internal_id", F.col("internal_id").alias("original_id")
    )
    out = sllpa(
        g, max_iterations=SLLPA_ITERS, threshold=SLLPA_THRESHOLD
    )
    return out.select(F.col("internal_id").alias("id"), "community")


def sql_sllpa() -> str:
    def u01(parts: str) -> str:
        return (
            f"((('0x' || substr(md5({parts}), 1, 15))::BIGINT::DOUBLE "
            f"+ 1.0) / {_SQL_U01_SCALE})"
        )

    ctes = [
        _mod_header(),
        "sedges AS MATERIALIZED (SELECT src, dst, "
        "src::VARCHAR || ':' || dst::VARCHAR AS eid "
        "FROM edges WHERE src != dst)",
        "m0 AS (SELECT id, id AS label, 1 AS cnt FROM nodes)",
    ]
    for t in range(1, SLLPA_ITERS + 1):
        race = u01(
            f"'{t}|' || e.eid || '|' || m.label::VARCHAR || '|42'"
        )
        ctes.append(
            f"sp{t} AS (SELECT e.dst, e.eid, m.label, "
            f"-LN({race}) / m.cnt AS race "
            f"FROM sedges e JOIN m{t - 1} m ON m.id = e.src)"
        )
        ctes.append(
            f"pk{t} AS (SELECT dst, label FROM ("
            f"SELECT dst, eid, label, ROW_NUMBER() OVER ("
            f"PARTITION BY dst, eid ORDER BY race, label) AS rn "
            f"FROM sp{t}) WHERE rn = 1)"
        )
        ctes.append(
            f"hd{t} AS (SELECT dst AS id, label FROM ("
            f"SELECT dst, label, ROW_NUMBER() OVER (PARTITION BY dst "
            f"ORDER BY COUNT(*) DESC, label) AS rn "
            f"FROM pk{t} GROUP BY dst, label) WHERE rn = 1)"
        )
        ctes.append(
            f"m{t} AS MATERIALIZED (SELECT id, label, "
            f"CAST(SUM(cnt) AS INT) AS cnt FROM ("
            f"SELECT id, label, cnt FROM m{t - 1} "
            f"UNION ALL SELECT id, label, 1 FROM hd{t}) "
            f"GROUP BY id, label)"
        )
    last = f"m{SLLPA_ITERS}"
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
, totals AS (SELECT id, SUM(cnt) AS total FROM {last} GROUP BY id)
SELECT m.id, m.label AS community
FROM {last} m JOIN totals t ON t.id = m.id
WHERE m.cnt >= CAST(CEIL({SLLPA_THRESHOLD} * t.total) AS INT)
"""
    )


# ---------------------------------------------------------------------------
# Hashed TF-IDF vectors (exact: every sparse (doc, bucket, weight) row)
# ---------------------------------------------------------------------------

TFIDF_DIM = 128


def q_tfidf_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline.text import tfidf_vectors

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    out = tfidf_vectors(docs, dim=TFIDF_DIM, base_hash="md5")
    return out.select(
        "doc_id", "bucket", F.round("weight", 6).alias("weight")
    )


def sql_tfidf_vectors() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(t.term), 1, 15))::BIGINT % {TFIDF_DIM}
              AS INT) AS bucket
  FROM documents, UNNEST(regexp_split_to_array(trim(text), '\\s+'))
       AS t(term)
  WHERE t.term != ''),
tf AS (SELECT doc_id, bucket, COUNT(*) AS tf FROM toks
       GROUP BY doc_id, bucket),
dfb AS (SELECT bucket, COUNT(*) AS df FROM tf GROUP BY bucket),
n AS (SELECT COUNT(*) AS n FROM documents)
SELECT t.doc_id, t.bucket,
       ROUND(t.tf * (LN((1 + n.n) / (1.0 + d.df)) + 1), 6) AS weight
FROM tf t JOIN dfb d ON d.bucket = t.bucket, n
"""


BICON_SUPP_CAP = 200


def _bicon_graph(spark: SparkSession, sf_dir: str):
    """Bounded deterministic graph for the biconnectivity rows (the
    brute-force SQL oracles are O(V·E) reachability — the supplier cap
    keeps them tractable at EVERY sf): suppliers (id + 1000) chain to
    the next suppkey in their nation, attach to their nation (id +
    100), nations attach to their region. Nation clusters become one
    biconnected block (chained supplier triangles), nation–region
    edges are bridges, nations/regions become articulation points."""
    from pyspark.sql import Window

    sup = (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .filter(F.col("s_suppkey") <= BICON_SUPP_CAP)
        .select(
            F.col("s_suppkey").alias("sk"),
            F.col("s_nationkey").alias("nk"),
        )
    )
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    e_sn = sup.select(
        (F.col("sk") + 1000).alias("src"), (F.col("nk") + 100).alias("dst")
    )
    e_nr = nation.select(
        (F.col("n_nationkey") + 100).alias("src"),
        F.col("n_regionkey").cast("long").alias("dst"),
    )
    w = Window.partitionBy("nk").orderBy("sk")
    e_ss = (
        sup.withColumn("nxt", F.lead("sk").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(
            (F.col("sk") + 1000).alias("src"),
            (F.col("nxt") + 1000).alias("dst"),
        )
    )
    edges = e_sn.unionByName(e_nr).unionByName(e_ss)
    return from_edge_df(edges)


_BICON_SQL_GRAPH = f"""
sup AS (SELECT s_suppkey AS sk, s_nationkey AS nk FROM supplier
        WHERE s_suppkey <= {BICON_SUPP_CAP}),
e0 AS (
  SELECT sk + 1000 AS x, nk + 100 AS y FROM sup
  UNION ALL
  SELECT n_nationkey + 100, n_regionkey FROM nation
  UNION ALL
  SELECT sk + 1000, nxt + 1000 FROM (
    SELECT sk, LEAD(sk) OVER (PARTITION BY nk ORDER BY sk) AS nxt
    FROM sup) t
  WHERE nxt IS NOT NULL
),
edges AS (SELECT DISTINCT LEAST(x, y) AS a, GREATEST(x, y) AS b FROM e0)
"""


def _orig_ids(g, df, cols):
    """Map internal-id columns back to original ids."""
    out = df
    for c in cols:
        out = (
            out.join(
                g.vertices.select(
                    F.col("internal_id").alias(c),
                    F.col("original_id").alias(f"__{c}"),
                ),
                c,
            )
            .drop(c)
            .withColumnRenamed(f"__{c}", c)
        )
    return out


def q_bridges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed bridge finding (Tarjan–Vishkin style: spanning
    forest + DFS-free Euler tour by list ranking + subtree-reach
    intervals + auxiliary-graph connectivity; operators/
    biconnectivity.py) vs a brute-force per-edge-removal reachability
    oracle."""
    from .operators.biconnectivity import bridges

    g = _bicon_graph(spark, sf_dir)
    out = _orig_ids(g, bridges(g), ["src", "dst"])
    return out.select(
        F.least("src", "dst").cast("long").alias("src"),
        F.greatest("src", "dst").cast("long").alias("dst"),
    )


def sql_bridges() -> str:
    return f"""
WITH RECURSIVE
{_BICON_SQL_GRAPH},
sym AS (SELECT a AS u, b AS v, a, b FROM edges
        UNION ALL SELECT b, a, a, b FROM edges),
reach AS (
  SELECT a AS ea, b AS eb, a AS node FROM edges
  UNION
  SELECT r.ea, r.eb, s.v
  FROM reach r JOIN sym s ON s.u = r.node
  WHERE NOT (s.a = r.ea AND s.b = r.eb)
)
SELECT e.a AS src, e.b AS dst FROM edges e
WHERE NOT EXISTS (SELECT 1 FROM reach r
                  WHERE r.ea = e.a AND r.eb = e.b AND r.node = e.b)
"""


def q_articulation_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Articulation points from the same biconnectivity machinery
    (vertex in ≥2 blocks) vs a brute-force per-vertex-removal
    component-count oracle; n_components = parts the vertex's removal
    splits its component into."""
    from .operators.biconnectivity import articulation_points

    g = _bicon_graph(spark, sf_dir)
    out = _orig_ids(g, articulation_points(g), ["internal_id"])
    return out.select(
        F.col("internal_id").cast("long").alias("node_id"),
        F.col("n_components").cast("long").alias("n_components"),
    )


def sql_articulation_points() -> str:
    return f"""
WITH RECURSIVE
{_BICON_SQL_GRAPH},
verts AS (SELECT DISTINCT a AS v FROM edges
          UNION SELECT DISTINCT b FROM edges),
sym AS (SELECT a AS u, b AS v FROM edges
        UNION ALL SELECT b, a FROM edges),
excl AS (SELECT v AS x FROM verts UNION ALL SELECT -1),
lab AS (
  SELECT e.x, v.v AS node, v.v AS l FROM excl e, verts v
  WHERE v.v <> e.x
  UNION
  SELECT l.x, s.v, l.l
  FROM lab l JOIN sym s ON s.u = l.node
  WHERE s.v <> l.x AND s.u <> l.x
),
minlab AS (SELECT x, node, MIN(l) AS ml FROM lab GROUP BY 1, 2),
ncomp AS (SELECT x, COUNT(DISTINCT ml) AS nc FROM minlab GROUP BY 1),
base AS (SELECT nc AS base_nc FROM ncomp WHERE x = -1)
SELECT n.x AS node_id, n.nc - b.base_nc + 1 AS n_components
FROM ncomp n, base b
WHERE n.x <> -1 AND n.nc >= b.base_nc + 1
"""


FNS_TOPK = 5
WNS_TOPK = 5
FKNN_TOPK = 3


def q_filtered_node_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDS 2.x filtered nodeSimilarity: same supplier–part Jaccard as
    the node_similarity row, result pairs restricted to sources with
    suppkey % 5 == 0 and targets with suppkey % 3 == 0, restriction
    applied BEFORE the per-source top-k (ranks over allowed targets)."""
    from .driver_contract import _graph_sp, _to_original
    from .operators.nodesim import node_similarity

    g = _graph_sp(spark, sf_dir)
    supp = F.col("original_id") < 10000000  # parts are offset +10M
    src_f = g.vertices.filter(
        supp & (F.col("original_id") % 5 == 0)
    ).select("internal_id")
    tgt_f = g.vertices.filter(
        supp & (F.col("original_id") % 3 == 0)
    ).select("internal_id")
    sims = node_similarity(
        g, top_k=FNS_TOPK, source_ids=src_f, target_ids=tgt_f
    )
    sims = _to_original(sims, g.vertices, "node1", "node1")
    sims = _to_original(sims, g.vertices, "node2", "node2")
    return sims.select(
        "node1", "node2", F.round("similarity", 6).alias("similarity")
    )


def sql_filtered_node_similarity() -> str:
    return f"""
WITH edges AS (SELECT DISTINCT l_suppkey AS src,
                      l_partkey + 10000000 AS dst FROM lineitem),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
inter AS (
  SELECT e1.src AS node1, e2.src AS node2, COUNT(*) AS common
  FROM edges e1 JOIN edges e2 ON e1.dst = e2.dst AND e1.src < e2.src
  GROUP BY e1.src, e2.src),
sims AS (
  SELECT node1, node2,
         CAST(common AS DOUBLE) / (d1.deg + d2.deg - common) AS similarity
  FROM inter JOIN deg d1 ON d1.src = inter.node1
             JOIN deg d2 ON d2.src = inter.node2),
bidir AS (
  SELECT node1, node2, similarity FROM sims
  UNION ALL SELECT node2, node1, similarity FROM sims),
filt AS (SELECT * FROM bidir
         WHERE node1 % 5 = 0 AND node2 % 3 = 0)
SELECT node1, node2, ROUND(similarity, 6) AS similarity FROM (
  SELECT *, ROW_NUMBER() OVER
    (PARTITION BY node1 ORDER BY similarity DESC, node2 ASC) AS rn
  FROM filt) WHERE rn <= {FNS_TOPK}
"""


def q_node_similarity_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted nodeSimilarity (relationshipWeightProperty set, ref
    NodeSimilarity.java:153-185): sum(min)/sum(max) over the weight
    vectors aligned on the neighborhood union — weight = lineitem count
    per (supplier, part) edge, the same graph as the node_similarity
    row."""
    from .driver_contract import _graph_sp, _to_original
    from .operators.nodesim import node_similarity

    g = _graph_sp(spark, sf_dir)
    sims = node_similarity(g, top_k=WNS_TOPK, relationship_weight="weight")
    sims = _to_original(sims, g.vertices, "node1", "node1")
    sims = _to_original(sims, g.vertices, "node2", "node2")
    return sims.select(
        "node1", "node2", F.round("similarity", 6).alias("similarity")
    )


def sql_node_similarity_weighted() -> str:
    # Same identity as the operator: sum_union(max) = W1 + W2 - sum_∩(min)
    return f"""
WITH edges AS (SELECT l_suppkey AS src, l_partkey + 10000000 AS dst,
                      CAST(COUNT(*) AS DOUBLE) AS w
               FROM lineitem GROUP BY 1, 2),
deg AS (SELECT src, SUM(w) AS wdeg FROM edges GROUP BY src),
inter AS (
  SELECT e1.src AS node1, e2.src AS node2,
         SUM(LEAST(e1.w, e2.w)) AS smin
  FROM edges e1 JOIN edges e2 ON e1.dst = e2.dst AND e1.src < e2.src
  GROUP BY e1.src, e2.src),
sims AS (
  SELECT node1, node2,
         smin / (d1.wdeg + d2.wdeg - smin) AS similarity
  FROM inter JOIN deg d1 ON d1.src = inter.node1
             JOIN deg d2 ON d2.src = inter.node2),
bidir AS (
  SELECT node1, node2, similarity FROM sims
  UNION ALL SELECT node2, node1, similarity FROM sims)
SELECT node1, node2, ROUND(similarity, 6) AS similarity FROM (
  SELECT *, ROW_NUMBER() OVER
    (PARTITION BY node1 ORDER BY similarity DESC, node2 ASC) AS rn
  FROM bidir) WHERE rn <= {WNS_TOPK}
"""


def q_filtered_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gds.alpha.knn.filtered (exact cross-set kernel): queries are
    vec_id % 4 == 0, candidates vec_id % 3 == 0 — each query ranks its
    top-k among allowed candidates only."""
    from .graph import Graph
    from .operators.knn import filtered_knn

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("internal_id"),
        F.col("embedding").alias("vec"),
    )
    g = Graph(emb, spark.createDataFrame([], "src long, dst long"))
    out = filtered_knn(
        g, "vec", top_k=FKNN_TOPK,
        source_ids=emb.filter(F.col("internal_id") % 4 == 0).select(
            "internal_id"
        ),
        target_ids=emb.filter(F.col("internal_id") % 3 == 0).select(
            "internal_id"
        ),
    )
    return out.select(
        "node1", "node2", F.round("similarity", 4).alias("similarity")
    )


def sql_filtered_knn() -> str:
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
scored AS (
  SELECT a.vec_id AS node1, b.vec_id AS node2,
         list_dot_product(a.v, b.v) /
         (sqrt(list_dot_product(a.v, a.v)) *
          sqrt(list_dot_product(b.v, b.v))) AS similarity
  FROM e a JOIN e b ON a.vec_id != b.vec_id
  WHERE a.vec_id % 4 = 0 AND b.vec_id % 3 = 0)
SELECT node1, node2, ROUND(similarity, 4) AS similarity FROM (
  SELECT *, ROW_NUMBER() OVER
    (PARTITION BY node1 ORDER BY similarity DESC, node2 ASC) AS rn
  FROM scored) WHERE rn <= {FKNN_TOPK}
"""


KMEANS_K = 6


def q_kmeans_node_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gds.kmeans over the embeddings table (GDS 2.x surface). Centroid
    float sums are shuffle-order sensitive (see kmeans_fit docstring),
    so the oracle is structural: one output row per vector, community
    ids within [0, k), distances non-negative, silhouette within
    [-1, 1]. Nearest-centroid assignment and planted-cluster recovery
    are pinned in pytest (test_kmeans_operator)."""
    from .graph import Graph
    from .operators.kmeans import kmeans

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("internal_id"),
        F.col("embedding").alias("vec"),
    )
    g = Graph(emb, spark.createDataFrame([], "src long, dst long"))
    out = kmeans(
        g, "vec", k=KMEANS_K, max_iterations=8, compute_silhouette=True
    ).localCheckpoint(eager=True)
    n = out.count()
    agg = out.agg(
        F.countDistinct("community").alias("n_comm"),
        F.sum(
            (F.col("distance_from_centroid") < 0).cast("long")
        ).alias("neg_dist"),
        F.sum(
            (
                (F.col("silhouette") < -1.0) | (F.col("silhouette") > 1.0)
            ).cast("long")
        ).alias("bad_sil"),
        F.max("community").alias("max_comm"),
    ).collect()[0]
    return spark.createDataFrame(
        [
            (
                n,
                int(agg.n_comm <= KMEANS_K and agg.max_comm < KMEANS_K),
                int(agg.neg_dist),
                int(agg.bad_sil),
            )
        ],
        "n_rows long, communities_bounded long, negative_distances long, "
        "silhouette_out_of_range long",
    )


def sql_kmeans_node_validity() -> str:
    return """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(1 AS BIGINT) AS communities_bounded,
       CAST(0 AS BIGINT) AS negative_distances,
       CAST(0 AS BIGINT) AS silhouette_out_of_range
FROM embeddings
"""


# -- approximate maximum k-cut ---------------------------------------------
# Deterministic replay (hash init + gated synchronous local search — see
# operators/maxkcut.py): the full per-node assignment AND the cut cost are
# exact-checkable by unrolling the fixed iteration count in plain SQL.
# Weighted MOD graph: w = ((src*7 + dst*13) % 10) + 1 on ORIGINAL supplier
# keys, arithmetic in both engines. Internal ids are the sorted dense rank
# (graph.py dense_ids invariant), replayed as ROW_NUMBER() OVER (ORDER BY id).
MAXKCUT_K = 4
MAXKCUT_ITERS = 6


def _edges_mod_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = edges_mod(spark, sf_dir)
    return e.withColumn(
        "weight",
        (
            F.pmod(F.col("src") * 7 + F.col("dst") * 13, F.lit(10)) + 1
        ).cast("double"),
    )


def q_max_k_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.maxkcut import approx_max_k_cut

    g = from_edge_df(_edges_mod_weighted(spark, sf_dir), weight="weight")
    res = approx_max_k_cut(
        g, MAXKCUT_K, iterations=MAXKCUT_ITERS, relationship_weight="weight"
    )
    out = res.assignment.join(
        g.vertices.select("internal_id", "original_id"), "internal_id"
    )
    return out.select(
        F.col("original_id").cast("long").alias("id"),
        F.col("community").cast("long").alias("community"),
    )


def _sql_maxkcut_ctes() -> str:
    k, iters = MAXKCUT_K, MAXKCUT_ITERS
    parts = [
        _mod_header(),
        "imap AS MATERIALIZED (SELECT id, ROW_NUMBER() OVER (ORDER BY id)"
        " - 1 AS iid FROM nodes)",
        "we AS MATERIALIZED (SELECT ms.iid AS src, md.iid AS dst,"
        " CAST(((e.src*7 + e.dst*13) % 10) + 1 AS DOUBLE) AS w"
        " FROM edges e JOIN imap ms ON ms.id = e.src"
        " JOIN imap md ON md.id = e.dst)",
        "sym AS MATERIALIZED (SELECT src, dst, w FROM we UNION ALL"
        " SELECT dst AS src, src AS dst, w FROM we)",
        f"ks AS (SELECT range AS c FROM range({k}))",
        f"c0 AS (SELECT iid, ((iid*2654435761 + 97) % 1000003) % {k}"
        " AS comm FROM imap)",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"w{t} AS (SELECT s.src AS iid, c.comm AS cand,"
            f" SUM(s.w) AS wt FROM sym s JOIN c{t-1} c ON c.iid = s.dst"
            " GROUP BY 1, 2)"
        )
        parts.append(
            f"b{t} AS (SELECT iid, cand FROM ("
            "SELECT i.iid, k.c AS cand, ROW_NUMBER() OVER ("
            "PARTITION BY i.iid ORDER BY COALESCE(w.wt, 0) ASC, k.c ASC"
            ") AS rn FROM imap i CROSS JOIN ks k"
            f" LEFT JOIN w{t} w ON w.iid = i.iid AND w.cand = k.c"
            ") WHERE rn = 1)"
        )
        parts.append(
            f"c{t} AS (SELECT c.iid, CASE WHEN"
            f" ((c.iid*40503 + {t}*97) % 1000003) % 2 = 0"
            f" THEN b.cand ELSE c.comm END AS comm"
            f" FROM c{t-1} c JOIN b{t} b ON b.iid = c.iid)"
        )
    return "WITH\n" + ",\n".join(parts)


def sql_max_k_cut() -> str:
    return f"""
{_sql_maxkcut_ctes()}
SELECT im.id AS id, CAST(c{MAXKCUT_ITERS}.comm AS BIGINT) AS community
FROM c{MAXKCUT_ITERS} JOIN imap im ON im.iid = c{MAXKCUT_ITERS}.iid
"""


def q_max_k_cut_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.maxkcut import approx_max_k_cut

    g = from_edge_df(_edges_mod_weighted(spark, sf_dir), weight="weight")
    res = approx_max_k_cut(
        g, MAXKCUT_K, iterations=MAXKCUT_ITERS, relationship_weight="weight"
    )
    return spark.createDataFrame(
        [(float(res.cut_cost),)], "cut_cost double"
    )


def sql_max_k_cut_cost() -> str:
    n = MAXKCUT_ITERS
    return f"""
{_sql_maxkcut_ctes()}
SELECT CAST(COALESCE(SUM(CASE WHEN cs.comm != cd.comm THEN we.w
                              ELSE 0 END), 0) AS DOUBLE) AS cut_cost
FROM we JOIN c{n} cs ON cs.iid = we.src JOIN c{n} cd ON cd.iid = we.dst
"""


# -- HDBSCAN ---------------------------------------------------------------
# Arithmetic planted blobs over supplier keys: blob b = s % 5, center
# (1000·b, 1000·((b·3) % 5)), jitter < 1.2 — separation/spread ≈ 1000 and
# min_cluster_size > half a blob, so density clustering MUST return exactly
# the s % 5 partition with zero noise (no internal split can produce two
# ≥ min_cluster_size children; intermediate merge clusters have zero
# directly-falling points so excess-of-mass always selects the blob level).
# Labels are schedule-free after canonicalization to MIN member id ⇒ the
# full assignment is exact-checkable in SQL with no clustering replay.
def q_hdbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.hdbscan import hdbscan

    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = supp.count()
    chain = supp.select(
        F.col("s_suppkey").alias("src"),
        F.pmod(F.col("s_suppkey") + 1, F.lit(n)).alias("dst"),
    )
    g = from_edge_df(chain)
    b = F.pmod(F.col("original_id"), F.lit(5))
    vec = F.array(
        (b * 1000.0) + F.pmod(F.col("original_id") * 37, F.lit(97)) / 97.0,
        (F.pmod(b * 3, F.lit(5)) * 1000.0)
        + F.pmod(F.col("original_id") * 53, F.lit(89)) / 89.0,
    )
    g.vertices = g.vertices.withColumn("vec", vec)
    blob = max(2, n // 5)
    res = hdbscan(
        g, "vec",
        samples=max(1, min(3, blob - 1)),
        min_cluster_size=max(2, int(0.6 * blob)),
    )
    labeled = res.labels.join(
        g.vertices.select("internal_id", "original_id"), "internal_id"
    )
    rep = labeled.groupBy("label").agg(
        F.min("original_id").alias("cluster_rep")
    )
    return (
        labeled.join(rep, "label")
        .select(
            F.col("original_id").cast("long").alias("id"),
            F.when(F.col("label") < 0, F.lit(-1))
            .otherwise(F.col("cluster_rep"))
            .cast("long")
            .alias("cluster_rep"),
        )
    )


def sql_hdbscan() -> str:
    return """
SELECT CAST(s_suppkey AS BIGINT) AS id,
       CAST(MIN(s_suppkey) OVER (PARTITION BY s_suppkey % 5) AS BIGINT)
         AS cluster_rep
FROM supplier
"""


# -- CNARW graph sampling ---------------------------------------------------
# gds.graph.sample.cnarw (GDS 2.4): common-neighbour-aware random walk.
# One batch with the portable md5 hash: the per-edge integer transition
# weights (1 + floor((1 − cn/min(d)) × 65536)), the prefix ranges, the
# restart gate and the range pick are all exact integer/rational
# arithmetic, so DuckDB replays every step of every walk and the sampled
# node set matches exactly.
CNARW_WALKS = 48
CNARW_LEN = 6
CNARW_GATE = 100_000  # restart_probability 0.1 × 1e6


def q_cnarw_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .driver_contract_ext import _n_supp
    from .graph import from_dense_edge_df
    from .operators.graphsample import cnarw_sample_nodes

    e = edges_mod(spark, sf_dir)
    ns = _n_supp(spark, sf_dir)
    g = from_dense_edge_df(e, n_vertices=ns + 1)
    nodes = cnarw_sample_nodes(
        g,
        sampling_ratio=1.0,  # capped by max_batches: sample = batch 0
        restart_probability=0.1,
        start_nodes=[1],
        walks_per_batch=CNARW_WALKS,
        walk_length=CNARW_LEN,
        max_batches=1,
        base_hash="md5",
    )
    return nodes.select(F.col("internal_id").alias("id"))


def sql_cnarw_sample() -> str:
    return f"""
WITH RECURSIVE
{_mod_header()},
e AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges),
deg AS MATERIALIZED (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
cn AS MATERIALIZED (
  SELECT g.src AS u, g.dst AS v, COALESCE(w.cn, 0) AS cn
  FROM e g LEFT JOIN (
    SELECT e1.src AS u, e2.src AS v, COUNT(*) AS cn
    FROM e e1 JOIN e e2 ON e1.dst = e2.dst
    GROUP BY e1.src, e2.src
  ) w ON w.u = g.src AND w.v = g.dst),
wt AS MATERIALIZED (
  SELECT cn.u AS src, cn.v AS dst,
         1 + CAST(FLOOR((1.0 - cn.cn / GREATEST(
               LEAST(du.d, COALESCE(dv.d, 0)), 1)) * 65536) AS BIGINT)
           AS w_int
  FROM cn
  JOIN deg du ON du.src = cn.u
  LEFT JOIN deg dv ON dv.src = cn.v),
cum AS MATERIALIZED (
  SELECT src, dst, w_int,
         SUM(w_int) OVER (PARTITION BY src ORDER BY dst
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - w_int
           AS lo
  FROM wt),
tt AS MATERIALIZED (SELECT src, SUM(w_int) AS tot FROM wt GROUP BY src),
starts AS (SELECT 1 * {CNARW_WALKS} + r.rep AS walk_id, 1 AS start
           FROM UNNEST(range(0, {CNARW_WALKS})) AS r(rep)),
walk(walk_id, start, step, cur) AS (
  SELECT walk_id, start, 0, start FROM starts
  UNION ALL
  SELECT w.walk_id, w.start, w.step + 1,
         CASE WHEN ('0x' || substr(md5(w.walk_id::VARCHAR || '|' ||
                    w.step::VARCHAR || '|42|r'), 1, 15))::BIGINT
                   % 1000000 < {CNARW_GATE}
                   OR t.tot IS NULL
              THEN w.start ELSE c.dst END
  FROM walk w
  LEFT JOIN tt t ON t.src = w.cur
  LEFT JOIN cum c ON c.src = w.cur
   AND (('0x' || substr(md5(w.walk_id::VARCHAR || '|' ||
        w.step::VARCHAR || '|42|n'), 1, 15))::BIGINT % t.tot) >= c.lo
   AND (('0x' || substr(md5(w.walk_id::VARCHAR || '|' ||
        w.step::VARCHAR || '|42|n'), 1, 15))::BIGINT % t.tot)
       < c.lo + c.w_int
  WHERE w.step < {CNARW_LEN}
)
SELECT DISTINCT cur AS id FROM walk
"""


# -- prize-collecting Steiner tree -----------------------------------------
# gds.prizeSteinerTree (GDS 2.5 surface). The rooted strong-prune DP is
# EXACT on tree inputs, so the contract graph is a deterministic
# binary-heap tree over supplier keys (parent = v div 2) with arithmetic
# integer weights/prizes — the oracle replays the same DP as a chained
# fixed-point CTE: D bottom-up value iterations (one level propagates
# per iteration) then D top-down keep iterations. All margins are
# integer-valued, so float identity is exact.
PCST_DEPTH = 16  # covers 2^16 suppliers (sf up to ~6.5; sf1 needs 14)


def _pcst_tree_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    return supp.filter(F.col("s_suppkey") >= 2).select(
        F.col("s_suppkey").alias("src"),
        ((F.col("s_suppkey") - F.col("s_suppkey") % 2) / 2)
        .cast("long")
        .alias("dst"),
        (((F.col("s_suppkey") * 13) % 7) + 1).cast("double").alias(
            "weight"
        ),
    )


def q_prize_steiner(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .driver_contract_ext import _n_supp
    from .graph import from_dense_edge_df
    from .operators.pcst import prize_steiner_tree

    ns = _n_supp(spark, sf_dir)
    # dense fast path keeps internal ids == original suppkeys (vertex 0
    # is isolated with prize 0 — rooted mode drops foreign-tree centers)
    g = from_dense_edge_df(
        _pcst_tree_edges(spark, sf_dir), n_vertices=ns + 1, weight="weight"
    )
    prizes = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        F.col("s_suppkey").alias("internal_id"),
        ((F.col("s_suppkey") * 11) % 10).cast("double").alias("prize"),
    )
    import dataclasses

    g = dataclasses.replace(
        g,
        vertices=g.vertices.join(prizes, "internal_id", "left").fillna(
            {"prize": 0.0}
        ),
    )
    return prize_steiner_tree(g, root=1).select(
        F.col("internal_id").alias("id"),
        "parent",
        F.col("weight").cast("double").alias("weight"),
    )


def sql_prize_steiner() -> str:
    d = PCST_DEPTH
    ctes = [
        """nodes AS MATERIALIZED (
  SELECT s_suppkey AS v,
         CAST((s_suppkey - s_suppkey % 2) / 2 AS BIGINT) AS parent,
         CAST(((s_suppkey * 13) % 7) + 1 AS DOUBLE) AS w,
         CAST((s_suppkey * 11) % 10 AS DOUBLE) AS p
  FROM supplier
)""",
        "val0 AS MATERIALIZED (SELECT v, p AS val FROM nodes)",
    ]
    # every chained CTE MUST be MATERIALIZED: DuckDB inlines plain CTEs
    # at every reference site, and keep{k+1} references keep{k} twice —
    # unmaterialized that expands the plan 2^D-fold (observed: 21 GB of
    # planner memory at D=16 on a 100-row table)
    for k in range(d):
        ctes.append(f"""val{k + 1} AS MATERIALIZED (
  SELECT n.v,
         n.p + COALESCE(SUM(CASE WHEN c.val - cn.w > 0
                                 THEN c.val - cn.w ELSE 0 END), 0) AS val
  FROM nodes n
  LEFT JOIN nodes cn ON cn.parent = n.v AND cn.v >= 2
  LEFT JOIN val{k} c ON c.v = cn.v
  GROUP BY n.v, n.p
)""")
    ctes.append("keep0 AS MATERIALIZED (SELECT CAST(1 AS BIGINT) AS v)")
    for k in range(d):
        ctes.append(f"""keep{k + 1} AS MATERIALIZED (
  SELECT v FROM keep{k}
  UNION
  SELECT n.v FROM nodes n
  JOIN keep{k} kk ON n.parent = kk.v
  JOIN val{d} f ON f.v = n.v
  WHERE n.v >= 2 AND f.val - n.w > 0
)""")
    return f"""
WITH {', '.join(ctes)}
SELECT n.v AS id,
       CASE WHEN n.v = 1 THEN CAST(1 AS BIGINT) ELSE n.parent END
         AS parent,
       CASE WHEN n.v = 1 THEN 0.0 ELSE n.w END AS weight
FROM nodes n JOIN keep{d} k ON k.v = n.v
"""


def q_prize_steiner_unrooted_validity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Unrooted mode on the weighted MOD graph: output is a valid forest
    (every parent kept; one self-row per tree), and its net worth is at
    least the best single-vertex prize (the fallback guarantee)."""
    from .operators.pcst import prize_steiner_tree

    g = from_edge_df(_edges_mod_weighted(spark, sf_dir), weight="weight")
    prizes_df = g.vertices.select(
        "internal_id",
        ((F.col("internal_id") * 3) % 11).cast("double").alias("prize"),
    )
    import dataclasses

    g2 = dataclasses.replace(
        g, vertices=g.vertices.join(prizes_df, "internal_id")
    )
    metrics = {}
    out = prize_steiner_tree(g2, metrics_out=metrics).localCheckpoint(
        eager=True
    )
    nw = metrics["sumOfPrizes"] - metrics["totalWeight"]
    best_single = prizes_df.agg(F.max("prize")).collect()[0][0]
    orphans = (
        out.join(
            out.select(F.col("internal_id").alias("parent")).distinct(),
            "parent",
            "left_anti",
        ).count()
    )
    return spark.createDataFrame(
        [(int(out.count() > 0), int(orphans),
          bool(nw >= float(best_single)))],
        "nonempty long, orphan_parents long, beats_best_single boolean",
    )


def sql_prize_steiner_unrooted_validity() -> str:
    return """
SELECT CAST(1 AS BIGINT) AS nonempty, CAST(0 AS BIGINT) AS orphan_parents,
       TRUE AS beats_best_single
"""


# -- node regression pipeline ----------------------------------------------
# gds.alpha.pipeline.nodeRegression with a single OLS candidate
# (penalty 0, solver="normal") is exact linear least squares on the
# deterministic hash-split train set — the oracle re-solves the same 3x3
# normal-equation system with Cramer's rule in plain SQL and replays the
# per-node predictions. Features/target are arithmetic in s_suppkey so
# both engines see identical inputs; target carries deterministic
# "noise" so the fit is a genuine regression, not an identity.
NR_SEED = 42
NR_TEST_CUT = int(0.3 * 1_000_003)  # mlpipe split: h < cut -> test


def q_node_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .graph import Graph
    from .operators.mlpipe import (
        node_regression_predict,
        node_regression_train,
    )

    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        F.col("s_suppkey").alias("internal_id"),
        (F.col("s_suppkey") % 17).cast("double").alias("f1"),
        ((F.col("s_suppkey") * 7) % 23).cast("double").alias("f2"),
        (
            3.0 * (F.col("s_suppkey") % 17)
            - 2.0 * ((F.col("s_suppkey") * 7) % 23)
            + 5.0
            + ((F.col("s_suppkey") % 7) - 3) * 0.01
        ).alias("y"),
    )
    g = Graph(supp, spark.createDataFrame([], "src long, dst long"))
    model = node_regression_train(
        g,
        feature_cols=["f1", "f2"],
        target_col="y",
        params=[{"penalty": 0.0, "solver": "normal"}],
        metric="ROOT_MEAN_SQUARED_ERROR",
        seed=NR_SEED,
    )
    return node_regression_predict(model, g).select(
        F.col("internal_id").alias("id"),
        F.round("predicted_value", 4).alias("predicted_value"),
    )


def sql_node_regression() -> str:
    return f"""
WITH feat AS (
  SELECT s_suppkey AS id,
         CAST(s_suppkey % 17 AS DOUBLE) AS f1,
         CAST((s_suppkey * 7) % 23 AS DOUBLE) AS f2,
         3.0 * (s_suppkey % 17) - 2.0 * ((s_suppkey * 7) % 23) + 5.0
           + ((s_suppkey % 7) - 3) * 0.01 AS y
  FROM supplier
),
train AS (
  SELECT * FROM feat
  WHERE (id * 2654435761 + {NR_SEED} * 97) % 1000003 >= {NR_TEST_CUT}
),
sums AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(f1) AS s1, SUM(f2) AS s2,
         SUM(f1*f1) AS s11, SUM(f1*f2) AS s12, SUM(f2*f2) AS s22,
         SUM(y) AS sy, SUM(f1*y) AS s1y, SUM(f2*y) AS s2y
  FROM train
),
-- Cramer's rule on M [b0 b1 b2]^T = [sy s1y s2y]^T,
-- M = [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]]
coef AS (
  SELECT
    (n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)
       + s2*(s1*s12 - s11*s2)) AS det,
    (sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y)
       + s2*(s1y*s12 - s11*s2y)) AS det0,
    (n*(s1y*s22 - s2y*s12) - sy*(s1*s22 - s12*s2)
       + s2*(s1*s2y - s1y*s2)) AS det1,
    (n*(s11*s2y - s12*s1y) - s1*(s1*s2y - s1y*s2)
       + sy*(s1*s12 - s11*s2)) AS det2
  FROM sums
)
SELECT f.id,
       ROUND(c.det0/c.det + c.det1/c.det * f.f1 + c.det2/c.det * f.f2, 4)
         AS predicted_value
FROM feat f CROSS JOIN coef c
"""


def ext2_queries() -> dict:
    return {
        "topological_sort": q_topological_sort,
        "dag_longest_path": q_dag_longest_path,
        "topo_cyclic_validity": q_topo_cyclic_validity,
        "bellman_ford": q_bellman_ford,
        "conductance": q_conductance,
        "normalize_url": q_normalize_url,
        "host_graph": q_host_graph,
        "anchor_topk": q_anchor_topk,
        "rwr_sample": q_rwr_sample,
        "leiden_validity": q_leiden_validity,
        "steiner_tree": q_steiner_tree,
        "salsa": q_salsa,
        "heavy_hitters": q_heavy_hitters,
        "heavy_hitters_mg_validity": q_heavy_hitters_mg_validity,
        "hashgnn": q_hashgnn,
        "sllpa": q_sllpa,
        "tfidf_vectors": q_tfidf_vectors,
        "bridges": q_bridges,
        "articulation_points": q_articulation_points,
        "filtered_node_similarity": q_filtered_node_similarity,
        "node_similarity_weighted": q_node_similarity_weighted,
        "filtered_knn": q_filtered_knn,
        "kmeans_node_validity": q_kmeans_node_validity,
        "node_regression": q_node_regression,
        "cnarw_sample": q_cnarw_sample,
        "prize_steiner": q_prize_steiner,
        "prize_steiner_unrooted_validity": q_prize_steiner_unrooted_validity,
        "max_k_cut": q_max_k_cut,
        "max_k_cut_cost": q_max_k_cut_cost,
        "hdbscan": q_hdbscan,
    }


def ext2_oracle_sql() -> dict:
    return {
        "topological_sort": sql_topological_sort(),
        "dag_longest_path": sql_dag_longest_path(),
        "topo_cyclic_validity": sql_topo_cyclic_validity(),
        "bellman_ford": sql_bellman_ford(),
        "conductance": sql_conductance(),
        "normalize_url": sql_normalize_url(),
        "host_graph": sql_host_graph(),
        "anchor_topk": sql_anchor_topk(),
        "rwr_sample": sql_rwr_sample(),
        "leiden_validity": sql_leiden_validity(),
        "steiner_tree": sql_steiner_tree(),
        "salsa": sql_salsa(),
        "heavy_hitters": sql_heavy_hitters(),
        "heavy_hitters_mg_validity": sql_heavy_hitters_mg_validity(),
        "hashgnn": sql_hashgnn(),
        "sllpa": sql_sllpa(),
        "tfidf_vectors": sql_tfidf_vectors(),
        "bridges": sql_bridges(),
        "articulation_points": sql_articulation_points(),
        "filtered_node_similarity": sql_filtered_node_similarity(),
        "node_similarity_weighted": sql_node_similarity_weighted(),
        "filtered_knn": sql_filtered_knn(),
        "kmeans_node_validity": sql_kmeans_node_validity(),
        "node_regression": sql_node_regression(),
        "cnarw_sample": sql_cnarw_sample(),
        "prize_steiner": sql_prize_steiner(),
        "prize_steiner_unrooted_validity":
            sql_prize_steiner_unrooted_validity(),
        "max_k_cut": sql_max_k_cut(),
        "max_k_cut_cost": sql_max_k_cut_cost(),
        "hdbscan": sql_hdbscan(),
    }
