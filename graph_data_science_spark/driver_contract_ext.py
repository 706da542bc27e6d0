"""Contract registry extension — oracle entries for the operators that
round 1 left pytest-only (VERDICT §"What's missing" item 2).

Derived graphs shared by Spark + DuckDB (all arithmetic-only so both
engines compute identical structures):

- ``MOD graph``   — directed supplier graph with cycles:
  src = l_suppkey, dst = ((l_suppkey + l_partkey % 37) % n_supp) + 1.
  Sparse-ish (out-degree ≤ 37), diameter ~3: exercises BFS levels, SCC
  rounds, Brandes waves, HITS without the degeneracy of the (complete)
  co-supplier graph.
- ``2-hop DAG``   — customer → order → supplier with arithmetic weights:
  exact shortest-path / Yens / A* oracles in plain SQL (no recursion).
- ``signed co-supplier`` — canonical a<b supplier pairs with sign
  −1 iff (a+b) % 3 == 0: balanced-triads oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .driver_contract import (
    SQL_EDGES_SP,
    SQL_EDGES_SS,
    SQL_NODES_SP,
    _graph_pr,
    _graph_sp,
    _lineitem,
    _to_original,
    edges_ss,
    sql_wcc,
)
from .graph import from_edge_df

# ---------------------------------------------------------------------------
# MOD graph
# ---------------------------------------------------------------------------


def _n_supp(spark: SparkSession, sf_dir: str) -> int:
    return spark.read.parquet(f"{sf_dir}/supplier.parquet").count()


SQL_NSUPP = "(SELECT COUNT(*) FROM supplier)"


def sql_edges_mod() -> str:
    return (
        "SELECT DISTINCT l_suppkey AS src, "
        f"((l_suppkey + l_partkey % 37) % {SQL_NSUPP}) + 1 AS dst "
        "FROM lineitem "
        f"WHERE l_suppkey != ((l_suppkey + l_partkey % 37) % {SQL_NSUPP}) + 1"
    )


def edges_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    ns = _n_supp(spark, sf_dir)
    dst = F.pmod(
        F.col("l_suppkey") + F.pmod(F.col("l_partkey"), F.lit(37)),
        F.lit(ns),
    ) + 1
    return (
        _lineitem(spark, sf_dir)
        .select(F.col("l_suppkey").alias("src"), dst.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _graph_mod(spark: SparkSession, sf_dir: str):
    return from_edge_df(edges_mod(spark, sf_dir))


# NOTE: under WITH RECURSIVE, DuckDB parses ANY `A UNION B` CTE body as a
# recursive CTE (base/step) and concatenates WITHOUT dedup — so the dedup
# must be an explicit DISTINCT over UNION ALL.
SQL_MOD_CTES = (
    "edges AS MATERIALIZED ({edges}),\n"
    "nodes AS MATERIALIZED (SELECT DISTINCT id FROM "
    "(SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges))"
)


def _mod_header() -> str:
    return SQL_MOD_CTES.format(edges=sql_edges_mod())


# -- BFS -------------------------------------------------------------------
def q_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.traverse import bfs

    g = _graph_mod(spark, sf_dir)
    src = g.vertices.agg(F.min("internal_id")).collect()[0][0]
    out = bfs(g, int(src))
    out = _to_original(out, g.vertices, "internal_id", "id")
    return out.select("id", F.col("hop").cast("long").alias("hop"))


def sql_bfs() -> str:
    return f"""
WITH RECURSIVE
{_mod_header()},
s0 AS (SELECT MIN(id) AS s FROM nodes),
reach(v, hop) AS (
  SELECT s, 0 FROM s0
  UNION
  SELECT e.dst, r.hop + 1 FROM reach r JOIN edges e ON e.src = r.v
  WHERE r.hop < 32
)
SELECT v AS id, CAST(MIN(hop) AS BIGINT) AS hop FROM reach GROUP BY v
"""


# -- SCC -------------------------------------------------------------------
def q_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.scc import scc

    g = _graph_mod(spark, sf_dir)
    out = scc(g)
    out = _to_original(out, g.vertices, "internal_id", "id")
    return _to_original(out, g.vertices, "component", "component").select(
        "id", "component"
    )


def sql_scc() -> str:
    # component id == MAX member id of the SCC (the FB-coloring root is
    # always its SCC's max id: any larger member reaches the root, which
    # would raise the root's color above itself)
    return f"""
WITH RECURSIVE
{_mod_header()},
reach(s, v) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT r.s, e.dst FROM reach r JOIN edges e ON e.src = r.v
)
SELECT a.s AS id, MAX(a.v) AS component
FROM reach a JOIN reach b ON a.s = b.v AND a.v = b.s
GROUP BY a.s
"""


# -- Betweenness (exact Brandes) ------------------------------------------
BC_MAX_DEPTH = 32  # must exceed the mod-graph diameter at every
# swept sf (3 at sf0.01 but 28 at sf0.1 — same trap the
# all_shortest_paths oracle hit); unrolled levels beyond the true
# diameter join empty frontiers, so the sf0.01 cost is unchanged


def q_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.betweenness import betweenness

    g = _graph_mod(spark, sf_dir)
    out = betweenness(g)
    out = _to_original(out, g.vertices, "internal_id", "id")
    return out.select("id", F.round("score", 5).alias("score"))


def sql_betweenness() -> str:
    D = BC_MAX_DEPTH
    ctes = [
        _mod_header(),
        f"""reach(s, v, d) AS (
  SELECT id, id, 0 FROM nodes
  UNION
  SELECT r.s, e.dst, r.d + 1 FROM reach r JOIN edges e ON e.src = r.v
  WHERE r.d < {D})""",
        "dist AS MATERIALIZED (SELECT s, v, MIN(d) AS d FROM reach "
        "GROUP BY s, v)",
        "sig0 AS (SELECT id AS s, id AS v, CAST(1 AS DOUBLE) AS cnt "
        "FROM nodes)",
    ]
    for k in range(1, D + 1):
        ctes.append(
            f"sig{k} AS MATERIALIZED (SELECT p.s, e.dst AS v, SUM(p.cnt) AS cnt "
            f"FROM sig{k - 1} p JOIN edges e ON e.src = p.v "
            f"JOIN dist dd ON dd.s = p.s AND dd.v = e.dst AND dd.d = {k} "
            f"GROUP BY p.s, e.dst)"
        )
    ctes.append(
        "sigma AS MATERIALIZED ("
        + " UNION ALL ".join(
            f"SELECT s, v, cnt, {k} AS d FROM sig{k}" for k in range(D + 1)
        )
        + ")"
    )
    # backward dependency accumulation: delta at depth k from depth k+1
    ctes.append(
        f"delta{D} AS MATERIALIZED (SELECT s, v, CAST(0 AS DOUBLE) AS delta "
        f"FROM sigma WHERE d = {D})"
    )
    for k in range(D - 1, -1, -1):
        ctes.append(
            f"""delta{k} AS MATERIALIZED (
  SELECT sv.s, sv.v,
         COALESCE(SUM(sv.cnt / sw.cnt * (1 + dw.delta)), 0) AS delta
  FROM sigma sv
  LEFT JOIN edges e ON e.src = sv.v
  LEFT JOIN sigma sw ON sw.s = sv.s AND sw.v = e.dst AND sw.d = {k + 1}
  LEFT JOIN delta{k + 1} dw ON dw.s = sv.s AND dw.v = e.dst
  WHERE sv.d = {k} AND (sw.v IS NULL OR dw.v IS NOT NULL)
  GROUP BY sv.s, sv.v)"""
        )
    ctes.append(
        "alldelta AS ("
        + " UNION ALL ".join(
            f"SELECT s, v, delta FROM delta{k}" for k in range(D + 1)
        )
        + ")"
    )
    return (
        "WITH RECURSIVE " + ",\n".join(ctes)
        + """
SELECT n.id, ROUND(COALESCE(b.score, 0), 5) AS score
FROM nodes n LEFT JOIN (
  SELECT v AS id, SUM(delta) AS score FROM alldelta WHERE s != v GROUP BY v
) b ON b.id = n.id
"""
    )


# -- HITS ------------------------------------------------------------------
HITS_ITERS = 4


def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.hits import hits

    g = _graph_mod(spark, sf_dir)
    out = hits(g, max_iterations=HITS_ITERS, tolerance=0.0).scores
    out = _to_original(out, g.vertices, "internal_id", "id")
    return out.select(
        "id", F.round("hub", 6).alias("hub"), F.round("auth", 6).alias("auth")
    )


def sql_hits() -> str:
    # mirrors operators/hits.py exactly: per iteration
    #   auth_raw = sum_in(hub);  auth = auth_raw / ||auth_raw||_2
    #   hub_raw  = sum_out(auth); hub = hub_raw / ||hub_raw||_2
    ctes = [
        _mod_header(),
        "s0 AS (SELECT id, CAST(1 AS DOUBLE) AS hub, CAST(1 AS DOUBLE) "
        "AS auth FROM nodes)",
    ]
    for k in range(1, HITS_ITERS + 1):
        p = f"s{k - 1}"
        ctes.append(
            f"araw{k} AS MATERIALIZED (SELECT n.id, COALESCE(m.v, 0) AS v FROM nodes n "
            f"LEFT JOIN (SELECT e.dst AS id, SUM(p.hub) AS v FROM edges e "
            f"JOIN {p} p ON p.id = e.src GROUP BY e.dst) m ON m.id = n.id)"
        )
        ctes.append(
            f"anrm{k} AS (SELECT CASE WHEN SUM(v*v) = 0 THEN 1 "
            f"ELSE sqrt(SUM(v*v)) END AS z FROM araw{k})"
        )
        ctes.append(
            f"hraw{k} AS MATERIALIZED (SELECT n.id, COALESCE(m.v, 0) AS v FROM nodes n "
            f"LEFT JOIN (SELECT e.src AS id, "
            f"SUM(a.v / (SELECT z FROM anrm{k})) AS v "
            f"FROM edges e JOIN araw{k} a ON a.id = e.dst GROUP BY e.src) m "
            f"ON m.id = n.id)"
        )
        ctes.append(
            f"hnrm{k} AS (SELECT CASE WHEN SUM(v*v) = 0 THEN 1 "
            f"ELSE sqrt(SUM(v*v)) END AS z FROM hraw{k})"
        )
        ctes.append(
            f"s{k} AS MATERIALIZED (SELECT h.id, h.v / (SELECT z FROM hnrm{k}) AS hub, "
            f"a.v / (SELECT z FROM anrm{k}) AS auth "
            f"FROM hraw{k} h JOIN araw{k} a ON a.id = h.id)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, ROUND(hub, 6) AS hub, ROUND(auth, 6) AS auth "
        f"FROM s{HITS_ITERS}"
    )


# ---------------------------------------------------------------------------
# 2-hop DAG: customer -> order -> supplier (shortest-path family)
# ---------------------------------------------------------------------------
CUST_OFFSET = 20_000_000
ORDER_OFFSET = 30_000_000

SQL_DAG_EDGES = f"""
SELECT o_custkey + {CUST_OFFSET} AS src, o_orderkey + {ORDER_OFFSET} AS dst,
       1.0 + (o_orderkey % 97) / 10.0 AS weight
FROM orders
UNION ALL
SELECT DISTINCT l_orderkey + {ORDER_OFFSET} AS src, l_suppkey AS dst,
       1.0 + (l_suppkey % 53) / 10.0 AS weight
FROM lineitem
"""


def edges_dag(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = _lineitem(spark, sf_dir)
    e1 = orders.select(
        (F.col("o_custkey") + CUST_OFFSET).alias("src"),
        (F.col("o_orderkey") + ORDER_OFFSET).alias("dst"),
        (1.0 + F.pmod(F.col("o_orderkey"), F.lit(97)) / 10.0).alias(
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
            "src",
            "dst",
            (1.0 + F.pmod(F.col("dst"), F.lit(53)) / 10.0).alias("weight"),
        )
    )
    return e1.unionByName(e2)


def _graph_dag(spark: SparkSession, sf_dir: str):
    return from_edge_df(edges_dag(spark, sf_dir), weight="weight")


def _path_to_original(paths: DataFrame, vertices: DataFrame) -> DataFrame:
    """Map node_ids (internal) to an original-id '->' string column."""
    m = vertices.select(
        F.col("internal_id").alias("__pid"),
        F.col("original_id").cast("long").alias("__oid"),
    )
    ex = paths.select(
        "target_node",
        "total_cost",
        F.posexplode("node_ids").alias("pos", "__pid"),
    ).join(m, "__pid")
    return (
        ex.groupBy("target_node", "total_cost")
        .agg(
            F.concat_ws(
                "->",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "__oid"))
                    ),
                    lambda s: s["__oid"].cast("string"),
                ),
            ).alias("path")
        )
    )


def q_dijkstra_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.paths import dijkstra_path

    g = _graph_dag(spark, sf_dir)
    src_orig = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .agg(F.min("o_custkey"))
        .collect()[0][0]
        + CUST_OFFSET
    )
    src = (
        g.vertices.filter(F.col("original_id").cast("long") == src_orig)
        .collect()[0]["internal_id"]
    )
    paths = dijkstra_path(g, int(src))
    out = _path_to_original(paths, g.vertices)
    tgt = _to_original(
        out.withColumnRenamed("target_node", "t"), g.vertices, "t", "target"
    )
    return tgt.select(
        "target", F.round("total_cost", 6).alias("total_cost"), "path"
    )


def sql_dijkstra_path() -> str:
    # source = min customer; targets = the source itself (trivial path),
    # every order of it (1 hop) and every reachable supplier (2 hops, min
    # total cost, tie -> smallest order id which is also the smallest
    # internal predecessor under the order-isomorphic id map). Ids keep
    # their offsets — they ARE the original ids of the DAG graph.
    return f"""
WITH dag AS MATERIALIZED ({SQL_DAG_EDGES}),
c0 AS (SELECT MIN(src) AS s FROM dag WHERE src >= {CUST_OFFSET}),
hop1 AS (SELECT d.dst AS o, d.weight AS w1 FROM dag d, c0
         WHERE d.src = c0.s),
t0 AS (SELECT s AS target, CAST(0 AS DOUBLE) AS cost, s::VARCHAR AS path
       FROM c0),
-- order targets
t1 AS (SELECT o AS target, w1 AS cost,
       (SELECT s FROM c0)::VARCHAR || '->' || o::VARCHAR AS path FROM hop1),
-- supplier targets: min total cost, then smallest intermediate order
hop2 AS (SELECT h.o, h.w1, d.dst AS sup, h.w1 + d.weight AS cost
         FROM hop1 h JOIN dag d ON d.src = h.o),
best AS (SELECT sup, MIN(cost) AS cost FROM hop2 GROUP BY sup),
pick AS (SELECT h.sup AS target, b.cost, MIN(h.o) AS via
         FROM hop2 h JOIN best b ON b.sup = h.sup AND h.cost = b.cost
         GROUP BY h.sup, b.cost),
t2 AS (SELECT target, cost,
       (SELECT s FROM c0)::VARCHAR || '->' || via::VARCHAR || '->' ||
       target::VARCHAR AS path FROM pick),
allt AS (SELECT * FROM t0 UNION ALL SELECT * FROM t1
         UNION ALL SELECT * FROM t2)
SELECT target, ROUND(cost, 6) AS total_cost, path FROM allt
"""



def _dag_src_tgt(spark: SparkSession, sf_dir: str) -> tuple[int, int]:
    """(source, target) original ids for the 2-hop DAG oracles: source =
    min customer; target = min supplier reachable from it (a global-min
    supplier may not appear in the source's orders)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c0 = int(orders.agg(F.min("o_custkey")).collect()[0][0])
    li = _lineitem(spark, sf_dir)
    tgt = int(
        orders.filter(F.col("o_custkey") == c0)
        .select(F.col("o_orderkey").alias("l_orderkey"))
        .join(li.select("l_orderkey", "l_suppkey"), "l_orderkey")
        .agg(F.min("l_suppkey"))
        .collect()[0][0]
    )
    return c0 + CUST_OFFSET, tgt


YENS_K = 3


def q_yens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.paths import yens_k_shortest

    g = _graph_dag(spark, sf_dir)
    src_orig, tgt_orig = _dag_src_tgt(spark, sf_dir)
    vmap = {
        int(r["original_id"]): r["internal_id"]
        for r in g.vertices.filter(
            F.col("original_id").cast("long").isin([src_orig, int(tgt_orig)])
        ).collect()
    }
    paths = yens_k_shortest(
        g, int(vmap[src_orig]), int(vmap[int(tgt_orig)]), YENS_K
    )
    out = _path_to_original(
        paths.withColumnRenamed("index", "idx"), g.vertices
    )
    # recover index by cost order (deterministic: cost then path string)
    from pyspark.sql.window import Window

    return out.select(
        F.round("total_cost", 6).alias("total_cost"), "path"
    ).withColumn(
        "index",
        F.row_number().over(Window.orderBy("total_cost", "path")) - 1,
    ).select("index", "total_cost", "path")


def sql_yens() -> str:
    # all loopless c0->target paths in the 2-hop DAG are c0 -> o -> target:
    # the K shortest = top-K orders by (w1 + w2), tie -> smaller order id
    return f"""
WITH dag AS MATERIALIZED ({SQL_DAG_EDGES}),
c0 AS (SELECT MIN(src) AS s FROM dag WHERE src >= {CUST_OFFSET}),
t0 AS (SELECT MIN(d2.dst) AS t FROM dag d1 JOIN dag d2 ON d2.src = d1.dst, c0 WHERE d1.src = c0.s AND d2.dst < {CUST_OFFSET}),
cand AS (
  SELECT d1.dst AS o, d1.weight + d2.weight AS cost
  FROM dag d1 JOIN dag d2 ON d2.src = d1.dst, c0, t0
  WHERE d1.src = c0.s AND d2.dst = t0.t),
ranked AS (
  SELECT cost, o, ROW_NUMBER() OVER (ORDER BY cost, o) AS rn FROM cand)
SELECT rn - 1 AS index, ROUND(cost, 6) AS total_cost,
       (SELECT s FROM c0)::VARCHAR || '->' || o::VARCHAR || '->' ||
       (SELECT t FROM t0)::VARCHAR AS path
FROM ranked WHERE rn <= {YENS_K}
ORDER BY rn
"""


def q_astar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.paths import astar_path

    g = _graph_dag(spark, sf_dir)
    src_orig, tgt_orig = _dag_src_tgt(spark, sf_dir)
    vmap = {
        int(r["original_id"]): r["internal_id"]
        for r in g.vertices.filter(
            F.col("original_id").cast("long").isin([src_orig, tgt_orig])
        ).collect()
    }
    # admissible arithmetic heuristic: 0 for the target, 1 elsewhere —
    # every remaining path costs >= 1 (all weights >= 1)
    h = g.vertices.select(
        "internal_id",
        F.when(
            F.col("internal_id") == int(vmap[tgt_orig]), F.lit(0.0)
        ).otherwise(F.lit(1.0)).alias("h"),
    )
    paths = astar_path(g, int(vmap[src_orig]), int(vmap[tgt_orig]), h)
    out = _path_to_original(paths, g.vertices)
    return out.select(
        F.round("total_cost", 6).alias("total_cost"), "path"
    )


def sql_astar() -> str:
    return f"""
WITH dag AS MATERIALIZED ({SQL_DAG_EDGES}),
c0 AS (SELECT MIN(src) AS s FROM dag WHERE src >= {CUST_OFFSET}),
t0 AS (SELECT MIN(d2.dst) AS t FROM dag d1 JOIN dag d2 ON d2.src = d1.dst, c0 WHERE d1.src = c0.s AND d2.dst < {CUST_OFFSET}),
cand AS (
  SELECT d1.dst AS o, d1.weight + d2.weight AS cost
  FROM dag d1 JOIN dag d2 ON d2.src = d1.dst, c0, t0
  WHERE d1.src = c0.s AND d2.dst = t0.t)
SELECT ROUND(MIN(cost), 6) AS total_cost,
       (SELECT s FROM c0)::VARCHAR || '->' ||
       (SELECT MIN(o) FROM cand WHERE cost = (SELECT MIN(cost) FROM cand))
       ::VARCHAR || '->' || (SELECT t FROM t0)::VARCHAR AS path
FROM cand
"""


# ---------------------------------------------------------------------------
# Modularity metric, scalers, one-hot, similarity fns, split, wcc variants,
# pagerank variants, triangle stream, balanced triads
# ---------------------------------------------------------------------------
def q_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.louvain import _sym_edges, modularity
    from .operators.wcc import wcc

    g = _graph_sp(spark, sf_dir)
    comp = wcc(g).select(
        "internal_id", F.col("component").alias("community")
    )
    q = modularity(_sym_edges(g), comp)
    return spark.createDataFrame([(round(q, 6),)], "modularity double")


def sql_modularity() -> str:
    return f"""
WITH base AS MATERIALIZED ({sql_wcc()}),
edges AS MATERIALIZED ({SQL_EDGES_SP}),
idmap AS (SELECT id, ROW_NUMBER() OVER (ORDER BY id) - 1 AS iid FROM
          (SELECT DISTINCT id FROM base)),
comp AS (SELECT m.iid AS v, cm.iid AS c FROM base b
         JOIN idmap m ON m.id = b.id JOIN idmap cm ON cm.id = b.component),
iedges AS (SELECT ms.iid AS src, md.iid AS dst, e.weight FROM edges e
           JOIN idmap ms ON ms.id = e.src JOIN idmap md ON md.id = e.dst),
sym AS MATERIALIZED (
  SELECT src, dst, SUM(weight) AS w FROM (
    SELECT src, dst, weight FROM iedges
    UNION ALL SELECT dst, src, weight FROM iedges) GROUP BY src, dst),
m2 AS (SELECT SUM(w) AS m FROM sym),
inside AS (SELECT COALESCE(SUM(s.w), 0) AS i FROM sym s
           JOIN comp a ON a.v = s.src JOIN comp b ON b.v = s.dst
           WHERE a.c = b.c),
deg AS (SELECT src, SUM(w) AS d FROM sym GROUP BY src),
tot AS (SELECT SUM(t * t) AS t2 FROM (
  SELECT SUM(d.d) AS t FROM deg d JOIN comp c ON c.v = d.src GROUP BY c.c))
SELECT ROUND((SELECT i FROM inside) / (SELECT m FROM m2)
       - (SELECT t2 FROM tot) / ((SELECT m FROM m2) * (SELECT m FROM m2)),
       6) AS modularity
"""


def q_scale_properties(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.scaling import scale_column

    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        F.col("s_suppkey").alias("id"),
        F.col("s_acctbal").cast("double").alias("x"),
    )
    out = sup
    for v in ("MAX", "MINMAX", "MEAN", "STDSCORE", "L1NORM", "L2NORM"):
        out = out.withColumn(v.lower(), F.col("x"))
        out = scale_column(out, v.lower(), v)
    return out.select(
        "id",
        *[F.round(v.lower(), 6).alias(v.lower())
          for v in ("MAX", "MINMAX", "MEAN", "STDSCORE", "L1NORM", "L2NORM")],
    )


def sql_scale_properties() -> str:
    return """
WITH s AS (SELECT s_suppkey AS id, CAST(s_acctbal AS DOUBLE) AS x
           FROM supplier),
st AS (SELECT MAX(ABS(x)) AS absmax, MIN(x) AS mn, MAX(x) AS mx,
              AVG(x) AS mean, stddev_pop(x) AS sd, SUM(ABS(x)) AS l1,
              sqrt(SUM(x*x)) AS l2 FROM s)
SELECT id,
  ROUND(CASE WHEN st.absmax = 0 THEN 0 ELSE x / st.absmax END, 6) AS max,
  ROUND(CASE WHEN st.mx - st.mn = 0 THEN 0
        ELSE (x - st.mn) / (st.mx - st.mn) END, 6) AS minmax,
  ROUND(CASE WHEN st.mx - st.mn = 0 THEN 0
        ELSE (x - st.mean) / (st.mx - st.mn) END, 6) AS mean,
  ROUND(CASE WHEN st.sd = 0 THEN 0 ELSE (x - st.mean) / st.sd END, 6)
    AS stdscore,
  ROUND(CASE WHEN st.l1 = 0 THEN 0 ELSE x / st.l1 END, 6) AS l1norm,
  ROUND(CASE WHEN st.l2 = 0 THEN 0 ELSE x / st.l2 END, 6) AS l2norm
FROM s, st
"""


def q_one_hot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.mlops import one_hot_encoding

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        F.col("n_nationkey").alias("id"), F.col("n_name").alias("cat")
    )
    enc = one_hot_encoding(nation, "cat")
    return enc.select(
        "id", F.posexplode("cat_onehot").alias("pos", "bit")
    ).select("id", "pos", F.col("bit").cast("long").alias("bit"))


def sql_one_hot() -> str:
    return """
WITH n AS (SELECT n_nationkey AS id, n_name AS cat FROM nation),
cats AS (SELECT cat, ROW_NUMBER() OVER (ORDER BY cat) - 1 AS pos
         FROM (SELECT DISTINCT cat FROM n))
SELECT n.id, c.pos,
       CASE WHEN n.cat = c.cat THEN 1 ELSE 0 END::BIGINT AS bit
FROM n CROSS JOIN cats c
"""


SIM_MAX_ID = 20


def q_similarity_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.similarity import cosine, euclidean, euclidean_distance, pearson

    e = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") < SIM_MAX_ID)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )
    a = e.select(F.col("vec_id").alias("a"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("b"), F.col("v").alias("vb"))
    pairs = a.join(b, F.col("a") < F.col("b"))
    return pairs.select(
        "a",
        "b",
        F.round(cosine("va", "vb"), 6).alias("cosine"),
        F.round(euclidean_distance("va", "vb"), 6).alias("euclidean_distance"),
        F.round(euclidean("va", "vb"), 6).alias("euclidean"),
        F.round(pearson("va", "vb"), 6).alias("pearson"),
    )


def sql_similarity_functions() -> str:
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
           WHERE vec_id < {SIM_MAX_ID}),
p AS (SELECT a.vec_id AS a, b.vec_id AS b, a.v AS va, b.v AS vb
      FROM e a JOIN e b ON a.vec_id < b.vec_id),
m AS (SELECT a, b, va, vb,
        list_dot_product(va, vb) AS dot,
        sqrt(list_dot_product(va, va)) AS na,
        sqrt(list_dot_product(vb, vb)) AS nb,
        list_sum(va) / len(va) AS ma,
        list_sum(vb) / len(vb) AS mb,
        sqrt(list_sum(list_transform(
          list_zip(va, vb), x -> (x[1] - x[2]) * (x[1] - x[2])))) AS ed
      FROM p)
SELECT a, b,
  ROUND(dot / (na * nb), 6) AS cosine,
  ROUND(ed, 6) AS euclidean_distance,
  ROUND(1.0 / (1.0 + ed), 6) AS euclidean,
  ROUND(
    list_sum(list_transform(list_zip(va, vb),
                            x -> (x[1] - ma) * (x[2] - mb))) /
    (sqrt(list_sum(list_transform(va, x -> (x - ma) * (x - ma)))) *
     sqrt(list_sum(list_transform(vb, x -> (x - mb) * (x - mb))))), 6)
    AS pearson
FROM m
"""


SPLIT_FRACTION = 0.3
SPLIT_SEED = 42


def q_split_relationships(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.mlops import split_relationships

    g = _graph_sp(spark, sf_dir)
    _remaining, test = split_relationships(
        g,
        holdout_fraction=SPLIT_FRACTION,
        negative_sampling_ratio=1.0,
        seed=SPLIT_SEED,
    )
    out = _to_original(test, g.vertices, "src", "src_id")
    out = _to_original(out, g.vertices, "dst", "dst_id")
    return out.select(
        "src_id", "dst_id", F.col("label").cast("long").alias("label")
    )


def sql_split_relationships() -> str:
    mod = 1_000_003
    cut = int(SPLIT_FRACTION * mod)
    s = SPLIT_SEED
    return f"""
WITH edges AS MATERIALIZED ({SQL_EDGES_SP}),
idmap AS MATERIALIZED (
  SELECT id, ROW_NUMBER() OVER (ORDER BY id) - 1 AS iid FROM (
    SELECT src AS id FROM edges UNION SELECT dst FROM edges)),
n AS (SELECT COUNT(*) AS n FROM idmap),
ie AS MATERIALIZED (
  SELECT ms.iid AS src, md.iid AS dst, e.src AS osrc, e.dst AS odst
  FROM edges e JOIN idmap ms ON ms.id = e.src
               JOIN idmap md ON md.id = e.dst),
pos AS (SELECT osrc AS src_id, odst AS dst_id FROM ie
        WHERE (src * 2654435761 + dst * 40503 + {s * 97}) % {mod} < {cut}),
npos AS (SELECT COUNT(*) AS k FROM pos),
cand AS (
  -- squared-LCG negative endpoints (mirrors mlops.split_relationships:
  -- h = i*a + b mod 2^31-1, endpoint = h*h mod 2^31-1 mod n)
  SELECT DISTINCT
    (((i * 48271 + {12345 + s * 7919}) % 2147483647)
     * ((i * 48271 + {12345 + s * 7919}) % 2147483647) % 2147483647)
      % (SELECT n FROM n) AS src,
    (((i * 69621 + {54321 + s * 104729}) % 2147483647)
     * ((i * 69621 + {54321 + s * 104729}) % 2147483647) % 2147483647)
      % (SELECT n FROM n) AS dst
  FROM range(0, 5000000) t(i)
  WHERE i < (SELECT CAST(k * 2.5 AS BIGINT) + 8 FROM npos)),
neg0 AS (
  SELECT c.src, c.dst FROM cand c
  WHERE c.src != c.dst AND NOT EXISTS (
    SELECT 1 FROM ie WHERE ie.src = c.src AND ie.dst = c.dst)),
neg AS (
  SELECT src, dst FROM (
    SELECT src, dst, ROW_NUMBER() OVER (ORDER BY
      (src * 2654435761 + dst * 40503 + {(s + 1) * 97}) % {mod}, src, dst)
      AS rn FROM neg0)
  WHERE rn <= (SELECT k FROM npos))
SELECT src_id, dst_id, 1::BIGINT AS label FROM pos
UNION ALL
SELECT ms.id AS src_id, md.id AS dst_id, 0::BIGINT AS label FROM neg
JOIN idmap ms ON ms.iid = neg.src JOIN idmap md ON md.iid = neg.dst
"""


WCC_THRESHOLD = 2.0


def q_wcc_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.wcc import wcc

    g = _graph_sp(spark, sf_dir)
    comp = wcc(g, threshold=WCC_THRESHOLD)
    comp = _to_original(comp, g.vertices, "internal_id", "id")
    return _to_original(comp, g.vertices, "component", "component").select(
        "id", "component"
    )


def sql_wcc_threshold() -> str:
    return f"""
WITH RECURSIVE
edges AS MATERIALIZED ({SQL_EDGES_SP}),
nodes AS ({SQL_NODES_SP}),
fe AS (SELECT src, dst FROM edges WHERE weight > {WCC_THRESHOLD}),
sym AS (SELECT src, dst FROM fe UNION SELECT dst, src FROM fe),
reach(id, lab) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT s.dst AS id, r.lab FROM reach r JOIN sym s ON s.src = r.id
)
SELECT id, MIN(lab) AS component FROM reach GROUP BY id
"""


PPR_ITERS = 6
PPR_SOURCES = 3  # the 3 smallest supplier ids


def q_pagerank_personalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.pagerank import pagerank

    g = _graph_pr(spark, sf_dir)
    srcs = [
        int(r["original_id"])
        for r in g.vertices.orderBy("internal_id").limit(PPR_SOURCES).collect()
    ]
    out = pagerank(
        g,
        damping=0.85,
        tolerance=0.0,
        max_iterations=PPR_ITERS + 1,
        source_nodes=srcs,
    ).scores
    out = _to_original(out, g.vertices, "internal_id", "id")
    return out.select("id", F.round("score", 6).alias("score"))


def sql_pagerank_personalized() -> str:
    from .driver_contract import SQL_EDGES_PR

    ctes = [
        f"edges AS MATERIALIZED ({SQL_EDGES_PR})",
        f"nodes AS MATERIALIZED ({SQL_NODES_SP})",
        f"srcs AS (SELECT id FROM nodes ORDER BY id LIMIT {PPR_SOURCES})",
        "deg AS (SELECT src AS id, CAST(COUNT(*) AS DOUBLE) AS deg "
        "FROM edges GROUP BY src)",
        "r0 AS (SELECT n.id, CASE WHEN n.id IN (SELECT id FROM srcs) "
        "THEN CAST(0.15 AS DOUBLE) ELSE 0 END AS rank, "
        "CASE WHEN n.id IN (SELECT id FROM srcs) THEN CAST(0.15 AS DOUBLE) "
        "ELSE 0 END AS delta FROM nodes n)",
    ]
    for k in range(1, PPR_ITERS + 1):
        ctes.append(
            f"r{k} AS (SELECT n.id, p.rank + 0.85 * COALESCE(m.s, 0) AS rank, "
            f"0.85 * COALESCE(m.s, 0) AS delta "
            f"FROM nodes n JOIN r{k - 1} p ON p.id = n.id LEFT JOIN ("
            f"SELECT e.dst AS id, SUM(r.delta / d.deg) AS s "
            f"FROM edges e JOIN r{k - 1} r ON r.id = e.src "
            f"JOIN deg d ON d.id = e.src GROUP BY e.dst) m ON m.id = n.id)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, ROUND(rank, 6) AS score FROM r{PPR_ITERS}"
    )


PRW_ITERS = 6


def q_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.pagerank import pagerank

    # weighted symmetrized co-supplier graph: weight = number of shared
    # parts for the pair
    li = _lineitem(spark, sf_dir).select("l_suppkey", "l_partkey").distinct()
    a = li.select(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("a"))
    b = li.select(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("b"))
    canon = (
        a.join(b, "pk")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )
    sym = canon.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "weight"
    ).unionByName(
        canon.select(
            F.col("b").alias("src"), F.col("a").alias("dst"), "weight"
        )
    )
    g = from_edge_df(sym, weight="weight")
    out = pagerank(
        g,
        damping=0.85,
        tolerance=0.0,
        max_iterations=PRW_ITERS + 1,
        weighted=True,
    ).scores
    out = _to_original(out, g.vertices, "internal_id", "id")
    return out.select("id", F.round("score", 6).alias("score"))


def sql_pagerank_weighted() -> str:
    ctes = [
        "li AS MATERIALIZED (SELECT DISTINCT l_suppkey, l_partkey "
        "FROM lineitem)",
        "canon AS (SELECT a.l_suppkey AS a, b.l_suppkey AS b, "
        "CAST(COUNT(*) AS DOUBLE) AS w FROM li a "
        "JOIN li b ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey "
        "GROUP BY 1, 2)",
        "edges AS MATERIALIZED (SELECT a AS src, b AS dst, w FROM canon "
        "UNION ALL SELECT b, a, w FROM canon)",
        "nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges)",
        "deg AS (SELECT src AS id, SUM(CASE WHEN w > 0 THEN w ELSE 0 END) "
        "AS deg FROM edges GROUP BY src)",
        "r0 AS (SELECT id, CAST(0.15 AS DOUBLE) AS rank, "
        "CAST(0.15 AS DOUBLE) AS delta FROM nodes)",
    ]
    for k in range(1, PRW_ITERS + 1):
        ctes.append(
            f"r{k} AS (SELECT n.id, p.rank + 0.85 * COALESCE(m.s, 0) AS rank, "
            f"0.85 * COALESCE(m.s, 0) AS delta "
            f"FROM nodes n JOIN r{k - 1} p ON p.id = n.id LEFT JOIN ("
            f"SELECT e.dst AS id, SUM(r.delta / d.deg * e.w) AS s "
            f"FROM edges e JOIN r{k - 1} r ON r.id = e.src "
            f"JOIN deg d ON d.id = e.src GROUP BY e.dst) m ON m.id = n.id)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, ROUND(rank, 6) AS score FROM r{PRW_ITERS}"
    )


def q_triangle_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .graph import UNDIRECTED
    from .operators.triangle import triangles_stream

    e = edges_ss(spark, sf_dir).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )
    g = from_edge_df(e, orientation=UNDIRECTED)
    tri = triangles_stream(g)
    tri = _to_original(tri, g.vertices, "node_a", "node_a")
    tri = _to_original(tri, g.vertices, "node_b", "node_b")
    tri = _to_original(tri, g.vertices, "node_c", "node_c")
    return tri.select("node_a", "node_b", "node_c")


def sql_triangle_stream() -> str:
    return f"""
WITH canon AS MATERIALIZED ({SQL_EDGES_SS})
SELECT e1.a AS node_a, e1.b AS node_b, e2.b AS node_c
FROM canon e1 JOIN canon e2 ON e2.a = e1.b
JOIN canon e3 ON e3.a = e1.a AND e3.b = e2.b
"""


def q_balanced_triads(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.triangle import balanced_triads

    e = edges_ss(spark, sf_dir).select(
        F.col("a").alias("src"),
        F.col("b").alias("dst"),
        F.when(
            F.pmod(F.col("a") + F.col("b"), F.lit(3)) == 0, F.lit(-1.0)
        ).otherwise(F.lit(1.0)).alias("weight"),
    )
    g = from_edge_df(e, weight="weight")
    out = balanced_triads(g)
    out = _to_original(out, g.vertices, "internal_id", "id")
    return out.select("id", "balanced", "unbalanced")


def sql_balanced_triads() -> str:
    return f"""
WITH canon AS MATERIALIZED (
  SELECT a, b, CASE WHEN (a + b) % 3 = 0 THEN FALSE ELSE TRUE END AS pos
  FROM ({SQL_EDGES_SS})),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z,
         (CAST(e1.pos AS INT) + CAST(e2.pos AS INT) + CAST(e3.pos AS INT))
           % 2 = 1 AS balanced
  FROM canon e1 JOIN canon e2 ON e2.a = e1.b
  JOIN canon e3 ON e3.a = e1.a AND e3.b = e2.b),
corners AS (
  SELECT x AS id, balanced FROM tri
  UNION ALL SELECT y, balanced FROM tri
  UNION ALL SELECT z, balanced FROM tri),
nodes AS (SELECT a AS id FROM canon UNION SELECT b FROM canon)
SELECT n.id,
  COALESCE(SUM(CASE WHEN c.balanced THEN 1 ELSE 0 END), 0)::BIGINT
    AS balanced,
  COALESCE(SUM(CASE WHEN c.balanced THEN 0 ELSE 1 END), 0)::BIGINT
    AS unbalanced
FROM nodes n LEFT JOIN corners c ON c.id = n.id
GROUP BY n.id
"""


# ---------------------------------------------------------------------------
# rows-only entries (engine-specific hashing / seeded numpy / schedule-
# dependent — the driver records a rows+schema check; pytest covers values)
# ---------------------------------------------------------------------------
def q_louvain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.louvain import louvain

    g = _graph_sp(spark, sf_dir)
    res = louvain(g)
    out = _to_original(res.assignment, g.vertices, "internal_id", "id")
    return _to_original(out, g.vertices, "community", "community").select(
        "id", "community"
    )


def q_k1coloring(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .graph import UNDIRECTED
    from .operators.k1coloring import k1coloring

    e = edges_mod(spark, sf_dir)
    g = from_edge_df(e, orientation=UNDIRECTED)
    colors, _ran, conv = k1coloring(g, max_iterations=100)
    assert conv, "k1coloring did not converge within 100 rounds"
    out = _to_original(colors, g.vertices, "internal_id", "id")
    return out.select("id", "color")


def q_fastrp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.fastrp import fastrp

    g = _graph_sp(spark, sf_dir)
    emb = fastrp(g, embedding_dim=16, iteration_weights=(1.0, 1.0))
    return _to_original(emb, g.vertices, "internal_id", "id").select(
        "id", F.size("embedding").alias("dim")
    )


def q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.knn import knn

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("internal_id"),
        F.col("embedding").alias("vec"),
    )
    from .graph import Graph

    g = Graph(emb, spark.createDataFrame([], "src long, dst long"))
    # bounded refinement for the driver gate (quality tested in pytest)
    return knn(g, "vec", top_k=3, iterations=3)


def q_random_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-oracle random walks: with the portable md5 step hash and
    rank-sorted adjacency, every walk is a pure function of
    (walk_id, step, graph) — DuckDB replays all of them with a recursive
    CTE and the full paths value-hash match. Ids are pinned to original
    suppkeys via the dense fast path (n_vertices covers the id range) so
    both engines walk the same id space. The path array is projected to a
    comma-joined string: the driver harness canonicalizes result rows via
    pandas sort/hash, which cannot handle list-typed cells."""
    from .graph import from_dense_edge_df
    from .operators.mlops import random_walks

    e = edges_mod(spark, sf_dir)
    ns = _n_supp(spark, sf_dir)
    g = from_dense_edge_df(e, n_vertices=ns + 1)
    starts = (
        e.select(F.col("src").alias("internal_id"))
        .unionAll(e.select(F.col("dst").alias("internal_id")))
        .distinct()
    )
    walks = random_walks(
        g, walks_per_node=2, walk_length=4, base_hash="md5",
        start_nodes=starts,
    )
    return walks.select(
        "walk_id", "start",
        F.array_join(F.col("path"), ",").alias("path_str"),
    )


def sql_random_walk() -> str:
    return f"""
WITH RECURSIVE
{_mod_header()},
nbrs AS MATERIALIZED (
  SELECT src, dst,
         ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS rk
  FROM edges
),
deg AS MATERIALIZED (SELECT src, COUNT(*) AS d FROM nbrs GROUP BY src),
starts AS (SELECT id * 2 + r.rep AS walk_id, id AS start
           FROM nodes, UNNEST(range(0, 2)) AS r(rep)),
walk(walk_id, start, step, cur, path) AS (
  SELECT walk_id, start, 0, start, [start] FROM starts
  UNION ALL
  SELECT w.walk_id, w.start, w.step + 1, n.dst,
         list_append(w.path, n.dst)
  FROM walk w
  JOIN deg d ON d.src = w.cur
  JOIN nbrs n ON n.src = w.cur
   AND n.rk = ('0x' || substr(md5(w.walk_id::VARCHAR || '|' ||
               w.step::VARCHAR || '|42'), 1, 15))::BIGINT % d.d
  WHERE w.step < 3
),
final AS (SELECT walk_id, start, path,
          ROW_NUMBER() OVER (PARTITION BY walk_id ORDER BY step DESC) AS rn
          FROM walk)
SELECT walk_id, start, array_to_string(path, ',') AS path_str
FROM final WHERE rn = 1
"""


def q_node2vec(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.mlops import node2vec

    g = _graph_mod(spark, sf_dir)
    emb = node2vec(
        g, embedding_dimension=16, walks_per_node=2, walk_length=6,
        iterations=1,
    )
    return _to_original(emb, g.vertices, "internal_id", "id").select(
        "id", F.size("embedding").alias("dim")
    )


def q_spanning_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-oracle MST: distinct per-edge weights make the minimum
    spanning forest unique (ref alpha/.../spanningTrees/Prim.java:48 — any
    correct algorithm returns the same edge set), so the full edge list is
    value-hash comparable against a DuckDB cut-property oracle. Runs on
    the sparse mod graph so the oracle's per-edge lighter-subgraph
    reachability CTE stays small."""
    from .operators.spanningtree import spanning_tree

    e = edges_mod(spark, sf_dir)
    canon = e.select(
        F.least("src", "dst").alias("a"),
        F.greatest("src", "dst").alias("b"),
    ).distinct()
    canon = canon.select(
        F.col("a").alias("src"),
        F.col("b").alias("dst"),
        # unique weight per undirected edge for any suppkey < 100000
        (F.col("a") * 100000 + F.col("b")).cast("double").alias("weight"),
    )
    g = from_edge_df(canon, weight="weight")
    tree = spanning_tree(g)
    # map internal ids back to original suppkeys and re-canonicalize
    tree = _to_original(tree, g.vertices, "src", "src_id")
    tree = _to_original(tree, g.vertices, "dst", "dst_id")
    return tree.select(
        F.least("src_id", "dst_id").alias("src"),
        F.greatest("src_id", "dst_id").alias("dst"),
        F.round("weight", 6).alias("weight"),
    )


def sql_spanning_tree() -> str:
    # Kruskal cut property: with all weights distinct, edge (a,b,w) is in
    # the (unique) minimum spanning forest iff b is NOT reachable from a
    # using only edges strictly lighter than w.
    return f"""
WITH RECURSIVE
raw AS MATERIALIZED ({sql_edges_mod()}),
canon AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b,
         CAST(LEAST(src, dst) * 100000 + GREATEST(src, dst) AS DOUBLE) AS w
  FROM raw
),
sym AS MATERIALIZED (
  SELECT a AS src, b AS dst, w FROM canon
  UNION ALL SELECT b, a, w FROM canon
),
reach(ea, eb, ew, node) AS (
  SELECT a, b, w, a FROM canon
  UNION
  SELECT r.ea, r.eb, r.ew, s.dst
  FROM reach r JOIN sym s ON s.src = r.node AND s.w < r.ew
)
SELECT c.a AS src, c.b AS dst, ROUND(c.w, 6) AS weight
FROM canon c
WHERE NOT EXISTS (
  SELECT 1 FROM reach r
  WHERE r.ea = c.a AND r.eb = c.b AND r.node = c.b
)
"""


def q_influence_celf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.influence import influence_maximization

    g = _graph_mod(spark, sf_dir)
    res = influence_maximization(
        g, 3, propagation_probability=0.2, monte_carlo_simulations=32
    )
    rows = [
        (i, s, round(gain, 6))
        for i, (s, gain) in enumerate(zip(res.seeds, res.gains))
    ]
    return spark.createDataFrame(
        rows, "rank long, seed long, gain double"
    )


# ---------------------------------------------------------------------------
# structural-validity oracles for the schedule-dependent operators: the
# VALUES (colors, communities, tree weights) are engine-specific, but the
# structural invariants GDS guarantees are SQL-checkable exactly —
# ref beta/k1coloring/K1Coloring.java:65 (proper coloring), Louvain.java
# (total assignment), Prim/SpanningTree (forest edge count = V − C).
# ---------------------------------------------------------------------------
def q_k1coloring_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proper-coloring invariant: every node colored, zero monochromatic
    edges. Violations computed Spark-side over the actual coloring."""
    from .graph import UNDIRECTED
    from .operators.k1coloring import k1coloring

    e = edges_mod(spark, sf_dir)
    g = from_edge_df(e, orientation=UNDIRECTED)
    colors, _ran, conv = k1coloring(g, max_iterations=100)
    assert conv, "k1coloring did not converge within 100 rounds"
    ca = colors.select(
        F.col("internal_id").alias("src"), F.col("color").alias("c_src")
    )
    cb = colors.select(
        F.col("internal_id").alias("dst"), F.col("color").alias("c_dst")
    )
    violations = (
        g.edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .join(ca, "src")
        .join(cb, "dst")
        .filter(F.col("c_src") == F.col("c_dst"))
        .count()
    )
    nodes_colored = colors.count()
    return spark.createDataFrame(
        [(nodes_colored, violations)],
        "nodes_colored long, violations long",
    )


def sql_k1coloring_validity() -> str:
    return f"""
WITH
{_mod_header()}
SELECT CAST(COUNT(*) AS BIGINT) AS nodes_colored,
       CAST(0 AS BIGINT) AS violations
FROM nodes
"""


def q_louvain_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every node assigned to exactly one community (GDS totality)."""
    from .operators.louvain import louvain

    g = _graph_sp(spark, sf_dir)
    res = louvain(g)
    return res.assignment.agg(
        F.count(F.lit(1)).alias("nodes_assigned"),
        (
            F.count(F.lit(1)) - F.countDistinct("internal_id")
        ).alias("duplicate_assignments"),
    )


def sql_louvain_validity() -> str:
    return f"""
WITH edges AS ({SQL_EDGES_SP}),
nodes AS ({SQL_NODES_SP})
SELECT CAST(COUNT(*) AS BIGINT) AS nodes_assigned,
       CAST(0 AS BIGINT) AS duplicate_assignments
FROM nodes
"""


def q_spanning_tree_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spanning-forest invariant: edge count = V − #components, checked
    against a recursive-CTE component count on the same co-supplier graph."""
    from .graph import UNDIRECTED
    from .operators.spanningtree import spanning_tree

    e = edges_ss(spark, sf_dir).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )
    g = from_edge_df(e.withColumn("weight", (F.col("src") * 1000
                     + F.col("dst")).cast("double")),
                     weight="weight", orientation=UNDIRECTED)
    tree = spanning_tree(g)
    return tree.agg(F.count(F.lit(1)).alias("n_edges"))


def sql_spanning_tree_validity() -> str:
    return f"""
WITH RECURSIVE
canon AS MATERIALIZED ({SQL_EDGES_SS}),
nodes AS MATERIALIZED (SELECT DISTINCT id FROM
  (SELECT a AS id FROM canon UNION ALL SELECT b FROM canon)),
sym AS MATERIALIZED (SELECT a AS src, b AS dst FROM canon
  UNION ALL SELECT b, a FROM canon),
reach(id, lab) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT s.dst AS id, r.lab FROM reach r JOIN sym s ON s.src = r.id
),
comp AS (SELECT id, MIN(lab) AS c FROM reach GROUP BY id)
SELECT CAST((SELECT COUNT(*) FROM comp)
          - (SELECT COUNT(DISTINCT c) FROM comp) AS BIGINT) AS n_edges
"""


def sql_fastrp() -> str:
    # values are seeded-hash-specific; the oracle pins TOTALITY + dim:
    # every SP-graph node carries an embedding of the requested dimension
    return f"""
WITH edges AS ({SQL_EDGES_SP}),
nodes AS ({SQL_NODES_SP})
SELECT id, 16 AS dim FROM nodes
"""


def sql_node2vec() -> str:
    # minCount=0 => every walked node (= every node; walks_per_node=2
    # start from each) gets a vector of the requested dimension
    return f"""
WITH
{_mod_header()}
SELECT id, 16 AS dim FROM nodes
"""


# ---------------------------------------------------------------------------
# GraphSage + ML training pipelines (round-2 closing of the last two
# SURVEY §2 families: gds.beta.graphSage.*, gds.alpha.ml.nodeClassification,
# gds.alpha.ml.linkPrediction). Trained weights are seeded-numpy /
# L-BFGS-specific, so the oracles pin the exact invariants instead:
# totality+dim for graphSage, the (arithmetically separable) decision rule
# for NC, and the hash-split arithmetic + structural flags for LP.
# ---------------------------------------------------------------------------
def q_graphsage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.gnn import graphsage_predict, graphsage_train

    g = _graph_mod(spark, sf_dir)
    model = graphsage_train(
        g, feature_cols=None, embedding_dim=8, sample_sizes=[4, 2],
        batch_size=32, epochs=2, seed=42,
    )
    emb = graphsage_predict(g, model)
    return _to_original(emb, g.vertices, "internal_id", "id").select(
        "id", F.size("embedding").alias("dim")
    )


def sql_graphsage() -> str:
    # weights are seeded-numpy-specific; the oracle pins TOTALITY + dim:
    # predict streams one embedding of the requested dim per node
    return f"""
WITH
{_mod_header()}
SELECT id, 8 AS dim FROM nodes
"""


def q_node_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train on suppliers with an arithmetically-separable label
    (s_acctbal > 4500, margin-1 indicator feature + a noise feature);
    the fitted model must reproduce the rule exactly on every node."""
    from .graph import Graph
    from .operators.mlpipe import (
        node_classification_predict,
        node_classification_train,
    )

    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        F.col("s_suppkey").alias("internal_id"),
        (F.col("s_acctbal") > 4500).cast("double").alias("sig"),
        F.col("s_nationkey").cast("double").alias("noise"),
        (F.col("s_acctbal") > 4500).cast("long").alias("cls"),
    )
    g = Graph(supp, spark.createDataFrame([], "src long, dst long"))
    model = node_classification_train(
        g, feature_cols=["sig", "noise"], target_col="cls",
        params=[{"penalty": 0.0, "max_iterations": 200}],
        metric="ACCURACY", seed=42,
    )
    return node_classification_predict(model, g).select(
        F.col("internal_id").alias("id"),
        F.col("predicted_class"),
    )


def sql_node_classification() -> str:
    return """
SELECT s_suppkey AS id,
       CAST(CASE WHEN s_acctbal > 4500 THEN 1 ELSE 0 END AS BIGINT)
         AS predicted_class
FROM supplier
"""


def q_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LP pipeline over the MOD graph (supplier features joined in).

    Oracle-checkable facts: the deterministic hash-split positive count,
    plus structural flags — AUCPR produced, every predicted pair a
    non-edge. (The AUCPR VALUE is optimizer-specific; quality is pinned
    by pytest on a feature-correlated fixture.)"""
    from .operators.mlpipe import (
        link_prediction_predict,
        link_prediction_train,
    )

    g = _graph_mod(spark, sf_dir)
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        F.col("s_suppkey").alias("original_id"),
        F.col("s_acctbal").cast("double").alias("acctbal"),
        F.col("s_nationkey").cast("double").alias("nkey"),
    )
    # copy, don't mutate: contract graphs must stay immutable (the shared
    # _graph_* builders are session-memoized)
    import dataclasses

    g = dataclasses.replace(
        g,
        vertices=g.vertices.join(supp, "original_id", "left").fillna(
            {"acctbal": 0.0, "nkey": 0.0}
        ),
    )
    from .operators.mlops import split_relationships

    _rem, test = split_relationships(
        g, holdout_fraction=0.3, negative_sampling_ratio=1.0, seed=42
    )
    n_pos = test.filter(F.col("label") == 1).count()
    model = link_prediction_train(
        g, feature_cols=["acctbal", "nkey"], combiner="HADAMARD",
        params=[{"penalty": 0.0}], holdout_fraction=0.3, seed=42,
    )
    auc = model.metrics["test"]["AUCPR"]
    pred = link_prediction_predict(model, g, top_n=50)
    edge_set = g.edges.select("src", "dst")
    violations = pred.join(
        edge_set, ["src", "dst"], "inner"
    ).count()
    return spark.createDataFrame(
        [(n_pos, bool(auc > 0.0), int(violations))],
        "test_positives long, auc_produced boolean, predict_violations long",
    )


def sql_link_prediction() -> str:
    # replicate the portable arithmetic split hash on dense internal ids
    # (row_number over ascending original id): holdout iff
    # (src*2654435761 + dst*40503 + 42*97) % 1000003 < 300000
    return f"""
WITH
{_mod_header()},
dense AS (SELECT id, ROW_NUMBER() OVER (ORDER BY id) - 1 AS iid
          FROM nodes),
mapped AS (SELECT a.iid AS src, b.iid AS dst
           FROM edges e
           JOIN dense a ON a.id = e.src JOIN dense b ON b.id = e.dst)
SELECT CAST(COUNT(*) AS BIGINT) AS test_positives,
       TRUE AS auc_produced,
       CAST(0 AS BIGINT) AS predict_violations
FROM mapped
WHERE (src * 2654435761 + dst * 40503 + 42 * 97) % 1000003 < 300000
"""


def q_all_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gds.alpha.allShortestPaths (unweighted MSBFS): one row per
    (source, reachable target ≠ source) with hop distance."""
    from .operators.allpaths import all_shortest_paths

    g = _graph_mod(spark, sf_dir)
    out = all_shortest_paths(g)
    v = g.vertices
    out = (
        out.join(
            v.select(
                F.col("internal_id").alias("s"),
                F.col("original_id").alias("source"),
            ),
            "s",
        )
        .join(
            v.select(
                F.col("internal_id").alias("target"),
                F.col("original_id").alias("tgt"),
            ),
            "target",
        )
        .select(
            F.col("source").cast("long").alias("source"),
            F.col("tgt").cast("long").alias("target"),
            "distance",
        )
    )
    return out


def sql_all_shortest_paths() -> str:
    # depth cap must exceed the graph diameter at EVERY sf the sweep
    # runs: measured directed mod-graph diameter is 3 at sf0.01 but 28
    # at sf0.1 (the old cap of 24 silently dropped the 111k pairs
    # beyond 24 hops — caught by the sf0.1 sweep; Spark was correct)
    return f"""
WITH RECURSIVE
{_mod_header()},
reach(s, v, dist) AS (
  SELECT id, id, 0 FROM nodes
  UNION
  SELECT r.s, e.dst, r.dist + 1 FROM reach r JOIN edges e ON e.src = r.v
  WHERE r.dist < 32
)
SELECT s AS source, v AS target, CAST(MIN(dist) AS DOUBLE) AS distance
FROM reach WHERE v != s GROUP BY s, v
"""


# ---------------------------------------------------------------------------
# Validity siblings for the seeded-hash rows-only entries. Pattern: the
# Spark side recomputes an INVARIANT over its own output (violation
# counts, recall vs exact brute force) and the oracle pins the expected
# constants — turning "rows-only" ops into real oracle-gated checks
# without requiring DuckDB to reproduce xxhash64/LSH-plane arithmetic.
# ---------------------------------------------------------------------------
def q_celf_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CELF invariants: exactly k distinct real-node seeds, non-negative
    marginal gains (the 2nd/3rd marginal gain is legitimately 0 when the
    first seed's cascade already saturates the dense co-supplier graph), and gains non-increasing in selection order (the
    submodularity property CELF's lazy evaluation relies on)."""
    from .operators.influence import influence_maximization

    g = _graph_mod(spark, sf_dir)
    res = influence_maximization(
        g, 3, propagation_probability=0.2, monte_carlo_simulations=32
    )
    node_ids = {r[0] for r in g.vertices.select("internal_id").collect()}
    seeds, gains = list(res.seeds), list(res.gains)
    return spark.createDataFrame(
        [(
            len(set(seeds)),
            sum(1 for s in seeds if s not in node_ids),
            bool(all(g >= 0 for g in gains)),
            bool(all(a >= b - 1e-9 for a, b in zip(gains, gains[1:]))),
        )],
        "n_seeds long, unknown_ids long, gains_nonnegative boolean, "
        "gains_non_increasing boolean",
    )


def sql_celf_validity() -> str:
    return """
SELECT CAST(3 AS BIGINT) AS n_seeds, CAST(0 AS BIGINT) AS unknown_ids,
       TRUE AS gains_nonnegative, TRUE AS gains_non_increasing
"""


def q_knn_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KNN output invariants: every vector present, ≤k neighbors each, no
    self pairs, cosine in [-1,1], and recall vs exact top-k at least 10×
    the random-chance baseline (k/(n−1)).

    Why lift, not absolute recall: the synthetic embeddings are isotropic
    random vectors (measured at sf0.01: mean top-3 cosine 0.32 vs median
    pair ≈ 0), so the true top-k is barely separated and NO approximate
    method can reach high absolute recall — NN-Descent's
    neighbor-of-neighbor premise needs metric structure. Absolute recall
    on *clustered* fixtures is pinned in pytest; this gate asserts the
    operator beats chance by an order of magnitude on the worst case."""
    from .graph import Graph
    from .operators.knn import knn
    from .pipeline.ann import cosine_topk_bruteforce

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("internal_id"),
        F.col("embedding").alias("vec"),
    )
    g = Graph(emb, spark.createDataFrame([], "src long, dst long"))
    approx = knn(g, "vec", top_k=3, iterations=3).cache()
    per_node = approx.groupBy("node1").count()
    exact = cosine_topk_bruteforce(
        emb.select(F.col("internal_id").alias("vec_id"),
                   F.col("vec").alias("embedding")),
        k=3,
    ).select(F.col("vec_id").alias("node1"),
             F.col("neighbor_id").alias("node2"))
    hits = approx.join(exact, ["node1", "node2"], "inner").count()
    n_exact = exact.count()
    n = emb.count()
    recall = hits / max(n_exact, 1)
    chance = 3.0 / max(n - 1, 1)
    return spark.createDataFrame(
        [(
            per_node.count(),
            int(per_node.agg(F.max("count")).collect()[0][0]),
            approx.filter(F.col("node1") == F.col("node2")).count(),
            approx.filter(
                (F.col("similarity") < -1.0000001)
                | (F.col("similarity") > 1.0000001)
            ).count(),
            bool(recall >= 10.0 * chance),
        )],
        "n_nodes long, max_per_node long, self_pairs long, "
        "oob_sims long, recall_lift_ge_10x boolean",
    )


def sql_knn_validity() -> str:
    return """
SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes, CAST(3 AS BIGINT) AS max_per_node,
       CAST(0 AS BIGINT) AS self_pairs, CAST(0 AS BIGINT) AS oob_sims,
       TRUE AS recall_lift_ge_10x
FROM embeddings
"""


def q_ann_lsh_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH ANN invariants: ≤k per node, no self pairs, cosine in [-1,1],
    recall ≥ 10× chance vs exact top-k (seeded planes → deterministic).
    Measured at sf0.01: 6.9% recall = exactly the theoretical 8-bit/
    4-table collision rate for the isotropic synthetic vectors (mean
    top-3 cosine 0.32 → per-table p ≈ (1−71°/180°)^8 ≈ 1.8%) — the
    bucketing works as designed; flat data bounds absolute recall (see
    q_knn_validity). Lift at sf0.01: ~11.5× chance."""
    from .driver_contract import ANN_TOPK, _embeddings
    from .pipeline.ann import cosine_topk_bruteforce, cosine_topk_lsh

    emb = _embeddings(spark, sf_dir)
    approx = cosine_topk_lsh(emb, k=ANN_TOPK).cache()
    per_node = approx.groupBy("vec_id").count()
    exact = cosine_topk_bruteforce(emb, k=ANN_TOPK).select(
        "vec_id", "neighbor_id"
    )
    hits = approx.select("vec_id", "neighbor_id").join(
        exact, ["vec_id", "neighbor_id"], "inner"
    ).count()
    n_exact = exact.count()
    n = emb.count()
    recall = hits / max(n_exact, 1)
    chance = float(ANN_TOPK) / max(n - 1, 1)
    return spark.createDataFrame(
        [(
            int(per_node.agg(F.max("count")).collect()[0][0]),
            approx.filter(F.col("vec_id") == F.col("neighbor_id")).count(),
            approx.filter(
                (F.col("cosine") < -1.0000001)
                | (F.col("cosine") > 1.0000001)
            ).count(),
            bool(recall >= 10.0 * chance),
        )],
        "max_per_node long, self_pairs long, oob_sims long, "
        "recall_lift_ge_10x boolean",
    )


def sql_ann_lsh_validity() -> str:
    return """
SELECT CAST(3 AS BIGINT) AS max_per_node, CAST(0 AS BIGINT) AS self_pairs,
       CAST(0 AS BIGINT) AS oob_sims, TRUE AS recall_lift_ge_10x
"""


def q_random_walk_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walk invariants: 2 walks per node, and every consecutive step is a
    real edge of the graph (0 invalid transitions)."""
    from .operators.mlops import random_walks

    g = _graph_mod(spark, sf_dir)
    walks = random_walks(g, walks_per_node=2, walk_length=4).cache()
    steps = walks.select(
        "walk_id", F.posexplode("path").alias("pos", "node")
    )
    trans = steps.alias("a").join(
        steps.alias("b"),
        (F.col("a.walk_id") == F.col("b.walk_id"))
        & (F.col("b.pos") == F.col("a.pos") + 1),
    ).select(
        F.col("a.node").alias("src"), F.col("b.node").alias("dst")
    )
    bad = trans.join(
        g.edges.select("src", "dst").distinct(), ["src", "dst"], "left_anti"
    ).count()
    return spark.createDataFrame(
        [(walks.count(), int(bad))], "n_walks long, bad_steps long"
    )


def sql_random_walk_validity() -> str:
    return f"""
WITH
{_mod_header()}
SELECT CAST(2 * COUNT(*) AS BIGINT) AS n_walks,
       CAST(0 AS BIGINT) AS bad_steps
FROM nodes
"""


def q_minhash_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash candidate invariants: no self pairs, estimator in [0.3, 1],
    every id a real document."""
    from .driver_contract import NGRAM_N, _documents
    from .pipeline.text import minhash_dedup

    docs = _documents(spark, sf_dir)
    out = minhash_dedup(docs, n=NGRAM_N, min_jaccard_est=0.3).cache()
    ids = docs.select(F.col("doc_id").alias("d"))
    unknown = (
        out.select(F.col("doc1").alias("d"))
        .unionByName(out.select(F.col("doc2").alias("d")))
        .join(ids, "d", "left_anti")
        .count()
    )
    return spark.createDataFrame(
        [(
            out.filter(F.col("doc1") == F.col("doc2")).count(),
            out.filter(
                (F.col("jaccard_est") < 0.3) | (F.col("jaccard_est") > 1.0)
            ).count(),
            int(unknown),
        )],
        "self_pairs long, oob_est long, unknown_ids long",
    )


def sql_minhash_validity() -> str:
    return """
SELECT CAST(0 AS BIGINT) AS self_pairs, CAST(0 AS BIGINT) AS oob_est,
       CAST(0 AS BIGINT) AS unknown_ids
"""


def q_simhash_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash invariants: exactly one signature per tokenizable doc, all
    ids real documents."""
    from .driver_contract import _documents
    from .pipeline.text import simhash

    docs = _documents(spark, sf_dir)
    out = simhash(docs).cache()
    unknown = out.join(
        docs.select("doc_id"), "doc_id", "left_anti"
    ).count()
    n_rows = out.count()
    n_distinct = out.select("doc_id").distinct().count()
    return spark.createDataFrame(
        [(bool(n_rows == n_distinct), int(unknown))],
        "one_sig_per_doc boolean, unknown_ids long",
    )


def sql_simhash_validity() -> str:
    return "SELECT TRUE AS one_sig_per_doc, CAST(0 AS BIGINT) AS unknown_ids"


def q_windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows over the events table — the
    batch plan of ``streaming.stream_ops.windowed_event_counts`` (same
    code path the watermarked streaming query runs)."""
    from .streaming.stream_ops import windowed_event_counts

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return windowed_event_counts(ev, window="1 hour", watermark=None)


def sql_windowed_event_counts() -> str:
    return (
        "SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) "
        "AS window_start, event_type, COUNT(*) AS n_events, "
        "ROUND(SUM(value), 4) AS sum_value FROM events GROUP BY 1, 2"
    )


def _events_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        # NTZ -> (UTC-pinned) TIMESTAMP -> fractional epoch double
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
        "value",
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (union-sort formulation, one shuffle): every event
    picks up the latest prior "status" row of the same user — the
    status table derives deterministically from the events themselves
    (epoch % 7 slots, deduped per (user, ts)). DuckDB replays with its
    native ASOF LEFT JOIN."""
    from .pipeline.joins import asof_join

    ev = _events_epoch(spark, sf_dir)
    status = (
        ev.filter(F.floor("ts").cast("long") % 7 == 0)
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 4).alias("status_value"))
    )
    out = asof_join(ev, status, on="user_id")
    # the checker sorts values: fold the unmatched-left nulls to -1
    return out.select(
        "user_id", "ts", F.round("value", 4).alias("value"),
        F.coalesce("ts_right", F.lit(-1.0)).alias("ts_right"),
        F.coalesce("status_value_right", F.lit(-1.0)).alias(
            "status_value_right"
        ),
    )


def sql_asof_join() -> str:
    return """
WITH ev AS (SELECT user_id, CAST(epoch(ts) AS DOUBLE) AS ts, value
            FROM events),
status AS (SELECT user_id, ts, ROUND(MAX(value), 4) AS status_value
           FROM ev WHERE CAST(FLOOR(ts) AS BIGINT) % 7 = 0 GROUP BY 1, 2)
SELECT ev.user_id, ev.ts, ROUND(ev.value, 4) AS value,
       COALESCE(status.ts, -1.0) AS ts_right,
       COALESCE(status.status_value, -1.0) AS status_value_right
FROM ev ASOF LEFT JOIN status
  ON ev.user_id = status.user_id AND ev.ts >= status.ts
"""


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned range join: events against deterministic 90-minute
    maintenance windows derived from the event hours; the bin equi-join
    plus residual filter replays as a plain range-predicate join."""
    from .pipeline.joins import range_join

    ev = _events_epoch(spark, sf_dir).select("user_id", "ts")
    ivals = (
        ev.select(
            "user_id",
            (F.floor(F.col("ts") / 7200) * 7200).alias("start"),
        )
        .distinct()
        .withColumn("end", F.col("start") + 5400.0)
        .withColumn("start", F.col("start").cast("double"))
    )
    out = range_join(ev, ivals, on="user_id", bin_width=3600.0)
    return out.select("user_id", "ts", "start", "end")


def sql_range_join() -> str:
    return """
WITH ev AS (SELECT user_id, CAST(epoch(ts) AS DOUBLE) AS ts FROM events),
ivals AS (SELECT DISTINCT user_id,
            CAST(FLOOR(ts / 7200) * 7200 AS DOUBLE) AS start,
            CAST(FLOOR(ts / 7200) * 7200 + 5400 AS DOUBLE) AS "end"
          FROM ev)
SELECT ev.user_id, ev.ts, ivals.start, ivals."end" AS end
FROM ev JOIN ivals
  ON ev.user_id = ivals.user_id
 AND ev.ts >= ivals.start AND ev.ts < ivals."end"
"""


def q_hopping_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window counts (2h window, 1h hop): every event lands in
    exactly 2 overlapping windows."""
    from .streaming.stream_ops import hopping_event_counts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return hopping_event_counts(
        ev, window="2 hours", hop="1 hour", watermark=None
    )


def sql_hopping_event_counts() -> str:
    # replay the window expansion: with width = 2 * hop, event t belongs
    # to the windows starting at floor(t/h)*h and floor(t/h)*h - h
    return """
SELECT ws AS window_start, event_type, COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS sum_value
FROM events,
     UNNEST([CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 - 3600])
       AS u(ws)
GROUP BY 1, 2
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (native session_window) per user over the
    events table; 30-minute inactivity gap."""
    from .streaming.stream_ops import sessionize

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return sessionize(ev, gap="30 minutes", watermark=None)


def sql_sessionize() -> str:
    # a new session starts when the gap since the previous event is
    # STRICTLY greater than 30 min (Spark merges an event landing exactly
    # on last_ts + gap; see test_streaming_ops.py)
    return """
        WITH o AS (
            SELECT user_id, ts, value,
                   CASE WHEN ts - LAG(ts) OVER
                                 (PARTITION BY user_id ORDER BY ts)
                             <= INTERVAL 30 MINUTE
                        THEN 0 ELSE 1 END AS new_s
            FROM events
        ), s AS (
            SELECT user_id, ts, value,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM o
        )
        SELECT user_id,
               CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 4) AS sum_value
        FROM s GROUP BY user_id, sid
    """


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate detection (training-data pipeline)
# ---------------------------------------------------------------------------

NEARDUP_THRESHOLD = 0.3  # synthetic embeddings are isotropic (max pairwise
# cosine ~0.51 at sf0.01); 0.3 selects the ~1% high-cosine tail — a
# non-trivial near-dup set. Real near-dup corpora would use ~0.9.


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (a<b, cosine >= threshold)."""
    from .driver_contract import _embeddings
    from .pipeline.ann import cosine_neardup_pairs

    out = cosine_neardup_pairs(
        _embeddings(spark, sf_dir), threshold=NEARDUP_THRESHOLD
    )
    return out.select(
        "vec_id", "dup_id", F.round("cosine", 4).alias("cosine")
    )


def sql_embedding_neardup() -> str:
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
scored AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS dup_id,
         list_dot_product(a.v, b.v) /
         (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
         AS cosine
  FROM e a JOIN e b ON a.vec_id < b.vec_id)
SELECT vec_id, dup_id, ROUND(cosine, 4) AS cosine
FROM scored WHERE cosine >= {NEARDUP_THRESHOLD}
"""


def q_embedding_neardup_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy-by-id dedup: keep=false iff a near-dup with smaller id."""
    from .driver_contract import _embeddings
    from .pipeline.ann import cosine_neardup_dedup

    return cosine_neardup_dedup(
        _embeddings(spark, sf_dir), threshold=NEARDUP_THRESHOLD
    )


def sql_embedding_neardup_dedup() -> str:
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
dropped AS (
  SELECT DISTINCT b.vec_id AS vec_id
  FROM e a JOIN e b ON a.vec_id < b.vec_id
  WHERE list_dot_product(a.v, b.v) /
        (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
        >= {NEARDUP_THRESHOLD})
SELECT e.vec_id, d.vec_id IS NULL AS keep
FROM e LEFT JOIN dropped d USING (vec_id)
"""


def q_embedding_neardup_lsh_validity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LSH near-dup invariants: emitted pairs are a SUBSET of the exact
    pair set (precision 1 — every candidate is re-scored with the exact
    cosine), all >= threshold, canonically ordered (a<b), and recall
    clears a floor set well under the seeded-plane theoretical rate
    (8 bits x 8 tables at cosine 0.3..0.51 -> per-pair collision
    ~12-25%; measured at sf0.01 comfortably above the 0.05 gate)."""
    from .driver_contract import _embeddings
    from .pipeline.ann import cosine_neardup_pairs

    emb = _embeddings(spark, sf_dir)
    exact = cosine_neardup_pairs(emb, threshold=NEARDUP_THRESHOLD).cache()
    approx = cosine_neardup_pairs(
        emb, threshold=NEARDUP_THRESHOLD, method="lsh"
    ).cache()
    not_in_exact = approx.select("vec_id", "dup_id").join(
        exact.select("vec_id", "dup_id"), ["vec_id", "dup_id"], "left_anti"
    ).count()
    below = approx.filter(F.col("cosine") < NEARDUP_THRESHOLD).count()
    misordered = approx.filter(F.col("vec_id") >= F.col("dup_id")).count()
    recall = approx.count() / max(exact.count(), 1)
    return spark.createDataFrame(
        [(int(not_in_exact), int(below), int(misordered),
          bool(recall >= 0.05))],
        "not_in_exact long, below_threshold long, misordered long, "
        "recall_ge_floor boolean",
    )


def sql_embedding_neardup_lsh_validity() -> str:
    return """
SELECT CAST(0 AS BIGINT) AS not_in_exact,
       CAST(0 AS BIGINT) AS below_threshold,
       CAST(0 AS BIGINT) AS misordered, TRUE AS recall_ge_floor
"""


# ---------------------------------------------------------------------------
# Deterministic sampling (pipeline/sampling.py) — every decision is a pure
# function of the portable md5-60bit key hash, so DuckDB replays the exact
# kept set (no RNG, no partitioning dependence).
# ---------------------------------------------------------------------------
SAMPLE_SEED = 7
SAMPLE_FRACTION = 0.3
STRATA = {"en": 0.5, "de": 0.2}
STRATA_DEFAULT = 0.05
TEMP_TARGET = 200
TOPK_PER_GROUP = 7
_HS = 1 << 60  # sampling.HASH_SPACE

# DuckDB twin of sampling.sample_hash(seed, doc_id)
_SQL_DOC_HASH = (
    f"('0x' || substr(md5('{SAMPLE_SEED}' || chr(31) || "
    "CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"
)


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Bernoulli sample of the documents table."""
    from .pipeline.sampling import hash_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "source"
    )
    return hash_sample(docs, SAMPLE_FRACTION, seed=SAMPLE_SEED)


def sql_hash_sample() -> str:
    thr = int(SAMPLE_FRACTION * _HS)
    return (
        "SELECT doc_id, lang, source FROM documents "
        f"WHERE {_SQL_DOC_HASH} < {thr}"
    )


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language keep rates (en 0.5, de 0.2, others 0.05)."""
    from .pipeline.sampling import stratified_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "source"
    )
    return stratified_sample(
        docs, "lang", STRATA, default_fraction=STRATA_DEFAULT, seed=SAMPLE_SEED
    )


def sql_stratified_sample() -> str:
    whens = " ".join(
        f"WHEN '{g}' THEN {int(f * _HS)}" for g, f in sorted(STRATA.items())
    )
    default_thr = int(STRATA_DEFAULT * _HS)
    return (
        "SELECT doc_id, lang, source FROM documents "
        f"WHERE {_SQL_DOC_HASH} < "
        f"(CASE lang {whens} ELSE {default_thr} END)"
    )


def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count**0.5 temperature-flattened source mix, ~TEMP_TARGET rows.

    alpha=0.5 is the contract point because sqrt is IEEE-correctly
    rounded in both engines (general pow is not), and the derived rate
    is rounded to 9 decimals on both sides, so the kept set is exact.
    """
    from .pipeline.sampling import temperature_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    out = temperature_sample(
        docs, "source", target_rows=TEMP_TARGET, alpha=0.5, seed=SAMPLE_SEED
    )
    return out.select("doc_id", "source")


def sql_temperature_sample() -> str:
    return f"""
WITH counts AS (SELECT source, COUNT(*)::BIGINT AS cnt
                FROM documents GROUP BY source),
tot AS (SELECT SUM(sqrt(CAST(cnt AS DOUBLE))) AS total_w FROM counts),
rates AS (SELECT source,
          ROUND(LEAST(1.0,
            {float(TEMP_TARGET)} * sqrt(CAST(cnt AS DOUBLE)) / tot.total_w
            / CAST(cnt AS DOUBLE)), 9) AS rate
          FROM counts, tot)
SELECT d.doc_id, d.source
FROM documents d JOIN rates r ON d.source = r.source
WHERE {_SQL_DOC_HASH} < CAST(FLOOR(r.rate * {float(_HS)}) AS BIGINT)
"""


# ---------------------------------------------------------------------------
# SemDeDup-style clustered semantic dedup (pipeline/ann.py) — seeded unit
# centroids + plan-literal argmax assignment make the whole operator
# replayable in SQL (centroid literals inlined, same trick as the LSH ANN
# oracle); k-means (trained centroids) carries a Lloyd's-invariant validity
# row instead (float-mean summation order is engine/layout-specific).
# ---------------------------------------------------------------------------
SEM_K = 8
SEM_SEED = 11


def _sem_cents():
    from .driver_contract import ANN_DIM
    from .pipeline.ann import seeded_centroids

    return seeded_centroids(ANN_DIM, SEM_K, SEM_SEED)


def q_semantic_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-gated near-dup pairs (pairs scored only within a cluster)."""
    from .driver_contract import _embeddings
    from .pipeline.ann import semantic_neardup_pairs

    out = semantic_neardup_pairs(
        _embeddings(spark, sf_dir),
        threshold=NEARDUP_THRESHOLD,
        n_clusters=SEM_K,
        seed=SEM_SEED,
    )
    return out.select(
        "vec_id", "dup_id", F.round("cosine", 4).alias("cosine")
    )


def _sql_sem_assign() -> str:
    cents = _sem_cents()
    rows = ",\n".join(
        "({}, [{}]::DOUBLE[])".format(
            i, ", ".join(repr(float(x)) for x in c)
        )
        for i, c in enumerate(cents)
    )
    return f"""
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents(cid, c) AS (VALUES {rows}),
scored AS (SELECT e.vec_id, c.cid, list_dot_product(e.v, c.c) AS s
           FROM e, cents c),
asg AS (SELECT vec_id, cid AS cluster FROM (
          SELECT vec_id, cid, ROW_NUMBER() OVER (
            PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
          FROM scored) WHERE rn = 1),
pairs AS (SELECT a.vec_id, b.vec_id AS dup_id,
            list_dot_product(ea.v, eb.v) /
            (sqrt(list_dot_product(ea.v, ea.v)) *
             sqrt(list_dot_product(eb.v, eb.v))) AS cosine
          FROM asg a JOIN asg b
            ON a.cluster = b.cluster AND a.vec_id < b.vec_id
          JOIN e ea ON ea.vec_id = a.vec_id
          JOIN e eb ON eb.vec_id = b.vec_id)"""


def sql_semantic_neardup() -> str:
    return f"""
WITH {_sql_sem_assign()}
SELECT vec_id, dup_id, ROUND(cosine, 4) AS cosine FROM pairs
WHERE cosine >= {NEARDUP_THRESHOLD}
"""


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy-by-id keep table over the cluster-gated pair stream."""
    from .driver_contract import _embeddings
    from .pipeline.ann import semantic_dedup

    return semantic_dedup(
        _embeddings(spark, sf_dir),
        threshold=NEARDUP_THRESHOLD,
        n_clusters=SEM_K,
        seed=SEM_SEED,
    )


def sql_semantic_dedup() -> str:
    return f"""
WITH {_sql_sem_assign()}
SELECT e.vec_id, d.vec_id IS NULL AS keep
FROM e LEFT JOIN (SELECT DISTINCT dup_id AS vec_id FROM pairs
                  WHERE cosine >= {NEARDUP_THRESHOLD}) d
  ON e.vec_id = d.vec_id
"""


def q_kmeans_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's invariants for the trained-centroid path: assignment is
    total (one cluster per vector, id in [0, k)), at least 2 clusters are
    used, and the k-means objective (within-cluster sum of squared
    distances) did not increase over the run — WCSS(fitted) <=
    WCSS(init-centroid assignment), a theorem of Lloyd's iteration."""
    import numpy as np

    from .driver_contract import _embeddings
    from .pipeline.ann import kmeans_assign, kmeans_fit

    emb = _embeddings(spark, sf_dir)
    n = emb.count()

    src = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    init_rows = (
        src.orderBy(F.xxhash64(F.col("vec_id")), F.col("vec_id"))
        .limit(SEM_K)
        .collect()
    )
    init = np.array([r.v for r in init_rows], dtype=np.float64)
    cents = kmeans_fit(emb, k=SEM_K, max_iter=5, seed=SEM_SEED)

    def wcss(centroids: np.ndarray) -> float:
        # CASE chain: cluster i -> squared distance to centroid i
        asg = kmeans_assign(emb, centroids)
        case = F.lit(0.0)
        for i, c in enumerate(centroids):
            d = F.aggregate(
                F.zip_with(
                    F.col("v"),
                    F.array(*[F.lit(float(x)) for x in c]),
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            case = F.when(F.col("cluster") == i, d).otherwise(case)
        return asg.join(src, "vec_id").agg(F.sum(case)).collect()[0][0]

    asg = kmeans_assign(emb, cents)
    total = asg.count()
    k_used = asg.select("cluster").distinct().count()
    in_range = asg.filter(
        (F.col("cluster") < 0) | (F.col("cluster") >= SEM_K)
    ).count()
    improved = wcss(cents) <= wcss(init) * (1 + 1e-9)
    return spark.createDataFrame(
        [(int(total == n), int(in_range), int(k_used >= 2), bool(improved))],
        "total_ok long, out_of_range long, multi_cluster long, "
        "objective_monotone boolean",
    )


def sql_kmeans_validity() -> str:
    return """
SELECT CAST(1 AS BIGINT) AS total_ok, CAST(0 AS BIGINT) AS out_of_range,
       CAST(1 AS BIGINT) AS multi_cluster, TRUE AS objective_monotone
"""


def q_group_topk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly k docs per source — the k smallest key hashes (the
    deterministic equivalent of per-group reservoir sampling)."""
    from .pipeline.sampling import group_topk_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    return group_topk_sample(docs, "source", TOPK_PER_GROUP, seed=SAMPLE_SEED)


def sql_group_topk_sample() -> str:
    return f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY {_SQL_DOC_HASH} ASC, doc_id ASC) AS rn
  FROM documents) WHERE rn <= {TOPK_PER_GROUP}
"""


# ---------------------------------------------------------------------------
# Corpus curation: PII scan/redaction, decontamination, sequence packing
# ---------------------------------------------------------------------------
# The synthetic documents are PII-free word soup, so the PII contract
# plants deterministic PII — an email for every doc plus class literals
# gated on doc_id residues — identically on both engines. The oracle then
# genuinely exercises Java-regex vs RE2 parity on the real patterns.

_PII_PLANT = (
    ("ssn", 3, " 123-45-6789"),
    ("credit_card", 4, " 4111 1111 1111 1111"),
    ("phone", 5, " 555-867-5309"),
    ("ipv4", 7, " 10.0.0.1"),
)


def _pii_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .driver_contract import _documents

    d = F.col("doc_id")
    parts = [
        F.col("text"),
        F.lit(" contact"),
        d.cast("string"),
        F.lit("@example.com"),
    ]
    for _name, mod, lit in _PII_PLANT:
        parts.append(F.when(d % mod == 0, F.lit(lit)).otherwise(F.lit("")))
    return _documents(spark, sf_dir).select(
        "doc_id", F.concat(*parts).alias("text")
    )


_SQL_PII_PLANTED = (
    "SELECT doc_id, text || ' contact' || CAST(doc_id AS VARCHAR) "
    "|| '@example.com'"
    + "".join(
        f" || CASE WHEN doc_id % {mod} = 0 THEN '{lit}' ELSE '' END"
        for _name, mod, lit in _PII_PLANT
    )
    + " AS text FROM documents"
)


def q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class PII match counts; pure codegen projection (zero shuffle).

    Parity target: ref has no PII ops — this is a training-data-pipeline
    first-class operator (scan side of scrubbing)."""
    from .pipeline.curation import pii_scan

    return pii_scan(_pii_planted(spark, sf_dir))


def sql_pii_scan() -> str:
    from .pipeline.curation import PII_PATTERNS

    counts = ", ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat in PII_PATTERNS.items()
    )
    return f"WITH planted AS ({_SQL_PII_PLANTED}) " \
           f"SELECT doc_id, {counts} FROM planted"


# Luhn precision mode: plant an extra INVALID card (fails the mod-10
# checksum) on doc_id % 6 == 0, so the raw count and the Luhn-checked
# count genuinely diverge and the oracle pins the checksum arithmetic.
_PII_BAD_CARD = " 4111 1111 1111 1112"


def q_pii_scan_luhn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline.curation import pii_scan

    d = F.col("doc_id")
    planted = _pii_planted(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(d % 6 == 0, F.lit(_PII_BAD_CARD)).otherwise(F.lit("")),
        ).alias("text"),
    )
    return pii_scan(planted, luhn_check=True)


def _sql_luhn(s: str) -> str:
    terms = []
    for i in range(1, 17):
        d = f"CAST(substr({s}, {i}, 1) AS INT)"
        if i % 2 == 1:
            terms.append(f"CASE WHEN {d}*2 > 9 THEN {d}*2 - 9 ELSE {d}*2 END")
        else:
            terms.append(d)
    return "(" + " + ".join(terms) + ") % 10 = 0"


def sql_pii_scan_luhn() -> str:
    from .pipeline.curation import PII_PATTERNS

    counts = []
    for name, pat in PII_PATTERNS.items():
        expr = f"regexp_extract_all(text, '{pat}')"
        if name == "credit_card":
            expr = (
                f"list_filter(list_transform({expr}, "
                "m -> regexp_replace(m, '[^0-9]', '', 'g')), "
                f"s -> {_sql_luhn('s')})"
            )
        counts.append(f"CAST(len({expr}) AS BIGINT) AS n_{name}")
    return (
        f"WITH base AS ({_SQL_PII_PLANTED}), "
        "planted AS (SELECT doc_id, text || CASE WHEN doc_id % 6 = 0 "
        f"THEN '{_PII_BAD_CARD}' ELSE '' END AS text FROM base) "
        f"SELECT doc_id, {', '.join(counts)} FROM planted"
    )


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered redaction chain — full rewritten text is value-hashed, so
    the oracle pins both the patterns and the application order."""
    from .pipeline.curation import pii_redact

    return pii_redact(_pii_planted(spark, sf_dir))


def sql_pii_redact() -> str:
    from .pipeline.curation import PII_PATTERNS

    expr = "text"
    for name, pat in PII_PATTERNS.items():
        expr = f"regexp_replace({expr}, '{pat}', '<{name.upper()}>', 'g')"
    return f"WITH planted AS ({_SQL_PII_PLANTED}) " \
           f"SELECT doc_id, {expr} AS text FROM planted"


DECON_WINDOW = 8


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: the 'eval set' is every 17th document,
    so flagged rows = those docs themselves plus true cross-doc span
    collisions (the corpus has boilerplate-duplicated spans)."""
    from .driver_contract import _documents
    from .pipeline.curation import decontaminate

    docs = _documents(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    return decontaminate(docs, bench, DECON_WINDOW).withColumn(
        "contaminated", F.col("contaminated").cast("long")
    )


def sql_decontaminate() -> str:
    w = DECON_WINDOW
    return f"""
WITH toks AS (SELECT doc_id,
              regexp_split_to_array(trim(text), '\\s+') AS t FROM documents),
spans AS (SELECT doc_id,
          ('0x' || substr(md5(array_to_string(t[i:i+{w - 1}], ' ')),
           1, 15))::BIGINT AS span_hash
          FROM toks, UNNEST(range(1, len(t) - {w - 2})) AS u(i)
          WHERE len(t) >= {w}),
bench AS (SELECT DISTINCT span_hash FROM spans WHERE doc_id % 17 = 0),
hits AS (SELECT s.doc_id, COUNT(*) AS n_contaminated_spans FROM spans s
         WHERE EXISTS (SELECT 1 FROM bench b
                       WHERE b.span_hash = s.span_hash)
         GROUP BY 1)
SELECT t.doc_id,
       CAST(GREATEST(len(t.t) - {w - 1}, 0) AS BIGINT) AS n_spans,
       COALESCE(h.n_contaminated_spans, 0) AS n_contaminated_spans,
       CAST(COALESCE(h.n_contaminated_spans, 0) > 0 AS BIGINT)
         AS contaminated
FROM toks t LEFT JOIN hits h USING (doc_id)
"""


PACK_SEQ_LEN = 256


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-cut packing offsets via distributed prefix sum; the
    oracle recomputes the global running sum with a plain window — exact
    equality pins the range-partition + per-partition-offset machinery."""
    from .driver_contract import _documents
    from .pipeline.curation import pack_sequences

    return pack_sequences(_documents(spark, sf_dir), PACK_SEQ_LEN)


def sql_pack_sequences() -> str:
    s = PACK_SEQ_LEN
    return f"""
WITH counts AS (SELECT doc_id,
  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
  FROM documents),
cum AS (SELECT doc_id, n_tokens,
  SUM(n_tokens) OVER (ORDER BY doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
    AS start_token FROM counts)
SELECT doc_id, n_tokens, CAST(start_token AS BIGINT) AS start_token,
  CAST(start_token // {s} AS BIGINT) AS first_seq,
  CAST((start_token + GREATEST(n_tokens, 1) - 1) // {s} AS BIGINT)
    AS last_seq,
  CAST(CASE WHEN n_tokens > 0
       THEN (start_token + GREATEST(n_tokens, 1) - 1) // {s}
            - start_token // {s} + 1
       ELSE 0 END AS BIGINT) AS n_seqs
FROM cum
"""


def q_packing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .driver_contract import _documents
    from .pipeline.curation import pack_sequences, packing_stats

    packed = pack_sequences(_documents(spark, sf_dir), PACK_SEQ_LEN)
    return packing_stats(packed, PACK_SEQ_LEN)


def sql_packing_stats() -> str:
    s = PACK_SEQ_LEN
    return f"""
WITH counts AS (SELECT doc_id,
  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
  FROM documents)
SELECT COUNT(*) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
  CAST(CEIL(SUM(n_tokens) / {s}.0) AS BIGINT) AS n_sequences,
  ROUND(SUM(n_tokens) / (CEIL(SUM(n_tokens) / {s}.0) * {s}.0), 6)
    AS fill_frac
FROM counts
"""


# ---------------------------------------------------------------------------
# tf-idf keywords / heuristic quality gates / unigram LM (pipeline/text.py)
# ---------------------------------------------------------------------------
TFIDF_K = 5


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .driver_contract import _documents
    from .pipeline.text import tfidf_topk

    return tfidf_topk(_documents(spark, sf_dir), TFIDF_K)


def sql_tfidf_topk() -> str:
    return f"""
WITH toks AS (SELECT doc_id, u.term
              FROM (SELECT doc_id,
                    regexp_split_to_array(trim(text), '\\s+') AS t
                    FROM documents), UNNEST(t) AS u(term)),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dfx AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(*) AS n FROM documents),
scored AS (SELECT doc_id, term, tf,
           ROUND(tf * (LN((1 + n.n)::DOUBLE / (1 + dfx.df)) + 1), 6)
             AS tfidf
           FROM tf JOIN dfx USING (term), n),
ranked AS (SELECT *, ROW_NUMBER() OVER
           (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS kw_rank
           FROM scored)
SELECT doc_id, term, tf, tfidf, kw_rank FROM ranked WHERE kw_rank <= {TFIDF_K}
"""


def q_heuristic_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .driver_contract import _documents
    from .pipeline.text import heuristic_filters

    return heuristic_filters(_documents(spark, sf_dir))


def sql_heuristic_filters() -> str:
    from .pipeline.text import STOPWORDS_EN

    stop = ", ".join(f"'{s}'" for s in STOPWORDS_EN)
    return f"""
WITH base AS (SELECT doc_id, text,
        string_split(text, chr(10)) AS lines,
        regexp_split_to_array(trim(text), '\\s+') AS t FROM documents),
sig AS (SELECT doc_id,
  len(lines) AS n_lines,
  len(list_filter(regexp_split_to_array(text, '[.!?]+'),
      s -> trim(s) <> '')) AS n_sentences,
  len(t) AS n_toks,
  length(array_to_string(t, '')) AS tok_chars,
  len(list_filter(lines, l -> regexp_matches(rtrim(l), '[.!?"'']$')))
    AS n_punct_lines,
  len(list_filter(t, x -> list_contains([{stop}], x))) AS n_stop,
  len(list_filter(t, x -> regexp_matches(x, '^[A-Za-z]+$'))) AS n_alpha,
  contains(lower(text), 'lorem ipsum') AS has_lorem_ipsum,
  contains(text, '{{') AS has_brace
  FROM base)
SELECT doc_id, n_lines, n_sentences,
  ROUND(n_toks::DOUBLE / n_lines, 6) AS mean_words_per_line,
  ROUND(tok_chars::DOUBLE / n_toks, 6) AS mean_word_len,
  ROUND(n_punct_lines::DOUBLE / n_lines, 6) AS frac_lines_end_punct,
  ROUND(n_stop::DOUBLE / n_toks, 6) AS stopword_frac,
  ROUND(n_alpha::DOUBLE / n_toks, 6) AS frac_alpha_tokens,
  has_lorem_ipsum, has_brace,
  (n_toks BETWEEN 50 AND 100000
   AND ROUND(tok_chars::DOUBLE / n_toks, 6) BETWEEN 3.0 AND 10.0
   AND ROUND(n_alpha::DOUBLE / n_toks, 6) >= 0.8
   AND NOT has_lorem_ipsum AND NOT has_brace) AS keep
FROM sig
"""


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .driver_contract import _documents
    from .pipeline.text import unigram_logprob

    return unigram_logprob(_documents(spark, sf_dir))


def sql_unigram_logprob() -> str:
    return """
WITH toks AS (SELECT doc_id, u.term
              FROM (SELECT doc_id,
                    regexp_split_to_array(trim(text), '\\s+') AS t
                    FROM documents), UNNEST(t) AS u(term)),
vocab AS (SELECT term, COUNT(*) AS c FROM toks GROUP BY 1),
tot AS (SELECT COUNT(*) AS t FROM toks)
SELECT doc_id,
       ROUND(AVG(LN(vocab.c::DOUBLE / tot.t)), 6) AS avg_logprob,
       COUNT(*) AS n_tokens
FROM toks JOIN vocab USING (term), tot
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Multimodal: exact-oracle coverage for the binary encode->decode->feature
# path (pipeline/multimodal.py). Payloads are integer-valued pure functions
# of doc_id, so DuckDB replays the WAV PCM samples / PPM pixels themselves.
# ---------------------------------------------------------------------------
PCM_N_SAMPLES = 512
PPM_W, PPM_H = 32, 24
PPM_OUT_W, PPM_OUT_H = 8, 6


def q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize real RIFF/WAVE payloads (LCG int16 samples), push them
    through the binary column -> decode_wav -> integer feature path."""
    from .driver_contract import _documents
    from .pipeline.multimodal import pcm_stats, synthesize_pcm_corpus

    ids = _documents(spark, sf_dir).select("doc_id")
    return pcm_stats(synthesize_pcm_corpus(ids, n_samples=PCM_N_SAMPLES))


def sql_multimodal_audio() -> str:
    from .pipeline.multimodal import PCM_LCG_A, PCM_LCG_B

    n = PCM_N_SAMPLES
    return f"""
WITH ids AS (SELECT doc_id AS media_id FROM documents),
samp AS (SELECT media_id, u.i,
         (({PCM_LCG_A} * u.i + {PCM_LCG_B} * (media_id + 1)) % 65536)
           - 32768 AS s
         FROM ids, UNNEST(range(0, {n})) AS u(i)),
lagged AS (SELECT media_id, s,
           LAG(s) OVER (PARTITION BY media_id ORDER BY i) AS prev
           FROM samp)
SELECT media_id,
  COUNT(*) AS n_samples,
  SUM(CASE WHEN prev IS NOT NULL AND (prev < 0) <> (s < 0)
      THEN 1 ELSE 0 END) AS zero_cross,
  MAX(abs(s)) AS peak,
  CAST(SUM(s) AS BIGINT) AS sample_sum,
  sqrt(SUM(s * s)::DOUBLE / COUNT(*)) AS rms
FROM lagged GROUP BY media_id
"""


def q_multimodal_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize real PPM payloads (gradient pixels), decode ->
    area-average downscale -> integer pixel stats."""
    from .driver_contract import _documents
    from .pipeline.multimodal import (
        ppm_resize_stats,
        synthesize_gradient_ppm,
    )

    ids = _documents(spark, sf_dir).select("doc_id")
    media = synthesize_gradient_ppm(ids, width=PPM_W, height=PPM_H)
    return ppm_resize_stats(media, width=PPM_OUT_W, height=PPM_OUT_H)


def q_multimodal_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same gradient pixels as multimodal_image, but compressed through
    the dependency-free PNG codec (stdlib zlib; scanline filter cycles
    id % 5, so this one row exercises every unfilter path): decode_png
    -> area-average downscale -> integer pixel stats. The oracle is the
    SAME pixel replay — the codec must be lossless."""
    from .driver_contract import _documents
    from .pipeline.multimodal import (
        png_resize_stats,
        synthesize_gradient_png,
    )

    ids = _documents(spark, sf_dir).select("doc_id")
    media = synthesize_gradient_png(ids, width=PPM_W, height=PPM_H)
    return png_resize_stats(media, width=PPM_OUT_W, height=PPM_OUT_H)


def q_multimodal_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grayscale constant-8×8-tile images through the dependency-free
    baseline JPEG codec (pipeline/jpeg.py). JPEG is lossy, but
    even-valued constant tiles survive bit-exactly at quality 50 (a
    constant block has DC = 8·(v−128), zero AC, and Annex-K q[0,0] is
    16), so the oracle replays the decoded pixels in SQL exactly:
    encode_jpeg -> decode_jpeg -> area-average downscale -> stats."""
    from .driver_contract import _documents
    from .pipeline.multimodal import (
        jpeg_resize_stats,
        synthesize_tiled_jpeg,
    )

    ids = _documents(spark, sf_dir).select("doc_id")
    media = synthesize_tiled_jpeg(ids, width=PPM_W, height=PPM_H)
    return jpeg_resize_stats(media, width=PPM_OUT_W, height=PPM_OUT_H)


def sql_multimodal_jpeg() -> str:
    fy, fx = PPM_H // PPM_OUT_H, PPM_W // PPM_OUT_W
    return f"""
WITH ids AS (SELECT doc_id AS media_id FROM documents),
px AS (SELECT media_id, y.y, x.x,
       ((5 * (x.x // 8) + 9 * (y.y // 8) + media_id) % 128) * 2 AS v
       FROM ids, UNNEST(range(0, {PPM_H})) AS y(y),
            UNNEST(range(0, {PPM_W})) AS x(x)),
rs AS (SELECT media_id, y // {fy} AS by, x // {fx} AS bx,
       SUM(v) // {fy * fx} AS rv
       FROM px GROUP BY 1, 2, 3)
SELECT media_id, {PPM_OUT_W} AS out_width, {PPM_OUT_H} AS out_height,
       CAST(SUM(rv) AS BIGINT) AS pixel_sum,
       MIN(rv) AS pixel_min, MAX(rv) AS pixel_max
FROM rs GROUP BY media_id
"""


VID_FRAMES, VID_FPS, VID_EVERY_MS = 8, 4, 500


def q_multimodal_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real MJPEG-in-AVI videos (RIFF container around exact-roundtrip
    tiled JPEG frames) -> sample_frames_mjpeg every 500 ms -> per-frame
    JPEG decode -> integer pixel stats. The whole chain — container
    parse, integer frame-index arithmetic, lossy-codec-exact tiles — is
    replayed by the SQL oracle."""
    from .driver_contract import _documents
    from .pipeline.multimodal import (
        mjpeg_frame_stats,
        synthesize_tiled_mjpeg,
    )

    ids = _documents(spark, sf_dir).select("doc_id")
    media = synthesize_tiled_mjpeg(
        ids, width=PPM_W, height=PPM_H, n_frames=VID_FRAMES, fps=VID_FPS
    )
    return mjpeg_frame_stats(media, every_ms=VID_EVERY_MS)


def sql_multimodal_video() -> str:
    dur = VID_FRAMES * 1000 // VID_FPS
    n_tiles = (PPM_W // 8) * (PPM_H // 8)
    return f"""
WITH ids AS (SELECT doc_id AS media_id FROM documents),
ts AS (SELECT media_id, t.ts,
       LEAST(t.ts * {VID_FPS} // 1000, {VID_FRAMES - 1}) AS f
       FROM ids, UNNEST(range(0, {dur + 1}, {VID_EVERY_MS})) AS t(ts)),
tiles AS (SELECT media_id, ts, f,
        ((5 * tx.tx + 9 * ty.ty + media_id + 17 * f) % 128) * 2 AS v
        FROM ts, UNNEST(range(0, {PPM_H // 8})) AS ty(ty),
             UNNEST(range(0, {PPM_W // 8})) AS tx(tx))
SELECT media_id, ts AS frame_ts_ms, f AS frame_index,
       CAST(SUM(v) * 64 AS BIGINT) AS pixel_sum,
       MIN(v) AS pixel_min, MAX(v) AS pixel_max
FROM tiles GROUP BY 1, 2, 3
"""


def q_multimodal_video_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw Y4M (Cmono) clips — the non-JPEG video decode route — ->
    frame sampling every 500 ms -> per-frame pixel stats. The lossless
    container means the oracle replays every pixel exactly without the
    lossy-codec tile construction the MJPEG row needs."""
    from .driver_contract import _documents
    from .pipeline.multimodal import (
        synthesize_gradient_y4m,
        y4m_frame_stats,
    )

    ids = _documents(spark, sf_dir).select("doc_id")
    media = synthesize_gradient_y4m(
        ids, width=PPM_W, height=PPM_H, n_frames=VID_FRAMES, fps=VID_FPS
    )
    return y4m_frame_stats(media, every_ms=VID_EVERY_MS)


def sql_multimodal_video_raw() -> str:
    dur = VID_FRAMES * 1000 // VID_FPS
    return f"""
WITH ids AS (SELECT doc_id AS media_id FROM documents),
ts AS (SELECT media_id, t.ts,
       LEAST(t.ts * {VID_FPS} // 1000, {VID_FRAMES - 1}) AS f
       FROM ids, UNNEST(range(0, {dur + 1}, {VID_EVERY_MS})) AS t(ts)),
px AS (SELECT media_id, ts, f,
       (3 * x.x + 7 * y.y + 17 * f + media_id) % 256 AS v
       FROM ts, UNNEST(range(0, {PPM_H})) AS y(y),
            UNNEST(range(0, {PPM_W})) AS x(x))
SELECT media_id, ts AS frame_ts_ms, f AS frame_index,
       CAST(SUM(v) AS BIGINT) AS pixel_sum,
       MIN(v) AS pixel_min, MAX(v) AS pixel_max
FROM px GROUP BY 1, 2, 3
"""


def sql_multimodal_image() -> str:
    fy, fx = PPM_H // PPM_OUT_H, PPM_W // PPM_OUT_W
    return f"""
WITH ids AS (SELECT doc_id AS media_id FROM documents),
px AS (SELECT media_id, y.y, x.x, c.c,
       (3 * x.x + 7 * y.y + 11 * c.c + media_id) % 256 AS v
       FROM ids, UNNEST(range(0, {PPM_H})) AS y(y),
            UNNEST(range(0, {PPM_W})) AS x(x),
            UNNEST(range(0, 3)) AS c(c)),
rs AS (SELECT media_id, y // {fy} AS by, x // {fx} AS bx, c,
       SUM(v) // {fy * fx} AS rv
       FROM px GROUP BY 1, 2, 3, 4)
SELECT media_id, {PPM_OUT_W} AS out_width, {PPM_OUT_H} AS out_height,
       CAST(SUM(rv) AS BIGINT) AS pixel_sum,
       MIN(rv) AS pixel_min, MAX(rv) AS pixel_max
FROM rs GROUP BY media_id
"""


# ---------------------------------------------------------------------------
# BPE tokenizer (pipeline/bpe.py): distributed word counting (exact oracle)
# + train/encode roundtrip invariants (the merge loop itself is a driver-side
# pure function of the word counts — not SQL-expressible, so the validity row
# pins roundtrip identity and token-count bounds over every document).
# ---------------------------------------------------------------------------
BPE_MIN_COUNT = 2
BPE_N_MERGES = 40


def q_bpe_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .driver_contract import _documents
    from .pipeline.bpe import word_counts

    return word_counts(_documents(spark, sf_dir), min_count=BPE_MIN_COUNT)


def sql_bpe_word_counts() -> str:
    return f"""
WITH toks AS (SELECT u.word
              FROM (SELECT regexp_split_to_array(trim(text), '\\s+') AS t
                    FROM documents), UNNEST(t) AS u(word))
SELECT word, COUNT(*) AS count FROM toks
GROUP BY word HAVING COUNT(*) >= {BPE_MIN_COUNT}
"""


def q_bpe_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train {BPE_N_MERGES} merges on the corpus, encode every doc with
    token output, then assert (a) decode(encode(x)) == whitespace-
    normalized x for EVERY doc, (b) token counts respect the
    n_words <= n_bpe <= n_chars + n_words envelope."""
    from .driver_contract import _documents
    from .pipeline.bpe import END_OF_WORD, bpe_encode, bpe_train

    docs = _documents(spark, sf_dir)
    merges = bpe_train(docs, BPE_N_MERGES, min_count=BPE_MIN_COUNT)
    enc = bpe_encode(docs, merges, with_tokens=True)
    joined = enc.join(docs.select("doc_id", "text"), "doc_id")
    norm = F.regexp_replace(F.trim("text"), r"\s+", " ")
    decoded = F.trim(
        F.regexp_replace(F.array_join("tokens", ""), END_OF_WORD, " ")
    )
    n_words = F.size(F.split(F.trim("text"), r"\s+"))
    agg = joined.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((decoded != norm).cast("long")).alias("roundtrip_fails"),
        F.sum(
            (
                (F.col("n_bpe_tokens") < n_words)
                | (F.col("n_bpe_tokens") > F.length(norm) + n_words)
            ).cast("long")
        ).alias("bound_violations"),
        F.lit(len(merges)).cast("long").alias("n_merges"),
    )
    return agg


def sql_bpe_validity() -> str:
    return f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(0 AS BIGINT) AS roundtrip_fails,
       CAST(0 AS BIGINT) AS bound_violations,
       CAST({BPE_N_MERGES} AS BIGINT) AS n_merges
FROM documents
"""


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .driver_contract import _documents
    from .pipeline.text import corpus_stats

    return corpus_stats(_documents(spark, sf_dir))


def sql_corpus_stats() -> str:
    return """
WITH per_doc AS (SELECT doc_id,
        len(regexp_split_to_array(trim(text), '\\s+')) AS n,
        length(text) AS chars FROM documents),
toks AS (SELECT u.term
         FROM (SELECT regexp_split_to_array(trim(text), '\\s+') AS t
               FROM documents), UNNEST(t) AS u(term)),
voc AS (SELECT COUNT(DISTINCT term) AS v, COUNT(*) AS total FROM toks)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS total_tokens,
       CAST(SUM(chars) AS BIGINT) AS total_chars,
       CAST(voc.v AS BIGINT) AS vocab_size,
       ROUND(voc.v::DOUBLE / voc.total, 6) AS type_token_ratio,
       ROUND(quantile_cont(n, 0.5), 6) AS p50_tokens,
       ROUND(quantile_cont(n, 0.9), 6) AS p90_tokens,
       ROUND(quantile_cont(n, 0.99), 6) AS p99_tokens,
       CAST(MAX(n) AS BIGINT) AS max_tokens
FROM per_doc, voc GROUP BY voc.v, voc.total
"""


# ---------------------------------------------------------------------------
# Data-mixture planning/sampling (pipeline/sampling.py): per-group Bernoulli
# rates realizing a target token mixture under a budget. Weights normalize
# driver-side and inline as plan/SQL literals (exact repr round-trip), so
# both engines compute identical rates; the keep decision replays the same
# md5-60bit hash gate as the other sampling oracles.
# ---------------------------------------------------------------------------
MIX_WEIGHTS = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
MIX_BUDGET = 5000


def _mix_norm() -> dict[str, float]:
    t = sum(MIX_WEIGHTS.values())
    return {g: w / t for g, w in MIX_WEIGHTS.items()}


def q_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline.sampling import mixture_plan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return mixture_plan(docs, "source", MIX_WEIGHTS, MIX_BUDGET)


def _sql_mix_rates() -> str:
    vals = ", ".join(
        f"('{g}', CAST({w!r} AS DOUBLE))"
        for g, w in sorted(_mix_norm().items())
    )
    return f"""
per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+')))
             AS BIGINT) AS group_tokens
        FROM documents GROUP BY 1),
wt(source, w) AS (VALUES {vals}),
rates AS (SELECT per.source, n_docs, group_tokens,
          ROUND(w, 9) AS target_weight,
          ROUND(LEAST(1.0, {MIX_BUDGET}.0 * w / group_tokens), 9) AS rate,
          ROUND(ROUND(LEAST(1.0, {MIX_BUDGET}.0 * w / group_tokens), 9)
                * group_tokens, 6) AS expected_tokens,
          ROUND(GREATEST(0.0, {MIX_BUDGET}.0 * w - group_tokens), 6)
            AS deficit_tokens
          FROM per JOIN wt USING (source))
"""


def sql_mixture_plan() -> str:
    return f"WITH {_sql_mix_rates()} SELECT * FROM rates"


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline.sampling import mixture_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return mixture_sample(
        docs, "source", MIX_WEIGHTS, MIX_BUDGET, seed=SAMPLE_SEED
    ).select("doc_id", "source")


def sql_mixture_sample() -> str:
    return f"""
WITH {_sql_mix_rates()}
SELECT d.doc_id, d.source FROM documents d JOIN rates USING (source)
WHERE {_SQL_DOC_HASH} < FLOOR(rate * {float(_HS)!r})
"""


def q_triangle_approx_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOULION invariants on the mod graph: the p=1 run equals the exact
    count, the p=0.5 estimate lands within 3x the paper's 1/(p*sqrt(T))
    relative-error bound, and the sample is a strict, reproducible
    subset of the edges."""
    from .operators.triangle import triangle_count, triangle_count_approx

    g = _graph_mod(spark, sf_dir)
    exact = triangle_count(g).global_count
    full = triangle_count_approx(g, p=1.0)
    r1 = triangle_count_approx(g, p=0.5, seed=3)
    r2 = triangle_count_approx(g, p=0.5, seed=3)
    bound = 3.0 / (0.5 * max(exact, 1) ** 0.5)
    ok_exact = full["estimate"] == exact
    ok_err = abs(r1["estimate"] - exact) / max(exact, 1) <= max(bound, 0.35)
    ok_subset = 0 < r1["sampled_edges"] < full["sampled_edges"]
    ok_repro = r1["estimate"] == r2["estimate"]
    return spark.createDataFrame(
        [(bool(ok_exact), bool(ok_err), bool(ok_subset), bool(ok_repro))],
        "p1_exact boolean, within_error boolean, strict_subset boolean, "
        "reproducible boolean",
    )


def sql_triangle_approx_validity() -> str:
    return """
SELECT TRUE AS p1_exact, TRUE AS within_error,
       TRUE AS strict_subset, TRUE AS reproducible
"""


def q_hyperanf_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperANF invariants vs exact MSBFS distances on the (symmetrized)
    mod graph: the estimated neighborhood function is monotone, N(0)
    tracks |V| and N(converged) tracks the exact reachable-pair count
    within HLL error (m=64, rsd 13%; sums over ~100 counters), and the
    q=0.9 effective diameter lands within 2 hops of the exact one."""
    from .graph import from_edge_df
    from .operators.allpaths import all_shortest_paths
    from .operators.hyperanf import effective_diameter

    g = _graph_mod(spark, sf_dir)
    r = effective_diameter(g, q=0.9)
    nf = r["neighborhood_function"]

    e = edges_mod(spark, sf_dir)
    sym = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    g2 = from_edge_df(sym)
    n = g2.node_count()
    d = all_shortest_paths(g2)
    has_self = d.filter("s = target").count()
    hops = {
        int(row.d): row.c
        for row in d.groupBy(F.col("distance").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    if has_self == 0:
        hops[0] = hops.get(0, 0) + n
    exact_pairs = sum(hops.values())
    acc, exact_nf = 0, {}
    for t in sorted(hops):
        acc += hops[t]
        exact_nf[t] = acc
    target = 0.9 * exact_pairs
    exact_eff = max(exact_nf)
    for t in sorted(exact_nf):
        if exact_nf[t] >= target:
            exact_eff = t
            break

    vals = [v for _, v in nf]
    monotone = all(b >= a * (1 - 1e-9) for a, b in zip(vals, vals[1:]))
    n0_ok = abs(nf[0][1] / n - 1.0) <= 0.25
    ninf_ok = abs(r["reachable_pairs"] / exact_pairs - 1.0) <= 0.25
    eff_ok = abs(r["effective_diameter"] - exact_eff) <= 2.0
    return spark.createDataFrame(
        [(bool(monotone), bool(n0_ok), bool(ninf_ok), bool(eff_ok))],
        "monotone boolean, n0_within_err boolean, "
        "ninf_within_err boolean, eff_diameter_close boolean",
    )


def sql_hyperanf_validity() -> str:
    return """
SELECT TRUE AS monotone, TRUE AS n0_within_err,
       TRUE AS ninf_within_err, TRUE AS eff_diameter_close
"""


def q_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """graph.list degreeDistribution parity (ref GraphStoreCatalog.java:112
    returns a percentile summary of out-degrees; the catalog method uses
    percentile_approx for UX parity with GDS's HDR histogram — this
    contract row pins the same summary with exact type-7 percentiles so
    it is value-comparable cross-engine)."""
    deg = edges_mod(spark, sf_dir).groupBy("src").agg(
        F.count(F.lit(1)).alias("d")
    )
    return deg.agg(
        F.min("d").cast("long").alias("min_deg"),
        F.max("d").cast("long").alias("max_deg"),
        F.round(F.mean("d"), 6).alias("mean_deg"),
        F.round(F.percentile("d", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("d", F.lit(0.75)), 6).alias("p75"),
        F.round(F.percentile("d", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("d", F.lit(0.99)), 6).alias("p99"),
    )


def sql_degree_distribution() -> str:
    return f"""
WITH deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d
             FROM ({sql_edges_mod()}) GROUP BY 1)
SELECT CAST(MIN(d) AS BIGINT) AS min_deg, CAST(MAX(d) AS BIGINT) AS max_deg,
       ROUND(AVG(d), 6) AS mean_deg,
       ROUND(quantile_cont(d, 0.5), 6) AS p50,
       ROUND(quantile_cont(d, 0.75), 6) AS p75,
       ROUND(quantile_cont(d, 0.9), 6) AS p90,
       ROUND(quantile_cont(d, 0.99), 6) AS p99
FROM deg
"""


# ---------------------------------------------------------------------------
# K-core decomposition (operators/kcore.py): the h-index iteration is
# integer-valued and deterministic, so the oracle replays it exactly —
# KCORE_LEVELS unrolled rounds from c0 = degree over the symmetrized mod
# graph (measured fixpoint at sf0.01: 3 rounds; extra levels are no-ops
# once fixed, and the Spark side RAISES if not converged).
# ---------------------------------------------------------------------------
KCORE_LEVELS = 24  # must cover the h-index fixpoint at every swept
# sf (measured: 3 iterations at sf0.01, 15 at sf0.1 — the old 5-level
# unroll silently under-converged the oracle at sf0.1; Spark runs to
# the true fixpoint). Levels beyond the fixpoint are no-ops.


def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.kcore import k_core

    g = _graph_mod(spark, sf_dir)
    out = k_core(g)
    return (
        out.join(
            g.vertices.select("internal_id", "original_id"), "internal_id"
        )
        .select(F.col("original_id").cast("long").alias("id"), "core")
    )


def sql_kcore() -> str:
    lv = [
        f"""
c{t} AS MATERIALIZED (SELECT dst AS id, CAST(MAX(LEAST(r, value)) AS BIGINT) AS core
  FROM (SELECT s.b AS dst, c.core AS value,
          ROW_NUMBER() OVER (PARTITION BY s.b
            ORDER BY c.core DESC, s.a ASC) AS r
        FROM sym s JOIN c{t - 1} c ON s.a = c.id)
  GROUP BY 1)"""
        for t in range(1, KCORE_LEVELS + 1)
    ]
    return f"""
WITH e0 AS ({sql_edges_mod()}),
sym AS (SELECT DISTINCT a, b FROM
         (SELECT src AS a, dst AS b FROM e0
          UNION ALL SELECT dst AS a, src AS b FROM e0)),
c0 AS (SELECT a AS id, CAST(COUNT(*) AS BIGINT) AS core FROM sym GROUP BY 1),
{",".join(lv)}
SELECT id, core FROM c{KCORE_LEVELS}
"""


# ---------------------------------------------------------------------------
# Text normalization (pipeline/text.normalize_text): plant NFC-unnormalized
# accents, control chars, zero-widths, NBSP runs and CRLF into the corpus;
# the oracle replays the full chain (DuckDB nfc_normalize implements the
# same UAX#15 as Python's unicodedata) with the class patterns emitted as
# RE2 \x{..} escapes from the SAME codepoint lists the Spark op uses.
# ---------------------------------------------------------------------------


def _norm_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .driver_contract import _documents

    d = F.col("doc_id")
    # exactly the byte sequence the oracle builds with chr(): NFC-
    # decomposable accent, \x01 control, ZWSP, CRLF, NBSP run, newline pile
    mess = F.concat(
        F.lit(
            "  cafe\u0301 \x01x\u200b y\r\nline2   end\u00a0\u00a0"
        ),
        F.when(d % 3 == 0, F.lit("\n\n\n\ntail")).otherwise(F.lit("")),
    )
    return _documents(spark, sf_dir).select(
        "doc_id", F.concat(F.col("text"), mess).alias("text")
    )


def q_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline.text import normalize_text

    return normalize_text(_norm_planted(spark, sf_dir), form="NFC")


def sql_normalize_text() -> str:
    from .pipeline.text import _SPACE_CHARS, _STRIP_CHARS

    def cls(chars: str) -> str:
        return "[" + "".join(f"\\x{{{ord(c):x}}}" for c in chars) + "]"

    mess = (
        "'  cafe' || chr(769) || ' ' || chr(1) || 'x' || chr(8203) || ' y'"
        " || chr(13) || chr(10) || 'line2   end' || chr(160) || chr(160)"
        " || CASE WHEN doc_id % 3 = 0 THEN chr(10) || chr(10) || chr(10)"
        " || chr(10) || 'tail' ELSE '' END"
    )
    return f"""
WITH planted AS (SELECT doc_id, text || {mess} AS t FROM documents),
n AS (SELECT doc_id, nfc_normalize(t) AS t FROM planted),
s1 AS (SELECT doc_id, regexp_replace(t, '{cls(_STRIP_CHARS)}', '', 'g') AS t FROM n),
s2 AS (SELECT doc_id, regexp_replace(t, chr(13) || chr(10) || '|' || chr(13),
         chr(10), 'g') AS t FROM s1),
s3 AS (SELECT doc_id, regexp_replace(t, '{cls(_SPACE_CHARS)}', ' ', 'g') AS t FROM s2),
s4 AS (SELECT doc_id, regexp_replace(t, '[ ' || chr(9) || ']+', ' ', 'g') AS t FROM s3),
s5 AS (SELECT doc_id, regexp_replace(t, ' *' || chr(10) || ' *', chr(10), 'g') AS t FROM s4),
s6 AS (SELECT doc_id, regexp_replace(t, chr(10) || '{{3,}}', chr(10) || chr(10), 'g') AS t FROM s5)
SELECT doc_id, trim(t) AS text FROM s6
"""


# ---------------------------------------------------------------------------
# Line-level boilerplate (pipeline/text.py): plant a shared cookie-banner
# line into half the documents and a unique footer into a fifth, then the
# oracle replays detection (COUNT(DISTINCT doc) per line) and removal
# (rebuild every document line-by-line) exactly.
# ---------------------------------------------------------------------------


def _boiler_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .driver_contract import _documents

    d = F.col("doc_id")
    return _documents(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                d % 2 == 0, F.lit("\nCOOKIE BANNER: accept all")
            ).otherwise(F.lit("")),
            F.when(
                d % 5 == 0,
                F.concat(F.lit("\nfooter "), d.cast("string")),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )


_SQL_BOILER_PLANTED = (
    "SELECT doc_id, text"
    " || CASE WHEN doc_id % 2 = 0 THEN chr(10) ||"
    " 'COOKIE BANNER: accept all' ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'footer ' ||"
    " CAST(doc_id AS VARCHAR) ELSE '' END AS text FROM documents"
)

_SQL_BOILER_LINES = f"""
planted AS ({_SQL_BOILER_PLANTED}),
l AS (SELECT doc_id, UNNEST(range(1, len(ls) + 1)) AS pos,
             UNNEST(ls) AS line
      FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM planted)),
bl AS (SELECT line, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
       FROM l WHERE trim(line) != '' GROUP BY line
       HAVING COUNT(DISTINCT doc_id) >= 2)
"""


def q_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline.text import boilerplate_lines

    return boilerplate_lines(_boiler_planted(spark, sf_dir))


def sql_boilerplate_lines() -> str:
    return f"WITH {_SQL_BOILER_LINES} SELECT line, n_docs FROM bl"


def q_remove_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline.text import remove_boilerplate_lines

    return remove_boilerplate_lines(_boiler_planted(spark, sf_dir))


def sql_remove_boilerplate() -> str:
    return f"""
WITH {_SQL_BOILER_LINES},
keep AS (SELECT doc_id, pos, l.line FROM l LEFT JOIN bl USING (line)
         WHERE trim(l.line) = '' OR bl.line IS NULL),
rebuilt AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
            FROM keep GROUP BY doc_id)
SELECT p.doc_id, COALESCE(r.text, '') AS text
FROM planted p LEFT JOIN rebuilt r USING (doc_id)
"""


# ---------------------------------------------------------------------------
# int8 scalar quantization (pipeline/ann.py): per-vector scales, floor(x+.5)
# rounding, and integer dot products are all engine-exact, so BOTH the
# quantized vectors and the quantized cosine ranking carry exact oracles.
# ---------------------------------------------------------------------------
QUANT_TOPK = 3


def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .driver_contract import _embeddings
    from .pipeline.ann import quantize_embeddings

    out = quantize_embeddings(_embeddings(spark, sf_dir))
    # array column projected to a string: the driver harness cannot
    # canonicalize list-typed cells (pandas sort/hash limitation)
    return out.select(
        "vec_id", "scale",
        F.array_join(
            F.transform("qvec", lambda x: x.cast("string")), ","
        ).alias("qvec_str"),
    )


_SQL_QUANT_CTE = """
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sc AS (SELECT vec_id, v,
        CASE WHEN list_aggregate(list_transform(v, x -> abs(x)), 'max') = 0
             THEN 1.0
             ELSE list_aggregate(list_transform(v, x -> abs(x)), 'max')
                  / 127.0 END AS scale
       FROM e),
qq AS (SELECT vec_id, scale,
        list_transform(v, x -> CAST(GREATEST(-127, LEAST(127,
          FLOOR(x / scale + 0.5))) AS INT)) AS qvec
       FROM sc)
"""


def sql_embedding_quantize() -> str:
    return (
        f"WITH {_SQL_QUANT_CTE} SELECT vec_id, scale, "
        "array_to_string(qvec, ',') AS qvec_str FROM qq"
    )


def q_embedding_topk_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .driver_contract import _embeddings
    from .pipeline.ann import cosine_topk_quantized

    out = cosine_topk_quantized(_embeddings(spark, sf_dir), k=QUANT_TOPK)
    return out.select(
        "vec_id", "neighbor_id", F.round("cosine", 4).alias("cosine")
    )


def sql_embedding_topk_quantized() -> str:
    return f"""
WITH {_SQL_QUANT_CTE},
nq AS (SELECT vec_id, qvec::DOUBLE[] AS q,
        sqrt(list_dot_product(qvec::DOUBLE[], qvec::DOUBLE[])) AS n
       FROM qq),
scored AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         list_dot_product(a.q, b.q) / (a.n * b.n) AS cosine
  FROM nq a JOIN nq b ON a.vec_id != b.vec_id
  WHERE a.n > 0 AND b.n > 0)
SELECT vec_id, neighbor_id, ROUND(cosine, 4) AS cosine FROM (
  SELECT *, ROW_NUMBER() OVER
    (PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id ASC) AS rn
  FROM scored) WHERE rn <= {QUANT_TOPK}
"""


def q_corpus_stats_approx_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-vs-exact invariants for the 100-TB profiling path: totals
    (one-pass sums) are exactly equal, the HLL++ vocabulary estimate is
    within 3 standard deviations of the exact count, and the GK quantile
    sketch returns actual order statistics (monotone, inside [min, max],
    max exact)."""
    from .driver_contract import _documents
    from .pipeline.text import corpus_stats, corpus_stats_approx

    docs = _documents(spark, sf_dir)
    rsd = 0.05
    exact = corpus_stats(docs).collect()[0]
    approx = corpus_stats_approx(docs, rsd=rsd).collect()[0]
    totals_ok = (
        approx.n_docs == exact.n_docs
        and approx.total_tokens == exact.total_tokens
        and approx.total_chars == exact.total_chars
    )
    vocab_ok = abs(approx.vocab_approx - exact.vocab_size) <= max(
        3.0 * rsd * exact.vocab_size, 1.0
    )
    monotone = (
        approx.min_tokens
        <= approx.p50_tokens
        <= approx.p90_tokens
        <= approx.p99_tokens
        <= approx.max_tokens
    )
    max_ok = approx.max_tokens == exact.max_tokens
    return spark.createDataFrame(
        [(bool(totals_ok), bool(vocab_ok), bool(monotone), bool(max_ok))],
        "totals_exact boolean, vocab_within_3sd boolean, "
        "quantiles_monotone boolean, max_exact boolean",
    )


def sql_corpus_stats_approx_validity() -> str:
    return """
SELECT TRUE AS totals_exact, TRUE AS vocab_within_3sd,
       TRUE AS quantiles_monotone, TRUE AS max_exact
"""


# ---------------------------------------------------------------------------
# DSIR importance resampling (pipeline/sampling.py): hashed unigram+bigram
# bag models (target = the src0 slice, raw = the whole corpus) -> per-doc
# log-likelihood-ratio weights -> Gumbel-top-k sample. Buckets, counts and
# the hash-Gumbel noise all replay exactly in DuckDB (portable md5-60bit
# hash, Laplace smoothing on integer counts, one ROUND(...,6) per output).
# ---------------------------------------------------------------------------
DSIR_BUCKETS = 1024
DSIR_SEED = 13
DSIR_K = 60


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline.sampling import dsir_weights

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dsir_weights(
        docs,
        docs.filter(F.col("source") == "src0"),
        n_buckets=DSIR_BUCKETS,
        seed=DSIR_SEED,
    )


def _sql_dsir_weights_cte() -> str:
    b = DSIR_BUCKETS
    return rf"""
tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents),
feat AS (SELECT doc_id, u.f FROM (
          SELECT doc_id, list_concat(t, list_transform(range(1, len(t)),
                 i -> t[i] || chr(31) || t[i+1])) AS fs FROM tok),
         UNNEST(fs) AS u(f)),
bf AS (SELECT doc_id,
        ('0x' || substr(md5('{DSIR_SEED}' || chr(31) || f), 1, 15))::BIGINT
          % {b} AS bucket
       FROM feat),
tf_raw AS (SELECT doc_id, bucket, COUNT(*) AS tf FROM bf GROUP BY 1, 2),
cnt_raw AS (SELECT bucket, SUM(tf) AS rc FROM tf_raw GROUP BY 1),
cnt_tgt AS (SELECT bucket, COUNT(*) AS tc
            FROM bf JOIN documents USING (doc_id)
            WHERE source = 'src0' GROUP BY 1),
tot AS (SELECT (SELECT SUM(rc) FROM cnt_raw) AS rt,
               (SELECT SUM(tc) FROM cnt_tgt) AS tt),
wts AS (SELECT doc_id,
        ROUND(SUM(tf * (LN((COALESCE(tc, 0) + 1.0) / (tt + {b}.0))
                      - LN((rc + 1.0) / (rt + {b}.0)))), 6) AS logratio,
        CAST(SUM(tf) AS BIGINT) AS n_features
        FROM tf_raw LEFT JOIN cnt_tgt USING (bucket)
             JOIN cnt_raw USING (bucket), tot
        GROUP BY doc_id)
"""


def sql_dsir_weights() -> str:
    return f"WITH {_sql_dsir_weights_cte()} SELECT * FROM wts"


def q_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline.sampling import dsir_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dsir_sample(
        docs,
        docs.filter(F.col("source") == "src0"),
        DSIR_K,
        n_buckets=DSIR_BUCKETS,
        seed=DSIR_SEED,
    )


def sql_dsir_sample() -> str:
    from .pipeline.sampling import HASH_SPACE

    return f"""
WITH {_sql_dsir_weights_cte()}
SELECT doc_id, ROUND(logratio +
  (-LN(-LN((('0x' || substr(md5('{DSIR_SEED + 1}' || chr(31) ||
      CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT::DOUBLE + 0.5)
      / {float(HASH_SPACE)!r}))), 6) AS sample_key
FROM wts ORDER BY sample_key DESC, doc_id LIMIT {DSIR_K}
"""


CHUNK_TOKENS, CHUNK_OVERLAP = 16, 4


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline.text import chunk_documents

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    return chunk_documents(docs, CHUNK_TOKENS, overlap=CHUNK_OVERLAP)


def sql_chunk_documents() -> str:
    w, ov = CHUNK_TOKENS, CHUNK_OVERLAP
    step = w - ov
    return rf"""
WITH tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
             FROM documents),
c AS (SELECT doc_id,
        CAST(1 + CEIL(GREATEST(len(t) - {w}, 0) / {step}.0) AS INT) AS nc, t
      FROM tok)
SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
       array_to_string(t[i*{step} + 1 : i*{step} + {w}], ' ') AS chunk_text,
       CAST(len(t[i*{step} + 1 : i*{step} + {w}]) AS BIGINT) AS n_tokens
FROM c, UNNEST(range(0, nc)) AS u(i)
WHERE trim(array_to_string(t[i*{step} + 1 : i*{step} + {w}], ' ')) != ''
"""


def q_curate_corpus_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pipeline invariants on the documents table
    (benchmark = every 499th doc): stage chain is consistent (each
    stage's docs_in equals the previous docs_out, starting at the table
    count), counts never increase, the survivors are exactly the final
    stage's docs_out and each carries a split assignment."""
    from .pipeline.curation import curate_corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_total = docs.count()
    bench = docs.filter(F.col("doc_id") % 499 == 1)
    out, report = curate_corpus(
        docs,
        benchmark=bench,
        split_weights={"train": 0.9, "val": 0.1},
        min_jaccard_est=0.5,
        seed=SAMPLE_SEED,
    )
    rows = sorted(report.collect(), key=lambda r: r.stage_idx)
    chain_ok = rows[0].docs_in == n_total and all(
        a.docs_out == b.docs_in for a, b in zip(rows, rows[1:])
    )
    monotone = all(r.docs_out <= r.docs_in for r in rows)
    stage_names_ok = [r.stage for r in rows] == [
        "normalize", "exact_dedup", "near_dup", "quality", "pii_redact",
        "decontaminate",
    ]
    final = out.collect()
    count_ok = len(final) == rows[-1].docs_out
    split_ok = all(r.split in ("train", "val") for r in final)
    return spark.createDataFrame(
        [(
            bool(chain_ok), bool(monotone), bool(stage_names_ok),
            bool(count_ok), bool(split_ok),
        )],
        "chain_consistent boolean, counts_monotone boolean, "
        "stages_expected boolean, survivor_count_matches boolean, "
        "split_total boolean",
    )


def sql_curate_corpus_validity() -> str:
    return """
SELECT TRUE AS chain_consistent, TRUE AS counts_monotone,
       TRUE AS stages_expected, TRUE AS survivor_count_matches,
       TRUE AS split_total
"""


SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline.sampling import hash_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return hash_split(docs, SPLIT_WEIGHTS, seed=SAMPLE_SEED)


def sql_hash_split() -> str:
    from .pipeline.sampling import HASH_SPACE

    total = sum(SPLIT_WEIGHTS.values())
    names = sorted(SPLIT_WEIGHTS)
    acc, whens = 0.0, []
    for name in names[:-1]:
        acc += SPLIT_WEIGHTS[name] / total
        whens.append(f"WHEN {_SQL_DOC_HASH} < {int(acc * HASH_SPACE)} "
                     f"THEN '{name}'")
    return (
        f"SELECT doc_id, CASE {' '.join(whens)} ELSE '{names[-1]}' END "
        "AS split FROM documents"
    )


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis-Spirakis weighted sample, 10 docs per source weighted
    by n_chars; the oracle replays every ln(u)/w selection key."""
    from .pipeline.sampling import weighted_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "n_chars"
    )
    return weighted_sample(
        docs, "n_chars", 10, group_col="source", seed=SAMPLE_SEED
    ).select("doc_id", "source", "sample_key")


def sql_weighted_sample() -> str:
    from .pipeline.sampling import HASH_SPACE

    return f"""
WITH keyed AS (
  SELECT doc_id, source,
         ROUND(LN(({_SQL_DOC_HASH}::DOUBLE + 0.5) / {float(HASH_SPACE)!r})
               / n_chars::DOUBLE, 9) AS sample_key
  FROM documents WHERE n_chars > 0)
SELECT doc_id, source, sample_key FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
    ORDER BY sample_key DESC, doc_id ASC) AS rn FROM keyed)
WHERE rn <= 10
"""


def ext_queries() -> dict:
    return {
        "bfs": q_bfs,
        "scc": q_scc,
        "betweenness": q_betweenness,
        "hits": q_hits,
        "dijkstra_path": q_dijkstra_path,
        "yens_k_shortest": q_yens,
        "astar": q_astar,
        "modularity_metric": q_modularity,
        "scale_properties": q_scale_properties,
        "one_hot_encoding": q_one_hot,
        "similarity_functions": q_similarity_functions,
        "split_relationships": q_split_relationships,
        "wcc_threshold": q_wcc_threshold,
        "pagerank_personalized": q_pagerank_personalized,
        "pagerank_weighted": q_pagerank_weighted,
        "triangle_stream": q_triangle_stream,
        "balanced_triads": q_balanced_triads,
        "spanning_tree": q_spanning_tree,
        "random_walk": q_random_walk,
        "windowed_event_counts": q_windowed_event_counts,
        "hopping_event_counts": q_hopping_event_counts,
        "asof_join": q_asof_join,
        "range_join": q_range_join,
        "sessionize": q_sessionize,
        # rows-only (no oracle: engine-specific hash / seeded numpy /
        # schedule-dependent result)
        "louvain": q_louvain,
        "k1coloring": q_k1coloring,
        "fastrp": q_fastrp,
        "knn": q_knn,
        "node2vec": q_node2vec,
        "influence_celf": q_influence_celf,
        "all_shortest_paths": q_all_shortest_paths,
        # GraphSage + ML pipelines (invariant oracles)
        "graphsage": q_graphsage,
        "node_classification": q_node_classification,
        "link_prediction": q_link_prediction,
        # structural-validity entries (exact oracles for the invariants)
        "celf_validity": q_celf_validity,
        "knn_validity": q_knn_validity,
        "ann_lsh_validity": q_ann_lsh_validity,
        "random_walk_validity": q_random_walk_validity,
        "minhash_validity": q_minhash_validity,
        "simhash_validity": q_simhash_validity,
        "k1coloring_validity": q_k1coloring_validity,
        "louvain_validity": q_louvain_validity,
        "spanning_tree_validity": q_spanning_tree_validity,
        # embedding-cosine near-dup (exact + greedy dedup + LSH validity)
        "embedding_neardup": q_embedding_neardup,
        "embedding_neardup_dedup": q_embedding_neardup_dedup,
        "embedding_neardup_lsh_validity": q_embedding_neardup_lsh_validity,
        # clustered semantic dedup + k-means (training-data curation)
        "semantic_neardup": q_semantic_neardup,
        "semantic_dedup": q_semantic_dedup,
        "kmeans_validity": q_kmeans_validity,
        # deterministic sampling (training-data curation)
        "hash_sample": q_hash_sample,
        "stratified_sample": q_stratified_sample,
        "temperature_sample": q_temperature_sample,
        "group_topk_sample": q_group_topk_sample,
        # corpus curation (PII, decontamination, packing)
        "pii_scan": q_pii_scan,
        "pii_scan_luhn": q_pii_scan_luhn,
        "pii_redact": q_pii_redact,
        "decontaminate": q_decontaminate,
        "pack_sequences": q_pack_sequences,
        "packing_stats": q_packing_stats,
        # text analysis: keywords / quality gates / unigram LM
        "tfidf_topk": q_tfidf_topk,
        "heuristic_filters": q_heuristic_filters,
        "unigram_logprob": q_unigram_logprob,
        # multimodal binary columns (exact integer-replay oracles)
        "multimodal_audio": q_multimodal_audio,
        "multimodal_image": q_multimodal_image,
        "multimodal_png": q_multimodal_png,
        "multimodal_jpeg": q_multimodal_jpeg,
        "multimodal_video": q_multimodal_video,
        "multimodal_video_raw": q_multimodal_video_raw,
        # BPE tokenizer (distributed counts exact; train/encode validity)
        "bpe_word_counts": q_bpe_word_counts,
        "bpe_validity": q_bpe_validity,
        "corpus_stats": q_corpus_stats,
        "corpus_stats_approx_validity": q_corpus_stats_approx_validity,
        "kcore": q_kcore,
        "degree_distribution": q_degree_distribution,
        "hyperanf_validity": q_hyperanf_validity,
        "triangle_approx_validity": q_triangle_approx_validity,
        "normalize_text": q_normalize_text,
        "boilerplate_lines": q_boilerplate_lines,
        "remove_boilerplate": q_remove_boilerplate,
        "embedding_quantize": q_embedding_quantize,
        "embedding_topk_quantized": q_embedding_topk_quantized,
        "hash_split": q_hash_split,
        "curate_corpus_validity": q_curate_corpus_validity,
        "chunk_documents": q_chunk_documents,
        "weighted_sample": q_weighted_sample,
        "mixture_plan": q_mixture_plan,
        "mixture_sample": q_mixture_sample,
        "dsir_weights": q_dsir_weights,
        "dsir_sample": q_dsir_sample,
    }


def ext_oracle_sql() -> dict:
    return {
        "bfs": sql_bfs(),
        "scc": sql_scc(),
        "betweenness": sql_betweenness(),
        "hits": sql_hits(),
        "dijkstra_path": sql_dijkstra_path(),
        "yens_k_shortest": sql_yens(),
        "astar": sql_astar(),
        "modularity_metric": sql_modularity(),
        "scale_properties": sql_scale_properties(),
        "one_hot_encoding": sql_one_hot(),
        "similarity_functions": sql_similarity_functions(),
        "split_relationships": sql_split_relationships(),
        "wcc_threshold": sql_wcc_threshold(),
        "pagerank_personalized": sql_pagerank_personalized(),
        "pagerank_weighted": sql_pagerank_weighted(),
        "triangle_stream": sql_triangle_stream(),
        "balanced_triads": sql_balanced_triads(),
        "spanning_tree": sql_spanning_tree(),
        "random_walk": sql_random_walk(),
        "windowed_event_counts": sql_windowed_event_counts(),
        "hopping_event_counts": sql_hopping_event_counts(),
        "asof_join": sql_asof_join(),
        "range_join": sql_range_join(),
        "sessionize": sql_sessionize(),
        "k1coloring_validity": sql_k1coloring_validity(),
        "louvain_validity": sql_louvain_validity(),
        "spanning_tree_validity": sql_spanning_tree_validity(),
        "fastrp": sql_fastrp(),
        "node2vec": sql_node2vec(),
        "all_shortest_paths": sql_all_shortest_paths(),
        "celf_validity": sql_celf_validity(),
        "knn_validity": sql_knn_validity(),
        "ann_lsh_validity": sql_ann_lsh_validity(),
        "random_walk_validity": sql_random_walk_validity(),
        "minhash_validity": sql_minhash_validity(),
        "simhash_validity": sql_simhash_validity(),
        "graphsage": sql_graphsage(),
        "node_classification": sql_node_classification(),
        "link_prediction": sql_link_prediction(),
        "embedding_neardup": sql_embedding_neardup(),
        "embedding_neardup_dedup": sql_embedding_neardup_dedup(),
        "embedding_neardup_lsh_validity": sql_embedding_neardup_lsh_validity(),
        "semantic_neardup": sql_semantic_neardup(),
        "semantic_dedup": sql_semantic_dedup(),
        "kmeans_validity": sql_kmeans_validity(),
        "hash_sample": sql_hash_sample(),
        "stratified_sample": sql_stratified_sample(),
        "temperature_sample": sql_temperature_sample(),
        "group_topk_sample": sql_group_topk_sample(),
        "pii_scan": sql_pii_scan(),
        "pii_scan_luhn": sql_pii_scan_luhn(),
        "pii_redact": sql_pii_redact(),
        "decontaminate": sql_decontaminate(),
        "pack_sequences": sql_pack_sequences(),
        "packing_stats": sql_packing_stats(),
        "tfidf_topk": sql_tfidf_topk(),
        "heuristic_filters": sql_heuristic_filters(),
        "unigram_logprob": sql_unigram_logprob(),
        "multimodal_audio": sql_multimodal_audio(),
        "multimodal_image": sql_multimodal_image(),
        "multimodal_png": sql_multimodal_image(),
        "multimodal_jpeg": sql_multimodal_jpeg(),
        "multimodal_video": sql_multimodal_video(),
        "multimodal_video_raw": sql_multimodal_video_raw(),
        "bpe_word_counts": sql_bpe_word_counts(),
        "bpe_validity": sql_bpe_validity(),
        "corpus_stats": sql_corpus_stats(),
        "corpus_stats_approx_validity": sql_corpus_stats_approx_validity(),
        "kcore": sql_kcore(),
        "degree_distribution": sql_degree_distribution(),
        "hyperanf_validity": sql_hyperanf_validity(),
        "triangle_approx_validity": sql_triangle_approx_validity(),
        "normalize_text": sql_normalize_text(),
        "boilerplate_lines": sql_boilerplate_lines(),
        "remove_boilerplate": sql_remove_boilerplate(),
        "embedding_quantize": sql_embedding_quantize(),
        "embedding_topk_quantized": sql_embedding_topk_quantized(),
        "hash_split": sql_hash_split(),
        "curate_corpus_validity": sql_curate_corpus_validity(),
        "chunk_documents": sql_chunk_documents(),
        "weighted_sample": sql_weighted_sample(),
        "mixture_plan": sql_mixture_plan(),
        "mixture_sample": sql_mixture_sample(),
        "dsir_weights": sql_dsir_weights(),
        "dsir_sample": sql_dsir_sample(),
    }
