"""Driver-contract query registry: Spark queries + DuckDB oracle SQL.

Each entry runs a graph/data-pipeline operator of this engine over the
driver's TPC-H-ish parquet tables and has (where SQL-expressible) an exact
DuckDB oracle. Column names/types match on both sides; float columns are
rounded identically on both sides so the driver's order-insensitive
value-hash comparison is deterministic.

Graph derivations used (shared Spark/DuckDB definitions):
- ``edges_sp``  — directed bipartite supplier→part: one edge per distinct
  (l_suppkey, l_partkey); part ids offset by 10_000_000 into a disjoint id
  space; weight = number of lineitems for the pair.
- ``edges_ss``  — undirected co-supplier graph: suppliers that shipped the
  same part, canonical a<b pairs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from .graph import UNDIRECTED, from_edge_df
from .operators.degree import degree_centrality
from .operators.labelprop import label_propagation
from .operators.nodesim import node_similarity
from .operators.pagerank import pagerank
from .operators.triangle import local_clustering_coefficient, triangle_count
from .operators.wcc import wcc

PART_OFFSET = 10_000_000

# -- shared derivation SQL (DuckDB side) ---------------------------------
SQL_EDGES_SP = (
    "SELECT l_suppkey AS src, l_partkey + 10000000 AS dst, "
    "CAST(COUNT(*) AS DOUBLE) AS weight FROM lineitem GROUP BY 1, 2"
)
SQL_EDGES_SS = (
    "SELECT DISTINCT a.l_suppkey AS a, b.l_suppkey AS b "
    "FROM lineitem a JOIN lineitem b ON a.l_partkey = b.l_partkey "
    "AND a.l_suppkey < b.l_suppkey"
)
SQL_NODES_SP = (
    "SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges"
)


def _lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def edges_sp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _lineitem(spark, sf_dir)
    return (
        li.groupBy(
            F.col("l_suppkey").alias("src"),
            (F.col("l_partkey") + PART_OFFSET).alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )


def edges_ss(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build():
        li = (
            _lineitem(spark, sf_dir)
            .select("l_suppkey", "l_partkey")
            .distinct()
        )
        a = li.select(
            F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("a")
        )
        b = li.select(
            F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("b")
        )
        return (
            a.join(b, "pk")
            .filter(F.col("a") < F.col("b"))
            .select("a", "b")
            .distinct()
            # consumers (common_neighbors, adamic_adar, the PR symmetrized
            # graph) reference this frame 2-4 times per query AND across
            # queries (memoized below); materialize so the
            # self-join-of-self-join tree doesn't re-scan lineitem per use
            .localCheckpoint(eager=False)
        )

    return _memo_graph(spark, sf_dir, "edges_ss", build)


# Session-scoped graph catalog: the contract queries run as a suite over
# one SparkSession, and 24 of them derive the same three graphs from
# lineitem — mirroring the reference's usage model (gds.graph.create once,
# run many algorithms against the named catalog entry, ref proc/.../
# catalog/GraphCreateProc.java). Graph objects are immutable here
# (operators never mutate contract graphs), so memoize per
# (session, sf_dir, shape). Keyed on the session OBJECT (strong ref) so a
# stopped session's entries can never be revived by id() reuse.
_GRAPH_MEMO: dict = {}


def _memo_graph(spark: SparkSession, sf_dir: str, shape: str, builder):
    key = (spark, sf_dir, shape)
    hit = _GRAPH_MEMO.get(key)
    if hit is None:
        hit = builder()
        _GRAPH_MEMO[key] = hit
    return hit


def _graph_sp(spark: SparkSession, sf_dir: str):
    return _memo_graph(
        spark, sf_dir, "sp",
        lambda: from_edge_df(edges_sp(spark, sf_dir), weight="weight"),
    )


def _graph_ss(spark: SparkSession, sf_dir: str):
    def build():
        e = edges_ss(spark, sf_dir).select(
            F.col("a").alias("src"), F.col("b").alias("dst")
        )
        return from_edge_df(e, orientation=UNDIRECTED)

    return _memo_graph(spark, sf_dir, "ss", build)


def _to_original(result: DataFrame, vertices: DataFrame, col: str,
                 out: str) -> DataFrame:
    """Map an internal-id column back to original ids."""
    tmp_key, tmp_val = f"__k_{col}", f"__v_{col}"
    m = vertices.select(
        F.col("internal_id").alias(tmp_key),
        F.col("original_id").cast("long").alias(tmp_val),
    )
    return (
        result.join(m, result[col] == m[tmp_key])
        .drop(col, tmp_key)
        .withColumnRenamed(tmp_val, out)
    )


# -- PageRank ------------------------------------------------------------
PR_ITERS = 8  # classic-iteration count; query runs max_iterations=PR_ITERS+1
PR_DAMPING = 0.85
# PageRank runs on the symmetrized co-supplier graph (cyclic, so the power
# iteration is exercised for all PR_ITERS supersteps, unlike the bipartite
# supplier->part DAG which converges after one step).
SQL_EDGES_PR = (
    f"WITH canon AS ({SQL_EDGES_SS}) "
    "SELECT a AS src, b AS dst, CAST(1.0 AS DOUBLE) AS weight FROM canon "
    "UNION ALL SELECT b, a, 1.0 FROM canon"
)


def _graph_pr(spark: SparkSession, sf_dir: str):
    def build():
        e = edges_ss(spark, sf_dir)
        sym = e.select(
            F.col("a").alias("src"), F.col("b").alias("dst")
        ).unionAll(e.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        return from_edge_df(sym)

    return _memo_graph(spark, sf_dir, "pr", build)


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gated on the FUSED kernel — the flagship 100-TB path (one
    applyInPandas round-trip per superstep) is the one the oracle checks;
    fused vs classic agreement <1e-9 is separately pinned in
    tests/test_fused.py."""
    from .plans.fused import build_bucketed_csr

    g = _graph_pr(spark, sf_dir)
    csr = build_bucketed_csr(g.edges, g.node_count())
    out = pagerank(
        g, damping=PR_DAMPING, tolerance=0.0, max_iterations=PR_ITERS + 1,
        csr=csr, chunk_size=5,
    ).scores
    out = _to_original(out, g.vertices, "internal_id", "id")
    return out.select("id", F.round("score", 6).alias("score"))


def sql_pagerank() -> str:
    ctes = [
        f"edges AS MATERIALIZED ({SQL_EDGES_PR})",
        f"nodes AS MATERIALIZED ({SQL_NODES_SP})",
        "deg AS (SELECT src AS id, CAST(COUNT(*) AS DOUBLE) AS deg "
        "FROM edges GROUP BY src)",
        "r0 AS (SELECT id, CAST(0.15 AS DOUBLE) AS rank FROM nodes)",
    ]
    for k in range(1, PR_ITERS + 1):
        ctes.append(
            f"r{k} AS (SELECT n.id, 0.15 + {PR_DAMPING} * COALESCE(m.s, 0) AS rank "
            f"FROM nodes n LEFT JOIN ("
            f"SELECT e.dst AS id, SUM(r.rank / d.deg) AS s "
            f"FROM edges e JOIN r{k - 1} r ON r.id = e.src "
            f"JOIN deg d ON d.id = e.src GROUP BY e.dst) m ON m.id = n.id)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, ROUND(rank, 6) AS score FROM r{PR_ITERS}"
    )


# -- ArticleRank ---------------------------------------------------------
AR_ITERS = 6


def q_article_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # GDS-1.6 ArticleRank is unnormalized and diverges on this dense graph
    # (scores ~1e9 after 6 iterations), so ROUND(x, 6) would hash-flip on
    # float-summation-order noise. Both sides apply the GDS L2NORM scaler
    # (PageRankAlgorithm.java:77-97) to compare at a well-conditioned scale.
    from .operators.pagerank import article_rank

    g = _graph_pr(spark, sf_dir)
    out = article_rank(
        g,
        damping=PR_DAMPING,
        tolerance=0.0,
        max_iterations=AR_ITERS + 1,
        scaler="L2NORM",
    ).scores
    out = _to_original(out, g.vertices, "internal_id", "id")
    return out.select("id", F.round("score", 6).alias("score"))


def sql_article_rank() -> str:
    # r_{t+1} = 0.15 + 0.85 * avgDeg * sum_in(r_t / (deg + avgDeg));
    # final scores L2-normalized (mirrors scaler="L2NORM" on the Spark side)
    ctes = [
        f"edges AS MATERIALIZED ({SQL_EDGES_PR})",
        f"nodes AS MATERIALIZED ({SQL_NODES_SP})",
        "nv AS (SELECT COUNT(*) AS n FROM nodes)",
        "ne AS (SELECT COUNT(*) AS m FROM edges)",
        "avgdeg AS (SELECT CAST(m AS DOUBLE)/n AS a FROM ne, nv)",
        "deg AS (SELECT src AS id, CAST(COUNT(*) AS DOUBLE) + "
        "(SELECT a FROM avgdeg) AS deg FROM edges GROUP BY src)",
        "r0 AS (SELECT id, CAST(0.15 AS DOUBLE) AS rank FROM nodes)",
    ]
    for k in range(1, AR_ITERS + 1):
        ctes.append(
            f"r{k} AS (SELECT n.id, 0.15 + {PR_DAMPING} * "
            f"(SELECT a FROM avgdeg) * COALESCE(m.s, 0) AS rank "
            f"FROM nodes n LEFT JOIN ("
            f"SELECT e.dst AS id, SUM(r.rank / d.deg) AS s "
            f"FROM edges e JOIN r{k - 1} r ON r.id = e.src "
            f"JOIN deg d ON d.id = e.src GROUP BY e.dst) m ON m.id = n.id)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, ROUND(rank / (SELECT sqrt(SUM(rank*rank)) "
        + f"FROM r{AR_ITERS}), 6) AS score FROM r{AR_ITERS}"
    )


# -- Eigenvector ---------------------------------------------------------
EV_ITERS = 5


def q_eigenvector(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.pagerank import eigenvector

    g = _graph_pr(spark, sf_dir)
    out = eigenvector(
        g, tolerance=0.0, max_iterations=EV_ITERS + 1
    ).scores
    out = _to_original(out, g.vertices, "internal_id", "id")
    return out.select("id", F.round("score", 6).alias("score"))


def sql_eigenvector() -> str:
    # mirrors the delta-free power iteration on (A + I): superstep-0
    # messages carry the UNNORMALIZED init (1/n); rank is L2-normalized
    # after every update (masterCompute semantics)
    ctes = [
        f"edges AS MATERIALIZED ({SQL_EDGES_PR})",
        f"nodes AS MATERIALIZED ({SQL_NODES_SP})",
        "nv AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)",
        "raw0 AS (SELECT id, 1.0/(SELECT n FROM nv) AS r FROM nodes)",
        # normalized init (what rank holds entering update 1)
        "r0 AS (SELECT id, r / (SELECT sqrt(SUM(r*r)) FROM raw0) AS r "
        "FROM raw0)",
        # update 1 uses raw0 messages
        "u1 AS (SELECT n.id, r0.r + COALESCE(m.s, 0) AS u FROM nodes n "
        "JOIN r0 ON r0.id = n.id LEFT JOIN ("
        "SELECT e.dst AS id, SUM(r.r) AS s FROM edges e "
        "JOIN raw0 r ON r.id = e.src GROUP BY e.dst) m ON m.id = n.id)",
        "r1 AS (SELECT id, u / (SELECT sqrt(SUM(u*u)) FROM u1) AS r FROM u1)",
    ]
    for k in range(2, EV_ITERS + 1):
        ctes.append(
            f"u{k} AS (SELECT n.id, p.r + COALESCE(m.s, 0) AS u "
            f"FROM nodes n JOIN r{k - 1} p ON p.id = n.id LEFT JOIN ("
            f"SELECT e.dst AS id, SUM(r.r) AS s FROM edges e "
            f"JOIN r{k - 1} r ON r.id = e.src GROUP BY e.dst) m "
            f"ON m.id = n.id)"
        )
        ctes.append(
            f"r{k} AS (SELECT id, u / (SELECT sqrt(SUM(u*u)) FROM u{k}) "
            f"AS r FROM u{k})"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, ROUND(r, 6) AS score FROM r{EV_ITERS}"
    )


# -- Closeness / harmonic (MSBFS) ---------------------------------------
# BFS-depth cap for the DuckDB recursive oracles only (the Spark side is
# uncapped). Must exceed the oracle graph's eccentricity or the gate fails
# (or masks a bug) with the engine being right. The contract co-supplier
# graph is near-complete: measured diameter is 1 at sf0.01 and stays O(1)
# at every TPC-H sf (every popular part links its suppliers pairwise), so
# 24 is >20× headroom; the recursive CTE's work grows only linearly in it.
CLOSENESS_MAX_DIST = 24


def q_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.closeness import closeness_centrality

    g = _graph_ss(spark, sf_dir)
    out = closeness_centrality(g)
    out = _to_original(out, g.vertices, "internal_id", "id")
    return out.select("id", F.round("score", 6).alias("score"))


def sql_closeness() -> str:
    return f"""
WITH RECURSIVE
canon AS MATERIALIZED ({SQL_EDGES_SS}),
sym AS MATERIALIZED (SELECT a AS src, b AS dst FROM canon UNION ALL SELECT b, a FROM canon),
nodes AS (SELECT DISTINCT src AS id FROM sym),
nv AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
reach(s, v, dist) AS (
  SELECT id, id, 0 FROM nodes
  UNION
  SELECT r.s, e.dst, r.dist + 1 FROM reach r JOIN sym e ON e.src = r.v
  WHERE r.dist < {CLOSENESS_MAX_DIST}
),
best AS (SELECT s, v, MIN(dist) AS d FROM reach GROUP BY s, v),
farness AS (SELECT s AS id, SUM(d) AS far FROM best WHERE v != s GROUP BY s)
SELECT n.id,
  ROUND(CASE WHEN COALESCE(f.far, 0) > 0
        THEN ((SELECT n FROM nv) - 1) / f.far ELSE 0.0 END, 6) AS score
FROM nodes n LEFT JOIN farness f ON f.id = n.id
"""


def q_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.closeness import harmonic_centrality

    g = _graph_ss(spark, sf_dir)
    out = harmonic_centrality(g)
    out = _to_original(out, g.vertices, "internal_id", "id")
    return out.select("id", F.round("score", 6).alias("score"))


def sql_harmonic() -> str:
    return f"""
WITH RECURSIVE
canon AS MATERIALIZED ({SQL_EDGES_SS}),
sym AS MATERIALIZED (SELECT a AS src, b AS dst FROM canon UNION ALL SELECT b, a FROM canon),
nodes AS (SELECT DISTINCT src AS id FROM sym),
nv AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
reach(s, v, dist) AS (
  SELECT id, id, 0 FROM nodes
  UNION
  SELECT r.s, e.dst, r.dist + 1 FROM reach r JOIN sym e ON e.src = r.v
  WHERE r.dist < {CLOSENESS_MAX_DIST}
),
best AS (SELECT s, v, MIN(dist) AS d FROM reach GROUP BY s, v),
hsum AS (SELECT s AS id, SUM(1.0 / d) AS h FROM best WHERE v != s GROUP BY s)
SELECT n.id,
  ROUND(COALESCE(h.h, 0) / ((SELECT n FROM nv) - 1), 6) AS score
FROM nodes n LEFT JOIN hsum h ON h.id = n.id
"""


# -- SSSP ----------------------------------------------------------------
def q_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source hop distances from the smallest supplier id over the
    co-supplier graph (gds.beta.shortestPath.dijkstra cost surface)."""
    from .operators.traverse import sssp

    g = _graph_ss(spark, sf_dir)
    src = g.vertices.agg(F.min("internal_id")).collect()[0][0]
    out = sssp(g, int(src), weighted=False)
    out = _to_original(out, g.vertices, "internal_id", "id")
    return out.select("id", F.round("distance", 6).alias("distance"))


def sql_sssp() -> str:
    return f"""
WITH RECURSIVE
canon AS MATERIALIZED ({SQL_EDGES_SS}),
sym AS MATERIALIZED (SELECT a AS src, b AS dst FROM canon UNION ALL SELECT b, a FROM canon),
nodes AS (SELECT DISTINCT src AS id FROM sym),
s0 AS (SELECT MIN(id) AS src FROM nodes),
reach(v, dist) AS (
  SELECT src, 0 FROM s0
  UNION
  SELECT e.dst, r.dist + 1 FROM reach r JOIN sym e ON e.src = r.v
  WHERE r.dist < {CLOSENESS_MAX_DIST}
)
SELECT v AS id, ROUND(CAST(MIN(dist) AS DOUBLE), 6) AS distance
FROM reach GROUP BY v
"""


# -- WCC -----------------------------------------------------------------
def q_wcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _graph_sp(spark, sf_dir)
    comp = wcc(g)
    comp = _to_original(comp, g.vertices, "internal_id", "id")
    # component is a min internal id == min original id (order-isomorphic map)
    return _to_original(comp, g.vertices, "component", "component").select(
        "id", "component"
    )


def sql_wcc() -> str:
    return f"""
WITH RECURSIVE
edges AS ({SQL_EDGES_SP}),
nodes AS ({SQL_NODES_SP}),
sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
reach(id, lab) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT s.dst AS id, r.lab FROM reach r JOIN sym s ON s.src = r.id
)
SELECT id, MIN(lab) AS component FROM reach GROUP BY id
"""


def q_wcc_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same semantics as q_wcc, gated on the FUSED kernel (blob state,
    min-reduced packed messages over the symmetrized CSR) — the 100-TB
    path gets its own oracle row, like q_pagerank does."""
    from .operators.wcc import build_wcc_csr

    g = _graph_sp(spark, sf_dir)
    comp = wcc(g, csr=build_wcc_csr(g), chunk_size=4)
    comp = _to_original(comp, g.vertices, "internal_id", "id")
    return _to_original(comp, g.vertices, "component", "component").select(
        "id", "component"
    )


def q_component_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _graph_sp(spark, sf_dir)
    return wcc(g).agg(
        F.countDistinct("component").alias("component_count")
    )


def sql_component_count() -> str:
    return (
        "WITH base AS (" + sql_wcc() + ") "
        "SELECT COUNT(DISTINCT component) AS component_count FROM base"
    )


# -- Label propagation ---------------------------------------------------
LP_ITERS = 3


def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _graph_ss(spark, sf_dir)
    labels = label_propagation(g, max_iterations=LP_ITERS)
    labels = _to_original(labels, g.vertices, "internal_id", "id")
    return _to_original(labels, g.vertices, "label", "label").select(
        "id", "label"
    )


def q_label_propagation_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same semantics as q_label_propagation, gated on the FUSED kernel
    (blob state, (dst, label, weight) vote triples, ``labelvote``
    reducer over the reversed-edge CSR) — the 100-TB LP path gets its
    own oracle row, like q_wcc_fused / q_pagerank do."""
    from .operators.labelprop import build_lp_csr

    g = _graph_ss(spark, sf_dir)
    # csr blocks are swept by the owned-dir atexit backstop (the returned
    # DataFrame is lazy — the driver collects it after we return)
    labels = label_propagation(
        g, max_iterations=LP_ITERS, csr=build_lp_csr(g), chunk_size=2
    )
    labels = _to_original(labels, g.vertices, "internal_id", "id")
    return _to_original(labels, g.vertices, "label", "label").select(
        "id", "label"
    )


def sql_label_propagation() -> str:
    ctes = [
        f"canon AS MATERIALIZED ({SQL_EDGES_SS})",
        "sym AS MATERIALIZED (SELECT a AS src, b AS dst FROM canon "
        "UNION ALL SELECT b, a FROM canon)",
        "nodes AS (SELECT DISTINCT src AS id FROM sym)",
        "l0 AS (SELECT id, id AS label FROM nodes)",
    ]
    for k in range(1, LP_ITERS + 1):
        ctes.append(
            f"v{k} AS (SELECT e.src AS id, l.label, "
            f"CAST(COUNT(*) AS DOUBLE) AS vote "
            f"FROM sym e JOIN l{k - 1} l ON l.id = e.dst GROUP BY e.src, l.label)"
        )
        ctes.append(
            f"w{k} AS (SELECT id, label FROM ("
            f"SELECT id, label, ROW_NUMBER() OVER "
            f"(PARTITION BY id ORDER BY vote DESC, label ASC) AS rn "
            f"FROM v{k}) WHERE rn = 1)"
        )
        ctes.append(
            f"l{k} AS (SELECT n.id, COALESCE(w.label, p.label) AS label "
            f"FROM nodes n JOIN l{k - 1} p ON p.id = n.id "
            f"LEFT JOIN w{k} w ON w.id = n.id)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, label FROM l{LP_ITERS}"
    )


# -- Triangles / LCC -----------------------------------------------------
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _graph_ss(spark, sf_dir)
    per = triangle_count(g).per_node
    return _to_original(per, g.vertices, "internal_id", "id").select(
        "id", "triangles"
    )


SQL_TRI_BASE = f"""
canon AS ({SQL_EDGES_SS}),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM canon e1 JOIN canon e2 ON e2.a = e1.b
  JOIN canon e3 ON e3.a = e1.a AND e3.b = e2.b
),
corners AS (
  SELECT x AS id FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
),
nodes AS (SELECT a AS id FROM canon UNION SELECT b FROM canon),
tcounts AS (
  SELECT n.id, CAST(COALESCE(c.cnt, 0) AS BIGINT) AS triangles
  FROM nodes n LEFT JOIN (
    SELECT id, COUNT(*) AS cnt FROM corners GROUP BY id) c ON c.id = n.id
)
"""


def sql_triangle_count() -> str:
    return "WITH " + SQL_TRI_BASE + "SELECT id, triangles FROM tcounts"


def q_lcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _graph_ss(spark, sf_dir)
    out = local_clustering_coefficient(g)
    return _to_original(out, g.vertices, "internal_id", "id").select(
        "id", F.round("coefficient", 6).alias("coefficient")
    )


def sql_lcc() -> str:
    return (
        "WITH " + SQL_TRI_BASE + """,
deg AS (
  SELECT id, COUNT(*) AS deg FROM
  (SELECT a AS id FROM canon UNION ALL SELECT b FROM canon) GROUP BY id)
SELECT t.id,
  ROUND(CASE WHEN d.deg < 2 THEN 0.0
             ELSE 2.0 * t.triangles / (d.deg * (d.deg - 1)) END, 6)
  AS coefficient
FROM tcounts t JOIN deg d ON d.id = t.id
"""
    )


# -- Degree centrality ---------------------------------------------------
def q_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _graph_sp(spark, sf_dir)
    out = degree_centrality(g)
    return _to_original(out, g.vertices, "internal_id", "id").select(
        "id", "score"
    )


def sql_degree() -> str:
    return f"""
WITH edges AS ({SQL_EDGES_SP}), nodes AS ({SQL_NODES_SP})
SELECT n.id, CAST(COALESCE(d.c, 0) AS DOUBLE) AS score
FROM nodes n LEFT JOIN
  (SELECT src, COUNT(*) AS c FROM edges GROUP BY src) d ON d.src = n.id
"""


def q_degree_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _graph_sp(spark, sf_dir)
    out = degree_centrality(g, weighted=True)
    return _to_original(out, g.vertices, "internal_id", "id").select(
        "id", F.round("score", 6).alias("score")
    )


def sql_degree_weighted() -> str:
    return f"""
WITH edges AS ({SQL_EDGES_SP}), nodes AS ({SQL_NODES_SP})
SELECT n.id, ROUND(CAST(COALESCE(d.s, 0) AS DOUBLE), 6) AS score
FROM nodes n LEFT JOIN
  (SELECT src, SUM(CASE WHEN weight > 0 THEN weight ELSE 0 END) AS s
   FROM edges GROUP BY src) d ON d.src = n.id
"""


# -- Node similarity -----------------------------------------------------
NS_TOPK = 5


def q_node_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _graph_sp(spark, sf_dir)
    sims = node_similarity(g, top_k=NS_TOPK)
    sims = _to_original(sims, g.vertices, "node1", "node1")
    sims = _to_original(sims, g.vertices, "node2", "node2")
    return sims.select(
        "node1", "node2", F.round("similarity", 6).alias("similarity")
    )


def sql_node_similarity() -> str:
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
  UNION ALL SELECT node2, node1, similarity FROM sims)
SELECT node1, node2, ROUND(similarity, 6) AS similarity FROM (
  SELECT *, ROW_NUMBER() OVER
    (PARTITION BY node1 ORDER BY similarity DESC, node2 ASC) AS rn
  FROM bidir) WHERE rn <= {NS_TOPK}
"""


# -- CollapsePath (multi-hop shortcut edges) -----------------------------
def q_collapse_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer -> order -> supplier shortcut edges with path count
    (gds.alpha.collapsePath.mutate semantics: one shortcut relationship per
    traversed path; ref alpha/.../walking/CollapsePath.java:43)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = _lineitem(spark, sf_dir)
    return (
        orders.select(
            F.col("o_custkey").alias("src"), F.col("o_orderkey").alias("ok")
        )
        .join(li.select(F.col("l_orderkey").alias("ok"),
                        F.col("l_suppkey").alias("dst")), "ok")
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("paths"))
    )


def sql_collapse_path() -> str:
    return """
SELECT o.o_custkey AS src, l.l_suppkey AS dst, COUNT(*) AS paths
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2
"""


# -- Link prediction functions ------------------------------------------
def q_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gds.alpha.linkprediction.commonNeighbors over the co-supplier graph
    (undirected neighborhoods), for all pairs sharing >= 1 neighbor."""
    e = edges_ss(spark, sf_dir)
    sym = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    n1 = sym.select(F.col("u").alias("node1"), F.col("v").alias("nbr"))
    n2 = sym.select(F.col("u").alias("node2"), F.col("v").alias("nbr"))
    return (
        n1.join(n2, "nbr")
        .filter(F.col("node1") < F.col("node2"))
        .groupBy("node1", "node2")
        .agg(F.count(F.lit(1)).cast("long").alias("common_neighbors"))
    )


def sql_common_neighbors() -> str:
    return f"""
WITH canon AS ({SQL_EDGES_SS}),
sym AS (SELECT a AS u, b AS v FROM canon UNION ALL SELECT b, a FROM canon)
SELECT n1.u AS node1, n2.u AS node2, COUNT(*) AS common_neighbors
FROM sym n1 JOIN sym n2 ON n1.v = n2.v AND n1.u < n2.u
GROUP BY 1, 2
"""


def q_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sum over common neighbors z of 1/ln(degree(z))
    (ref: alpha/.../linkprediction/AdamicAdarFunc)."""
    e = edges_ss(spark, sf_dir)
    sym = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    deg = sym.groupBy(F.col("u").alias("z")).agg(
        F.count(F.lit(1)).alias("dz")
    )
    n1 = sym.select(F.col("u").alias("node1"), F.col("v").alias("z"))
    n2 = sym.select(F.col("u").alias("node2"), F.col("v").alias("z"))
    return (
        n1.join(n2, "z")
        .filter(F.col("node1") < F.col("node2"))
        .join(deg, "z")
        .filter(F.col("dz") > 1)
        .groupBy("node1", "node2")
        .agg(F.round(F.sum(1.0 / F.log("dz")), 6).alias("adamic_adar"))
    )


def sql_adamic_adar() -> str:
    return f"""
WITH canon AS ({SQL_EDGES_SS}),
sym AS (SELECT a AS u, b AS v FROM canon UNION ALL SELECT b, a FROM canon),
deg AS (SELECT u AS z, COUNT(*) AS dz FROM sym GROUP BY u)
SELECT n1.u AS node1, n2.u AS node2,
       ROUND(SUM(1.0 / LN(d.dz)), 6) AS adamic_adar
FROM sym n1 JOIN sym n2 ON n1.v = n2.v AND n1.u < n2.u
JOIN deg d ON d.z = n1.v
WHERE d.dz > 1
GROUP BY 1, 2
"""


# -- data-pipeline operators over documents/embeddings -------------------
def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline.text import token_count

    return token_count(_documents(spark, sf_dir)).select(
        "doc_id", F.col("n_tokens").cast("long").alias("n_tokens")
    )


def sql_token_count() -> str:
    return (
        "SELECT doc_id, len(regexp_split_to_array(trim(text), '\\s+')) "
        "AS n_tokens FROM documents"
    )


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline.text import quality_score

    return quality_score(_documents(spark, sf_dir))


def sql_quality_score() -> str:
    return """
WITH toks AS (SELECT doc_id,
              regexp_split_to_array(trim(text), '\\s+') AS t FROM documents)
SELECT doc_id, ROUND(CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 6)
       AS score FROM toks
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline.text import doc_fingerprint

    return doc_fingerprint(_documents(spark, sf_dir))


def sql_doc_fingerprint() -> str:
    return (
        "SELECT doc_id, md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))"
        " AS fingerprint FROM documents"
    )


DUP_SPAN_WINDOW = 8


def q_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplicate windows (Lee et al. 2021 formulation);
    the portable md5-60bit span hash lets DuckDB recompute every window
    hash and duplicate count bit-identically."""
    from .pipeline.text import duplicated_spans

    return duplicated_spans(
        _documents(spark, sf_dir), DUP_SPAN_WINDOW
    )


def sql_duplicated_spans() -> str:
    w = DUP_SPAN_WINDOW
    return f"""
WITH toks AS (SELECT doc_id,
              regexp_split_to_array(trim(text), '\\s+') AS t FROM documents),
spans AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
          ('0x' || substr(md5(array_to_string(t[i:i+{w - 1}], ' ')),
           1, 15))::BIGINT AS span_hash
          FROM toks, UNNEST(range(1, len(t) - {w - 2})) AS u(i)
          WHERE len(t) >= {w}),
dup AS (SELECT span_hash, COUNT(DISTINCT doc_id) AS n_docs
        FROM spans GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2)
SELECT s.doc_id, s.pos, s.span_hash, d.n_docs
FROM spans s JOIN dup d USING (span_hash)
"""


def q_dup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline.text import duplicated_span_stats

    return duplicated_span_stats(
        _documents(spark, sf_dir), DUP_SPAN_WINDOW
    )


def sql_dup_span_stats() -> str:
    w = DUP_SPAN_WINDOW
    return f"""
WITH toks AS (SELECT doc_id,
              regexp_split_to_array(trim(text), '\\s+') AS t FROM documents),
spans AS (SELECT doc_id, i AS pos,
          ('0x' || substr(md5(array_to_string(t[i:i+{w - 1}], ' ')),
           1, 15))::BIGINT AS span_hash
          FROM toks, UNNEST(range(1, len(t) - {w - 2})) AS u(i)
          WHERE len(t) >= {w}),
dup AS (SELECT span_hash, COUNT(DISTINCT doc_id) AS n_docs
        FROM spans GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2),
per_doc AS (SELECT s.doc_id, COUNT(*) AS n_dup_spans
            FROM spans s JOIN dup d USING (span_hash) GROUP BY 1)
SELECT t.doc_id,
       CAST(GREATEST(len(t.t) - {w - 1}, 0) AS BIGINT) AS n_spans,
       COALESCE(p.n_dup_spans, 0) AS n_dup_spans,
       ROUND(COALESCE(p.n_dup_spans, 0)::DOUBLE
             / GREATEST(GREATEST(len(t.t) - {w - 1}, 0), 1), 6) AS dup_frac
FROM toks t LEFT JOIN per_doc p USING (doc_id)
"""


def q_trim_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring span REMOVAL (keep the corpus-canonical first
    occurrence, cut every other occurrence's token range, keep the doc)."""
    from .pipeline.text import trim_duplicated_spans

    return trim_duplicated_spans(
        _documents(spark, sf_dir), DUP_SPAN_WINDOW
    )


def sql_trim_dup_spans() -> str:
    w = DUP_SPAN_WINDOW
    return f"""
WITH toks AS (SELECT doc_id,
              regexp_split_to_array(trim(text), '\\s+') AS t FROM documents),
spans AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
          ('0x' || substr(md5(array_to_string(t[i:i+{w - 1}], ' ')),
           1, 15))::BIGINT AS span_hash
          FROM toks, UNNEST(range(1, len(t) - {w - 2})) AS u(i)
          WHERE len(t) >= {w}),
dup AS (SELECT span_hash FROM spans GROUP BY 1
        HAVING COUNT(DISTINCT doc_id) >= 2),
ds AS (SELECT s.doc_id, s.pos,
       ROW_NUMBER() OVER (PARTITION BY s.span_hash
                          ORDER BY s.doc_id, s.pos) AS rn
       FROM spans s JOIN dup USING (span_hash)),
cut AS (SELECT DISTINCT doc_id, pos + k.k AS tok_i
        FROM ds, UNNEST(range(0, {w})) AS k(k) WHERE rn > 1),
tok_rows AS (SELECT doc_id, t[i] AS tok, CAST(i - 1 AS BIGINT) AS tok_i
             FROM toks, UNNEST(range(1, len(t) + 1)) AS u(i)),
kept AS (SELECT tr.doc_id, tr.tok, tr.tok_i FROM tok_rows tr
         WHERE NOT EXISTS (SELECT 1 FROM cut c
                           WHERE c.doc_id = tr.doc_id
                             AND c.tok_i = tr.tok_i)),
rebuilt AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY tok_i) AS text
            FROM kept GROUP BY doc_id)
SELECT t.doc_id, COALESCE(r.text, '') AS text
FROM toks t LEFT JOIN rebuilt r USING (doc_id)
"""


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline.text import exact_dedup

    return exact_dedup(_documents(spark, sf_dir))


def sql_exact_dedup() -> str:
    return """
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS copies FROM documents
GROUP BY md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
"""


REP_TOP_N = 2
REP_DUP_N = 5


def q_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline.text import repetition_scores

    return repetition_scores(
        _documents(spark, sf_dir), top_n=REP_TOP_N, dup_n=REP_DUP_N
    )


def sql_repetition_scores() -> str:
    def gram_cte(n: int, name: str):
        return f"""
{name}0 AS (SELECT doc_id, array_to_string(t[i:i+{n - 1}], ' ') AS gram
       FROM base, UNNEST(range(1, len(t) - {n - 2})) AS u(i)
       WHERE len(t) >= {n}),
{name}g AS (SELECT doc_id, gram, COUNT(*) AS c FROM {name}0 GROUP BY 1, 2),
{name}s AS (SELECT doc_id,
        MAX(c * (length(gram) - {n - 1})) AS top_chars,
        SUM(CASE WHEN c >= 2 THEN c * (length(gram) - {n - 1})
            ELSE 0 END) AS dup_chars
        FROM {name}g GROUP BY doc_id)"""

    return f"""
WITH base AS (SELECT doc_id,
        string_split(text, chr(10)) AS lines,
        regexp_split_to_array(trim(text), '\\s+') AS t,
        length(array_to_string(regexp_split_to_array(trim(text), '\\s+'),
               ''))::DOUBLE AS tchars
      FROM documents),
ln0 AS (SELECT doc_id, u.line FROM base, UNNEST(lines) AS u(line)),
lng AS (SELECT doc_id, line, COUNT(*) AS c FROM ln0 GROUP BY 1, 2),
lns AS (SELECT doc_id, SUM(c) AS n_lines, COUNT(*) AS n_distinct,
        SUM(c * length(line)) AS line_chars,
        SUM(CASE WHEN c >= 2 THEN c * length(line) ELSE 0 END)
        AS dup_line_chars
        FROM lng GROUP BY doc_id),{gram_cte(REP_TOP_N, "t")},{gram_cte(REP_DUP_N, "d")}
SELECT b.doc_id,
  ROUND(1.0 - lns.n_distinct / lns.n_lines, 6) AS dup_line_frac,
  ROUND(CASE WHEN lns.line_chars > 0
        THEN lns.dup_line_chars / lns.line_chars ELSE 0.0 END, 6)
        AS dup_line_char_frac,
  ROUND(LEAST(1.0, CASE WHEN b.tchars > 0
        THEN COALESCE(ts.top_chars, 0) / b.tchars ELSE 0.0 END), 6)
        AS top_ngram_char_frac,
  ROUND(LEAST(1.0, CASE WHEN b.tchars > 0
        THEN COALESCE(ds.dup_chars, 0) / b.tchars ELSE 0.0 END), 6)
        AS dup_ngram_char_frac
FROM base b JOIN lns ON lns.doc_id = b.doc_id
            LEFT JOIN ts ON ts.doc_id = b.doc_id
            LEFT JOIN ds ON ds.doc_id = b.doc_id
"""


NGRAM_N = 2
NGRAM_THRESHOLD = 0.3


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline.text import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _documents(spark, sf_dir), n=NGRAM_N, threshold=NGRAM_THRESHOLD
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-corpus dedup composition: near-dup pairs (n-gram Jaccard here;
    same shape as the LSH outputs) -> connected components via the WCC
    engine -> canonical doc per cluster."""
    from .pipeline.text import dedup_clusters, ngram_jaccard_pairs

    docs = _documents(spark, sf_dir)
    pairs = ngram_jaccard_pairs(docs, n=NGRAM_N, threshold=NGRAM_THRESHOLD)
    return dedup_clusters(pairs, docs)


def sql_dedup_clusters() -> str:
    return f"""
WITH RECURSIVE
base AS ({sql_ngram_jaccard().strip()}),
sym AS (SELECT doc1 AS a, doc2 AS b FROM base
        UNION SELECT doc2, doc1 FROM base),
reach(id, lab) AS (
  SELECT DISTINCT a, a FROM sym
  UNION
  SELECT s.b, r.lab FROM reach r JOIN sym s ON s.a = r.id
),
comp AS (SELECT id, MIN(lab) AS cluster_id FROM reach GROUP BY id)
SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
       d.doc_id = COALESCE(c.cluster_id, d.doc_id) AS keep
FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
"""


def sql_ngram_jaccard() -> str:
    return f"""
WITH toks AS (SELECT doc_id,
              regexp_split_to_array(trim(text), '\\s+') AS t FROM documents),
sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+{NGRAM_N - 1}], ' ')
       AS shingle FROM toks,
       UNNEST(range(1, len(t) - {NGRAM_N - 2})) AS u(i)),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.shingle = b.shingle
          AND a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT doc1, doc2,
       ROUND(CAST(c AS DOUBLE) / (s1.sz + s2.sz - c), 6) AS jaccard
FROM inter JOIN sizes s1 ON s1.doc_id = doc1
           JOIN sizes s2 ON s2.doc_id = doc2
WHERE CAST(c AS DOUBLE) / (s1.sz + s2.sz - c) >= {NGRAM_THRESHOLD}
"""


CONTAIN_THRESHOLD = 0.5


def q_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric (Broder containment) near-dup pairs: doc1 mostly inside
    doc2 — the excerpt/quote case Jaccard misses when sizes differ."""
    from .pipeline.text import ngram_containment_pairs

    return ngram_containment_pairs(
        _documents(spark, sf_dir), n=NGRAM_N, threshold=CONTAIN_THRESHOLD
    )


def sql_ngram_containment() -> str:
    return f"""
WITH toks AS (SELECT doc_id,
              regexp_split_to_array(trim(text), '\\s+') AS t FROM documents),
sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+{NGRAM_N - 1}], ' ')
       AS shingle FROM toks,
       UNNEST(range(1, len(t) - {NGRAM_N - 2})) AS u(i)),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.shingle = b.shingle
          AND a.doc_id != b.doc_id GROUP BY 1, 2)
SELECT doc1, doc2, ROUND(CAST(c AS DOUBLE) / s1.sz, 6) AS containment
FROM inter JOIN sizes s1 ON s1.doc_id = doc1
WHERE CAST(c AS DOUBLE) / s1.sz >= {CONTAIN_THRESHOLD}
"""


def q_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-2-style pre-tokenizer count — the regex uses only constructs
    with identical semantics in Java regex (Spark) and RE2 (DuckDB):
    leftmost-first alternation, EXPLICIT ASCII classes (no \\w/\\d/\\s
    shorthands — Java's \\s includes \\x0B, RE2's does not), no
    lookahead."""
    from .pipeline.text import token_count_bpe

    return token_count_bpe(_documents(spark, sf_dir))


def sql_token_count_bpe() -> str:
    from .pipeline.text import BPE_SPLIT_RE

    pat = BPE_SPLIT_RE.replace("'", "''")
    return (
        f"SELECT doc_id, CAST(len(regexp_extract_all(text, '{pat}')) "
        "AS BIGINT) AS n_tokens FROM documents"
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline.text import lang_id

    return lang_id(_documents(spark, sf_dir))


def sql_lang_id() -> str:
    from .pipeline.text import _LANG_MARKERS

    parts = []
    for lang, markers in sorted(_LANG_MARKERS.items()):
        inlist = ", ".join(f"'{m}'" for m in markers)
        parts.append(
            f"SELECT doc_id, '{lang}' AS lang, "
            f"len(list_filter(t, x -> x IN ({inlist}))) AS hits FROM toks"
        )
    scores = " UNION ALL ".join(parts)
    return f"""
WITH toks AS (SELECT doc_id,
              regexp_split_to_array(trim(text), '\\s+') AS t FROM documents),
scores AS ({scores}),
mx AS (SELECT doc_id, MAX(hits) AS mx FROM scores GROUP BY doc_id),
pred AS (SELECT s.doc_id, MIN(s.lang) AS pred_lang FROM scores s
         JOIN mx ON mx.doc_id = s.doc_id AND s.hits = mx.mx
         WHERE mx.mx > 0 GROUP BY s.doc_id)
SELECT d.doc_id, COALESCE(p.pred_lang, 'und') AS pred_lang
FROM documents d LEFT JOIN pred p ON p.doc_id = d.doc_id
"""


ANN_TOPK = 3


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline.ann import cosine_topk_bruteforce

    out = cosine_topk_bruteforce(_embeddings(spark, sf_dir), k=ANN_TOPK)
    return out.select(
        "vec_id", "neighbor_id", F.round("cosine", 4).alias("cosine")
    )


def sql_embedding_topk() -> str:
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
scored AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         list_dot_product(a.v, b.v) /
         (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
         AS cosine
  FROM e a JOIN e b ON a.vec_id != b.vec_id)
SELECT vec_id, neighbor_id, ROUND(cosine, 4) AS cosine FROM (
  SELECT *, ROW_NUMBER() OVER
    (PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id ASC) AS rn
  FROM scored) WHERE rn <= {ANN_TOPK}
"""


MINHASH_PERM = 32
MINHASH_BANDS = 8
MINHASH_EST = 0.3


def q_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate near-dup pairs from banded MinHash LSH refined by
    signature agreement. The portable md5-based base hash makes the whole
    pipeline (signatures, band buckets, estimator) recomputable in DuckDB
    — an exact value oracle, not a rows-only check."""
    from .pipeline.text import minhash_dedup

    return minhash_dedup(
        _documents(spark, sf_dir),
        num_perm=MINHASH_PERM,
        bands=MINHASH_BANDS,
        n=NGRAM_N,
        min_jaccard_est=MINHASH_EST,
    )


def sql_minhash_dedup() -> str:
    from .pipeline.text import MERSENNE, minhash_coefficients

    coeffs = minhash_coefficients(MINHASH_PERM)
    rpb = MINHASH_PERM // MINHASH_BANDS
    perm_mins = ", ".join(
        f"MIN((h * {a} + {b}) % {MERSENNE}) AS m{i}"
        for i, (a, b) in enumerate(coeffs)
    )
    sig_list = "[" + ", ".join(f"m{i}" for i in range(MINHASH_PERM)) + "]"
    band_keys = ", ".join(
        f"('0x' || substr(md5(array_to_string("
        f"sig[{b * rpb + 1}:{(b + 1) * rpb}], '|')), 1, 15))::BIGINT AS k{b}"
        for b in range(MINHASH_BANDS)
    )
    band_case = " ".join(
        f"WHEN {b} THEN k{b}" for b in range(MINHASH_BANDS)
    )
    return f"""
WITH toks AS (SELECT doc_id,
              regexp_split_to_array(trim(text), '\\s+') AS t FROM documents),
sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+{NGRAM_N - 1}], ' ')
       AS shingle FROM toks,
       UNNEST(range(1, len(t) - {NGRAM_N - 2})) AS u(i)),
hs AS (SELECT doc_id,
       ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {MERSENNE} AS h
       FROM sh),
sigs AS (SELECT doc_id, {perm_mins} FROM hs GROUP BY doc_id),
sigl AS (SELECT doc_id, {sig_list} AS sig FROM sigs),
banded AS (SELECT doc_id, {band_keys} FROM sigl),
bl AS (SELECT doc_id, u.band, CASE u.band {band_case} END AS bucket
       FROM banded, UNNEST(range(0, {MINHASH_BANDS})) AS u(band)),
cands AS (SELECT a.doc_id AS doc1, b.doc_id AS doc2
          FROM bl a JOIN bl b ON a.band = b.band AND a.bucket = b.bucket
          AND a.doc_id < b.doc_id GROUP BY 1, 2),
est AS (SELECT doc1, doc2,
        len(list_filter(range(1, {MINHASH_PERM + 1}),
            i -> s1.sig[i] = s2.sig[i])) / {MINHASH_PERM}.0 AS jaccard_est
        FROM cands JOIN sigl s1 ON s1.doc_id = doc1
                   JOIN sigl s2 ON s2.doc_id = doc2)
SELECT doc1, doc2, jaccard_est FROM est WHERE jaccard_est >= {MINHASH_EST}
"""


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash signatures over the portable md5-based 60-bit token hash —
    bit-identical recomputation in DuckDB is the oracle."""
    from .pipeline.text import simhash

    return simhash(_documents(spark, sf_dir))


def sql_simhash() -> str:
    from .pipeline.text import simhash_bits

    nbits = simhash_bits("md5")
    bit_sums = ", ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(nbits)
    )
    sim_expr = " + ".join(
        f"CASE WHEN b{i} > 0 THEN {1 << i}::BIGINT ELSE 0 END"
        for i in range(nbits)
    )
    return f"""
WITH toks AS (SELECT doc_id,
              regexp_split_to_array(trim(text), '\\s+') AS t FROM documents),
tok AS (SELECT doc_id, u.tok FROM toks, UNNEST(t) AS u(tok)),
hs AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
       FROM tok),
votes AS (SELECT doc_id, {bit_sums} FROM hs GROUP BY doc_id)
SELECT doc_id, {sim_expr} AS simhash FROM votes
"""


ANN_DIM = 64  # testdata embeddings dim (all SFs); oracle planes match it
ANN_LSH_BITS = 8
ANN_LSH_TABLES = 4
ANN_LSH_SEED = 5


def q_embedding_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate ANN via random-hyperplane LSH. The hyperplanes are
    seeded and deterministic, so the DuckDB oracle inlines the exact same
    plane literals and recomputes buckets → candidates → cosines — an
    exact value oracle for the approximate operator (recall<1 vs the
    brute-force `embedding_topk` is by design; identity vs the oracle is
    the check)."""
    from .pipeline.ann import cosine_topk_lsh

    emb = _embeddings(spark, sf_dir)
    dim = len(emb.select("embedding").first()[0])
    assert dim == ANN_DIM, (
        f"embeddings dim {dim} != oracle plane dim {ANN_DIM}; "
        "regenerate sql_embedding_topk_lsh with the data's dim"
    )
    out = cosine_topk_lsh(
        emb, k=ANN_TOPK, bits=ANN_LSH_BITS, tables=ANN_LSH_TABLES,
        seed=ANN_LSH_SEED,
    )
    return out.select(
        "vec_id", "neighbor_id", F.round("cosine", 4).alias("cosine")
    )


def sql_embedding_topk_lsh() -> str:
    from .pipeline.ann import _hyperplanes

    rows = []
    for t in range(ANN_LSH_TABLES):
        planes = _hyperplanes(ANN_DIM, ANN_LSH_BITS, t, ANN_LSH_SEED)
        for i in range(ANN_LSH_BITS):
            # repr() round-trips doubles exactly; DuckDB parses decimal
            # literals to nearest double = the identical bit pattern the
            # Spark side embeds via F.lit
            lst = "[" + ", ".join(repr(float(x)) for x in planes[i]) + "]"
            rows.append(f"({t}, {1 << i}, {lst}::DOUBLE[])")
    values = ",\n".join(rows)
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
planes(t, bit, p) AS (VALUES {values}),
sigs AS (SELECT e.vec_id, pl.t,
         SUM(CASE WHEN list_dot_product(e.v, pl.p) > 0
                  THEN pl.bit ELSE 0 END)::BIGINT AS bucket
         FROM e, planes pl GROUP BY e.vec_id, pl.t),
cand AS (SELECT DISTINCT a.vec_id, b.vec_id AS neighbor_id
         FROM sigs a JOIN sigs b
         ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id != b.vec_id),
scored AS (SELECT c.vec_id, c.neighbor_id,
           list_dot_product(ea.v, eb.v) /
           (sqrt(list_dot_product(ea.v, ea.v)) *
            sqrt(list_dot_product(eb.v, eb.v))) AS cosine
           FROM cand c JOIN e ea ON ea.vec_id = c.vec_id
                       JOIN e eb ON eb.vec_id = c.neighbor_id)
SELECT vec_id, neighbor_id, ROUND(cosine, 4) AS cosine FROM (
  SELECT *, ROW_NUMBER() OVER
    (PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id ASC) AS rn
  FROM scored) WHERE rn <= {ANN_TOPK}
"""


# -- registry ------------------------------------------------------------
def _ext_queries():
    from .driver_contract_ext import ext_queries
    from .driver_contract_ext2 import ext2_queries

    return {**ext_queries(), **ext2_queries()}


def _ext_oracle_sql():
    from .driver_contract_ext import ext_oracle_sql
    from .driver_contract_ext2 import ext2_oracle_sql

    return {**ext_oracle_sql(), **ext2_oracle_sql()}


# The driver's correctness gate hard-checks the FIRST 50 registry
# entries (the rest ride on the identical-methodology local harness,
# tools/check_contract.py). Order the prefix so every SURVEY §2.3/§2.4
# algorithm family lands a representative row inside the checked window,
# plus one row per LLM-pipeline family; remaining entries follow in
# their natural grouping and are equally oracled.
_CHECK_PREFIX = (
    # §2.3 production algorithms
    "pagerank", "article_rank", "eigenvector", "wcc", "wcc_fused",
    "label_propagation", "label_propagation_fused", "triangle_count",
    "local_clustering_coefficient", "louvain_validity",
    "modularity_metric", "betweenness", "node_similarity", "knn_validity",
    "degree_centrality", "sssp", "dijkstra_path", "yens_k_shortest",
    "k1coloring_validity", "fastrp", "node2vec", "graphsage",
    # §2.4 alpha tier
    "scc", "closeness", "bfs", "all_shortest_paths",
    "spanning_tree", "balanced_triads", "random_walk",
    "collapse_path", "similarity_functions", "embedding_topk",
    "celf_validity", "hits", "scale_properties", "split_relationships",
    "node_classification", "link_prediction",
    # beyond-ref graph families (round-3 additions included)
    "kcore", "leiden_validity", "conductance", "bridges",
    "kmeans_validity", "filtered_node_similarity",
    # LLM-pipeline + multimodal families
    "token_count", "exact_dedup", "minhash_dedup", "lang_id",
    "duplicated_spans", "multimodal_video",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    all_q = _base_queries()
    all_q.update(_ext_queries())
    ordered = {k: all_q.pop(k) for k in _CHECK_PREFIX if k in all_q}
    ordered.update(all_q)
    return ordered


def _base_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pagerank": q_pagerank,
        "article_rank": q_article_rank,
        "eigenvector": q_eigenvector,
        "closeness": q_closeness,
        "harmonic": q_harmonic,
        "sssp": q_sssp,
        "wcc": q_wcc,
        "wcc_fused": q_wcc_fused,
        "component_count": q_component_count,
        "label_propagation": q_label_propagation,
        "label_propagation_fused": q_label_propagation_fused,
        "triangle_count": q_triangle_count,
        "local_clustering_coefficient": q_lcc,
        "degree_centrality": q_degree,
        "degree_centrality_weighted": q_degree_weighted,
        "node_similarity": q_node_similarity,
        "collapse_path": q_collapse_path,
        "common_neighbors": q_common_neighbors,
        "adamic_adar": q_adamic_adar,
        "token_count": q_token_count,
        "quality_score": q_quality_score,
        "repetition_scores": q_repetition_scores,
        "doc_fingerprint": q_doc_fingerprint,
        "exact_dedup": q_exact_dedup,
        "duplicated_spans": q_duplicated_spans,
        "dup_span_stats": q_dup_span_stats,
        "trim_dup_spans": q_trim_dup_spans,
        "ngram_jaccard_dedup": q_ngram_jaccard,
        "ngram_containment": q_ngram_containment,
        "token_count_bpe": q_token_count_bpe,
        "dedup_clusters": q_dedup_clusters,
        "lang_id": q_lang_id,
        "embedding_topk": q_embedding_topk,
        "minhash_dedup": q_minhash_dedup,
        "simhash": q_simhash,
        "embedding_topk_lsh": q_embedding_topk_lsh,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pagerank": sql_pagerank(),
        "article_rank": sql_article_rank(),
        "eigenvector": sql_eigenvector(),
        "closeness": sql_closeness(),
        "harmonic": sql_harmonic(),
        "sssp": sql_sssp(),
        "wcc": sql_wcc(),
        "wcc_fused": sql_wcc(),
        "component_count": sql_component_count(),
        "label_propagation": sql_label_propagation(),
        "label_propagation_fused": sql_label_propagation(),
        "triangle_count": sql_triangle_count(),
        "local_clustering_coefficient": sql_lcc(),
        "degree_centrality": sql_degree(),
        "degree_centrality_weighted": sql_degree_weighted(),
        "node_similarity": sql_node_similarity(),
        "collapse_path": sql_collapse_path(),
        "common_neighbors": sql_common_neighbors(),
        "adamic_adar": sql_adamic_adar(),
        "token_count": sql_token_count(),
        "quality_score": sql_quality_score(),
        "repetition_scores": sql_repetition_scores(),
        "doc_fingerprint": sql_doc_fingerprint(),
        "exact_dedup": sql_exact_dedup(),
        "duplicated_spans": sql_duplicated_spans(),
        "dup_span_stats": sql_dup_span_stats(),
        "trim_dup_spans": sql_trim_dup_spans(),
        "ngram_jaccard_dedup": sql_ngram_jaccard(),
        "ngram_containment": sql_ngram_containment(),
        "token_count_bpe": sql_token_count_bpe(),
        "dedup_clusters": sql_dedup_clusters(),
        "lang_id": sql_lang_id(),
        "embedding_topk": sql_embedding_topk(),
        "minhash_dedup": sql_minhash_dedup(),
        "simhash": sql_simhash(),
        "embedding_topk_lsh": sql_embedding_topk_lsh(),
        **_ext_oracle_sql(),
    }
