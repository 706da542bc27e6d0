"""Physical-plan quality guards (regression companion to tools/plan_audit.py).

Two invariants the 100-TB design depends on, checked on cheap
representative contract queries so the suite stays fast:

- **No row-at-a-time Python UDFs** anywhere in a headline plan: Python may
  enter only through Arrow (`MapInPandas` / `FlatMapGroupsInPandas`),
  never `BatchEvalPython` (per-row pickling, ~10-100x slower).
- **Column pruning reaches the scan**: every parquet scan carries a
  non-empty `ReadSchema` strictly narrower than the widest table, and
  derived edge tables referenced from multiple join branches are
  materialized (bounded scan count) instead of re-scanning the source
  per branch — the defect the audit caught in node_similarity (40 scans).
"""

import re

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def contract_queries():
    from graph_data_science_spark import driver_contract as dc

    return dc.queries()


@pytest.mark.parametrize(
    "name",
    ["token_count", "exact_dedup", "degree_centrality", "common_neighbors",
     "node_similarity", "embedding_topk", "dsir_weights", "mixture_sample",
     "embedding_topk_quantized", "pii_scan_luhn", "remove_boilerplate",
     "kcore", "hopping_event_counts"],
)
def test_no_row_python_udf(spark, contract_queries, name):
    plan = _plan(contract_queries[name](spark, SF_DIR))
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"


@pytest.mark.parametrize("name", ["token_count", "degree_centrality"])
def test_scans_are_pruned(spark, contract_queries, name):
    plan = _plan(contract_queries[name](spark, SF_DIR))
    # one ReadSchema detail line per scan node
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, f"{name}: no parquet scan found"
    assert all(s.strip() for s in schemas), f"{name}: scan with empty ReadSchema"
    # lineitem is 16 columns; a pruned scan reads far fewer
    assert all(s.count(",") < 8 for s in schemas), f"{name}: unpruned wide scan"


def test_shared_edge_subtrees_materialized(spark, contract_queries):
    # similarity queries self-join a derived edge table; after the lazy
    # localCheckpoint the final plan must not re-derive it per branch
    for name, max_scans in [("node_similarity", 2), ("common_neighbors", 2)]:
        plan = _plan(contract_queries[name](spark, SF_DIR))
        scans = len(re.findall(r"ReadSchema: struct<", plan))
        assert scans <= max_scans, (
            f"{name}: {scans} parquet scans — shared subtree re-derived"
        )


def test_pii_ops_are_pure_projections(spark, contract_queries):
    # PII scan/redact must stay zero-shuffle codegen projections — any
    # Exchange here means a 100-TB linear scan suddenly shuffles
    for name in ["pii_scan", "pii_redact"]:
        plan = _plan(contract_queries[name](spark, SF_DIR))
        assert "BatchEvalPython" not in plan, f"{name}: Python UDF"
        assert "Exchange" not in plan, f"{name}: unexpected shuffle"


def test_decontaminate_broadcasts_benchmark_side(spark, contract_queries):
    # the DISTINCT benchmark-hash side has no Catalyst size estimate; the
    # explicit hint must make the semi-join a broadcast, never a shuffle
    # of the full corpus span table against the tiny eval set
    plan = _plan(contract_queries["decontaminate"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan, "benchmark semi-join not broadcast"


def test_hits_one_job_per_iteration(spark):
    """HITS must run ONE Spark job per iteration (norms + convergence
    delta ride the iteration's checkpoint as Observation metrics) —
    round 3 shipped 3 collect() actions per iteration, each re-executing
    the join lineage. Counted with AQE off so jobs == actions (AQE
    splits one action into a job per materialized query stage)."""
    from graph_data_science_spark.graph import from_edge_df
    from graph_data_science_spark.operators.hits import hits

    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        edges = [(i, (i * 7 + 1) % 50) for i in range(200)]
        g = from_edge_df(spark.createDataFrame(edges, "src long, dst long"))
        g.edges = g.edges.localCheckpoint(eager=True)
        sc = spark.sparkContext
        sc.setJobGroup("hits-jobcount", "plan quality guard")
        try:
            iters = 8
            hits(g, max_iterations=iters, tolerance=0.0)
            n_jobs = len(
                sc.statusTracker().getJobIdsForGroup("hits-jobcount")
            )
        finally:
            sc.setJobGroup(None, None)
        # 1 init checkpoint + 1/iteration + 1 final delta scan + slack
        # for the every-6 stats-resetting rebuild
        assert n_jobs <= iters + 5, (
            f"{n_jobs} jobs for {iters} HITS iterations - an extra "
            "driver action re-entered the per-iteration loop"
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
