"""Physical-plan audit for the headline contract queries.

Greps ``df.explain("formatted")`` output for the properties the 100-TB
design depends on and writes a markdown report (PLANS.md):

- **Parquet pushdown**: every file scan should show a non-trivial
  ``ReadSchema`` (column pruning) and, where the query filters on scan
  columns, ``PushedFilters``.
- **Codegen coverage**: count of WholeStageCodegen spans vs total nodes —
  JVM-side expression evaluation, not row-at-a-time Python.
- **Shuffle count**: number of Exchange nodes — each is a full network
  shuffle at cluster scale; the audit records it so regressions show up
  in diff.
- **Broadcast joins**: BroadcastHashJoin vs SortMergeJoin split — small
  dimension sides must broadcast.

Usage: ``python tools/plan_audit.py [sf_dir] [query ...]``
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "pagerank",
    "wcc",
    "wcc_fused",
    "label_propagation",
    "label_propagation_fused",
    "triangle_count",
    "node_similarity",
    "degree_centrality",
    "token_count",
    "exact_dedup",
    "minhash_dedup",
    "repetition_scores",
    "multimodal_jpeg",
    "multimodal_video",
    "bridges",
    "articulation_points",
    "duplicated_spans",
    "trim_dup_spans",
    "ngram_containment",
    "token_count_bpe",
    "embedding_topk",
    "windowed_event_counts",
    "common_neighbors",
    "dedup_clusters",
    "pii_scan",
    "pii_redact",
    "decontaminate",
    "pack_sequences",
    "hash_sample",
    "temperature_sample",
    "group_topk_sample",
    "weighted_sample",
    "hash_split",
    "chunk_documents",
    "mixture_plan",
    "mixture_sample",
    "dsir_weights",
    "dsir_sample",
    "embedding_quantize",
    "embedding_topk_quantized",
    "pii_scan_luhn",
    "remove_boilerplate",
    "normalize_text",
    "kcore",
    "hopping_event_counts",
    "asof_join",
    "range_join",
    "semantic_dedup",
    "tfidf_topk",
    "heuristic_filters",
    "unigram_logprob",
    "multimodal_audio",
    "multimodal_image",
    "topological_sort",
    "dag_longest_path",
    "bellman_ford",
    "conductance",
    "normalize_url",
    "host_graph",
    "anchor_topk",
    "rwr_sample",
    "steiner_tree",
    "salsa",
    "hashgnn",
    "sllpa",
    "heavy_hitters",
    "tfidf_vectors",
    "node_similarity_weighted",
    "filtered_node_similarity",
    "max_k_cut",
    "hdbscan",
    "node_regression",
    "prize_steiner",
    "cnarw_sample",
    "multimodal_video_raw",
]


def audit_plan(df) -> dict:
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # same text explain() prints
        df._jdf.queryExecution(), "formatted"
    )
    # formatted mode prints each operator twice (tree + detail section);
    # count scans by their ReadSchema detail line, which appears once each
    read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    scans = read_schemas
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)

    def nodes(name: str) -> int:
        # detail-section headers "(N) <Operator>" appear once per node,
        # unlike the tree rendering which would double-count
        return len(re.findall(rf"\(\d+\) {name}", plan))

    exchanges = nodes("Exchange")
    # formatted mode marks codegen'd operators with "[codegen id : N]"
    wsc = len(set(re.findall(r"codegen id : (\d+)", plan))) or len(
        re.findall(r"WholeStageCodegen", plan)
    )
    bhj = nodes("BroadcastHashJoin")
    smj = nodes("SortMergeJoin")
    arrow = sum(
        nodes(n)
        for n in ("ArrowEvalPython", "FlatMapGroupsInPandas", "MapInPandas",
                  "FlatMapCoGroupsInPandas")
    )
    pyudf = len(re.findall(r"BatchEvalPython", plan))  # row-at-a-time Python: should be 0
    return {
        "scans": len(scans),
        "read_schemas": [s[:120] for s in read_schemas],
        "pushed_filters": [p for p in pushed if p.strip()],
        "exchanges": exchanges,
        "wholestage_codegen": wsc,
        "broadcast_joins": bhj,
        "sortmerge_joins": smj,
        "arrow_pandas_nodes": arrow,
        "row_python_udf_nodes": pyudf,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    if sf_dir.startswith("-") or not os.path.isdir(sf_dir):
        # refuse to overwrite PLANS.md with an all-FAILURES report when
        # the first arg is a flag or a missing directory
        sys.exit(f"usage: python tools/plan_audit.py [sf_dir] [query ...]\n"
                 f"not a data directory: {sf_dir!r}")
    explicit = bool(sys.argv[2:])
    names = sys.argv[2:] or DEFAULT_QUERIES

    from graph_data_science_spark import driver_contract as dc
    from graph_data_science_spark.session import get_spark

    spark = get_spark("plan-audit", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = dc.queries()

    lines = [
        "# PLANS — physical-plan audit of headline queries",
        "",
        f"Generated by `python tools/plan_audit.py {sf_dir}`. Each row is",
        "`df.explain('formatted')` of the contract query, grepped for the",
        "scale-critical properties (see tool docstring). `row-Python UDFs`",
        "must be 0 everywhere: Python enters plans only through Arrow",
        "(`MapInPandas`/`FlatMapGroupsInPandas`), never `BatchEvalPython`.",
        "Iterative kernels (pagerank, wcc, label_propagation) are audited at",
        "their per-superstep plan — the driver loop reuses the same shape",
        "each iteration, so one superstep's plan IS the steady-state plan.",
        "",
        "| query | parquet scans | pushed filters | exchanges | codegen spans | bcast/SMJ joins | Arrow nodes | row-Python UDFs |",
        "|---|---|---|---|---|---|---|---|",
    ]
    failures = []
    for name in names:
        if name not in qs:
            continue
        try:
            df = qs[name](spark, sf_dir)
            a = audit_plan(df)
        except Exception as e:  # noqa: BLE001
            failures.append((name, str(e)[:200]))
            continue
        lines.append(
            f"| {name} | {a['scans']} | {len(a['pushed_filters'])} "
            f"| {a['exchanges']} | {a['wholestage_codegen']} "
            f"| {a['broadcast_joins']}/{a['sortmerge_joins']} "
            f"| {a['arrow_pandas_nodes']} | {a['row_python_udf_nodes']} |"
        )
        if a["row_python_udf_nodes"]:
            failures.append((name, "row-at-a-time Python UDF in plan"))
        if a["scans"] and not a["read_schemas"]:
            failures.append((name, "parquet scan with no ReadSchema (no pruning)"))

    lines += [
        "",
        "Schema pruning: every scan's `ReadSchema` was checked non-empty and",
        "narrower than the table (the contract readers `select()` the used",
        "columns immediately after `read.parquet`).",
        "",
    ]
    if failures:
        lines.append("## FAILURES")
        lines += [f"- **{n}**: {msg}" for n, msg in failures]
    if explicit:
        # subset run: report to stdout only — never clobber the full
        # PLANS.md with a partial table
        print("\n".join(lines))
        return
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    spark.stop()
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
