"""Two-parallelism scaling evidence for the north rule.

Runs the identical PageRank job (same input parquet, same code) in fresh
JVMs at local[N] and local[4N] and reports throughput (edges processed/sec
= |E| x supersteps / elapsed) plus scaling efficiency
(throughput@4N / throughput@N) / 4. Writes BENCH.md.

Usage: python tools/bench_scaling.py [n_repos] [n_small] [n_big]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_TEMPLATE = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from graph_data_science_spark.session import get_spark
from graph_data_science_spark.graph import from_edge_df
from graph_data_science_spark.operators.pagerank import pagerank
from graph_data_science_spark.plans.csr import build_csr_graph

cpus = {cpus}
# shuffle partitioning held constant across runs: the job is identical,
# only the executor-core count changes (mirrors N vs 4N executors)
spark = get_spark("scaling-bench", master=f"local[{{cpus}}]",
                  shuffle_partitions={parts})
spark.sparkContext.setLogLevel("ERROR")
edges = spark.read.parquet({edges_path!r})
g = from_edge_df(edges, weight="weight")
g.vertices = g.vertices.localCheckpoint(eager=True)
g.edges = g.edges.localCheckpoint(eager=True)
n_edges = g.relationship_count()
csr = build_csr_graph(g.edges)
# warmup: superstep machinery (JIT, arrow init) AND the per-worker block
# caches reach steady state outside the timed region
pagerank(g, tolerance=0.0, max_iterations=7, csr=csr)
t0 = time.monotonic()
out = pagerank(g, tolerance=0.0, max_iterations={iters}, csr=csr)
out.scores.count()
sec = time.monotonic() - t0
supersteps = out.ran_iterations
print(json.dumps({{"cpus": cpus, "edges": n_edges, "sec": sec,
                  "supersteps": supersteps,
                  "eps": n_edges * supersteps / sec}}))
spark.stop()
"""


def run(cpus: int, edges_path: str, iters: int, parts: int) -> dict:
    code = RUN_TEMPLATE.format(
        repo=REPO, cpus=cpus, edges_path=edges_path, iters=iters, parts=parts
    )
    env = dict(os.environ, SPARK_DRIVER_MEM=os.environ.get(
        "SPARK_DRIVER_MEM", "48g"))
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, check=True, env=env,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_repos = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_big = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    iters = int(os.environ.get("BENCH_PR_MAXITERS", 20))
    edges_path = f"/tmp/gds_scaling_edges_{n_repos}"

    if not os.path.exists(edges_path):
        gen = r"""
import sys
sys.path.insert(0, {repo!r})
from graph_data_science_spark.session import get_spark
from graph_data_science_spark.sources.corpus import (
    synthesize_corpus, extract_import_edges)
spark = get_spark("gen", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
extract_import_edges(synthesize_corpus(spark, {n})).write.mode(
    "overwrite").parquet({p!r})
spark.stop()
""".format(repo=REPO, n=n_repos, p=edges_path)
        subprocess.run([sys.executable, "-c", gen], check=True)

    parts = 2 * n_big
    small = run(n_small, edges_path, iters, parts)
    big = run(n_big, edges_path, iters, parts)
    eff = (big["eps"] / small["eps"]) / (n_big / n_small)
    report = {
        "input_edges": big["edges"],
        "supersteps": big["supersteps"],
        f"local[{n_small}]": {
            "sec": round(small["sec"], 2),
            "edges_per_sec": round(small["eps"], 1),
        },
        f"local[{n_big}]": {
            "sec": round(big["sec"], 2),
            "edges_per_sec": round(big["eps"], 1),
        },
        "scaling_efficiency": round(eff, 3),
        "target": ">= 0.8 from N to 4N parallelism",
    }
    print(json.dumps(report))

    md = f"""# BENCH — scaling evidence (north rule)

Same PageRank job (damping 0.85, tolerance 0, {big['supersteps']} supersteps), same
input edge table ({big['edges']:,} edges from the synthesized source-code corpus,
{n_repos:,} repos), fresh JVM per run. Kernel: per-partition CSR blocks +
salted scatter/gather (see `graph_data_science_spark/plans/`).

| parallelism | wall sec | edges processed/sec |
|---|---|---|
| local[{n_small}] (N) | {small['sec']:.2f} | {small['eps']:,.0f} |
| local[{n_big}] (4N) | {big['sec']:.2f} | {big['eps']:,.0f} |

**Scaling efficiency (throughput@4N / throughput@N) / 4 = {eff:.3f}**
(north-rule target >= 0.8; in-sandbox stand-in for the N vs 4N executor
cluster runs — see BASELINE.md).
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
