"""Source-code corpus: deterministic synthesis + import-edge extraction.

Input contract (BASELINE.json ``input_hint``): a table of source-code
repositories ``(repo string, path string, commit string, lang string,
content string)`` (Iceberg on a real cluster; parquet locally — the reader
only needs ``spark.read.table`` / ``read.parquet``). From it we derive the
directed dependency edge table ``(src, dst, weight)``: one edge per
(importing repo → imported repo), weight = number of distinct importing
files.

Scale design
------------
- Synthesis is embarrassingly parallel: ``spark.range(n_repos)`` fanned out
  with ``mapInPandas``; every value is a pure function of ``(seed, repo_id,
  file_idx)`` (numpy PCG64 seeded per row-group), so any subset of
  partitions regenerates identically — no driver-side state, no collect.
- File counts are Zipf-ish and import targets are skewed toward low repo
  ids (preferential-attachment flavor) so the extracted graph has the hub
  skew the salted CSR kernel exists for.
- Extraction is pure JVM: ``regexp_extract_all`` + ``explode`` +
  ``groupBy().agg`` — whole-stage-codegen friendly, no Python in the hot
  path at all (stronger than the pandas-UDF floor the input_hint sets).
  Module→repo resolution is a broadcast join against the (small) repo
  dimension.
- Per-row invariant: ``sha256(content)`` via ``F.sha2`` (JVM) must equal
  the value computed at synthesis time with hashlib — checked in tests and
  exposed as :func:`verify_sha256`.

Closed-form edges: file ``f`` of repo ``r`` imports repos
``{(r * 31 + f * 17 + j * 7919) % n_repos for j in 1..k} - {r}`` with
``k = 1 + (r + f) % 3`` — tests recompute this exactly.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"

_LANGS = ("py", "java", "go", "rs")
_IMPORT_SYNTAX = {
    "py": "import {m}",
    "java": "import {m}.core;",
    "go": 'import "{m}"',
    "rs": "use {m}::prelude;",
}
# one regex matches all four syntaxes; group 1 = module name
IMPORT_REGEX = r"(?:import|use)\s+\"?([a-z]+_mod_\d+)"


def repo_name(repo_id: int) -> str:
    return f"org{repo_id % 97}/repo_{repo_id}"


def module_name(repo_id: int) -> str:
    return f"lib_mod_{repo_id}"


def file_count(repo_id: int, avg_files: int) -> int:
    # zipf-ish: a few repos get many files, most get few; deterministic
    rng = np.random.Generator(np.random.PCG64(repo_id * 2654435761 % (2**31)))
    z = int(rng.zipf(1.7))
    return max(1, min(z, avg_files * 20)) if avg_files > 1 else 1


def import_targets(repo_id: int, file_idx: int, n_repos: int) -> list[int]:
    k = 1 + (repo_id + file_idx) % 3
    out = []
    for j in range(1, k + 1):
        t = (repo_id * 31 + file_idx * 17 + j * 7919) % n_repos
        # skew: fold half the mass onto low ids (hub repos)
        if (repo_id + file_idx + j) % 2 == 0:
            t = t % max(1, n_repos // 20)
        if t != repo_id:
            out.append(t)
    return out


def _file_content(repo_id: int, file_idx: int, n_repos: int, lang: str) -> str:
    lines = [f"// {repo_name(repo_id)} file {file_idx}"]
    for t in import_targets(repo_id, file_idx, n_repos):
        lines.append(_IMPORT_SYNTAX[lang].format(m=module_name(t)))
    lines.append(f"fn main_{file_idx}() {{ return {repo_id}; }}")
    return "\n".join(lines)


def synthesize_corpus(
    spark: SparkSession,
    n_repos: int,
    *,
    avg_files: int = 4,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic (repo, path, commit, lang, content) table.

    ``seed`` participates in the commit sha only (content layout is fully
    pinned by ids so edge structure is seed-stable for tests).
    """
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 2)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid in pdf["id"].to_numpy(np.int64):
                rid = int(rid)
                nm = repo_name(rid)
                lang = _LANGS[rid % len(_LANGS)]
                for f_idx in range(file_count(rid, avg_files)):
                    content = _file_content(rid, f_idx, n_repos, lang)
                    commit = hashlib.sha1(
                        f"{seed}:{nm}:{f_idx}".encode()
                    ).hexdigest()
                    rows.append(
                        (nm, f"src/f_{f_idx}.{lang}", commit, lang, content)
                    )
            yield pd.DataFrame(
                rows, columns=["repo", "path", "commit", "lang", "content"]
            )

    return (
        spark.range(0, n_repos, 1, num_partitions)
        .mapInPandas(gen, CORPUS_SCHEMA)
    )


def content_sha256(df: DataFrame) -> DataFrame:
    """(repo, path, sha256) — the per-row invariant column, computed JVM-side."""
    return df.select("repo", "path", F.sha2("content", 256).alias("sha256"))


def verify_sha256(df: DataFrame, expected: DataFrame) -> int:
    """Anti-join count of rows whose sha256 differs from ``expected``
    (same (repo, path, sha256) schema). 0 == invariant holds."""
    return (
        content_sha256(df)
        .join(expected, ["repo", "path", "sha256"], "left_anti")
        .count()
    )


def repo_id_expr(col: str):
    """JVM expression extracting the dense numeric repo id from a repo
    name (``org{id%97}/repo_{id}``). Lets graph builds take the
    :func:`graph.from_dense_edge_df` fast path — no sort-based id map,
    no endpoint joins — since repo ids are dense ``[0, n_repos)`` by
    construction."""
    return F.regexp_extract(F.col(col), r"repo_(\d+)$", 1).cast("long")


def repo_dimension(corpus: DataFrame) -> DataFrame:
    """(repo, module) — one row per repo; module derived from repo id suffix."""
    return (
        corpus.select("repo")
        .distinct()
        .withColumn(
            "module",
            F.concat(
                F.lit("lib_mod_"), F.regexp_extract("repo", r"repo_(\d+)$", 1)
            ),
        )
    )


def extract_import_edges(
    corpus: DataFrame, *, count_distinct_files: bool = True
) -> DataFrame:
    """corpus → directed dependency edges (src repo, dst repo, weight).

    All-JVM plan: regexp_extract_all (codegen) → explode → broadcast join
    module→repo → groupBy(src,dst) count. Weight = distinct importing
    files (GDS Aggregation.COUNT flavor over the raw import multi-edges).
    """
    dim = repo_dimension(corpus)
    refs = (
        corpus.select(
            F.col("repo").alias("src"),
            "path",
            F.explode(
                F.regexp_extract_all("content", F.lit(IMPORT_REGEX), F.lit(1))
            ).alias("module"),
        )
    )
    resolved = refs.join(
        F.broadcast(dim.withColumnRenamed("repo", "dst")), "module"
    ).filter(F.col("src") != F.col("dst"))
    if count_distinct_files:
        resolved = resolved.select("src", "dst", "path").distinct()
    return (
        resolved.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )


def expected_edges_closed_form(n_repos: int, avg_files: int = 4) -> dict:
    """Driver-side oracle for tests: {(src_repo, dst_repo): weight}."""
    out: dict = {}
    for rid in range(n_repos):
        seen: dict = {}
        for f_idx in range(file_count(rid, avg_files)):
            for t in set(import_targets(rid, f_idx, n_repos)):
                seen[t] = seen.get(t, 0) + 1
        for t, w in seen.items():
            out[(repo_name(rid), repo_name(t))] = float(w)
    return out
