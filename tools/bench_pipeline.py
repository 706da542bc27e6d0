"""Training-data-pipeline throughput evidence.

Runs the headline pipeline operators (exact dedup, MinHash-LSH near-dup,
duplicated-span detection + trim, token/quality scoring) over a
deterministically synthesized document corpus with planted duplicates and
prints ONE JSON line with per-op wall time and docs/sec + MB/sec.

The corpus is a pure function of (seed, doc_id): 10% exact duplicates,
5% near-duplicates (one token mutated), 5% documents embedding a shared
boilerplate span — so every dedup family finds real work. Synthesis is
mapInPandas (Arrow-vectorized, embarrassingly parallel), same pattern as
sources/corpus.py.

Usage: python tools/bench_pipeline.py [n_docs]   (default 200_000)
Env: BENCH_PIPE_CPUS (default all), BENCH_PIPE_HASH (md5|xxhash64,
default xxhash64 — the cheap engine-local hash is the scale path; md5 is
the oracle-portable one the contract checks).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

WORDS = [f"w{i:03d}" for i in range(600)]
BOILER = " ".join(f"boiler{i}" for i in range(24))


def synthesize_docs(spark, n_docs: int):
    from pyspark.sql import functions as F

    def gen(it):
        for pdf in it:
            ids = pdf["id"].to_numpy(np.int64)
            texts = []
            for i in ids:
                rng = np.random.Generator(
                    np.random.PCG64(int(i) * 2654435761 % (2**63))
                )
                kind = i % 20
                # kinds 0-2 copy the kind-4 slot of the SAME block — that
                # slot always takes the plain branch, so the copy chain is
                # one level deep and the planted rates are exact
                base = int(i - kind + 4)
                if kind < 2:
                    # exact duplicate of the block's plain doc
                    rng = np.random.Generator(
                        np.random.PCG64(base * 2654435761 % (2**63))
                    )
                    toks = rng.choice(WORDS, size=40 + base % 120)
                    texts.append(" ".join(toks))
                elif kind == 2:
                    # near duplicate: one token changed
                    rng = np.random.Generator(
                        np.random.PCG64(base * 2654435761 % (2**63))
                    )
                    toks = list(rng.choice(WORDS, size=40 + base % 120))
                    toks[len(toks) // 2] = "MUTATED"
                    texts.append(" ".join(toks))
                elif kind == 3:
                    # unique doc with the shared boilerplate span inside
                    toks = list(rng.choice(WORDS, size=40 + int(i) % 120))
                    mid = len(toks) // 2
                    texts.append(
                        " ".join(toks[:mid]) + " " + BOILER + " "
                        + " ".join(toks[mid:])
                    )
                elif kind == 5:
                    # unique doc carrying planted PII (email + phone) so
                    # the pii ops measure real match/rewrite work, not
                    # just a clean-text regex scan
                    toks = list(rng.choice(WORDS, size=40 + int(i) % 120))
                    toks.append(f"user{int(i)}@example.com")
                    toks.append("555-867-5309")
                    texts.append(" ".join(toks))
                else:
                    toks = rng.choice(WORDS, size=40 + int(i) % 120)
                    texts.append(" ".join(toks))
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    parallelism = spark.sparkContext.defaultParallelism
    return spark.range(n_docs, numPartitions=4 * parallelism).mapInPandas(
        gen, "doc_id long, text string"
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cpus = int(os.environ.get("BENCH_PIPE_CPUS", os.cpu_count() or 8))
    base_hash = os.environ.get("BENCH_PIPE_HASH", "xxhash64")

    from graph_data_science_spark.pipeline.text import (
        duplicated_span_stats,
        duplicated_spans,
        exact_dedup,
        minhash_dedup,
        quality_score,
        token_count_bpe,
        trim_duplicated_spans,
    )
    from graph_data_science_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    spark = get_spark("gds-bench-pipeline", master=f"local[{cpus}]",
                      shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")

    docs = synthesize_docs(spark, n_docs).localCheckpoint(eager=True)
    total_bytes = docs.selectExpr("sum(length(text))").collect()[0][0]
    mb = total_bytes / 1e6

    timings: dict[str, float] = {}
    extras: dict[str, int] = {}

    def timed(name, fn):
        t0 = time.monotonic()
        out = fn()
        timings[name] = round(time.monotonic() - t0, 3)
        extras[name + "_rows"] = out
        return out

    # every action must OBSERVE computed values: a bare count() lets
    # Catalyst eliminate unreferenced projections and row-preserving left
    # joins, timing a pruned plan instead of the operator
    from pyspark.sql import functions as F

    def force(df, *cols):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.hash(*[F.col(c) for c in cols])).alias("h"),
        ).collect()[0]
        return int(row["n"])

    timed("exact_dedup", lambda: exact_dedup(docs).count())
    timed(
        "minhash_lsh_dedup",
        lambda: minhash_dedup(docs, base_hash=base_hash).count(),
    )
    timed(
        "duplicated_spans",
        lambda: duplicated_spans(
            docs, 8, base_hash=base_hash
        ).count(),
    )
    timed(
        "dup_span_stats",
        lambda: force(
            duplicated_span_stats(docs, 8, base_hash=base_hash),
            "n_dup_spans",
        ),
    )
    timed(
        "trim_dup_spans",
        lambda: force(
            trim_duplicated_spans(docs, 8, base_hash=base_hash), "text"
        ),
    )
    timed(
        "token_count_bpe",
        lambda: force(token_count_bpe(docs), "n_tokens"),
    )
    timed(
        "quality_score", lambda: force(quality_score(docs), "score")
    )

    from graph_data_science_spark.pipeline.text import (
        heuristic_filters,
        tfidf_topk,
        unigram_logprob,
    )

    timed(
        "tfidf_top5",
        lambda: force(tfidf_topk(docs, 5), "term", "tfidf"),
    )
    timed(
        "heuristic_filters",
        lambda: force(
            heuristic_filters(docs), "keep", "mean_word_len",
            "stopword_frac",
        ),
    )
    timed(
        "unigram_logprob",
        lambda: force(unigram_logprob(docs), "avg_logprob"),
    )

    from graph_data_science_spark.pipeline.bpe import bpe_encode, bpe_train

    t0 = time.monotonic()
    merges = bpe_train(docs, 200, min_count=2)
    timings["bpe_train_200"] = round(time.monotonic() - t0, 3)
    extras["bpe_train_200_rows"] = len(merges)
    timed(
        "bpe_encode",
        lambda: force(bpe_encode(docs, merges), "n_bpe_tokens"),
    )

    # curation: PII (zero-shuffle projections), n-gram decontamination
    # (broadcast semi-join of benchmark span hashes), sequence packing
    # (distributed prefix sum)
    from graph_data_science_spark.pipeline.curation import (
        decontaminate,
        pack_sequences,
        pii_redact,
        pii_scan,
    )

    timed(
        "pii_scan",
        lambda: force(
            pii_scan(docs),
            "n_email", "n_ssn", "n_credit_card", "n_phone", "n_ipv4",
        ),
    )
    timed("pii_redact", lambda: force(pii_redact(docs), "text"))
    # benchmark/eval set: ~n_docs/997 held-out docs (eval suites are tiny
    # next to the corpus; the distinct-hash side broadcasts)
    bench_docs = docs.filter(F.col("doc_id") % 997 == 3)
    timed(
        "decontaminate",
        lambda: force(
            decontaminate(docs, bench_docs, 8, base_hash=base_hash),
            "n_contaminated_spans",
        ),
    )
    timed(
        "pack_sequences",
        lambda: force(pack_sequences(docs, 2048), "start_token"),
    )

    # deterministic sampling: pure scan+filter (hash-gated), no shuffle
    from graph_data_science_spark.pipeline.sampling import (
        group_topk_sample,
        hash_sample,
        temperature_sample,
    )

    grouped = docs.withColumn(
        "grp", F.concat(F.lit("s"), (F.col("doc_id") % 16).cast("string"))
    )
    # sampling always uses the md5 hash: thresholds assume the [0, 2^60)
    # range (xxhash64 is signed-full-range and would skew the rate)
    timed(
        "hash_sample",
        lambda: hash_sample(docs, 0.3, seed=7).count(),
    )
    timed(
        "temperature_sample",
        lambda: temperature_sample(
            grouped, "grp", target_rows=n_docs // 4, alpha=0.5, seed=7
        ).count(),
    )
    timed(
        "group_topk_sample",
        lambda: group_topk_sample(grouped, "grp", 1000, seed=7).count(),
    )

    # clustered semantic dedup over synthesized embeddings (planted
    # duplicate pairs share the base vector, mirroring the text corpus)
    from graph_data_science_spark.pipeline.ann import semantic_dedup

    def gen_emb(it):
        for pdf in it:
            ids = pdf["id"].to_numpy(np.int64)
            vecs = []
            for i in ids:
                kind = i % 20
                base = int(i - kind + 4) if kind < 2 else int(i)
                rng = np.random.Generator(
                    np.random.PCG64(base * 2654435761 % (2**63))
                )
                vecs.append(rng.standard_normal(64))
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": [v.tolist() for v in vecs]}
            )

    emb = (
        spark.range(n_docs, numPartitions=4 * cpus)
        .mapInPandas(gen_emb, "vec_id long, embedding array<double>")
        .localCheckpoint(eager=True)
    )
    timed(
        "semantic_dedup",
        lambda: force(
            semantic_dedup(
                emb, threshold=0.99, n_clusters=256, seed=11,
                assign="matmul", max_cluster_size=20_000,
            ),
            "keep",
        ),
    )

    # text normalization / line boilerplate / profiling (round-2 late ops)
    from graph_data_science_spark.pipeline.text import (
        corpus_stats_approx,
        normalize_text,
        remove_boilerplate_lines,
    )

    timed("normalize_text", lambda: force(normalize_text(docs), "text"))
    timed(
        "remove_boilerplate_lines",
        lambda: force(remove_boilerplate_lines(docs), "text"),
    )
    timed(
        "corpus_stats_approx",
        lambda: force(corpus_stats_approx(docs), "vocab_approx"),
    )

    # data selection / mixing / splitting
    from graph_data_science_spark.pipeline.sampling import (
        dsir_weights,
        hash_split,
        mixture_sample,
        weighted_sample,
    )

    timed(
        "mixture_sample",
        lambda: mixture_sample(
            grouped, "grp", {f"s{i}": 1.0 for i in range(16)},
            n_docs * 20, seed=7,
        ).count(),
    )
    target_docs = docs.filter(F.col("doc_id") % 499 == 1)
    timed(
        "dsir_weights",
        lambda: force(dsir_weights(docs, target_docs), "logratio"),
    )
    wdocs = docs.withColumn("w", F.length("text").cast("double"))
    timed(
        "weighted_sample",
        lambda: weighted_sample(wdocs, "w", n_docs // 10, seed=7).count(),
    )
    timed(
        "hash_split",
        lambda: force(
            hash_split(docs, {"train": 0.9, "val": 0.05, "test": 0.05}),
            "split",
        ),
    )

    # int8 quantization (linear pass over the embedding column)
    from graph_data_science_spark.pipeline.ann import quantize_embeddings

    timed(
        "quantize_embeddings",
        lambda: force(quantize_embeddings(emb), "scale"),
    )

    # web link-graph ops over a synthetic messy crawl (3 links/doc)
    from graph_data_science_spark.pipeline.heavyhitters import heavy_hitters
    from graph_data_science_spark.pipeline.webgraph import (
        anchor_topk,
        host_graph,
        normalize_url,
    )

    d = F.col("doc_id")

    def messy(col):
        return F.concat(
            F.lit("HTTP://Host"), (col % 9973).cast("string"),
            F.lit(".Example.COM"),
            F.when(col % 5 == 0, F.lit(":80")).otherwise(F.lit("")),
            F.lit("/p/"), col.cast("string"),
            F.when(col % 3 == 0, F.lit("?utm_source=x&b=2&a=1"))
            .otherwise(F.lit("")),
            F.when(col % 7 == 0, F.lit("#f")).otherwise(F.lit("")),
        )

    links = (
        docs.select(
            "doc_id",
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("j"),
        )
        .select(
            messy(d).alias("src_url"),
            messy((d * 7 + F.col("j")) % n_docs).alias("dst_url"),
            F.concat(
                F.lit("a"), ((d + F.col("j")) % 5000).cast("string")
            ).alias("anchor"),
        )
        .localCheckpoint(eager=True)
    )
    timed(
        "normalize_url",
        lambda: force(normalize_url(links, "src_url"), "url_norm"),
    )
    timed("host_graph", lambda: force(host_graph(links), "weight"))
    timed(
        "anchor_topk", lambda: force(anchor_topk(links, k=3), "n_links")
    )
    timed(
        "heavy_hitters_mg",
        lambda: heavy_hitters(
            links.select(F.col("anchor").alias("item")), "item",
            k=100, exact=False,
        ).count(),
    )

    per_op = {
        k: {
            "sec": v,
            "docs_per_sec": round(n_docs / v, 1) if v else None,
            "mb_per_sec": round(mb / v, 1) if v else None,
        }
        for k, v in timings.items()
    }
    print(
        json.dumps(
            {
                "metric": "pipeline_docs_per_sec",
                "n_docs": n_docs,
                "corpus_mb": round(mb, 1),
                "base_hash": base_hash,
                "cpus": cpus,
                "ops": per_op,
                "rows": extras,
                "total_sec": round(sum(timings.values()), 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
