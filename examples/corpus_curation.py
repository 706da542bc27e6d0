"""Corpus curation end-to-end: synthesize docs -> curate -> profile -> pack.

Demonstrates the training-data pipeline: full curation chain (normalize,
exact + near dedup, quality gates, PII redaction, decontamination,
split), data-mixture sampling, DSIR selection, profiling, and sequence
packing — every step deterministic and cluster-size-independent.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graph_data_science_spark.pipeline.curation import (
    curate_corpus,
    pack_sequences,
    packing_stats,
)
from graph_data_science_spark.pipeline.sampling import (
    dsir_weights,
    mixture_plan,
)
from graph_data_science_spark.pipeline.text import corpus_stats
from graph_data_science_spark.session import get_spark

spark = get_spark("example-curation", master="local[8]",
                  shuffle_partitions=16)
spark.sparkContext.setLogLevel("ERROR")

# deterministic word-soup docs across three "sources"
docs = (
    spark.range(20_000)
    .select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 3).cast("string")).alias(
            "source"
        ),
        F.concat_ws(
            " ",
            *[
                # alpha-only synthetic words (translate hex -> letters)
                # so the C4/Gopher alpha-fraction gate sees real "words"
                F.concat(
                    F.lit("tok"),
                    F.translate(
                        F.substring(F.md5(F.concat_ws("_", F.col("id"),
                                                      F.lit(i))), 1, 5),
                        "0123456789", "ghijklmnop",
                    ),
                )
                for i in range(60)
            ],
        ).alias("text"),
    )
    .localCheckpoint(eager=True)
)

print("corpus profile:")
corpus_stats(docs).show(truncate=False)

print("mixture plan (50/30/20 under a 500k-token budget):")
mixture_plan(docs, "source", {"src0": 0.5, "src1": 0.3, "src2": 0.2},
             500_000).show()

bench = docs.filter(F.col("doc_id") % 997 == 3)
curated, report = curate_corpus(
    docs.select("doc_id", "text"),
    benchmark=bench,
    split_weights={"train": 0.9, "val": 0.05, "test": 0.05},
)
print("curation report:")
report.show(truncate=False)
print("split sizes:")
curated.groupBy("split").count().show()

target = docs.filter(F.col("doc_id") % 100 == 0)  # quality seed set
print("DSIR weights (top 5 target-like docs):")
dsir_weights(docs.select("doc_id", "text"), target.select("doc_id", "text")) \
    .orderBy(F.desc("logratio")).show(5)

packed = pack_sequences(curated.select("doc_id", "text"), 2048)
print("packing stats (seq_len 2048):")
packing_stats(packed, 2048).show()
spark.stop()
