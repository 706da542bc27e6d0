"""Similarity search end-to-end: embeddings -> exact / LSH / IVF ANN,
int8 quantization, k-means, clustered semantic dedup."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from graph_data_science_spark.pipeline.ann import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    cosine_topk_quantized,
    kmeans_assign,
    kmeans_fit,
    quantize_embeddings,
    semantic_dedup,
)
from graph_data_science_spark.session import get_spark

N, DIM, K = 5_000, 64, 5

spark = get_spark("example-ann", master="local[8]", shuffle_partitions=16)
spark.sparkContext.setLogLevel("ERROR")


def gen(it):
    for pdf in it:
        ids = pdf["id"].to_numpy(np.int64)
        vecs = []
        for i in ids:
            # every 10th vector duplicates its successor exactly, so the
            # dedup step below finds real work
            seed = int(i) + 1 if i % 10 == 0 else int(i)
            rng = np.random.Generator(np.random.PCG64(seed))
            base = np.zeros(DIM)
            base[seed % 8] = 4.0  # 8 planted clusters
            vecs.append(base + rng.standard_normal(DIM) * 0.6)
        yield pd.DataFrame(
            {"vec_id": ids, "embedding": [v.tolist() for v in vecs]}
        )


emb = (
    spark.range(N, numPartitions=16)
    .mapInPandas(gen, "vec_id long, embedding array<double>")
    .localCheckpoint(eager=True)
)

exact = cosine_topk_bruteforce(emb.limit(500), k=K)
print("exact top-k (500-vector slice):", exact.count(), "pairs")
lsh = cosine_topk_lsh(emb, k=K)
print("LSH top-k (full 5k):", lsh.count(), "pairs")
quant = cosine_topk_quantized(emb.limit(500), k=K)
print("int8-quantized top-k:", quant.count(), "pairs")
q = quantize_embeddings(emb)
print("quantized vectors:", q.count(),
      "(4x memory reduction vs float32, 8x vs float64)")

cents = kmeans_fit(emb, k=8, max_iter=5, seed=7)
sizes = kmeans_assign(emb, cents).groupBy("cluster").count().orderBy("cluster")
print("k-means cluster sizes (8 planted):")
sizes.show()

dd = semantic_dedup(emb, threshold=0.995, n_clusters=64, seed=7)
print("semantic dedup keep rows:", dd.filter("keep").count(), "/", N)
spark.stop()
