"""Hashed TF-IDF vectors: correctness, density conversion, normalization."""

import math

from graph_data_science_spark.pipeline.text import tfidf_dense, tfidf_vectors


def _docs(spark):
    return spark.createDataFrame(
        [(0, "apple banana apple"), (1, "banana cherry"), (2, "apple")],
        "doc_id long, text string",
    )


def test_tfidf_sparse_weights(spark):
    docs = _docs(spark)
    # dim large enough that the three terms land in distinct buckets
    out = tfidf_vectors(docs, dim=64).collect()
    rows = {(r.doc_id, r.bucket): r.weight for r in out}
    buckets = {r.bucket for r in out}
    assert len(buckets) == 3  # no collision at dim 64 for these terms
    # doc 0 has tf=2 on apple's bucket: weight must be exactly 2x doc 2's
    by_doc = {}
    for (d, b), w in rows.items():
        by_doc.setdefault(d, {})[b] = w
    apple_bucket = next(iter(by_doc[2]))  # doc 2 is just "apple"
    assert math.isclose(
        by_doc[0][apple_bucket], 2 * by_doc[2][apple_bucket]
    )
    # idf: apple df=2, cherry df=1 -> cherry idf strictly larger
    cherry_bucket = [b for b in by_doc[1] if b not in by_doc[0]][0]
    assert by_doc[1][cherry_bucket] > by_doc[2][apple_bucket]


def test_tfidf_dense_and_l2(spark):
    docs = _docs(spark)
    sparse = tfidf_vectors(docs, dim=16, l2_normalize=True)
    for r in sparse.groupBy("doc_id").agg(
        {"weight": "collect_list"}
    ).collect():
        ws = r["collect_list(weight)"]
        assert math.isclose(sum(w * w for w in ws), 1.0, rel_tol=1e-9)
    dense = {r.doc_id: r.embedding for r in tfidf_dense(
        sparse, 16).collect()}
    assert all(len(v) == 16 for v in dense.values())
    nz = {r.doc_id: {r.bucket: r.weight} for r in sparse.collect()}
    for d, emb in dense.items():
        for b, w in nz[d].items():
            assert math.isclose(emb[b], w)
