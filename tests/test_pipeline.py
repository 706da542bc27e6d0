"""Training-data pipeline operators: dedup, text analysis, ANN, multimodal."""

import numpy as np
from pyspark.sql import functions as F

from graph_data_science_spark.pipeline.ann import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    ivf_topk,
)
from graph_data_science_spark.pipeline.multimodal import (
    extract_features,
    sample_frames,
    synthesize_media,
)
from graph_data_science_spark.pipeline.text import (
    exact_dedup,
    minhash_dedup,
    ngram_jaccard_pairs,
    quality_score,
    simhash,
    simhash_near_dups,
    token_count,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_count_and_quality(spark):
    d = _docs(spark, [(0, "a b c a"), (1, "x"), (2, "  p  q ")])
    tc = {r["doc_id"]: r["n_tokens"] for r in token_count(d).collect()}
    assert tc == {0: 4, 1: 1, 2: 2}
    qs = {r["doc_id"]: r["score"] for r in quality_score(d).collect()}
    assert qs[0] == 0.75 and qs[1] == 1.0 and qs[2] == 1.0


def test_exact_dedup(spark):
    d = _docs(
        spark,
        [(0, "same text here"), (1, "same  text   here"), (2, "other")],
    )
    out = {r["doc_id"]: r["copies"] for r in exact_dedup(d).collect()}
    assert out == {0: 2, 2: 1}  # whitespace-normalized group, min id kept


def test_ngram_jaccard_and_minhash_agree_on_planted_dup(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    near = base + " tail"
    far = "completely different words in this one entirely unrelated text"
    d = _docs(spark, [(0, base), (1, near), (2, far)])
    jac = {
        (r["doc1"], r["doc2"]): r["jaccard"]
        for r in ngram_jaccard_pairs(d, n=2, threshold=0.5).collect()
    }
    assert (0, 1) in jac and len(jac) == 1
    mh = {
        (r["doc1"], r["doc2"])
        for r in minhash_dedup(d, n=2, min_jaccard_est=0.5).collect()
    }
    assert (0, 1) in mh and (0, 2) not in mh


def test_simhash_identical_docs_distance_zero(spark):
    d = _docs(spark, [(0, "alpha beta gamma"), (1, "alpha beta gamma"),
                      (2, "unrelated totally different thing here")])
    sh = simhash(d).cache()
    vals = {r["doc_id"]: r["simhash"] for r in sh.collect()}
    assert vals[0] == vals[1]
    nd = {(r["doc1"], r["doc2"]): r["hamming"]
          for r in simhash_near_dups(sh, max_hamming=3).collect()}
    assert nd.get((0, 1)) == 0


def test_ann_bruteforce_matches_numpy(spark):
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((20, 8)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    out = cosine_topk_bruteforce(emb, k=2).collect()
    got = {}
    for r in out:
        got.setdefault(r["vec_id"], []).append((r["neighbor_id"], r["cosine"]))
    V = vecs.astype(np.float64)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    S = V @ V.T
    np.fill_diagonal(S, -np.inf)
    for i in range(20):
        order = np.argsort(-S[i], kind="stable")[:2]
        want = [(int(j), S[i, j]) for j in order]
        have = sorted(got[i], key=lambda t: (-t[1], t[0]))
        for (ja, ca), (jb, cb) in zip(have, want):
            assert ja == jb and abs(ca - cb) < 1e-9


def test_ann_lsh_and_ivf_recall(spark):
    rng = np.random.default_rng(4)
    vecs = rng.standard_normal((60, 16)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<float>",
    ).cache()
    exact = {
        (r["vec_id"], r["neighbor_id"])
        for r in cosine_topk_bruteforce(emb, k=1).collect()
    }
    lsh = {
        (r["vec_id"], r["neighbor_id"])
        for r in cosine_topk_lsh(emb, k=1, bits=4, tables=6).collect()
    }
    ivf = {
        (r["vec_id"], r["neighbor_id"])
        for r in ivf_topk(emb, k=1, n_centroids=4, nprobe=2).collect()
    }
    assert len(lsh & exact) / len(exact) > 0.5  # approximate but useful
    assert len(ivf & exact) / len(exact) > 0.5


def test_multimodal_plumbing(spark):
    media = synthesize_media(spark, 10, kind="image")
    feats = extract_features(media, dim=8).collect()
    assert len(feats) == 10
    for r in feats:
        assert len(r["feature"]) == 8 and r["n_bytes"] > 0
    vids = synthesize_media(spark, 5, kind="video")
    frames = sample_frames(vids, every_ms=500)
    assert frames.count() >= 5
    assert frames.columns == ["media_id", "frame_ts_ms", "payload"]
