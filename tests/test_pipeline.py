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
    repetition_scores,
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


def test_repetition_scores_hand_computed(spark):
    d = _docs(
        spark,
        [
            # lines ["a b","a b","c"]: 3 lines, 2 distinct; dup chars 6/7.
            # tokens [a,b,a,b,c] (5 chars): top 2-gram "a b" x2 -> 4/5;
            # the single 5-gram occurs once -> dup 0.
            (0, "a b\na b\nc"),
            # all distinct: every fraction 0 except top 2-gram 2/6
            (1, "x y z w v u"),
            # 10 repeated tokens: top 2-gram count 9 (capped at 1.0);
            # every 5-gram is "p p p p p" x6 -> 6*5/10 capped at 1.0
            (2, "p p p p p p p p p p"),
        ],
    )
    out = {r["doc_id"]: r for r in repetition_scores(d).collect()}
    assert abs(out[0]["dup_line_frac"] - (1 - 2 / 3)) < 1e-6
    assert abs(out[0]["dup_line_char_frac"] - 6 / 7) < 1e-6
    assert abs(out[0]["top_ngram_char_frac"] - 4 / 5) < 1e-6
    assert out[0]["dup_ngram_char_frac"] == 0.0
    assert out[1]["dup_line_frac"] == 0.0
    assert out[1]["dup_line_char_frac"] == 0.0
    assert abs(out[1]["top_ngram_char_frac"] - 2 / 6) < 1e-6
    assert out[1]["dup_ngram_char_frac"] == 0.0
    assert out[2]["top_ngram_char_frac"] == 1.0
    assert out[2]["dup_ngram_char_frac"] == 1.0


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


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_cosine_neardup_exact_matches_numpy(spark):
    from graph_data_science_spark.pipeline.ann import cosine_neardup_pairs

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((30, 8))
    vecs[7] = vecs[3] + 0.01 * rng.standard_normal(8)  # planted near-dup
    vecs = vecs.astype(np.float32)
    out = cosine_neardup_pairs(_emb_df(spark, vecs), threshold=0.8)
    got = {(r["vec_id"], r["dup_id"]): r["cosine"] for r in out.collect()}
    v = vecs.astype(np.float64)
    sims = (v @ v.T) / np.outer(
        np.linalg.norm(v, axis=1), np.linalg.norm(v, axis=1)
    )
    want = {
        (i, j): sims[i, j]
        for i in range(len(v))
        for j in range(i + 1, len(v))
        if sims[i, j] >= 0.8
    }
    assert set(got) == set(want) and (3, 7) in got
    for k in got:
        assert abs(got[k] - want[k]) < 1e-9


def test_cosine_neardup_lsh_subset_and_finds_planted(spark):
    from graph_data_science_spark.pipeline.ann import cosine_neardup_pairs

    rng = np.random.default_rng(4)
    vecs = rng.standard_normal((40, 8))
    for a, b in ((2, 9), (11, 30)):  # planted near-identical pairs
        vecs[b] = vecs[a] + 0.001 * rng.standard_normal(8)
    vecs = vecs.astype(np.float32)
    emb = _emb_df(spark, vecs)
    exact = {
        (r["vec_id"], r["dup_id"])
        for r in cosine_neardup_pairs(emb, threshold=0.8).collect()
    }
    lsh = {
        (r["vec_id"], r["dup_id"])
        for r in cosine_neardup_pairs(
            emb, threshold=0.8, method="lsh"
        ).collect()
    }
    assert lsh <= exact  # precision 1 by construction
    # near-identical vectors share every bucket: LSH always finds them
    assert {(2, 9), (11, 30)} <= lsh


def test_cosine_neardup_dedup_greedy_rule(spark):
    from graph_data_science_spark.pipeline.ann import cosine_neardup_dedup

    vecs = np.array(
        [[1.0, 0.0], [0.99, 0.01], [0.0, 1.0], [-1.0, 0.0]], np.float32
    )
    out = {
        r["vec_id"]: r["keep"]
        for r in cosine_neardup_dedup(
            _emb_df(spark, vecs), threshold=0.9
        ).collect()
    }
    # 1 is a near-dup of 0 (drop); 0 keeps (no smaller partner); 2,3 unique
    assert out == {0: True, 1: False, 2: True, 3: True}


def test_dedup_clusters_transitive_and_singletons(spark):
    """Pairs (1,2),(2,3) and (7,9) -> clusters {1,2,3} and {7,9};
    untouched docs are singleton clusters; keep marks the min doc."""
    from graph_data_science_spark.pipeline.text import dedup_clusters

    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (9, 7)], "doc1 long, doc2 long"
    )
    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 5, 7, 9)], "doc_id long"
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["keep"])
        for r in dedup_clusters(pairs, docs).collect()
    }
    assert got == {
        1: (1, True), 2: (1, False), 3: (1, False),
        5: (5, True), 7: (7, True), 9: (7, False),
    }
    # without docs: only pair-touched ids appear
    ids = {r["doc_id"] for r in dedup_clusters(pairs).collect()}
    assert ids == {1, 2, 3, 7, 9}


def test_duplicated_spans_hand_computed(spark):
    from graph_data_science_spark.pipeline.text import (
        duplicated_span_stats,
        duplicated_spans,
    )

    docs = spark.createDataFrame(
        [
            # docs 1 and 2 share the 4-token run "a b c d" (one window);
            # doc 3 is unrelated; doc 4 is too short for any window
            (1, "a b c d x y"),
            (2, "z a b c d"),
            (3, "p q r s t u"),
            (4, "a b"),
        ],
        "doc_id long, text string",
    )
    spans = duplicated_spans(docs, 4).collect()
    got = sorted((r.doc_id, r.pos, r.n_docs) for r in spans)
    # "a b c d" starts at token 0 in doc 1 and token 1 in doc 2
    assert got == [(1, 0, 2), (2, 1, 2)]
    assert len({r.span_hash for r in spans}) == 1

    stats = {
        r.doc_id: (r.n_spans, r.n_dup_spans, r.dup_frac)
        for r in duplicated_span_stats(docs, 4).collect()
    }
    assert stats[1] == (3, 1, round(1 / 3, 6))
    assert stats[2] == (2, 1, 0.5)
    assert stats[3] == (3, 0, 0.0)
    assert stats[4] == (0, 0, 0.0)


def test_duplicated_spans_within_doc_repeat_not_cross_doc(spark):
    """min_docs=2 counts DISTINCT docs: a span repeated twice inside one
    document is not a cross-corpus duplicate."""
    from graph_data_science_spark.pipeline.text import duplicated_spans

    docs = spark.createDataFrame(
        [(1, "m n o p m n o p"), (2, "q r s t")],
        "doc_id long, text string",
    )
    assert duplicated_spans(docs, 4).count() == 0
    # but with min_docs=1 the in-doc repeat shows up
    rows = duplicated_spans(docs, 4, min_docs=1).collect()
    assert {r.pos for r in rows if r.doc_id == 1} == {0, 1, 2, 3, 4}


def test_trim_duplicated_spans_keeps_canonical_copy(spark):
    from graph_data_science_spark.pipeline.text import trim_duplicated_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c d x y"),   # canonical "a b c d" (min doc_id, pos)
            (2, "z a b c d"),     # duplicate occurrence -> cut
            (3, "p q"),           # too short for any window -> untouched
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text for r in trim_duplicated_spans(docs, 4).collect()}
    assert out[1] == "a b c d x y"
    assert out[2] == "z"
    assert out[3] == "p q"


def test_trim_duplicated_spans_overlapping_windows_union(spark):
    """A repeated run longer than the window is covered by the union of
    its overlapping duplicated windows."""
    from graph_data_science_spark.pipeline.text import trim_duplicated_spans

    run = "a b c d e"  # length 5, window 4 -> two overlapping dup windows
    docs = spark.createDataFrame(
        [(1, run + " s t"), (2, "u v " + run)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text for r in trim_duplicated_spans(docs, 4).collect()}
    assert out[1] == run + " s t"
    assert out[2] == "u v"


def test_ngram_containment_asymmetric(spark):
    """An excerpt fully contained in a long doc scores 1.0 from the
    excerpt's side but low Jaccard — the case containment exists for."""
    from graph_data_science_spark.pipeline.text import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    long_doc = " ".join(f"w{i}" for i in range(40))
    excerpt = " ".join(f"w{i}" for i in range(10, 16))  # inside long_doc
    docs = spark.createDataFrame(
        [(1, long_doc), (2, excerpt), (3, "x y z q r s")],
        "doc_id long, text string",
    )
    cont = {
        (r.doc1, r.doc2): r.containment
        for r in ngram_containment_pairs(docs, n=3, threshold=0.5).collect()
    }
    assert cont[(2, 1)] == 1.0          # excerpt ⊂ long doc
    assert (1, 2) not in cont           # long doc not contained in excerpt
    jac = ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    assert jac == []                    # jaccard misses the pair entirely


def test_token_count_bpe_vs_python_re(spark):
    import re

    from graph_data_science_spark.pipeline.text import (
        BPE_SPLIT_RE,
        token_count_bpe,
    )

    rows = [
        (1, "Hello, world! It's 2026."),
        (2, "don't    stop-me now: 3.14 costs $5"),
        (3, "plain words only here"),
        (4, ""),
        # engine-parity edge cases: \x0B diverges between Java \s and
        # RE2 \s, unicode letters diverge under \w — the explicit-ASCII
        # pattern must agree everywhere
        (5, "a\x0bb"),
        (6, "café au lait"),
        (7, "under_score mix_3d"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.n_tokens for r in token_count_bpe(docs).collect()}
    for doc_id, text in rows:
        assert got[doc_id] == len(re.findall(BPE_SPLIT_RE, text)), text
