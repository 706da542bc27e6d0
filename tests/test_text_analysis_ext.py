"""tf-idf keywords, heuristic quality gates, unigram LM, and the
exact-replay multimodal stats (pipeline pass 11)."""

import math

import numpy as np

from graph_data_science_spark.pipeline.multimodal import (
    PCM_LCG_A,
    PCM_LCG_B,
    pcm_stats,
    ppm_resize_stats,
    synthesize_gradient_ppm,
    synthesize_pcm_corpus,
)
from graph_data_science_spark.pipeline.text import (
    heuristic_filters,
    tfidf_topk,
    unigram_logprob,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tfidf_topk_ranks_rare_terms_highest(spark):
    docs = _docs(
        spark,
        [
            (0, "apple apple banana common"),
            (1, "banana cherry common"),
            (2, "common common durian"),
        ],
    )
    out = {
        (r.doc_id, r.kw_rank): (r.term, r.tf, r.tfidf)
        for r in tfidf_topk(docs, 2).collect()
    }
    # doc 0: apple tf=2 df=1 beats banana tf=1 df=2 and common df=3
    assert out[(0, 1)][0] == "apple"
    term, tf, tfidf = out[(0, 1)]
    assert tf == 2
    assert abs(tfidf - round(2 * (math.log(4 / 2) + 1), 6)) < 1e-9
    # doc 2: common tf=2*idf(1.0)=2.0 still beats durian 1*1.693
    assert out[(2, 1)][0] == "common"
    assert out[(2, 2)][0] == "durian"
    # deterministic tie-break: equal score -> term ascending
    t1 = _docs(spark, [(7, "zebra apple")])
    r = tfidf_topk(t1, 2).collect()
    assert [x.term for x in sorted(r, key=lambda x: x.kw_rank)] == [
        "apple", "zebra",
    ]


def test_heuristic_filters_signals_and_keep(spark):
    good = " ".join(["the quick brown fox jumps over lazy dogs"] * 8)
    docs = _docs(
        spark,
        [
            (0, good),                               # passes every gate
            (1, "lorem ipsum " + good),              # lorem reject
            (2, "x { y } " + good),                  # brace reject
            (3, "short doc"),                        # < 50 tokens
            (4, "One line. Two lines!\nEnds here?"), # sentences + punct
        ],
    )
    out = {r.doc_id: r for r in heuristic_filters(docs).collect()}
    assert out[0].keep and not out[1].keep and not out[2].keep
    assert not out[3].keep
    assert out[0].frac_alpha_tokens == 1.0
    assert out[0].stopword_frac > 0  # 'the' and 'over' hit the list
    assert out[4].n_sentences == 3
    assert out[4].n_lines == 2
    assert out[4].frac_lines_end_punct == 1.0


def test_unigram_logprob_rare_tokens_score_lower(spark):
    docs = _docs(
        spark,
        [
            (0, "common common common common"),
            (1, "common rareword"),
        ],
    )
    out = {r.doc_id: r for r in unigram_logprob(docs).collect()}
    assert out[0].n_tokens == 4 and out[1].n_tokens == 2
    assert out[0].avg_logprob > out[1].avg_logprob
    # exact: doc0 = ln(5/6); doc1 = (ln(5/6) + ln(1/6)) / 2
    assert abs(out[0].avg_logprob - round(math.log(5 / 6), 6)) < 1e-9
    assert abs(
        out[1].avg_logprob
        - round((math.log(5 / 6) + math.log(1 / 6)) / 2, 6)
    ) < 1e-9


def test_pcm_corpus_stats_match_direct_numpy(spark):
    ids = spark.createDataFrame([(d,) for d in range(6)], "doc_id long")
    out = {
        r.media_id: r
        for r in pcm_stats(synthesize_pcm_corpus(ids, n_samples=256)).collect()
    }
    i = np.arange(256, dtype=np.int64)
    for d in range(6):
        s = (PCM_LCG_A * i + PCM_LCG_B * (d + 1)) % 65536 - 32768
        r = out[d]
        assert r.n_samples == 256
        assert r.sample_sum == int(s.sum())
        assert r.peak == int(np.abs(s).max())
        assert r.zero_cross == int(
            np.count_nonzero((s[1:] < 0) != (s[:-1] < 0))
        )
        assert r.rms == float(np.sqrt(int((s * s).sum()) / 256))


def test_ppm_gradient_resize_stats_exact(spark):
    ids = spark.createDataFrame([(d,) for d in range(4)], "doc_id long")
    media = synthesize_gradient_ppm(ids, width=16, height=8)
    out = {
        r.media_id: r
        for r in ppm_resize_stats(media, width=4, height=2).collect()
    }
    y = np.arange(8)[:, None, None]
    x = np.arange(16)[None, :, None]
    c = np.arange(3)[None, None, :]
    for d in range(4):
        img = (3 * x + 7 * y + 11 * c + d) % 256
        # 4x4 blocks, uint8 truncation of the block mean
        blocks = img.reshape(2, 4, 4, 4, 3).swapaxes(1, 2)
        resized = (
            blocks.reshape(2, 4, 16, 3).astype(np.float64).mean(axis=2)
        ).astype(np.uint8)
        r = out[d]
        assert (r.out_width, r.out_height) == (4, 2)
        assert r.pixel_sum == int(resized.astype(np.int64).sum())
        assert r.pixel_min == int(resized.min())
        assert r.pixel_max == int(resized.max())


def test_corpus_stats_exact(spark):
    from graph_data_science_spark.pipeline.text import corpus_stats

    docs = _docs(
        spark,
        [(0, "a b c"), (1, "a a"), (2, "a b c d e")],
    )
    r = corpus_stats(docs).collect()[0]
    assert r.n_docs == 3
    assert r.total_tokens == 10
    assert r.vocab_size == 5
    assert abs(r.type_token_ratio - 0.5) < 1e-9
    assert r.p50_tokens == 3.0   # counts [2,3,5] -> median 3
    assert r.max_tokens == 5
    # type-7 interpolation: p90 of [2,3,5] = 3 + 0.8*(5-3) = 4.6
    assert abs(r.p90_tokens - 4.6) < 1e-6


def test_corpus_stats_approx(spark):
    from graph_data_science_spark.pipeline.text import (
        corpus_stats,
        corpus_stats_approx,
    )

    docs = _docs(
        spark,
        [(i, " ".join(f"w{j}" for j in range(i + 1))) for i in range(50)],
    )
    exact = corpus_stats(docs).collect()[0]
    approx = corpus_stats_approx(docs).collect()[0]
    # totals are exact (one-pass sums)
    assert approx.n_docs == exact.n_docs == 50
    assert approx.total_tokens == exact.total_tokens
    assert approx.total_chars == exact.total_chars
    # HLL++ estimate within 3 sd of the true 50-term vocabulary
    assert abs(approx.vocab_approx - exact.vocab_size) <= max(
        3 * 0.05 * exact.vocab_size, 1
    )
    # GK sketch returns order statistics: monotone, in range, max exact
    assert (
        approx.min_tokens
        <= approx.p50_tokens
        <= approx.p90_tokens
        <= approx.p99_tokens
        <= approx.max_tokens
    )
    assert approx.min_tokens == 1 and approx.max_tokens == 50
    # with n << accuracy the sketch is exact: median of 1..50
    assert approx.p50_tokens in (25, 26)


def test_boilerplate_line_removal(spark):
    from graph_data_science_spark.pipeline.text import (
        boilerplate_lines,
        remove_boilerplate_lines,
    )

    docs = _docs(
        spark,
        [
            (0, "unique zero\nCOOKIE BANNER\n\nbody zero"),
            (1, "unique one\nCOOKIE BANNER\nbody one"),
            (2, "unique two\nbody two\nbody two"),  # within-doc repeat only
            (3, "COOKIE BANNER"),  # whole doc is boilerplate
        ],
    )
    bl = {r.line: r.n_docs for r in boilerplate_lines(docs).collect()}
    assert bl == {"COOKIE BANNER": 3}  # within-doc repeat is NOT boilerplate

    out = {r.doc_id: r.text for r in remove_boilerplate_lines(docs).collect()}
    assert out[0] == "unique zero\n\nbody zero"  # empty line preserved
    assert out[1] == "unique one\nbody one"
    assert out[2] == "unique two\nbody two\nbody two"
    assert out[3] == ""  # all lines removed, doc kept


def test_normalize_text(spark):
    from graph_data_science_spark.pipeline.text import normalize_text

    docs = _docs(
        spark,
        [
            (0, "  hello\tworld \x01\x02ok  "),
            (1, "a\u00a0b\u2003c\u200bd"),  # nbsp, em space, zwsp
            (2, "l1  \r\n  l2\r\n\n\n\nl3"),
            (3, "cafe\u0301"),  # combining acute
        ],
    )
    out = {r.doc_id: r.text for r in normalize_text(docs).collect()}
    assert out[0] == "hello world ok"
    assert out[1] == "a b cd"  # spaces folded; zero-width removed outright
    assert out[2] == "l1\nl2\n\nl3"
    assert out[3] == "cafe\u0301"  # no unicode form requested

    nfc = {r.doc_id: r.text for r in normalize_text(docs, form="NFC").collect()}
    assert nfc[3] == "caf\u00e9"


def test_chunk_documents(spark):
    import pytest

    from graph_data_science_spark.pipeline.text import chunk_documents

    docs = _docs(
        spark,
        [(1, "a b c d e f g h i j"), (2, "x y"), (3, "")],
    )
    rows = sorted(
        chunk_documents(docs, 4, overlap=1).collect(),
        key=lambda r: (r.doc_id, r.chunk_idx),
    )
    got = [(r.doc_id, r.chunk_idx, r.chunk_text, r.n_tokens) for r in rows]
    assert got == [
        (1, 0, "a b c d", 4),
        (1, 1, "d e f g", 4),
        (1, 2, "g h i j", 4),
        (2, 0, "x y", 2),
    ]
    # every token covered; consecutive chunks share `overlap` tokens
    assert rows[0].chunk_text.split()[-1] == rows[1].chunk_text.split()[0]
    # no-overlap variant tiles exactly
    tiles = chunk_documents(docs.filter("doc_id = 1"), 5).collect()
    assert sorted(r.chunk_text for r in tiles) == ["a b c d e", "f g h i j"]
    with pytest.raises(ValueError):
        chunk_documents(docs, 4, overlap=4)
