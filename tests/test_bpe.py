"""Distributed BPE tokenizer: type-table training, greedy encoding,
roundtrip, determinism."""

from graph_data_science_spark.pipeline.bpe import (
    END_OF_WORD,
    bpe_encode,
    bpe_train,
    decode_tokens,
    encode_word,
    train_merges,
    word_counts,
)


def test_train_merges_classic_example():
    # the textbook corpus: low/lower/newest/widest weighted by counts
    types = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_merges(types, 4)
    # 'es' appears 9x (newest+widest) — top pair; then 'es'+'t' = 'est'
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", END_OF_WORD)


def test_encode_word_applies_lowest_rank_first():
    types = [("aab", 10), ("ab", 5)]
    merges = train_merges(types, 3)
    ranks = {p: i for i, p in enumerate(merges)}
    toks = encode_word("aab", ranks)
    assert "".join(toks).replace(END_OF_WORD, "") == "aab"


def test_word_counts_and_min_count(spark):
    docs = spark.createDataFrame(
        [(0, "a b a"), (1, "a c")], "doc_id long, text string"
    )
    wc = {r.word: r["count"] for r in word_counts(docs).collect()}
    assert wc == {"a": 3, "b": 1, "c": 1}
    wc2 = {
        r.word: r["count"]
        for r in word_counts(docs, min_count=2).collect()
    }
    assert wc2 == {"a": 3}


def test_bpe_roundtrip_and_counts(spark):
    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),
            (1, "the catalogue of cats"),
            (2, "  spaced   out\ttabs  "),
        ],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, 20)
    assert merges == bpe_train(docs, 20)  # deterministic
    out = {
        r.doc_id: r
        for r in bpe_encode(docs, merges, with_tokens=True).collect()
    }
    for did, text in [(0, "the cat sat on the mat"),
                      (1, "the catalogue of cats"),
                      (2, "spaced out tabs")]:
        r = out[did]
        assert decode_tokens(list(r.tokens)) == text
        assert r.n_bpe_tokens == len(r.tokens)
        n_words = len(text.split())
        assert n_words <= r.n_bpe_tokens <= len(text) + n_words
    # with enough merges frequent words collapse to single tokens
    big = bpe_train(docs, 200)
    enc0 = bpe_encode(docs, big, with_tokens=True).collect()
    toks0 = {r.doc_id: list(r.tokens) for r in enc0}
    assert "the" + END_OF_WORD in toks0[0]
