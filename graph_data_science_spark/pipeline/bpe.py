"""Distributed BPE tokenizer: training + encoding over a
``documents(doc_id, text)`` table.

The scalable split mirrors how sentencepiece / HF-tokenizers train at
corpus scale:

1. **Word-type counting is the distributed part** — one
   ``groupBy(word).sum(count)`` pass over the corpus (map-side partial
   combine, so hot words never concentrate on one reducer). At 100 TB
   this is the only stage that touches every byte.
2. **The merge loop runs on the TYPE table, not the corpus** — after
   ``min_count`` pruning the (word, count) table is vocabulary-sized
   (Heaps' law: ~10^6-10^7 types even for web corpora once count>=2 is
   required), so classic BPE training (repeatedly merge the most
   frequent adjacent symbol pair, weighted by word count) is a
   driver-side loop over megabytes — the same design as
   sentencepiece's ``--input_sentence_size`` type-table trainer.
3. **Encoding is distributed again** — merge ranks broadcast in the UDF
   closure (a vocab of 50k merges is ~1 MB); ``mapInPandas`` applies
   the GPT-2-style greedy lowest-rank merge per word with a per-batch
   word→tokens memo, so each DISTINCT word in an Arrow batch is encoded
   once regardless of its frequency.

Determinism: merge selection ties break on (count desc, pair lexicog.
asc) so training is reproducible across runs and cluster sizes;
encoding is a pure function of (text, merges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import tokens_col


def word_counts(
    docs: DataFrame, *, min_count: int = 1, text_col: str = "text"
) -> DataFrame:
    """(word, count) over whitespace words — the distributed corpus pass
    of BPE training. ``min_count`` prunes the singleton tail (typos,
    URLs) that dominates type counts at web scale but contributes
    nothing to merge statistics."""
    wc = (
        docs.select(F.explode(tokens_col(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    if min_count > 1:
        wc = wc.filter(F.col("count") >= min_count)
    return wc


END_OF_WORD = "</w>"


def _merge_word(
    sym: tuple[str, ...], pair: tuple[str, str]
) -> tuple[str, ...]:
    out: list[str] = []
    i, n = 0, len(sym)
    ab = pair[0] + pair[1]
    while i < n:
        if i + 1 < n and sym[i] == pair[0] and sym[i + 1] == pair[1]:
            out.append(ab)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def train_merges(
    types: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE on a (word, count) type table: repeatedly merge the
    pair with the highest count-weighted frequency; ties break on pair
    lexicographic order (deterministic). Pure driver-side Python — the
    type table is vocabulary-sized by the time it gets here."""
    from collections import Counter

    syms: list[tuple[tuple[str, ...], int]] = [
        (tuple(w) + (END_OF_WORD,), c) for w, c in types if w
    ]
    pairs: Counter = Counter()
    for sym, c in syms:
        for p in zip(sym, sym[1:]):
            pairs[p] += c
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] <= 0:
            break
        merges.append(best)
        # incremental pair-count update: only words containing the pair
        # change, and only the counts around the merged positions move
        nxt: list[tuple[tuple[str, ...], int]] = []
        for sym, c in syms:
            if best[0] not in sym:
                nxt.append((sym, c))
                continue
            merged = _merge_word(sym, best)
            if merged != sym:
                for p in zip(sym, sym[1:]):
                    pairs[p] -= c
                for p in zip(merged, merged[1:]):
                    pairs[p] += c
            nxt.append((merged, c))
        syms = nxt
        pairs = +pairs  # drop zero/negative entries
    return merges


def bpe_train(
    docs: DataFrame,
    n_merges: int = 1000,
    *,
    min_count: int = 1,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Distributed word counting + driver-side merge training. Returns
    the ordered merge list (rank = position)."""
    types = [
        (r["word"], r["count"])
        for r in word_counts(
            docs, min_count=min_count, text_col=text_col
        ).collect()
    ]
    return train_merges(types, n_merges)


def encode_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> tuple[str, ...]:
    """GPT-2-style greedy BPE: repeatedly apply the lowest-rank merge
    present in the word until none applies."""
    sym = tuple(word) + (END_OF_WORD,)
    while len(sym) > 1:
        best, best_rank = None, None
        for p in zip(sym, sym[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = p, r
        if best is None:
            break
        sym = _merge_word(sym, best)
    return sym


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    with_tokens: bool = False,
) -> DataFrame:
    """(doc_id, n_bpe_tokens[, tokens]): apply the trained merges to
    every doc. One ``mapInPandas`` pass; the merge table rides the
    closure (broadcast to every worker once), and a per-batch memo
    encodes each distinct word once per Arrow batch."""
    from typing import Iterator

    import pandas as pd

    ranks = {p: i for i, p in enumerate(merges)}

    def enc(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, tuple[str, ...]] = {}

        def word_tokens(w: str) -> tuple[str, ...]:
            t = memo.get(w)
            if t is None:
                t = encode_word(w, ranks)
                memo[w] = t
            return t

        for pdf in it:
            ids, counts, toks = [], [], []
            for did, text in zip(pdf["doc_id"], pdf[text_col]):
                words = (text or "").strip().split()
                doc_toks: list[str] = []
                for w in words:
                    doc_toks.extend(word_tokens(w))
                ids.append(did)
                counts.append(len(doc_toks))
                if with_tokens:
                    toks.append(doc_toks)
            out = {"doc_id": ids, "n_bpe_tokens": counts}
            if with_tokens:
                out["tokens"] = toks
            yield pd.DataFrame(out)

    schema = "doc_id long, n_bpe_tokens long"
    if with_tokens:
        schema += ", tokens array<string>"
    return docs.select("doc_id", text_col).mapInPandas(enc, schema)


def decode_tokens(tokens: list[str]) -> str:
    """Inverse of encode: concatenate and split on the end-of-word
    marker. ``decode(encode(x))`` equals whitespace-normalized ``x``."""
    return "".join(tokens).replace(END_OF_WORD, " ").strip()
