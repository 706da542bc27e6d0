"""Text analysis + deduplication over a ``documents(doc_id, text, ...)``
table.

Everything in the hot path is built-in ``pyspark.sql.functions`` (JVM,
whole-stage codegen); MinHash/SimHash signatures hash exploded shingles
JVM-side followed by ``groupBy().agg(min/bit-ops)`` — no Python at all.
Designed for 10^9-document scale: dedup joins are band-bucket-partitioned
(LSH), never all-pairs.

Base hash: the default is a 60-bit value parsed from ``md5`` — slower per
shingle than ``xxhash64`` but bit-identical in any engine that has md5
(the sf0.01 correctness gate recomputes full MinHash/SimHash in DuckDB and
value-hash-compares). Pass ``base_hash="xxhash64"`` to trade portability
for ~3× cheaper hashing on petabyte runs; every downstream op is
hash-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

TOKEN_SPLIT = r"\s+"


def tokens_col(text_col: str = "text"):
    return F.split(F.trim(F.col(text_col)), TOKEN_SPLIT)


def token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens) — whitespace tokenization."""
    return docs.select(
        "doc_id", F.size(tokens_col(text_col)).alias("n_tokens")
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, score): lexical-diversity quality = distinct/total tokens.

    A cheap, monotone proxy for boilerplate/spam detection (degenerate
    repeated-token docs score near 0)."""
    toks = tokens_col(text_col)
    return docs.select(
        "doc_id",
        F.round(
            F.size(F.array_distinct(toks)) / F.size(toks), 6
        ).alias("score"),
    )


def repetition_scores(
    docs: DataFrame,
    *,
    top_n: int = 2,
    dup_n: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style repetition quality signals, one row per doc:

    - ``dup_line_frac``: 1 − distinct/total over ``\\n``-split lines — the
      fraction of line slots occupied by repeats.
    - ``dup_line_char_frac``: characters inside lines that occur ≥ 2
      times (all occurrences) / total line characters.
    - ``top_ngram_char_frac`` (word ``top_n``-grams, with multiplicity):
      occurrences-of-most-frequent-gram × its token characters / total
      token characters, capped at 1.0 (overlapping occurrences can
      over-count on degenerate single-token docs).
    - ``dup_ngram_char_frac`` (word ``dup_n``-grams): token characters
      covered by grams occurring ≥ 2 times (counting every occurrence,
      overlap-insensitive proxy — can reach the 1.0 cap on degenerate
      docs) / total token characters.

    High values flag boilerplate/spam for corpus filtering (cf. the
    Gopher/MassiveText repetition filters). Pure JVM expressions, and
    the 100-TB plan shape matters: lines and both gram widths explode in
    ONE tagged pass, so the operator is a single parquet scan + a single
    hash-partition by doc_id — every downstream aggregation and join
    keys on doc_id (or a superset), so Spark elides their exchanges
    entirely (audited in PLANS.md; the naive 3-pipeline formulation cost
    4 scans / 6 exchanges of exploded rows). All four ratios are
    deterministic integer ratios — the sf0.01 gate recomputes them
    exactly in DuckDB.
    """
    toks = tokens_col(text_col)

    entry_t = "array<struct<tag:string,e:string,chars:int>>"

    def gram_entries(n: int, tag: str):
        return F.when(
            F.size("t") >= n,
            F.transform(
                F.sequence(F.lit(0), F.size("t") - n),
                lambda i: F.struct(
                    F.lit(tag).alias("tag"),
                    F.concat_ws(" ", F.slice("t", i + 1, n)).alias("e"),
                    (
                        F.length(F.concat_ws(" ", F.slice("t", i + 1, n)))
                        - (n - 1)
                    ).alias("chars"),
                ),
            ),
        ).otherwise(F.array().cast(entry_t))

    line_entries = F.transform(
        "lines",
        lambda l: F.struct(
            F.lit("L").alias("tag"),
            l.alias("e"),
            F.length(l).alias("chars"),
        ),
    )

    base = docs.select(
        "doc_id",
        F.split(F.col(text_col), "\n").alias("lines"),
        toks.alias("t"),
        F.length(F.concat_ws("", toks)).cast("double").alias("tchars"),
    ).repartition("doc_id")

    entries = base.select(
        "doc_id",
        "tchars",
        F.explode(
            F.concat(
                line_entries.cast(entry_t),
                gram_entries(top_n, "T"),
                gram_entries(dup_n, "D"),
            )
        ).alias("x"),
    ).select(
        "doc_id", "tchars", F.col("x.tag").alias("tag"),
        F.col("x.e").alias("e"), F.col("x.chars").alias("chars"),
    )
    counts = entries.groupBy("doc_id", "tag", "e").agg(
        F.count(F.lit(1)).alias("c"),
        F.max("chars").alias("chars"),  # functionally dependent on e
        F.max("tchars").alias("tchars"),
    )
    stats = counts.groupBy("doc_id", "tag").agg(
        F.max("tchars").alias("tchars"),
        F.sum("c").alias("n_tot"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.col("c") * F.col("chars")).alias("chars_all"),
        F.sum(
            F.when(F.col("c") >= 2, F.col("c") * F.col("chars"))
            .otherwise(F.lit(0))
        ).alias("chars_dup"),
        F.max(F.col("c") * F.col("chars")).alias("top_chars"),
    )

    def per_tag(tag: str, col: str):
        return F.max(F.when(F.col("tag") == tag, F.col(col)))

    z = F.lit(0.0)
    return (
        stats.groupBy("doc_id")
        .agg(
            F.max("tchars").alias("tchars"),
            per_tag("L", "n_tot").alias("n_lines"),
            per_tag("L", "n_distinct").alias("n_distinct"),
            per_tag("L", "chars_all").alias("line_chars"),
            per_tag("L", "chars_dup").alias("dup_line_chars"),
            per_tag("T", "top_chars").alias("t_top_chars"),
            per_tag("D", "chars_dup").alias("d_dup_chars"),
        )
        .select(
            "doc_id",
            F.round(
                1.0 - F.col("n_distinct") / F.col("n_lines"), 6
            ).alias("dup_line_frac"),
            F.round(
                F.when(
                    F.col("line_chars") > 0,
                    F.col("dup_line_chars") / F.col("line_chars"),
                ).otherwise(z),
                6,
            ).alias("dup_line_char_frac"),
            F.round(
                F.least(
                    F.lit(1.0),
                    F.when(
                        F.col("tchars") > 0,
                        F.coalesce(F.col("t_top_chars"), z)
                        / F.col("tchars"),
                    ).otherwise(z),
                ),
                6,
            ).alias("top_ngram_char_frac"),
            F.round(
                F.least(
                    F.lit(1.0),
                    F.when(
                        F.col("tchars") > 0,
                        F.coalesce(F.col("d_dup_chars"), z)
                        / F.col("tchars"),
                    ).otherwise(z),
                ),
                6,
            ).alias("dup_ngram_char_frac"),
        )
    )


def doc_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fingerprint): md5 of whitespace-normalized lowercase text —
    the exact-dup grouping key that is stable across engines."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return docs.select("doc_id", F.md5(norm).alias("fingerprint"))


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per distinct normalized text: (doc_id = min id, copies)."""
    fp = doc_fingerprint(docs, text_col)
    return (
        fp.groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("copies"),
        )
        .select("doc_id", "copies")
    )


def duplicated_spans(
    docs: DataFrame,
    window: int = 10,
    *,
    text_col: str = "text",
    base_hash: str = "md5",
    min_docs: int = 2,
) -> DataFrame:
    """(doc_id, pos, span_hash, n_docs): every length-``window`` token
    span (0-based start position) whose hash occurs in ≥ ``min_docs``
    distinct documents — exact-substring duplicate detection at token
    granularity (the Lee-et-al.-2021 "Deduplicating Training Data"
    formulation, windowed: a repeated substring of length ≥ window shows
    up as a run of duplicated windows, so downstream removal can cut the
    exact repeated span, not the whole document).

    Scale shape: span text never leaves the scan task — each document's
    windows are hashed in the same JVM projection that slides them, so
    only (doc_id, pos, hash) rows (~24 B) ever shuffle, and they shuffle
    exactly ONCE (partitioned by span_hash); the exact distinct-document
    count comes from two window functions over that one partitioning
    (max-of-dense_rank ≡ COUNT(DISTINCT doc_id) OVER span_hash, which
    Spark lacks natively). The groupBy+rejoin alternative scans the
    corpus and computes every window hash twice — at 100 TB the md5 over
    every token window IS the dominant cost, so one-pass wins.
    """
    from pyspark.sql import Window

    toks = tokens_col(text_col)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - window),
        lambda i: _base_hash(
            F.concat_ws(" ", F.slice(toks, i + 1, window)), base_hash
        ),
    )
    spans = docs.filter(F.size(toks) >= window).select(
        "doc_id", F.posexplode(grams).alias("pos", "span_hash")
    )
    w_ord = Window.partitionBy("span_hash").orderBy("doc_id")
    w_all = Window.partitionBy("span_hash")
    return (
        spans.withColumn("_dr", F.dense_rank().over(w_ord))
        .withColumn("n_docs", F.max("_dr").over(w_all).cast("long"))
        .filter(F.col("n_docs") >= min_docs)
        .select(
            "doc_id", F.col("pos").cast("long").alias("pos"),
            "span_hash", "n_docs",
        )
    )


def trim_duplicated_spans(
    docs: DataFrame,
    window: int = 10,
    *,
    text_col: str = "text",
    base_hash: str = "md5",
    min_docs: int = 2,
) -> DataFrame:
    """(doc_id, text): documents rebuilt with duplicated spans CUT OUT —
    the removal step of exact-substring dedup (Lee et al. 2021: drop the
    repeated span, keep the document). For every cross-corpus duplicated
    window, the corpus-wide first occurrence (min (doc_id, pos)) is the
    canonical copy and stays; every other occurrence's token range is
    removed. Output text is whitespace-normalized (single spaces) — the
    tokens are re-joined after cutting.

    Scale shape: extends the one-shuffle `duplicated_spans` plan with a
    same-partitioning canonical-pick window (no extra shuffle), one
    (doc_id, token_index) explode of only the duplicated spans (tiny
    vs the corpus), and one broadcast-or-shuffle join back to the docs
    to rebuild — the full text shuffles at most once.
    """
    from pyspark.sql import Window

    dup = duplicated_spans(
        docs, window, text_col=text_col, base_hash=base_hash,
        min_docs=min_docs,
    )
    w_hash = Window.partitionBy("span_hash")
    canon = F.min(F.struct("doc_id", "pos")).over(w_hash)
    noncanon = (
        dup.withColumn("_c", canon)
        .filter(
            ~((F.col("_c.doc_id") == F.col("doc_id"))
              & (F.col("_c.pos") == F.col("pos")))
        )
    )
    cut = (
        noncanon.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + window - 1)
            ).alias("tok_i"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("tok_i").alias("_cut"))
    )
    toks = tokens_col(text_col)
    return (
        docs.join(cut, "doc_id", "left")
        .select(
            "doc_id",
            F.concat_ws(
                " ",
                F.filter(
                    toks,
                    lambda t, i: F.coalesce(
                        ~F.array_contains("_cut", i.cast("long")),
                        F.lit(True),
                    ),
                ),
            ).alias("text"),
        )
    )


def duplicated_span_stats(
    docs: DataFrame,
    window: int = 10,
    *,
    text_col: str = "text",
    base_hash: str = "md5",
    min_docs: int = 2,
) -> DataFrame:
    """(doc_id, n_spans, n_dup_spans, dup_frac): per-document fraction of
    token windows that also occur in ≥ ``min_docs`` documents — the
    rank-and-filter form of exact-substring dedup (drop or trim documents
    above a duplicated-window fraction threshold)."""
    dup = duplicated_spans(
        docs, window, text_col=text_col, base_hash=base_hash,
        min_docs=min_docs,
    )
    per_doc = dup.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_spans")
    )
    toks = tokens_col(text_col)
    base = docs.select(
        "doc_id",
        F.greatest(
            F.size(toks) - window + 1, F.lit(0)
        ).cast("long").alias("n_spans"),
    )
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_spans",
            F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
            F.round(
                F.coalesce("n_dup_spans", F.lit(0))
                / F.greatest("n_spans", F.lit(1)),
                6,
            ).alias("dup_frac"),
        )
    )


def shingles(docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """(doc_id, shingle): word n-grams via a size-n sliding window
    (transform over token indices — pure JVM). Documents shorter than n
    tokens produce NO shingles (they can never clear a Jaccard threshold
    against a real n-gram set, and emitting a whole-text fallback here
    would create candidate pairs the SQL oracle never sees)."""
    toks = tokens_col(text_col)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    # repartition the RAW docs by doc_id before exploding: the distinct
    # on (doc_id, shingle) and every per-doc aggregation downstream
    # (minhash sigs, jaccard sizes) then reuse this partitioning — the
    # alternative shuffles the exploded shingle rows (~token-count × doc
    # bytes) at every step
    return (
        docs.filter(F.size(toks) >= n)
        .repartition("doc_id")
        .select("doc_id", F.explode(grams).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    *,
    n: int = 3,
    threshold: float = 0.2,
    text_col: str = "text",
) -> DataFrame:
    """(doc1, doc2, jaccard) for pairs sharing >= 1 n-gram with jaccard >=
    threshold. Shingle-join formulation: cost ~ sum over shingles of
    (docs-per-shingle)^2 — at scale, gate with MinHash/LSH first."""
    sh = shingles(docs, n, text_col)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("doc1"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc2"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc1") < F.col("doc2"))
        .groupBy("doc1", "doc2")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    s1 = sizes.select(F.col("doc_id").alias("doc1"), F.col("sz").alias("sz1"))
    s2 = sizes.select(F.col("doc_id").alias("doc2"), F.col("sz").alias("sz2"))
    raw = F.col("common") / (F.col("sz1") + F.col("sz2") - F.col("common"))
    # threshold on the RAW ratio (the oracle filters unrounded too);
    # round only for output
    return (
        inter.join(s1, "doc1")
        .join(s2, "doc2")
        .filter(raw >= threshold)
        .select(
            "doc1",
            "doc2",
            F.round(raw, 6).alias("jaccard"),
        )
    )


def ngram_containment_pairs(
    docs: DataFrame,
    *,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """(doc1, doc2, containment) for ordered pairs where containment =
    |shingles(doc1) ∩ shingles(doc2)| / |shingles(doc1)| ≥ threshold —
    the ASYMMETRIC near-dup measure (doc1 is mostly contained in doc2:
    quotes, excerpts, boilerplate-wrapped copies — cases Jaccard misses
    when |doc2| ≫ |doc1|). Broder's containment, same shingle-join shape
    as :func:`ngram_jaccard_pairs`; gate with MinHash/LSH first at scale.
    """
    sh = shingles(docs, n, text_col)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("doc1"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc2"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc1") != F.col("doc2"))
        .groupBy("doc1", "doc2")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    s1 = sizes.select(F.col("doc_id").alias("doc1"), F.col("sz").alias("sz1"))
    # threshold on the RAW ratio (matching any SQL re-derivation); round
    # only for output — round-then-filter would admit pairs just under
    # the threshold that an unrounded filter excludes
    return (
        inter.join(s1, "doc1")
        .filter((F.col("common") / F.col("sz1")) >= threshold)
        .select(
            "doc1",
            "doc2",
            F.round(F.col("common") / F.col("sz1"), 6).alias("containment"),
        )
    )


# BPE-ish pre-tokenizer: the GPT-2 pre-split regex minus its lookahead
# clause (RE2, which the DuckDB oracle uses, has no lookahead): common
# English contractions, then space-prefixed letter runs / digit runs /
# punctuation runs. Counts within ~1-2% of a real BPE pre-tokenizer on
# ASCII text and is a pure JVM/codegen expression at any scale.
# Every class is EXPLICIT ASCII — \w/\d/\s shorthands are banned because
# they diverge across engines (Java \s includes \x0B, RE2's does not;
# Python \w is Unicode): this exact string means the same thing in Java
# regex, RE2, and Python re. \x0B (vertical tab) is spelled out — Java's
# \v is "vertical whitespace", a different set than RE2's \v.
BPE_SPLIT_RE = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?[A-Za-z]+| ?[0-9]+| ?[^ \t\n\r\f\x0BA-Za-z0-9_]+"
)


def token_count_bpe(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens) — BPE-style pre-tokenization count (GPT-2 split
    classes). The whitespace count underestimates LLM token budgets on
    punctuation-dense text; this is the budget-planning variant."""
    return docs.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_SPLIT_RE), 0)
        ).cast("long").alias("n_tokens"),
    )


# --- MinHash + LSH -------------------------------------------------------
# 2^31-1 keeps a*h + b < 2^62: no long overflow under ANSI mode
MERSENNE = (1 << 31) - 1


def _base_hash(col, base_hash: str):
    """Engine-portable 60-bit hash (top 15 hex digits of md5 — identical
    in Spark and DuckDB, both JVM/codegen-side), or xxhash64 (Spark-only,
    cheaper) when portability doesn't matter."""
    if base_hash == "xxhash64":
        return F.xxhash64(col)
    if base_hash != "md5":
        raise ValueError(f"unknown base_hash {base_hash!r}")
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def minhash_coefficients(
    num_perm: int = 32, seed: int = 17
) -> list[tuple[int, int]]:
    """The (a_i, b_i) permutation coefficients — exposed so an external
    oracle can regenerate the exact same permutations."""
    import random

    rnd = random.Random(seed)
    return [
        (rnd.randrange(1, MERSENNE), rnd.randrange(0, MERSENNE))
        for _ in range(num_perm)
    ]


def minhash_signatures(
    docs: DataFrame,
    *,
    num_perm: int = 32,
    n: int = 3,
    seed: int = 17,
    text_col: str = "text",
    base_hash: str = "md5",
) -> DataFrame:
    """(doc_id, sig array<long>): per-permutation min of
    ``(a_i * hash(shingle) + b_i) mod 2^31-1``. All-JVM: explode
    shingles once, one groupBy with ``min(...)`` per permutation (map-side
    partial agg keeps the shuffle tiny)."""
    coeffs = minhash_coefficients(num_perm, seed)
    sh = shingles(docs, n, text_col)
    h = sh.withColumn(
        "h", F.pmod(_base_hash(F.col("shingle"), base_hash), F.lit(MERSENNE))
    )
    aggs = [
        F.min(
            F.pmod(
                (F.col("h") * F.lit(a) + F.lit(b)) % F.lit(MERSENNE),
                F.lit(MERSENNE),
            )
        ).alias(f"m{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    sigs = h.groupBy("doc_id").agg(*aggs)
    return sigs.select(
        "doc_id", F.array(*[f"m{i}" for i in range(num_perm)]).alias("sig")
    )


def minhash_lsh_candidates(
    sigs: DataFrame, *, bands: int = 8, max_bucket_size: int | None = 10_000
) -> DataFrame:
    """(doc1, doc2, bands_matched): banded LSH — docs sharing any band
    bucket. The join key is (band, bucket-hash): candidate generation is a
    hash-partitioned equi-join, never a cross join.

    ``max_bucket_size``: a (band, bucket) with k members expands to k²
    pairs — one boilerplate bucket (license headers, empty docs) of 10⁶
    docs would alone emit 10¹² rows. Buckets above the cap are dropped
    (their members are boilerplate-identical in that band and near-
    certainly pair up through their other, more selective bands; exact
    duplicates belong to exact_dedup anyway). None disables the guard."""
    rows_per_band = F.floor(F.size("sig") / bands).cast("int")
    # bucket = portable 60-bit hash of the band's signature slice (joined
    # as a string): same join-key cardinality as a murmur hash, but any
    # engine can recompute it — the sf0.01 gate's DuckDB oracle does
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: _base_hash(
                    F.concat_ws(
                        "|",
                        F.transform(
                            F.slice(
                                F.col("sig"),
                                b * rows_per_band + 1,
                                rows_per_band,
                            ),
                            lambda x: x.cast("string"),
                        ),
                    ),
                    "md5",
                ),
            )
        ).alias("band", "bucket"),
    )
    if max_bucket_size is not None:
        keep = (
            banded.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") <= max_bucket_size)
            .select("band", "bucket")
        )
        banded = banded.join(keep, ["band", "bucket"])
    a = banded.select(F.col("doc_id").alias("doc1"), "band", "bucket")
    b = banded.select(F.col("doc_id").alias("doc2"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc1") < F.col("doc2"))
        .groupBy("doc1", "doc2")
        .agg(F.count(F.lit(1)).alias("bands_matched"))
    )


def minhash_dedup(
    docs: DataFrame,
    *,
    num_perm: int = 32,
    bands: int = 8,
    n: int = 3,
    min_jaccard_est: float = 0.5,
    text_col: str = "text",
    base_hash: str = "md5",
) -> DataFrame:
    """(doc1, doc2, jaccard_est): LSH candidates refined by the signature
    agreement rate (the unbiased Jaccard estimator)."""
    sigs = minhash_signatures(
        docs, num_perm=num_perm, n=n, text_col=text_col, base_hash=base_hash
    ).cache()
    cands = minhash_lsh_candidates(sigs, bands=bands)
    s1 = sigs.select(F.col("doc_id").alias("doc1"), F.col("sig").alias("sig1"))
    s2 = sigs.select(F.col("doc_id").alias("doc2"), F.col("sig").alias("sig2"))
    est = (
        cands.join(s1, "doc1")
        .join(s2, "doc2")
        .select(
            "doc1",
            "doc2",
            (
                F.size(
                    F.filter(
                        F.zip_with("sig1", "sig2", lambda x, y: x == y),
                        lambda v: v,
                    )
                )
                / F.size("sig1")
            ).alias("jaccard_est"),
        )
    )
    return est.filter(F.col("jaccard_est") >= min_jaccard_est)


def simhash_bits(base_hash: str = "md5") -> int:
    """Signature width: the md5-derived portable hash carries 60 usable
    bits; xxhash64 the full 64."""
    return 60 if base_hash == "md5" else 64


def simhash(
    docs: DataFrame, text_col: str = "text", base_hash: str = "md5"
) -> DataFrame:
    """(doc_id, simhash long): SimHash over token hash values — per-bit
    majority vote, computed as one conditional sum per bit in one groupBy
    (60 bits for the portable md5 hash, 64 for xxhash64)."""
    nbits = simhash_bits(base_hash)
    # raw docs shuffle once by doc_id; the 60/64-way vote aggregation
    # then runs exchange-free on exploded tokens (see shingles())
    tok = docs.repartition("doc_id").select(
        "doc_id", F.explode(tokens_col(text_col)).alias("tok")
    ).withColumn("h", _base_hash(F.col("tok"), base_hash))
    aggs = [
        F.sum(
            F.when(
                F.shiftrightunsigned("h", i).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(nbits)
    ]
    votes = tok.groupBy("doc_id").agg(*aggs)
    out = F.lit(0).cast("long")
    for i in range(nbits):
        bit = (1 << i) if i < 63 else -(1 << 63)  # sign bit in two's complement
        out = out + F.when(F.col(f"b{i}") > 0, F.lit(bit)).otherwise(
            F.lit(0)
        ).cast("long")
    return votes.select("doc_id", out.alias("simhash"))


def simhash_near_dups(
    sim: DataFrame, *, max_hamming: int = 3,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """(doc1, doc2, hamming): candidate pairs by 16-bit block (pigeonhole:
    any pair within hamming distance 3 shares at least one of 4 blocks),
    verified by popcount. Block-join keeps this linear-ish at scale.
    ``max_bucket_size`` guards the k² blow-up of a boilerplate block
    value (see minhash_lsh_candidates). Works unchanged for 60-bit md5
    signatures: the four 16-bit blocks still partition the used bits
    (the top block simply carries 12 effective bits)."""
    blocks = sim.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("simhash", 16 * i)
                    .bitwiseAND(F.lit(0xFFFF))
                    .alias(f"blk{i}")
                    for i in range(4)
                ]
            )
        ).alias("block_idx", "block_val"),
    )
    if max_bucket_size is not None:
        keep = (
            blocks.groupBy("block_idx", "block_val")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") <= max_bucket_size)
            .select("block_idx", "block_val")
        )
        blocks = blocks.join(keep, ["block_idx", "block_val"])
    a = blocks.select(
        F.col("doc_id").alias("doc1"),
        F.col("simhash").alias("h1"),
        "block_idx",
        "block_val",
    )
    b = blocks.select(
        F.col("doc_id").alias("doc2"),
        F.col("simhash").alias("h2"),
        "block_idx",
        "block_val",
    )
    cands = (
        a.join(b, ["block_idx", "block_val"])
        .filter(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2", "h1", "h2")
        .distinct()
    )
    hamming = F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
    return (
        cands.select("doc1", "doc2", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


# --- language id (heuristic) --------------------------------------------
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "das"],
    "es": ["el", "la", "de", "que", "es"],
    "fr": ["le", "la", "et", "est", "les"],
}


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang): argmax of stopword-marker hit counts, tie →
    lexicographically smallest lang (deterministic). N-gram-free heuristic;
    counts computed with one pass of array_intersect-free token explode."""
    toks = docs.select(
        "doc_id", F.explode(tokens_col(text_col)).alias("tok")
    )
    scores = None
    for lang, markers in sorted(_LANG_MARKERS.items()):
        s = toks.filter(F.col("tok").isin(markers)).groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("hits")
        ).withColumn("lang", F.lit(lang))
        scores = s if scores is None else scores.unionByName(s)
    # argmax with tie -> smallest lang (two-step; string negation doesn't
    # fit the struct-max trick used elsewhere)
    mx = scores.groupBy("doc_id").agg(F.max("hits").alias("mx"))
    pred = (
        scores.join(mx, "doc_id")
        .filter(F.col("hits") == F.col("mx"))
        .groupBy("doc_id")
        .agg(F.min("lang").alias("pred_lang"))
    )
    return docs.select("doc_id").join(pred, "doc_id", "left").select(
        "doc_id", F.coalesce("pred_lang", F.lit("und")).alias("pred_lang")
    )


def dedup_clusters(
    pairs: DataFrame,
    docs: DataFrame | None = None,
    *,
    doc_col: str = "doc_id",
    pair_cols: tuple[str, str] = ("doc1", "doc2"),
) -> DataFrame:
    """(doc_id, cluster_id, keep): duplicate clusters = connected
    components over near-duplicate candidate pairs (the standard
    web-corpus dedup shape: LSH/ngram pairs -> transitive closure ->
    one canonical doc per cluster). ``cluster_id`` is the smallest
    doc_id in the component; ``keep`` marks that canonical doc. Docs in
    no pair become singleton clusters when ``docs`` is given.

    Scale path: reuses the WCC engine (pointer-jumping min-label, O(log
    n) rounds) over the pair graph — the pair table is the output of a
    banded-LSH join, so the component step inherits its scalability;
    the final docs join is a broadcast when the pair-touched id set is
    small (typical: dup rate << corpus size)."""
    from ..graph import from_edge_df
    from ..operators.wcc import wcc as _wcc

    e = pairs.select(
        F.col(pair_cols[0]).alias("src"), F.col(pair_cols[1]).alias("dst")
    )
    g = from_edge_df(e)
    comp = _wcc(g)
    # internal ids are order-isomorphic to original ids, so the min
    # internal id of a component maps to the min original doc_id
    ids = g.vertices.select(
        F.col("internal_id").alias("__i"),
        F.col("original_id").cast("long").alias("__o"),
    )
    clustered = (
        comp.join(ids, comp.internal_id == ids.__i)
        .select(F.col("__o").alias(doc_col), "component")
        .join(
            ids.select(
                F.col("__i").alias("component"),
                F.col("__o").alias("cluster_id"),
            ),
            "component",
        )
        .select(doc_col, "cluster_id")
    )
    if docs is not None:
        clustered = (
            docs.select(F.col(doc_col).cast("long").alias(doc_col))
            .join(clustered, doc_col, "left")
            .select(
                doc_col,
                F.coalesce("cluster_id", F.col(doc_col)).alias("cluster_id"),
            )
        )
    return clustered.select(
        doc_col,
        "cluster_id",
        (F.col(doc_col) == F.col("cluster_id")).alias("keep"),
    )


# --- tf-idf keywords / heuristic quality gates / unigram LM --------------

# Small fixed English stopword list for the heuristic filters. Kept tiny
# and frozen so the oracle SQL can inline it verbatim.
STOPWORDS_EN = (
    "the", "a", "an", "of", "and", "to", "in", "is", "that", "it",
    "for", "on", "with", "as", "are",
)


def tfidf_topk(
    docs: DataFrame, k: int = 5, *, min_df: int = 1, text_col: str = "text"
) -> DataFrame:
    """(doc_id, term, tf, tfidf, kw_rank): top-``k`` keywords per doc by
    smoothed tf-idf (sklearn formulation: ``idf = ln((1+N)/(1+df)) + 1``),
    ties broken by term ascending — fully deterministic.

    Scale: the document-frequency table is vocabulary-sized (<< corpus),
    broadcast into the scoring join; the top-k window partitions by
    doc_id so there is no global sort — one tokens shuffle, one
    per-doc-partition window."""
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id", F.explode(tokens_col(text_col)).alias("term")
    )
    # tf feeds both the df aggregation and the scoring join — cache so
    # the token explode+shuffle runs once, not twice (at corpus scale
    # you'd persist this to disk instead)
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    ).cache()
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if min_df > 1:
        df_tbl = df_tbl.filter(F.col("df") >= min_df)
    n_docs = docs.agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (F.log((1 + F.col("__n")) / (1 + F.col("df"))) + 1),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("kw_rank", F.row_number().over(w))
        .filter(F.col("kw_rank") <= k)
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            "tfidf",
            F.col("kw_rank").cast("long").alias("kw_rank"),
        )
    )


def heuristic_filters(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """C4/Gopher-style per-document heuristic quality gates (Raffel et
    al. 2020 §2.2; Rae et al. 2021 A1.1) — one row per doc with the raw
    signals plus the combined ``keep`` verdict:

    - ``n_lines`` / ``n_sentences`` (sentences = non-empty ``[.!?]+``
      splits), ``mean_words_per_line``
    - ``mean_word_len`` — Gopher keeps 3..10
    - ``frac_lines_end_punct`` — C4 keeps lines ending in terminal
      punctuation
    - ``stopword_frac`` / ``frac_alpha_tokens`` — Gopher symbol/word
      ratio gates
    - ``has_lorem_ipsum`` / ``has_brace`` — C4 page-level rejects
    - ``keep`` = 50 <= n_tokens <= 100000 AND 3 <= mean_word_len <= 10
      AND frac_alpha_tokens >= 0.8 AND NOT lorem AND NOT brace

    Zero-shuffle: every signal is a whole-stage-codegen projection over
    the text column (higher-order array functions, no UDF, no explode)."""
    toks = tokens_col(text_col)
    lines = F.split(F.col(text_col), "\n")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    n_tokens = F.size(toks)
    tok_chars = F.length(F.array_join(toks, ""))
    mean_word_len = F.round(tok_chars / n_tokens, 6)
    n_sentences = F.size(
        F.filter(
            F.split(F.col(text_col), r"[.!?]+"),
            lambda s: F.trim(s) != F.lit(""),
        )
    )
    frac_alpha = F.round(
        F.size(F.filter(toks, lambda t: t.rlike("^[A-Za-z]+$")))
        / n_tokens,
        6,
    )
    has_lorem = F.instr(F.lower(F.col(text_col)), "lorem ipsum") > 0
    has_brace = F.instr(F.col(text_col), "{") > 0
    return docs.select(
        "doc_id",
        F.size(lines).cast("long").alias("n_lines"),
        n_sentences.cast("long").alias("n_sentences"),
        F.round(n_tokens / F.size(lines), 6).alias("mean_words_per_line"),
        mean_word_len.alias("mean_word_len"),
        F.round(
            F.size(
                F.filter(
                    lines, lambda ln: F.rtrim(ln).rlike("[.!?\"']$")
                )
            )
            / F.size(lines),
            6,
        ).alias("frac_lines_end_punct"),
        F.round(
            F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
            / n_tokens,
            6,
        ).alias("stopword_frac"),
        frac_alpha.alias("frac_alpha_tokens"),
        has_lorem.alias("has_lorem_ipsum"),
        has_brace.alias("has_brace"),
        (
            (n_tokens >= 50)
            & (n_tokens <= 100000)
            & (mean_word_len >= 3.0)
            & (mean_word_len <= 10.0)
            & (frac_alpha >= 0.8)
            & ~has_lorem
            & ~has_brace
        ).alias("keep"),
    )


def unigram_logprob(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """(doc_id, avg_logprob, n_tokens): corpus-unigram LM score — the
    mean ``ln P(token)`` of each doc under the corpus's own unigram
    distribution. The cheap stand-in for KenLM perplexity filtering:
    rare-token soup / OCR garbage scores far below fluent text.

    Scale: everything past the first shuffle runs at (doc, term)
    granularity, never per token — the mean is tf-weighted, which is
    algebraically identical to the per-token mean. The vocabulary table
    is tiny relative to the corpus (Heaps' law) and is broadcast into
    the scoring join; its own aggregation gets map-side partial combine,
    so hot terms ("the") never concentrate rows on one reducer."""
    toks = docs.select(
        "doc_id", F.explode(tokens_col(text_col)).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("__tf")
    ).cache()
    vocab = tf.groupBy("term").agg(F.sum("__tf").alias("__c"))
    total = tf.agg(F.sum("__tf").alias("__t"))
    return (
        tf.join(F.broadcast(vocab), "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(
                    F.col("__tf") * F.log(F.col("__c") / F.col("__t"))
                )
                / F.sum("__tf"),
                6,
            ).alias("avg_logprob"),
            F.sum("__tf").cast("long").alias("n_tokens"),
        )
    )


def corpus_stats(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """One-row corpus profile: doc/token/char totals, vocabulary size,
    type-token ratio, and exact token-length quantiles (p50/p90/p99/max)
    — the numbers a data-mixture plan starts from.

    Scale: two aggregation passes (per-doc token counts; global distinct
    terms via groupBy — map-side combined), then one exact percentile
    over the n_docs-sized count column. No per-token state crosses a
    shuffle except the vocab keys."""
    toks = tokens_col(text_col)
    per_doc = docs.select(
        F.size(toks).alias("__n"),
        F.length(F.col(text_col)).alias("__chars"),
    )
    vocab_n = (
        docs.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.count(F.lit(1)).alias("__v"),
            F.sum("c").alias("__total"),
        )
    )
    agg = per_doc.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__n").cast("long").alias("total_tokens"),
        F.sum("__chars").cast("long").alias("total_chars"),
        F.percentile("__n", F.lit(0.5)).alias("p50_tokens"),
        F.percentile("__n", F.lit(0.9)).alias("p90_tokens"),
        F.percentile("__n", F.lit(0.99)).alias("p99_tokens"),
        F.max("__n").cast("long").alias("max_tokens"),
    )
    return (
        agg.crossJoin(F.broadcast(vocab_n))
        .select(
            "n_docs",
            "total_tokens",
            "total_chars",
            F.col("__v").cast("long").alias("vocab_size"),
            F.round(F.col("__v") / F.col("__total"), 6).alias(
                "type_token_ratio"
            ),
            F.round("p50_tokens", 6).alias("p50_tokens"),
            F.round("p90_tokens", 6).alias("p90_tokens"),
            F.round("p99_tokens", 6).alias("p99_tokens"),
            "max_tokens",
        )
    )


def corpus_stats_approx(
    docs: DataFrame,
    *,
    text_col: str = "text",
    rsd: float = 0.05,
    quantile_accuracy: int = 10000,
) -> DataFrame:
    """Sketch-based :func:`corpus_stats` — the 100-TB profiling path.

    Vocabulary size comes from HyperLogLog++ (``approx_count_distinct``,
    relative standard deviation ``rsd``) and token-length quantiles from
    the Greenwald-Khanna sketch (``percentile_approx``), so NO term and
    no per-doc count ever crosses a shuffle un-sketched: each task emits
    a constant-size partial sketch and one merge produces the row. The
    exact version's vocabulary groupBy shuffles every distinct term —
    ~10^9 keys on a web corpus; this one shuffles a few KB per task.
    Totals (docs/tokens/chars) stay exact — sums are already one-pass.
    """
    toks = tokens_col(text_col)
    per_doc = docs.select(
        F.size(toks).alias("__n"),
        F.length(F.col(text_col)).alias("__chars"),
    )
    acc = F.lit(int(quantile_accuracy))
    agg = per_doc.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__n").cast("long").alias("total_tokens"),
        F.sum("__chars").cast("long").alias("total_chars"),
        F.percentile_approx("__n", F.lit(0.5), acc)
        .cast("long")
        .alias("p50_tokens"),
        F.percentile_approx("__n", F.lit(0.9), acc)
        .cast("long")
        .alias("p90_tokens"),
        F.percentile_approx("__n", F.lit(0.99), acc)
        .cast("long")
        .alias("p99_tokens"),
        F.min("__n").cast("long").alias("min_tokens"),
        F.max("__n").cast("long").alias("max_tokens"),
    )
    hll = docs.select(F.explode(toks).alias("term")).agg(
        F.approx_count_distinct("term", float(rsd))
        .cast("long")
        .alias("vocab_approx")
    )
    return agg.crossJoin(F.broadcast(hll)).select(
        "n_docs",
        "total_tokens",
        "total_chars",
        "vocab_approx",
        "p50_tokens",
        "p90_tokens",
        "p99_tokens",
        "min_tokens",
        "max_tokens",
    )


def boilerplate_lines(
    docs: DataFrame,
    *,
    text_col: str = "text",
    min_docs: int = 2,
) -> DataFrame:
    """(line, n_docs): exact line texts that occur in >= ``min_docs``
    DISTINCT documents — cookie banners, nav bars, license headers: the
    cross-document boilerplate that line-level dedup (CCNet / RefinedWeb
    style) removes. Whitespace-only lines are ignored.

    Scale: one explode + one shuffle keyed by the line text with the
    same max-of-dense_rank trick as :func:`duplicated_spans` — per-line
    rows cross the wire once; no groupBy-then-rejoin double pass."""
    lines = docs.select(
        "doc_id",
        F.explode(F.split(F.col(text_col), "\n")).alias("line"),
    ).filter(F.trim("line") != "")
    w_ord = Window.partitionBy("line").orderBy("doc_id")
    w_all = Window.partitionBy("line")
    return (
        lines.withColumn("_dr", F.dense_rank().over(w_ord))
        .withColumn("_rn", F.row_number().over(w_ord))
        .withColumn("n_docs", F.max("_dr").over(w_all).cast("long"))
        .filter((F.col("n_docs") >= min_docs) & (F.col("_rn") == 1))
        .select("line", "n_docs")
    )


def remove_boilerplate_lines(
    docs: DataFrame,
    *,
    text_col: str = "text",
    min_docs: int = 2,
) -> DataFrame:
    """(doc_id, text): documents rebuilt with cross-document boilerplate
    lines removed — EVERY occurrence of a line that appears in >=
    ``min_docs`` distinct documents is dropped (boilerplate carries no
    training signal; unlike span dedup there is no canonical copy to
    keep). Line order is preserved; whitespace-only lines survive (they
    are formatting, not boilerplate).

    Scale: posexplode -> one line-keyed shuffle to tag boilerplate
    (window, not groupBy+rejoin) -> one doc_id-keyed shuffle to rebuild.
    The full text crosses the wire twice as lines — at 100 TB gate with
    a broadcast of :func:`boilerplate_lines` instead when the
    boilerplate set is small."""
    lines = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    w_ord = Window.partitionBy("line").orderBy("doc_id")
    w_all = Window.partitionBy("line")
    tagged = (
        lines.withColumn(
            "_dr",
            F.when(F.trim("line") == "", F.lit(1)).otherwise(
                F.dense_rank().over(w_ord)
            ),
        )
        .withColumn("_nd", F.max("_dr").over(w_all))
        .filter((F.trim(F.col("line")) == "") | (F.col("_nd") < min_docs))
    )
    rebuilt = (
        tagged.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias(text_col)
        )
    )
    return docs.select("doc_id").join(rebuilt, "doc_id", "left").select(
        "doc_id", F.coalesce(F.col(text_col), F.lit("")).alias(text_col)
    )


# characters normalize_text strips outright: C0 controls except \t \n \r,
# DEL, C1 controls, zero-widths, BOM, soft hyphen (all literal chars, so
# the same pattern string is valid Java regex AND RE2 — no escape-dialect
# divergence between engines)
_STRIP_CHARS = (
    "".join(chr(c) for c in range(0x00, 0x09))
    + "\x0b\x0c"
    + "".join(chr(c) for c in range(0x0E, 0x20))
    + "\x7f"
    + "".join(chr(c) for c in range(0x80, 0xA0))
    + "​‌‍⁠﻿­"
)
# unicode space variants folded to ASCII space
_SPACE_CHARS = (
    "  "
    + "".join(chr(c) for c in range(0x2000, 0x200B))
    + "  　"
)


def normalize_text(
    docs: DataFrame,
    *,
    text_col: str = "text",
    form: str | None = None,
) -> DataFrame:
    """(doc_id, text): curation-standard text normalization —

    1. optional Unicode normalization (``form`` = "NFC"/"NFKC"/...,
       applied via an Arrow-vectorized batch; both DuckDB's
       ``nfc_normalize`` and Python's ``unicodedata`` implement UAX#15,
       so even this step is externally replayable),
    2. strip control characters (C0 except tab/newline, DEL, C1),
       zero-width characters, BOM, soft hyphens,
    3. fold CRLF/CR to LF and Unicode space variants to ASCII space,
    4. collapse space/tab runs to one space, trim spaces around
       newlines, collapse 3+ newlines to a paragraph break, trim.

    Steps 2-4 are a pure JVM regexp_replace chain (zero shuffle,
    codegen); patterns contain only literal characters, so the identical
    strings run under Java regex and RE2."""
    t = F.col(text_col)
    if form is not None:
        import unicodedata

        from pyspark.sql.functions import pandas_udf

        def _norm_series(s):  # pd.Series -> pd.Series (Arrow batches)
            return s.map(
                lambda x: None
                if x is None
                else unicodedata.normalize(form, x)
            )

        _norm_series.__annotations__ = {}
        t = pandas_udf(_norm_series, "string")(t)
    t = F.regexp_replace(t, f"[{_STRIP_CHARS}]", "")
    t = F.regexp_replace(t, "\r\n|\r", "\n")
    t = F.regexp_replace(t, f"[{_SPACE_CHARS}]", " ")
    t = F.regexp_replace(t, "[ \t]+", " ")
    t = F.regexp_replace(t, " *\n *", "\n")
    t = F.regexp_replace(t, "\n{3,}", "\n\n")
    return docs.select("doc_id", F.trim(t).alias(text_col))


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int,
    *,
    overlap: int = 0,
    text_col: str = "text",
    drop_empty: bool = True,
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_text, n_tokens): split each document
    into token windows of ``chunk_tokens`` with ``overlap`` tokens of
    context carried between consecutive chunks — the standard chunker
    for RAG indexing and long-document training prep. The final chunk
    keeps its natural (shorter) length; chunk starts advance by
    ``chunk_tokens - overlap``.

    Pure codegen: tokenize in the scan projection, build the chunk
    array with ``sequence``+``transform``+``slice`` (no UDF, no
    shuffle), then one posexplode. Zero data movement beyond the
    explode itself."""
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap}"
        )
    step = chunk_tokens - overlap
    toks = tokens_col(text_col)
    n = F.size(toks)
    # number of chunks: 1 + ceil(max(0, n - chunk) / step)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(n - chunk_tokens, F.lit(0)) / F.lit(step)
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(
            " ", F.slice(toks, i * step + 1, chunk_tokens)
        ),
    )
    out = docs.select(
        "doc_id",
        F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        "chunk_text",
        F.size(F.split(F.col("chunk_text"), " ")).cast("long").alias(
            "n_tokens"
        ),
    )
    if drop_empty:
        out = out.filter(F.trim(F.col("chunk_text")) != "")
    return out


def tfidf_vectors(
    docs: DataFrame,
    dim: int = 256,
    *,
    text_col: str = "text",
    base_hash: str = "md5",
    l2_normalize: bool = False,
) -> DataFrame:
    """Hashed TF-IDF document vectors as SPARSE rows
    (doc_id, bucket int, weight double) — the feature-hashing trick
    (Weinberger et al. 2009) that bridges the text pipeline into the
    embedding machinery (k-means, ANN, semantic dedup) without a
    vocabulary table: bucket = hash(term) % dim, weight = tf × smoothed
    idf (sklearn formulation, computed at BUCKET granularity, which is
    the standard HashingVectorizer+TfidfTransformer composition).

    Sparse rows rather than dense arrays: honest about the data (most
    buckets are zero), exactly SQL-replayable row by row, and
    :func:`tfidf_dense` converts when a fixed-width column is needed.
    One token shuffle; the dim-sized df table broadcasts.
    """
    toks = docs.select(
        "doc_id", F.explode(tokens_col(text_col)).alias("term")
    ).filter(F.col("term") != "")
    tf = (
        toks.select(
            "doc_id",
            F.pmod(_base_hash(F.col("term"), base_hash), F.lit(dim))
            .cast("int")
            .alias("bucket"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_tbl = tf.groupBy("bucket").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("__n"))
    out = (
        tf.join(F.broadcast(df_tbl), "bucket")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "bucket",
            (
                F.col("tf")
                * (F.log((1 + F.col("__n")) / (1 + F.col("df"))) + 1)
            ).alias("weight"),
        )
    )
    if l2_normalize:
        from pyspark.sql import Window

        nrm = F.sqrt(
            F.sum(F.col("weight") * F.col("weight")).over(
                Window.partitionBy("doc_id")
            )
        )
        out = out.select(
            "doc_id", "bucket", (F.col("weight") / nrm).alias("weight")
        )
    return out


def tfidf_dense(sparse: DataFrame, dim: int) -> DataFrame:
    """(doc_id, embedding array<double>) — dense conversion of
    :func:`tfidf_vectors` output for the ANN/k-means entry points.
    One doc_id-keyed aggregation; zero buckets filled inline."""
    pairs = sparse.groupBy("doc_id").agg(
        F.map_from_arrays(
            F.collect_list("bucket"), F.collect_list("weight")
        ).alias("m")
    )
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    return pairs.select(
        "doc_id",
        F.transform(
            idx, lambda i: F.coalesce(F.col("m")[i], F.lit(0.0))
        ).alias("embedding"),
    )
