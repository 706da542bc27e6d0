"""Corpus-curation operators beyond dedup: PII scan/redaction, benchmark
decontamination, and sequence packing for training-data preparation.

All hot paths are built-in ``pyspark.sql.functions`` (JVM, whole-stage
codegen) — no Python in any per-row path. Regexes are restricted to
constructs with identical Java-regex (Spark) / RE2 (DuckDB) / Python-re
semantics — explicit ASCII classes, no lookaround, no backreferences —
so the sf0.01 correctness gate can replay every operator bit-identically
in DuckDB (same discipline as ``text.BPE_SPLIT_RE``).

Scale shapes (100 TB):
- ``pii_scan`` / ``pii_redact``: pure per-row projections — zero shuffle,
  linear scan, pushdown-friendly.
- ``decontaminate``: windowed span hashes (24 B rows) shuffle once; the
  benchmark side reduces to DISTINCT hashes (an eval suite is ~10^6
  n-grams → broadcast join against the corpus spans).
- ``pack_sequences``: distributed prefix sum — range repartition by the
  order key + per-partition totals + windowed running sum. No global
  single-partition window, no driver data beyond one row per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text import _base_hash, tokens_col

# --- PII -----------------------------------------------------------------
# Ordered dict: redaction applies the patterns IN THIS ORDER (credit-card
# before phone so a 4-4-4-4 group is not partially eaten; SSN's 3-2-4 and
# phone's 3-3-4 shapes are disjoint; IPv4 needs three literal dots so a
# dotted phone cannot alias it). Scanning counts each class on the
# ORIGINAL text independently.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "credit_card": r"\b[0-9]{4}([ -][0-9]{4}){3}\b",
    "phone": r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def luhn_valid(card) -> "F.Column":
    """True iff a 16-digit card number (separators allowed) passes the
    Luhn mod-10 checksum — the validation step that separates real card
    numbers from arbitrary 4-4-4-4 digit runs (version strings, ids).

    Unrolled 16-term integer expression over the stripped digit string:
    pure JVM arithmetic, zero shuffle, and replayable verbatim in ANSI
    SQL (the oracle generates the identical 16 terms)."""
    s = F.regexp_replace(card, "[^0-9]", "")
    total = F.lit(0)
    for i in range(1, 17):
        d = F.substring(s, i, 1).cast("int")
        if i % 2 == 1:  # even position from the right of 16 -> doubled
            term = F.when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)
        else:
            term = d
        total = total + term
    return total % 10 == 0


def pii_scan(
    docs: DataFrame, text_col: str = "text", *, luhn_check: bool = False
) -> DataFrame:
    """(doc_id, n_email, n_ssn, n_credit_card, n_phone, n_ipv4) — match
    counts per PII class on the raw text. One codegen projection; counts
    are independent per class (an IPv4 inside an email would count in
    both — scan is a detector, redaction is the consistent rewriter).

    ``luhn_check=True`` counts only credit-card matches whose digits
    pass the Luhn mod-10 checksum (precision mode: 4-4-4-4 digit runs
    that aren't card numbers stop counting)."""
    cols = [F.col("doc_id")]
    for name, pat in PII_PATTERNS.items():
        matches = F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))
        if name == "credit_card" and luhn_check:
            matches = F.filter(matches, luhn_valid)
        cols.append(F.size(matches).cast("long").alias(f"n_{name}"))
    return docs.select(*cols)


def pii_redact(
    docs: DataFrame,
    text_col: str = "text",
    classes: tuple[str, ...] | None = None,
) -> DataFrame:
    """(doc_id, text) with every PII match replaced by ``<CLASS>`` tokens,
    applied in ``PII_PATTERNS`` order (order is part of the contract —
    the DuckDB oracle replays the same chain)."""
    out = F.col(text_col)
    for name, pat in PII_PATTERNS.items():
        if classes is not None and name not in classes:
            continue
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return docs.select("doc_id", out.alias("text"))


# --- Benchmark decontamination -------------------------------------------


def _span_hashes(
    docs: DataFrame, window: int, text_col: str, base_hash: str
) -> DataFrame:
    """(doc_id, pos, span_hash) for every length-``window`` token window —
    hashed inside the scan projection so only 24-byte rows ever move
    (same formulation as ``text.duplicated_spans``)."""
    toks = tokens_col(text_col)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - window),
        lambda i: _base_hash(
            F.concat_ws(" ", F.slice(toks, i + 1, window)), base_hash
        ),
    )
    return docs.filter(F.size(toks) >= window).select(
        "doc_id", F.posexplode(grams).alias("pos", "span_hash")
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    window: int = 8,
    *,
    text_col: str = "text",
    base_hash: str = "md5",
) -> DataFrame:
    """(doc_id, n_spans, n_contaminated_spans, contaminated) — flag
    training documents that share any length-``window`` token span with a
    benchmark/eval set (the standard n-gram test-set-overlap
    decontamination step; e.g. GPT-3 appendix C uses 13-gram overlap).

    ``benchmark`` is any DataFrame with the same ``text_col``. Documents
    (on either side) shorter than ``window`` tokens produce no spans and
    cannot match — callers should pick ``window`` at or below the shortest
    eval item they care about.

    Scale shape: benchmark spans reduce to DISTINCT hashes (eval suites
    are tiny next to the corpus → broadcast semi-join); corpus span
    hashes are computed in the scan projection and only (doc_id, pos,
    hash) rows shuffle. Output is one row per input document.
    """
    # explicit broadcast: the distinct-hash side comes out of an
    # aggregation, so Catalyst has no size estimate to auto-broadcast on;
    # an eval suite is ~10^6 spans (~10 MB of longs) vs the corpus scan
    bench_hashes = F.broadcast(
        _span_hashes(benchmark, window, text_col, base_hash)
        .select("span_hash")
        .distinct()
    )
    corpus_spans = _span_hashes(docs, window, text_col, base_hash)
    hits = (
        corpus_spans.join(bench_hashes, "span_hash", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_spans"))
    )
    toks = tokens_col(text_col)
    base = docs.select(
        "doc_id",
        F.greatest(F.size(toks) - window + 1, F.lit(0))
        .cast("long")
        .alias("n_spans"),
    )
    return base.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_spans",
        F.coalesce("n_contaminated_spans", F.lit(0)).alias(
            "n_contaminated_spans"
        ),
        (F.coalesce("n_contaminated_spans", F.lit(0)) > 0).alias(
            "contaminated"
        ),
    )


# --- Sequence packing ------------------------------------------------------


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    *,
    text_col: str = "text",
    order_col: str = "doc_id",
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Concat-and-cut sequence packing: documents are laid end-to-end in
    ``order_col`` order and cut every ``seq_len`` tokens (the GPT-style
    pretraining packing that splits documents across sequence boundaries
    with zero padding waste). Returns per document:

    (doc_id, n_tokens, start_token, first_seq, last_seq, n_seqs)

    where ``start_token`` is the document's global token offset,
    ``first_seq``/``last_seq`` the sequence indices its tokens land in,
    and ``n_seqs`` how many sequences it spans. Deterministic: a pure
    function of (order key, token counts) — invariant to partitioning and
    parallelism, stable under re-runs.

    Token counts come from whitespace tokenization of ``text_col`` unless
    ``n_tokens_col`` names a precomputed count column (e.g. from
    ``text.token_count_bpe``).

    Scale shape: the global running sum is a distributed prefix sum —
    range-repartition (doc_id, n_tokens) rows by the order key (16-byte
    rows, the only shuffle), pin the partitioning (localCheckpoint — AQE
    may otherwise coalesce the range shuffle differently between the two
    reads, mis-basing offsets; same lesson as ``graph.dense_ids``),
    collect one total per partition, then add per-partition offsets to a
    within-partition window running sum. No single-partition global
    window, nothing driver-side beyond one row per partition.
    """
    if n_tokens_col is None:
        counts = docs.select(
            F.col(order_col).alias("_key"),
            F.size(tokens_col(text_col)).cast("long").alias("n_tokens"),
        )
    else:
        counts = docs.select(
            F.col(order_col).alias("_key"),
            F.col(n_tokens_col).cast("long").alias("n_tokens"),
        )
    sc = docs.sparkSession.sparkContext
    parts = max(sc.defaultParallelism, 1)
    ranged = counts.repartitionByRange(parts, F.col("_key"))
    ranged = ranged.localCheckpoint(eager=True)
    ranged = ranged.withColumn("_pid", F.spark_partition_id())
    totals = ranged.groupBy("_pid").agg(F.sum("n_tokens").alias("_t")).collect()
    offsets = {}
    acc = 0
    for row in sorted(totals, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = acc
        acc += row["_t"] or 0
    # a typed empty expression: F.create_map() with no args yields
    # map<void,void>, and map<void,void>[int] fails analysis on an
    # empty input frame
    off_map = (
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
        if offsets
        else F.create_map(F.lit(-1), F.lit(0))
    )

    w = (
        Window.partitionBy("_pid")
        .orderBy("_key")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (
        F.sum("n_tokens").over(w)
        + F.coalesce(off_map[F.col("_pid")], F.lit(0))
        - F.col("n_tokens")
    )
    first_seq = F.floor(start / seq_len).cast("long")
    last_tok = start + F.greatest(F.col("n_tokens"), F.lit(1)) - 1
    last_seq = F.floor(last_tok / seq_len).cast("long")
    return ranged.select(
        F.col("_key").alias(order_col),
        "n_tokens",
        start.cast("long").alias("start_token"),
        first_seq.alias("first_seq"),
        last_seq.alias("last_seq"),
        F.when(F.col("n_tokens") > 0, last_seq - first_seq + 1)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_seqs"),
    )


def packing_stats(packed: DataFrame, seq_len: int) -> DataFrame:
    """One row: (n_docs, total_tokens, n_sequences, fill_frac) — how many
    ``seq_len`` sequences the packed corpus yields and the fill fraction
    of the final partial sequence (all earlier sequences are 100% full by
    construction)."""
    return packed.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.ceil(F.sum("n_tokens") / seq_len).cast("long").alias("n_sequences"),
        F.round(
            F.sum("n_tokens")
            / (F.ceil(F.sum("n_tokens") / seq_len) * seq_len),
            6,
        ).alias("fill_frac"),
    )


def curate_corpus(
    docs: DataFrame,
    *,
    benchmark: DataFrame | None = None,
    unicode_form: str | None = None,
    near_dup: bool = True,
    quality: bool = True,
    redact: bool = True,
    split_weights: dict[str, float] | None = None,
    min_jaccard_est: float = 0.7,
    decontaminate_window: int = 8,
    seed: int = 42,
    base_hash: str = "md5",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """End-to-end corpus curation: the composition a training-data user
    actually runs, wired from the individually-oracled operators —

    normalize → exact dedup (keep canonical) → MinHash-LSH near-dup
    clusters (keep canonical) → C4/Gopher quality gates → PII redaction
    → benchmark decontamination (drop contaminated docs) → train/val/
    test split.

    Returns ``(curated_docs, report)``: the surviving documents
    (doc_id, text[, split]) and a per-stage report DataFrame
    (stage_idx, stage, docs_in, docs_out, dropped).

    Every stage is deterministic (hash-gated / canonical-min-id), so
    the whole pipeline is reproducible across cluster sizes. Each stage
    materializes via localCheckpoint before the next (at real scale:
    write each stage to parquet/Iceberg instead — same shape, plus
    lineage); counts in the report force one action per stage."""
    from .sampling import hash_split
    from .text import (
        dedup_clusters,
        exact_dedup,
        heuristic_filters,
        minhash_dedup,
        normalize_text,
    )

    spark = docs.sparkSession
    stages: list[tuple[str, int, int]] = []
    cur = normalize_text(docs, text_col=text_col, form=unicode_form)
    cur = cur.localCheckpoint(eager=True)
    n = cur.count()
    stages.append(("normalize", n, n))

    canon = exact_dedup(cur, text_col=text_col).select("doc_id")
    cur = cur.join(canon, "doc_id", "left_semi").localCheckpoint(eager=True)
    n2 = cur.count()
    stages.append(("exact_dedup", n, n2))
    n = n2

    if near_dup:
        pairs = minhash_dedup(
            cur,
            min_jaccard_est=min_jaccard_est,
            text_col=text_col,
            base_hash=base_hash,
        )
        keep = dedup_clusters(pairs, cur).filter("keep").select("doc_id")
        cur = cur.join(keep, "doc_id", "left_semi").localCheckpoint(
            eager=True
        )
        n2 = cur.count()
        stages.append(("near_dup", n, n2))
        n = n2

    if quality:
        ok = heuristic_filters(cur, text_col=text_col).filter(
            "keep"
        ).select("doc_id")
        cur = cur.join(ok, "doc_id", "left_semi").localCheckpoint(eager=True)
        n2 = cur.count()
        stages.append(("quality", n, n2))
        n = n2

    if redact:
        cur = pii_redact(cur, text_col=text_col).localCheckpoint(eager=True)
        stages.append(("pii_redact", n, n))

    if benchmark is not None:
        clean = decontaminate(
            cur,
            benchmark,
            decontaminate_window,
            text_col=text_col,
            base_hash=base_hash,
        ).filter("NOT contaminated").select("doc_id")
        cur = cur.join(clean, "doc_id", "left_semi").localCheckpoint(
            eager=True
        )
        n2 = cur.count()
        stages.append(("decontaminate", n, n2))
        n = n2

    if split_weights:
        cur = hash_split(cur, split_weights, seed=seed)

    report = spark.createDataFrame(
        [
            (i, name, d_in, d_out, d_in - d_out)
            for i, (name, d_in, d_out) in enumerate(stages)
        ],
        "stage_idx long, stage string, docs_in long, docs_out long, "
        "dropped long",
    )
    return cur, report
