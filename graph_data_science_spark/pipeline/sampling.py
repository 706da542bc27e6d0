"""Deterministic sampling operators for training-data curation.

Every sampler here is HASH-GATED: membership is a pure function of the
row key (the engine-portable 60-bit md5 hash shared with
:mod:`pipeline.text`), never of partitioning, task scheduling, or RNG
state. That buys three properties a 100-TB curation pipeline needs:

- **reproducible** — the same corpus yields the same sample on any
  cluster size, with or without AQE;
- **parallel-safe** — membership is a narrow per-row filter (no shuffle
  for Bernoulli/stratified; one key-partitioned shuffle for top-k), so
  it pushes down next to the parquet scan;
- **incremental** — appending new documents never changes previous
  sampling decisions, so a re-run over a grown corpus is a delta job.

Scale notes: ``hash_sample``/``stratified_sample`` are scan+filter only
(the rate table is a broadcast map literal); ``temperature_sample`` adds
one tiny groupBy (|groups| rows) and a broadcast join of rates;
``group_topk_sample`` is one shuffle keyed by the group column — at
100 TB only (key, hash) columns shuffle if callers select early.

These are training-pipeline extensions beyond the reference (Neo4j GDS
~1.6 has only graph-split sampling — see ``operators/mlops.py``
``split_relationships``, ref alpha/alpha-proc SplitRelationshipsProc);
the formulations follow standard web-corpus curation practice
(per-source rates, count^alpha temperature mixing as in multilingual
corpus balancing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import _base_hash, tokens_col

# the md5-derived portable hash is uniform on [0, 16^15) = [0, 2^60)
HASH_SPACE = 1 << 60
_SEP = "\x1f"


def sample_hash(seed: int, *cols: str | Column, base_hash: str = "md5") -> Column:
    """Uniform hash on [0, 2**60) of (seed, *cols).

    The md5 path is bit-identical in Spark and DuckDB, so oracle SQL can
    replay every sampling decision exactly. The xxhash64 path (cheaper,
    engine-local) is folded into the same range with pmod — exactly
    uniform, since the 2^64 int64 values split into 16 full residue
    classes of 2^60.
    """
    parts = [F.lit(str(int(seed)))] + [
        c if isinstance(c, Column) else F.col(c) for c in cols
    ]
    h = _base_hash(F.concat_ws(_SEP, *parts), base_hash)
    if base_hash == "xxhash64":
        h = F.pmod(h, F.lit(HASH_SPACE))
    return h


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_cols: tuple[str, ...] = ("doc_id",),
    seed: int = 42,
    base_hash: str = "md5",
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose key hash falls
    below ``fraction`` of the hash space.

    Unlike ``DataFrame.sample`` (partition-RNG: resampling under a
    different partitioning or after an append changes the kept set),
    membership depends only on the key values.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    thr = int(fraction * HASH_SPACE)
    return df.where(sample_hash(seed, *key_cols, base_hash=base_hash) < thr)


def stratified_sample(
    df: DataFrame,
    group_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    key_cols: tuple[str, ...] = ("doc_id",),
    seed: int = 42,
    base_hash: str = "md5",
) -> DataFrame:
    """Per-group deterministic Bernoulli sampling (e.g. per-language /
    per-source rates). ``fractions`` maps group value -> keep rate;
    unlisted groups get ``default_fraction``.

    The rate table is a plan-literal CASE expression — no join, no
    shuffle; Catalyst folds it next to the scan.
    """
    for g, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {g!r} must be in [0, 1], got {f}")
    thr: Column = F.lit(int(default_fraction * HASH_SPACE))
    for g, f in sorted(fractions.items()):
        thr = F.when(F.col(group_col) == g, F.lit(int(f * HASH_SPACE))).otherwise(
            thr
        )
    return df.where(sample_hash(seed, *key_cols, base_hash=base_hash) < thr)


def temperature_sample(
    df: DataFrame,
    group_col: str,
    target_rows: int,
    alpha: float = 0.5,
    key_cols: tuple[str, ...] = ("doc_id",),
    seed: int = 42,
    base_hash: str = "md5",
) -> DataFrame:
    """Temperature-flattened mixing: sample so the expected group mix is
    proportional to ``count(group) ** alpha`` (alpha=1 keeps the natural
    mix, alpha=0 equalizes groups), totalling ~``target_rows`` rows.

    rate(g) = min(1, target_rows * w_g / sum(w) / count_g),
    w_g = count_g ** alpha. Rates are rounded to 9 decimals before the
    threshold compare so the oracle's group-sum (whose float addition
    order an engine doesn't pin) cannot flip a boundary row.

    Plan: one |groups|-row aggregate + broadcast join of rates + the
    same hash filter — two jobs, no wide shuffle of data rows.
    """
    if alpha == 0.5:
        w = F.sqrt(F.col("cnt").cast("double"))  # IEEE-exact in any engine
    else:
        w = F.pow(F.col("cnt").cast("double"), F.lit(float(alpha)))
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("cnt"))
    rates = (
        counts.withColumn("w", w)
        .withColumn("total_w", F.sum("w").over(Window.partitionBy()))
        .select(
            group_col,
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(float(target_rows)) * F.col("w") / F.col("total_w")
                    / F.col("cnt").cast("double"),
                ),
                9,
            ).alias("rate"),
        )
    )
    h = sample_hash(seed, *key_cols, base_hash=base_hash)
    return (
        df.join(F.broadcast(rates), group_col)
        .where(h < F.floor(F.col("rate") * F.lit(float(HASH_SPACE))))
        .drop("rate")
    )


def group_topk_sample(
    df: DataFrame,
    group_col: str,
    k: int,
    key_cols: tuple[str, ...] = ("doc_id",),
    seed: int = 42,
    base_hash: str = "md5",
) -> DataFrame:
    """Exactly ``min(k, |group|)`` rows per group — the k smallest key
    hashes, i.e. a deterministic uniform without-replacement sample
    (what a reservoir sampler computes, without the sequential state).

    One shuffle keyed by ``group_col``; ties broken by key columns so
    the result is total-order deterministic.
    """
    h = sample_hash(seed, *key_cols, base_hash=base_hash)
    win = Window.partitionBy(group_col).orderBy(
        h.asc(), *[F.col(c).asc() for c in key_cols]
    )
    return (
        df.withColumn("__rn", F.row_number().over(win))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def mixture_plan(
    docs: DataFrame,
    group_col: str,
    weights: dict[str, float],
    token_budget: int,
    *,
    text_col: str = "text",
) -> DataFrame:
    """(group, n_docs, group_tokens, target_weight, rate,
    expected_tokens, deficit_tokens): per-group Bernoulli keep rates
    that realize a target token MIXTURE under a total token budget —
    the "data mixing" step of a training-corpus build (e.g. 60% web /
    30% code / 10% books).

    ``rate_g = min(1, budget * w_g / tokens_g)`` with the weights
    normalized driver-side (plan literals — no float-sum-order
    ambiguity between engines); a group too small to fill its slice
    saturates at rate 1.0 and reports the shortfall in
    ``deficit_tokens`` (the repeat-epochs / re-weight signal). Groups
    absent from ``weights`` are dropped (rate 0).

    Plan: one |groups|-row aggregate over (group, token-count)
    projections — nothing else moves."""

    total_w = float(sum(weights.values()))
    norm = {g: float(w) / total_w for g, w in weights.items()}
    wmap = F.create_map(
        *[F.lit(x) for kv in sorted(norm.items()) for x in kv]
    )
    per_group = (
        docs.select(
            F.col(group_col),
            F.size(tokens_col(text_col)).alias("__n"),
        )
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__n").cast("long").alias("group_tokens"),
        )
        .withColumn("target_weight", wmap[F.col(group_col)])
        .filter(F.col("target_weight").isNotNull())
    )
    slice_tokens = F.lit(float(token_budget)) * F.col("target_weight")
    rate = F.round(
        F.least(
            F.lit(1.0),
            slice_tokens / F.col("group_tokens").cast("double"),
        ),
        9,
    )
    return per_group.select(
        group_col,
        "n_docs",
        "group_tokens",
        F.round("target_weight", 9).alias("target_weight"),
        rate.alias("rate"),
        F.round(rate * F.col("group_tokens"), 6).alias("expected_tokens"),
        F.round(
            F.greatest(
                F.lit(0.0),
                slice_tokens - F.col("group_tokens").cast("double"),
            ),
            6,
        ).alias("deficit_tokens"),
    )


def mixture_sample(
    docs: DataFrame,
    group_col: str,
    weights: dict[str, float],
    token_budget: int,
    *,
    key_cols: tuple[str, ...] = ("doc_id",),
    seed: int = 42,
    base_hash: str = "md5",
    text_col: str = "text",
) -> DataFrame:
    """Apply :func:`mixture_plan`'s rates as a hash-gated Bernoulli
    filter: broadcast the |groups|-row rate table, no wide shuffle —
    same reproducibility / nesting / append-stability guarantees as
    :func:`hash_sample`."""
    rates = mixture_plan(
        docs, group_col, weights, token_budget, text_col=text_col
    ).select(group_col, "rate")
    h = sample_hash(seed, *key_cols, base_hash=base_hash)
    return (
        docs.join(F.broadcast(rates), group_col)
        .where(h < F.floor(F.col("rate") * F.lit(float(HASH_SPACE))))
        .drop("rate")
    )


# ---------------------------------------------------------------------------
# DSIR-style data selection via importance resampling (Xie et al. 2023,
# "Data Selection for Language Models via Importance Resampling"): score
# raw docs by the log-likelihood ratio of hashed n-gram bag models fit on
# a target corpus vs the raw corpus, then Gumbel-top-k sample with
# probability proportional to the importance weight.
# ---------------------------------------------------------------------------


def _dsir_features(
    docs: DataFrame, text_col: str, n_buckets: int, seed: int
) -> DataFrame:
    """(doc_id, bucket, tf): hashed unigram+bigram bag per document.

    Features hash through the portable md5-60bit path so an external
    oracle can replay every bucket assignment. One scan + explode, then
    a (doc, bucket) groupBy with map-side combine — per-token rows never
    cross a shuffle un-aggregated."""
    toks = tokens_col(text_col).alias("__t")
    base = docs.select("doc_id", toks)
    feats = base.select(
        "doc_id",
        F.explode(
            F.concat(
                F.col("__t"),
                F.expr(
                    "transform(slice(__t, 1, size(__t) - 1),"
                    " (x, i) -> concat(x, chr(31), element_at(__t, i + 2)))"
                ),
            )
        ).alias("__f"),
    )
    bucket = F.pmod(
        sample_hash(seed, F.col("__f")), F.lit(int(n_buckets))
    ).alias("bucket")
    return feats.select("doc_id", bucket).groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).alias("tf")
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    *,
    n_buckets: int = 4096,
    seed: int = 13,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, logratio, n_features): per-raw-doc importance weight
    ``sum_f ln p_target(f) - ln p_raw(f)`` under Laplace-smoothed hashed
    n-gram (unigram+bigram) bag models — docs that look like the target
    corpus score high, generic raw docs score ~0 or below.

    Scale: both models are |buckets|-row aggregates (broadcast into the
    scoring join); scoring runs at (doc, bucket) granularity, so the
    only full-corpus shuffles are the two map-side-combined groupBys.
    The target corpus is typically tiny (an eval/quality seed set)."""
    tf_raw = _dsir_features(raw, text_col, n_buckets, seed).cache()
    tf_tgt = _dsir_features(target, text_col, n_buckets, seed)
    b = float(n_buckets)
    cnt_tgt = tf_tgt.groupBy("bucket").agg(F.sum("tf").alias("__tc"))
    cnt_raw = tf_raw.groupBy("bucket").agg(F.sum("tf").alias("__rc"))
    tot_tgt = cnt_tgt.agg(F.sum("__tc").alias("__tt"))
    tot_raw = cnt_raw.agg(F.sum("__rc").alias("__rt"))
    term = (
        F.log((F.coalesce(F.col("__tc"), F.lit(0)) + 1.0) / (F.col("__tt") + b))
        - F.log((F.col("__rc") + 1.0) / (F.col("__rt") + b))
    )
    return (
        tf_raw.join(F.broadcast(cnt_tgt), "bucket", "left")
        .join(F.broadcast(cnt_raw), "bucket")
        .crossJoin(F.broadcast(tot_tgt))
        .crossJoin(F.broadcast(tot_raw))
        .groupBy("doc_id")
        .agg(
            F.round(F.sum(F.col("tf") * term), 6).alias("logratio"),
            F.sum("tf").cast("long").alias("n_features"),
        )
    )


def dsir_sample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    *,
    n_buckets: int = 4096,
    seed: int = 13,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, sample_key): Gumbel-top-k resampling — keep the k raw
    docs maximizing ``logratio + Gumbel(hash(doc_id))``, i.e. a
    without-replacement sample with probability proportional to the
    importance weight. The Gumbel noise derives from the portable doc
    hash, so the sample is reproducible and oracle-replayable; ties on
    the rounded key break by doc_id.

    Scale: orderBy(...).limit(k) plans as TakeOrderedAndProject —
    per-partition top-k then a k-row merge, never a global sort."""
    u = (
        sample_hash(seed + 1, F.col("doc_id")).cast("double") + 0.5
    ) / float(HASH_SPACE)
    gumbel = -F.log(-F.log(u))
    # key = rounded weight + hash-gumbel, rounded again — both engines
    # replay the identical double rounding, so ordering is exact
    w = dsir_weights(
        raw, target, n_buckets=n_buckets, seed=seed, text_col=text_col
    ).withColumnRenamed("logratio", "__lr")
    keyed = w.select(
        "doc_id", F.round(F.col("__lr") + gumbel, 6).alias("sample_key")
    )
    return keyed.orderBy(
        F.col("sample_key").desc(), F.col("doc_id")
    ).limit(int(k))


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    *,
    group_col: str | None = None,
    key_cols: tuple[str, ...] = ("doc_id",),
    seed: int = 42,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-ES): keep the ``k`` rows maximizing ``ln(u) / w`` where
    ``u`` derives from the portable key hash — inclusion probability is
    proportional to the weight (sample-by-quality-score, the standard
    curation move), yet the sample is a pure function of (seed, keys,
    weights): reproducible on any cluster size and append-stable for
    the surviving rows' keys.

    ``group_col`` selects k per group (one shuffle keyed by the group);
    without it the global top-k plans as TakeOrderedAndProject. Rows
    with weight <= 0 are excluded (never sampled). The selection key is
    exposed as ``sample_key`` (rounded to 9; ties break by key columns)
    so an external oracle can replay every decision."""
    u = (
        sample_hash(seed, *key_cols).cast("double") + 0.5
    ) / float(HASH_SPACE)
    key = F.round(
        F.log(u) / F.col(weight_col).cast("double"), 9
    ).alias("sample_key")
    base = df.filter(F.col(weight_col) > 0).select("*", key)
    order = [F.col("sample_key").desc()] + [F.col(c).asc() for c in key_cols]
    if group_col is None:
        return base.orderBy(*order).limit(int(k))
    win = Window.partitionBy(group_col).orderBy(*order)
    return (
        base.withColumn("__rn", F.row_number().over(win))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    *,
    key_cols: tuple[str, ...] = ("doc_id",),
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic disjoint train/val/test split: each row gets the
    split whose cumulative weight interval contains its key hash.
    Every row lands in exactly one split; membership is a pure function
    of (seed, keys) — append-stable and cluster-size-independent, so a
    grown corpus never leaks old val/test rows into train. Weights are
    normalized; interval boundaries are integer hash thresholds (plan
    literals), making every assignment externally replayable.

    Zero shuffle: one CASE-chain projection next to the scan."""
    if not weights:
        raise ValueError("weights must be non-empty")
    total = float(sum(weights.values()))
    h = sample_hash(seed, *key_cols)
    acc = 0.0
    expr = None
    names = sorted(weights)
    for name in names[:-1]:
        acc += float(weights[name]) / total
        thr = int(acc * HASH_SPACE)
        branch = F.when(h < thr, F.lit(name))
        expr = branch if expr is None else expr.when(h < thr, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)
