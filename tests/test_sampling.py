"""Deterministic sampling operators (pipeline/sampling.py).

Key property under test everywhere: membership is a pure function of the
row key — invariant to partitioning, to row order, and to corpus appends
(earlier decisions never change when new rows arrive).
"""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.pipeline.sampling import (
    HASH_SPACE,
    group_topk_sample,
    hash_sample,
    sample_hash,
    stratified_sample,
    temperature_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"g{i % 4}", f"lang{i % 3}") for i in range(2000)
    ]
    return spark.createDataFrame(rows, "doc_id long, grp string, lang string")


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_hash_sample_rate_and_determinism(docs):
    s = hash_sample(docs, 0.25, seed=3)
    ids = _ids(s)
    # binomial(2000, 0.25): mean 500, sd ~19.4; 6 sd window
    assert 380 <= len(ids) <= 620
    # partitioning invariance
    assert _ids(hash_sample(docs.repartition(13, "lang"), 0.25, seed=3)) == ids
    # different seed -> different sample (overwhelmingly)
    assert _ids(hash_sample(docs, 0.25, seed=4)) != ids


def test_hash_sample_nested_thresholds(docs):
    """Hash gating makes samples at increasing fractions NESTED — the
    property that lets a pipeline grow its sample without resampling."""
    small = set(_ids(hash_sample(docs, 0.1, seed=3)))
    big = set(_ids(hash_sample(docs, 0.4, seed=3)))
    assert small <= big


def test_hash_sample_append_stability(docs, spark):
    """Appending new rows never flips earlier decisions."""
    base = set(_ids(hash_sample(docs, 0.3, seed=5)))
    extra = spark.createDataFrame(
        [(10_000 + i, "g9", "lang9") for i in range(500)],
        "doc_id long, grp string, lang string",
    )
    grown = set(_ids(hash_sample(docs.unionByName(extra), 0.3, seed=5)))
    assert {i for i in grown if i < 10_000} == base


def test_hash_sample_fraction_bounds(docs):
    assert hash_sample(docs, 0.0).count() == 0
    assert hash_sample(docs, 1.0).count() == 2000
    with pytest.raises(ValueError):
        hash_sample(docs, 1.5)


def test_stratified_rates(docs):
    s = stratified_sample(
        docs, "grp", {"g0": 1.0, "g1": 0.0}, default_fraction=0.5, seed=3
    )
    got = {r.grp: r.n for r in s.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert got.get("g0") == 500
    assert "g1" not in got
    # g2/g3 at 0.5 each: mean 250, sd ~11; 6 sd
    assert 180 <= got.get("g2", 0) <= 320
    assert 180 <= got.get("g3", 0) <= 320


def test_temperature_alpha_one_is_natural_mix(spark):
    # skewed groups: 1600 'a', 400 'b'  -> alpha=1 keeps the 4:1 mix
    rows = [(i, "a" if i < 1600 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    s = temperature_sample(df, "grp", target_rows=500, alpha=1.0, seed=3)
    got = {r.grp: r.n for r in s.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    # uniform rate 0.25 across groups: a~400, b~100
    assert 320 <= got["a"] <= 480
    assert 60 <= got["b"] <= 140


def test_temperature_alpha_zero_equalizes(spark):
    rows = [(i, "a" if i < 1600 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    s = temperature_sample(df, "grp", target_rows=400, alpha=0.0, seed=3)
    got = {r.grp: r.n for r in s.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    # equal expected mass per group: ~200 each (b rate is 0.5: sd ~10)
    assert 130 <= got["a"] <= 270
    assert 130 <= got["b"] <= 270


def test_temperature_small_group_saturates(spark):
    """A group smaller than its target allocation is kept whole (rate
    clamps to 1), never oversampled."""
    rows = [(i, "big" if i < 1990 else "tiny") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    s = temperature_sample(df, "grp", target_rows=1000, alpha=0.0, seed=3)
    got = {r.grp: r.n for r in s.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert got["tiny"] == 10


def test_group_topk_exact_k_and_invariance(docs):
    s = group_topk_sample(docs, "grp", 25, seed=3)
    got = {r.grp: r.n for r in s.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert got == {"g0": 25, "g1": 25, "g2": 25, "g3": 25}
    assert _ids(group_topk_sample(docs.repartition(7), "grp", 25, seed=3)) == _ids(s)


def test_group_topk_small_group(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id long, grp string"
    )
    s = group_topk_sample(df, "grp", 5, seed=3)
    assert s.count() == 3  # min(k, |group|)


def test_sample_hash_range(docs):
    mm = docs.select(
        F.min(sample_hash(3, "doc_id")).alias("lo"),
        F.max(sample_hash(3, "doc_id")).alias("hi"),
    ).collect()[0]
    assert 0 <= mm.lo and mm.hi < HASH_SPACE


def test_hash_sample_xxhash64_rate(docs):
    """The engine-local xxhash64 path folds into [0, 2^60) (pmod), so
    thresholds keep their meaning (a raw signed hash would let every
    negative value pass)."""
    n = hash_sample(docs, 0.25, seed=3, base_hash="xxhash64").count()
    assert 380 <= n <= 620


def test_mixture_plan_rates_and_deficit(spark):
    from graph_data_science_spark.pipeline.sampling import (
        mixture_plan,
        mixture_sample,
    )

    rows = []
    did = 0
    for g, n, toks in [("web", 100, 20), ("code", 10, 20), ("books", 5, 4)]:
        for _ in range(n):
            rows.append((did, g, " ".join(["w"] * toks)))
            did += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, grp string, text string"
    )
    # budget 1000 tokens at 50/30/20: web slice 500/2000 -> 0.25,
    # code slice 300/200 -> saturates at 1.0 (deficit 100),
    # books slice 200/20 -> saturates (deficit 180)
    plan = {
        r.grp: r
        for r in mixture_plan(
            docs, "grp", {"web": 0.5, "code": 0.3, "books": 0.2}, 1000
        ).collect()
    }
    assert plan["web"].rate == 0.25
    assert plan["code"].rate == 1.0 and plan["code"].deficit_tokens == 100.0
    assert plan["books"].rate == 1.0 and plan["books"].deficit_tokens == 180.0
    assert plan["web"].expected_tokens == 500.0
    # absent group -> dropped
    assert "other" not in plan

    kept = mixture_sample(
        docs, "grp", {"web": 0.5, "code": 0.3, "books": 0.2}, 1000, seed=3
    )
    by_g = {r.grp: r["count"] for r in kept.groupBy("grp").count().collect()}
    assert by_g["code"] == 10 and by_g["books"] == 5  # rate-1 groups intact
    assert 0 < by_g.get("web", 0) < 100  # thinned
    # reproducible
    a = sorted(r.doc_id for r in kept.collect())
    b = sorted(
        r.doc_id
        for r in mixture_sample(
            docs, "grp", {"web": 0.5, "code": 0.3, "books": 0.2}, 1000,
            seed=3,
        ).collect()
    )
    assert a == b


def test_dsir_weights_and_sample(spark):
    from graph_data_science_spark.pipeline.sampling import (
        dsir_sample,
        dsir_weights,
    )

    sports = ["goal", "match", "team", "score", "league", "win"]
    code = ["def", "class", "return", "import", "lambda", "yield"]
    rows = []
    for i in range(40):
        ws = sports if i % 2 == 0 else code
        rows.append((i, " ".join(ws[(i + j) % 6] for j in range(12))))
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    tgt = raw.filter("doc_id % 2 = 0 and doc_id < 10")

    w = {r.doc_id: r for r in dsir_weights(raw, tgt, n_buckets=512).collect()}
    assert len(w) == 40
    assert all(r.n_features == 23 for r in w.values())  # 12 uni + 11 bi
    import statistics

    mean_sports = statistics.mean(w[i].logratio for i in range(0, 40, 2))
    mean_code = statistics.mean(w[i].logratio for i in range(1, 40, 2))
    # target-like docs score far above off-distribution docs
    assert mean_sports > mean_code + 10

    got = dsir_sample(raw, tgt, 10, n_buckets=512).collect()
    assert len(got) == 10
    # importance resampling overwhelmingly selects target-like docs
    assert sum(1 for r in got if r.doc_id % 2 == 0) >= 9
    # deterministic replay
    again = dsir_sample(raw, tgt, 10, n_buckets=512).collect()
    assert sorted((r.doc_id, r.sample_key) for r in got) == sorted(
        (r.doc_id, r.sample_key) for r in again
    )


def test_weighted_sample_proportional_and_deterministic(spark):
    from graph_data_science_spark.pipeline.sampling import weighted_sample

    rows = [(i, 10.0 if i < 20 else 1.0) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    # inclusion frequency across seeds tracks the weights
    heavy_hits = light_hits = 0
    for seed in range(30):
        kept = {r.doc_id for r in weighted_sample(df, "w", 20, seed=seed).collect()}
        assert len(kept) == 20
        heavy_hits += sum(1 for d in kept if d < 20)
        light_hits += sum(1 for d in kept if d >= 20)
    # 20 heavy (w=10) vs 100 light (w=1): heavy should dominate
    assert heavy_hits > light_hits
    # deterministic replay
    a = sorted(r.doc_id for r in weighted_sample(df, "w", 20, seed=5).collect())
    b = sorted(r.doc_id for r in weighted_sample(df, "w", 20, seed=5).collect())
    assert a == b
    # zero/negative weights never sampled
    df2 = spark.createDataFrame(
        [(0, 0.0), (1, -3.0), (2, 1.0)], "doc_id long, w double"
    )
    assert {r.doc_id for r in weighted_sample(df2, "w", 3).collect()} == {2}


def test_weighted_sample_per_group(spark):
    from graph_data_science_spark.pipeline.sampling import weighted_sample

    rows = [(i, "g%d" % (i % 3), float(1 + i)) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, w double")
    kept = weighted_sample(df, "w", 4, group_col="grp", seed=2).collect()
    by_g = {}
    for r in kept:
        by_g.setdefault(r.grp, []).append(r.doc_id)
    assert {g: len(v) for g, v in by_g.items()} == {"g0": 4, "g1": 4, "g2": 4}


def test_hash_split_disjoint_and_stable(spark):
    from graph_data_science_spark.pipeline.sampling import hash_split

    df = spark.createDataFrame(
        [(i,) for i in range(2000)], "doc_id long"
    )
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = hash_split(df, w, seed=11).collect()
    assert len(out) == 2000  # total: every row in exactly one split
    by = {}
    for r in out:
        by.setdefault(r.split, set()).add(r.doc_id)
    assert set(by) == {"train", "val", "test"}
    # proportions approximately match (binomial noise)
    assert 1500 <= len(by["train"]) <= 1700
    assert 130 <= len(by["val"]) <= 270 and 130 <= len(by["test"]) <= 270
    # append stability: a grown corpus preserves old assignments
    grown = spark.createDataFrame([(i,) for i in range(3000)], "doc_id long")
    out2 = {
        r.doc_id: r.split for r in hash_split(grown, w, seed=11).collect()
    }
    for split, ids in by.items():
        assert all(out2[i] == split for i in ids)
