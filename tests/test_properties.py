"""Seeded randomized property tests (the reference's RandomGraphGenerator
test style, applied to the pipeline ops): each test draws a randomized
batch from a fixed seed and checks the Spark operator against an
independent pure-Python reference or an invariance property."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _py_luhn(digits: str) -> bool:
    total = 0
    for i, ch in enumerate(digits):  # 16 digits, i is 0-based from left
        d = int(ch)
        if i % 2 == 0:  # even position from right of 16 == odd from left
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def test_luhn_matches_python_reference(spark):
    from graph_data_science_spark.pipeline.curation import luhn_valid

    rng = np.random.default_rng(7)
    rows = []
    for i in range(300):
        digits = "".join(str(d) for d in rng.integers(0, 10, 16))
        sep = [" ", "-", ""][i % 3]
        card = sep.join(digits[j : j + 4] for j in range(0, 16, 4))
        rows.append((i, card, digits))
    df = spark.createDataFrame(rows, "i long, card string, digits string")
    got = {
        r.i: r.ok
        for r in df.select("i", luhn_valid(F.col("card")).alias("ok")).collect()
    }
    expected = {i: _py_luhn(d) for i, _c, d in rows}
    assert got == expected
    # sanity: the batch contains both outcomes
    assert any(expected.values()) and not all(expected.values())


def test_dsir_weights_partitioning_invariant(spark):
    from graph_data_science_spark.pipeline.sampling import dsir_weights

    rng = np.random.default_rng(11)
    vocab = [f"w{k}" for k in range(40)]
    rows = [
        (i, " ".join(rng.choice(vocab, size=rng.integers(3, 30))))
        for i in range(120)
    ]
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    tgt = raw.filter("doc_id < 20")

    a = sorted(
        (r.doc_id, r.logratio, r.n_features)
        for r in dsir_weights(raw.repartition(13), tgt, n_buckets=256).collect()
    )
    b = sorted(
        (r.doc_id, r.logratio, r.n_features)
        for r in dsir_weights(
            raw.coalesce(1), tgt.repartition(5), n_buckets=256
        ).collect()
    )
    assert a == b


def test_mixture_sample_append_stability(spark):
    """Appending new docs never flips a previous keep decision for groups
    whose rate did not change (here: appended docs form a NEW group, so
    existing groups' token totals — and rates — are untouched)."""
    from graph_data_science_spark.pipeline.sampling import mixture_sample

    rng = np.random.default_rng(3)
    base_rows = [
        (i, "g0" if i % 2 == 0 else "g1", " ".join(["w"] * rng.integers(5, 40)))
        for i in range(200)
    ]
    extra_rows = [
        (1000 + i, "g2", " ".join(["w"] * 10)) for i in range(50)
    ]
    schema = "doc_id long, grp string, text string"
    base = spark.createDataFrame(base_rows, schema)
    grown = spark.createDataFrame(base_rows + extra_rows, schema)

    w2 = {"g0": 0.4, "g1": 0.4, "g2": 0.2}
    before = {
        r.doc_id
        for r in mixture_sample(
            base, "grp", {"g0": 0.5, "g1": 0.5}, 1500, seed=9
        ).collect()
    }
    # rescale so g0/g1 absolute budget slices (and thus rates) are identical
    after = {
        r.doc_id
        for r in mixture_sample(grown, "grp", w2, 1875, seed=9).collect()
    }
    after_old = {d for d in after if d < 1000}
    assert after_old == before
    assert any(d >= 1000 for d in after)
