"""Heavy hitters: exact top-k and Misra-Gries guarantees."""

from pyspark.sql import functions as F

from graph_data_science_spark.pipeline.heavyhitters import heavy_hitters


def _corpus(spark):
    # frequencies: a=50, b=30, c=10, then 60 singletons
    rows = [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 10
    rows += [(f"z{i:03d}",) for i in range(60)]
    return spark.createDataFrame(rows, "item string")


def test_exact_topk_and_ties(spark):
    df = _corpus(spark)
    out = heavy_hitters(df, "item", k=3).collect()
    assert [(r.item, r.est_count) for r in out] == [
        ("a", 50), ("b", 30), ("c", 10)
    ]
    # ties break by item ascending
    out2 = heavy_hitters(df, "item", k=5).collect()
    assert [r.item for r in out2[3:]] == ["z000", "z001"]


def test_mg_bounds_and_guaranteed_items(spark):
    df = _corpus(spark).repartition(8)
    n = df.count()
    cap = 24
    out = {
        r.item: r.est_count
        for r in heavy_hitters(
            df, "item", k=10, exact=False, capacity=cap
        ).collect()
    }
    true = {
        r.item: r.cnt
        for r in df.groupBy("item").agg(
            F.count(F.lit(1)).alias("cnt")
        ).collect()
    }
    # every item with true freq > n/cap must be present (merge theorem)
    for item, cnt in true.items():
        if cnt > n / cap:
            assert item in out, item
    # estimates are lower bounds within n/cap of the truth
    for item, est in out.items():
        assert est <= true[item]
        assert true[item] - est <= n / cap


def test_mg_null_ignored_and_k_respected(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("a",), ("b",)], "item string"
    )
    out = heavy_hitters(df, "item", k=1, exact=False, capacity=8).collect()
    assert len(out) == 1 and out[0].item == "a"
