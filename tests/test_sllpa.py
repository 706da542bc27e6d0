"""SLLPA overlapping communities: bridge overlap, determinism, totality."""

from graph_data_science_spark.graph import UNDIRECTED, from_edge_list
from graph_data_science_spark.operators.sllpa import sllpa


def _two_cliques_with_bridge(spark):
    """Two 5-cliques sharing ONE bridge node 'x' connected to both."""
    edges = []
    for base in ("a", "b"):
        ids = [f"{base}{i}" for i in range(5)]
        edges += [(p, q) for p in ids for q in ids if p < q]
        edges += [("x", i) for i in ids[:3]]
    return from_edge_list(spark, edges, orientation=UNDIRECTED)


def test_sllpa_overlap_on_bridge_node(spark):
    g = _two_cliques_with_bridge(spark)
    ids = {r["original_id"]: r["internal_id"] for r in g.vertices.collect()}
    out = sllpa(g, max_iterations=30, threshold=0.2)
    member = {}
    for r in out.collect():
        member.setdefault(r.internal_id, set()).add(r.community)
    # every node belongs to at least one community
    assert set(member) == set(ids.values())
    # the bridge node straddles both cliques: it must hold MORE
    # communities than a deep-clique node
    deep = member[ids["a4"]]  # a4 has no bridge edge
    assert len(member[ids["x"]]) >= len(deep)
    # nodes of one clique share a dominant label
    shared_a = set.intersection(*(member[ids[f"a{i}"]] for i in range(5)))
    assert shared_a


def test_sllpa_deterministic(spark):
    g = _two_cliques_with_bridge(spark)
    r1 = sorted(
        (r.internal_id, r.community)
        for r in sllpa(g, max_iterations=8).collect()
    )
    r2 = sorted(
        (r.internal_id, r.community)
        for r in sllpa(g, max_iterations=8).collect()
    )
    assert r1 == r2


def test_sllpa_isolated_node_keeps_own_label(spark):
    g = from_edge_list(
        spark, [("a", "b")], node_ids=["a", "b", "z"]
    )
    ids = {r["original_id"]: r["internal_id"] for r in g.vertices.collect()}
    out = {(r.internal_id, r.community) for r in sllpa(
        g, max_iterations=4).collect()}
    assert (ids["z"], ids["z"]) in out
    # 'a' has no in-edges under NATURAL orientation: keeps its own label
    assert (ids["a"], ids["a"]) in out


def test_sllpa_race_is_count_proportional(spark):
    """The speaker draw is a true weighted draw: with memory counts
    {label A: 2, label B: 1}, A must win ~2/3 of edges (the exponential
    race -ln(u)/c), not the 3/4 a raw u/c race would produce."""
    from pyspark.sql import functions as F

    from graph_data_science_spark.operators.sllpa import _u01

    n = 20_000
    eids = spark.range(n).select(F.col("id").cast("string").alias("eid"))
    races = eids.select(
        "eid",
        *[
            (
                -F.log(_u01(F.lit("1"), F.col("eid"), F.lit(lbl), F.lit("42")))
                / F.lit(float(cnt))
            ).alias(f"race_{lbl}")
            for lbl, cnt in (("A", 2), ("B", 1))
        ],
    )
    wins_a = races.filter(F.col("race_A") < F.col("race_B")).count()
    frac = wins_a / n
    # Binomial(20000, 2/3) → sd ≈ 0.0033; 6 sd ≈ 0.02. A u/c race
    # concentrates at 0.75 — far outside this band.
    assert abs(frac - 2.0 / 3.0) < 0.02, frac
