"""SALSA: stationary proportionality, mass conservation, TKC resistance."""

import math

from graph_data_science_spark.graph import from_edge_list
from graph_data_science_spark.operators.salsa import salsa


def test_salsa_stationary_auth_proportional_to_indeg(spark):
    # connected bipartite support: hubs {h1,h2,h3} -> auths {a1,a2}
    # indeg(a1)=3, indeg(a2)=2 -> stationary auth ratio 3:2
    g = from_edge_list(
        spark,
        [("h1", "a1"), ("h2", "a1"), ("h3", "a1"),
         ("h1", "a2"), ("h2", "a2")],
    )
    res = salsa(g, max_iterations=50)
    ids = {r["original_id"]: r["internal_id"] for r in g.vertices.collect()}
    s = {r.internal_id: (r.hub, r.auth) for r in res.scores.collect()}
    a1, a2 = s[ids["a1"]][1], s[ids["a2"]][1]
    assert math.isclose(a1 / a2, 3.0 / 2.0, rel_tol=1e-6)
    # L1 mass preserved: auths sum to 1
    assert math.isclose(a1 + a2, 1.0, rel_tol=1e-9)
    # pure authorities have hub 0
    assert s[ids["a1"]][0] == 0.0


def test_salsa_resists_tight_knit_community(spark):
    # TKC effect: a small complete bipartite clique (2 hubs x 2 auths,
    # all edges) vs one broadly-cited authority (4 independent hubs).
    # HITS gives the clique all the authority mass; SALSA's stationary
    # auth is proportional to indeg within each component, so the
    # broadly-cited page (indeg 4) must outrank each clique page (indeg 2).
    edges = [("c1", "x1"), ("c1", "x2"), ("c2", "x1"), ("c2", "x2")]
    edges += [(f"b{i}", "star") for i in range(4)]
    g = from_edge_list(spark, edges)
    res = salsa(g, max_iterations=60)
    ids = {r["original_id"]: r["internal_id"] for r in g.vertices.collect()}
    s = {r.internal_id: r.auth for r in res.scores.collect()}
    assert s[ids["star"]] > s[ids["x1"]]
    assert s[ids["star"]] > s[ids["x2"]]
