"""URL canonicalization, host graph, anchor-text aggregation."""

from graph_data_science_spark.pipeline.webgraph import (
    anchor_topk,
    host_graph,
    host_of,
    normalize_url,
)


def _norm_one(spark, url):
    df = spark.createDataFrame([(url,)], "url string")
    return normalize_url(df, "url").collect()[0]["url_norm"]


def test_normalize_url_cases(spark):
    cases = {
        # scheme+host lowercase, default port stripped, fragment dropped
        "HTTP://WWW.Example.COM:80/A/B#frag": "http://www.example.com/A/B",
        "https://Example.com:443/": "https://example.com/",
        # non-default port kept
        "http://example.com:8080/x": "http://example.com:8080/x",
        # empty path -> /, trailing slash stripped on non-root
        "http://example.com": "http://example.com/",
        "http://example.com/a/": "http://example.com/a",
        # tracking params dropped, survivors sorted
        "http://e.com/p?utm_source=x&b=2&a=1": "http://e.com/p?a=1&b=2",
        "http://e.com/p?z=9&fbclid=abc&gclid=1&a=1":
            "http://e.com/p?a=1&z=9",
        # all params tracking -> no query at all
        "http://e.com/p?utm_medium=m": "http://e.com/p",
        # userinfo preserved in authority, path case preserved
        "ftp://User@Host.com/Dir/": "ftp://user@host.com/Dir",
    }
    for raw, want in cases.items():
        assert _norm_one(spark, raw) == want, raw


def test_host_of_strips_port_and_userinfo(spark):
    df = spark.createDataFrame(
        [("https://User:pw@WWW.Ex.COM:8443/p?q=1",)], "url string"
    )
    assert df.select(host_of("url").alias("h")).collect()[0]["h"] == \
        "www.ex.com"


def test_host_graph_counts_and_intra_host(spark):
    links = spark.createDataFrame(
        [
            ("http://a.com/1", "http://b.com/x"),
            ("http://a.com/2", "http://b.com/y"),
            ("http://A.com/3", "http://c.com/z"),
            ("http://a.com/4", "http://a.com/5"),  # intra-host
        ],
        "src_url string, dst_url string",
    )
    hg = {
        (r.src_host, r.dst_host): r.weight
        for r in host_graph(links).collect()
    }
    assert hg == {("a.com", "b.com"): 2, ("a.com", "c.com"): 1}
    hg_all = host_graph(links, drop_intra_host=False)
    assert hg_all.count() == 3


def test_anchor_topk_rank_and_ties(spark):
    rows = [("u", "t", "alpha")] * 3 + [("u", "t", "beta")] * 3 + [
        ("u", "t", "gamma")
    ] + [("u", "t2", None), ("u", "t2", ""), ("u", "t2", "only")]
    links = spark.createDataFrame(
        rows, "src_url string, dst_url string, anchor string"
    )
    out = anchor_topk(links, k=2).collect()
    by_dst = {}
    for r in out:
        by_dst.setdefault(r.dst, []).append((r.rank, r.anchor, r.n_links))
    # tie 3-3 between alpha/beta -> alpha first; gamma cut by k=2
    assert sorted(by_dst["t"]) == [(1, "alpha", 3), (2, "beta", 3)]
    # null/empty anchors ignored
    assert by_dst["t2"] == [(1, "only", 1)]
