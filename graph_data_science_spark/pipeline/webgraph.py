"""Web/link-graph operators: URL canonicalization, host-graph collapse,
anchor-text aggregation.

The reference engine analyzes link graphs once they are loaded; at web
scale the step BEFORE any graph algorithm is turning billions of crawled
(src_url, dst_url, anchor) rows into a clean graph. These are the three
standard preparation operators (the Common Crawl / web-graph pipeline
shape), expressed as pure `pyspark.sql.functions` projections and
aggregations — zero UDFs, everything whole-stage codegen:

- :func:`normalize_url` — canonical form so that trivially-distinct URLs
  of the same resource dedup: lowercase scheme+host, strip the scheme's
  default port, drop the fragment, drop tracking query params
  (``utm_*``/``fbclid``/``gclid``/``msclkid``), sort the surviving query
  params, collapse an empty path to ``/`` and strip a trailing slash from
  non-root paths. Every step is a regexp/array expression with identical
  Java-regex / RE2 / DuckDB semantics (ASCII classes only), so the whole
  canonicalization replays exactly in SQL.
- :func:`host_of` — registrable host extraction (lowercased authority
  minus port/userinfo).
- :func:`host_graph` — collapse a page-level edge list to the host graph:
  one groupBy((src_host, dst_host)) with map-side combine; weight =
  page-link count. Optionally drops intra-host edges (the usual setting —
  navigation boilerplate dominates intra-host links).
- :func:`anchor_topk` — per-target top-k anchor texts by frequency (ties
  by anchor text ascending): the classic anchor-text signal used for
  ranking/labeling a page. groupBy + per-dst window top-k; no global sort.

Scale notes: host_graph and anchor_topk aggregate BEFORE any join, so
only (host, host, count) / (url, anchor, count) rows shuffle — at 100 TB
of crawl edges the output is orders of magnitude smaller than the input.
Anchor hubs (one URL with 10^8 in-links) concentrate one group per
window partition; the pre-aggregation by (dst, anchor) caps that at
distinct-anchor cardinality per target.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# tracking params dropped during canonicalization (ASCII-only regex —
# identical under Java regex, RE2, and DuckDB)
TRACKING_RE = "^(utm_[a-z]+|fbclid|gclid|msclkid)="

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def host_of(url: Column | str) -> Column:
    """Lowercased host of ``url`` (authority minus userinfo and port)."""
    url = F.col(url) if isinstance(url, str) else url
    auth = F.lower(F.regexp_extract(url, _AUTH_RE, 1))
    no_user = F.regexp_replace(auth, "^[^@]*@", "")
    return F.regexp_replace(no_user, ":[0-9]*$", "")


def normalize_url_col(url: Column | str) -> Column:
    """Canonical URL as a column expression (see module docstring)."""
    url = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(url, _AUTH_RE, 1))
    # strip the scheme's default port only
    default_port = F.when(scheme == "http", F.lit(":80")).when(
        scheme == "https", F.lit(":443")
    )
    auth = F.when(
        default_port.isNotNull() & auth.endswith(default_port),
        F.substring(
            auth, F.lit(1), F.length(auth) - F.length(default_port)
        ),
    ).otherwise(auth)
    path = F.regexp_extract(url, _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when(
        (path != "/") & path.endswith("/"),
        F.substring(path, F.lit(1), F.length(path) - 1),
    ).otherwise(path)
    query = F.regexp_extract(url, _QUERY_RE, 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_RE),
    )
    qnorm = F.concat_ws("&", F.array_sort(params))
    return F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(qnorm != "", F.concat(F.lit("?"), qnorm)).otherwise(
            F.lit("")
        ),
    )


def normalize_url(
    df: DataFrame, url_col: str, out_col: str = "url_norm"
) -> DataFrame:
    """Adds ``out_col`` with the canonical form of ``url_col``."""
    return df.withColumn(out_col, normalize_url_col(url_col))


def host_graph(
    links: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    *,
    drop_intra_host: bool = True,
) -> DataFrame:
    """(src_host, dst_host, weight long) — page links collapsed to the
    host graph; weight counts page-level links."""
    hg = links.select(
        host_of(src_col).alias("src_host"), host_of(dst_col).alias("dst_host")
    )
    if drop_intra_host:
        hg = hg.filter(F.col("src_host") != F.col("dst_host"))
    return hg.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).cast("long").alias("weight")
    )


def anchor_topk(
    links: DataFrame,
    k: int = 5,
    dst_col: str = "dst_url",
    anchor_col: str = "anchor",
) -> DataFrame:
    """(dst, anchor, n_links long, rank int) — the k most frequent anchor
    texts per link target (ties broken by anchor text ascending). NULL /
    empty anchors are ignored."""
    counted = (
        links.filter(
            F.col(anchor_col).isNotNull() & (F.col(anchor_col) != "")
        )
        .groupBy(F.col(dst_col).alias("dst"), F.col(anchor_col).alias(
            "anchor"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_links"))
    )
    win = Window.partitionBy("dst").orderBy(
        F.col("n_links").desc(), F.col("anchor").asc()
    )
    return (
        counted.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
    )
