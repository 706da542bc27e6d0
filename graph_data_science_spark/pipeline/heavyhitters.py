"""Heavy hitters (frequent items) — exact baseline + Misra-Gries sketch.

The web-corpus question "which hosts / URLs / tokens dominate the crawl"
at 100 TB: an exact groupBy is fine while the distinct-item cardinality
fits a shuffle (hosts), but token- or URL-level cardinality is 10^9+ and
the full (item, count) shuffle becomes the bottleneck. The classic
bounded-memory answer is the Misra-Gries summary (Misra & Gries 1982,
"Finding repeated elements"; merge theorem: Agarwal et al. 2013,
"Mergeable summaries", ACM TODS 38(4)):

- :func:`heavy_hitters` (``exact=True`` default) — one map-side-combined
  groupBy + TakeOrderedAndProject top-k. The correctness baseline; also
  simply the right plan when items are low-cardinality.
- Misra-Gries mode (``exact=False``) — ONE ``mapInPandas`` pass keeps a
  capacity-c summary per partition (undercounts by ≤ n_p/c), partials
  merge with a groupBy whose input is ≤ partitions × c rows instead of
  the distinct-item cardinality. Guarantees (validity-oracle-checkable):
  every emitted estimate is a LOWER bound of the true count, true count
  ≤ estimate + n/c, and every item with true frequency > n/c survives in
  the merged summary. The emitted set beyond the guaranteed items
  depends on partition boundaries (inherent to MG — documented; the
  bounds do not).

Ties in the final top-k break by item ascending in both modes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 20,
    *,
    exact: bool = True,
    capacity: int | None = None,
) -> DataFrame:
    """(item, est_count long) — the k most frequent values of ``col``
    (NULLs ignored), descending by estimate, ties by item ascending.

    ``exact=False`` runs the Misra-Gries path with per-partition summary
    ``capacity`` (default 8k counters): est_count is then a lower bound
    with error ≤ total_rows / capacity.
    """
    items = df.select(F.col(col).cast("string").alias("item")).filter(
        F.col("item").isNotNull()
    )
    if exact:
        counted = items.groupBy("item").agg(
            F.count(F.lit(1)).cast("long").alias("est_count")
        )
    else:
        cap = capacity or 8 * k

        def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            # vectorized mergeable-summaries formulation (Agarwal et al.
            # 2013 §3.1): exact per-Arrow-batch counts (value_counts, C
            # speed) merge into the summary, then prune to capacity by
            # subtracting the (cap+1)-th largest count from everything —
            # equivalent error bound to per-row MG (≤ n_p/(cap+1) per
            # partition), but the Python loop runs per DISTINCT item per
            # batch, not per row
            counters: dict[str, int] = {}
            for pdf in batches:
                for item, c in pdf["item"].value_counts().items():
                    counters[item] = counters.get(item, 0) + int(c)
                if len(counters) > cap:
                    m = sorted(counters.values(), reverse=True)[cap]
                    counters = {
                        i: c - m for i, c in counters.items() if c > m
                    }
            yield pd.DataFrame(
                {
                    "item": sorted(counters),
                    "est_count": [counters[i] for i in sorted(counters)],
                }
            )

        counted = (
            items.mapInPandas(mg, "item string, est_count long")
            .groupBy("item")
            .agg(F.sum("est_count").cast("long").alias("est_count"))
        )
    return (
        counted.orderBy(F.col("est_count").desc(), F.col("item").asc())
        .limit(k)
    )
