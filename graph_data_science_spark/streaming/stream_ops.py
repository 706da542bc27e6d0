"""Structured Streaming operators over event streams.

The reference engine is batch-only over graph snapshots (SURVEY.md §2.7);
a 100-TB training-data pipeline is not. This module gives the three
streaming shapes such a pipeline needs, each working unchanged on a
batch DataFrame (for oracle checks) and a ``readStream`` DataFrame:

- :func:`windowed_event_counts` — tumbling event-time windows with a
  watermark: late rows beyond the watermark are dropped and their window
  state is freed, so state size is bounded by (watermark / window) ×
  |keys|, independent of stream length.
- :func:`sessionize` — native ``session_window`` (gap-merged), the
  standard sessionization primitive; watermark bounds open-session state.
- :func:`streaming_dedup` — cross-micro-batch exact dedup via
  ``applyInPandasWithState``: per-fingerprint GroupState marks the first
  document seen and flags every later arrival as a duplicate. This is
  the streaming sibling of ``pipeline.text.exact_dedup``. State is one
  (long, long) per distinct fingerprint — at 10^10 distinct docs shard
  the fingerprint space across queries or enable RocksDB state store;
  an optional processing-time timeout ages out fingerprints.

Scale notes: the windowed/session aggregations are JVM-side streaming
aggregations (incremental partial aggregation + state store — no Python
in the hot path); only ``streaming_dedup`` crosses into Arrow, one batch
per fingerprint group partition per trigger.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _with_watermark(df: DataFrame, ts_col: str, watermark: str | None):
    # watermarks only apply to streaming frames; batch runs (oracle
    # checks) share the identical aggregation plan minus the state store
    if watermark is not None and df.isStreaming:
        return df.withWatermark(ts_col, watermark)
    return df


def windowed_event_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str | None = "30 minutes",
) -> DataFrame:
    """Tumbling-window counts + value sums per key.

    Returns (window_start long epoch-seconds, <key_col>, n_events,
    sum_value). Epoch-aligned tumbling windows, so the batch result is
    exactly ``GROUP BY date_trunc, key`` — the DuckDB oracle in
    ``driver_contract_ext``.
    """
    src = _with_watermark(events, ts_col, watermark)
    return (
        src.groupBy(
            F.window(F.col(ts_col), window).alias("w"), F.col(key_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def hopping_event_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "2 hours",
    hop: str = "1 hour",
    watermark: str | None = "30 minutes",
) -> DataFrame:
    """Hopping (sliding) window counts + value sums per key — each event
    contributes to ``window/hop`` overlapping windows (trend smoothing,
    rate-over-trailing-window alerting).

    Returns (window_start long epoch-seconds, <key_col>, n_events,
    sum_value). Same streaming/batch duality as
    :func:`windowed_event_counts`: the JVM streaming aggregation expands
    each row into its windows incrementally (state is |open windows| x
    |keys|, bounded by the watermark); the identical plan on a batch
    frame is the oracle surface."""
    src = _with_watermark(events, ts_col, watermark)
    return (
        src.groupBy(
            F.window(F.col(ts_col), window, hop).alias("w"), F.col(key_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Gap-based sessions per key via native ``session_window``.

    A session is the maximal run of events where each consecutive gap is
    at most ``gap`` (Spark merges an event landing exactly on
    ``last_ts + gap``; a new session starts only when the gap is strictly
    greater). Returns (key, session_start long epoch-seconds, n_events,
    sum_value).
    """
    src = _with_watermark(events, ts_col, watermark)
    return (
        src.groupBy(
            F.col(key_col), F.session_window(F.col(ts_col), gap).alias("s")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            key_col,
            F.unix_timestamp(F.col("s.start")).alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


DEDUP_OUT_SCHEMA = "fingerprint string, doc_id long, is_duplicate boolean, dup_of long"
DEDUP_STATE_SCHEMA = "first_id long, n_seen long"


def streaming_dedup(
    docs: DataFrame,
    *,
    key_col: str = "fingerprint",
    id_col: str = "doc_id",
    timeout_ms: int | None = None,
) -> DataFrame:
    """Cross-batch exact dedup: the first doc per fingerprint (smallest
    id within its first micro-batch) wins; every later doc is emitted
    with ``is_duplicate = true`` and ``dup_of`` = the winner's id.

    Streaming-only (``applyInPandasWithState`` requires a state store);
    the batch equivalent is ``pipeline.text.exact_dedup``. With
    ``timeout_ms`` set, a fingerprint idle that long is forgotten
    (bounded state for unbounded streams; trades exactness past the
    timeout horizon, same contract as a watermark).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        fingerprint = key[0]
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            first_id, n_seen = state.get
        else:
            first_id, n_seen = None, 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].sort_values().to_numpy()
            if first_id is None:
                first_id = int(ids[0])
            # every id after the very first occurrence is a duplicate
            is_dup = [bool(n_seen > 0 or i != first_id) for i in ids]
            n_seen += len(ids)
            yield pd.DataFrame(
                {
                    "fingerprint": [fingerprint] * len(ids),
                    "doc_id": ids,
                    "is_duplicate": is_dup,
                    "dup_of": [int(first_id)] * len(ids),
                }
            )
        state.update((int(first_id), int(n_seen)))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return docs.groupBy(key_col).applyInPandasWithState(
        fn, DEDUP_OUT_SCHEMA, DEDUP_STATE_SCHEMA, "append", timeout
    )
