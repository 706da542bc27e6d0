"""Structured Streaming operators: watermarked windows, sessions,
stateful cross-batch dedup (streaming/stream_ops.py)."""

import os
import time

import pytest
from pyspark.sql import Row, functions as F

from graph_data_science_spark.streaming.stream_ops import (
    sessionize,
    streaming_dedup,
    windowed_event_counts,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [Row(ts=t, user_id=u, event_type=k, value=v) for t, u, k, v in rows]
    ).withColumn("ts", F.to_timestamp("ts"))


def test_windowed_event_counts_batch(spark):
    ev = _events(
        spark,
        [
            ("2024-01-01 00:05:00", 1, "click", 1.0),
            ("2024-01-01 00:59:59", 2, "click", 2.0),
            ("2024-01-01 01:00:00", 1, "click", 4.0),
            ("2024-01-01 00:30:00", 3, "buy", 8.0),
        ],
    )
    out = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_counts(ev).collect()
    }
    h0 = 1704067200  # 2024-01-01 00:00:00 UTC
    assert out[(h0, "click")] == (2, 3.0)
    assert out[(h0 + 3600, "click")] == (1, 4.0)
    assert out[(h0, "buy")] == (1, 8.0)


def test_sessionize_gap_semantics(spark):
    # user 1: three events within the gap (incl. one landing exactly on
    # last+gap, which merges) -> one session; then gap+1s -> new session
    ev = _events(
        spark,
        [
            ("2024-01-01 00:00:00", 1, "e", 1.0),
            ("2024-01-01 00:10:00", 1, "e", 1.0),
            ("2024-01-01 00:40:00", 1, "e", 1.0),  # exactly gap: merges
            ("2024-01-01 01:10:01", 1, "e", 1.0),  # gap + 1s: new session
            ("2024-01-01 05:00:00", 2, "e", 1.0),
        ],
    )
    rows = sorted(
        sessionize(ev, gap="30 minutes").collect(),
        key=lambda r: (r["user_id"], r["session_start"]),
    )
    u1 = [r for r in rows if r["user_id"] == 1]
    assert [r["n_events"] for r in u1] == [3, 1]
    assert len([r for r in rows if r["user_id"] == 2]) == 1


def _run_stream(df_stream, transform, out_name, *, output_mode):
    q = (
        transform(df_stream)
        .writeStream.format("memory")
        .queryName(out_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    # availableNow drains all input then stops; returns False on timeout
    # (no exception), which would surface as a confusing data assertion
    # under heavy host load — fail loudly instead
    assert q.awaitTermination(300), "stream did not finish within 300s"
    return q


def test_streaming_dedup_across_batches(spark, tmp_path):
    src = str(tmp_path / "docs")
    os.makedirs(src)
    # two files -> two micro-batches (maxFilesPerTrigger=1); fingerprint
    # "a" appears in both: cross-batch state must flag the later one
    spark.createDataFrame(
        [Row(fingerprint="a", doc_id=10), Row(fingerprint="b", doc_id=11),
         Row(fingerprint="a", doc_id=12)]
    ).coalesce(1).write.parquet(src + "/f1")
    spark.createDataFrame(
        [Row(fingerprint="a", doc_id=20), Row(fingerprint="c", doc_id=21)]
    ).coalesce(1).write.parquet(src + "/f2")
    stream = (
        spark.readStream.schema("fingerprint string, doc_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/f*")
    )
    _run_stream(
        stream, streaming_dedup, "dedup_out", output_mode="append"
    )
    rows = spark.sql("SELECT * FROM dedup_out").collect()
    assert len(rows) == 5
    by_fp = {}
    for r in rows:
        by_fp.setdefault(r["fingerprint"], []).append(r)
    # exactly one winner per fingerprint, everything else points at it
    for fp, rs in by_fp.items():
        winners = [r for r in rs if not r["is_duplicate"]]
        assert len(winners) == 1, (fp, rs)
        for r in rs:
            assert r["dup_of"] == winners[0]["doc_id"]
    assert len(by_fp["a"]) == 3
    assert sum(r["is_duplicate"] for r in by_fp["a"]) == 2


def test_windowed_counts_streaming_matches_batch(spark, tmp_path):
    src = str(tmp_path / "ev")
    os.makedirs(src)
    rows = [
        ("2024-01-01 00:05:00", 1, "click", 1.5),
        ("2024-01-01 00:45:00", 2, "click", 2.5),
        ("2024-01-01 01:10:00", 1, "buy", 3.0),
        ("2024-01-01 02:10:00", 1, "buy", 4.0),
    ]
    _events(spark, rows[:2]).coalesce(1).write.parquet(src + "/f1")
    _events(spark, rows[2:]).coalesce(1).write.parquet(src + "/f2")
    stream = (
        spark.readStream.schema(
            "ts timestamp, user_id long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/f*")
    )
    # complete mode: windowed agg state emits fully at the end —
    # watermark-independent, so the finite-stream result is comparable
    _run_stream(
        stream, windowed_event_counts, "win_out", output_mode="complete"
    )
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_counts(_events(spark, rows)).collect()
    }
    assert got == want


def test_hopping_event_counts_batch(spark):
    from graph_data_science_spark.streaming.stream_ops import (
        hopping_event_counts,
    )

    ev = _events(
        spark,
        [
            ("2024-01-01 00:05:00", 1, "click", 1.0),
            ("2024-01-01 01:10:00", 1, "click", 4.0),
        ],
    )
    out = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in hopping_event_counts(
            ev, window="2 hours", hop="1 hour"
        ).collect()
    }
    h0 = 1704067200  # 2024-01-01 00:00:00 UTC
    # each event lands in 2 overlapping 2h windows hopping hourly
    assert out[(h0 - 3600, "click")] == (1, 1.0)
    assert out[(h0, "click")] == (2, 5.0)
    assert out[(h0 + 3600, "click")] == (1, 4.0)
    assert len(out) == 3


def test_hopping_counts_streaming_matches_batch(spark, tmp_path):
    from graph_data_science_spark.streaming.stream_ops import (
        hopping_event_counts,
    )

    src = str(tmp_path / "ev_hop")
    os.makedirs(src)
    rows = [
        ("2024-01-01 00:05:00", 1, "click", 1.5),
        ("2024-01-01 00:45:00", 2, "click", 2.5),
        ("2024-01-01 01:10:00", 1, "buy", 3.0),
        ("2024-01-01 02:10:00", 1, "buy", 4.0),
    ]
    _events(spark, rows[:2]).coalesce(1).write.parquet(src + "/f1")
    _events(spark, rows[2:]).coalesce(1).write.parquet(src + "/f2")
    stream = (
        spark.readStream.schema(
            "ts timestamp, user_id long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/f*")
    )
    _run_stream(
        stream, hopping_event_counts, "hop_out", output_mode="complete"
    )
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM hop_out").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in hopping_event_counts(_events(spark, rows)).collect()
    }
    assert got == want
