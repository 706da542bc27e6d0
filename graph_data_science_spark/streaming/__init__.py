"""Incremental / streaming surface. GDS is batch-only over snapshots
(SURVEY.md §2.7: no streaming operators); its incremental story is
``seedProperty`` re-runs. We expose that plus a Structured Streaming
driver that folds micro-batches of edge updates into seeded re-runs
(``incremental.py``), and event-stream operators — watermarked tumbling
windows, session windows, and ``applyInPandasWithState`` cross-batch
dedup (``stream_ops.py``)."""
