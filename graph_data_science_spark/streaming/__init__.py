"""Incremental / streaming surface. GDS is batch-only over snapshots
(SURVEY.md §2.7: no streaming operators); its incremental story is
``seedProperty`` re-runs. We expose that plus a Structured Streaming
driver that folds micro-batches of edge updates into seeded re-runs."""
