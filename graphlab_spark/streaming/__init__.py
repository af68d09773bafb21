"""Streaming surface.

The reference system itself has no streaming: its jobs are persisted
rows polled by background workers with retry/resume semantics
(``backend/README.md:26-27``; ``app/models/processing_job.py:17-32``),
i.e. batch with checkpointed progress. The batch pipeline models that
exactly with the per-partition lineage manifest
(``graphlab_spark.operators.manifest``): new crawl increments land as
new url-buckets, and a re-run processes only buckets not yet completed.

On top of that, two Structured-Streaming modules cover the push-based
and event-time shapes a production deployment adds:

- :mod:`graphlab_spark.streaming.ingest` — file-source ``readStream``
  of page drops + ``foreachBatch`` running the fused parse / link /
  canonicalize stages; cumulative combine-MERGE makes incremental
  nodes/edges converge EXACTLY to a one-shot batch run.
- :mod:`graphlab_spark.streaming.rollup` — event-time analytics:
  cumulative additive rollup and watermarked append-mode window
  aggregation with late-data drop (a beyond-reference capability; the
  reference defines no event-time semantics).
- :mod:`graphlab_spark.streaming.exactly_once` — the staged multi-table
  commit protocol both queries use for crash-safe, replay-gated
  cumulative merges (on Iceberg: batch id in the atomic MERGE commit).
"""
