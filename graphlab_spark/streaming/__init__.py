"""Streaming — intentionally batch.

The reference system has no streaming surface: its jobs are persisted
rows polled by background workers with retry/resume semantics
(``backend/README.md:26-27``; ``app/models/processing_job.py:17-32``),
i.e. batch with checkpointed progress. This engine models that exactly
with batch Spark + the per-partition lineage manifest
(``graphlab_spark.operators.manifest``): new crawl increments land as
new url-buckets, and a re-run processes only buckets not yet completed —
which is the micro-batch pattern Structured Streaming's file source
would give, without a long-running query or watermark semantics the
reference never defines.

For push-based increments that pattern is implemented in
:mod:`graphlab_spark.streaming.ingest`: a file-source ``readStream`` of
page drops + ``foreachBatch`` running the fused parse / link /
canonicalize stages and MERGE-upserting nodes/edges idempotently —
checkpointed file accounting × idempotent merge keys = effectively-once.
Watermarks/event-time aggregation remain deliberately unbuilt: the
reference defines no event-time semantics to reproduce.
"""
