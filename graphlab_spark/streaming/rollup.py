"""Structured-Streaming event rollup: continuous cumulative aggregation
(the 'hypertable rollup' pattern) plus a watermarked append-mode plan for
late-data handling.

Two complementary shapes:

- :func:`start_windowed_rollup` — foreachBatch: each micro-batch's
  partial (window, event_type) counts are additively MERGEd into a
  cumulative table (``merge_upsert_additive``; on Iceberg the single
  statement ``merge_into_sql(..., additive=True)``). No state store —
  arbitrarily old late data still lands in its window, and the table is
  queryable mid-stream. Replay safety: a batch-id marker directory is
  committed AFTER the merge, so a replayed batch (same checkpoint →
  same batch_id) is skipped; only a crash in the marker-write window can
  double-apply, which an Iceberg sink closes by writing the batch id
  into the same atomic commit (snapshot summary property).

- :func:`windowed_counts_stream` — the classic watermarked streaming
  aggregation: state-store windows, append-mode emission once the
  watermark passes a window's end, late rows beyond the watermark
  dropped. Use when the sink must only ever see FINAL window values.

At scale the rollup table stays O(hours × event types) — the per-batch
merge reads/writes a table that is tiny relative to the stream, and the
partial aggregation happens map-side in each micro-batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from graphlab_spark.operators import materialize as _mat
from graphlab_spark.operators.events import windowed_counts

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of event parquet drops (same schema as the
    ``events`` testdata table). ``max_files_per_trigger`` bounds batch
    size (and with availableNow forces deterministic multi-batch runs —
    used by tests to exercise the cross-batch merge path)."""
    r = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(path)


def windowed_counts_stream(
    events_stream: DataFrame, width: str = "1 hour", watermark: str = "30 minutes"
) -> DataFrame:
    """Watermarked tumbling-window aggregation plan for append-mode
    sinks: a window is emitted exactly once, when the watermark passes
    its end; rows arriving later than ``watermark`` behind the max seen
    event time are dropped (test_streaming_rollup.py pins both sides).

    Spark's EventTimeWatermark requires TIMESTAMP (with local tz), not
    TIMESTAMP_NTZ — the cast below is value-preserving because the
    session timezone is pinned to UTC (session.py)."""
    ltz = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return windowed_counts(ltz.withWatermark("ts", watermark), width)


def start_windowed_rollup(
    spark: SparkSession,
    events_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    width: str = "1 hour",
):
    """Continuous cumulative rollup → ``{out_dir}/rollup`` keyed by
    (window_start, event_type) with additive n_events / sum_value.

    Partials are UNROUNDED (rounding per-batch then summing is not the
    same as rounding the total once — readers round at query time).

    Replay contract: batch ids are minted by the CHECKPOINT, so the
    applied-batch markers live under ``checkpoint_dir`` — a query
    resumed from its checkpoint skips already-merged batches, while a
    FRESH checkpoint starts batch ids at 0 again. Because a fresh
    checkpoint re-reads every input file, merging it into an existing
    rollup would double-count history — that combination (fresh
    checkpoint + existing rollup table) is rejected with an explicit
    error instead: resume with the original checkpoint, or point at a
    fresh ``out_dir``."""
    import hashlib

    # scratch names scoped to this query so per-batch reclamation can
    # never delete another concurrent query's in-flight merge scratch
    qtag = hashlib.md5(f"{out_dir}|{checkpoint_dir}".encode()).hexdigest()[:8]

    def process(batch_df: DataFrame, batch_id: int) -> None:
        from graphlab_spark.operators.scratch import cleanup_prefix

        marker = os.path.join(checkpoint_dir, "applied_batches", str(batch_id))
        if os.path.exists(marker):  # replayed batch: already merged
            return
        if batch_id == 0 and _mat._table_exists(spark, f"{out_dir}/rollup"):
            raise RuntimeError(
                f"fresh checkpoint {checkpoint_dir!r} against existing rollup "
                f"{out_dir!r}/rollup would re-merge all history (double "
                "counts). Resume with the original checkpoint or use a fresh "
                "out_dir. (If batch 0 crashed between merge and marker "
                "write, delete the rollup table and restart.)"
            )
        if batch_df.isEmpty():
            return
        scratch = f"merge_{qtag}_{batch_id}"
        try:
            part = windowed_counts(batch_df, width, rounded=False)
            _mat.merge_upsert_additive(
                spark,
                f"{out_dir}/rollup",
                part,
                keys=["window_start", "event_type"],
                add_cols=["n_events", "sum_value"],
                scratch_name=scratch,
            )
            os.makedirs(marker, exist_ok=True)
        finally:
            # continuous queries must not accumulate per-batch tmpfs
            # (same contract as ingest.py); the merge's scratch pin is
            # fully consumed once the rollup parquet is written
            cleanup_prefix(scratch)

    return (
        events_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
