"""Structured-Streaming event rollup: continuous cumulative aggregation
(the 'hypertable rollup' pattern) plus a watermarked append-mode plan for
late-data handling.

Two complementary shapes:

- :func:`start_windowed_rollup` — foreachBatch: each micro-batch's
  partial (window, event_type) counts are additively MERGEd into a
  cumulative table (``additive_frame``; on Iceberg the single statement
  ``merge_into_sql(..., additive=True)``). No state store — arbitrarily
  old late data still lands in its window, and the table is queryable
  mid-stream. Replay/crash safety comes from the staged commit protocol
  in ``exactly_once.BatchCommitter`` (stage → commit flag → promote →
  applied marker): a crash at any point replays to exactly-once.

- :func:`windowed_counts_stream` — the classic watermarked streaming
  aggregation: state-store windows, append-mode emission once the
  watermark passes a window's end, late rows beyond the watermark
  dropped. Use when the sink must only ever see FINAL window values.

At scale the rollup table stays O(hours × event types) — the per-batch
merge reads/writes a table that is tiny relative to the stream, and the
partial aggregation happens map-side in each micro-batch.
"""

from __future__ import annotations


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


def sliding_counts_stream(
    events_stream: DataFrame,
    width: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked SLIDING-window aggregation plan (append mode): the
    streaming twin of :func:`operators.events.sliding_counts` (batch
    oracle: e04). Each event contributes to width/slide overlapping
    windows; a window still finalizes exactly once when the watermark
    passes ITS end — overlapping windows close one slide apart. Same
    TIMESTAMP cast caveat as :func:`windowed_counts_stream`."""
    from graphlab_spark.operators.events import sliding_counts

    ltz = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return sliding_counts(ltz.withWatermark("ts", watermark), width, slide)


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

    Replay/crash contract (``exactly_once.BatchCommitter``): each
    batch's merged rollup is staged, commit-flagged, promoted, then
    marked applied under the CHECKPOINT — a replayed batch is skipped or
    promotion-only, never combined twice; a FRESH checkpoint against an
    existing rollup is rejected (its batch ids restart at 0 and every
    input file is re-read, so merging would double-count history)."""
    from graphlab_spark.streaming.exactly_once import BatchCommitter

    committer = BatchCommitter(spark, checkpoint_dir, out_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if committer.already_applied(batch_id):
            return
        committer.guard_first_batch(batch_id, ["rollup"])
        if batch_df.isEmpty():
            return
        part = windowed_counts(batch_df, width, rounded=False)
        committer.run(
            batch_id,
            {
                "rollup": lambda: _mat.additive_frame(
                    spark,
                    f"{out_dir}/rollup",
                    part,
                    keys=["window_start", "event_type"],
                    add_cols=["n_events", "sum_value"],
                )
            },
        )

    return (
        events_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def sessionize_stream(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked per-user SESSION-window plan (append mode): the
    streaming twin of :func:`operators.events.sessionize` (batch oracle:
    e02) — same ``F.session_window`` operator, so merge semantics are
    identical by construction (inclusive gap boundary, session_end =
    last ts + gap). A session finalizes exactly once, when the watermark
    passes its end; state per (user, open session) expires with the
    watermark — the state store never grows with history, only with
    concurrently-open sessions. Same TIMESTAMP cast caveat as
    :func:`windowed_counts_stream`."""
    from graphlab_spark.operators.events import sessionize

    ltz = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return sessionize(ltz.withWatermark("ts", watermark), gap)
