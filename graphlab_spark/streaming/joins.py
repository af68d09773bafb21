"""Watermarked stream-stream temporal band join — the streaming twin of
:func:`operators.events.band_join` (batch oracle: e13) with an
entity key, i.e. "errors within Δ of a purchase by the SAME user",
computed continuously over two live streams.

Spark-first shape: this is exactly the workload Structured Streaming's
``StreamingSymmetricHashJoin`` exists for — BOTH sides are watermarked,
the join carries an equi-key plus an event-time RANGE condition, and the
state store buffers only rows that can still match: a row is evicted as
soon as the other side's watermark passes ``its ts + delta``. State is
therefore O(arrival rate × (watermark + 2·delta)) per key — bounded by
TIME, not by stream length — and the join itself is hash-partitioned on
the key across executors, never a nested loop.

Contrast with the batch plan: batch ``band_join`` manufactures the
equi-key (bin ± 1 explode) because a static nested-loop would blow up;
here the engine's symmetric hash state plays that role, so the operator
body is just the declarative join condition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def band_join_stream(
    left_stream: DataFrame,
    right_stream: DataFrame,
    delta_us: int,
    key: str = "user_id",
    ts: str = "ts",
    watermark: str = "30 minutes",
    prefix: str = "r_",
) -> DataFrame:
    """Continuous inner join of two event streams: every (left, right)
    pair with equal ``key`` and ``|ts_r − ts_l| ≤ delta_us``
    microseconds → all left columns + the right columns under
    ``prefix`` + exact integer ``dt_us = ts_r − ts_l``. Late rows
    beyond ``watermark`` are dropped (both sides watermarked — required
    for state cleanup on a stream-stream inner join); finalized output
    over the same drops equals the batch join exactly
    (tests/test_streaming_joins.py).

    Same TIMESTAMP-vs-NTZ cast caveat as streaming/rollup.py: the cast
    is value-preserving because the session timezone is pinned UTC.
    """
    if delta_us <= 0:
        raise ValueError("delta_us must be positive")
    l = (
        left_stream.withColumn(ts, F.col(ts).cast("timestamp"))
        .withWatermark(ts, watermark)
        .alias("l")
    )
    r0 = right_stream.withColumn(ts, F.col(ts).cast("timestamp"))
    r = (
        r0.select(
            [F.col(c).alias(f"{prefix}{c}") for c in r0.columns]
        )
        .withWatermark(f"{prefix}{ts}", watermark)
        .alias("r")
    )
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{prefix}{key}"))
        & (
            F.col(f"r.{prefix}{ts}")
            >= F.col(f"l.{ts}") - F.expr(f"INTERVAL {delta_us} MICROSECOND")
        )
        & (
            F.col(f"r.{prefix}{ts}")
            <= F.col(f"l.{ts}") + F.expr(f"INTERVAL {delta_us} MICROSECOND")
        )
    )
    return l.join(r, cond, "inner").withColumn(
        "dt_us",
        F.unix_micros(F.col(f"{prefix}{ts}")) - F.unix_micros(F.col(ts)),
    )


def start_band_join(
    spark,
    left_stream: DataFrame,
    right_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    delta_us: int,
    key: str = "user_id",
    watermark: str = "30 minutes",
):
    """Run the band join to a parquet append sink with availableNow
    (drain everything staged, then stop) — the test/backfill harness."""
    joined = band_join_stream(
        left_stream, right_stream, delta_us, key=key, watermark=watermark
    )
    return (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
