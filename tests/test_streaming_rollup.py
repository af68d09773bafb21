"""Streaming event rollup: cumulative additive MERGE matches the batch
aggregate, replays are idempotent, and the watermarked append-mode plan
emits finalized windows exactly once while dropping too-late rows."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from graphlab_spark.operators.events import windowed_counts
from graphlab_spark.operators.materialize import merge_into_sql
from graphlab_spark.streaming.rollup import (
    read_events_stream,
    start_windowed_rollup,
    windowed_counts_stream,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def _rows(idx):
    """Deterministic synthetic events: ~97 s apart, 2-decimal values."""
    return [
        (
            i,
            T0 + dt.timedelta(seconds=97 * i),
            i % 37,
            ("click", "view", "error")[i % 3],
            round((i % 50) * 0.25, 2),
            '{"k": %d}' % (i % 100),
        )
        for i in idx
    ]


def _drop(spark, path, idx):
    spark.createDataFrame(_rows(idx), SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_rollup_matches_batch_and_replays_idempotently(spark, tmp_path):
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    os.makedirs(in_dir)
    # interleaved drops + maxFilesPerTrigger=1 → TWO micro-batches whose
    # windows all overlap, so the additive WHEN-MATCHED merge path
    # (t.c = t.c + s.c across batches) is genuinely exercised — asserted
    # below via the applied-batch markers
    _drop(spark, in_dir, range(0, 2000, 2))
    _drop(spark, in_dir, range(1, 2000, 2))

    q = start_windowed_rollup(
        spark, read_events_stream(spark, in_dir, max_files_per_trigger=1),
        out_dir, ckpt,
    )
    q.awaitTermination(300)
    assert sorted(os.listdir(os.path.join(ckpt, "applied_batches"))) == ["0", "1"]

    rolled = {
        (r.window_start, r.event_type, r.n_events, r.sum_value)
        for r in spark.read.parquet(f"{out_dir}/rollup")
        .select("window_start", "event_type", "n_events", F.round("sum_value", 2).alias("sum_value"))
        .collect()
    }
    batch = {
        tuple(r)
        for r in windowed_counts(spark.createDataFrame(_rows(range(2000)), SCHEMA)).collect()
    }
    assert rolled == batch

    # replay with the same checkpoint: batch-id markers skip the merge —
    # counts must NOT double
    q2 = start_windowed_rollup(
        spark, read_events_stream(spark, in_dir, max_files_per_trigger=1),
        out_dir, ckpt,
    )
    q2.awaitTermination(120)
    again = {
        (r.window_start, r.event_type, r.n_events, r.sum_value)
        for r in spark.read.parquet(f"{out_dir}/rollup")
        .select("window_start", "event_type", "n_events", F.round("sum_value", 2).alias("sum_value"))
        .collect()
    }
    assert again == rolled

    # FRESH checkpoint against the existing rollup must refuse (it would
    # re-read every file and double-count history)
    q3 = start_windowed_rollup(
        spark, read_events_stream(spark, in_dir), out_dir, str(tmp_path / "ckpt2")
    )
    with pytest.raises(Exception, match="double"):
        q3.awaitTermination(120)


def test_watermark_emits_final_windows_and_drops_late(spark, tmp_path):
    in_dir, ckpt = str(tmp_path / "win"), str(tmp_path / "wckpt")
    os.makedirs(in_dir)

    def _write(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(in_dir)

    def _run(name):
        # memory sink cannot recover from a checkpoint — emit finalized
        # (append-mode) rows through foreachBatch into a per-run dir
        emit = str(tmp_path / f"emit_{name}")

        def sink(df, _bid):
            if not df.isEmpty():
                df.write.mode("append").parquet(emit)

        q = (
            windowed_counts_stream(read_events_stream(spark, in_dir), watermark="30 minutes")
            .writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        if not os.path.exists(emit):
            return set()
        return {tuple(r) for r in spark.read.parquet(emit).collect()}

    # run 1: hour-0 closes (watermark reaches 01:10 ≥ window end 01:00)
    _write(
        [
            (0, T0 + dt.timedelta(minutes=10), 1, "click", 1.0, "{}"),
            (1, T0 + dt.timedelta(minutes=20), 1, "click", 1.0, "{}"),
            (2, T0 + dt.timedelta(minutes=70), 1, "click", 1.0, "{}"),
            (3, T0 + dt.timedelta(minutes=100), 1, "click", 1.0, "{}"),
        ]
    )
    out1 = _run("wm_run1")
    assert ("2024-01-01 00:00:00", "click", 2, 2.0) in out1
    assert not any(w.startswith("2024-01-01 01") for w, *_ in out1)  # hour-1 open

    # run 2 (same checkpoint → watermark persisted at 01:10):
    #  - event at 00:30 is LATE beyond the watermark → dropped
    #  - event at 01:50 is on-time → merges into the open hour-1 window
    #  - event at 02:30 advances the watermark to 02:00 → hour-1 closes
    _write(
        [
            (4, T0 + dt.timedelta(minutes=30), 1, "click", 1.0, "{}"),
            (5, T0 + dt.timedelta(minutes=110), 1, "click", 1.0, "{}"),
            (6, T0 + dt.timedelta(minutes=150), 1, "click", 1.0, "{}"),
        ]
    )
    out2 = _run("wm_run2")
    assert ("2024-01-01 01:00:00", "click", 3, 3.0) in out2  # 2 from run1 + on-time late
    assert not any(w.startswith("2024-01-01 00:") for w, *_ in out2)  # late row dropped


def test_merge_into_sql_additive_form():
    sql = merge_into_sql(
        "g.rollup", "batch_part", ["window_start", "event_type"],
        ["n_events", "sum_value"], additive=True,
    )
    assert "t.n_events = t.n_events + s.n_events" in sql
    assert "t.sum_value = t.sum_value + s.sum_value" in sql
    assert "WHEN NOT MATCHED THEN INSERT" in sql


def test_rollup_reclaims_scratch(spark, tmp_path):
    import glob

    from graphlab_spark.operators.scratch import scratch_dir

    in_dir = str(tmp_path / "in_s")
    os.makedirs(in_dir)
    _drop(spark, in_dir, range(0, 300))
    before = set(glob.glob(f"{scratch_dir()}/merge_*"))
    q = start_windowed_rollup(
        spark, read_events_stream(spark, in_dir),
        str(tmp_path / "out_s"), str(tmp_path / "ckpt_s"),
    )
    q.awaitTermination(180)
    new = set(glob.glob(f"{scratch_dir()}/merge_*")) - before
    assert new == set(), new  # this query's merge scratch fully reclaimed


def test_sliding_stream_finalizes_overlapping_windows(spark, tmp_path):
    """Sliding streaming twin of e04: overlapping windows finalize one
    slide apart as the watermark advances; each event lands in
    width/slide finalized windows once fully closed."""
    from graphlab_spark.streaming.rollup import sliding_counts_stream

    in_dir, ckpt = str(tmp_path / "sl"), str(tmp_path / "slckpt")
    os.makedirs(in_dir)
    emit = str(tmp_path / "sl_emit")

    def _write(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(in_dir)

    def _run():
        def sink(df, _bid):
            if not df.isEmpty():
                df.write.mode("append").parquet(emit)

        q = (
            sliding_counts_stream(
                read_events_stream(spark, in_dir),
                width="1 hour", slide="15 minutes", watermark="30 minutes",
            )
            .writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        if not os.path.exists(emit):
            return set()
        return {tuple(r) for r in spark.read.parquet(emit).collect()}

    # one event at 00:10; a second far-future event pushes the watermark
    # beyond every window containing the first, closing all 4 overlaps
    _write(
        [
            (0, T0 + dt.timedelta(minutes=10), 1, "click", 1.0, "{}"),
            (1, T0 + dt.timedelta(minutes=300), 1, "view", 2.0, "{}"),
        ]
    )
    got = _run()
    click_windows = sorted(w for (w, et, n, sv) in got if et == "click")
    # event at 00:10 belongs to windows starting 23:15..00:00 of the
    # 15-min grid: exactly width/slide = 4 windows, one slide apart
    assert click_windows == [
        "2023-12-31 23:15:00",
        "2023-12-31 23:30:00",
        "2023-12-31 23:45:00",
        "2024-01-01 00:00:00",
    ]
    assert all(n == 1 and sv == 1.0 for (w, et, n, sv) in got if et == "click")


def test_session_stream_finalizes_and_drops_late(spark, tmp_path):
    from graphlab_spark.operators.events import sessionize
    from graphlab_spark.streaming.rollup import sessionize_stream

    in_dir, ckpt = str(tmp_path / "sess"), str(tmp_path / "sckpt")
    os.makedirs(in_dir)

    def _write(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(in_dir)

    def _run(name):
        emit = str(tmp_path / f"emit_{name}")

        def sink(df, _bid):
            if not df.isEmpty():
                df.write.mode("append").parquet(emit)

        q = (
            sessionize_stream(read_events_stream(spark, in_dir))
            .writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        if not os.path.exists(emit):
            return set()
        return {tuple(r) for r in spark.read.parquet(emit).collect()}

    on_time = [
        (0, T0 + dt.timedelta(minutes=0), 1, "click", 1.0, "{}"),
        (1, T0 + dt.timedelta(minutes=10), 1, "click", 2.0, "{}"),
        # watermark advancer: 02:00 - 30m = 01:30 > user-1 session end
        (2, T0 + dt.timedelta(minutes=120), 9, "view", 1.0, "{}"),
    ]
    _write(on_time)
    out1 = _run("sess_run1")
    # user-1 session finalized exactly as the batch operator computes it
    batch = {
        tuple(r)
        for r in sessionize(spark.createDataFrame(on_time, SCHEMA)).collect()
        if r.user_id == 1
    }
    assert batch <= out1
    assert ("2024-01-01 00:00:00" in {s for _, s, *_ in out1})
    # user-9's session is still open (watermark has not passed its end)
    assert not any(u == 9 for u, *_ in out1)

    # a row older than the watermark must be dropped, not re-open the
    # finalized session
    _write([(3, T0 + dt.timedelta(minutes=5), 1, "click", 50.0, "{}")])
    out2 = _run("sess_run2")
    assert not any(u == 1 for u, *_ in out2)
