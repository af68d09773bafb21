"""Streaming exact dedup (streaming/dedup.py): cross-batch first-seen
retention vs the persisted key table, exactly-once resume, and the
watermarked state-store plan."""

from __future__ import annotations

import datetime as dt

import pytest

SCHEMA = "url string, warc_ts timestamp_ntz, text string"


def _ts(h):
    return dt.datetime(2024, 1, 1, h, 0, 0)


def _write_drop(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _run_stream(spark, in_dir, out_dir, ckpt):
    from graphlab_spark.streaming.dedup import start_dedup

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    q = start_dedup(spark, stream, out_dir, ckpt)
    q.awaitTermination()


def test_first_seen_wins_across_batches(spark, tmp_path):
    in_dir, out = str(tmp_path / "in"), str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # batch 1: two distinct docs (b is a whitespace/case variant of a? no
    # — a1/a2 are exact dups WITHIN the batch; keeper = min url)
    _write_drop(spark, in_dir, [
        ("http://a1/", _ts(1), "alpha beta"),
        ("http://a2/", _ts(0), "Alpha  BETA"),   # same fingerprint as a1
        ("http://b/", _ts(1), "gamma delta"),
    ])
    # batch 2: re-crawl of the alpha content + one new doc
    _write_drop(spark, in_dir, [
        ("http://a3/", _ts(2), "alpha beta"),
        ("http://c/", _ts(2), "epsilon zeta"),
    ])
    _run_stream(spark, in_dir, out, ckpt)

    docs = spark.read.parquet(f"{out}/docs")
    keys = spark.read.parquet(f"{out}/keys")
    got = {r.url: r.fingerprint for r in docs.collect()}
    # one survivor per distinct content; within-batch keeper is min url
    assert set(got) == {"http://a1/", "http://b/", "http://c/"}
    assert docs.count() == keys.count() == 3
    assert {r.fingerprint for r in keys.collect()} == set(got.values())


def test_resume_continues_dedup_against_history(spark, tmp_path):
    in_dir, out = str(tmp_path / "in"), str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_drop(spark, in_dir, [("http://a/", _ts(0), "alpha beta")])
    _run_stream(spark, in_dir, out, ckpt)
    # later: a new drop arrives with one historical dup + one new doc
    _write_drop(spark, in_dir, [
        ("http://a4/", _ts(5), "alpha   beta"),
        ("http://d/", _ts(5), "eta theta"),
    ])
    _run_stream(spark, in_dir, out, ckpt)  # same checkpoint: resume
    urls = {r.url for r in spark.read.parquet(f"{out}/docs").collect()}
    assert urls == {"http://a/", "http://d/"}
    # and a THIRD run with no new files changes nothing
    _run_stream(spark, in_dir, out, ckpt)
    assert {r.url for r in spark.read.parquet(f"{out}/docs").collect()} == urls


def test_fresh_checkpoint_against_populated_tables_refused(spark, tmp_path):
    in_dir, out = str(tmp_path / "in"), str(tmp_path / "out")
    _write_drop(spark, in_dir, [("http://a/", _ts(0), "alpha")])
    _run_stream(spark, in_dir, out, str(tmp_path / "ckpt1"))
    _write_drop(spark, in_dir, [("http://b/", _ts(1), "beta")])
    with pytest.raises(Exception, match="fresh checkpoint"):
        try:
            _run_stream(spark, in_dir, out, str(tmp_path / "ckpt2"))
        except Exception as e:  # unwrap StreamingQueryException
            raise RuntimeError(str(e)) from e


def test_watermarked_plan_dedups_within_horizon(spark, tmp_path):
    from graphlab_spark.streaming.dedup import dedup_stream_plan

    in_dir = str(tmp_path / "in")
    sink = str(tmp_path / "sink")
    _write_drop(spark, in_dir, [
        ("http://a/", _ts(1), "alpha beta"),
        ("http://a2/", _ts(1), "alpha  beta"),  # duplicate inside horizon
        ("http://b/", _ts(1), "gamma"),
    ])
    stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
    q = (
        dedup_stream_plan(stream, watermark="1 hour")
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    texts = sorted(r.text for r in spark.read.parquet(sink).collect())
    assert len(texts) == 2  # one alpha survivor + gamma
