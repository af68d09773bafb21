"""applyInPandasWithState custom stateful operator
(streaming/stateful.py): bounded HLL state per surface, streaming
registers EXACTLY equal the one-shot batch sketch of the same rows,
state resumes across a checkpoint restart, and state size is fixed."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from graphlab_spark.streaming.stateful import surface_url_stats_stream

SCHEMA = "surface string, url string"
P = 8


def _rows(idx):
    # a few hot surfaces over many urls; urls repeat across batches so
    # distinct-counting (not row-counting) is genuinely exercised
    return [
        (f"S{i % 5}", f"https://ex.org/{(i * 7) % 300}") for i in idx
    ]


def _drop(spark, path, idx):
    spark.createDataFrame(_rows(idx), SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _run(spark, in_dir, ckpt, sink_rows):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    out = surface_url_stats_stream(stream, p=P)

    def sink(df, _bid):
        sink_rows.extend(df.collect())

    q = (
        out.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def _batch_registers(spark, rows):
    """One-shot hll_build per surface over the same rows — the exact
    oracle for the streaming registers."""
    from graphlab_spark.operators.sketch import _hll_cols

    df = spark.createDataFrame(rows, SCHEMA)
    bucket, rho = _hll_cols(F.col("url"), P)
    per = (
        df.select("surface", bucket.alias("b"), rho.alias("r"))
        .groupBy("surface", "b")
        .agg(F.max("r").alias("r"))
        .collect()
    )
    out: dict = {}
    for row in per:
        out.setdefault(row.surface, [0] * (1 << P))[row.b] = row.r
    return out


def test_streaming_registers_equal_batch_sketch(spark, tmp_path):
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    _drop(spark, in_dir, range(0, 400))
    _drop(spark, in_dir, range(200, 800))  # overlap: dedup across batches
    emitted: list = []
    _run(spark, in_dir, ckpt, emitted)
    # batches arrive in order per key → the LAST emission per surface is
    # the final cumulative state
    final = {}
    for r in emitted:
        final[r.surface] = r
    want_regs = _batch_registers(spark, _rows(range(0, 400)) + _rows(range(200, 800)))
    all_rows = _rows(range(0, 400)) + _rows(range(200, 800))
    for s, row in final.items():
        assert list(row.regs) == want_regs[s], s  # EXACT register equality
        assert row.n_mentions == sum(1 for x, _ in all_rows if x == s)
        exact = len({u for x, u in all_rows if x == s})
        assert abs(row.approx_urls - exact) / exact < 0.25, (s, row.approx_urls, exact)
        assert len(row.regs) == 1 << P  # bounded state, always


def test_checkpoint_restart_resumes_state(spark, tmp_path):
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    _drop(spark, in_dir, range(0, 300))
    first: list = []
    _run(spark, in_dir, ckpt, first)
    # new files after the first query finished; SAME checkpoint → the
    # state store must carry the counters forward exactly
    _drop(spark, in_dir, range(300, 600))
    second: list = []
    _run(spark, in_dir, ckpt, second)
    final = {}
    for r in second:
        final[r.surface] = r
    want = _batch_registers(spark, _rows(range(0, 600)))
    for s, row in final.items():
        assert list(row.regs) == want[s], s
        assert row.n_mentions == sum(
            1 for x, _ in _rows(range(0, 600)) if x == s
        )


def test_untouched_surfaces_emit_nothing(spark, tmp_path):
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    _drop(spark, in_dir, range(0, 100))
    first: list = []
    _run(spark, in_dir, ckpt, first)
    # second run whose batch touches ONLY surface 'S0'-congruent rows
    spark.createDataFrame(
        [("S0", "https://ex.org/new1")], SCHEMA
    ).coalesce(1).write.mode("append").parquet(in_dir)
    second: list = []
    _run(spark, in_dir, ckpt, second)
    assert {r.surface for r in second} == {"S0"}
