"""Staged-commit protocol (streaming/exactly_once.BatchCommitter):
crash at ANY point of a multi-table cumulative batch must replay to
exactly-once — never a second combine, never half-updated tables."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from graphlab_spark.streaming.exactly_once import BatchCommitter


def _frame(spark, n):
    return spark.range(n).select(
        F.col("id").alias("k"), F.lit(1).cast("long").alias("v")
    )


def _tables(spark, n_a, n_b):
    return {"ta": lambda: _frame(spark, n_a), "tb": lambda: _frame(spark, n_b)}


def _counts(spark, out):
    return {
        t: spark.read.parquet(f"{out}/{t}").count()
        for t in ("ta", "tb")
        if os.path.exists(f"{out}/{t}")
    }


def test_happy_path_and_replay_skip(spark, tmp_path):
    out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")
    c = BatchCommitter(spark, ckpt, out)
    assert not c.already_applied(0)
    c.run(0, _tables(spark, 5, 7))
    assert c.already_applied(0)
    assert _counts(spark, out) == {"ta": 5, "tb": 7}
    assert not os.path.exists(c._stage_dir(0))  # staging reclaimed


def test_crash_after_stage_promotes_without_recompute(spark, tmp_path):
    """Commit flag present → replay must NOT call frame_fn again (the
    live tables may already be partially promoted)."""
    out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")
    c = BatchCommitter(spark, ckpt, out)
    # simulate: staged both tables + commit flag, then crash pre-promote
    stage = c._stage_dir(3)
    _frame(spark, 4).write.parquet(f"{stage}/ta")
    _frame(spark, 6).write.parquet(f"{stage}/tb")
    c.fs.mkdirs(f"{stage}/_COMMIT")

    def boom():
        raise AssertionError("frame_fn must not be re-invoked after commit flag")

    c.run(3, {"ta": boom, "tb": boom})
    assert _counts(spark, out) == {"ta": 4, "tb": 6}
    assert c.already_applied(3)


def test_crash_mid_promote_finishes_remaining_tables(spark, tmp_path):
    """One table promoted, one still staged → replay promotes only the
    remaining one (no re-delete of the promoted table)."""
    out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")
    c = BatchCommitter(spark, ckpt, out)
    stage = c._stage_dir(5)
    _frame(spark, 4).write.parquet(f"{stage}/ta")
    _frame(spark, 6).write.parquet(f"{stage}/tb")
    c.fs.mkdirs(f"{stage}/_COMMIT")
    # simulate: ta already promoted, crash before tb
    c.fs.rename(f"{stage}/ta", f"{out}/ta")

    def boom():
        raise AssertionError("no recompute after commit flag")

    c.run(5, {"ta": boom, "tb": boom})
    assert _counts(spark, out) == {"ta": 4, "tb": 6}


def test_crash_after_promote_before_marker_marks_only(spark, tmp_path):
    out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")
    c = BatchCommitter(spark, ckpt, out)
    stage = c._stage_dir(2)
    _frame(spark, 9).write.parquet(f"{stage}/ta")
    c.fs.mkdirs(f"{stage}/_COMMIT")
    c.fs.rename(f"{stage}/ta", f"{out}/ta")  # promoted; marker missing

    def boom():
        raise AssertionError("no recompute after commit flag")

    c.run(2, {"ta": boom})
    assert c.already_applied(2)
    assert spark.read.parquet(f"{out}/ta").count() == 9


def test_fresh_checkpoint_guard(spark, tmp_path):
    out = str(tmp_path / "o")
    c1 = BatchCommitter(spark, str(tmp_path / "c1"), out)
    c1.run(0, {"ta": lambda: _frame(spark, 3)})
    # new checkpoint, same out_dir: guard must refuse
    c2 = BatchCommitter(spark, str(tmp_path / "c2"), out)
    with pytest.raises(RuntimeError, match="double counts"):
        c2.guard_first_batch(0, ["ta"])
    # ...but a RESUMED checkpoint that crashed mid-batch-0 is let through
    stage0 = c2._stage_dir(0)
    c2.fs.mkdirs(f"{stage0}/_COMMIT")
    c2.guard_first_batch(0, ["ta"])  # no raise: routed to promotion
    # and non-zero batches never trip the guard
    c2.guard_first_batch(1, ["ta"])


def test_fresh_checkpoint_at_same_path_ignores_old_staging(spark, tmp_path):
    """r2 advice: ctag must key the checkpoint INSTANCE, not its path.
    A predecessor that crashed between _COMMIT and marker leaves staging
    behind; a FRESH checkpoint recreated at the SAME path must not see
    that _COMMIT flag (it would promote the stale staged tables and
    silently discard its own batch 0)."""
    import shutil

    out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")
    c1 = BatchCommitter(spark, ckpt, out)
    # simulate crash between _COMMIT and marker: stage + flag, no promote
    stage = c1._stage_dir(0)
    _frame(spark, 5).write.parquet(f"{stage}/ta")
    c1.fs.mkdirs(f"{stage}/_COMMIT")
    assert c1._committed(0)

    # checkpoint dir is wiped and recreated (fresh query, same path)
    shutil.rmtree(ckpt)
    c2 = BatchCommitter(spark, ckpt, out)
    assert c2.ctag != c1.ctag  # new nonce ⇒ new identity
    assert not c2._committed(0)  # predecessor's staging is invisible
    c2.run(0, {"ta": lambda: _frame(spark, 9)})
    assert spark.read.parquet(f"{out}/ta").count() == 9  # NEW batch, not stale 5


def test_resumed_checkpoint_keeps_ctag(spark, tmp_path):
    out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")
    c1 = BatchCommitter(spark, ckpt, out)
    c1.run(0, {"ta": lambda: _frame(spark, 3)})
    c2 = BatchCommitter(spark, ckpt, out)  # resume: same checkpoint dir
    assert c2.ctag == c1.ctag
    assert c2.already_applied(0)


def test_guard_layout_rejects_missing_stats_tables(spark, tmp_path):
    """r4 ADVICE: resuming a checkpoint (any batch id) against an
    out_dir with nodes/edges but no cumulative stats tables must raise
    (layout migration), not silently rebuild from one batch — except
    mid-promotion replays, which the _COMMIT flag routes to promotion."""
    import pytest

    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")
    c = BatchCommitter(spark, ckpt, out)
    one = spark.range(1)

    # derived tables exist, stats missing → raise at batch 3
    one.write.parquet(f"{out}/nodes")
    one.write.parquet(f"{out}/edges")
    with pytest.raises(RuntimeError, match="layout migration"):
        c.guard_layout(3, ["mention_stats", "triple_stats"], ["nodes", "edges"])

    # consistent layout → passes
    one.write.parquet(f"{out}/mention_stats")
    one.write.parquet(f"{out}/triple_stats")
    c.guard_layout(3, ["mention_stats", "triple_stats"], ["nodes", "edges"])

    # fresh out_dir (nothing exists) → passes
    c2 = BatchCommitter(spark, str(tmp_path / "ck2"), str(tmp_path / "out2"))
    c2.guard_layout(0, ["mention_stats", "triple_stats"], ["nodes", "edges"])

    # mid-promotion replay (staging commit flag present) is exempt even
    # with inconsistent tables on disk
    c3 = BatchCommitter(spark, str(tmp_path / "ck3"), str(tmp_path / "out3"))
    one.write.parquet(f"{tmp_path}/out3/nodes")
    stage = c3._stage_dir(5)
    c3.fs.mkdirs(f"{stage}/_COMMIT")
    c3.guard_layout(5, ["mention_stats", "triple_stats"], ["nodes", "edges"])
