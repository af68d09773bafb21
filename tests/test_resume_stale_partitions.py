"""Regression (r2 advice): dynamic partition overwrite only replaces
partitions present in the written data — a recomputed bucket whose new
input yields ZERO output rows, or a bucket that vanished from the input
entirely, must not keep serving its previous rows from disk."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphlab_spark.operators.manifest import Manifest, bucket_of
from graphlab_spark.plans.pipeline import run_stage


def _input(spark, rows):
    return spark.createDataFrame(rows, "url string, flag boolean")


def _compute(d):
    # a bucket whose rows all flip to flag=False recomputes to zero rows
    return d.filter(F.col("flag")).withColumn("val", F.length("url"))


def test_zero_row_recompute_clears_stale_partition(spark, tmp_path):
    out = str(tmp_path / "zr")
    manifest = Manifest(spark, f"{out}/manifest")
    rows1 = [(f"u{i}", True) for i in range(60)]
    r1 = run_stage(
        spark, manifest, "r", "st", _input(spark, rows1), "url", _compute,
        f"{out}/o", fp_cols=["url", "flag"],
    )
    assert r1.count() == 60

    # flip ~half the urls to flag=False: their buckets' fingerprints
    # change ⇒ recompute; several buckets now produce zero rows
    rows2 = [(f"u{i}", i % 2 == 0) for i in range(60)]
    r2 = run_stage(
        spark, manifest, "r", "st", _input(spark, rows2), "url", _compute,
        f"{out}/o", fp_cols=["url", "flag"],
    )
    got = {r.url for r in r2.collect()}
    want = {f"u{i}" for i in range(60) if i % 2 == 0}
    assert got == want  # no stale odd-numbered urls served from old partitions


def test_vanished_bucket_clears_stale_partition(spark, tmp_path):
    out = str(tmp_path / "vb")
    manifest = Manifest(spark, f"{out}/manifest")
    urls = [f"u{i}" for i in range(60)]
    rows1 = [(u, True) for u in urls]
    run_stage(
        spark, manifest, "r", "st", _input(spark, rows1), "url", _compute,
        f"{out}/o", fp_cols=["url", "flag"],
    )

    # drop EVERY url of one hash bucket from the input — that bucket's
    # partition must disappear from the served output even though no
    # remaining bucket needs recomputing (the nothing-pending fast path)
    bdf = spark.createDataFrame([(u,) for u in urls], "url string").select(
        "url", bucket_of("url").alias("b")
    )
    by_bucket: dict[int, list[str]] = {}
    for r in bdf.collect():
        by_bucket.setdefault(r.b, []).append(r.url)
    victim_bucket = max(by_bucket, key=lambda b: len(by_bucket[b]))
    dropped = set(by_bucket[victim_bucket])
    assert dropped  # sanity

    rows2 = [(u, True) for u in urls if u not in dropped]
    r2 = run_stage(
        spark, manifest, "r", "st", _input(spark, rows2), "url", _compute,
        f"{out}/o", fp_cols=["url", "flag"],
    )
    got = {r.url for r in r2.collect()}
    assert got == set(urls) - dropped


def test_empty_input_clears_everything_and_serves_empty(spark, tmp_path):
    out = str(tmp_path / "ei")
    manifest = Manifest(spark, f"{out}/manifest")
    rows1 = [(f"u{i}", True) for i in range(20)]
    r1 = run_stage(
        spark, manifest, "r", "st", _input(spark, rows1), "url", _compute,
        f"{out}/o", fp_cols=["url", "flag"],
    )
    assert r1.count() == 20
    # the whole input vanishes: the stage must serve EMPTY, not stale rows
    r2 = run_stage(
        spark, manifest, "r", "st", _input(spark, []), "url", _compute,
        f"{out}/o", fp_cols=["url", "flag"],
    )
    assert r2.count() == 0


def test_schema_drift_on_partial_resume_forces_full_recompute(spark, tmp_path):
    """The input fingerprint catches changed data, not changed CODE: on
    a PARTIAL resume (some buckets pending) with a changed output
    schema, writing new-schema partitions next to kept old-schema ones
    would mix schemas in one table — the stage must recompute fully.
    (A FULLY-resumed run with unchanged input keeps serving the old
    output untouched — that is the resume contract; changing stage code
    mid-run_id calls for a new run_id/out_dir.)"""
    out = str(tmp_path / "sd")
    manifest = Manifest(spark, f"{out}/st_o")
    rows1 = [(f"u{i}", True) for i in range(30)]
    r1 = run_stage(
        spark, manifest, "r", "st", _input(spark, rows1), "url", _compute,
        f"{out}/o", fp_cols=["url", "flag"],
    )
    assert set(r1.columns) == {"url", "flag", "val"}

    def _compute_v2(d):  # the stage was edited: new derived column
        return d.filter(F.col("flag")).withColumn("val2", F.length("url") * 2)

    # new urls → some buckets pending; schema changed → FULL recompute
    rows2 = rows1 + [(f"w{i}", True) for i in range(8)]
    r2 = run_stage(
        spark, manifest, "r", "st", _input(spark, rows2), "url", _compute_v2,
        f"{out}/o", fp_cols=["url", "flag"],
    )
    assert set(r2.columns) == {"url", "flag", "val2"}  # no schema mixing
    assert r2.count() == 38


def test_fully_resumed_run_keeps_old_output_despite_code_change(spark, tmp_path):
    """Unchanged input never recomputes — even if the stage code changed:
    the served table stays uniformly old-schema (no mixing possible when
    nothing is written)."""
    out = str(tmp_path / "sdf")
    manifest = Manifest(spark, f"{out}/m")
    rows = [(f"u{i}", True) for i in range(20)]
    run_stage(
        spark, manifest, "r", "st", _input(spark, rows), "url", _compute,
        f"{out}/o", fp_cols=["url", "flag"],
    )

    def _compute_v2(d):
        return d.filter(F.col("flag")).withColumn("val2", F.length("url") * 2)

    r2 = run_stage(
        spark, manifest, "r", "st", _input(spark, rows), "url", _compute_v2,
        f"{out}/o", fp_cols=["url", "flag"],
    )
    assert set(r2.columns) == {"url", "flag", "val"}  # old output, uniform
    assert r2.count() == 20


def test_change_then_revert_recomputes_not_missing(spark, tmp_path):
    """r4 ADVICE regression: a bucket whose input vanishes (dir deleted)
    and later REVERTS to its originally recorded fingerprint must
    recompute — the tombstone manifest row masks the historical
    fingerprint, so resume can never serve a table permanently missing
    that bucket's rows."""
    out = str(tmp_path / "rv")
    manifest = Manifest(spark, f"{out}/manifest")
    urls = [f"u{i}" for i in range(60)]
    rows1 = [(u, True) for u in urls]
    run_stage(
        spark, manifest, "r", "st", _input(spark, rows1), "url", _compute,
        f"{out}/o", fp_cols=["url", "flag"],
    )

    # drop every url of one hash bucket → its dir is removed + tombstoned
    bdf = spark.createDataFrame([(u,) for u in urls], "url string").select(
        "url", bucket_of("url").alias("b")
    )
    by_bucket = {}
    for r in bdf.collect():
        by_bucket.setdefault(r.b, []).append(r.url)
    victim_bucket, victim_urls = max(by_bucket.items(), key=lambda kv: len(kv[1]))
    rows2 = [(u, True) for u in urls if u not in set(victim_urls)]
    r2 = run_stage(
        spark, manifest, "r", "st", _input(spark, rows2), "url", _compute,
        f"{out}/o", fp_cols=["url", "flag"],
    )
    assert {r.url for r in r2.collect()} == set(rows_u[0] for rows_u in rows2)

    # revert to the ORIGINAL input — same per-bucket fingerprints as run 1
    r3 = run_stage(
        spark, manifest, "r", "st", _input(spark, rows1), "url", _compute,
        f"{out}/o", fp_cols=["url", "flag"],
    )
    assert {r.url for r in r3.collect()} == set(urls)  # nothing missing


def test_zero_output_bucket_resumes_without_recompute(spark, tmp_path):
    """A recomputed bucket that legitimately produced zero rows must
    resume as done on the next identical run (the genuine-fingerprint
    stats row, recorded after the tombstone, is the latest one) — not
    recompute forever."""
    out = str(tmp_path / "zl")
    manifest = Manifest(spark, f"{out}/manifest")
    rows1 = [(f"u{i}", True) for i in range(60)]
    run_stage(
        spark, manifest, "r", "st", _input(spark, rows1), "url", _compute,
        f"{out}/o", fp_cols=["url", "flag"],
    )
    rows2 = [(f"u{i}", i % 2 == 0) for i in range(60)]
    for _ in range(2):
        run_stage(
            spark, manifest, "r", "st", _input(spark, rows2), "url", _compute,
            f"{out}/o", fp_cols=["url", "flag"],
        )
    n_after_second = manifest.read().count()
    run_stage(
        spark, manifest, "r", "st", _input(spark, rows2), "url", _compute,
        f"{out}/o", fp_cols=["url", "flag"],
    )
    # third identical run appends NO new manifest rows: all buckets
    # (including zero-output ones) resumed as done
    assert manifest.read().count() == n_after_second
