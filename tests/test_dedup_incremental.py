"""Incremental MinHash-LSH (operators/dedup_incremental.py): feeding a
corpus in increments must yield EXACTLY the one-shot pair set, batch and
streaming, with replay-safe index updates."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from graphlab_spark.operators import dedup as DD
from graphlab_spark.operators.dedup_incremental import (
    dedup_increment,
    start_dedup_stream,
)


def _docs(spark, sf="/root/testdata/sf0.01"):
    d = spark.read.parquet(f"{sf}/documents.parquet").filter(F.col("doc_id") < 500)
    return DD.with_planted_near_dups(d)


def _pairset(df):
    return {(r.a, r.b, r.jaccard) for r in df.select("a", "b", "jaccard").collect()}


def test_incremental_equals_oneshot(spark, tmp_path):
    docs = _docs(spark)
    oneshot = _pairset(DD.minhash_lsh_pairs(docs, 0.8))

    idx = str(tmp_path / "idx")
    inc1 = docs.filter(F.col("doc_id") % 2 == 0)
    inc2 = docs.filter(F.col("doc_id") % 2 == 1)
    p1 = _pairset(dedup_increment(spark, idx, inc1, 0.8))
    p2 = _pairset(dedup_increment(spark, idx, inc2, 0.8))
    # increment pairs partition the one-shot set: inc1-internal pairs
    # first, then everything touching inc2
    assert p1 | p2 == oneshot
    assert p1.isdisjoint(p2)
    # index now covers the whole corpus: an empty-overlap re-increment
    # of brand-new ids finds its planted duplicate across the index
    probe = docs.filter(F.col("doc_id") == 0).select(
        (F.col("doc_id") + 777_000_000).alias("doc_id"), "text", "lang",
        "source", "n_chars",
    )
    p3 = _pairset(dedup_increment(spark, idx, probe, 0.8))
    assert any(a == 0 or b == 0 for a, b, _ in p3)  # matched old doc 0


def test_streaming_dedup_matches_oneshot_and_replays(spark, tmp_path):
    docs = _docs(spark)
    oneshot = _pairset(DD.minhash_lsh_pairs(docs, 0.8))

    in_dir = str(tmp_path / "in")
    idx = str(tmp_path / "sidx")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode("append").parquet(in_dir)
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(in_dir)
    )
    q = start_dedup_stream(spark, stream, idx, ckpt, 0.8)
    q.awaitTermination(300)
    assert sorted(os.listdir(os.path.join(ckpt, "applied_batches"))) == ["0", "1"]
    assert _pairset(spark.read.parquet(f"{idx}/pairs")) == oneshot

    # replay: same checkpoint → markers skip; pairs must not duplicate
    stream2 = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(in_dir)
    )
    q2 = start_dedup_stream(spark, stream2, idx, ckpt, 0.8)
    q2.awaitTermination(120)
    assert _pairset(spark.read.parquet(f"{idx}/pairs")) == oneshot
    assert spark.read.parquet(f"{idx}/pairs").count() == len(oneshot)  # no dup rows


def test_reingested_id_is_rejected(spark, tmp_path):
    """Appending an id already in the index would duplicate index rows
    and fan out every later verify join — refused explicitly."""
    import pytest

    docs = _docs(spark)
    idx = str(tmp_path / "clash")
    dedup_increment(spark, idx, docs.filter(F.col("doc_id") < 100))
    with pytest.raises(ValueError, match="already in the index"):
        dedup_increment(spark, idx, docs.filter(F.col("doc_id") < 50))


def test_legacy_family_index_refused(spark, tmp_path):
    """r6: an index whose signatures come from a DIFFERENT permutation
    family must be refused — cross-family band buckets never collide,
    so deduping against it would silently drop every cross candidate."""
    import numpy as np
    import pytest
    from pyspark.sql import functions as F

    from graphlab_spark.operators import dedup as DD
    from graphlab_spark.operators.dedup_incremental import (
        apply_increment,
        dedup_increment,
        sig_frame,
    )

    docs = _docs(spark).filter(F.col("doc_id") < 60)
    idx = str(tmp_path / "idx")

    # forge a LEGACY index: same layout, signatures from the old 61-bit
    # family (values routinely >= 2^31), no family marker
    legacy = sig_frame(docs.filter(F.col("doc_id") < 40)).withColumn(
        "sig",
        F.expr("transform(sig, x -> x + 4294967296)"),  # push into 61-bit range
    )
    legacy.write.mode("overwrite").parquet(f"{idx}/sigs")
    DD.bands_frame(legacy).write.mode("overwrite").parquet(f"{idx}/bands")

    inc = docs.filter(F.col("doc_id") >= 40)
    with pytest.raises(ValueError, match="permutation family"):
        apply_increment(spark, idx, inc)

    # a CURRENT-family index (written by dedup_increment, which stamps
    # the marker) keeps working — and so does one whose marker is
    # missing but whose signatures are classifiably current
    idx2 = str(tmp_path / "idx2")
    dedup_increment(spark, idx2, docs.filter(F.col("doc_id") < 40))
    pairs = apply_increment(spark, idx2, inc)["pairs"]
    assert pairs.count() >= 0  # no refusal
