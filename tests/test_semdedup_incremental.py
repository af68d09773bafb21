"""Incremental SemDeDup (operators/semdedup_incremental.py): increments
must accumulate to EXACTLY the one-shot semantic_dedup answer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

FIX = "/root/repo/fixtures/semdedup_centroids.parquet"
EMB = "/root/testdata/sf0.01/embeddings.parquet"


@pytest.fixture(scope="module")
def centroids(spark):
    return spark.read.parquet(FIX)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_increments_equal_one_shot(spark, tmp_path, centroids):
    from graphlab_spark.operators.semdedup import semantic_dedup
    from graphlab_spark.operators.semdedup_incremental import semdedup_increment

    emb = spark.read.parquet(EMB)
    idx = str(tmp_path / "idx")
    seen_pairs = []
    for k in range(3):
        inc = emb.filter(F.col("vec_id") % 3 == k)
        res = semdedup_increment(spark, idx, inc, centroids, tau=0.45)
        seen_pairs.append(_rows(res["new_pairs"]))
    one_shot = semantic_dedup(emb, centroids, tau=0.45)
    assert _rows(res["retention"]) == _rows(one_shot)
    # each unordered pair is emitted by exactly one increment (when its
    # later endpoint arrives): the per-increment pair sets are disjoint
    # and their union is the full accumulated set
    flat = [p for inc_pairs in seen_pairs for p in inc_pairs]
    assert len(flat) == len(set(flat))
    assert sorted(flat) == _rows(spark.read.parquet(f"{idx}/pairs"))


def test_duplicate_and_clashing_ids_refused(spark, tmp_path, centroids):
    from graphlab_spark.operators.semdedup_incremental import semdedup_increment

    emb = spark.read.parquet(EMB).filter(F.col("vec_id") < 30)
    idx = str(tmp_path / "idx")
    semdedup_increment(spark, idx, emb, centroids)
    with pytest.raises(ValueError, match="already in the index"):
        semdedup_increment(spark, idx, emb, centroids)
    dup = emb.unionByName(emb)
    with pytest.raises(ValueError, match="duplicate vec_ids"):
        semdedup_increment(spark, str(tmp_path / "idx2"), dup, centroids)
