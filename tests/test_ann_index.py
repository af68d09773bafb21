"""Persisted IVF index (operators/ann_index.py): search equals the
one-shot ivf_topk exactly, adds are incremental (no re-train), and the
probe scan is partition-pruned to the probed cells."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphlab_spark.operators.ann import ivf_topk
from graphlab_spark.operators.ann_index import ivf_add, ivf_build, ivf_search

QIDS = list(range(25))


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")


def _queries(embs, ids):
    return embs.filter(F.col("vec_id").isin(ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )


def test_search_equals_oneshot(spark, embs, tmp_path):
    idx = str(tmp_path / "ivf")
    ivf_build(spark, embs, idx)
    got = {
        tuple(r) for r in ivf_search(spark, idx, _queries(embs, QIDS)).collect()
    }
    want = {tuple(r) for r in ivf_topk(embs, QIDS).collect()}
    assert got == want


def test_add_is_incremental_and_searchable(spark, embs, tmp_path):
    idx = str(tmp_path / "ivf2")
    ivf_build(spark, embs, idx)
    # add an exact duplicate of vector 0 under a fresh id
    dup = embs.filter(F.col("vec_id") == 0).select(
        F.lit(900_000_001).cast("long").alias("vec_id"), "embedding"
    )
    ivf_add(spark, idx, dup)
    q = dup.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    top = ivf_search(spark, idx, q, k=3).orderBy("rank").collect()
    # its identical twin (vec 0) is always found, at score 1.0
    assert top[0].neighbor_id == 0 and top[0].score == 1.0


def test_probe_scan_is_partition_pruned(spark, embs, tmp_path):
    idx = str(tmp_path / "ivf3")
    ivf_build(spark, embs, idx, n_centroids=32)
    plan = (
        ivf_search(spark, idx, _queries(embs, [0, 1]), n_probe=2)
        ._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    )
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "cell" in pf[0], plan[:800]  # static cell IN (...) pruning


def test_ivf_search_external_query_id_collision(spark, tmp_path):
    """r2 advice: an EXTERNAL query whose id collides with a corpus
    vec_id must not silently lose that neighbor — exclude_self=False."""
    from pyspark.sql import functions as F

    from graphlab_spark.operators.ann_index import ivf_build, ivf_search

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = str(tmp_path / "idx_ext")
    ivf_build(spark, emb, idx, n_centroids=8)
    # external query: same vector as corpus vec_id 3, reusing id 3
    qrow = emb.filter(F.col("vec_id") == 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    with_self = ivf_search(spark, idx, qrow, k=3, n_probe=4, exclude_self=False)
    top = with_self.filter(F.col("rank") == 1).collect()[0]
    assert top.neighbor_id == 3 and top.score == 1.0  # the collision id IS a hit
    without = ivf_search(spark, idx, qrow, k=3, n_probe=4)  # default excludes
    assert without.filter(F.col("neighbor_id") == 3).count() == 0
