"""SemDeDup (operators/semdedup.py): hand-built cells and planted
duplicate groups; the corpus-level value gate is the d08 oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def centroids(spark):
    # two orthogonal cells in 4-d
    return spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
        "cell_id long, centroid array<double>",
    )


def test_assign_cells_max_cosine_and_tie_break(spark, centroids):
    from graphlab_spark.operators.semdedup import assign_cells

    emb = spark.createDataFrame(
        [
            (1, [0.9, 0.1, 0.0, 0.0]),   # cell 0
            (2, [0.1, 0.9, 0.0, 0.0]),   # cell 1
            (3, [0.0, 0.0, 1.0, 0.0]),   # orthogonal to both: cos=0 tie -> cell 0
        ],
        "vec_id long, embedding array<double>",
    )
    got = {r.vec_id: r.cell_id for r in assign_cells(emb, centroids).collect()}
    assert got == {1: 0, 2: 1, 3: 0}


def test_semantic_dedup_groups_within_cell_only(spark, centroids):
    from graphlab_spark.operators.semdedup import semantic_dedup

    emb = spark.createDataFrame(
        [
            # cell 0: 1 and 2 near-identical -> keeper 1; 5 dissimilar
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.99, 0.0, 0.14, 0.0]),
            (5, [0.6, 0.0, -0.8, 0.0]),
            # cell 1: 3 is SIMILAR to 1 by cosine but in another cell ->
            # never compared (the SemDeDup contract), keeps itself
            (3, [0.7, 0.72, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    got = {
        r.vec_id: (r.cell_id, r.keeper)
        for r in semantic_dedup(emb, centroids, tau=0.9).collect()
    }
    assert got[1] == (0, 1)
    assert got[2] == (0, 1)   # merged into keeper 1
    assert got[5] == (0, 5)   # same cell, below tau
    assert got[3] == (1, 3)   # cross-cell similarity ignored


def test_committed_centroids_match_offline_trainer():
    """The committed fixture must equal retraining on the sf0.01
    embeddings (guards against corpus/fixture drift)."""
    from graphlab_spark.operators.semdedup import train_centroids

    emb = pd.read_parquet("/root/testdata/sf0.01/embeddings.parquet")
    vecs = np.stack(emb["embedding"].to_numpy())
    cent = train_centroids(vecs, k=8)
    fixture = pd.read_parquet("fixtures/semdedup_centroids.parquet")
    frozen = np.stack(fixture.sort_values("cell_id")["centroid"].to_numpy())
    assert np.array_equal(cent, frozen)


# ------------------------------------------------- distributed k-means


def test_kmeans_fit_equals_local_lloyd(spark):
    """Distributed Lloyd ≡ the numpy reference from the same init —
    the trainer can leave the driver without changing the model."""
    from graphlab_spark.operators.semdedup import kmeans_fit, lloyd_local

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    x = np.stack(
        emb.orderBy("vec_id").toPandas()["embedding"].to_numpy()
    ).astype(np.float64)
    init = x[:5].tolist()
    got = {
        r.cell_id: np.array(r.centroid)
        for r in kmeans_fit(emb, k=5, n_iter=4, init=init).collect()
    }
    want = lloyd_local(x, np.array(init), n_iter=4)
    assert sorted(got) == list(range(5))
    for c in range(5):
        assert np.allclose(got[c], want[c], rtol=1e-8, atol=1e-10), c


def test_kmeans_empty_cell_keeps_init_and_assign_ties(spark):
    from graphlab_spark.operators.semdedup import kmeans_assign, kmeans_fit

    emb = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.0, 0.1]), (3, [10.0, 10.0])],
        "vec_id long, embedding array<double>",
    )
    # k=3 with an init centroid far from everything: that cell stays empty
    init = [[0.0, 0.0], [10.0, 10.0], [-99.0, -99.0]]
    cents = kmeans_fit(emb, k=3, n_iter=3, init=init)
    got = {r.cell_id: list(r.centroid) for r in cents.collect()}
    assert got[2] == [-99.0, -99.0]  # empty cell keeps its centroid
    assert got[1] == [10.0, 10.0]
    asg = {r.vec_id: r.cell_id for r in kmeans_assign(emb, cents).collect()}
    assert asg == {1: 0, 2: 0, 3: 1}
    # equidistant vector ties to the LOWEST cell id
    tie = spark.createDataFrame([(9, [5.0, 5.0])], "vec_id long, embedding array<double>")
    two = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 10.0])], "cell_id int, centroid array<double>"
    )
    assert kmeans_assign(tie, two).collect()[0].cell_id == 0


def test_kmeans_init_deterministic_and_distributed(spark):
    from graphlab_spark.operators.semdedup import kmeans_init

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = kmeans_init(emb, k=4, seed=7)
    b = kmeans_init(emb.repartition(13), k=4, seed=7)
    assert a == b and len(a) == 4
    assert kmeans_init(emb, k=4, seed=8) != a


def test_kmeans_update_is_partial_aggregated(spark):
    """The centroid-update shuffle carries summarizer states, not the
    vectors: the mean aggregation must show a partial phase, and the
    assignment must stay JVM-side (no EvalPython)."""
    from pyspark.ml.functions import array_to_vector, vector_to_array
    from pyspark.ml.stat import Summarizer
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    upd = (
        emb.select(F.lit(0).alias("cell_id"), array_to_vector("embedding").alias("_mv"))
        .groupBy("cell_id")
        .agg(vector_to_array(Summarizer.mean(F.col("_mv"))).alias("mean"))
    )
    plan = upd._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "ObjectHashAggregate" in plan and "EvalPython" not in plan
