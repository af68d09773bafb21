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
