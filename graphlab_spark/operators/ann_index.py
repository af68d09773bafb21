"""Persisted IVF (inverted-file) ANN index: build once, search forever.

``ann.ivf_topk`` re-derives centroids and cell assignments on every
call — fine for a one-shot query, absurd at 10^12 vectors. This module
persists the index:

- ``centroids/`` — (cell, centroid array<double>): tiny, read to the
  driver and broadcast at search time (the coarse quantizer).
- ``cells/``     — (neighbor_id, nvec) PARTITIONED BY cell: the
  inverted file. A search collects its probe cells (n_queries × n_probe
  distinct ids, driver-small) and filters with ``cell IN (...)`` — a
  STATIC partition filter, so the scan reads only the probed cells'
  files and the un-probed corpus is never touched (asserted by plan
  test).

``ivf_add`` assigns NEW vectors to the EXISTING centroids (no
re-train) and appends their cell partitions — increments never rebuild
the index. Centroid drift under distribution shift is the operator's
documented trade: re-run ``ivf_build`` offline when recall degrades.

Search results are IDENTICAL to ``ann.ivf_topk`` given the same corpus
and parameters (pinned by test): same deterministic centroids, same
stable probe ordering, same rounded-score ranking.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from graphlab_spark.operators.ann import _centroids, cosine_col
from graphlab_spark.operators.materialize import validate_output_name


def _cell_udf(bc):
    @F.pandas_udf(T.IntegerType())
    def cell_udf(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.map(lambda v: np.asarray(v, dtype=np.float64)).to_numpy())
        return pd.Series(np.argmax(M @ bc.value.T, axis=1).astype(np.int32))

    return cell_udf


def _load_centroids(spark: SparkSession, index_dir: str) -> np.ndarray:
    rows = spark.read.parquet(f"{index_dir}/centroids").orderBy("cell").collect()
    return np.stack([np.asarray(r.centroid, dtype=np.float64) for r in rows])


def ivf_build(
    spark: SparkSession,
    embeddings: DataFrame,
    index_dir: str,
    n_centroids: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Train the (deterministic) coarse quantizer and write the index."""
    validate_output_name(index_dir.rstrip("/").rsplit("/", 1)[-1])
    C = _centroids(embeddings, n_centroids, id_col, vec_col)
    spark.createDataFrame(
        [(i, [float(x) for x in C[i]]) for i in range(C.shape[0])],
        "cell int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/centroids")
    bc = spark.sparkContext.broadcast(C)
    (
        embeddings.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("nvec"),
            _cell_udf(bc)(F.col(vec_col)).alias("cell"),
        )
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{index_dir}/cells")
    )


def ivf_add(
    spark: SparkSession,
    index_dir: str,
    new_embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append new vectors under the EXISTING centroids (no re-train) —
    the incremental path: only the touched cell partitions grow."""
    bc = spark.sparkContext.broadcast(_load_centroids(spark, index_dir))
    (
        new_embeddings.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("nvec"),
            _cell_udf(bc)(F.col(vec_col)).alias("cell"),
        )
        .write.mode("append")
        .partitionBy("cell")
        .parquet(f"{index_dir}/cells")
    )


def ivf_search(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 8,
    query_id_col: str = "query_id",
    query_vec_col: str = "qvec",
) -> DataFrame:
    """Top-k cosine neighbors for each query row against the persisted
    index → (query_id, neighbor_id, rank, score). Probe cells become a
    static ``cell IN (...)`` partition filter so only probed partitions
    are scanned."""
    C = _load_centroids(spark, index_dir)
    bc = spark.sparkContext.broadcast(C)
    n_probe = min(n_probe, C.shape[0])

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probes_udf(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.map(lambda v: np.asarray(v, dtype=np.float64)).to_numpy())
        sims = M @ bc.value.T
        # stable sort: ties to the lowest cell, matching the assignment
        # argmax — a vector's own cell is always probed (exact-duplicate
        # recall guarantee, same as ann.ivf_topk)
        order = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
        return pd.Series([row.astype(int).tolist() for row in order])

    qprobes = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("qvec"),
        F.explode(probes_udf(F.col(query_vec_col))).alias("cell"),
    )
    # driver-small: n_queries × n_probe distinct cell ids
    probe_cells = sorted({r.cell for r in qprobes.select("cell").distinct().collect()})
    cells = spark.read.parquet(f"{index_dir}/cells").filter(F.col("cell").isin(probe_cells))
    cand = (
        cells.join(F.broadcast(qprobes), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn("score", F.round(cosine_col(F.col("qvec"), F.col("nvec")), 4))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )
