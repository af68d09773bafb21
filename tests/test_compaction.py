"""compact_table: small-files rewrite preserves content exactly and
hits the target file counts (the B7 index_rebuild analog)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from graphlab_spark.operators.materialize import compact_table


def _files(path):
    return glob.glob(f"{path}/**/*.parquet", recursive=True)


def test_compact_unpartitioned(spark, tmp_path):
    path = str(tmp_path / "frag")
    df = spark.range(2000).select(
        F.col("id"), (F.col("id") % 7).alias("k"), F.rand(seed=1).alias("v")
    )
    df.repartition(24).write.parquet(path)  # fragmented: 24 files
    before = {tuple(r) for r in spark.read.parquet(path).collect()}
    assert len(_files(path)) == 24

    out = compact_table(spark, path, files_per_partition=2, sort_cols=["id"])
    assert len(_files(path)) == 2
    assert {tuple(r) for r in out.collect()} == before  # content unchanged


def test_compact_partitioned(spark, tmp_path):
    path = str(tmp_path / "fragp")
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 4).alias("part"), (F.col("id") * 3).alias("v")
    )
    # many small files per partition
    df.repartition(10).write.partitionBy("part").parquet(path)
    before = {tuple(r) for r in spark.read.parquet(path).select("id", "v", "part").collect()}
    assert len(_files(path)) > 8

    out = compact_table(
        spark, path, files_per_partition=1, sort_cols=["id"], partition_col="part"
    )
    assert {tuple(r) for r in out.select("id", "v", "part").collect()} == before
    for p in range(4):
        assert len(_files(f"{path}/part={p}")) == 1
