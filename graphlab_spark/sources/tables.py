"""Loaders for the driver-provided parquet tables.

At production scale these are Iceberg tables (``spark.read.format("iceberg")``
with partition pruning on e.g. ``days(warc_ts)`` / ``bucket(1024, url)``);
in this sandbox the same schemas live as plain parquet under
``/root/testdata/sf*``. The loader keeps the seam in one place.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    sf_dir = sf_dir or DEFAULT_SF_DIR
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(
    spark: SparkSession, sf_dir: str | None = None, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, n, sf_dir) for n in (names or TABLE_NAMES)}
