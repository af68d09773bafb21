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


def read_evolving(
    spark: SparkSession,
    paths: list[str],
    expected_schema: str,
    strict_extras: bool = False,
) -> DataFrame:
    """Read parquet drops whose schemas DRIFTED across crawl months and
    align them to one contract schema. Each drop is read and aligned
    SEPARATELY, then unioned by name — deliberately NOT ``mergeSchema``,
    which refuses cross-file TYPE drift outright (``CANNOT_MERGE_SCHEMAS``
    on an int→long column change between months, the most common drift
    there is). Per-drop alignment is planning-time work on the footer
    schema, never a data pass, and the union of a handful of monthly
    drops adds no shuffle. Contract semantics per drop:

    - columns MISSING from a drop surface as typed NULL literals (the
      contract is the caller's schema, not any file's);
    - extra columns the contract doesn't know are DROPPED (column
      pruning: that drop's scan never reads their pages — plan-pinned)
      — or rejected when ``strict_extras=True`` (ingestion-contract
      enforcement, reported across all drops);
    - every contract column is cast to its contract type (safe
      widenings like int→long resolve here; Spark's ANSI cast raises
      on lossy ones rather than corrupting silently).

    The Iceberg twin is automatic (column-id-based evolution); this is
    the plain-parquet seam with the same contract semantics.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    want = T.StructType.fromDDL(expected_schema)
    extras: set[str] = set()
    aligned = []
    for p in paths:
        df = spark.read.parquet(p)
        have = {f.name for f in df.schema.fields}
        extras |= have - {f.name for f in want.fields}
        cols = []
        for f in want.fields:
            if f.name in have:
                cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        aligned.append(df.select(*cols))
    if strict_extras and extras:
        raise ValueError(f"unexpected columns in source drops: {sorted(extras)}")
    out = aligned[0]
    for a in aligned[1:]:
        out = out.unionByName(a)
    return out
