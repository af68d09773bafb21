"""Bucketed-table sink for the materialized graph — the 100-TB layout.

The path-based parquet sink (operators/materialize.py) is the sandbox
default; THIS is the shape the docstrings promise at cluster scale:
``nodes`` bucketed by ``id`` and ``edges`` bucketed by ``src`` (same
bucket count) make every downstream node⋈edge join, k-hop frontier
expansion, and MERGE-upsert co-partitioned — Catalyst plans
SortMergeJoin with ZERO Exchange on the bucketed key (pinned by
test_bucketed.py), so the graph tables are shuffled exactly once, at
write time, for their lifetime.

Reference parity: the reference leans on Neo4j's id-indexed storage for
the same effect (``backend/app/services/neo4j_connection.py:462-499``
index sync/rebuild); columnar bucketing is the Spark-native analog.

Bucket count guidance: fixed at table creation; pick ≈ cluster cores ×
2-4 at the target scale (e.g. 4096 for 10^9-node graphs) — buckets are
split across executors, and too FEW buckets caps join parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from graphlab_spark.operators.materialize import validate_output_name


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 256,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (+ optionally sorted) managed parquet
    table. Sorting within buckets lets the join skip its sort stage and
    makes point lookups min/max-prunable. All identifiers pass the B6
    name guard before reaching the catalog."""
    for part in table.split("."):
        validate_output_name(part)
    for c in bucket_cols + (sort_cols or []):
        validate_output_name(c)
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    # One file per bucket: without this, EVERY input task writes one
    # file per bucket it touches (tasks × n_buckets tiny files at scale).
    # repartition() and bucketBy() use the same murmur3 pmod assignment,
    # so after the repartition each task holds exactly one bucket's rows.
    df = df.repartition(n_buckets, *[df[c] for c in bucket_cols])
    w = df.write.bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.mode(mode).format("parquet").saveAsTable(table)


def materialize_graph_bucketed(
    spark: SparkSession,
    nodes: DataFrame,
    edges: DataFrame,
    database: str,
    n_buckets: int = 256,
    location: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Publish the graph as bucketed tables ``{database}.nodes`` (by id)
    and ``{database}.edges`` (by src), equal bucket counts so
    nodes.id = edges.src joins are co-partitioned. Returns the two
    catalog-backed frames."""
    validate_output_name(database)
    if location is not None and ("'" in location or ";" in location):
        raise ValueError(f"invalid location path {location!r}")  # B6: no SQL escape
    loc = f" LOCATION '{location}'" if location else ""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}{loc}")
    write_bucketed(nodes, f"{database}.nodes", ["id"], n_buckets, ["id"])
    write_bucketed(edges, f"{database}.edges", ["src"], n_buckets, ["src"])
    return spark.table(f"{database}.nodes"), spark.table(f"{database}.edges")
