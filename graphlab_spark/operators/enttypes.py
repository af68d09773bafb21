"""Ontology type inference for canonical entities.

KG construction (reference flow: mention detection assigns types from
the alias dictionary, operators/mentions.py; UNK-typed fuzzy mentions
survive linking untyped) leaves a slice of canonical entities without a
type. The standard fix is schema-signature voting: every predicate has
a domain/range signature (founded_by: ORG → PERSON), so each edge an
entity participates in casts a vote for its type; majority wins, ties
break on the lexicographically smallest type so the assignment is
deterministic and engine-portable.

Scale shape: the rules table is O(predicates) → broadcast; votes are
one unionByName + ONE partial-aggregated groupBy(entity, type); the
argmax is a second tiny aggregate over (entity, type) rows — never a
window over the corpus. Per-entity work is O(degree), total O(edges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def infer_entity_types(
    spark: SparkSession,
    edges: DataFrame,
    rules: dict[str, tuple[str, str]],
) -> DataFrame:
    """(entity_id, entity_type, votes, total_votes) for every entity
    touched by a rule-covered predicate. ``rules``: predicate →
    (subj_type, obj_type). Edges outside the rule set cast no votes."""
    rules_df = spark.createDataFrame(
        [(p, s, o) for p, (s, o) in sorted(rules.items())],
        "pred string, subj_type string, obj_type string",
    )
    j = edges.select("src", "pred", "dst").join(F.broadcast(rules_df), "pred")
    votes = (
        j.select(F.col("src").alias("entity_id"), F.col("subj_type").alias("etype"))
        .unionByName(
            j.select(F.col("dst").alias("entity_id"), F.col("obj_type").alias("etype"))
        )
        .groupBy("entity_id", "etype")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    # deterministic argmax: min over (-votes, type) — most votes first,
    # lexicographically smallest type on ties (portable, no window)
    return (
        votes.groupBy("entity_id")
        .agg(
            F.min(
                F.struct((-F.col("votes")).alias("nv"), F.col("etype").alias("t"))
            ).alias("b"),
            F.sum("votes").alias("total_votes"),
        )
        .select(
            "entity_id",
            F.col("b.t").alias("entity_type"),
            (-F.col("b.nv")).cast("int").alias("votes"),
            F.col("total_votes").cast("int").alias("total_votes"),
        )
    )
