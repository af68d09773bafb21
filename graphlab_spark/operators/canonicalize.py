"""Stages C8+C9 — MinHash-LSH near-duplicate detection + connected
components to merge duplicate entities.

Reference parity: the reference deduplicates crawled papers per lab via
unique keys (``backend/app/models/research_paper.py:13-14``) and declares
entity canonicalization through the kg_upsert flow
(``backend/README.md:105``); fuzzy-merge semantics come from
``BASELINE.json`` ``north_star`` ("connected-components + MinHash-LSH
canonicalization to merge duplicate entities").

Scale design:
- MinHash-LSH is Spark ML ``MinHashLSH`` (seeded → deterministic) over
  ``HashingTF`` char-3-gram vectors; ``approxSimilarityJoin`` is a
  band-bucket shuffle join, never a cross join.
- Connected components is min-label propagation over DataFrame joins —
  components here are tiny variant clusters (diameter ≤ ~3), so the loop
  converges in a handful of iterations; ``localCheckpoint`` each
  iteration cuts lineage so plans don't grow exponentially.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from graphlab_spark.functions.embed import char_ngrams
from graphlab_spark.operators.mentions import _norm_key

LSH_SEED = 42
LSH_HASH_TABLES = 6
# similarity ≥ 0.72: a one-typo variant of a two-word name stays inside
# the threshold (J≈0.75-0.85) while two distinct names sharing one long
# word ("Acme Laboratories" / "Everest Laboratories", J≈0.5) stay outside.
DEFAULT_JACCARD_DIST = 0.28
_NUM_FEATURES = 1 << 18


@F.pandas_udf(T.ArrayType(T.StringType()))
def grams_udf(surfaces: pd.Series) -> pd.Series:
    return surfaces.map(lambda s: sorted(set(char_ngrams(_norm_key(s)))) if s else [])


def similarity_pairs(
    spark: SparkSession,
    items: DataFrame,
    id_col: str = "item_id",
    text_col: str = "surface",
    jaccard_dist: float = DEFAULT_JACCARD_DIST,
) -> DataFrame:
    """items(id, text) → undirected near-dup pairs (a, b, jaccard_dist).

    Band-bucket LSH join; falls back to nothing fancy — Spark ML only.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    feat = items.select(
        F.col(id_col).alias("item_id"),
        grams_udf(F.col(text_col)).alias("grams"),
    ).filter(F.size("grams") > 0)
    tf = HashingTF(inputCol="grams", outputCol="features", numFeatures=_NUM_FEATURES, binary=True)
    vec = tf.transform(feat)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=LSH_HASH_TABLES, seed=LSH_SEED
    )
    model = lsh.fit(vec)
    joined = model.approxSimilarityJoin(vec, vec, jaccard_dist, distCol="jdist")
    return (
        joined.select(
            F.col("datasetA.item_id").alias("a"),
            F.col("datasetB.item_id").alias("b"),
            F.col("jdist"),
        )
        .filter(F.col("a") < F.col("b"))
        .dropDuplicates(["a", "b"])
    )


def connected_components(
    edges: DataFrame, max_iter: int = 12, check_every: int = 2
) -> DataFrame:
    """edges(a, b) undirected → components(item_id, component_id=min id).

    Min-label propagation: each vertex takes the min label in its closed
    neighborhood until fixpoint. Deterministic; lineage cut per iteration.
    Convergence is checked every ``check_every`` iterations — each check
    is a Spark job, and entity-variant components have tiny diameters, so
    checking less often saves more scheduler overhead than it wastes in
    extra propagation rounds.
    """
    sym = (
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("src").alias("item_id"))
        .distinct()
        .withColumn("component_id", F.col("item_id"))
        .localCheckpoint()
    )
    for it in range(1, max_iter + 1):
        nbr_min = (
            sym.join(labels, sym.dst == labels.item_id)
            .groupBy("src")
            .agg(F.min("component_id").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr_min, labels.item_id == nbr_min.src, "left")
            .select(
                "item_id",
                F.least(
                    F.col("component_id"), F.coalesce(F.col("nbr_comp"), F.col("component_id"))
                ).alias("component_id"),
            )
            .localCheckpoint()
        )
        if it % check_every == 0 or it == max_iter:
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "item_id")
                .filter(F.col("n.component_id") != F.col("o.component_id"))
                .limit(1)
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
        else:
            labels = new_labels
    return labels


def canonicalize_stage(
    spark: SparkSession,
    entities: DataFrame,
    jaccard_dist: float = DEFAULT_JACCARD_DIST,
) -> DataFrame:
    """entities(entity_id, surface, is_known) → mapping(entity_id, canonical_id).

    The alias dictionary is authoritative: two KNOWN entities are never
    merged (known-known similarity pairs are dropped — they are distinct
    by construction, however similar their names). Unknown entities merge
    into the lexically smallest known entity of their connected component,
    or — for components with no known member — the smallest unknown id.
    Deterministic and stable across runs.
    """
    pairs = similarity_pairs(spark, entities, id_col="entity_id", jaccard_dist=jaccard_dist)
    known = entities.filter(F.col("is_known")).select(F.col("entity_id").alias("kid"))
    kb = F.broadcast(known)
    pairs = (
        pairs.join(kb.withColumnRenamed("kid", "a_k"), pairs.a == F.col("a_k"), "left")
        .join(kb.withColumnRenamed("kid", "b_k"), pairs.b == F.col("b_k"), "left")
        .filter(F.col("a_k").isNull() | F.col("b_k").isNull())  # drop known-known
        .select("a", "b")
    )
    comps = connected_components(pairs)
    comp_known_min = (
        comps.join(kb, comps.item_id == kb.kid)
        .groupBy("component_id")
        .agg(F.min("item_id").alias("known_min"))
    )
    return (
        entities.select("entity_id", "is_known")
        .distinct()
        .join(comps, F.col("entity_id") == F.col("item_id"), "left")
        .join(comp_known_min, "component_id", "left")
        .select(
            "entity_id",
            F.when(F.col("is_known"), F.col("entity_id"))
            .otherwise(
                F.coalesce(F.col("known_min"), F.col("component_id"), F.col("entity_id"))
            )
            .alias("canonical_id"),
        )
    )
