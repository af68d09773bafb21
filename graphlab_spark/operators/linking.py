"""Stages C6+C7 — blocking + embedding-cosine entity linking.

Reference parity: confidence-scored analysis results
(``backend/app/models/paper_analysis.py:19``); semantics per
``BASELINE.json`` ``north_star`` ("TF-IDF + alias-dictionary blocking
followed by embedding cosine-score entity linking ... broadcast of the
hot alias dictionary").

Scale design:
- Link DISTINCT surfaces, not raw mentions — surface frequency is Zipf,
  so the expensive scoring runs on the (bounded) vocabulary while the
  final assignment is a join back to mentions. At 100 TB the mention
  table is ~10^12 rows but distinct surfaces are ~10^8.
- Alias dictionary is the small hot side → ``F.broadcast`` everywhere
  (north_star C11). No shuffle touches the big side until the last
  mention←link join, where AQE skew-join splits hot surfaces.
- Candidate generation is bounded: block keys = first-token key +
  min-K hashed char-3-grams + rarest-token (TF-IDF) key, never a
  cross join.
"""

from __future__ import annotations

from hashlib import blake2b

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from graphlab_spark.functions.embed import char_ngrams, cosine_pairs_udf, embed_udf
from graphlab_spark.operators.mentions import _norm_key

MINK_GRAMS = 8
DEFAULT_THRESHOLD = 0.70


def _block_keys(surface: str | None) -> list[str]:
    if not surface:
        return []
    key = _norm_key(surface)
    keys = {"t0:" + key.split(" ")[0]}
    grams = sorted(
        char_ngrams(key),
        key=lambda g: blake2b(g.encode(), digest_size=8).digest(),
    )[:MINK_GRAMS]
    keys.update("g:" + g for g in grams)
    return sorted(keys)


@F.pandas_udf(T.ArrayType(T.StringType()))
def block_keys_udf(surfaces: pd.Series) -> pd.Series:
    return surfaces.map(_block_keys)


@F.pandas_udf(T.StringType())
def norm_key_udf(surfaces: pd.Series) -> pd.Series:
    return surfaces.map(lambda s: _norm_key(s) if s else None)


def rarest_token_blocks(surfaces: DataFrame, col: str = "surface") -> DataFrame:
    """TF-IDF-style blocking: block each surface on its rarest token
    (max IDF = min document frequency across the surface vocabulary)."""
    toks = surfaces.select(
        col, F.explode(F.split(norm_key_udf(F.col(col)), " ")).alias("tok")
    ).filter(F.length("tok") >= 2)
    dfreq = toks.groupBy("tok").agg(F.countDistinct(col).alias("df"))
    w = Window.partitionBy(col).orderBy(F.col("df").asc(), F.col("tok").asc())
    return (
        toks.join(dfreq, "tok")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(col, F.concat(F.lit("r:"), F.col("tok")).alias("block_key"))
    )


def link_surfaces(
    spark: SparkSession,
    surfaces: DataFrame,
    aliases: DataFrame,
    threshold: float = DEFAULT_THRESHOLD,
) -> DataFrame:
    """surfaces(surface) × aliases(alias, canonical_id, entity_type) →
    links(surface, canonical_id, entity_type, score, method)."""
    alias_keyed = aliases.select(
        "alias",
        "canonical_id",
        "entity_type",
        norm_key_udf(F.col("alias")).alias("akey"),
    )

    # --- exact path: normalized-key hit in the broadcast alias dict
    skeys = surfaces.select("surface", norm_key_udf(F.col("surface")).alias("skey"))
    exact_join = skeys.join(
        F.broadcast(alias_keyed), F.col("skey") == F.col("akey"), "left"
    )
    exact = (
        exact_join.filter(F.col("canonical_id").isNotNull())
        .select(
            "surface",
            "canonical_id",
            "entity_type",
            F.lit(1.0).alias("score"),
            F.lit("exact").alias("method"),
        )
        .dropDuplicates(["surface"])  # an alias maps to exactly one entity
    )
    unmatched = exact_join.filter(F.col("canonical_id").isNull()).select("surface")

    # --- fuzzy path: blocked candidates → batched cosine → top-1 ≥ threshold
    sblocks = unmatched.select(
        "surface", F.explode(block_keys_udf(F.col("surface"))).alias("block_key")
    ).unionByName(rarest_token_blocks(unmatched))
    ablocks = alias_keyed.select(
        "alias",
        "canonical_id",
        "entity_type",
        F.explode(block_keys_udf(F.col("alias"))).alias("block_key"),
    )
    cand = (
        sblocks.join(F.broadcast(ablocks), "block_key")
        .select("surface", "alias", "canonical_id", "entity_type")
        .dropDuplicates(["surface", "alias"])
    )
    scored = cand.withColumn(
        "score",
        cosine_pairs_udf(
            embed_udf(norm_key_udf(F.col("surface"))),
            embed_udf(norm_key_udf(F.col("alias"))),
        ),
    )
    w = Window.partitionBy("surface").orderBy(
        F.col("score").desc(), F.col("canonical_id").asc()
    )
    fuzzy = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("score") >= threshold))
        .select("surface", "canonical_id", "entity_type", "score", F.lit("fuzzy").alias("method"))
    )
    return exact.unionByName(fuzzy)


def linking_stage(
    spark: SparkSession,
    mentions: DataFrame,
    aliases: DataFrame,
    threshold: float = DEFAULT_THRESHOLD,
) -> DataFrame:
    """mentions + alias dict → linked mentions (adds canonical_id/score/method;
    unlinked mentions keep canonical_id = NULL for canonicalization)."""
    surfaces = mentions.select("surface").distinct()
    links = link_surfaces(spark, surfaces, aliases, threshold)
    # links is vocabulary-sized → broadcast; AQE splits skewed hot surfaces.
    return mentions.join(
        F.broadcast(links.withColumnRenamed("score", "link_score")),
        "surface",
        "left",
    )
