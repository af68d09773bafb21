"""Entity co-mention statistics over the KG mention stream.

Reference parity: the reference stores its paper/keyword graph in Neo4j
(``backend/app/utils/neo4j_client.py``), where related-entity
exploration is a Cypher neighborhood query; co-mention PMI is the
corpus-statistics primitive behind such exploration —
two surface forms that co-occur in the same documents far above chance
are related (and are linking/merge candidates that pure string or
embedding similarity misses).

PMI(a, b) = ln( n_ab · N / (n_a · n_b) ) over DISTINCT per-document
mention keys: n_a = documents mentioning a, n_ab = documents mentioning
both, N = documents with at least one mention.

Spark shape, built for web scale:
- The per-doc distinct (url, key) frame is the only corpus-sized input;
  the pair fan-out is a SELF-JOIN ON url, so its cost is Σ_doc k_d² —
  bounded by the per-document distinct-entity count (tens), never
  corpus × corpus. Heavy documents are capped upstream by the mention
  extractor's per-doc limits.
- Both groupBys partial-aggregate map-side; the per-key document-count
  frame is vocabulary-sized, so AQE broadcasts it into the final joins.
- N is a ONE-ROW aggregate broadcast back (BroadcastNestedLoopJoin) —
  no driver-side collect in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def comention_pmi(
    doc_keys: DataFrame,
    url_col: str = "url",
    key_col: str = "skey",
    min_pairs: int = 2,
) -> DataFrame:
    """(url, key) pairs → (key_a, key_b, n_ij, pmi) for unordered key
    pairs co-mentioned in ≥ ``min_pairs`` documents; key_a < key_b.
    Input need not be distinct — it is made so here.
    """
    dk = doc_keys.select(
        F.col(url_col).alias("url"), F.col(key_col).alias("skey")
    ).distinct()
    stats = dk.agg(F.count_distinct("url").alias("_N"))
    ni = dk.groupBy("skey").agg(F.count(F.lit(1)).alias("n"))
    a = dk.alias("a")
    b = dk.alias("b")
    pairs = (
        a.join(b, "url")
        .filter(F.col("a.skey") < F.col("b.skey"))
        .select(F.col("a.skey").alias("key_a"), F.col("b.skey").alias("key_b"))
    )
    nij = (
        pairs.groupBy("key_a", "key_b")
        .agg(F.count(F.lit(1)).alias("n_ij"))
        .filter(F.col("n_ij") >= min_pairs)
    )
    na = ni.select(F.col("skey").alias("key_a"), F.col("n").alias("_na"))
    nb = ni.select(F.col("skey").alias("key_b"), F.col("n").alias("_nb"))
    return (
        nij.join(na, "key_a")
        .join(nb, "key_b")
        .crossJoin(F.broadcast(stats))
        .select(
            "key_a",
            "key_b",
            "n_ij",
            F.round(
                F.log(
                    (F.col("n_ij") * F.col("_N"))
                    / (F.col("_na") * F.col("_nb"))
                ),
                4,
            ).alias("pmi"),
        )
    )
