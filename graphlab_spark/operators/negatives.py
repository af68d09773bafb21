"""Link-prediction training negatives: deterministic corrupted-tail
sampling over the materialized KG edges.

Downstream of graph materialize (reference: the node/edge tables built by
``backend/app/services/neo4j_connection.py``'s sync are what a KG
embedding model trains on), a link-prediction trainer needs, for every
true edge ``(src, pred, dst)``, k NEGATIVE edges ``(src, pred, neg_dst)``
that are NOT in the graph (TransE/DistMult-style corrupted tails,
Bordes et al. 2013 — public method). At 10^12-doc scale the edge table is
the largest KG artifact, so the sampler must be:

- **deterministic** (resumable / oracle-checkable): the candidate for
  ``(edge, j)`` is a pure hash of the edge key and ``j``, never an RNG;
- **join-shaped, never collect-shaped**: candidates map to vocabulary
  rows via an equi-join on a dense index (uniform hash values → perfectly
  balanced shuffle), and false negatives are removed with a hash
  anti-join on the true-edge key — no all-pairs step anywhere;
- **vocabulary-bounded on the driver**: the only driver syncs are the
  per-partition index counts (``num_index_partitions`` rows) and the
  1-row vocabulary size — the IVF-train posture, never O(edges).

Engine-portable arithmetic: the candidate index is the first 12 hex
chars of md5 (48 bits, exact in a BIGINT on both engines) mod |V| —
Spark ``conv(substring(md5(x),1,12),16,10)`` ≡ DuckDB
``CAST('0x' || substr(md5(x),1,12) AS BIGINT)`` (the winnowing/t05
md5-portability pattern, functions/textstats.py:167).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HASH_HEX_DIGITS = 12  # 48 bits: exact in BIGINT on Spark AND DuckDB


def contiguous_index(df: DataFrame, key: str, num_partitions: int = 32) -> DataFrame:
    """Dense 0-based global rank of UNIQUE ``key`` values, built without
    a single-reducer sort: range-shuffle on the key, count each range
    (``num_partitions`` rows to the driver — bounded by the parameter,
    never by data), then rank WITHIN each range in parallel and add the
    cumulative offset. The result is invariant to where the sampled
    range boundaries land, so it is deterministic even though
    ``repartitionByRange`` samples: index(k) = #{k' < k} either way.

    The one-window-partition alternative (``row_number`` over a global
    ORDER BY) funnels the whole table through one task — this is the
    shape that survives a 10^9-row vocabulary.

    Keys must be unique (ranks would be ambiguous otherwise); callers
    pass the output of a ``.distinct()``.
    """
    ranged = df.repartitionByRange(num_partitions, F.col(key)).withColumn(
        "_pid", F.spark_partition_id()
    )
    # bounded driver sync: one row per range partition
    counts = sorted(
        (r["_pid"], r["n"])
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets, acc = {}, 0
    for pid, n in counts:
        offsets[pid] = acc
        acc += n
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()] or [(0, 0)],
        "_pid INT, _off BIGINT",
    )
    w = Window.partitionBy("_pid").orderBy(key)
    return (
        ranged.join(F.broadcast(off_df), "_pid")
        .withColumn("idx", F.row_number().over(w) - 1 + F.col("_off"))
        .drop("_pid", "_off")
    )


def _portable_hash_long(*cols) -> F.Column:
    """First 12 hex chars of md5 over a '|'-joined key, as a BIGINT —
    bit-identical in ANSI SQL (see module docstring)."""
    return F.conv(
        F.substring(F.md5(F.concat_ws("|", *cols)), 1, HASH_HEX_DIGITS), 16, 10
    ).cast("long")


def corrupt_tail_negatives(
    edges: DataFrame,
    k: int = 2,
    salt: str = "neg",
    num_index_partitions: int = 32,
) -> DataFrame:
    """k corrupted-tail negatives per distinct true edge.

    For each ``(src, pred, dst)`` and j in 1..k, the candidate tail is
    vocabulary row ``md5_48(src|pred|dst|j|salt) mod |V|`` where V is the
    distinct src∪dst node set of ``edges``. Candidates equal to the true
    tail or forming an existing ``(src, pred, ·)`` edge are dropped (hash
    anti-join), so an edge may yield fewer than k rows — deterministic,
    never silently wrong. Returns
    ``(src, pred, dst, j:int, neg_dst)``.
    """
    true_edges = edges.select("src", "pred", "dst").distinct()
    vocab = (
        true_edges.select(F.col("src").alias("id"))
        .union(true_edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    indexed = contiguous_index(vocab, "id", num_index_partitions)
    n_vocab = indexed.count()  # 1-row driver sync, vocabulary-sized job
    if n_vocab == 0:
        return true_edges.select(
            "src", "pred", "dst", F.lit(1).alias("j"), F.col("dst").alias("neg_dst")
        ).limit(0)
    cand = (
        true_edges.withColumn("j", F.explode(F.sequence(F.lit(1), F.lit(k))))
        .withColumn("j", F.col("j").cast("int"))
        .withColumn(
            "cand_idx",
            F.pmod(
                _portable_hash_long(
                    "src", "pred", "dst", F.col("j").cast("string"), F.lit(salt)
                ),
                F.lit(n_vocab),
            ),
        )
    )
    sampled = (
        cand.join(indexed, cand["cand_idx"] == indexed["idx"])
        .select("src", "pred", "dst", "j", F.col("id").alias("neg_dst"))
        .filter(F.col("neg_dst") != F.col("dst"))
    )
    # remove false negatives: candidates that are themselves true edges
    return sampled.join(
        true_edges.select(
            F.col("src").alias("src"),
            F.col("pred").alias("pred"),
            F.col("dst").alias("neg_dst"),
        ),
        ["src", "pred", "neg_dst"],
        "left_anti",
    ).select("src", "pred", "dst", "j", "neg_dst")
