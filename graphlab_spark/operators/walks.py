"""Deterministic graph random walks + skip-gram training pairs.

DeepWalk/node2vec-style embedding trainers (Perozzi et al. 2014, public
method) consume (center, context) node pairs sampled by short random
walks over the graph. Together with
:mod:`graphlab_spark.operators.negatives` this completes the KG-embedding
training-data surface: walks → skip-gram positives, corrupted tails →
negatives.

Walks here are DETERMINISTIC — the next hop from ``node`` at ``step`` is
the out-neighbor minimizing ``md5(node|step|dst|salt)`` — because at
10^12-doc scale the sampler must be resumable and oracle-checkable;
"random" only needs to mean decorrelated from graph structure, which a
cryptographic hash gives. Distinct salts give independent walk sets.

Tie-break portability: the argmin is ``min(md5_hex || dst)`` — md5 hex
is fixed-width 32, so the string min orders by (hash, dst) and
``substr(·, 33)`` recovers the neighbor; the identical expression runs
in ANSI SQL (``min_by`` breaks ties arbitrarily, so it is NOT used).

Scale shape per step: one hash equi-join of the frontier (O(nodes) rows,
AQE-broadcastable against a src-bucketed edge table) with the adjacency,
then a partial-aggregated min — never a window over the whole walk set.
Walk length is a small constant, so the plan is ``length`` joins deep;
for long walks pin the frontier per step (the pagerank loop discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MD5_HEX_LEN = 32


def deterministic_walks(
    edges: DataFrame, length: int = 3, salt: str = "walk"
) -> DataFrame:
    """One walk per start node over the DIRECTED edge set → rows
    ``(walk_id, pos:int, node)`` with pos 0..length. A walk ends early
    at a node with no out-edges (no self-padding rows)."""
    adj = edges.select("src", "dst").distinct()
    starts = (
        adj.select(F.col("src").alias("node"))
        .union(adj.select(F.col("dst").alias("node")))
        .distinct()
        .withColumn("walk_id", F.col("node"))
    )
    frontier = starts.select("walk_id", "node")
    out = [frontier.select("walk_id", F.lit(0).cast("int").alias("pos"), "node")]
    for step in range(1, length + 1):
        key = F.concat(
            F.md5(
                F.concat_ws(
                    "|", F.col("node"), F.lit(str(step)), F.col("dst"), F.lit(salt)
                )
            ),
            F.col("dst"),
        )
        frontier = (
            frontier.join(adj, frontier["node"] == adj["src"])
            .groupBy("walk_id")
            .agg(F.min(key).alias("_k"))
            .select(
                "walk_id", F.substring(F.col("_k"), MD5_HEX_LEN + 1, 1 << 20).alias("node")
            )
        )
        out.append(
            frontier.select("walk_id", F.lit(step).cast("int").alias("pos"), "node")
        )
    res = out[0]
    for part in out[1:]:
        res = res.union(part)
    return res


def skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """(center, context) pairs within ``window`` positions on the same
    walk, excluding pos distance 0 — the skip-gram positives. Self-join
    keyed on walk_id (bounded fan-out: walk length × window), distinct
    because one pair may occur at several offsets."""
    a = walks.select(
        F.col("walk_id"), F.col("pos").alias("_pa"), F.col("node").alias("center")
    )
    b = walks.select(
        F.col("walk_id"), F.col("pos").alias("_pb"), F.col("node").alias("context")
    )
    return (
        a.join(b, "walk_id")
        .filter(
            (F.abs(F.col("_pa") - F.col("_pb")) <= window)
            & (F.col("_pa") != F.col("_pb"))
        )
        .select("center", "context")
        .distinct()
    )
