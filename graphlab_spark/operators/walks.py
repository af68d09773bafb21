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


def node2vec_walks(
    edges: DataFrame,
    length: int = 3,
    p: float = 1.0,
    q: float = 1.0,
    salt: str = "n2v",
) -> DataFrame:
    """Second-order BIASED walks (node2vec, Grover & Leskovec 2016,
    public method): one walk per start node → ``(walk_id, pos, node)``.
    From current node ``v`` (previous ``t``), each out-neighbor ``x``
    carries the node2vec search bias α: 1/p if ``x == t`` (return),
    1 if ``(t, x)`` is an edge (distance-1 / BFS-ish), 1/q otherwise
    (distance-2 / DFS-ish). Step 1 has no previous node — all
    candidates take the same class, which makes the draw uniform.

    Deterministic WEIGHTED choice via A-Res weighted sampling (Efraimidis
    & Spirakis): candidate key = u^(1/α) with u ∈ (0,1) derived from
    ``md5(walk_id|step|dst|salt)`` (13 hex chars = 52 uniform bits, so
    u is exact in a double); the argmax key wins, ties broken by dst —
    ``max(struct(key, dst))``, never ``max_by`` (arbitrary ties). One
    draw per (walk, step) is exactly one weighted sample without
    replacement of size 1. p = q = 1 degenerates to an unbiased walk
    (NOT bit-equal to :func:`deterministic_walks` — different hash key —
    but the same distribution family). Pinned against an exact Python
    replica in tests/test_walks_node2vec.py.

    Scale shape per step: frontier⋈adjacency (the first-order cost) plus
    ONE extra hash equi-join of the candidate set against the edge set
    on (prev, dst) for the distance-1 test — the irreducible price of
    second-order bias; both joins are equi-joins on bucketable keys,
    and the per-walk argmax is a partial-aggregated groupBy, never a
    window over the candidate set.
    """
    if p <= 0 or q <= 0:
        raise ValueError("p and q must be positive")
    adj = edges.select("src", "dst").distinct()
    common = adj.select(
        F.col("src").alias("_cp"), F.col("dst").alias("_cd"),
        F.lit(True).alias("_common"),
    )
    starts = (
        adj.select(F.col("src").alias("node"))
        .union(adj.select(F.col("dst").alias("node")))
        .distinct()
        .withColumn("walk_id", F.col("node"))
    )
    frontier = starts.select(
        "walk_id", F.lit(None).cast("string").alias("prev"), "node"
    )
    out = [frontier.select("walk_id", F.lit(0).cast("int").alias("pos"), "node")]
    for step in range(1, length + 1):
        cand = (
            frontier.join(adj, frontier["node"] == adj["src"])
            .select("walk_id", "prev", "node", "dst")
            .join(
                common,
                (F.col("prev") == F.col("_cp")) & (F.col("dst") == F.col("_cd")),
                "left",
            )
        )
        u = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.col("walk_id"),
                            F.lit(str(step)),
                            F.col("dst"),
                            F.lit(salt),
                        )
                    ),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("double")
            + F.lit(0.5)
        ) / F.lit(float(1 << 52))
        alpha = (
            F.when(F.col("dst") == F.col("prev"), F.lit(1.0 / p))
            .when(F.col("_common").isNotNull(), F.lit(1.0))
            .otherwise(F.lit(1.0 / q))
        )
        key = F.pow(u, F.lit(1.0) / alpha)
        frontier = (
            cand.groupBy("walk_id", "node")
            .agg(F.max(F.struct(key.alias("k"), F.col("dst").alias("d"))).alias("_p"))
            .select(
                "walk_id",
                F.col("node").alias("prev"),
                F.col("_p.d").alias("node"),
            )
        )
        out.append(
            frontier.select("walk_id", F.lit(step).cast("int").alias("pos"), "node")
        )
    res = out[0]
    for part in out[1:]:
        res = res.union(part)
    return res
