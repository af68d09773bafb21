"""Graph-query surface over the materialized nodes/edges tables.

Reference parity: the reference serves its knowledge graph from Neo4j —
its chatbot answers by traversing nodes/relationships with Cypher and
citing them back (``neo4j_refs`` on messages, ``backend/app/models/
message.py:22-27``; one graph per lab, ``backend/README.md:18-20``).
The columnar analog: the ``edges(src, pred, dst, ...)`` table IS the
adjacency list, and a k-hop neighborhood is k self-joins — each hop is
one shuffle join on the frontier, broadcastable while the frontier is
small (it always starts at 1 row).

At 10^12-edge scale: bucket the edges table by ``src`` so hops are
co-partitioned joins; the frontier stays tiny relative to the corpus, so
Catalyst/AQE broadcast it — a 3-hop query touches only the reachable
subgraph, never the full table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def undirected(edges: DataFrame) -> DataFrame:
    """Symmetrized distinct adjacency (src, dst) from the edges table."""
    e = edges.select("src", "dst")
    return e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def k_hop_neighbors(edges: DataFrame, seed: str, k: int = 2) -> DataFrame:
    """Entities reachable from ``seed`` within ``k`` undirected hops
    (excluding the seed itself) → (id, hop) with hop = first hop reached.

    Deterministic: hop = min distance; ties impossible by construction
    (a node is claimed at its first frontier).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    adj = undirected(edges)
    visited = adj.sparkSession.createDataFrame([(seed, 0)], "id string, hop int")
    frontier = visited.select("id")
    for hop in range(1, k + 1):
        nxt = (
            adj.join(frontier.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
            .withColumn("hop", F.lit(hop))
        )
        # frontier is vocabulary-small — pin it so the loop's lineage
        # doesn't grow (same scratch-parquet policy as everywhere else)
        from graphlab_spark.operators.scratch import materialize

        nxt = materialize(nxt, f"khop_{hop}")
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt)
        frontier = nxt.select("id")
    return visited.filter(F.col("hop") > 0).select("id", "hop")
