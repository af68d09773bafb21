"""Type-2 slowly-changing-dimension history for entity attributes.

A monthly re-crawl republishes the KG's node/edge attribute tables
(n_docs evidence counts, labels, degrees). ``graph_delta`` answers
"what changed between two snapshots"; SCD2 answers the longitudinal
question — "what was this entity's attribute value AT crawl T" — by
maintaining one history table with ``valid_from``/``valid_to`` crawl
ids per attribute version. This is the standard warehouse type-2
dimension discipline applied to KG provenance (the reference keeps
only latest-state rows and timestamps —
`backend/app/models/lab.py:26-27` created_at/updated_at with
onupdate=func.now() — so point-in-time reads are impossible there;
this is the beyond-reference capability that makes them possible).

Versions are keyed by CRAWL ID (monotone BIGINT), not wall-clock:
exact integer arithmetic end-to-end, so the DuckDB oracle matches
hash-for-hash and point-in-time predicates never hit timezone or
precision skew.

Scale shape: one hash FULL OUTER join per applied snapshot, on the
entity key, between the OPEN slice of the history and the snapshot —
closed rows never enter the join (they stream through a union). Attr
comparison is one null-safe struct equality (JVM). On parquet the
emulation rewrites the table; on Iceberg the same maintenance is ONE
``MERGE INTO`` on (key, valid_from) — the merge_into_sql seam. At
10^11 entities, partition the history by ``valid_to IS NULL`` so the
open slice (≈ one crawl's entity count) is the only side scanned per
apply, and point-in-time reads prune to closed partitions.

Idempotence: re-applying the same snapshot at the same crawl id is a
no-op (pinned by test) — the resume/checkpoint contract every other
materialization here honors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_init(
    snapshot: DataFrame, keys: list[str], attrs: list[str], as_of: int
) -> DataFrame:
    """First crawl → open history: every row valid from ``as_of``,
    ``valid_to`` NULL (open)."""
    return snapshot.select(
        *keys,
        *attrs,
        F.lit(as_of).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
    )


def scd2_apply(
    history: DataFrame, snapshot: DataFrame, keys: list[str], attrs: list[str], as_of: int
) -> DataFrame:
    """Fold crawl ``as_of``'s snapshot into the history:

    - attrs unchanged → open row passes through untouched;
    - attrs changed  → old version closes at ``as_of``, a new open
      version starts at ``as_of``;
    - key absent from the snapshot → the open row closes (entity gone
      from the crawl);
    - new key → a new open row.

    Closed rows are immutable and never join. Returns the full new
    history (closed ∪ maintained-open ∪ inserts)."""
    closed = history.filter(F.col("valid_to").isNotNull())
    # USING-join coalesces the key columns, so side presence is carried
    # by indicator columns, not per-side key refs
    open_ = (
        history.filter(F.col("valid_to").isNull())
        .withColumn("_in_o", F.lit(1))
        .alias("o")
    )
    snap = snapshot.select(*keys, *attrs).withColumn("_in_s", F.lit(1)).alias("s")

    j = open_.join(snap, keys, "full_outer")
    in_o = F.col("_in_o").isNotNull()
    in_s = F.col("_in_s").isNotNull()
    # null-safe struct equality: one JVM comparison across all attrs
    same = F.struct(*[F.col(f"o.{a}") for a in attrs]).eqNullSafe(
        F.struct(*[F.col(f"s.{a}") for a in attrs])
    )

    def _ver(side: str, vfrom, vto) -> F.Column:
        return F.struct(
            *[F.col(f"{side}.{a}").alias(a) for a in attrs],
            vfrom.cast("long").alias("valid_from"),
            vto.cast("long").alias("valid_to"),
        )

    null_l = F.lit(None)
    keep = _ver("o", F.col("o.valid_from"), null_l)
    close = _ver("o", F.col("o.valid_from"), F.lit(as_of))
    insert = _ver("s", F.lit(as_of), null_l)
    # ONE pass over the joined rows: each emits its 1–2 output versions
    # (changed keys emit close+insert) — the FOJ is never re-derived per
    # output branch, so one apply is exactly one shuffle pair
    versions = (
        F.when(in_o & in_s & same, F.array(keep))
        .when(in_o & in_s, F.array(close, insert))
        .when(in_o, F.array(close))
        .otherwise(F.array(insert))
    )
    folded = j.select(*keys, F.explode(versions).alias("_v")).select(
        *keys, *[F.col(f"_v.{c}") for c in attrs + ["valid_from", "valid_to"]]
    )
    return closed.unionByName(folded)


def scd2_as_of(history: DataFrame, crawl_id: int) -> DataFrame:
    """Point-in-time read: each key's attribute row as of ``crawl_id``
    (valid_from ≤ id < valid_to, open = ∞). A pure filter — with the
    history partitioned on the open flag this prunes, never shuffles."""
    return history.filter(
        (F.col("valid_from") <= F.lit(crawl_id))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(crawl_id)))
    ).drop("valid_from", "valid_to")
