"""Keyword/alias dictionary maintenance (A16-A19).

Reference parity (behavior matched, code fresh —
``backend/app/services/research_keyword.py``):
- terms normalized to lowercase; unique per (session_id, lower(term))
  (model index ``research_keyword.py:13``; normalize service line 68);
- bulk upsert modes (service lines 106-151):
  * ``skip``   — keep the existing row untouched;
  * ``upsert`` — incoming row overwrites weight/source/rationale/is_primary;
  * ``merge``  — weight = max(existing, incoming); rationale = '; '-joined;
    is_primary = OR. Concat order is made deterministic by sorting
    contributors (existing first, then incoming sorted by term/rationale);
- bulk delete by id-list reporting not_found (service lines 302-339).

All set-level semantics are expressed as DataFrame aggregations —
max / bool_or / concat_ws over collect_list — which run as partial
(map-side) aggregations at scale, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KEY = ["session_id", "term"]


def normalize_keywords(df: DataFrame) -> DataFrame:
    """Lowercase + trim term; drop empty terms (research_keyword.py:68)."""
    return df.withColumn("term", F.lower(F.trim(F.col("term")))).filter(
        F.length("term") > 0
    )


def dedup_keywords(df: DataFrame) -> DataFrame:
    """Enforce the (session_id, lower(term)) unique key: deterministic
    winner = highest weight, then lexically-first rationale."""
    w = Window.partitionBy(*KEY).orderBy(
        F.col("weight").desc_nulls_last(), F.col("rationale").asc_nulls_last()
    )
    return (
        normalize_keywords(df)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def bulk_upsert_keywords(existing: DataFrame, incoming: DataFrame, mode: str) -> DataFrame:
    """Set-level bulk upsert with the reference's three modes."""
    if mode not in ("skip", "upsert", "merge"):
        raise ValueError(f"unknown mode: {mode}")
    existing = normalize_keywords(existing)
    incoming = dedup_keywords(incoming)

    if mode == "skip":
        fresh = incoming.join(existing.select(*KEY), KEY, "left_anti")
        return existing.unionByName(fresh)

    if mode == "upsert":
        kept = existing.join(incoming.select(*KEY), KEY, "left_anti")
        return kept.unionByName(incoming)

    # merge: max(weight), '; '-joined rationale (existing first, then
    # incoming — deterministic), OR of is_primary, source from the
    # max-weight contributor (ties → existing).
    tagged = existing.withColumn("_src_rank", F.lit(0)).unionByName(
        incoming.withColumn("_src_rank", F.lit(1))
    )
    w = Window.partitionBy(*KEY).orderBy(
        F.col("weight").desc_nulls_last(), F.col("_src_rank").asc()
    )
    best = tagged.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    merged = tagged.groupBy(*KEY).agg(
        F.max("weight").alias("weight"),
        F.concat_ws(
            "; ",
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_src_rank", "rationale"))
                    ),
                    lambda s: F.array(s["rationale"]),
                )
            ),
        ).alias("rationale"),
        F.max(F.col("is_primary").cast("int")).cast("boolean").alias("is_primary"),
    )
    return merged.join(best.select(*KEY, "source"), KEY)


def upsert_keywords_non_null(
    existing: DataFrame, incoming: DataFrame, key: list[str] | None = None
) -> DataFrame:
    """A17 single-upsert semantics (ref ``research_keyword.py:47-61`` with
    the lines-118-126 nuance): update-if-exists overwrites ONLY the
    incoming fields that are not None — a None incoming field keeps the
    existing value — and not-found rows insert as-is.

    Set-level formulation: full-outer join on the key, per-field
    ``coalesce(incoming, existing)``. Identical to the reference's row
    loop for any batch size, including a single keyword.
    """
    key = key or KEY
    value_cols = [c for c in existing.columns if c not in key]
    if {c for c in incoming.columns if c not in key} != set(value_cols):
        raise ValueError("existing/incoming must share the same columns")
    e = existing.select(*key, *[F.col(c).alias(f"_e_{c}") for c in value_cols])
    i = incoming.select(*key, *[F.col(c).alias(f"_i_{c}") for c in value_cols])
    return e.join(i, key, "full_outer").select(
        *key,
        *[F.coalesce(F.col(f"_i_{c}"), F.col(f"_e_{c}")).alias(c) for c in value_cols],
    )


def bulk_delete_keywords(df: DataFrame, ids: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Delete rows whose id is in ``ids(id)``; also return the requested ids
    that were not found (research_keyword.py:302-339)."""
    remaining = df.join(ids, "id", "left_anti")
    not_found = ids.join(df.select("id"), "id", "left_anti")
    return remaining, not_found
