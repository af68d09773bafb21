"""C11 — skew handling: salted two-phase aggregation.

North_star requirement: "skewed entities (high-frequency URLs/surface
forms) are handled via salted repartitioning and broadcast of the hot
alias dictionary". AQE's skew-join splitting covers JOINS; a skewed
groupBy key needs an explicit salt: phase 1 aggregates (key, salt) —
spreading one hot key over ``n_salts`` reducers — phase 2 merges the
partials. Results are identical to a plain groupBy; only the shuffle
layout changes.

Use for algebraic aggregates (count/sum/min/max). For count-distinct
use the two-level (key, value) → key rewrite instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def salt_col(key: str, n_salts: int = DEFAULT_SALTS) -> Column:
    """Deterministic salt: xxhash64 of the whole row key-independent part
    would break merge; use a hash of monotonically varying physical id so
    a hot key's rows spread uniformly."""
    return F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))


def salted_count(df: DataFrame, key: str, n_salts: int = DEFAULT_SALTS) -> DataFrame:
    """groupBy(key).count() resistant to hot keys: two-phase with salt."""
    partial = (
        df.withColumn("_salt", salt_col(key, n_salts))
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").cast("long").alias("n"))


def salted_sum(df: DataFrame, key: str, value: str, n_salts: int = DEFAULT_SALTS) -> DataFrame:
    partial = (
        df.withColumn("_salt", salt_col(key, n_salts))
        .groupBy(key, "_salt")
        .agg(F.sum(value).alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").alias(f"sum_{value}"))
