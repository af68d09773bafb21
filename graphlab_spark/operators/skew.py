"""C11 — skew handling: salted two-phase aggregation + salted replicate join.

North_star requirement: "skewed entities (high-frequency URLs/surface
forms) are handled via salted repartitioning and broadcast of the hot
alias dictionary". AQE's skew-join splitting covers sort-merge JOINS; a
skewed groupBy key needs an explicit salt: phase 1 aggregates
(key, salt) — spreading one hot key over ``n_salts`` reducers — phase 2
merges the partials. Results are identical to a plain groupBy; only the
shuffle layout changes.

Determinism: the salt is a hash of ROW CONTENT (every column), never of
``monotonically_increasing_id()``/``rand()`` — a nondeterministic
expression used as a shuffle key double-counts or drops rows when a map
task is recomputed under retry/speculation (the exact 1000-executor
scenario this operator targets). Content-hash salting is retry-safe; its
limit is that fully-identical rows share a salt, so a hot key consisting
of byte-identical rows does not spread — real event/mention rows always
carry a distinguishing column (timestamp, id, span).

Use for algebraic aggregates (count/sum/min/max). For count-distinct
use the two-level (key, value) → key rewrite instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def salt_col(df: DataFrame, n_salts: int = DEFAULT_SALTS) -> Column:
    """Deterministic per-row salt: xxhash64 over every column of ``df``.

    Stable under task retry/speculation (pure function of row content);
    spreads a hot key across ``n_salts`` reducers as long as its rows are
    not byte-identical.
    """
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))


def salted_count(df: DataFrame, key: str, n_salts: int = DEFAULT_SALTS) -> DataFrame:
    """groupBy(key).count() resistant to hot keys: two-phase with salt."""
    partial = (
        df.withColumn("_salt", salt_col(df, n_salts))
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").cast("long").alias("n"))


def salted_sum(df: DataFrame, key: str, value: str, n_salts: int = DEFAULT_SALTS) -> DataFrame:
    partial = (
        df.withColumn("_salt", salt_col(df, n_salts))
        .groupBy(key, "_salt")
        .agg(F.sum(value).alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").alias(f"sum_{value}"))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
    check_unique: bool = True,
) -> DataFrame:
    """Replicated skew join: big side salted by row content, small side
    replicated ``n_salts``× — a hot join key spreads over ``n_salts``
    reducers instead of landing on one straggler task.

    Identical result to ``big.join(small, key, how)``. Use when the big
    side's key distribution is Zipf and the small side is too large to
    broadcast outright (otherwise prefer broadcast / AQE skew-join).
    Supported ``how``: inner / left. Replication semantics require
    ``small`` UNIQUE per key (the dimension-join contract): for
    ``how='left'`` an unmatched big-side row survives once per salt
    because exactly one of the ``n_salts`` replicas can match it — a
    duplicated small key would also duplicate inner matches. Guarded by
    ``check_unique`` (one aggregate job over the small side — mirroring
    ``materialize.combined_frame``'s guard; pass ``check_unique=False``
    when uniqueness is already structurally guaranteed, e.g. a groupBy
    output).

    Misuse warning: the salt hashes ROW CONTENT, so if ``big`` carries no
    column beyond the join key, every row of a hot key gets the same salt
    and nothing spreads — keep a distinguishing column (id, timestamp)
    on the big side.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got: {how}")
    if set(big.columns) == {key}:
        import warnings

        warnings.warn(
            "salted_join: big side has no column beyond the join key — the "
            "content-hash salt is then a pure function of the key, so a hot "
            "key does NOT spread across reducers. Keep a distinguishing "
            "column (id/timestamp) on the big side.",
            stacklevel=2,
        )
    if check_unique:
        dup = (
            small.groupBy(key)
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"salted_join requires the small side unique per {key!r} "
                f"(found duplicate key {dup[0][0]!r}); de-duplicate it or "
                "use a plain join"
            )
    b = big.withColumn("_salt", salt_col(big, n_salts))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    return b.join(s, [key, "_salt"], how).drop("_salt")
