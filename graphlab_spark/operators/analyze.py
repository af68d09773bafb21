"""ANALYZE-style per-column table statistics.

Every warehouse keeps per-column stats (row count, null count, NDV,
min/max) to drive pruning and join planning; at ingest time the same
numbers are the data-quality report each batch publishes. This is the
operator form: one job over the table, long-format output
``(column, n_rows, n_nulls, n_distinct, min_str, max_str)``.

Two NDV modes:
- exact (default here, and what the DuckDB oracle replays): Spark plans
  multi-column COUNT(DISTINCT) via Expand — shuffle volume is
  O(rows × audited columns). Right for bounded audits and tests.
- ``approx=True``: HyperLogLog++ ``approx_count_distinct`` — ONE pass,
  map-side partial aggregation, no Expand. This is the 100-TB path
  (rows-only accurate by construction; rsd defaults to 5%).

Min/max are cast to string so one frame carries heterogeneous column
types (the caller keeps numeric semantics by re-casting; engines
format floats differently, so gates stick to int/string columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_stats(
    df: DataFrame, cols: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_str, max_str) per
    audited column — one aggregation job, long format."""
    cols = cols if cols is not None else df.columns
    nd = (
        (lambda c: F.approx_count_distinct(c))
        if approx
        else (lambda c: F.countDistinct(c))
    )
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            # coalesce: SUM over zero rows is NULL, the report wants 0
            F.coalesce(F.sum(F.col(c).isNull().cast("long")), F.lit(0)).alias(
                f"_nulls_{c}"
            ),
            nd(c).alias(f"_nd_{c}"),
            F.min(c).cast("string").alias(f"_min_{c}"),
            F.max(c).cast("string").alias(f"_max_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"_nulls_{c}").alias("n_nulls"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_str"),
                F.col(f"_max_{c}").alias("max_str"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("s")).select("s.*")


def datacard(
    docs: DataFrame,
    text_col: str = "text",
    dims: tuple[str, ...] = ("lang", "source"),
) -> DataFrame:
    """Corpus data-card report → ``(section, key, n_docs, n_tokens)``:
    document count and whitespace-token mass per value of each ``dims``
    column plus a 'total' row — the summary table every dataset release
    publishes (and the per-snapshot diffable health report at 100 TB).

    One scan; each section is a partial-aggregated groupBy over the
    SAME projected frame (Spark reuses the scan across the union);
    all-integer outputs so cross-engine compares are exact."""
    from graphlab_spark.functions.textstats import token_count_col

    base = docs.select(*dims, token_count_col(text_col).alias("_n"))
    parts = []
    for d in dims:
        parts.append(
            base.groupBy(F.col(d).alias("key"))
            .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("_n").alias("n_tokens"))
            .select(F.lit(d).alias("section"), "key", "n_docs", "n_tokens")
        )
    total = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("_n").alias("n_tokens")
    ).select(
        F.lit("total").alias("section"), F.lit("all").alias("key"),
        "n_docs", "n_tokens",
    )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.unionByName(total)


def validate_expectations(
    df: DataFrame, rules: list[tuple[str, str, object]]
) -> DataFrame:
    """Declarative data-contract validation (the Great-Expectations
    pattern as ONE Spark job): ``rules`` is a list of
    ``(column, rule, param)`` with rules

    - ``not_null``          (param ignored)
    - ``min`` / ``max``     value bound (inclusive), NULLs don't violate
    - ``in_set``            param = allowed-value list, NULLs don't violate
    - ``matches``           param = regexp that must match SOMEWHERE in
                            the value (search semantics — ``rlike`` /
                            DuckDB ``regexp_matches``; anchor with ^$
                            for full-match), NULLs don't violate
    - ``unique``            no duplicated non-null values

    → long-format report ``(column, rule, param, n_violations, ok)``,
    one row per rule.

    Scale shape: every row-level rule is a ``SUM(CASE WHEN …)`` inside
    ONE partial-aggregated scan — adding rules adds columns to the
    aggregate, never passes; ``unique`` rides the same aggregate as
    ``count(col) − countDistinct(col)`` (exact — plan grows an Expand
    per unique-rule, the table_stats trade-off; keep unique rules to
    key columns). The single output row explodes to the long report
    (the table_stats shape).
    """
    if not rules:
        raise ValueError("rules must be non-empty")
    aggs = []
    for i, (col, rule, param) in enumerate(rules):
        c = F.col(col)
        if rule == "not_null":
            bad = c.isNull()
        elif rule == "min":
            bad = c < F.lit(param)
        elif rule == "max":
            bad = c > F.lit(param)
        elif rule == "in_set":
            bad = ~c.isin(list(param)) & c.isNotNull()
        elif rule == "matches":
            bad = ~c.rlike(str(param)) & c.isNotNull()
        elif rule == "unique":
            aggs.append(
                (F.count(c) - F.countDistinct(c)).alias(f"_v{i}")
            )
            continue
        else:
            raise ValueError(f"unknown rule: {rule!r}")
        aggs.append(
            F.coalesce(F.sum(bad.cast("long")), F.lit(0)).alias(f"_v{i}")
        )
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(col).alias("column"),
                F.lit(rule).alias("rule"),
                F.lit("" if param is None else str(param)).alias("param"),
                F.col(f"_v{i}").alias("n_violations"),
                (F.col(f"_v{i}") == 0).alias("ok"),
            )
            for i, (col, rule, param) in enumerate(rules)
        ]
    )
    return one.select(F.explode(rows).alias("s")).select("s.*")
