"""Relational operator surface (SURVEY.md §2.a) over the driver testdata.

Each entry pairs a DataFrame implementation with the ANSI-SQL oracle the
driver runs through DuckDB at sf0.01. Conventions (driver contract):
- every computed column is aliased identically in both forms;
- float results are rounded on BOTH sides (Spark and DuckDB accumulate
  doubles in different orders — rounding makes the value-hash stable);
- timestamps are rendered as strings on both sides.

Reference parity: each query's docstring cites the reference behavior it
mirrors (file:line in khanhphamj/GraphLab backend).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


@dataclass
class Q:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None
    doc: str


REGISTRY: dict[str, Q] = {}


def q(name: str, sql: str | None, doc: str):
    def deco(fn):
        REGISTRY[name] = Q(fn, sql, doc)
        return fn

    return deco


def reorder_registry_last(names: list[str]) -> None:
    """Move ``names`` to the END of the registry (insertion order is the
    driver's execution order, and its CORRECTNESS harness records only
    the FIRST 50 entries). Rows-only entries and entries whose oracle is
    redundantly pinned elsewhere are registered last so every
    north-star oracled gate lands inside the recorded window; entries
    past the cap stay covered by tools/check_oracles.py (which warns on
    truncation) and tests/test_orphan_oracles.py."""
    tail = {n: REGISTRY.pop(n) for n in names if n in REGISTRY}
    REGISTRY.update(tail)


# ---------------------------------------------------------------- filters

@q(
    "a01_filter_eq",
    "SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS acctbal FROM customer "
    "WHERE c_mktsegment = 'BUILDING'",
    "A1 equality-predicate scoping (kg_schema.py:102)",
)
def a01(spark, sf):
    return (
        _t(spark, sf, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal"))
    )


@q(
    "a02_filter_null_tombstone",
    "SELECT doc_id, lang FROM documents WHERE text IS NOT NULL AND n_chars < 100",
    "A2 IS NULL / tombstone filtering (kg_schema.py:507)",
)
def a02(spark, sf):
    return (
        _t(spark, sf, "documents")
        .filter(F.col("text").isNotNull() & (F.col("n_chars") < 100))
        .select("doc_id", "lang")
    )


@q(
    "a03_ilike_search",
    "SELECT p_partkey, p_name FROM part WHERE lower(p_name) LIKE '%ge%'",
    "A3 case-insensitive substring search (research_paper.py:67-74)",
)
def a03(spark, sf):
    return (
        _t(spark, sf, "part")
        .filter(F.lower(F.col("p_name")).contains("ge"))
        .select("p_partkey", "p_name")
    )


@q(
    "a04_disjunction",
    "SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 2) AS totalprice FROM orders "
    "WHERE o_orderstatus = 'F' OR o_totalprice > 100000",
    "A4 or_() across columns (research_paper.py:68)",
)
def a04(spark, sf):
    return (
        _t(spark, sf, "orders")
        .filter((F.col("o_orderstatus") == "F") | (F.col("o_totalprice") > 100000))
        .select(
            "o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("totalprice")
        )
    )


@q(
    "a05_conjunction",
    "SELECT l_orderkey, l_linenumber FROM lineitem "
    "WHERE l_returnflag = 'R' AND l_linestatus = 'F' AND l_quantity > 25",
    "A5 and_() predicates (research_paper.py:31)",
)
def a05(spark, sf):
    return (
        _t(spark, sf, "lineitem")
        .filter(
            (F.col("l_returnflag") == "R")
            & (F.col("l_linestatus") == "F")
            & (F.col("l_quantity") > 25)
        )
        .select("l_orderkey", "l_linenumber")
    )


@q(
    "a06_in_list",
    "SELECT o_orderkey, o_orderpriority FROM orders "
    "WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')",
    "A6 IN-list guard (kg_schema.py:264)",
)
def a06(spark, sf):
    return (
        _t(spark, sf, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderpriority")
    )


# ------------------------------------------------------------ sort / page

@q(
    "a07_sort_topk",
    "SELECT s_suppkey, s_name, ROUND(s_acctbal, 2) AS acctbal FROM supplier "
    "ORDER BY s_acctbal DESC, s_suppkey ASC LIMIT 5",
    "A7 dynamic sort + B3 top-k clamp (kg_schema.py:115-120; neo4j_client.py:144-156)",
)
def a07(spark, sf):
    return (
        _t(spark, sf, "supplier")
        .orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey").asc())
        .limit(5)
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("acctbal"))
    )


@q(
    "a08_pagination",
    "SELECT p_partkey, p_name FROM part ORDER BY p_partkey LIMIT 20 OFFSET 40",
    "A8 offset/limit pagination, page 3 of 20 (kg_schema.py:125-131)",
)
def a08(spark, sf):
    return (
        _t(spark, sf, "part")
        .orderBy("p_partkey")
        .offset(40)
        .limit(20)
        .select("p_partkey", "p_name")
    )


# ------------------------------------------------------------- aggregates

@q(
    "a09_count",
    "SELECT count(*) AS total FROM lineitem",
    "A9 pagination total count (kg_schema.py:123)",
)
def a09(spark, sf):
    return _t(spark, sf, "lineitem").agg(F.count(F.lit(1)).alias("total"))


@q(
    "a10_max",
    "SELECT max(o_orderkey) AS max_key FROM orders",
    "A10 max(version) auto-increment (kg_schema.py:37-40)",
)
def a10(spark, sf):
    return _t(spark, sf, "orders").agg(F.max("o_orderkey").alias("max_key"))


@q(
    "a11_group_count",
    "SELECT source, count(*) AS n FROM documents GROUP BY source",
    "A11 per-source counts (brainstorm_session.py:451-453)",
)
def a11(spark, sf):
    return _t(spark, sf, "documents").groupBy("source").agg(F.count(F.lit(1)).alias("n"))


@q(
    "a12_avg",
    "SELECT c_nationkey, ROUND(avg(c_acctbal), 4) AS avg_bal, count(*) AS n "
    "FROM customer GROUP BY c_nationkey",
    "A12 mean ignoring nulls (research_keyword.py:369-371)",
)
def a12(spark, sf):
    return (
        _t(spark, sf, "customer")
        .groupBy("c_nationkey")
        .agg(F.round(F.avg("c_acctbal"), 4).alias("avg_bal"), F.count(F.lit(1)).alias("n"))
    )


@q(
    "a13_histogram",
    "SELECT CAST(floor(value / 20) AS INT) AS bucket, count(*) AS n "
    "FROM events WHERE value IS NOT NULL GROUP BY 1",
    "A13 bucketed histogram (research_keyword.py:373-387)",
)
def a13(spark, sf):
    return (
        _t(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(F.floor(F.col("value") / 20).cast("int").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@q(
    "a14_conditional_count",
    "SELECT user_id, CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) "
    "AS BIGINT) AS n_purchases FROM events GROUP BY user_id",
    "A14 conditional count (research_keyword.py:356-357)",
)
def a14(spark, sf):
    return (
        _t(spark, sf, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "n_purchases"
            )
        )
    )


# ------------------------------------------------------- dedup / set ops

@q(
    "a15_anti_join_new_only",
    "SELECT DISTINCT e.user_id FROM events e "
    "WHERE NOT EXISTS (SELECT 1 FROM orders o "
    "WHERE o.o_custkey = e.user_id AND o.o_orderstatus = 'F')",
    "A15 insert-if-absent duplicate check (research_paper.py:29-35)",
)
def a15(spark, sf):
    events = _t(spark, sf, "events").select("user_id").distinct()
    orders = (
        _t(spark, sf, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("user_id"))
    )
    return events.join(orders, "user_id", "left_anti")


@q(
    "a16_ci_distinct",
    "SELECT DISTINCT lower(p_brand) AS brand FROM part",
    "A16 case-insensitive unique key (research_keyword.py model:13)",
)
def a16(spark, sf):
    return _t(spark, sf, "part").select(F.lower("p_brand").alias("brand")).distinct()


@q(
    "a17_single_upsert",
    "WITH existing AS (SELECT user_id AS id, max(value) AS weight, 'orig' AS source "
    "FROM events GROUP BY user_id), "
    "incoming AS ("
    " SELECT DISTINCT user_id AS id, CAST(NULL AS DOUBLE) AS weight, 'upd' AS source "
    " FROM events WHERE user_id % 3 = 0 "
    " UNION ALL "
    " SELECT DISTINCT user_id + 1000000 AS id, 0.5 AS weight, 'new' AS source "
    " FROM events WHERE user_id % 7 = 0) "
    "SELECT COALESCE(e.id, i.id) AS id, ROUND(COALESCE(i.weight, e.weight), 2) AS weight, "
    "COALESCE(i.source, e.source) AS source "
    "FROM existing e FULL OUTER JOIN incoming i ON e.id = i.id",
    "A17 single upsert: overwrite ONLY non-None incoming fields, insert "
    "when absent (research_keyword.py:47-61,118-126)",
)
def a17(spark, sf):
    from graphlab_spark.operators.keywords import upsert_keywords_non_null

    ev = _t(spark, sf, "events")
    existing = ev.groupBy(F.col("user_id").alias("id")).agg(
        F.max("value").alias("weight")
    ).withColumn("source", F.lit("orig"))
    upd = (
        ev.filter(F.col("user_id") % 3 == 0)
        .select(F.col("user_id").alias("id")).distinct()
        .withColumn("weight", F.lit(None).cast("double"))
        .withColumn("source", F.lit("upd"))
    )
    new = (
        ev.filter(F.col("user_id") % 7 == 0)
        .select((F.col("user_id") + 1_000_000).alias("id")).distinct()
        .withColumn("weight", F.lit(0.5))
        .withColumn("source", F.lit("new"))
    )
    out = upsert_keywords_non_null(existing, upd.unionByName(new), key=["id"])
    return out.select("id", F.round("weight", 2).alias("weight"), "source")


@q(
    "a18_bulk_merge_semantics",
    "SELECT user_id, ROUND(max(value), 2) AS weight, "
    "string_agg(event_type, '; ' ORDER BY ts, event_id) AS rationale, "
    "max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1 AS is_primary "
    "FROM events GROUP BY user_id",
    "A18 bulk-merge: max weight, '; '-joined rationale in deterministic "
    "order, OR of is_primary (research_keyword.py:129-137)",
)
def a18(spark, sf):
    ev = _t(spark, sf, "events")
    return ev.groupBy("user_id").agg(
        F.round(F.max("value"), 2).alias("weight"),
        F.concat_ws(
            "; ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                lambda s: s["event_type"],
            ),
        ).alias("rationale"),
        (F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)) == 1).alias(
            "is_primary"
        ),
    )


@q(
    "a19_delete_not_found",
    "SELECT DISTINCT o_custkey AS id FROM orders "
    "WHERE o_custkey NOT IN (SELECT user_id FROM events)",
    "A19 bulk delete reporting not_found ids (research_keyword.py:302-339)",
)
def a19(spark, sf):
    requested = _t(spark, sf, "orders").select(F.col("o_custkey").alias("id")).distinct()
    present = _t(spark, sf, "events").select(F.col("user_id").alias("id"))
    return requested.join(present, "id", "left_anti")


@q(
    "a20_set_diff",
    "SELECT brand, 'added' AS change FROM ("
    " SELECT DISTINCT p_brand AS brand FROM part WHERE p_size > 25"
    " EXCEPT SELECT DISTINCT p_brand FROM part WHERE p_size <= 25) "
    "UNION ALL "
    "SELECT brand, 'removed' AS change FROM ("
    " SELECT DISTINCT p_brand AS brand FROM part WHERE p_size <= 25"
    " EXCEPT SELECT DISTINCT p_brand FROM part WHERE p_size > 25)",
    "A20 schema set-difference diff (kg_schema.py:610-630)",
)
def a20(spark, sf):
    part = _t(spark, sf, "part")
    big = part.filter(F.col("p_size") > 25).select(F.col("p_brand").alias("brand")).distinct()
    small = (
        part.filter(F.col("p_size") <= 25).select(F.col("p_brand").alias("brand")).distinct()
    )
    return big.exceptAll(small).withColumn("change", F.lit("added")).unionByName(
        small.exceptAll(big).withColumn("change", F.lit("removed"))
    )


# ------------------------------------------------------------------ joins

@q(
    "a25_joined_load",
    "SELECT c.c_mktsegment AS segment, n.n_name AS nation, "
    "ROUND(sum(o.o_totalprice), 2) AS revenue, count(*) AS n_orders "
    "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
    "JOIN nation n ON c.c_nationkey = n.n_nationkey "
    "GROUP BY 1, 2",
    "A25 joinedload N+1 avoidance → broadcast dim joins (research_keyword.py:405-412)",
)
def a25(spark, sf):
    orders = _t(spark, sf, "orders")
    customer = _t(spark, sf, "customer")
    nation = _t(spark, sf, "nation")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"), F.col("n_name").alias("nation")
        )
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@q(
    "c13_dedup_latest_per_key",
    "SELECT user_id, event_id, event_type FROM events "
    "QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1",
    "C13 per-key dedup keeping latest timestamp (research_paper.py model:13-14)",
)
def c13(spark, sf):
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        _t(spark, sf, "events")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


@q(
    "a27_rollup_subtotals",
    # GROUP BY ROLLUP: per-(flag, status) rows + per-flag subtotals +
    # grand total, subtotal levels carrying NULL group keys — identical
    # lattice semantics on both engines
    "SELECT l_returnflag, l_linestatus, count(*) AS n_items, "
    "ROUND(sum(l_quantity), 2) AS sum_qty, "
    "ROUND(sum(l_extendedprice), 2) AS sum_price "
    "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)",
    "hierarchical subtotal aggregation (OLAP ROLLUP): Spark expands the "
    "grouping lattice BEFORE the exchange, so map-side partial "
    "aggregation still collapses each partition to one row per lattice "
    "cell — one shuffle whose volume is O(cells), not O(rows x levels)",
)
def a27(spark, sf):
    return (
        _t(spark, sf, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


_PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


@q(
    "a28_pivot_event_matrix",
    # explicit pivot value list on both engines (Spark's implicit-values
    # pivot would add a distinct scan AND make the schema data-dependent);
    # absent combinations are 0 on both sides (fillna / FILTER count)
    "SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, "
    + ", ".join(
        f"COUNT(*) FILTER (WHERE event_type = '{t}') AS {t}"
        for t in _PIVOT_TYPES
    )
    + " FROM events GROUP BY 1",
    "long-to-wide pivot (events day x type count matrix): fixed literal "
    "pivot columns keep the plan a single partial-aggregated hash "
    "aggregate keyed on day — no extra distinct pass, no data-dependent "
    "schema",
)
def a28(spark, sf):
    piv = (
        _t(spark, sf, "events")
        .groupBy(F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"))
        .pivot("event_type", _PIVOT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return piv.na.fill(0, _PIVOT_TYPES)


@q(
    "a29_cube_subtotals",
    # GROUP BY CUBE: the full 2^k grouping lattice (adds the per-status
    # marginals ROLLUP omits); same Expand-before-exchange plan as a27
    "SELECT l_returnflag, l_linestatus, count(*) AS n_items, "
    "ROUND(sum(l_quantity), 2) AS sum_qty "
    "FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)",
    "full-lattice subtotal aggregation (OLAP CUBE, 2^k grouping sets): "
    "the lattice expands map-side before ONE partial-aggregated "
    "exchange of O(cells) — registered parked (a27 carries the recorded "
    "Expand-plan gate; this stays check_oracles/orphan-gated)",
)
def a29(spark, sf):
    return (
        _t(spark, sf, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


@q(
    "a30_semi_join_exists",
    # EXISTS-correlated subquery as an explicit LEFT SEMI join: orders
    # with at least one near-full-quantity lineitem
    "SELECT o.o_orderkey, o.o_orderstatus, ROUND(o.o_totalprice, 2) AS total "
    "FROM orders o WHERE EXISTS (SELECT 1 FROM lineitem l "
    "WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)",
    "correlated-EXISTS pattern (the service layer's 'has any matching "
    "child' check) as a LEFT SEMI join: the filter pushes to the "
    "lineitem scan BEFORE the join, the semi join never duplicates or "
    "widens the orders side — registered parked (a15 carries the "
    "recorded anti-join twin)",
)
def a30(spark, sf):
    li = _t(spark, sf, "lineitem").filter(F.col("l_quantity") >= 49)
    return (
        _t(spark, sf, "orders")
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.round("o_totalprice", 2).alias("total"),
        )
    )


@q(
    "a31_table_stats",
    # ANALYZE-style per-column stats (long format). Exact NDV here (the
    # oracle-replayable mode); approx_count_distinct is the documented
    # single-pass 100-TB mode. Int/string columns only — engines format
    # float/date strings differently. Registered parked BY DESIGN
    # (a09/a10 carry the count/extremum family's recorded gates).
    "SELECT 'o_orderkey' AS column, count(*) AS n_rows, "
    "count(*) - count(o_orderkey) AS n_nulls, "
    "count(DISTINCT o_orderkey) AS n_distinct, "
    "CAST(min(o_orderkey) AS VARCHAR) AS min_str, "
    "CAST(max(o_orderkey) AS VARCHAR) AS max_str FROM orders "
    "UNION ALL SELECT 'o_custkey', count(*), count(*) - count(o_custkey), "
    "count(DISTINCT o_custkey), CAST(min(o_custkey) AS VARCHAR), "
    "CAST(max(o_custkey) AS VARCHAR) FROM orders "
    "UNION ALL SELECT 'o_orderstatus', count(*), "
    "count(*) - count(o_orderstatus), count(DISTINCT o_orderstatus), "
    "CAST(min(o_orderstatus) AS VARCHAR), "
    "CAST(max(o_orderstatus) AS VARCHAR) FROM orders",
    "ANALYZE-style column statistics (row/null/NDV/min/max) in one "
    "aggregation job — the stats table that drives pruning decisions "
    "and per-batch data-quality reports",
)
def a31(spark, sf):
    from graphlab_spark.operators.analyze import table_stats

    return table_stats(
        _t(spark, sf, "orders"), ["o_orderkey", "o_custkey", "o_orderstatus"]
    )


def _a32_sql() -> str:
    from graphlab_spark.operators.layout import zorder_sql_expr

    return (
        "SELECT o_orderkey, "
        f"{zorder_sql_expr('(o_custkey % 65536)', '(o_orderkey % 65536)', 16)} "
        "AS z FROM orders WHERE o_orderkey < 2000"
    )


@q(
    "a32_zorder_key",
    # Morton/Z-order interleave replayed bit-for-bit in DuckDB (the
    # generator emits the identical shift/AND/OR algebra both engines
    # execute) — a wrong bit position or sign-extension bug breaks the
    # hash. Registered parked BY DESIGN (pure key computation; the
    # write-path clustering is pytest-gated in tests/test_layout.py).
    _a32_sql(),
    "Z-order layout key: locality-preserving bit interleave of two "
    "dimensions, pure JVM bit algebra — the clustered-write sort key "
    "that makes min/max footer pruning work on BOTH columns",
)
def a32(spark, sf):
    from graphlab_spark.operators.layout import zorder_key

    o = _t(spark, sf, "orders").filter(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        zorder_key(
            F.col("o_custkey") % 65536, F.col("o_orderkey") % 65536, bits=16
        ).alias("z"),
    )


@q(
    "a33_expectations",
    # Declarative data-contract validation replayed as SUM(CASE) /
    # COUNT−COUNT(DISTINCT) in DuckDB — one aggregate both engines.
    # Mixed pass/fail rules so the gate is non-trivial (the max-bound
    # rule genuinely fails on this corpus). Registered parked BY DESIGN
    # (a09/a14/a31 carry the aggregate family's recorded gates).
    "WITH v AS (SELECT "
    "CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v0, "
    "CAST(COUNT(doc_id) - COUNT(DISTINCT doc_id) AS BIGINT) AS v1, "
    "CAST(SUM(CASE WHEN n_chars < 1 THEN 1 ELSE 0 END) AS BIGINT) AS v2, "
    "CAST(SUM(CASE WHEN n_chars > 600 THEN 1 ELSE 0 END) AS BIGINT) AS v3, "
    "CAST(SUM(CASE WHEN lang NOT IN ('en', 'de', 'fr', 'es') "
    "AND lang IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS v4, "
    "CAST(SUM(CASE WHEN NOT regexp_matches(source, '^[a-z_]+$') "
    "AND source IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS v5 "
    "FROM documents) "
    "SELECT 'doc_id' AS column, 'not_null' AS rule, '' AS param, "
    "v0 AS n_violations, v0 = 0 AS ok FROM v "
    "UNION ALL SELECT 'doc_id', 'unique', '', v1, v1 = 0 FROM v "
    "UNION ALL SELECT 'n_chars', 'min', '1', v2, v2 = 0 FROM v "
    "UNION ALL SELECT 'n_chars', 'max', '600', v3, v3 = 0 FROM v "
    "UNION ALL SELECT 'lang', 'in_set', '[''en'', ''de'', ''fr'', ''es'']', "
    "v4, v4 = 0 FROM v "
    "UNION ALL SELECT 'source', 'matches', '^[a-z_]+$', v5, v5 = 0 FROM v",
    "declarative data-contract validation (not_null/unique/min/max/"
    "in_set/matches) — every row rule a SUM(CASE) inside ONE "
    "partial-aggregated scan; unique rides the same aggregate as "
    "count − countDistinct; long-format per-rule report",
)
def a33(spark, sf):
    from graphlab_spark.operators.analyze import validate_expectations

    return validate_expectations(
        _t(spark, sf, "documents"),
        [
            ("doc_id", "not_null", None),
            ("doc_id", "unique", None),
            ("n_chars", "min", 1),
            ("n_chars", "max", 600),
            ("lang", "in_set", ["en", "de", "fr", "es"]),
            ("source", "matches", "^[a-z_]+$"),
        ],
    )


# -------------------------------------------------- headline bench queries

@q(
    "tpch_q1_pricing_summary",
    "SELECT l_returnflag, l_linestatus, ROUND(sum(l_quantity), 2) AS sum_qty, "
    "ROUND(sum(l_extendedprice), 2) AS sum_base, "
    "ROUND(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc, "
    "ROUND(avg(l_quantity), 4) AS avg_qty, count(*) AS n "
    "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' "
    "GROUP BY l_returnflag, l_linestatus",
    "headline scan+agg (partial/map-side aggregation path)",
)
def q1(spark, sf):
    return (
        _t(spark, sf, "lineitem")
        .filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@q(
    "tpch_q3_shipping_priority",
    "SELECT o.o_orderkey AS orderkey, "
    "ROUND(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue "
    "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
    "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
    "WHERE c.c_mktsegment = 'BUILDING' "
    "GROUP BY o.o_orderkey ORDER BY revenue DESC, orderkey ASC LIMIT 10",
    "headline join+agg+topk (broadcast dim, shuffle on fact key)",
)
def q3(spark, sf):
    c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders")
    l = _t(spark, sf, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("o_orderkey").alias("orderkey"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("orderkey").asc())
        .limit(10)
    )


@q(
    "tpch_q5_local_supplier_volume",
    "SELECT n.n_name AS nation, "
    "ROUND(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue "
    "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
    "JOIN customer c ON o.o_custkey = c.c_custkey "
    "JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey "
    "JOIN nation n ON c.c_nationkey = n.n_nationkey "
    "JOIN region r ON n.n_regionkey = r.r_regionkey "
    "GROUP BY n.n_name",
    "headline multi-join star query (broadcast all dims)",
)
def q5(spark, sf):
    l = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )
