"""ANALYZE-style table stats: exact values on a hand-built frame, null
accounting, approx mode's single-pass plan (no Expand), and exact-mode
agreement with approx on low-cardinality columns."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphlab_spark.operators.analyze import table_stats


def _frame(spark):
    return spark.createDataFrame(
        [
            (1, "a", None),
            (2, "b", 10.0),
            (3, "a", 20.0),
            (4, None, 20.0),
        ],
        "id long, cat string, val double",
    )


def test_table_stats_exact(spark):
    got = {r.column: r for r in table_stats(_frame(spark)).collect()}
    assert set(got) == {"id", "cat", "val"}
    for r in got.values():
        assert r.n_rows == 4
    assert (got["id"].n_nulls, got["id"].n_distinct) == (0, 4)
    assert (got["cat"].n_nulls, got["cat"].n_distinct) == (1, 2)
    assert (got["val"].n_nulls, got["val"].n_distinct) == (1, 2)
    assert got["id"].min_str == "1" and got["id"].max_str == "4"
    assert got["cat"].min_str == "a" and got["cat"].max_str == "b"


def test_table_stats_subset_and_approx_agree_small(spark):
    df = _frame(spark)
    exact = {r.column: r.n_distinct for r in table_stats(df, ["cat"]).collect()}
    approx = {
        r.column: r.n_distinct for r in table_stats(df, ["cat"], approx=True).collect()
    }
    # HLL++ is exact at tiny cardinalities
    assert exact == approx == {"cat": 2}


def test_table_stats_approx_plan_has_no_expand(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cols = ["doc_id", "lang", "source"]
    exact_plan = (
        table_stats(docs, cols)._jdf.queryExecution().executedPlan().toString()
    )
    approx_plan = (
        table_stats(docs, cols, approx=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # multi-column exact COUNT(DISTINCT) plans via Expand; the approx
    # mode must stay a single partial-aggregated pass
    assert "Expand" in exact_plan
    assert "Expand" not in approx_plan
    assert "partial_count" in approx_plan or "HashAggregate" in approx_plan


def test_table_stats_empty_table(spark):
    empty = spark.createDataFrame([], "id long, cat string")
    got = {r.column: r for r in table_stats(empty).collect()}
    assert got["id"].n_rows == 0 and got["id"].n_distinct == 0
    assert got["id"].min_str is None and got["id"].max_str is None
    # SUM over zero rows is NULL in SQL — the operator coalesces to 0
    assert got["id"].n_nulls == 0


def test_datacard_sections_consistent(spark):
    from graphlab_spark.operators.analyze import datacard

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = datacard(docs).collect()
    by_sec = {}
    for r in rows:
        by_sec.setdefault(r.section, []).append(r)
    assert set(by_sec) == {"lang", "source", "total"}
    total = by_sec["total"][0]
    assert total.key == "all" and total.n_docs == docs.count()
    # every section's doc/token mass sums to the total (a partition of
    # the corpus — the property a reader checks first on any data card)
    for sec in ("lang", "source"):
        assert sum(r.n_docs for r in by_sec[sec]) == total.n_docs
        assert sum(r.n_tokens for r in by_sec[sec]) == total.n_tokens


# ------------------------------------------------------- expectations


def test_validate_expectations_rules(spark):
    from graphlab_spark.operators.analyze import validate_expectations

    df = spark.createDataFrame(
        [
            (1, "en", 10, "web_a"),
            (2, "en", 700, "web_b"),   # violates max 600
            (2, "xx", 5, "Web_C"),     # dup id; bad lang; bad source case
            (None, None, None, None),  # null id violates not_null only
        ],
        "doc_id int, lang string, n_chars int, source string",
    )
    rep = {
        (r.column, r.rule): (r.param, r.n_violations, r.ok)
        for r in validate_expectations(
            df,
            [
                ("doc_id", "not_null", None),
                ("doc_id", "unique", None),
                ("n_chars", "min", 1),
                ("n_chars", "max", 600),
                ("lang", "in_set", ["en", "de"]),
                ("source", "matches", "^[a-z_]+$"),
            ],
        ).collect()
    }
    assert rep[("doc_id", "not_null")] == ("", 1, False)
    assert rep[("doc_id", "unique")] == ("", 1, False)
    assert rep[("n_chars", "min")] == ("1", 0, True)   # NULL doesn't violate
    assert rep[("n_chars", "max")] == ("600", 1, False)
    assert rep[("lang", "in_set")] == ("['en', 'de']", 1, False)
    assert rep[("source", "matches")] == ("^[a-z_]+$", 1, False)


def test_validate_expectations_empty_and_guards(spark):
    import pytest

    from graphlab_spark.operators.analyze import validate_expectations

    empty = spark.createDataFrame([], "doc_id int")
    rep = validate_expectations(
        empty, [("doc_id", "not_null", None), ("doc_id", "unique", None)]
    ).collect()
    assert all(r.n_violations == 0 and r.ok for r in rep)
    with pytest.raises(ValueError):
        validate_expectations(empty, [])
    with pytest.raises(ValueError):
        validate_expectations(empty, [("doc_id", "between", (1, 2))])


def test_validate_expectations_single_aggregate_plan(spark):
    """All row rules + unique ride ONE aggregation job — no second scan
    of the table and no Python."""
    from graphlab_spark.operators.analyze import validate_expectations

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = validate_expectations(
        docs,
        [
            ("doc_id", "not_null", None),
            ("n_chars", "min", 1),
            ("lang", "in_set", ["en", "de", "fr", "es"]),
        ],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1
    assert "EvalPython" not in plan
