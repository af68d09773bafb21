"""A16-A19 keyword/alias dictionary semantics — exact merge rules:
max(weight), '; '-joined rationale (existing-first), OR(is_primary)
(reference behavior: backend/app/services/research_keyword.py:106-151)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphlab_spark.operators.keywords import (
    bulk_delete_keywords,
    bulk_upsert_keywords,
    dedup_keywords,
    normalize_keywords,
)

COLS = "session_id string, term string, weight double, source string, rationale string, is_primary boolean"


def _df(spark, rows):
    return spark.createDataFrame(rows, COLS)


def test_normalize_lowercases_and_trims(spark):
    df = _df(spark, [("s1", "  GraphQL  ", 0.5, "user", "r", False)])
    assert normalize_keywords(df).first().term == "graphql"


def test_dedup_case_insensitive_key(spark):
    df = _df(
        spark,
        [
            ("s1", "Spark", 0.4, "user", "a", False),
            ("s1", "spark", 0.9, "ai", "b", True),
            ("s2", "spark", 0.1, "user", "c", False),
        ],
    )
    out = dedup_keywords(df).collect()
    assert len(out) == 2
    s1 = next(r for r in out if r.session_id == "s1")
    assert s1.weight == 0.9  # highest weight wins


def test_bulk_upsert_skip(spark):
    existing = _df(spark, [("s1", "spark", 0.4, "user", "old", False)])
    incoming = _df(
        spark,
        [
            ("s1", "spark", 0.9, "ai", "new", True),
            ("s1", "flink", 0.5, "ai", "n2", False),
        ],
    )
    out = {r.term: r for r in bulk_upsert_keywords(existing, incoming, "skip").collect()}
    assert out["spark"].weight == 0.4 and out["spark"].rationale == "old"
    assert out["flink"].weight == 0.5


def test_bulk_upsert_overwrite(spark):
    existing = _df(spark, [("s1", "spark", 0.4, "user", "old", False)])
    incoming = _df(spark, [("s1", "spark", 0.9, "ai", "new", True)])
    out = bulk_upsert_keywords(existing, incoming, "upsert").collect()
    assert len(out) == 1
    assert out[0].weight == 0.9 and out[0].rationale == "new" and out[0].is_primary


def test_bulk_upsert_merge_semantics(spark):
    existing = _df(spark, [("s1", "spark", 0.7, "user", "seed term", False)])
    incoming = _df(spark, [("s1", "spark", 0.4, "ai", "model suggested", True)])
    out = bulk_upsert_keywords(existing, incoming, "merge").collect()
    assert len(out) == 1
    r = out[0]
    assert r.weight == 0.7  # max
    assert r.rationale == "seed term; model suggested"  # existing first
    assert r.is_primary is True  # OR
    assert r.source == "user"  # from max-weight contributor


def test_bulk_upsert_merge_new_key_passthrough(spark):
    existing = _df(spark, [("s1", "spark", 0.7, "user", "a", False)])
    incoming = _df(spark, [("s1", "flink", 0.5, "ai", "b", False)])
    out = {r.term: r for r in bulk_upsert_keywords(existing, incoming, "merge").collect()}
    assert set(out) == {"spark", "flink"}
    assert out["flink"].rationale == "b"


def test_bulk_delete_reports_not_found(spark):
    df = spark.createDataFrame([("k1", "a"), ("k2", "b")], "id string, term string")
    ids = spark.createDataFrame([("k2",), ("k9",)], "id string")
    remaining, not_found = bulk_delete_keywords(df, ids)
    assert [r.id for r in remaining.collect()] == ["k1"]
    assert [r.id for r in not_found.collect()] == ["k9"]


def test_single_upsert_overwrites_only_non_none_fields(spark):
    """A17 nuance (ref research_keyword.py:118-126): a None incoming field
    keeps the existing value; non-None incoming fields overwrite; new keys
    insert as-is."""
    from graphlab_spark.operators.keywords import upsert_keywords_non_null

    existing = _df(spark, [("s1", "spark", 0.7, "user", "seed", True)])
    incoming = _df(
        spark,
        [
            ("s1", "spark", None, "ai", None, None),  # weight/rationale keep
            ("s1", "flink", 0.4, "ai", "new kw", False),  # insert
        ],
    )
    out = {r.term: r for r in upsert_keywords_non_null(existing, incoming).collect()}
    assert set(out) == {"spark", "flink"}
    assert out["spark"].weight == 0.7  # None incoming → existing kept
    assert out["spark"].source == "ai"  # non-None incoming → overwritten
    assert out["spark"].rationale == "seed"
    assert out["spark"].is_primary is True
    assert out["flink"].weight == 0.4
