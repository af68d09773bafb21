"""Schema-evolution-tolerant source reads (sources/tables.read_evolving):
crawl drops whose schemas drift across months align to one contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphlab_spark.sources.tables import read_evolving

CONTRACT = "url string, warc_ts long, lang string, quality double"


def _write(spark, path, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(path)


def test_aligns_drifted_drops(spark, tmp_path):
    # month 1: no quality column yet, warc_ts was an int
    _write(
        spark, str(tmp_path / "m1"),
        [("u1", 100, "en"), ("u2", 200, "de")],
        "url string, warc_ts int, lang string",
    )
    # month 2: quality added, plus an extra debug column
    _write(
        spark, str(tmp_path / "m2"),
        [("u3", 300, "en", 0.9, "x")],
        "url string, warc_ts int, lang string, quality double, dbg string",
    )
    df = read_evolving(
        spark, [str(tmp_path / "m1"), str(tmp_path / "m2")], CONTRACT
    )
    assert [f"{f.name}:{f.dataType.simpleString()}" for f in df.schema.fields] == [
        "url:string", "warc_ts:bigint", "lang:string", "quality:double"
    ]
    rows = {r.url: (r.warc_ts, r.lang, r.quality) for r in df.collect()}
    assert rows == {
        "u1": (100, "en", None),   # missing column -> typed NULL
        "u2": (200, "de", None),
        "u3": (300, "en", 0.9),    # extra dbg column dropped
    }


def test_contract_column_missing_everywhere(spark, tmp_path):
    _write(spark, str(tmp_path / "only"), [("u1", 1)], "url string, warc_ts int")
    df = read_evolving(spark, [str(tmp_path / "only")], CONTRACT)
    r = df.collect()[0]
    assert (r.lang, r.quality) == (None, None)
    assert df.schema["quality"].dataType.simpleString() == "double"


def test_strict_extras_rejects(spark, tmp_path):
    _write(
        spark, str(tmp_path / "m"),
        [("u1", 1, "en", 0.5, "x")],
        "url string, warc_ts int, lang string, quality double, dbg string",
    )
    with pytest.raises(ValueError, match="dbg"):
        read_evolving(spark, [str(tmp_path / "m")], CONTRACT, strict_extras=True)


def test_extras_are_pruned_from_the_scan(spark, tmp_path):
    """Dropping an unknown column must happen by COLUMN PRUNING — the
    scan's ReadSchema excludes it, so its pages are never read."""
    _write(
        spark, str(tmp_path / "m"),
        [("u1", 1, "en", 0.5, "HUGE" * 100)],
        "url string, warc_ts int, lang string, quality double, blob string",
    )
    df = read_evolving(spark, [str(tmp_path / "m")], CONTRACT)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "blob" not in plan.split("ReadSchema")[1][:300]


def test_type_drift_across_drops_widens(spark, tmp_path):
    """The most common drift — a column's TYPE changes between months
    (int -> long) — must align, not crash (parquet mergeSchema throws
    CANNOT_MERGE_SCHEMAS on exactly this)."""
    _write(spark, str(tmp_path / "m1"), [("u1", 100, "en")],
           "url string, warc_ts int, lang string")
    _write(spark, str(tmp_path / "m2"), [("u2", 2**40, "de")],
           "url string, warc_ts long, lang string")
    df = read_evolving(
        spark, [str(tmp_path / "m1"), str(tmp_path / "m2")], CONTRACT
    )
    rows = {r.url: r.warc_ts for r in df.collect()}
    assert rows == {"u1": 100, "u2": 2**40}
    assert df.schema["warc_ts"].dataType.simpleString() == "bigint"
