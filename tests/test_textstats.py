"""Text-analysis functions: token count, quality score, lang-ID, fingerprint."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphlab_spark.functions import textstats as TS

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_token_count(spark):
    df = spark.createDataFrame([("a b  c",), ("single",)], "text string")
    out = [r.n for r in df.select(TS.token_count_col().alias("n")).collect()]
    assert out == [3, 1]


def test_quality_score_bounds_and_type(spark):
    rows = _docs(spark).select(TS.quality_score_col().alias("q")).collect()
    assert all(0 <= r.q <= 1000 for r in rows)
    assert isinstance(rows[0].q, int)


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog is in the house",),
            ("der bericht zeigt und das ist von allen",),
            ("xyzzy qwerty plugh",),
        ],
        "text string",
    )
    out = [r.lang for r in df.select(TS.lang_id_col().alias("lang")).collect()]
    assert out == ["en", "de", "und"]


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame([("Hello  World",), ("hello world",)], "text string")
    fps = [r.fp for r in df.select(TS.fingerprint_col().alias("fp")).collect()]
    assert fps[0] == fps[1]
    assert len(fps[0]) == 32
