"""C11 salted two-phase aggregation: identical results to plain groupBy."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphlab_spark.operators.skew import salted_count, salted_sum

SF = "/root/testdata/sf0.001"


def test_salted_count_equals_plain(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    plain = {r.user_id: r.n for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    salted = {r.user_id: r.n for r in salted_count(ev, "user_id").collect()}
    assert plain == salted


def test_salted_sum_equals_plain(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").fillna(0.0, ["value"])
    plain = {
        r.user_id: round(r.s, 6)
        for r in ev.groupBy("user_id").agg(F.sum("value").alias("s")).collect()
    }
    salted = {
        r.user_id: round(r.sum_value, 6) for r in salted_sum(ev, "user_id", "value").collect()
    }
    assert plain == salted


def test_salted_on_skewed_input(spark):
    # one hot key at 50x frequency
    hot = spark.range(5000).select(F.lit("hot").alias("k"))
    cold = spark.range(100).select(F.concat(F.lit("c"), F.col("id")).alias("k"))
    df = hot.unionByName(cold)
    out = {r.k: r.n for r in salted_count(df, "k").collect()}
    assert out["hot"] == 5000
    assert out["c42"] == 1
