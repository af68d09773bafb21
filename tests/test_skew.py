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


def test_salted_join_rejects_duplicate_small_keys(spark):
    import pytest

    from graphlab_spark.operators.skew import salted_join

    big = spark.range(20).select(F.col("id").alias("k"), F.col("id").alias("v"))
    dup_small = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "k long, tag string"
    )
    with pytest.raises(ValueError, match="unique per 'k'"):
        salted_join(big, dup_small, "k")
    # structural uniqueness can skip the guard job explicitly
    out = salted_join(big, dup_small.dropDuplicates(["k"]), "k", check_unique=False)
    assert out.count() == 2


def test_salted_join_warns_on_key_only_big_side(spark):
    import warnings

    from graphlab_spark.operators.skew import salted_join

    big = spark.range(10).select(F.col("id").alias("k"))
    small = spark.range(10).select(F.col("id").alias("k"), F.lit("t").alias("tag"))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        salted_join(big, small, "k")
    assert any("does NOT spread" in str(x.message) for x in w)


def test_salted_left_join_equals_plain(spark):
    from graphlab_spark.operators.skew import salted_join

    big = spark.range(40).select(F.col("id").alias("k"), (F.col("id") * 7).alias("v"))
    small = spark.range(0, 40, 2).select(F.col("id").alias("k"), F.lit("m").alias("tag"))
    plain = sorted(
        (r.k, r.v, r.tag) for r in big.join(small, "k", "left").collect()
    )
    salted = sorted(
        (r.k, r.v, r.tag) for r in salted_join(big, small, "k", how="left").collect()
    )
    assert plain == salted
