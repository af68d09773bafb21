"""Bucketed graph sink (sources/bucketed.py): the write-once-shuffle
layout must make node⋈edge joins plan with ZERO Exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphlab_spark.sources.bucketed import materialize_graph_bucketed, write_bucketed


@pytest.fixture()
def no_broadcast(spark):
    """Force SortMergeJoin so the plan shows whether bucketing removed
    the exchanges (a broadcast would hide them)."""
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ]
    old = {k: spark.conf.get(k, None) for k in keys}
    for k in keys:
        spark.conf.set(k, "-1")
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_bucketed_graph_join_has_no_exchange(spark, tmp_path, no_broadcast):
    nodes = spark.range(5000).select(
        F.concat(F.lit("e:"), F.col("id").cast("string")).alias("id"),
        F.lit("ORG").alias("entity_type"),
    )
    edges = spark.range(20000).select(
        F.concat(F.lit("e:"), (F.col("id") % 5000).cast("string")).alias("src"),
        F.lit("likes").alias("pred"),
        F.concat(F.lit("e:"), ((F.col("id") + 7) % 5000).cast("string")).alias("dst"),
    )
    n, e = materialize_graph_bucketed(
        spark, nodes, edges, "bt_graph", n_buckets=8, location=str(tmp_path / "wh")
    )
    try:
        j = n.join(e, n.id == e.src)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # co-partitioned by bucketing
        assert j.count() == 20000
        # self-join of edges on src is also exchange-free
        j2 = e.alias("a").join(e.alias("b"), "src")
        p2 = j2._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in p2, p2
    finally:
        spark.sql("DROP DATABASE IF EXISTS bt_graph CASCADE")


def test_bucketed_write_is_one_file_per_bucket(spark, tmp_path):
    """Without the pre-repartition, every input task writes one file per
    bucket it touches (tasks x buckets small files at scale)."""
    import glob

    df = (
        spark.range(10000)
        .repartition(6)  # several upstream tasks
        .select(F.col("id").cast("string").alias("id"))
    )
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bt_files LOCATION '{tmp_path / 'whf'}'")
    try:
        write_bucketed(df, "bt_files.t", ["id"], n_buckets=4)
        files = glob.glob(str(tmp_path / "whf" / "t" / "part-*"))
        assert 0 < len(files) <= 4, files
    finally:
        spark.sql("DROP DATABASE IF EXISTS bt_files CASCADE")


def test_bucketed_name_guard(spark):
    df = spark.range(1).select(F.col("id").cast("string").alias("id"))
    with pytest.raises(ValueError):
        write_bucketed(df, "x; DROP TABLE y", ["id"])
    with pytest.raises(ValueError):
        write_bucketed(df, "t", ["id'); --"])
    with pytest.raises(ValueError):
        materialize_graph_bucketed(spark, df, df, "db", location="/p'; DROP--")


def test_pipeline_publish_bucketed(spark, tmp_path, no_broadcast):
    """run_pipeline(publish_bucketed=...) publishes the SAME graph as
    co-partitioned catalog tables: row sets equal the path-based output
    and the node⋈edge join over the published tables plans with zero
    Exchange."""
    from graphlab_spark.plans.pipeline import run_pipeline
    from graphlab_spark.sources import corpus

    pages = corpus.generate_pages(spark, 60)
    res = run_pipeline(
        spark, pages, corpus.alias_df(spark), str(tmp_path / "pb"),
        publish_bucketed="pubgraph", n_buckets=8,
    )
    try:
        nb, eb = res["nodes_bucketed"], res["edges_bucketed"]
        assert {tuple(r) for r in nb.select("id").collect()} == {
            tuple(r) for r in res["nodes"].select("id").collect()
        }
        assert eb.count() == res["edges"].count()
        joined = eb.join(nb, eb.src == nb.id)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.sql("DROP DATABASE IF EXISTS pubgraph CASCADE")


def test_bucketed_adjacency_aggregation_no_exchange(spark, tmp_path):
    """adjacency_lists' groupBy(src) over the src-bucketed edge table
    plans WITHOUT a shuffle — the serving layout claim: one bucket = one
    sampler worker's slice, aggregated in place."""
    from graphlab_spark.operators.graph_query import adjacency_lists

    nodes = spark.range(100).select(
        F.concat(F.lit("e:"), F.col("id").cast("string")).alias("id"),
        F.lit("ORG").alias("entity_type"),
    )
    edges = spark.range(4000).select(
        F.concat(F.lit("e:"), (F.col("id") % 100).cast("string")).alias("src"),
        F.lit("likes").alias("pred"),
        F.concat(F.lit("e:"), ((F.col("id") + 3) % 100).cast("string")).alias("dst"),
    )
    _, e = materialize_graph_bucketed(
        spark, nodes, edges, "bt_adj", n_buckets=8, location=str(tmp_path / "wh")
    )
    try:
        adj = adjacency_lists(e.select("src", "dst"), n_shards=8, max_neighbors=5)
        plan = adj._jdf.queryExecution().executedPlan().toString()
        # distinct + groupBy(src...) both ride the bucket layout
        assert "Exchange" not in plan, plan
        assert adj.count() == 100
    finally:
        spark.sql("DROP DATABASE IF EXISTS bt_adj CASCADE")
