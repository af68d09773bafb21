"""Incremental connected components (canonicalize.cc_incremental):
folding edge increments into an existing labelling must yield EXACTLY
the one-shot CC labels over the union graph — the crawl-increment
contract shared with dedup_incremental / semdedup_incremental /
index_add."""

from __future__ import annotations

import random

from graphlab_spark.operators.canonicalize import (
    cc_incremental,
    connected_components,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "a string, b string"
    )


def _labels(df):
    return {r.item_id: r.component_id for r in df.collect()}


def _oneshot(spark, pairs):
    return _labels(connected_components(_edges_df(spark, pairs)))


def test_increments_equal_oneshot(spark):
    rng = random.Random(7)
    nodes = [f"n{i:03d}" for i in range(120)]
    pairs = sorted(
        {tuple(sorted(rng.sample(nodes, 2))) for _ in range(150)}
    )
    rng.shuffle(pairs)
    base, inc1, inc2 = pairs[:60], pairs[60:100], pairs[100:]

    labels = connected_components(_edges_df(spark, base))
    labels = cc_incremental(labels, _edges_df(spark, inc1))
    assert _labels(labels) == _oneshot(spark, base + inc1)
    labels = cc_incremental(labels, _edges_df(spark, inc2))
    assert _labels(labels) == _oneshot(spark, base + inc1 + inc2)


def test_merge_three_components_and_new_nodes(spark):
    base = [("a1", "a2"), ("b1", "b2"), ("c1", "c2")]
    prior = connected_components(_edges_df(spark, base))
    # one chain through a brand-new node merges all three comps; one
    # all-new island appears alongside
    inc = [("a2", "x9"), ("x9", "b1"), ("b2", "c1"), ("z1", "z2")]
    got = _labels(cc_incremental(prior, _edges_df(spark, inc)))
    assert got == _oneshot(spark, base + inc)
    assert got["c2"] == "a1" and got["x9"] == "a1"
    assert got["z2"] == "z1"


def test_reapply_is_noop_and_untouched_stable(spark):
    base = [("a1", "a2"), ("b1", "b2"), ("q1", "q2")]
    inc = [("a2", "b1")]
    prior = connected_components(_edges_df(spark, base))
    once = _labels(cc_incremental(prior, _edges_df(spark, inc)))
    twice = _labels(
        cc_incremental(
            cc_incremental(prior, _edges_df(spark, inc)), _edges_df(spark, inc)
        )
    )
    assert once == twice == _oneshot(spark, base + inc)
    # the untouched component kept its exact prior label
    assert once["q1"] == _labels(prior)["q1"]
    assert once["q2"] == _labels(prior)["q2"]


def test_increment_onto_empty_prior(spark):
    prior = connected_components(_edges_df(spark, []))
    inc = [("m1", "m2"), ("m2", "m3")]
    got = _labels(cc_incremental(prior, _edges_df(spark, inc)))
    assert got == _oneshot(spark, inc)


def test_distributed_path_matches_fast_path(spark):
    """Force the comp-graph through min-label propagation
    (driver_threshold=0) — identical labels to the union-find path."""
    base = [("a1", "a2"), ("b1", "b2")]
    inc = [("a2", "b1"), ("c1", "c2")]
    prior = connected_components(_edges_df(spark, base))
    fast = _labels(cc_incremental(prior, _edges_df(spark, inc)))
    dist = _labels(
        cc_incremental(prior, _edges_df(spark, inc), driver_threshold=0)
    )
    assert fast == dist == _oneshot(spark, base + inc)


def test_composed_crawl_increment_canonicalization(spark, tmp_path):
    """The composed monthly-crawl story: each increment's near-dup
    pairs (dedup_increment, persisted LSH index) feed cc_incremental,
    and the rolling canonical clusters equal one-shot CC over ALL
    pairs found so far — no full-corpus recompute at any step."""
    from pyspark.sql import functions as F

    from graphlab_spark.operators import dedup as DD
    from graphlab_spark.operators.dedup_incremental import dedup_increment

    docs = DD.with_planted_near_dups(
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet").filter(
            F.col("doc_id") < 300
        )
    )
    inc1 = docs.filter(F.col("doc_id") % 2 == 0)
    inc2 = docs.filter(F.col("doc_id") % 2 == 1)
    idx = str(tmp_path / "idx")

    def pairs_edges(pairs):
        return pairs.select(
            F.col("a").cast("string").alias("a"),
            F.col("b").cast("string").alias("b"),
        )

    p1 = pairs_edges(dedup_increment(spark, idx, inc1, 0.8)).cache()
    labels = connected_components(p1)
    p2 = pairs_edges(dedup_increment(spark, idx, inc2, 0.8)).cache()
    labels = cc_incremental(labels, p2)
    assert _labels(labels) == _labels(
        connected_components(p1.unionByName(p2))
    )
    assert labels.count() > 0  # the planted dups actually clustered
