"""Corrupted-tail negative sampling (operators/negatives).

Pins: dense-index correctness at several partition counts, determinism,
the no-false-negative guarantee, and the exact md5-mod candidate
arithmetic (so the DuckDB oracle in training_queries can never drift
from the Spark implementation silently).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from graphlab_spark.operators.negatives import (
    HASH_HEX_DIGITS,
    contiguous_index,
    corrupt_tail_negatives,
)


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src STRING, pred STRING, dst STRING")


def test_contiguous_index_is_dense_global_rank(spark):
    keys = ["m", "a", "z", "q", "b", "x", "c"]
    df = spark.createDataFrame([(k,) for k in keys], "id STRING")
    for parts in (1, 3, 32):
        got = {
            r["id"]: r["idx"] for r in contiguous_index(df, "id", parts).collect()
        }
        want = {k: i for i, k in enumerate(sorted(keys))}
        assert got == want, parts


def test_contiguous_index_empty(spark):
    df = spark.createDataFrame([], "id STRING")
    assert contiguous_index(df, "id").count() == 0


def test_negatives_never_true_edges_and_bounded(spark):
    edges = _edges(
        spark,
        [("a", "p", "b"), ("a", "p", "c"), ("b", "q", "c"), ("c", "p", "a")],
    )
    out = corrupt_tail_negatives(edges, k=4).collect()
    true_set = {("a", "p", "b"), ("a", "p", "c"), ("b", "q", "c"), ("c", "p", "a")}
    per_edge: dict = {}
    for r in out:
        assert (r["src"], r["pred"], r["neg_dst"]) not in true_set
        assert r["neg_dst"] != r["dst"]
        assert 1 <= r["j"] <= 4
        per_edge.setdefault((r["src"], r["pred"], r["dst"]), set()).add(r["j"])
    for js in per_edge.values():
        assert len(js) <= 4


def test_negatives_deterministic_and_match_hand_hash(spark):
    edges = _edges(spark, [("a", "p", "b"), ("b", "p", "c"), ("c", "p", "d")])
    got1 = sorted(map(tuple, corrupt_tail_negatives(edges, k=2).collect()))
    got2 = sorted(
        map(tuple, corrupt_tail_negatives(edges, k=2, num_index_partitions=3).collect())
    )
    assert got1 == got2 and got1  # deterministic, partition-invariant

    # hand-roll the same arithmetic: vocab sorted = index order
    vocab = sorted({"a", "b", "c", "d"})
    true_set = {("a", "p", "b"), ("b", "p", "c"), ("c", "p", "d")}
    want = []
    for s, p, d in sorted(true_set):
        for j in (1, 2):
            h = hashlib.md5(f"{s}|{p}|{d}|{j}|neg".encode()).hexdigest()
            cand = vocab[int(h[:HASH_HEX_DIGITS], 16) % len(vocab)]
            if cand != d and (s, p, cand) not in true_set:
                want.append((s, p, d, j, cand))
    assert got1 == sorted(want)


def test_negatives_empty_edges(spark):
    edges = _edges(spark, []).limit(0)
    out = corrupt_tail_negatives(edges, k=2)
    assert out.count() == 0
    assert out.columns == ["src", "pred", "dst", "j", "neg_dst"]


def test_negatives_plan_has_no_cartesian(spark):
    edges = _edges(spark, [("a", "p", "b"), ("b", "p", "c")])
    plan = corrupt_tail_negatives(edges, k=2)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
