"""DSIR importance weights (operators/dsir.py): target-slice docs score
higher than off-target docs, selection is deterministic, and the plan
keeps the count tables broadcast with one doc-keyed shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphlab_spark.operators.dsir import dsir_select, dsir_weights


@pytest.fixture()
def corpus(spark):
    rows = []
    for i in range(60):
        rows.append((i, "wiki", "the theory of general relativity explains gravity"))
    for i in range(60, 120):
        rows.append((i, "spam", "click here buy now cheap deals win prizes"))
    for i in range(120, 130):  # unlabeled docs that READ like the target
        rows.append((i, "web", "relativity theory explains gravity and spacetime"))
    for i in range(130, 140):  # unlabeled docs that read like spam
        rows.append((i, "web", "buy cheap prizes now click deals"))
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_target_like_docs_outscore_spam_like(spark, corpus):
    w = {
        r.doc_id: r.dsir_weight
        for r in dsir_weights(corpus, F.col("source") == "wiki").collect()
    }
    assert len(w) == 140
    target_like = [w[i] for i in range(120, 130)]
    spam_like = [w[i] for i in range(130, 140)]
    assert min(target_like) > max(spam_like)


def test_select_is_deterministic_topk(spark, corpus):
    a = [(r.doc_id, r.dsir_weight) for r in
         dsir_select(corpus, F.col("source") == "wiki", 30).orderBy("doc_id").collect()]
    b = [(r.doc_id, r.dsir_weight) for r in
         dsir_select(corpus, F.col("source") == "wiki", 30).orderBy("doc_id").collect()]
    assert a == b and len(a) == 30
    # the selected set is dominated by wiki + wiki-like docs
    picked = {d for d, _ in a}
    assert sum(1 for d in picked if d < 60 or 120 <= d < 130) >= 25


def test_plan_shape(spark, corpus):
    df = dsir_weights(corpus, F.col("source") == "wiki")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    # delta table broadcast back to the gram stream; doc agg partial-aggs
    assert "BroadcastHashJoin" in plan
    assert "partial_" in plan.lower()
    # the corpus never shuffles on the gram/bucket key at data size —
    # only bounded bucket aggregates and the doc-keyed weight sum
    assert "hashpartitioning(bucket" in plan  # ≤ B rows per agg
    assert plan.count("hashpartitioning(doc_id") <= 1


def test_gumbel_resample_deterministic_and_weight_biased(spark, corpus):
    from graphlab_spark.operators.dsir import dsir_resample

    a = [(r.doc_id, r.dsir_weight) for r in
         dsir_resample(corpus, F.col("source") == "wiki", 30, seed=7)
         .orderBy("doc_id").collect()]
    b = [(r.doc_id, r.dsir_weight) for r in
         dsir_resample(corpus, F.col("source") == "wiki", 30, seed=7)
         .orderBy("doc_id").collect()]
    assert a == b and len(a) == 30  # same seed → identical draw
    c = {d for d, _ in
         dsir_resample(corpus, F.col("source") == "wiki", 30, seed=8).collect()}
    assert c != {d for d, _ in a}  # different seed → different draw
    # the draw is still weight-biased: mostly wiki/wiki-like docs
    picked = {d for d, _ in a}
    assert sum(1 for d in picked if d < 60 or 120 <= d < 130) >= 20
