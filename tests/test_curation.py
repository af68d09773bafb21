"""Curation funnel (operators/curation.py): composition of the oracled
quality gate, exact dedup, and domain quota — structural and
hand-computed checks; the value-level gate is the t17 oracle."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # (doc_id, source, text) — doc 2 is an exact dup of doc 1
        # (case/whitespace-insensitive fingerprint)
        (1, "a.com", "alpha beta gamma delta"),
        (2, "a.com", "Alpha  beta gamma   delta"),
        (3, "a.com", "five words of unique text"),
        (4, "b.com", "totally different content here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_funnel_shape_and_dedup(spark, docs):
    from graphlab_spark.operators.curation import curation_funnel

    got = {
        r.stage: (r.docs, r.tokens)
        for r in curation_funnel(docs, quality_threshold=0, per_domain=10).collect()
    }
    assert list(sorted(got)) == [
        "1_total", "2_quality_gate", "3_exact_dedup", "4_domain_quota"
    ]
    assert got["1_total"] == (4, 4 + 4 + 5 + 4)
    assert got["2_quality_gate"] == got["1_total"]  # threshold 0
    # dup pair (1,2) collapses to keeper doc 1 (min doc_id, 4 tokens)
    assert got["3_exact_dedup"] == (3, 4 + 5 + 4)
    assert got["4_domain_quota"] == got["3_exact_dedup"]  # quota 10 > rows


def test_funnel_quota_caps_per_domain(spark, docs):
    from graphlab_spark.operators.curation import curation_funnel

    got = {
        r.stage: r.docs
        for r in curation_funnel(docs, quality_threshold=0, per_domain=1).collect()
    }
    assert got["3_exact_dedup"] == 3  # a.com has 2 survivors, b.com 1
    assert got["4_domain_quota"] == 2  # capped to 1 per domain


def test_funnel_monotone_on_testdata(spark):
    from graphlab_spark.operators.curation import curation_funnel

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    got = {r.stage: (r.docs, r.tokens) for r in curation_funnel(docs).collect()}
    vals = [got[s] for s in sorted(got)]
    for (d0, t0), (d1, t1) in zip(vals, vals[1:]):
        assert d1 <= d0 and t1 <= t0
    assert 0 < vals[1][0] < vals[0][0]  # threshold actually splits


def test_funnel_with_learned_filter(spark):
    """classifier_weights inserts stage 2b between the rule gate and
    dedup; the funnel stays monotone and 2b equals classifier_filter's
    own survivor count over the stage-2 survivors."""
    from graphlab_spark.functions.textstats import quality_score_col
    from graphlab_spark.operators.curation import curation_funnel
    from graphlab_spark.operators.qclassify import classifier_filter
    from pyspark.sql import functions as F

    weights = "/root/repo/fixtures/qc_weights.parquet"
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    got = {
        r.stage: (r.docs, r.tokens)
        for r in curation_funnel(docs, classifier_weights=weights).collect()
    }
    assert "2b_learned_filter" in got
    vals = [got[s] for s in sorted(got)]
    for (d0, t0), (d1, t1) in zip(vals, vals[1:]):
        assert d1 <= d0 and t1 <= t0
    s2 = docs.filter(quality_score_col() >= 500)
    assert got["2b_learned_filter"][0] == classifier_filter(spark, s2, weights).count()
