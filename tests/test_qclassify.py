"""Learned quality classifier: frozen-fixture consistency (the
quantized model still perfectly separates its deterministic training
corpus), Spark-vs-Python scoring equality, the filter form, and the
broadcast-join plan shape."""

from __future__ import annotations

import hashlib
import importlib.util

import pandas as pd
import pytest
from pyspark.sql import functions as F

from graphlab_spark.operators.qclassify import (
    N_BUCKETS,
    classifier_filter,
    classifier_scores,
)

WEIGHTS = "/root/repo/fixtures/qc_weights.parquet"
SF = "/root/testdata/sf0.001"


def _load_freezer():
    spec = importlib.util.spec_from_file_location(
        "freeze_qc", "/root/repo/fixtures/freeze_qc.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _model():
    w = pd.read_parquet(WEIGHTS)
    bias_q = int(w.loc[w["bucket"] == -1, "w_q"].iloc[0])
    table = dict(zip(w.loc[w["bucket"] >= 0, "bucket"], w.loc[w["bucket"] >= 0, "w_q"]))
    return bias_q, table


def _py_score(tokens: list[str], bias_q: int, table: dict) -> int:
    def bucket(word: str) -> int:
        return int(hashlib.md5(word.encode()).hexdigest()[:12], 16) % N_BUCKETS

    return bias_q * len(tokens) + sum(int(table.get(bucket(t), 0)) for t in tokens)


def test_frozen_model_separates_training_corpus():
    """The committed weights classify the freezer's deterministic
    synthetic corpus perfectly — fixture and corpus synthesis are in
    sync (re-running the freezer reproduces both)."""
    fq = _load_freezer()
    toks, y = fq.synth_training_docs()
    bias_q, table = _model()
    for ws, label in zip(toks, y):
        assert (_py_score(ws, bias_q, table) > 0) == bool(label > 0.5)


def test_spark_scores_match_python(spark):
    from graphlab_spark.functions.bpe import pretokenize

    bias_q, table = _model()
    docs = spark.read.parquet(f"{SF}/documents.parquet").filter(F.col("doc_id") < 150)
    got = classifier_scores(spark, docs, WEIGHTS).collect()
    assert len(got) == 150
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    for r in got:
        toks = pretokenize(texts[r.doc_id])
        assert r.n_tokens == len(toks)
        assert r.score_q == _py_score(toks, bias_q, table)
        assert r.keep == (r.score_q > 0)


def test_zero_token_doc_scores_zero_and_drops(spark):
    docs = spark.createDataFrame(
        [(1, "the table scan"), (2, ""), (3, None)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in classifier_scores(spark, docs, WEIGHTS).collect()}
    assert rows[2].n_tokens == 0 and rows[2].score_q == 0 and not rows[2].keep
    assert rows[3].n_tokens == 0 and rows[3].score_q == 0 and not rows[3].keep


def test_classifier_filter_is_semi_join(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").filter(F.col("doc_id") < 150)
    scores = {r.doc_id: r.keep for r in classifier_scores(spark, docs, WEIGHTS).collect()}
    kept = classifier_filter(spark, docs, WEIGHTS)
    assert set(kept.columns) == set(docs.columns)
    assert {r.doc_id for r in kept.select("doc_id").collect()} == {
        d for d, k in scores.items() if k
    }


def test_plan_broadcasts_weights_no_cartesian(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        classifier_scores(spark, docs, WEIGHTS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
