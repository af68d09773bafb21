"""KG evaluation operators (operators/evaluate.py): hand-computed
triple P/R/F1 and clustering pair-P/R, zero-denominator guards, and the
driver-free 1-row-broadcast plan shape."""

from __future__ import annotations

from graphlab_spark.operators.evaluate import cluster_pair_pr, triple_pr


def _triples(spark, rows):
    return spark.createDataFrame(rows, "src string, pred string, dst string")


def test_triple_pr_hand_computed(spark):
    gold = _triples(spark, [("a", "p", "b"), ("b", "p", "c"), ("c", "p", "d")])
    pred = _triples(spark, [("a", "p", "b"), ("b", "p", "c"), ("x", "p", "y")])
    r = triple_pr(pred, gold).collect()[0]
    assert (r.n_pred, r.n_gold, r.n_hit) == (3, 3, 2)
    assert r.precision == r.recall == r.f1 == round(2 / 3, 6)


def test_triple_pr_dedups_and_guards_empty(spark):
    gold = _triples(spark, [("a", "p", "b")])
    dup_pred = _triples(spark, [("a", "p", "b"), ("a", "p", "b")])
    r = triple_pr(dup_pred, gold).collect()[0]
    assert (r.n_pred, r.n_hit, r.precision, r.recall, r.f1) == (1, 1, 1.0, 1.0, 1.0)
    empty = _triples(spark, []).filter("1=0")
    r = triple_pr(empty, gold).collect()[0]
    assert (r.n_pred, r.precision, r.recall, r.f1) == (0, 0.0, 0.0, 0.0)


def test_cluster_pair_pr_hand_computed(spark):
    # gold: {a1,a2,a3} one cluster + {b1} singleton → 3 gold pairs;
    # pred splits a3 off → 1 predicted pair, 1 hit → P=1, R=1/3
    rows = [("a1", "A", "A"), ("a2", "A", "A"), ("a3", "A", "S"), ("b1", "B", "B")]
    df = (
        spark.createDataFrame(rows, "id string, gold string, pred string")
    )
    r = cluster_pair_pr(df, df, id_col="id", pred_col="pred", gold_col="gold").collect()[0]
    assert (r.n_pred_pairs, r.n_gold_pairs, r.n_hit_pairs) == (1, 3, 1)
    assert r.precision == 1.0 and r.recall == round(1 / 3, 6)
    assert r.f1 == round(2 * 1.0 * (1 / 3) / (1.0 + 1 / 3), 6)


def test_plan_is_driver_free(spark):
    gold = _triples(spark, [("a", "p", "b"), ("b", "p", "c")])
    pred = _triples(spark, [("a", "p", "b")])
    df = triple_pr(pred, gold)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "EvalPython" not in plan
    # 1-row count frames come back via broadcast joins, never a shuffle
    # of data rows to one reducer
    assert "BroadcastNestedLoopJoin" in plan
